"""Oracle-parity tests: every `queries()` entry must match its `oracle_sql()`
twin on DuckDB at sf0.001 — same comparison the round driver performs
(row count, sorted column names, order-insensitive normalized values)."""

import math

import pytest

from .conftest import SF_DIR


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"{v:.6f}"
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _query_names():
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return sorted(mod.queries())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, spark, entry_mod, duck):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, SF_DIR)
    cols = sorted(sdf.columns)
    srows = sorted(tuple(_norm(r[c]) for c in cols) for r in sdf.collect())

    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        pytest.skip(f"{name}: rows-only (no SQL oracle)")
    cur = duck.execute(oracle)
    ocols = [d[0] for d in cur.description]
    assert sorted(ocols) == cols, f"columns differ: spark={cols} oracle={sorted(ocols)}"
    idx = [ocols.index(c) for c in cols]
    orows = sorted(tuple(_norm(row[i]) for i in idx) for row in cur.fetchall())
    assert len(srows) == len(orows), f"rows: spark={len(srows)} oracle={len(orows)}"
    assert srows == orows


def test_entry_returns_rows(spark, entry_mod):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["word", "cnt"]
