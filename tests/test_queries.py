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


def test_stop_after_cumsum_value_nonnegative_precondition(duck):
    """stop_after_cumsum's day-prefix prune is only exact when
    events.value is nonnegative (the running sum must be monotone so the
    qualifying rows form a day-prefix). Enforce the precondition loudly:
    a dataset violating it must fail here, not silently drop rows."""
    (vmin,) = duck.execute("SELECT min(value) FROM events").fetchone()
    assert vmin is not None and vmin >= 0.0, (
        f"events.value has negative values (min={vmin}); the "
        "stop_after_cumsum prefix prune is invalid on this data"
    )


def test_ingest_doc_id_unique_precondition(duck):
    """ingest_tagged_records collapses matches with groupBy(doc_id) +
    first(text), which assumes doc_id is unique in documents. Make the
    assumption explicit: duplicate doc_ids with differing text would
    previously yield two rows and now pick one arbitrarily."""
    (n_dup,) = duck.execute(
        "SELECT count(*) FROM (SELECT doc_id FROM documents "
        "GROUP BY doc_id HAVING count(*) > 1)"
    ).fetchone()
    assert n_dup == 0, f"{n_dup} duplicate doc_ids in documents"


def test_running_revenue_decimal_oracle_matches_legacy_double(duck):
    """The r21 running_revenue oracle moved from a double prefix sum to
    exact DECIMAL(12,2) in the same commit as the query (both-sides
    edit). Pin the equivalence the change relied on: at the test SF the
    decimal and legacy-double oracles agree after round(. , 2)."""
    decimal_rows = duck.execute(
        """
        SELECT o_orderkey,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                   ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE), 2) AS running_total
        FROM orders ORDER BY o_orderkey
        """
    ).fetchall()
    double_rows = duck.execute(
        """
        SELECT o_orderkey,
               round(sum(o_totalprice) OVER (
                   ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_total
        FROM orders ORDER BY o_orderkey
        """
    ).fetchall()
    assert decimal_rows == double_rows
