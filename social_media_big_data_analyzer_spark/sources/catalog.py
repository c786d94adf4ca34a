"""Parquet table catalog keyed by scale-factor directory (SURVEY.md M0).

Reference analog: the paginated API source at /root/reference/app.py:82-150
(R1). In the engine, batch ingestion is a parquet scan -- Catalyst pushes
filters and prunes columns into the scan (the reference hand-compiled its
predicates into the API query string, app.py:89; here that's free).

Scale: a scan stays one job regardless of table size; events' nanos->ntz
conversion is a per-row projection fused into the scan stage (no shuffle).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _ensure_nanos_conf(spark: SparkSession) -> None:
    # Both confs matter for deterministic events.ts values: nanosAsLong so
    # the vectorized reader accepts TIMESTAMP(NANOS), and UTC so nothing
    # downstream routes through a session-local zone.
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


#: Single source of truth for the nanos->ntz conversion lives in io.py;
#: imported here (not duplicated) so the batch and streaming readers can
#: never drift.
from ..io import _NANOS_TO_NTZ  # noqa: E402


def _validate_schema(name: str, df: DataFrame) -> None:
    """Fail loudly on column-name drift; tolerate ts-flavor differences.

    The explicit StructTypes in schemas.py are the contract; parquet
    footers are untrusted input at 100 TB (one bad file must not silently
    change query semantics).
    """
    from .. import schemas

    expected = schemas.SCHEMAS.get(name)
    if expected is None:
        return
    got = [f.name for f in df.schema.fields]
    want = [f.name for f in expected.fields]
    if got != want:
        raise ValueError(
            f"schema drift in table {name!r}: columns {got} != declared {want}"
        )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; normalizes events.ts (nanos long -> ntz)."""
    _ensure_nanos_conf(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") in ("bigint", "long"):
        df = df.withColumn("ts", F.expr(_NANOS_TO_NTZ.format(c="ts")))
    _validate_schema(name, df)
    return df


def load_table_or_empty(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Typed source failure -> empty relation with the declared schema
    (SURVEY §2.1 R35, R21; reference app.py:140-148 maps API auth/HTTP
    failures to an empty frame plus a user-visible error).

    Only *missing-source* failures degrade to empty; schema drift
    (`ValueError` from :func:`_validate_schema`) still raises, because a
    readable-but-wrong table is corruption, not absence.
    """
    from pyspark.errors import AnalysisException

    from .. import schemas

    try:
        return load_table(spark, sf_dir, name)
    except AnalysisException:
        expected = schemas.SCHEMAS.get(name)
        if expected is None:
            raise
        return spark.createDataFrame([], schema=expected)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register temp views so queries can run via spark.sql(...)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
