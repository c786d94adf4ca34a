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
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; normalizes events.ts (nanos long -> ntz)."""
    _ensure_nanos_conf(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") in ("bigint", "long"):
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register temp views so queries can run via spark.sql(...)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
