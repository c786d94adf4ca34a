"""SparkSession factory and runtime configuration.

Reference analog: process boot at /root/reference/app.py:13-34 (cached
NLTK init, page config, session-state init). Here the long-lived
resource is the SparkSession itself; NLTK-style per-executor init lives
inside the pandas UDFs (functions/lemmatize.py).

Scale notes (100 TB):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy switching replace any hand-tuned plan.
- Arrow on: every pandas UDF / toPandas crosses the JVM<->Python boundary
  in columnar batches.
- UTC session timezone: deterministic timestamp semantics (oracle parity).
- `nanosAsLong`: the events table stores TIMESTAMP(NANOS) which the
  vectorized parquet reader rejects; we read nanos as long and convert
  at the scan (sources/catalog.py) -- still a single pushed-down scan.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: SQL confs that are settable at runtime on ANY session (including one
#: handed to us by an external driver -- see __spark_entry__.py).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Size post-shuffle partitions by BYTES, not by core count
    # (spark_optimization_guide.md §2.2 "fewer, larger reduce partitions").
    # parallelismFirst=true (the default) pins reduce-side task count to
    # the default parallelism even for KB-sized shuffles -- pure scheduler
    # overhead locally and quadratic shuffle-block growth at cluster scale.
    # The advisory size is env-tunable; 64 MB is the local default, raise
    # toward 256 MB on big clusters (guide §9).
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": os.environ.get(
        "SMBDA_ADVISORY_PARTITION_BYTES", "64m"
    ),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Small dims (region/nation/supplier/part at test SFs) must broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
}


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (best-effort)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build, or restricted -- keep going
    return spark


def build_spark(
    app_name: str = "smbda-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or fetch) the engine's SparkSession.

    local[N] for tests/bench; on a real cluster the master/executor confs
    come from spark-submit and only the SQL confs here matter.
    """
    n = cpus or default_cpus()
    parts = shuffle_partitions or max(2 * n, 8)
    builder = SparkSession.builder
    # Respect a cluster master supplied via spark-submit / env; only fall
    # back to local[N] when nothing external chose one.
    external_master = os.environ.get("SPARK_MASTER") or (
        "--master" in os.environ.get("PYSPARK_SUBMIT_ARGS", "")
    )
    if not external_master:
        builder = builder.master(f"local[{n}]")
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.driver.memory", os.environ.get("SMBDA_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)
