"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR and
print ONE JSON line the driver parses.

    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repo = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "100g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        # count() lets Catalyst prune every projected column, so pure
        # projection queries would benchmark as parquet row counts. The
        # noop sink evaluates all output columns JVM-side without shipping
        # rows to the driver.
        df.write.format("noop").mode("overwrite").save()

    # Warm the JVM/codegen paths so per-query timings measure the plan,
    # not first-run classloading.
    force(mod.q_revenue_by_flag(spark, sf_dir))

    timings: dict[str, float] = {}
    for name, fn in mod.queries().items():
        t0 = time.perf_counter()
        try:
            force(fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            print(f"bench error {name}: {e}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf_label = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf_label)
    except ValueError:
        sf = sf_label
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0 if all(t >= 0 for t in timings.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
