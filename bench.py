"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR and
print ONE JSON line the driver parses.

    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Methodology (r21): each query is timed REPS (3) times and the per-query
MEDIAN is reported; the total is the sum of medians. The single-run harness
used through r20 measured sandbox weather as much as plan cost (totals of
6.27x / 1.24x / 1.04x / 2.16x baseline on byte-identical code, r17-r20) —
medians make the number a property of the plan again. Every repetition
computes from the parquet inputs: the dedup module's intra-query cache is
dropped before EACH repetition, so no repetition is advantaged by work a
previous one did (see OPTIMIZATION_r21.md "Bench methodology").

The timed action stays the noop sink (spark_optimization_guide.md §1.4):
it evaluates every output column JVM-side without shipping rows anywhere.
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import sys
import time

REPS = 3


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

    import social_media_big_data_analyzer_spark as engine
    from social_media_big_data_analyzer_spark import session as engine_session
    from social_media_big_data_analyzer_spark.queries import REGISTRY as _reg  # noqa: F401  (registers cache clearers)

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
    # The engine's runtime-settable confs (AQE partition coalescing by
    # bytes, broadcast threshold, Arrow) -- the same ones every production
    # session of this engine runs with; see session.RUNTIME_CONFS.
    engine_session.configure(spark)

    def force(df):
        # count() lets Catalyst prune every projected column, so pure
        # projection queries would benchmark as parquet row counts. The
        # noop sink evaluates all output columns JVM-side without shipping
        # rows to the driver.
        df.write.format("noop").mode("overwrite").save()

    def drop_intra_query_caches() -> None:
        # Query modules that memoize DataFrames register a clearer with
        # the engine package (r22: public hook instead of reaching into
        # dedup._CACHE — a module adding a new memo is covered
        # automatically). Clearing before every repetition makes each
        # timing a full computation from parquet -- repetition 1 is not
        # advantaged and no query inherits another's warm cache.
        engine.clear_caches()

    # Warm the JVM/codegen paths so per-query timings measure the plan,
    # not first-run classloading.
    force(mod.q_revenue_by_flag(spark, sf_dir))

    timings: dict[str, float] = {}
    for name, fn in mod.queries().items():
        reps: list[float] = []
        for rep in range(REPS):
            drop_intra_query_caches()
            spark.sparkContext.setJobDescription(f"bench:{name} rep{rep}")
            t0 = time.perf_counter()
            try:
                force(fn(spark, sf_dir))
                reps.append(time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001
                print(f"bench error {name} rep{rep}: {e}", file=sys.stderr)
                reps = []
                break
            finally:
                spark.sparkContext.setJobDescription(None)
        if reps:
            timings[name] = round(statistics.median(reps), 3)
            print(
                f"bench {name}: reps={[round(r, 3) for r in reps]} "
                f"median={timings[name]}",
                file=sys.stderr,
            )
        else:
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
