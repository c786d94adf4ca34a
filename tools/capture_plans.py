"""Capture `.explain("formatted")` output for named queries into
plans/<outdir>/<query>_<tag>.txt (judge-checkable plan evidence).

Usage:
    python tools/capture_plans.py <tag> <outdir> [query ...]

With no query names, captures every registered query. Uses sf0.01 (same
SF as the r21 plan dumps) so before/after files stay comparable.
"""

from __future__ import annotations

import importlib.util
import os
import sys


def main() -> int:
    tag = sys.argv[1]
    outdir = sys.argv[2]
    names = sys.argv[3:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    from social_media_big_data_analyzer_spark import session as engine_session

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    engine_session.configure(spark)

    qmap = mod.queries()
    if not names:
        names = list(qmap)
    os.makedirs(os.path.join(repo, "plans", outdir), exist_ok=True)
    for name in names:
        df = qmap[name](spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(repo, "plans", outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
