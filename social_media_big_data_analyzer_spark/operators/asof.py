"""As-of (most-recent-prior) join as a union-merge — SURVEY §2.2 C9.

Spark has no native ASOF JOIN. The classic distributed shape: union both
sides tagged, sort within each key partition by time, and carry the last
right-side value forward with ``last(..., ignorenulls=True)`` over an
unbounded-preceding window. One shuffle on the key, no range join, no
per-row probe — at 100 TB this is a single sort-merge pass per key
partition, and skewed keys split fine because the window is per-key.

DuckDB's native ``ASOF JOIN`` verifies the semantics (see
queries/temporal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_time <= left_time`` within the same ``on`` key.

    Ties on time: the right row sorts first, so a right event at exactly
    t is visible to a left row at t — matching DuckDB ``ON l.t >= r.t``.
    """
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    lcols = [c for c in left.columns if c not in (on, left_time)]

    l = left.select(
        F.col(on),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in value_cols],
        *lcols,
    )
    r = right.select(
        F.col(on),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *value_cols,
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.asc("_t"), F.asc("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l.unionByName(r).select(
        "*",
        *[
            F.last(F.when(F.col("_is_left") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_is_left") == 1).select(
        F.col(on),
        F.col("_t").alias(left_time),
        *lcols,
        *[F.col(f"_asof_{c}").alias(c) for c in value_cols],
    )
