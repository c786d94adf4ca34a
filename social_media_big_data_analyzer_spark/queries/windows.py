"""Window-function coverage: ranking, analytic (lag/lead), frame-based
aggregates, multi-key sort with top-k, and the reference's running-sum
stop criterion (SURVEY §2 C16-C20, R19-R20, R26).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table


def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + lag/lead + frame aggregate in one pass (C16, C17, C18).

    All five functions share one window spec, so Spark evaluates them in a
    single Window operator after one shuffle on o_custkey — the shape to
    preserve at 100 TB (don't mix orderings needlessly; each distinct
    (partition, order) pair is another sort).
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    wf = w.rowsBetween(-2, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(w).alias("seq"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.round(F.avg("o_totalprice").over(wf), 3).alias("avg_last3"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


def q_multi_key_sort_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort + limit (C19, C20).

    sort + limit collapses to TakeOrderedAndProject: each partition keeps
    its local top-100 and the driver merges — no global sort ever runs,
    which is why this is safe at any scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(
            F.asc("o_orderstatus"), F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(100)
    )


def q_stop_after_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-sum stop criterion (R19, R20): consume events in timestamp
    order until the cumulative `value` passes 5000, like the reference's
    word-count-capped ingest loop (reference app.py:118-126 semantics).

    Two-pass shape (guide §2.4 — don't feed every row through one global
    window): pass 1 aggregates per-day totals (map-side combinable, tiny)
    and keeps only the prefix of days whose cumulative total hasn't
    already passed the stop bound; pass 2 runs the EXACT sequential
    window, but only over the surviving day-prefix.

    Bit-exactness of the restructure: `value` is nonnegative (event
    magnitudes, like the reference's word counts), so the true running
    sum is nondecreasing and the days that can contain qualifying rows
    form a prefix. The slack on the day filter (+1.0) over-covers the
    float association error of the per-day aggregate, so every
    potentially-qualifying day survives pass 1; pass 2 then folds the
    kept rows in the same global (ts, event_id) order starting from the
    true first row, producing bit-identical `cum_value` doubles, and the
    exact filter discards anything the slack over-kept.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    day = F.date_trunc("day", F.col("ts"))
    wb = (
        Window.orderBy("_day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    keep_days = (
        ev.groupBy(day.alias("_day"))
        .agg(F.sum("value").alias("_day_sum"))
        .withColumn("_before", F.coalesce(F.sum("_day_sum").over(wb), F.lit(0.0)))
        .filter(F.col("_before") <= 5000.0 + 1.0)
        .select("_day")
    )
    pruned = ev.withColumn("_day", day).join(
        F.broadcast(keep_days), "_day", "left_semi"
    )
    w = (
        Window.orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        pruned.withColumn("cum_value", F.sum("value").over(w))
        .filter(F.col("cum_value") - F.col("value") <= 5000.0)
        .select("event_id", F.round("cum_value", 4).alias("cum_value"))
    )


QUERIES = {
    "window_analytics": q_window_analytics,
    "multi_key_sort_top100": q_multi_key_sort_top100,
    "stop_after_cumsum": q_stop_after_cumsum,
}

ORACLES = {
    "window_analytics": """
        SELECT o_custkey, o_orderkey,
               dense_rank() OVER w AS seq,
               lag(o_totalprice) OVER w AS prev_price,
               lead(o_totalprice) OVER w AS next_price,
               round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 3) AS avg_last3,
               round(percent_rank() OVER w, 6) AS pct_rank
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
    "multi_key_sort_top100": """
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
    "stop_after_cumsum": """
        SELECT event_id, round(cum_value, 4) AS cum_value
        FROM (
            SELECT event_id, value,
                   sum(value) OVER (ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_value
            FROM events
        )
        WHERE cum_value - value <= 5000.0
    """,
}
