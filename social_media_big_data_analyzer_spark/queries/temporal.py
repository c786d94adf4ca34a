"""Temporal operators: as-of join, event-time window aggregations
(tumbling / sliding / session) in their batch form, and the date/time
scalar family (SURVEY §2.2 C9, C28, C32-C34).

The streaming execution of the same windows lives in
``social_media_big_data_analyzer_spark.streaming``; these batch variants
share semantics, which is what lets the streaming run be oracle-checked
against plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.asof import asof_join

SESSION_GAP_MIN = 30


def q_asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution as-of join (C9): each purchase gets the latest
    prior-or-equal click of the same user. Right side is deduped to one
    click per (user, ts) so ties are well-defined on both engines."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", F.col("ts").alias("cts"), "click_id")
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="cts",
        value_cols=["click_id"],
    )
    return out.select("user_id", "purchase_id", "click_id")


def q_tumbling_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window (C32): 1-hour buckets per event type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def q_sliding_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (C33): 1-hour windows sliding every 30 minutes —
    each event lands in exactly two windows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("win_start"), "cnt")
    )


def q_session_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (C34): per-user sessions with a 30-minute gap.

    session_window shuffles once on user_id and merges sorted events —
    the per-key state never exceeds one open session, which is exactly
    the streaming state-store shape too.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def q_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar family (C28) over order dates."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mon"),
        F.dayofmonth(d).alias("dom"),
        F.weekofyear(d).alias("iso_week"),
        (F.weekday(d) + 1).alias("iso_dow"),
        F.to_date(F.last_day(d)).alias("month_end"),
        F.to_date(F.date_add(d, 30)).alias("plus30"),
        F.datediff(F.to_date(d), F.to_date(F.lit("2024-01-01"))).alias("days_since_2024"),
        F.to_date(F.date_trunc("month", d)).alias("month_start"),
        F.unix_timestamp(d).alias("epoch_s"),
    )


QUERIES = {
    "asof_click_attribution": q_asof_click_attribution,
    "tumbling_events_hourly": q_tumbling_events_hourly,
    "sliding_events": q_sliding_events,
    "session_events": q_session_events,
    "datetime_funcs": q_datetime_funcs,
}

ORACLES = {
    "asof_click_attribution": """
        WITH purchases AS (
            SELECT user_id, ts, event_id AS purchase_id FROM events
            WHERE event_type = 'purchase'
        ),
        clicks AS (
            SELECT user_id, ts AS cts, max(event_id) AS click_id FROM events
            WHERE event_type = 'click'
            GROUP BY user_id, ts
        )
        SELECT p.user_id, p.purchase_id, c.click_id
        FROM purchases p
        ASOF LEFT JOIN clicks c
            ON p.user_id = c.user_id AND p.ts >= c.cts
    """,
    "tumbling_events_hourly": """
        SELECT date_trunc('hour', ts) AS win_start, event_type,
               count(*) AS cnt, round(sum(value), 4) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "sliding_events": """
        SELECT win_start, count(*) AS cnt
        FROM (
            SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                           time_bucket(INTERVAL '30 minutes', ts)
                               - INTERVAL '30 minutes']) AS win_start
            FROM events
        )
        GROUP BY 1
    """,
    "session_events": f"""
        WITH ordered AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             IS NULL
                        OR epoch(ts - lag(ts) OVER (PARTITION BY user_id
                                                    ORDER BY ts))
                           >= {SESSION_GAP_MIN * 60}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        numbered AS (
            SELECT user_id, ts,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_no
            FROM ordered
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL '{SESSION_GAP_MIN} minutes' AS session_end,
               count(*) AS n_events
        FROM numbered
        GROUP BY user_id, session_no
    """,
    "datetime_funcs": """
        SELECT o_orderkey,
               year(o_orderdate) AS yr,
               quarter(o_orderdate) AS qtr,
               month(o_orderdate) AS mon,
               day(o_orderdate) AS dom,
               CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
               CAST(isodow(o_orderdate) AS INT) AS iso_dow,
               CAST(last_day(o_orderdate) AS DATE) AS month_end,
               CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
               CAST(datediff('day', DATE '2024-01-01', o_orderdate) AS INT)
                   AS days_since_2024,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        FROM orders
    """,
}
