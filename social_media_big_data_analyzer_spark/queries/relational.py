"""Relational operator coverage: joins (sort-merge, broadcast, semi,
full-outer, theta, cross), aggregates, distinct, cube / grouping sets,
having, and set operations.

Reference parity: the reference engine (app.py) has no joins at all — these
close SURVEY.md §2.2 C4-C15, C21. Each docstring notes the 100 TB plan
shape we expect Catalyst/AQE to pick and why it survives scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table


def q_order_revenue_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join + HAVING (C5, C11, C15).

    Scale shape: lineitem is pre-aggregated by l_orderkey BEFORE the join,
    so the shuffle moves one row per order instead of one per lineitem
    (~4x smaller at TPC-H ratios), and the join is a sort-merge on the
    already-partitioned agg output. AQE handles skewed order keys.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # Exact DECIMAL arithmetic: the inputs are 2-decimal money values, so
    # decimal mult/sum is exact and the final double is bit-identical in
    # any engine and any addition order — no float rounding coin-flips.
    rev_expr = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    rev = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(rev_expr).cast("double").alias("rev"),
    )
    return (
        orders.join(rev, orders.o_orderkey == rev.l_orderkey)
        .filter(F.col("rev") > 200000.0)
        .select("o_orderkey", "o_orderdate", "n_items", F.col("rev").alias("revenue"))
    )


def q_cust_big_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (C7): customers with at least one order > 300k.

    Semi join never duplicates the left side, so output is bounded by
    |customer|; at scale the filtered orders side shrinks first (predicate
    pushdown to the scan), then AQE usually converts to broadcast.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


def q_nation_cust_supp_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two aggregates + coalesce (C6, C11, R18).

    Both inputs are pre-aggregated to one row per nation before the outer
    join — at 100 TB the join touches |nations| rows regardless of fact
    size. Nation-name lookup is an explicit broadcast (C4).
    """
    nation = load_table(spark, sf_dir, "nation")
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    both = cust.join(supp, "nationkey", "full_outer")
    return (
        both.join(
            F.broadcast(nation), both.nationkey == nation.n_nationkey, "left"
        )
        .select(
            "n_name",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


def q_nation_pairs_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) join (C8): nation pairs across increasing regions.

    Non-equi joins plan as BroadcastNestedLoopJoin; safe only because one
    side is a dimension. For large-large range predicates the scale path
    is banded bucketing (join on overlapping range buckets, then filter).
    """
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    return n1.join(
        F.broadcast(n2), F.col("n1.n_regionkey") < F.col("n2.n_regionkey")
    ).select(
        F.col("n1.n_name").alias("nation_a"),
        F.col("n2.n_name").alias("nation_b"),
    )


def q_region_nation_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (C10) of two dimensions — bounded 5 x 25 output."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(F.broadcast(nation)).select("r_name", "n_name")


def q_segment_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count + count(distinct) per group (C11, C12).

    Spark plans distinct aggregation as a two-stage expand+agg; partial
    aggregation still applies so the shuffle carries (segment, nationkey)
    pairs, not raw rows.
    """
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate count-distinct (C13) per event type.

    Rows-only check (no SQL oracle): DuckDB's approx_count_distinct uses a
    different sketch, so values differ by design. tests/ bounds the
    relative error against the exact count instead. At 100 TB this is THE
    distinct-count path — fixed-size sketches merge map-side, no expand.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users")
    )


def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with GROUPING() marker columns (C14)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
    )


def q_grouping_sets_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL (C14)."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def q_segment_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (C21): INTERSECT / EXCEPT / UNION of nation sets.

    intersect/exceptAll shuffle on the full row; inputs here are already
    distinct nation keys, so the shuffled sets are dimension-sized.
    """
    customer = load_table(spark, sf_dir, "customer")
    bld = (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    mch = (
        customer.filter(F.col("c_mktsegment") == "MACHINERY")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    return (
        bld.intersect(mch).select(F.lit("both").alias("op"), "nationkey")
        .unionByName(
            bld.exceptAll(mch).select(F.lit("only_building").alias("op"), "nationkey")
        )
        .unionByName(
            mch.exceptAll(bld).select(F.lit("only_machinery").alias("op"), "nationkey")
        )
    )


QUERIES = {
    "order_revenue_having": q_order_revenue_having,
    "cust_big_orders_semi": q_cust_big_orders_semi,
    "nation_cust_supp_outer": q_nation_cust_supp_outer,
    "nation_pairs_theta": q_nation_pairs_theta,
    "region_nation_cross": q_region_nation_cross,
    "segment_distinct_nations": q_segment_distinct_nations,
    "approx_distinct_users": q_approx_distinct_users,
    "cube_status_priority": q_cube_status_priority,
    "grouping_sets_priority": q_grouping_sets_priority,
    "segment_setops": q_segment_setops,
}

ORACLES = {
    "order_revenue_having": """
        SELECT o_orderkey, o_orderdate, count(*) AS n_items,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey, o_orderdate
        HAVING CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) > 200000.0
    """,
    "cust_big_orders_semi": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
    """,
    "nation_cust_supp_outer": """
        WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust
                   FROM customer GROUP BY 1),
             s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp
                   FROM supplier GROUP BY 1)
        SELECT n_name,
               coalesce(n_cust, 0) AS n_cust,
               coalesce(n_supp, 0) AS n_supp
        FROM c FULL OUTER JOIN s USING (nationkey)
        LEFT JOIN nation ON nationkey = n_nationkey
    """,
    "nation_pairs_theta": """
        SELECT n1.n_name AS nation_a, n2.n_name AS nation_b
        FROM nation n1 JOIN nation n2 ON n1.n_regionkey < n2.n_regionkey
    """,
    "region_nation_cross": """
        SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    "segment_distinct_nations": """
        SELECT c_mktsegment, count(*) AS n_cust,
               count(DISTINCT c_nationkey) AS n_nations
        FROM customer GROUP BY c_mktsegment
    """,
    "cube_status_priority": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "grouping_sets_priority": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "segment_setops": """
        WITH b AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer
                   WHERE c_mktsegment = 'BUILDING'),
             m AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer
                   WHERE c_mktsegment = 'MACHINERY')
        SELECT 'both' AS op, nationkey FROM (SELECT * FROM b INTERSECT SELECT * FROM m)
        UNION ALL
        SELECT 'only_building', nationkey FROM (SELECT * FROM b EXCEPT SELECT * FROM m)
        UNION ALL
        SELECT 'only_machinery', nationkey FROM (SELECT * FROM m EXCEPT SELECT * FROM b)
    """,
}
