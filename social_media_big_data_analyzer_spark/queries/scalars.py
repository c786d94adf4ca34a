"""Scalar function families (SURVEY §2.2 C27, C29, C30, C31): string,
math, array, and JSON/map operations, each exercised end-to-end in one
wide projection per family.

Everything is a built-in `pyspark.sql.functions` call — a single
whole-stage-codegen projection fused into the scan; the family queries
exist to pin cross-engine semantics (1-based indexing, null handling,
rounding) against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = F.col("c_name")
    return c.select(
        "c_custkey",
        F.upper(n).alias("up"),
        F.length(n).alias("len"),
        F.substring(n, 1, 8).alias("first8"),
        F.concat(n, F.lit("|"), F.col("c_mktsegment")).alias("joined"),
        F.regexp_replace(n, "[0-9]", "#").alias("masked"),
        F.reverse(n).alias("rev"),
        F.instr(n, "1").alias("pos1"),
        F.lpad(F.col("c_mktsegment"), 12, ".").alias("padded"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("lev"),
        F.split(n, "#").getItem(0).alias("prefix"),
    )


def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    d = F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(q - 25).alias("abs_dev"),
        F.ceil(d * 100).alias("disc_pct_ceil"),
        F.floor(q / 7).alias("q_div7"),
        F.round(F.sqrt(q), 6).alias("sqrt_q"),
        F.round(F.log(q + 1), 6).alias("ln_q1"),
        F.round(F.exp(d), 6).alias("exp_d"),
        F.round(F.pow(q, 2), 4).alias("q_sq"),
        F.pmod(F.col("l_partkey"), F.lit(7)).alias("pk_mod7"),
        F.signum(d - 0.05).alias("disc_sign"),
        F.greatest(q, F.lit(10.0)).alias("q_floor10"),
    )


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct"),
        F.array_contains(t, "spark").cast("int").alias("has_spark"),
        F.concat_ws(" ", F.slice(t, 1, 5)).alias("first5"),
        F.array_min(t).alias("min_tok"),
        F.array_max(t).alias("max_tok"),
        F.element_at(t, -1).alias("last_tok"),
        F.size(F.array_remove(t, "the")).alias("n_no_the"),
    )


def q_json_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction + map surface (C27, C31): parse props into a map,
    read keys/values/entries."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(m).alias("n_keys"),
        F.concat_ws(",", F.sort_array(F.map_keys(m))).alias("keys_joined"),
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k_via_path"),
    )


QUERIES = {
    "string_funcs": q_string_funcs,
    "math_funcs": q_math_funcs,
    "array_funcs": q_array_funcs,
    "json_map_funcs": q_json_map_funcs,
}

ORACLES = {
    "string_funcs": """
        SELECT c_custkey,
               upper(c_name) AS up,
               length(c_name) AS len,
               substr(c_name, 1, 8) AS first8,
               c_name || '|' || c_mktsegment AS joined,
               regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
               reverse(c_name) AS rev,
               CAST(strpos(c_name, '1') AS INT) AS pos1,
               lpad(c_mktsegment, 12, '.') AS padded,
               CAST(levenshtein(c_mktsegment, 'MACHINERY') AS INT) AS lev,
               string_split(c_name, '#')[1] AS prefix
        FROM customer
    """,
    "math_funcs": """
        SELECT l_orderkey, l_linenumber,
               abs(l_quantity - 25) AS abs_dev,
               CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
               CAST(floor(l_quantity / 7) AS BIGINT) AS q_div7,
               round(sqrt(l_quantity), 6) AS sqrt_q,
               round(ln(l_quantity + 1), 6) AS ln_q1,
               round(exp(l_discount), 6) AS exp_d,
               round(pow(l_quantity, 2), 4) AS q_sq,
               CAST(l_partkey % 7 AS BIGINT) AS pk_mod7,
               CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
               greatest(l_quantity, 10.0) AS q_floor10
        FROM lineitem
    """,
    "array_funcs": """
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_distinct,
               CAST(list_contains(string_split(text, ' '), 'spark') AS INT)
                   AS has_spark,
               array_to_string(string_split(text, ' ')[1:5], ' ') AS first5,
               list_min(string_split(text, ' ')) AS min_tok,
               list_max(string_split(text, ' ')) AS max_tok,
               string_split(text, ' ')[-1] AS last_tok,
               len(list_filter(string_split(text, ' '), w -> w != 'the'))
                   AS n_no_the
        FROM documents
    """,
    "json_map_funcs": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               len(json_keys(props)) AS n_keys,
               array_to_string(list_sort(json_keys(props)), ',') AS keys_joined,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_via_path
        FROM events
    """,
}
