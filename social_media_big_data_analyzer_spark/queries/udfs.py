"""Python execution surfaces (SURVEY §2.2 C25, C38, C39, C40): the
multimodal mapInPandas pipeline, a grouped-aggregate pandas UDAF, and a
Python UDTF — each the Arrow-batched form, never row-at-a-time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.multimodal import extract_binary_meta, with_binary_payload

CHUNK_TOKENS = 10


def q_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C25: binary payload -> mapInPandas metadata extraction. The
    payload is UTF-8 text bytes (no media libs in container); schema,
    batching, and partition behavior are the real multimodal path."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_binary_meta(with_binary_payload(docs))


from pyspark.sql.types import DoubleType  # noqa: E402


# DoubleType() instance, not the "double" DDL string: string return types
# are parsed through the active SparkSession, which doesn't exist at
# module-import time.
@F.pandas_udf(DoubleType())
def _geomean(v: pd.Series) -> float:
    # Geometric mean via log-space; values are strictly positive prices.
    return float(np.exp(np.log(v.to_numpy()).mean()))


def q_geomean_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C39: grouped-aggregate pandas UDAF (Arrow transfer, one call per
    group). Rounded to 2 decimals: the UDAF's pairwise numpy summation
    and the oracle's sequential sum differ in the last float bits, and 2
    decimals of a ~2e5 value leaves that noise five orders of magnitude
    below the rounding boundary."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(_geomean("o_totalprice"), 2).alias("geomean_price")
    )


def q_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C40: Python UDTF exploding each document into 10-token chunks via
    a SQL LATERAL join."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx int, chunk string")
    class ChunkText:
        def eval(self, doc_id: int, text: str):
            toks = text.split(" ")
            for i in range(0, len(toks), CHUNK_TOKENS):
                yield doc_id, i // CHUNK_TOKENS, " ".join(toks[i : i + CHUNK_TOKENS])

    spark.udtf.register("chunk_text", ChunkText)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents_for_udtf")
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.chunk
        FROM documents_for_udtf d,
             LATERAL chunk_text(d.doc_id, d.text) c
        """
    )


QUERIES = {
    "binary_meta": q_binary_meta,
    "geomean_by_priority": q_geomean_by_priority,
    "chunk_udtf": q_chunk_udtf,
}

ORACLES = {
    "binary_meta": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               sha256(text) AS sha256,
               CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width,
               CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS fake_height
        FROM documents
    """,
    "geomean_by_priority": """
        SELECT o_orderpriority,
               round(exp(avg(ln(o_totalprice))), 2) AS geomean_price
        FROM orders
        GROUP BY o_orderpriority
    """,
    "chunk_udtf": f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        )
        SELECT doc_id,
               CAST(g AS INT) AS chunk_idx,
               array_to_string(
                   toks[g * {CHUNK_TOKENS} + 1 : (g + 1) * {CHUNK_TOKENS}], ' '
               ) AS chunk
        FROM t,
             UNNEST(generate_series(
                 0, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) - 1 AS INT)
             )) AS u(g)
    """,
}
