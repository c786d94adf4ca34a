"""The reference's ingest pipeline re-expressed as one declarative query
(SURVEY §2.1 R2-R4, R16-R18, R20).

Reference shape (reference app.py:82-150): a sector name selects a seed
keyword list (R3, app.py:37-43), the stock symbol is appended and the
list capped at 8 (R4, app.py:84-89), the keyword disjunction + language
filter is pushed into the source query (R2, app.py:89), and each fetched
row is cleaned and projected into the 4-column record
``{raw -> clean_text, word_count, query_tag}`` with
``query_tag = symbol or sector`` (R17/R18, app.py:118-123), capped at
2,000 rows (R20, app.py:137-138).

Spark-first translation: the sector->keywords dim is a literal DataFrame
broadcast into a theta join on token membership — Catalyst turns the
language filter into a parquet pushdown, and the per-row imperative loop
becomes a single declarative plan.

100 TB notes: the dim is bytes — always broadcast, never shuffled. The
scan side is filtered (lang pushdown) before the join; the match join
duplicates a doc once per matched keyword, which `distinct` on
(doc_id, sector) collapses — bounded by |sectors| per doc. The final cap
is an ordered limit: Spark plans TakeOrderedAndProject (per-partition
top-k, then a single driver merge of k-row heaps — no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import clean_tokens, detokenize, sql_clean_tokens
from ..io import load_table

# Sector -> seed keywords (+ optional stock symbol), the analog of the
# reference's SECTOR_KEYWORDS literal (app.py:37-43). Keywords are drawn
# from the fixture vocabulary so the join is exercised for real.
SECTORS: tuple[tuple[str, tuple[str, ...], str | None], ...] = (
    ("compute", ("hash", "join", "group"), "CMP"),
    ("storage", ("scan", "table", "row"), None),
    ("streaming", ("stream", "window"), "STRM"),
)

MAX_KEYWORDS = 8  # reference caps the augmented list at 8 (app.py:89)
ROW_CAP = 2000  # reference stops at 2,000 collected rows (app.py:137-138)


def _keyword_dim(spark: SparkSession) -> DataFrame:
    """(sector, symbol, kw) — augmented, capped, exploded keyword dim."""
    dim = spark.createDataFrame(
        [(s, list(kws), sym) for s, kws, sym in SECTORS],
        "sector string, keywords array<string>, symbol string",
    )
    # concat (not array_union) so a symbol whose lowercase form already
    # appears in the keyword list is kept as a duplicate — matching the
    # reference's plain list append (app.py:84-86) and the oracle's
    # list_append exactly.
    augmented = F.when(
        F.col("symbol").isNotNull(),
        F.concat("keywords", F.array(F.lower("symbol"))),
    ).otherwise(F.col("keywords"))
    return dim.select(
        "sector",
        "symbol",
        F.explode(F.slice(augmented, 1, MAX_KEYWORDS)).alias("kw"),
    )


def q_ingest_tagged_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """English docs matching any sector keyword, projected to the
    reference's tagged-record shape and capped at 2,000 rows.

    r21 shape (guide §2.3 "aggregate before you shuffle"): the match
    output is collapsed to ONE row per document — first(text) plus a
    collect_set of its (sector, symbol) tags — by a partial-aggregating
    groupBy, so the shuffle moves each document's text once (the old
    `distinct` shuffled it once per matched sector), the regex-heavy
    clean_tokens runs ONCE per matched document instead of once per
    (document, sector) pair, and the tag set is exploded only after the
    cleaned projection is computed. Row set, values, and the ordered cap
    are unchanged: collect_set reproduces the old distinct semantics and
    the final sort keys (query_tag, doc_id) are duplicate-free.
    """
    kw = _keyword_dim(spark)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = docs.select("doc_id", "text", F.split(F.lower("text"), " ").alias("t"))
    per_doc = (
        toks.join(F.broadcast(kw), F.array_contains(F.col("t"), F.col("kw")))
        .groupBy("doc_id")
        .agg(
            F.first("text").alias("text"),
            F.collect_set(F.struct("sector", "symbol")).alias("tags"),
        )
    )
    # The `_nd` column is a pushdown barrier (guide §4.4's trick applied
    # to a built-in pipeline): without it, Catalyst pushes the
    # `word_count > 0` filter below the `ct` projection and re-substitutes
    # the whole regex chain, evaluating clean_tokens TWICE per document
    # (once in the pushed Filter, once in the Project). A nondeterministic
    # sibling makes the projection non-pushable-through, so the filter
    # reads the materialized `ct` instead. `_nd` is never output.
    rec = (
        per_doc.select(
            "doc_id",
            "tags",
            clean_tokens(F.col("text")).alias("ct"),
            F.monotonically_increasing_id().alias("_nd"),
        )
        .select(
            "doc_id",
            "tags",
            detokenize(F.col("ct")).alias("clean_text"),
            F.size("ct").alias("word_count"),
            "_nd",
        )
        .select(
            "doc_id", F.explode("tags").alias("tg"), "clean_text", "word_count", "_nd"
        )
        .select(
            "doc_id",
            F.coalesce(F.col("tg.symbol"), F.col("tg.sector")).alias("query_tag"),
            "clean_text",
            "word_count",
            "_nd",
        )
    )
    return (
        rec.filter(F.col("word_count") > 0)
        .drop("_nd")
        .orderBy("query_tag", "doc_id")
        .limit(ROW_CAP)
    )


QUERIES = {"ingest_tagged_records": q_ingest_tagged_records}

_DIM_VALUES = ", ".join(
    "('{s}', [{kws}], {sym})".format(
        s=s,
        kws=", ".join(f"'{k}'" for k in kws),
        sym=f"'{sym}'" if sym is not None else "NULL",
    )
    for s, kws, sym in SECTORS
)

ORACLES = {
    "ingest_tagged_records": f"""
        WITH dim(sector, keywords, symbol) AS (VALUES {_DIM_VALUES}),
        kw AS (
            SELECT sector, symbol, unnest(
                (CASE WHEN symbol IS NOT NULL
                      THEN list_append(keywords, lower(symbol))
                      ELSE keywords END)[1:{MAX_KEYWORDS}]) AS kw
            FROM dim
        ),
        docs AS (
            SELECT doc_id, text, string_split(lower(text), ' ') AS t
            FROM documents WHERE lang = 'en'
        ),
        matched AS (
            SELECT DISTINCT doc_id, text, sector, symbol
            FROM docs JOIN kw ON list_contains(t, kw)
        ),
        rec AS (
            SELECT doc_id,
                   coalesce(symbol, sector) AS query_tag,
                   array_to_string({sql_clean_tokens("text")}, ' ') AS clean_text,
                   len({sql_clean_tokens("text")}) AS word_count
            FROM matched
        )
        SELECT * FROM rec WHERE word_count > 0
        ORDER BY query_tag, doc_id LIMIT {ROW_CAP}
    """,
}
