"""Text-analytics queries over the `documents` table: the reference's
cleaning + frequency pipeline (SURVEY §2.1 R5-R16, R28-R30) and the
LLM-pipeline text-analysis suite (§2.2 C26): language ID, quality
scoring, token counting, fingerprinting, lemmatized frequency.

All hot paths are JVM Column expressions; the lemmatizer is the one
Arrow-batched Pandas UDF (R13/C38). Each oracle is generated from the
same Python constants as the Spark expressions (one source of truth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import (
    STOPWORDS,
    clean_tokens,
    split_tokens,
    sql_clean_tokens,
    sql_stoplist,
    token_keep,
)
from ..functions.lemmatize import SQL_LEMMA_CASE, lemmatize_udf
from ..io import load_table

_PUNCT_RE = "[.,!?;:]"
_BPE_RE = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"

_EN = ("the", "and", "for", "with", "that", "this", "from", "have", "are", "was")
_ES = ("que", "los", "las", "una", "por", "para", "con", "del", "como", "pero")
_FR = ("les", "des", "une", "est", "dans", "pour", "sur", "pas", "vous", "nous")


def _sql_list(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def q_clean_tokens_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference flagship: clean -> tokenize -> frequency top-200
    (reference app.py:47-57 cleaning, app.py:167-169 Counter.most_common).

    explode -> groupBy(word) partial-aggregates map-side, so the shuffle
    carries one row per (partition, word), not per token; the top-200 is
    TakeOrderedAndProject (per-partition heaps, no global sort).

    r22: the keep-filter runs post-explode in codegen (token_keep)
    instead of as an interpreted ArrayFilter — same row multiset.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(split_tokens(F.col("text"))).alias("word"))
        .filter(token_keep(F.col("word")))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(200)
    )


def q_doc_word_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document kept-word count, empty docs dropped (R15, R16) —
    the reference's `word_count`/`word_len > 0` gate (app.py:114-116)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.size(clean_tokens(F.col("text"))).alias("word_count"),
        )
        .filter(F.col("word_count") > 0)
    )


def q_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (C26): count distinct marker hits per
    language over whitespace tokens, argmax with fixed tie order."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in (("en", _EN), ("es", _ES), ("fr", _FR))
    }
    predicted = (
        F.when(
            (hits["en"] + hits["es"] + hits["fr"]) == 0, F.lit("unknown")
        )
        .when((hits["en"] >= hits["es"]) & (hits["en"] >= hits["fr"]), F.lit("en"))
        .when(hits["es"] >= hits["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return docs.select(
        "doc_id",
        "lang",
        hits["en"].alias("hits_en"),
        hits["es"].alias("hits_es"),
        hits["fr"].alias("hits_fr"),
        predicted.alias("predicted"),
    )


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (C26): length, punctuation ratio, stopword ratio,
    average token length, composite score — all closed-form so the oracle
    can reproduce every double exactly."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda w: F.length(w) > 0)
    n_tok = F.size(toks)
    n_chars = F.length("text")
    punct = F.regexp_count(F.col("text"), F.lit(_PUNCT_RE))
    stop_hits = F.size(
        F.filter(
            F.split(F.lower(F.col("text")), r"\s+"),
            lambda w: w.isin(*STOPWORDS),
        )
    )
    avg_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0).cast("double"), lambda acc, w: acc + F.length(w))
        / n_tok,
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    score = (
        F.least(n_tok / F.lit(50.0), F.lit(1.0)) * (1 - punct_ratio) * (1 - stop_ratio)
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (C26): whitespace tokens and BPE-ish word pieces
    (letter runs / single digits / single symbols) per document."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda w: F.length(w) > 0))
    pieces = F.regexp_count(F.col("text"), F.lit(_BPE_RE))
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        pieces.alias("bpe_pieces"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (C26): md5 of whitespace-normalized
    lowercased text. Identical bytes hash identically on any engine, so
    this is also the exact-dedup key at 100 TB (hash first, compare the
    16-byte digest, never shuffle full documents)."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))


def q_lemma_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lemmatized token frequency (R13 + R28-R30) through the Arrow
    pandas_udf; top-100 lemmas.

    Scale shape: count words FIRST (JVM-side, map-side combined), then
    lemmatize the distinct vocabulary and re-aggregate — the Python UDF
    touches |vocab| rows instead of |corpus| tokens, which at 100 TB is
    the difference between a seconds-long stage and an Arrow firehose.
    """
    docs = load_table(spark, sf_dir, "documents")
    word_counts = (
        docs.select(F.explode(split_tokens(F.col("text"))).alias("w"))
        .filter(token_keep(F.col("w")))  # codegen filter post-explode (r22)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        word_counts.select(lemmatize_udf(F.col("w")).alias("lemma"), "c")
        .groupBy("lemma")
        .agg(F.sum("c").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("lemma"))
        .limit(100)
    )


QUERIES = {
    "clean_tokens_freq": q_clean_tokens_freq,
    "doc_word_stats": q_doc_word_stats,
    "lang_id_heuristic": q_lang_id_heuristic,
    "doc_quality": q_doc_quality,
    "token_count": q_token_count,
    "doc_fingerprint": q_doc_fingerprint,
    "lemma_freq": q_lemma_freq,
}

_TOKS = "list_filter(string_split_regex(text, '\\s+'), w -> len(w) > 0)"
_LOW_TOKS = "string_split_regex(lower(text), '\\s+')"

ORACLES = {
    "clean_tokens_freq": f"""
        SELECT word, count(*) AS freq
        FROM (SELECT unnest({sql_clean_tokens('text')}) AS word FROM documents)
        GROUP BY word
        ORDER BY freq DESC, word ASC
        LIMIT 200
    """,
    "doc_word_stats": f"""
        SELECT doc_id, len({sql_clean_tokens('text')}) AS word_count
        FROM documents
        WHERE len({sql_clean_tokens('text')}) > 0
    """,
    "lang_id_heuristic": f"""
        WITH t AS (
            SELECT doc_id, lang,
                   len(list_intersect({_LOW_TOKS}, {_sql_list(_EN)})) AS hits_en,
                   len(list_intersect({_LOW_TOKS}, {_sql_list(_ES)})) AS hits_es,
                   len(list_intersect({_LOW_TOKS}, {_sql_list(_FR)})) AS hits_fr
            FROM documents
        )
        SELECT doc_id, lang, hits_en, hits_es, hits_fr,
               CASE
                   WHEN hits_en + hits_es + hits_fr = 0 THEN 'unknown'
                   WHEN hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
                   WHEN hits_es >= hits_fr THEN 'es'
                   ELSE 'fr'
               END AS predicted
        FROM t
    """,
    "doc_quality": f"""
        WITH t AS (
            SELECT doc_id,
                   len({_TOKS}) AS n_tok,
                   len(text) AS n_chars,
                   len(regexp_extract_all(text, '{_PUNCT_RE}')) AS punct,
                   len(list_filter({_LOW_TOKS},
                       w -> list_contains({sql_stoplist()}, w))) AS stop_hits,
                   CASE WHEN len({_TOKS}) > 0 THEN
                       CAST(list_sum(list_transform({_TOKS}, w -> len(w))) AS DOUBLE)
                           / len({_TOKS})
                   ELSE 0.0 END AS avg_len
            FROM documents
        )
        SELECT doc_id, n_tok AS n_tokens,
               round(avg_len, 6) AS avg_token_len,
               round(CASE WHEN n_chars > 0
                          THEN CAST(punct AS DOUBLE) / n_chars ELSE 0.0 END, 6)
                   AS punct_ratio,
               round(CASE WHEN n_tok > 0
                          THEN CAST(stop_hits AS DOUBLE) / n_tok ELSE 0.0 END, 6)
                   AS stopword_ratio,
               round(least(CAST(n_tok AS DOUBLE) / 50.0, 1.0)
                     * (1 - CASE WHEN n_chars > 0
                                 THEN CAST(punct AS DOUBLE) / n_chars ELSE 0.0 END)
                     * (1 - CASE WHEN n_tok > 0
                                 THEN CAST(stop_hits AS DOUBLE) / n_tok ELSE 0.0 END),
                     6) AS quality
        FROM t
    """,
    "token_count": f"""
        SELECT doc_id,
               len({_TOKS}) AS ws_tokens,
               len(regexp_extract_all(text, '{_BPE_RE}')) AS bpe_pieces
        FROM documents
    """,
    "doc_fingerprint": """
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
        FROM documents
    """,
    "lemma_freq": f"""
        SELECT lemma, count(*) AS freq
        FROM (
            SELECT {SQL_LEMMA_CASE} AS lemma
            FROM (SELECT unnest({sql_clean_tokens('text')}) AS w FROM documents)
        )
        GROUP BY lemma
        ORDER BY freq DESC, lemma ASC
        LIMIT 100
    """,
}
