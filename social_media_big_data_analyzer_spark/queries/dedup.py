"""Near-duplicate detection queries over `documents` (C22-C23; the
LLM-pipeline dedup mandate). Exact dedup (`dedup_docs`) lives in the
driver entry; here:

- ``ngram_jaccard_pairs`` — exact n-gram Jaccard via a shingle
  inverted-index join (SQL-oracle-verified ground truth),
- ``minhash_near_dups`` — MinHash-LSH banding, candidates verified with
  exact Jaccard (rows-only for the driver; tests/ bounds recall against
  the ground-truth query),
- ``simhash_near_dups`` — 64-bit SimHash with pigeonhole chunk banding
  (rows-only; tests/ checks consistency with Jaccard ground truth).

100 TB notes: all three avoid the O(n^2) all-pairs scan. The inverted
index joins on shingle (frequent-shingle skew → df-cap the posting list);
MinHash/SimHash join on fixed-width band values, so the shuffle is
signature-sized and the exact verification only touches candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.sketches import (
    SHINGLE_K,
    band_values,
    minhash_signature,
    shingle_hashes,
    simhash64,
    simhash_chunks,
    word_shingles,
)

JACCARD_THRESHOLD = 0.4
HAMMING_MAX = 3


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", word_shingles(F.col("text")).alias("shingles")
    ).filter(F.size("shingles") > 0)


def _verified_pairs(cand: DataFrame, sh: DataFrame) -> DataFrame:
    """Join candidate id pairs back to shingle sets; exact Jaccard filter."""
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    jacc = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("raw_j", jacc)
        .filter(F.col("raw_j") >= JACCARD_THRESHOLD)  # filter BEFORE rounding,
        # matching the oracle: both engines compare the identical exact ratio
        .select("id_a", "id_b", F.round("raw_j", 6).alias("jaccard"))
    )


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup ground truth: every pair sharing >= 1 shingle,
    kept if Jaccard >= 0.4. Candidate generation is the inverted-index
    equi-join, never a cross join."""
    sh = _shingled(spark, sf_dir)
    inv = sh.select("doc_id", F.explode("shingles").alias("s"))
    cand = (
        inv.alias("a")
        .join(inv.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    return _verified_pairs(cand, sh)


def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH: 16 permutations, 8 bands x 2 rows; band-bucket join
    produces candidates, exact Jaccard verifies. Output schema matches
    the ground-truth query so recall is directly measurable."""
    sh = _shingled(spark, sf_dir)
    banded = sh.select(
        "doc_id",
        "shingles",
        F.posexplode(band_values(minhash_signature(shingle_hashes(F.col("shingles"))))).alias(
            "band_idx", "band_val"
        ),
    )
    left = banded.select(
        F.col("doc_id").alias("id_a"), "band_idx", "band_val"
    )
    right = banded.select(
        F.col("doc_id").alias("id_b"), "band_idx", "band_val"
    )
    cand = (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verified_pairs(cand, sh)


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: 64-bit signature over shingle hashes; pairs sharing any
    16-bit chunk are candidates; keep hamming distance <= 3 (pigeonhole
    guarantees recall is exact for that radius)."""
    sh = _shingled(spark, sf_dir)
    sig = sh.select(
        "doc_id", simhash64(shingle_hashes(F.col("shingles"))).alias("sig")
    )
    chunked = sig.select(
        "doc_id", "sig", F.posexplode(simhash_chunks(F.col("sig"))).alias("ci", "cv")
    )
    a = chunked.select(
        F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"), "ci", "cv"
    )
    b = chunked.select(
        F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"), "ci", "cv"
    )
    return (
        a.join(b, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= HAMMING_MAX)
    )


QUERIES = {
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "minhash_near_dups": q_minhash_near_dups,
    "simhash_near_dups": q_simhash_near_dups,
}

_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, len(t) - {km1}), "
    "i -> list_reduce(t[i:i + {km1}], (a, b) -> a || ' ' || b)))"
).format(km1=SHINGLE_K - 1)

ORACLES = {
    "ngram_jaccard_pairs": f"""
        WITH toks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        ),
        sh AS (
            SELECT doc_id, {_SHINGLES} AS shingles
            FROM toks WHERE len(t) >= {SHINGLE_K}
        ),
        inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
        )
        SELECT id_a, id_b,
               round(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
                     / len(list_distinct(x.shingles || y.shingles)), 6) AS jaccard
        FROM cand
        JOIN sh x ON cand.id_a = x.doc_id
        JOIN sh y ON cand.id_b = y.doc_id
        WHERE CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
              / len(list_distinct(x.shingles || y.shingles)) >= {JACCARD_THRESHOLD}
    """,
}
