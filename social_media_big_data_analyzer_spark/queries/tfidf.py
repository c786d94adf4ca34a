"""Long-form TF-IDF with sklearn semantics (SURVEY §2.1 R23-R27,
reference app.py:156-166).

The reference feeds cleaned text to ``TfidfVectorizer(max_features=200)``
and ranks terms by the column mean of the dense matrix. Re-expressed
relationally (the long form — no dense matrix ever materializes):

1. tf(d, t)  = token count of t in doc d (explode + groupBy)
2. vocab     = top-200 terms by corpus count, ties (count desc, term asc)
3. idf(t)    = ln((1 + N) / (1 + df(t))) + 1        (smooth_idf)
4. w(d, t)   = tf * idf, L2-normalized per doc over vocab terms
5. score(t)  = sum_d w(d, t) / N                    (mean incl. zero rows)

Scale shape: tf and df are partial-aggregated map-side; the 200-term vocab
is TakeOrderedAndProject then BROADCAST into the weight join, so the only
big shuffles are the two groupBys on (doc_id, term) and (doc_id) — both
well-distributed keys. N is a scalar aggregate, not a collect of rows.

r21: the per-doc L2 norm is a window over doc_id instead of a
groupBy(doc_id) + self-join. The self-join form made Catalyst materialize
the tokenize+tf subtree on BOTH join branches — the physical plan scanned
`documents` and re-ran the explode+aggregate FOUR times (norm branch,
weight branch, and the vocab subtree under each). The window form has one
weight lineage (2 scans total: weights + the vocab broadcast branch) and
one fewer join. Same formula, same rounding; sum order inside the norm is
engine-arbitrary in both forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cleaning import split_tokens, sql_clean_tokens, token_keep
from ..io import load_table

VOCAB_SIZE = 200


def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # one scalar job; the only driver-side value

    tokens = docs.select(
        "doc_id", F.explode(split_tokens(F.col("text"))).alias("term")
    ).filter(token_keep(F.col("term")))  # codegen filter post-explode (r22)
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("term").agg(
        F.sum("tf").alias("total"), F.count(F.lit(1)).alias("df")
    )
    vocab = (
        stats.orderBy(F.desc("total"), F.asc("term"))
        .limit(VOCAB_SIZE)
        .withColumn(
            "idf",
            F.log((F.lit(1.0) + n_docs) / (F.lit(1.0) + F.col("df"))) + 1.0,
        )
        .select("term", "idf")
    )
    w = tf.join(F.broadcast(vocab), "term").withColumn(
        "wt", F.col("tf") * F.col("idf")
    )
    w_doc = Window.partitionBy("doc_id")
    normalized = w.withColumn(
        "nwt", F.col("wt") / F.sqrt(F.sum(F.col("wt") * F.col("wt")).over(w_doc))
    )
    return (
        normalized.groupBy("term")
        .agg(F.round(F.sum("nwt") / n_docs, 6).alias("score"))
    )


QUERIES = {"tfidf_topterms": q_tfidf_topterms}

ORACLES = {
    "tfidf_topterms": f"""
        WITH tokens AS (
            SELECT doc_id, unnest({sql_clean_tokens('text')}) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM tokens GROUP BY doc_id, term
        ),
        stats AS (
            SELECT term, sum(tf) AS total, count(*) AS df
            FROM tf GROUP BY term
        ),
        n AS (SELECT count(*) AS n_docs FROM documents),
        vocab AS (
            SELECT term,
                   ln((1.0 + (SELECT n_docs FROM n)) / (1.0 + df)) + 1.0 AS idf
            FROM stats
            ORDER BY total DESC, term ASC
            LIMIT {VOCAB_SIZE}
        ),
        w AS (
            SELECT tf.doc_id, tf.term, tf.tf * vocab.idf AS wt
            FROM tf JOIN vocab USING (term)
        ),
        norms AS (
            SELECT doc_id, sqrt(sum(wt * wt)) AS norm
            FROM w GROUP BY doc_id
        )
        SELECT term,
               round(sum(wt / norm) / (SELECT n_docs FROM n), 6) AS score
        FROM w JOIN norms USING (doc_id)
        GROUP BY term
    """,
}
