"""Embedding similarity search over `embeddings` (C24; LLM-pipeline
similarity mandate).

- ``cosine_topk`` — brute-force cosine top-5 for each probe vector,
  entirely in JVM expressions (zip_with product, sequential double fold)
  so the oracle's explicit fold reproduces every double bit-for-bit.
- ``ann_lsh_topk`` — random-hyperplane LSH variant: 4 fixed signed
  hyperplanes bucket the vectors; top-5 is computed over buckets within
  Hamming radius 2 of the probe's bucket (multi-probe). Rows-only for
  the driver; tests/ asserts a recall floor against ``cosine_topk``.

100 TB shape: probes are broadcast (they are the small side by
construction); the brute-force scan is embarrassingly parallel over
vector partitions with a per-partition top-k (window) before the final
merge. The LSH variant cuts the scanned fraction to ~1/2^planes per bucket; the production path would also store bucket as a partition column
so probe lookups prune files entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table

TOP_K = 5
N_PLANES = 4
_DIM = 64

# Deterministic +/-1 hyperplanes — signs from md5 of (plane, dim), so the
# planes are fixed, independent, and free of the arithmetic-parity
# degeneracy a linear formula would have (no runtime randomness either).
import hashlib as _hashlib  # noqa: E402

PLANES = [
    [
        1 if int(_hashlib.md5(f"{p},{d}".encode()).hexdigest(), 16) & 1 else -1
        for d in range(_DIM)
    ]
    for p in range(N_PLANES)
]


def _dcast(c: Column) -> Column:
    return c.cast("double")


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold double dot product — order-deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _dcast(x) * _dcast(y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + _dcast(v) * _dcast(v))
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Norms are precomputed per ROW before the cross join (they'd
    # otherwise be re-folded once per PAIR — 2x|probes| redundant passes
    # per vector). dot/(na*nb) multiplies the same doubles in the same
    # order, so results are bit-identical to the inline form.
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    probes = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
        F.col("nrm").alias("probe_nrm"),
    )
    scored = emb.crossJoin(F.broadcast(probes)).select(
        "probe_id",
        "vec_id",
        (
            _dot(F.col("probe_vec"), F.col("embedding"))
            / (F.col("probe_nrm") * F.col("nrm"))
        ).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("probe_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-k with multi-probe candidate
    generation. Rows-only (bucketing is engine-specific float math)."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    bucket_expr = None
    for p in range(N_PLANES):
        plane = F.array(*[F.lit(v) for v in PLANES[p]])
        bit = F.when(_dot(F.col("embedding"), plane) >= 0, 1).otherwise(0)
        contrib = bit * F.lit(1 << p)
        bucket_expr = contrib if bucket_expr is None else bucket_expr + contrib
    bucketed = emb.withColumn("bucket", bucket_expr)
    probes = bucketed.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
        F.col("bucket").alias("probe_bucket"),
        F.col("nrm").alias("probe_nrm"),
    )
    # Multi-probe radius 2: scan buckets differing in at most two planes.
    # With near-orthogonal vectors the per-plane collision probability is
    # ~0.6, so radius 2 is what lifts recall to ~0.8 — the classic
    # quality-vs-scanned-fraction dial (tests/ asserts the recall floor).
    scored = bucketed.join(
        F.broadcast(probes),
        F.bit_count(F.col("bucket").bitwiseXOR(F.col("probe_bucket"))) <= 2,
    ).select(
        "probe_id",
        "vec_id",
        (
            _dot(F.col("probe_vec"), F.col("embedding"))
            / (F.col("probe_nrm") * F.col("nrm"))
        ).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("probe_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )


QUERIES = {
    "cosine_topk": q_cosine_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
}

_FOLD_DOT = (
    "list_sum(list_transform(generate_series(1, {dim}), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _sql_cos(a: str, b: str) -> str:
    dot = _FOLD_DOT.format(dim=_DIM, a=a, b=b)
    na = _FOLD_DOT.format(dim=_DIM, a=a, b=a)
    nb = _FOLD_DOT.format(dim=_DIM, a=b, b=b)
    return f"{dot} / (sqrt({na}) * sqrt({nb}))"


ORACLES = {
    "cosine_topk": f"""
        WITH probes AS (
            SELECT vec_id AS probe_id, embedding AS probe_vec
            FROM embeddings WHERE vec_id % 100 = 0
        ),
        scored AS (
            SELECT probe_id, vec_id,
                   {_sql_cos('probe_vec', 'embedding')} AS cos
            FROM embeddings CROSS JOIN probes
        )
        SELECT probe_id, vec_id, round(cos, 6) AS cos, rank
        FROM (
            SELECT probe_id, vec_id, cos,
                   row_number() OVER (PARTITION BY probe_id
                       ORDER BY cos DESC, vec_id ASC) AS rank
            FROM scored
        )
        WHERE rank <= {TOP_K}
    """,
}
