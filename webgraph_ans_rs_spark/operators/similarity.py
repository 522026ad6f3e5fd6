"""Similarity search over an embedding column (array<float>).

* ``cosine_topk``   — brute-force exact top-k: broadcast the (small) query
  set against the corpus; cosine computed with a strict left-to-right
  ``F.aggregate`` fold in float64, so the result is deterministic and
  mirrors the DuckDB oracle bit-for-bit (both engines fold sequentially;
  final values rounded to 6dp for cross-engine hashing).
* ``cosine_neardup_pairs`` — all pairs above a cosine threshold (the
  embedding near-duplicate detector). Quadratic; intended for per-bucket
  use after LSH partitioning at scale.
* ``lsh_topk``      — the scale path: random-hyperplane LSH. Hyperplane h's
  side bit = sign of dot(v, p_h) where p_h components are deterministic
  ±1 from md5(h, dim) — reproducible with no stored model. Candidates come
  from the same-bucket join only, so cost is O(n·k + bucket²) instead of
  O(n²). Exactness is traded for recall (property-tested against the
  brute-force path).

At 100 TB the corpus side stays partitioned; only queries broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import h64

LSH_PLANES = 8


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Strict sequential fold — deterministic float64 dot product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a, b) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(qa, vb, cos) — top-k corpus neighbors per query id (self excluded);
    ordering by (rounded cos desc, vb asc) is deterministic cross-engine."""
    emb = embeddings.select(
        F.col(id_col).alias("vb"), _as_double(F.col(vec_col)).alias("v")
    )
    q = emb.where(F.col("vb").isin(query_ids)).select(
        F.col("vb").alias("qa"), F.col("v").alias("qv")
    )
    scored = (
        emb.join(F.broadcast(q))
        .where(F.col("qa") != F.col("vb"))
        .select("qa", "vb", F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos"))
    )
    w = Window.partitionBy("qa").orderBy(F.desc("cos"), F.asc("vb"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qa", "vb", "cos", F.col("rn").cast("long").alias("rn"))
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, cos) with a < b and cos >= threshold (rounded 6dp)."""
    emb = embeddings.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    x = emb.select(F.col("id").alias("a"), F.col("v").alias("va"))
    y = emb.select(F.col("id").alias("b"), F.col("v").alias("vb_"))
    return (
        x.join(y, F.col("a") < F.col("b"))
        .select("a", "b", F.round(cosine(F.col("va"), F.col("vb_")), 6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def _hyperplane(dim: int, plane: int, seed: int = 42) -> list[float]:
    """Deterministic ±1 hyperplane — pure function of (seed, plane, dim)."""
    return [1.0 if h64(seed, "lsh", plane, d) % 2 == 0 else -1.0 for d in range(dim)]


def lsh_bucket(vec_col, dim: int, n_planes: int = LSH_PLANES, seed: int = 42) -> Column:
    """Bucket id in [0, 2^n_planes) from hyperplane sign bits."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, p, seed)])
        bit = F.when(dot(vec_col, plane) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dim: int = 64,
    n_planes: int = LSH_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    emb = embeddings.select(
        F.col(id_col).alias("vb"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("bucket", lsh_bucket(F.col("v"), dim, n_planes))
    q = emb.where(F.col("vb").isin(query_ids)).select(
        F.col("vb").alias("qa"), F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    scored = (
        emb.join(F.broadcast(q), emb["bucket"] == F.col("qbucket"))
        .where(F.col("qa") != F.col("vb"))
        .select("qa", "vb", F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos"))
    )
    w = Window.partitionBy("qa").orderBy(F.desc("cos"), F.asc("vb"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qa", "vb", "cos", F.col("rn").cast("long").alias("rn"))
    )
