"""Similarity search over an embedding column (array<float>).

* ``cosine_topk``   — brute-force exact top-k: broadcast the (small) query
  set against the corpus; cosine computed with a strict left-to-right
  ``F.aggregate`` fold in float64, so the result is deterministic and
  mirrors the DuckDB oracle bit-for-bit (both engines fold sequentially;
  final values rounded to 6dp for cross-engine hashing).
* ``cosine_neardup_pairs`` — all pairs above a cosine threshold by direct
  comparison. QUADRATIC — small-N / per-bucket building block only; the
  production near-dup detector is ``cosine_neardup_pairs_lsh``.
* ``cosine_neardup_pairs_lsh`` — the scale path: banded random-hyperplane
  LSH (OR-amplification). ``bands`` independent signatures of
  ``planes_per_band`` hyperplane sign bits each; candidates = pairs
  sharing any band's full bucket, then the exact cosine filter. With
  r=8, b=6 (defaults): recall ≈ 0.99 at cos 0.97, ≈ 0.95 at cos 0.95,
  while unrelated pairs (cos ≈ 0) collide on a band with p ≈ 0.5^8 so
  only ~2% survive to the exact check — never an all-pairs join. At
  larger corpus scale raise planes_per_band (bucket count grows 2^r)
  and bands together to hold recall while keeping buckets selective.
* ``lsh_topk``      — random-hyperplane ANN top-k. Hyperplane h's side
  bit = sign of dot(v, p_h) where p_h components are deterministic
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
NEARDUP_THRESHOLD = 0.95
NEARDUP_BANDS = 6
NEARDUP_PLANES_PER_BAND = 8
# near-dup-enriched fixture parameters (deterministic, oracle-reproducible)
NEARDUP_DUP_MOD = 10
NEARDUP_DUP_OFFSET = 1_000_000
NEARDUP_DUP_DELTA = 0.25


def embedding_dim(embeddings: DataFrame, vec_col: str = "embedding") -> int:
    """Actual embedding length from the data — callers must not guess the
    dim: a wrong dim makes zip_with null-pad and every dot() null."""
    row = embeddings.select(F.size(vec_col).alias("d")).first()
    if row is None:
        return 0
    return row.d


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
    return _bucket_from_planes(vec_col, dim, range(n_planes), seed)


def neardup_enriched_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dup_mod: int = NEARDUP_DUP_MOD,
    dup_offset: int = NEARDUP_DUP_OFFSET,
    delta: float = NEARDUP_DUP_DELTA,
) -> DataFrame:
    """(vec_id, embedding double[]) with a deterministic perturbed copy of
    every ``dup_mod``-th vector appended (copy id = id + dup_offset; first
    coordinate shifted by ``delta`` → cos ≈ 0.97 against unit vectors).

    The testdata embeddings are near-random (no pair above cos 0.5), so
    this derived fixture gives the near-dup detector true positives that
    the DuckDB oracle can regenerate exactly — the same discipline as the
    derived graph tables (plans/derived_graph.py).
    """
    emb = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("embedding")
    )
    dups = emb.where(F.col("vec_id") % dup_mod == 0).select(
        (F.col("vec_id") + dup_offset).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(delta)),
            F.slice("embedding", 2, F.size("embedding") - 1),
        ).alias("embedding"),
    )
    return emb.unionAll(dups)


def cosine_neardup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = NEARDUP_THRESHOLD,
    bands: int = NEARDUP_BANDS,
    planes_per_band: int = NEARDUP_PLANES_PER_BAND,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """(a, b, cos) with a < b and cos >= threshold, candidates restricted to
    pairs sharing at least one LSH band bucket (OR-amplified banding, the
    MinHash-LSH shape applied to hyperplane signatures).

    Plan: bucket assignment is a narrow projection (bands·r dot products
    per row); per band a self-equi-join on (band, bucket); candidate pair
    dedup; then two V-sized joins fetch the vectors for the exact cosine.
    No stage is ever keyed on fewer than bands·2^r values.
    """
    if dim is None:
        dim = embedding_dim(embeddings, vec_col)
    emb = embeddings.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    band_structs = [
        F.struct(
            F.lit(t).alias("band"),
            # band t uses plane indices t*r .. t*r+r-1 — independent bands
            _bucket_from_planes(
                F.col("v"), dim, range(t * planes_per_band, (t + 1) * planes_per_band), seed
            ).alias("bucket"),
        )
        for t in range(bands)
    ]
    # materialized once (round-7): both sides of the bucket self-join read
    # this frame — without the barrier the bands·r hyperplane dot products
    # per row run twice. (id, band, bucket) is three longs per band row.
    bk = (
        emb.select("id", F.explode(F.array(*band_structs)).alias("bk"))
        .select("id", "bk.band", "bk.bucket")
        .localCheckpoint(eager=True)
    )
    cand = (
        bk.alias("x")
        .join(bk.alias("y"), ["band", "bucket"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    va = emb.select(F.col("id").alias("a"), F.col("v").alias("va"))
    vb = emb.select(F.col("id").alias("b"), F.col("v").alias("vb_"))
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .select("a", "b", F.round(cosine(F.col("va"), F.col("vb_")), 6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def _bucket_from_planes(vec_col, dim: int, plane_indices, seed: int = 42) -> Column:
    """Bucket id from the sign bits of the given hyperplane indices."""
    bucket = F.lit(0)
    for i, p in enumerate(plane_indices):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, p, seed)])
        bit = F.when(dot(vec_col, plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dim: int | None = None,
    n_planes: int = LSH_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    if dim is None:
        dim = embedding_dim(embeddings, vec_col)
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


IVF_MIN_CENT_MOD = 31  # floor: below ~1k vectors a coarser codebook is noise
IVF_NPROBE = 2


def ivf_cent_mod(n: int) -> int:
    """Stats-driven codebook stride: ``cent_mod ≈ √n`` so the codebook has
    C = n/cent_mod ≈ √n centroids — standard IVF sizing. This bounds the
    assignment pass at n·√n cosine evaluations and the broadcast at √n
    vectors (a FIXED cent_mod makes C grow linearly: quadratic assignment
    compute and an unbounded broadcast — the round-5 scale flaw). Pure
    function of the corpus count, so the DuckDB oracle regenerates the
    identical codebook from the same COUNT(*); floor(sqrt) is IEEE-double
    correctly-rounded in both engines, so the derived stride can't differ.
    The same stats→parameters discipline as sampling.choose_salts (the
    reference's analogue: the model-builder stats pass,
    /root/reference/src/ans/model4encoder_builder.rs:80-271)."""
    import math

    return max(IVF_MIN_CENT_MOD, int(math.floor(math.sqrt(float(max(0, n))))))


def ivf_assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """(vb, v, cid) — each vector's nearest-centroid inverted-list key.

    Broadcast the codebook, score all C candidates per vector, then
    argmax (6dp-rounded cosine desc, cid asc) via max(struct(ac, -cid))
    — a map-side partial_max, so the n×C scored rows collapse locally
    and the single exchange carries n narrow rows (plan-audited)."""
    scored_asg = emb.crossJoin(F.broadcast(cents)).select(
        "vb",
        "v",
        "cid",
        F.round(cosine(F.col("v"), F.col("cv")), 6).alias("ac"),
    )
    return (
        scored_asg.groupBy("vb")
        .agg(
            F.max(F.struct(F.col("ac"), (-F.col("cid")).alias("ncid"))).alias("m"),
            F.first("v").alias("v"),
        )
        .select("vb", "v", (-F.col("m.ncid")).alias("cid"))
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    cent_mod: int | None = None,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: the inverted-file scale path.

    Coarse quantizer: a deterministic sampled codebook (every vector with
    ``vec_id % cent_mod == 0``) instead of a trained k-means one — the
    training-free IVF variant; the codebook is a pure function of the
    data so the DuckDB oracle regenerates it (the same reproducibility
    trick as lsh_topk's seeded hyperplanes). ``cent_mod`` defaults to the
    stats-derived ``ivf_cent_mod(count)`` ≈ √n so the codebook holds
    C ≈ √n centroids at ANY corpus size. Every vector joins the inverted
    list of its nearest centroid (argmax cosine, 6dp-rounded with
    centroid-id tie-break so the assignment is engine-portable); queries
    probe their ``nprobe`` nearest lists and re-rank candidates by exact
    cosine.

    Scale shape: the codebook broadcasts (C ≈ √n ≪ n); assignment is a
    broadcast join whose n×C rows collapse to n via a MAP-SIDE partial
    max (each vector's C candidate rows live in one task), so the only
    exchange carries n narrow rows and the assignment pass does n·√n
    cosine evaluations total. Candidate generation touches nprobe/C of
    the corpus per query instead of all of it — the IVF contract — and
    never an all-pairs join.
    """
    emb = embeddings.select(
        F.col(id_col).alias("vb"), _as_double(F.col(vec_col)).alias("v")
    )
    if cent_mod is None:
        # one metadata-cheap count — the stats pass that sizes the codebook
        cent_mod = ivf_cent_mod(emb.count())
    cents = emb.where(F.col("vb") % cent_mod == 0).select(
        F.col("vb").alias("cid"), F.col("v").alias("cv")
    )
    # materialized once (round-7): the assignment is the n·√n cosine pass
    # — it feeds BOTH the query-probe derivation and the candidate scoring
    # join, and without the barrier it executed twice per call
    assigned = ivf_assign(emb, cents).localCheckpoint(eager=True)
    q = assigned.where(F.col("vb").isin(query_ids)).select(
        F.col("vb").alias("qa"), F.col("v").alias("qv")
    )
    qprobe = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "qa", "qv", "cid", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("ac")
        )
    )
    wq = Window.partitionBy("qa").orderBy(F.desc("ac"), F.asc("cid"))
    probes = (
        qprobe.withColumn("prn", F.row_number().over(wq))
        .where(F.col("prn") <= nprobe)
        .select("qa", "qv", "cid")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cid")
        .where(F.col("qa") != F.col("vb"))
        .select("qa", "vb", F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos"))
    )
    w = Window.partitionBy("qa").orderBy(F.desc("cos"), F.asc("vb"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qa", "vb", "cos", F.col("rn").cast("long").alias("rn"))
    )
