"""Deduplication operators for large-scale training-data pipelines.

Five dedup families, all shuffle-bounded DataFrame plans (no Python in the
hot path except where noted):

* exact          — hash-groupBy on md5(text); one aggregation.
* ngram Jaccard  — word n-gram shingles → shared-shingle candidate pairs →
                   |∩|/|∪|. The self-join is bounded by dropping shingles
                   with document frequency > MAX_SHINGLE_DF (stop-shingles
                   explode candidate pairs quadratically at web scale —
                   same hub problem as PageRank's high-indegree vertices).
* MinHash + LSH  — k md5-based minhash signatures (lexicographic min over
                   hex digests — a total order both Spark and DuckDB agree
                   on), banded into b keys; candidates = pairs sharing a
                   band bucket. Scale path: cost is O(docs·k) + bucket join,
                   never all-pairs.
* SimHash        — 64-bit signature from per-token md5 nibbles (bit b set
                   iff sum over tokens of (+1/−1) is positive), carried as
                   two 32-bit halves (sim_hi, sim_lo) so no expression ever
                   touches the sign bit (DuckDB rejects 1<<63; Spark ANSI
                   mode errors on long overflow). Near-dups = pairs within
                   Hamming distance ≤ k, found by pigeonhole banding: split
                   the 64 bits into (k+1) exact-match bands — any pair with
                   ≤ k differing bits must agree on ≥ 1 whole band, so
                   candidates come from (k+1) band-bucket joins (64-bit key
                   space, never the all-pairs or 16-bit-key explosion),
                   then the exact Hamming filter (bit_count of xor) keeps
                   true near-dups. This is the standard web-corpus near-dup
                   detector shape (Manku et al., WWW'07).
* embedding cosine — see similarity.py; near-dup = cosine above threshold.

Every operator is mirrored by a DuckDB oracle (plans/oracles_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NGRAM = 3
MAX_SHINGLE_DF = 100  # drop shingles appearing in more docs than this
MINHASH_K = 8
MINHASH_BANDS = 4  # rows per band = MINHASH_K / MINHASH_BANDS = 2
SIMHASH_BITS = 64  # carried as two 32-bit halves (sim_hi, sim_lo)
SIMHASH_HAMMING_K = 3  # near-dup iff Hamming distance <= k → k+1 bands of 16 bits


def exact_dedup(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(fp, keep_id, n_copies) — canonical representative = min id."""
    return (
        docs.select(id_col, F.md5(F.col("text").cast("binary")).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def dedup_resolve(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(fp, keep_id, n_copies, best_quality) — per exact-duplicate cluster,
    keep the highest-quality copy (tie → smallest id).

    The operator real pipelines run after dedup detection: duplicates often
    differ in surrounding boilerplate, so "min id" is the wrong keeper.
    Implemented as a plain aggregation (max_by on a (quality, -id) struct —
    deterministic because ids are unique) rather than a window: an
    aggregation gets map-side partial combining, so a pathological cluster
    (1e9 copies of one page) never lands in a single window partition.
    Quality comes from textstats.quality_score (6dp-rounded, so the
    ordering is engine-portable).
    """
    from .textstats import quality_score

    fp = docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col("text").cast("binary")).alias("fp"))
    q = quality_score(docs).select("doc_id", "quality")
    joined = fp.join(q, "doc_id")
    ordkey = F.struct(F.col("quality"), (-F.col("doc_id")).alias("nid"))
    return joined.groupBy("fp").agg(
        F.max_by("doc_id", ordkey).alias("keep_id"),
        F.count("*").alias("n_copies"),
        F.max("quality").alias("best_quality"),
    )


def shingles(docs: DataFrame, id_col: str = "doc_id", n: int = NGRAM) -> DataFrame:
    """(doc_id, sh) — distinct word n-gram shingles per doc. Docs with fewer
    than n tokens produce no shingles."""
    toks = F.split(F.col("text"), " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        docs.where(F.size(toks) >= n)
        .select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("sh"))
        .dropDuplicates(["doc_id", "sh"])
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.05,
    id_col: str = "doc_id",
    max_df: int | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """(a, b, jaccard) with a < b and jaccard >= threshold, rounded 6dp.

    APPROXIMATION: intersections count only *rare* shingles (document
    frequency <= max_df, the candidate-join fan-out bound) while union
    sizes count all shingles, so jaccard is a lower-bound estimate and
    pairs sharing only stop-shingles are dropped entirely. This is the
    intended web-scale semantics (stop-shingles carry no dedup signal and
    explode candidate pairs quadratically); the DuckDB oracle mirrors the
    same estimate.

    ``max_df`` defaults to corpus-relative: max(MAX_SHINGLE_DF, 0.1% of
    docs) — an absolute cap under-prunes at web scale (a shingle in 101
    docs out of 1e12 is not a stop-shingle) and over-prunes tiny corpora.
    """
    if max_df is None:
        if n_docs is None:
            n_docs = docs.count()
        max_df = max(MAX_SHINGLE_DF, n_docs // 1000)
    # NOT persisted although scanned 3x: shingling is a narrow
    # split+explode recompute from docs, while caching the exploded
    # shingle set would hold ~|text|x1 extra bytes per doc in
    # memory/disk — at web scale recompute is the cheaper side, and a
    # persist here leaked (nothing could unpersist it after the lazy
    # result escaped)
    sh = shingles(docs, id_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # stop-shingle removal bounds the candidate join fan-out
    rare = sh.join(
        sh.groupBy("sh").agg(F.count("*").alias("df")).where(F.col("df") <= max_df),
        "sh",
    ).select("doc_id", "sh")
    inter = (
        rare.alias("x")
        .join(rare.alias("y"), "sh")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "na"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "nb"), "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return out


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", k: int = MINHASH_K
) -> DataFrame:
    """(doc_id, j, mh) — j-th minhash = lexicographic min of md5(j|shingle)."""
    sh = shingles(docs, id_col)
    js = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    return (
        sh.select("doc_id", "sh", js)
        .select(
            "doc_id",
            "j",
            F.md5(F.concat_ws("|", F.col("j").cast("string"), "sh").cast("binary")).alias("h"),
        )
        .groupBy("doc_id", "j")
        .agg(F.min("h").alias("mh"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """(a, b) distinct candidate pairs sharing at least one LSH band."""
    rows_per_band = k // bands
    sig = minhash_signatures(docs, id_col, k)
    # materialized once (round-7): both sides of the bucket self-join read
    # this frame — without the barrier the whole shingle→md5→min pipeline
    # executes twice. The frame is docs×bands rows of short strings, far
    # smaller than the shingle set the ngram path deliberately recomputes.
    band_keys = (
        sig.withColumn("band", (F.col("j") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.concat_ws("|", F.array_sort(F.collect_list(F.concat_ws(":", F.col("j").cast("string"), "mh")))).alias("key"))
        .localCheckpoint(eager=True)
    )
    return (
        band_keys.alias("x")
        .join(band_keys.alias("y"), ["band", "key"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )


def _nibble(hexcol, i: int):
    """Value 0-15 of hex digit i (1-based) — portable via strpos trick."""
    return F.instr(F.lit("0123456789abcdef"), F.substring(hexcol, i, 1)) - 1


def simhash(docs: DataFrame, id_col: str = "doc_id", bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, sim_hi, sim_lo) — 64-bit simhash as two 32-bit halves.

    Bit b (0-based) uses bit (b % 4) of hex nibble (b // 4 + 1) of each
    distinct token's md5; sign = sum over tokens of ±1; bit set iff
    sum > 0. sim_lo carries bits 0..31, sim_hi bits 32..63; both are
    non-negative longs, so no engine ever evaluates 1<<63.
    """
    assert bits == 64, "simhash is fixed at 64 bits (two 32-bit halves)"
    toks = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(F.split("text", " "))).alias("tok"))
        .where(F.col("tok") != "")
        .withColumn("h", F.md5(F.col("tok").cast("binary")))
    )
    aggs = []
    for b in range(bits):
        nib = _nibble(F.col("h"), b // 4 + 1)
        bit = F.shiftright(nib, b % 4) % 2
        aggs.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"s{b}"))
    sums = toks.groupBy("doc_id").agg(*aggs)

    def _half(lo_bit: int) -> F.Column:
        half = F.lit(0).cast("long")
        for i in range(32):
            half = half + F.when(
                F.col(f"s{lo_bit + i}") > 0, F.lit(1 << i).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return half

    return sums.select("doc_id", _half(32).alias("sim_hi"), _half(0).alias("sim_lo"))


def _band_chunk(hi, lo, band: int, width: int):
    """Bits [band*width, (band+1)*width) of the 64-bit (hi, lo) signature.
    ``width`` must divide 32 so a chunk never straddles the halves."""
    start = band * width
    mask = F.lit((1 << width) - 1).cast("long")
    src = F.shiftright(hi, start - 32) if start >= 32 else F.shiftright(lo, start)
    return src.bitwiseAND(mask)


def simhash_dup_pairs(
    docs: DataFrame, id_col: str = "doc_id", hamming_k: int = SIMHASH_HAMMING_K
) -> DataFrame:
    """(a, b, hamming) — pairs within Hamming distance ≤ ``hamming_k``.

    Pigeonhole banding: 64 bits split into (k+1) exact-match bands; any
    pair with ≤ k differing bits agrees on ≥ 1 band, so the candidate join
    keys on (band_idx, band_value) — recall 1.0, never all-pairs. ``k+1``
    must divide 64 with band width ≤ 32 (k ∈ {1, 3, 7, 15}). At larger
    corpus scale raise band width (lower k) so buckets stay selective.
    """
    bands = hamming_k + 1
    assert 64 % bands == 0 and 64 // bands <= 32, "need k+1 | 64, width <= 32"
    width = 64 // bands
    # materialized once (round-7): the banded self-join reads the
    # signature frame on both sides — without the barrier the 64-column
    # token-sum aggregation executes twice. (doc_id, two longs) per doc is
    # the cheapest frame in the pipeline to hold.
    sig = simhash(docs, id_col).localCheckpoint(eager=True)
    band_rows = sig.select(
        "doc_id",
        "sim_hi",
        "sim_lo",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        _band_chunk(F.col("sim_hi"), F.col("sim_lo"), i, width).alias("val"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sim_hi", "sim_lo", "bk.band", "bk.val")
    x, y = band_rows.alias("x"), band_rows.alias("y")
    hamming = F.bit_count(
        F.col("x.sim_hi").bitwiseXOR(F.col("y.sim_hi"))
    ) + F.bit_count(F.col("x.sim_lo").bitwiseXOR(F.col("y.sim_lo")))
    return (
        x.join(y, ["band", "val"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            hamming.cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= hamming_k)
        .dropDuplicates(["a", "b"])
    )
