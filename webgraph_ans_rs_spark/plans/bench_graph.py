"""Deterministic large synthetic edge table for benchmarking — pure JVM plan.

Built entirely from ``spark.range`` + built-in functions (xxhash64, sequence,
explode): no Python touches the hot path, so generation throughput scales
with cores and the generated set is identical at any parallelism.

Shape mirrors a web graph: Zipf-ish outdegree (inverse-CDF on a per-vertex
uniform hash, exponent ~1.2 — cf. the reference's Zipf(1.2) test streams,
/root/reference/tests/utils/mod.rs:17-26) plus a hub link per vertex
(64 hot destinations) to exercise skewed-aggregation handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BENCH_SEED = 42
MAX_DEG = 48
ZIPF_EXP = 1.2
N_HUBS = 64


def synthetic_edges(
    spark: SparkSession,
    n_vertices: int,
    num_partitions: int | None = None,
    dedup: bool = True,
) -> DataFrame:
    """(src long, dst long); ~3.5 edges/vertex plus hub links."""
    if num_partitions is None:
        num_partitions = max(2, spark.sparkContext.defaultParallelism)
    v = spark.range(0, n_vertices, 1, num_partitions).withColumnRenamed("id", "src")
    u = (F.pmod(F.xxhash64("src", F.lit(BENCH_SEED)), F.lit(1000003)) + 1) / F.lit(
        1000004.0
    )
    deg = F.least(
        F.lit(MAX_DEG), F.greatest(F.lit(1), F.pow(u, F.lit(-1.0 / ZIPF_EXP)).cast("int"))
    )
    e = (
        v.withColumn("j", F.explode(F.sequence(F.lit(0), deg - 1)))
        .select(
            "src",
            F.pmod(F.xxhash64("src", "j", F.lit(BENCH_SEED)), F.lit(n_vertices)).alias("dst"),
        )
    )
    hubs = v.select(
        "src", F.pmod(F.xxhash64("src", F.lit(BENCH_SEED + 1)), F.lit(N_HUBS)).alias("dst")
    )
    edges = e.unionAll(hubs).where(F.col("src") != F.col("dst"))
    if dedup:
        edges = edges.dropDuplicates(["src", "dst"])
    return edges


def synthetic_edges_local(
    spark: SparkSession,
    n_vertices: int,
    num_partitions: int | None = None,
    offset_exp: float = 1.3,
) -> DataFrame:
    """(src long, dst long) with WEB-LIKE LOCALITY: dst = src ± a power-law
    offset (most links go a handful of ids away, a few go far — the host
    locality that gives real web graphs in crawl order their tiny gap
    entropy; cnr-2000 stores at 2.897 bits/link for exactly this reason,
    /root/reference/tests/data/cnr-2000/cnr-2000.properties:16). Used to
    measure how much of that locality the gap-coded CSR layout recovers,
    vs the locality-free ``synthetic_edges`` where gaps are ~uniform(N/d).
    Same outdegree law and determinism discipline as synthetic_edges."""
    if num_partitions is None:
        num_partitions = max(2, spark.sparkContext.defaultParallelism)
    v = spark.range(0, n_vertices, 1, num_partitions).withColumnRenamed("id", "src")
    u = (F.pmod(F.xxhash64("src", F.lit(BENCH_SEED)), F.lit(1000003)) + 1) / F.lit(
        1000004.0
    )
    deg = F.least(
        F.lit(MAX_DEG), F.greatest(F.lit(1), F.pow(u, F.lit(-1.0 / ZIPF_EXP)).cast("int"))
    )
    h = F.xxhash64("src", "j", F.lit(BENCH_SEED + 2))
    uo = (F.pmod(h, F.lit(1000003)) + 1) / F.lit(1000004.0)
    off = F.least(
        F.lit(n_vertices // 2), F.pow(uo, F.lit(-1.0 / offset_exp)).cast("long")
    )
    sign = F.when(F.pmod(F.shiftright(h, 32), F.lit(2)) == 0, F.lit(1)).otherwise(F.lit(-1))
    # clamp (not wrap): a crawl-ordered graph never jumps across the whole
    # id space just because a node sits near id 0
    dst = F.least(
        F.lit(n_vertices - 1), F.greatest(F.lit(0), F.col("src") + sign * off)
    )
    return (
        v.withColumn("j", F.explode(F.sequence(F.lit(0), deg - 1)))
        .select("src", dst.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def synthetic_edges_crawl(
    spark: SparkSession,
    n_vertices: int,
    num_partitions: int | None = None,
    block_frac: float = 0.5,
    offset_exp: float = 1.3,
) -> DataFrame:
    """(src long, dst long) with CONSECUTIVITY on top of offset locality:
    each page spends ``block_frac`` of its outdegree on a consecutive run
    ``src+1 … src+b`` (nav/sibling link blocks — the "consecutivity"
    property WebGraph's interval codes exploit; on cnr-2000 most links are
    interval- or copy-coded, which is where 2.897 bits/link
    (/root/reference/tests/data/cnr-2000/cnr-2000.properties:16) comes
    from), and the rest on power-law ± offsets as in
    ``synthetic_edges_local``. The offset-only fixture probes gap entropy;
    this one additionally probes run structure — the two structural
    properties of real crawls that the gap and interval layouts
    respectively compress. Same outdegree law and determinism discipline."""
    if num_partitions is None:
        num_partitions = max(2, spark.sparkContext.defaultParallelism)
    v = spark.range(0, n_vertices, 1, num_partitions).withColumnRenamed("id", "src")
    u = (F.pmod(F.xxhash64("src", F.lit(BENCH_SEED)), F.lit(1000003)) + 1) / F.lit(
        1000004.0
    )
    deg = F.least(
        F.lit(MAX_DEG), F.greatest(F.lit(1), F.pow(u, F.lit(-1.0 / ZIPF_EXP)).cast("int"))
    )
    blk = F.greatest(F.lit(0), (deg * F.lit(block_frac)).cast("int"))
    block = (
        v.withColumn("j", F.explode(F.sequence(F.lit(1), blk)))
        .where(blk > 0)
        .select("src", F.least(F.lit(n_vertices - 1), F.col("src") + F.col("j")).alias("dst"))
    )
    rest = deg - blk
    h = F.xxhash64("src", "j", F.lit(BENCH_SEED + 2))
    uo = (F.pmod(h, F.lit(1000003)) + 1) / F.lit(1000004.0)
    off = F.least(
        F.lit(n_vertices // 2), F.pow(uo, F.lit(-1.0 / offset_exp)).cast("long")
    )
    sign = F.when(F.pmod(F.shiftright(h, 32), F.lit(2)) == 0, F.lit(1)).otherwise(F.lit(-1))
    dst = F.least(
        F.lit(n_vertices - 1), F.greatest(F.lit(0), F.col("src") + sign * off)
    )
    far = (
        v.withColumn("j", F.explode(F.sequence(F.lit(0), rest - 1)))
        .where(rest > 0)
        .select("src", dst.alias("dst"))
    )
    return (
        block.unionAll(far)
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
