"""Deterministic graph sampling — the GNN-training-pipeline shape.

K-hop neighborhood sampling over the edge table: keep each edge with
probability ~p via a deterministic per-edge hash (a pure function of
(src, dst), so any engine regenerates the identical sample — same
discipline as the derived-graph fixtures), then expand a seed set hop by
hop with joins. At 100 TB each hop is one shuffle join keyed src; the
sampled edge set is a narrow filter pushed into the scan side.

The hash is md5-based (first digest byte % 100) rather than xxhash64
because DuckDB's ``hash()`` is a different algorithm — md5 is the one
64-bit-stable hash both engines share, and one byte of it is plenty for a
sampling decision. The % 100 on a 0..255 byte is slightly biased
(p=30 keeps ~30.5%); the oracle mirrors the exact same rule, and sampling
rates are approximate by nature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEXD = "0123456789abcdef"


def _md5_byte0(col_a, col_b):
    """First md5 digest byte of 'a|b' — 0..255, engine-portable."""
    h = F.md5(F.concat_ws("|", col_a.cast("string"), col_b.cast("string")).cast("binary"))
    hi = F.instr(F.lit(_HEXD), F.substring(h, 1, 1)) - 1
    lo = F.instr(F.lit(_HEXD), F.substring(h, 2, 1)) - 1
    return hi * 16 + lo


def sample_edges(edges: DataFrame, pct: int = 30) -> DataFrame:
    """~pct% of edges, deterministically (pure function of (src, dst))."""
    return edges.where(_md5_byte0(F.col("src"), F.col("dst")) % 100 < pct)


def khop_neighbors(
    edges: DataFrame, seeds: DataFrame, k: int = 2, pct: int = 30
) -> DataFrame:
    """(seed, vertex, hop) — vertices reachable from each seed within k
    hops through the sampled edge set; hop = minimum hop count (seeds
    themselves excluded). One shuffle join per hop; frontiers stay
    per-seed so the output is the per-seed neighborhood a GNN batch loader
    consumes."""
    sampled = sample_edges(edges, pct).select("src", "dst")
    frontier = seeds.select(F.col("seed"), F.col("seed").alias("v"))
    reached = None
    for hop in range(1, k + 1):
        frontier = (
            frontier.join(sampled, frontier["v"] == sampled["src"])
            .select("seed", F.col("dst").alias("v"))
            .dropDuplicates(["seed", "v"])
        )
        layer = frontier.select("seed", F.col("v").alias("vertex"), F.lit(hop).alias("hop"))
        reached = layer if reached is None else reached.unionAll(layer)
    return (
        reached.where(F.col("vertex") != F.col("seed"))
        .groupBy("seed", "vertex")
        .agg(F.min("hop").cast("int").alias("hop"))
    )
