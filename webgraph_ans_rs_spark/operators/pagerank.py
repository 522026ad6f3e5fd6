"""Power-iteration PageRank as a Pregel-style gather-scatter loop.

Per superstep (all DataFrame ops, JVM-side):

  scatter:  ranks ⋈ weighted_edges on src → contribution pr·w per edge,
            where w = 1/outdeg is precomputed ONCE outside the loop
  gather:   groupBy(dst).sum — Catalyst plans a map-side partial sum
            before the shuffle, so hub vertices receive pre-combined
            partials from each upstream partition (two-stage "salted"
            aggregation done by the engine); AQE skew handling re-splits
            pathological shuffle partitions at runtime
  apply:    rank' = (1-d)/n + d·(gathered + dangling_mass/n)

Loop-invariant state (weighted edges, dangling vertex set) is computed and
cached once; supersteps with ``tol=None`` and no dangling vertices run
exactly one Spark job each (the gather), which is what the superstep
throughput bench measures.

Dangling vertices redistribute their mass uniformly; sum(rank) == 1 holds
every iteration.

Lineage is truncated each superstep with localCheckpoint (or parquet
commits via CheckpointManager for resumable runs) — the analogue of the
reference's per-node ANSCompressorPhase resume points
(/root/reference/src/ans/mod.rs:62-68, bvgraph_encoder.rs:167-171).

Scale notes (100 TB / 1e12 docs): shuffles per superstep are the join on
src (co-partitioned: weighted edges are hash-partitioned by src once, ranks
by vertex every apply) and the gather on dst. Rank state is O(V); edges are
loop-invariant and bucketed/cached once, amortized across supersteps.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .degrees import outdegrees


@dataclass
class PageRankResult:
    ranks: DataFrame  # (vertex long, pr double)
    iterations: int
    l1_delta: float
    history: list[dict] = field(default_factory=list)  # per-superstep metrics


def pagerank(
    edges: DataFrame,
    verts: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float | None = 1e-6,
    checkpoint_manager=None,
    job_id: str = "pagerank",
) -> PageRankResult:
    """Exact power iteration. ``tol`` is the L1-delta convergence threshold;
    pass ``tol=None`` to run exactly ``max_iter`` supersteps (the
    oracle-comparable fixed-iteration mode, skipping delta computation)."""
    n = verts.count()
    deg = outdegrees(edges, verts)

    # Loop-invariant: edges weighted by 1/outdeg, partitioned by src.
    w_edges = (
        edges.join(
            deg.select(F.col("vertex").alias("src"), (F.lit(1.0) / F.col("outdeg")).alias("w")),
            "src",
        )
        .select("src", "dst", "w")
        .repartition("src")
        .persist()
    )
    w_edges.count()
    # Loop-invariant: dangling vertex set (often empty for web graphs).
    dangling_verts = deg.where(F.col("outdeg") == 0).select("vertex").persist()
    has_dangling = dangling_verts.count() > 0

    start_iter = 0
    ranks = verts.select("vertex", F.lit(1.0 / n).alias("pr"))
    if checkpoint_manager is not None:
        resumed = checkpoint_manager.latest_snapshot(job_id)
        if resumed is not None:
            start_iter, ranks = resumed
    ranks = ranks.repartition("vertex").localCheckpoint(eager=True)

    history: list[dict] = []
    l1 = float("inf")
    it = start_iter
    for it in range(start_iter + 1, max_iter + 1):
        t0 = time.time()
        dangling = (
            ranks.join(dangling_verts, "vertex", "left_semi")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)))
            .first()[0]
            if has_dangling
            else 0.0
        )
        contribs = (
            ranks.join(w_edges, ranks["vertex"] == w_edges["src"])
            .select(F.col("dst").alias("vertex"), (F.col("pr") * F.col("w")).alias("c"))
            .groupBy("vertex")
            .agg(F.sum("c").alias("gathered"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (
            verts.join(contribs, "vertex", "left")
            .select(
                "vertex",
                (F.lit(base) + F.lit(damping) * F.coalesce("gathered", F.lit(0.0))).alias("pr"),
            )
            .repartition("vertex")
            .localCheckpoint(eager=True)
        )
        if tol is not None:
            l1 = (
                new_ranks.join(ranks.withColumnRenamed("pr", "pr_old"), "vertex")
                .agg(F.sum(F.abs(F.col("pr") - F.col("pr_old"))))
                .first()[0]
            )
        ranks = new_ranks
        wall_ms = int((time.time() - t0) * 1000)
        history.append({"iteration": it, "l1_delta": l1, "wall_ms": wall_ms})
        if checkpoint_manager is not None:
            checkpoint_manager.commit(job_id, it, ranks, {"l1_delta": l1, "wall_ms": wall_ms})
        if tol is not None and l1 <= tol:
            break
    w_edges.unpersist()
    dangling_verts.unpersist()
    return PageRankResult(ranks=ranks, iterations=it, l1_delta=l1, history=history)
