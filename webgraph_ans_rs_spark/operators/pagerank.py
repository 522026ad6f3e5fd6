"""Power-iteration PageRank as a Pregel-style gather-scatter loop.

Per superstep (all DataFrame ops, JVM-side):

  scatter:  ranks ⋈ edges on src  →  contribution rank/outdeg per edge
  gather:   groupBy(dst).sum — Catalyst plans a partial (map-side) sum
            before the shuffle, so hub vertices receive pre-combined
            partial sums from each upstream partition: this IS two-stage
            salted aggregation, done by the engine. For pathological hubs
            AQE skew-join splitting (enabled in session.py) re-splits
            oversized shuffle partitions at runtime.
  apply:    rank' = (1-d)/n + d * (gathered + dangling_mass/n)

Dangling vertices (outdeg 0) redistribute their mass uniformly — standard
PageRank semantics, keeps sum(rank) == 1 every iteration.

Lineage is truncated each superstep with localCheckpoint (or a parquet
checkpoint via CheckpointManager for resumable runs) — the analogue of the
reference's per-node ANSCompressorPhase resume points
(/root/reference/src/ans/mod.rs:62-68, bvgraph_encoder.rs:167-171).

Scale notes (100 TB / 1e12 docs): the loop's only shuffles are the join on
src (co-partitioned if `edges` is bucketed by src and ranks are repartitioned
once by vertex=src) and the gather on dst. Ranks are O(V) = two longs+double
per vertex; edges never change, so caching/bucketing them once amortizes
across supersteps.
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
    oracle-comparable fixed-iteration mode)."""
    spark = edges.sparkSession
    n = verts.count()
    deg = outdegrees(edges, verts)  # (vertex, outdeg) incl. 0

    # Co-partition the loop-invariant sides once; cache them.
    edges = edges.repartition("src").persist()
    deg = deg.persist()
    edges.count()

    start_iter = 0
    ranks = verts.select("vertex", F.lit(1.0 / n).alias("pr"))
    if checkpoint_manager is not None:
        resumed = checkpoint_manager.latest_snapshot(job_id)
        if resumed is not None:
            start_iter, ranks = resumed
    ranks = ranks.repartition("vertex").persist()
    ranks.count()

    history: list[dict] = []
    l1 = float("inf")
    it = start_iter
    for it in range(start_iter + 1, max_iter + 1):
        t0 = time.time()
        # ranks with outdeg attached; dangling mass from outdeg==0 rows.
        rd = ranks.join(deg, "vertex")
        dangling = rd.where(F.col("outdeg") == 0).agg(
            F.coalesce(F.sum("pr"), F.lit(0.0))
        ).first()[0]
        e = edges.select(F.col("src").alias("e_src"), F.col("dst").alias("e_dst"))
        contribs = (
            rd.where(F.col("outdeg") > 0)
            .join(e, rd["vertex"] == F.col("e_src"))
            .select(F.col("e_dst").alias("vertex"), (F.col("pr") / F.col("outdeg")).alias("c"))
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
        )
        new_ranks = new_ranks.localCheckpoint(eager=True)
        l1 = (
            new_ranks.join(ranks.withColumnRenamed("pr", "pr_old"), "vertex")
            .agg(F.sum(F.abs(F.col("pr") - F.col("pr_old"))))
            .first()[0]
        )
        ranks.unpersist()
        ranks = new_ranks
        wall_ms = int((time.time() - t0) * 1000)
        history.append({"iteration": it, "l1_delta": l1, "wall_ms": wall_ms})
        if checkpoint_manager is not None:
            checkpoint_manager.commit(job_id, it, ranks, {"l1_delta": l1, "wall_ms": wall_ms})
        if tol is not None and l1 <= tol:
            break
    edges.unpersist()
    deg.unpersist()
    return PageRankResult(ranks=ranks, iterations=it, l1_delta=l1, history=history)
