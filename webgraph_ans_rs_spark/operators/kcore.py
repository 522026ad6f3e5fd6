"""k-core decomposition (fixed k) — iterative peel on the undirected graph.

The k-core is the maximal subgraph in which every vertex has degree ≥ k;
it is THE classic web-graph pruning pass (crawl-frontier trimming, spam
farm isolation) run on exactly the adjacency the reference engine stores.
Semantics: repeatedly delete vertices of undirected degree < k until none
remain; the fixpoint is unique (independent of deletion order), so a
fixpoint loop and an unrolled oracle agree as long as the oracle unrolls
at least as many rounds as the loop needs.

Scale discipline: edges are subtracted per round by an anti-join against
the REMOVED delta on each endpoint, not re-semi-joined against the big
survivor set — the delta shrinks geometrically after round 1, and AQE
converts the anti-join to broadcast-hash exactly when the delta is small
enough (round 1's delta can be huge on a sparse graph, so the hint is
left to the runtime rather than forced). Degrees are one
map-side-combinable count per round. Lineage is truncated per round
(localCheckpoint, the components.py loop discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.derived_graph import undirected_symmetrize


def kcore(
    edges: DataFrame,
    k: int = 3,
    max_rounds: int = 32,
) -> DataFrame:
    """(vertex, core_deg) — vertices of the k-core with their degree INSIDE
    the core. Empty result if the graph has no k-core.

    ``max_rounds`` bounds the peel; the loop exits early at the fixpoint
    (no vertex below k). Raises if the bound is hit before convergence so
    a caller never receives a non-core silently — the unrolled DuckDB
    oracle replays the same bound.
    """
    # self-loops are excluded (standard simple-graph k-core: a vertex's
    # self-loop must not keep it in the core) — found on the real
    # cnr-2000, whose BVGraph stream contains them; the derived gate
    # graph has none, so the oracle's und CTE needs no mirror filter
    und = undirected_symmetrize(edges).where(F.col("src") != F.col("dst"))
    e = und.repartition("src").localCheckpoint(eager=True)
    # max_rounds + 1 fixpoint checks bracket max_rounds removal rounds: a
    # peel that needs exactly max_rounds removals still gets its final
    # convergence check instead of raising — the unrolled DuckDB oracle
    # (kcore_sql) runs the same bound, so the engine is never strictly
    # weaker than its own oracle at the boundary
    for round_no in range(max_rounds + 1):
        deg = e.groupBy("src").agg(F.count("*").alias("d"))
        removed = (
            deg.where(F.col("d") < k)
            .select(F.col("src").alias("rm"))
            .localCheckpoint(eager=True)  # computed once, reused in 2 joins
        )
        if removed.limit(1).count() == 0:
            return e.groupBy(F.col("src").alias("vertex")).agg(
                F.count("*").alias("core_deg")
            )
        if round_no == max_rounds:
            break
        e = (
            e.join(removed, e["src"] == F.col("rm"), "left_anti")
            .join(removed, e["dst"] == F.col("rm"), "left_anti")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"kcore: peel did not converge within max_rounds={max_rounds}"
    )
