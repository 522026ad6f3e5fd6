"""Connected components: min-label propagation + pointer jumping.

Per round (all hash joins/aggregations, shuffle keyed by vertex):

  nbr_min(v)  = min over undirected neighbors u of label(u)      (join+agg)
  jump(v)     = label(label(v))   — pointer doubling             (self-join)
  label'(v)   = min(label(v), nbr_min(v), jump(v))

Labels never increase and always name a vertex inside v's component, so at
fixpoint every component carries its minimum vertex id — the exact
min-reachable-label semantics of the DuckDB reachability oracle. Pointer
jumping contracts label chains geometrically, giving O(log n)-ish rounds on
long paths instead of O(diameter) (the reason Kiveris et al.'s
large-star/small-star wins at web scale; this formulation keeps the same
round complexity with a simpler pair-state: one (vertex, label) row per
vertex rather than a mutating edge set).

Convergence test = count of changed labels (cheap aggregation). Lineage is
truncated per round (localCheckpoint); with a CheckpointManager rounds
commit to parquet and runs resume (analogue of the reference's per-node
phase/state resume points, /root/reference/src/ans/mod.rs:62-68).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.derived_graph import undirected_symmetrize


def connected_components(
    edges: DataFrame,
    verts: DataFrame,
    max_rounds: int = 50,
    checkpoint_manager=None,
    job_id: str = "cc",
) -> DataFrame:
    """(vertex long, component long) for every vertex in ``verts``;
    isolated vertices are their own component."""
    und = undirected_symmetrize(edges).persist()
    und.count()

    labels = verts.select("vertex", F.col("vertex").alias("label"))
    start_round = 0
    if checkpoint_manager is not None:
        resumed = checkpoint_manager.latest_snapshot(job_id)
        if resumed is not None:
            start_round, labels = resumed
    labels = labels.repartition("vertex").localCheckpoint(eager=True)

    for rnd in range(start_round + 1, max_rounds + 1):
        nbr_min = (
            und.join(labels, und["dst"] == labels["vertex"])
            .groupBy(und["src"].alias("vertex"))
            .agg(F.min("label").alias("nbr_min"))
        )
        jump = (
            labels.alias("l1")
            .join(
                labels.select(
                    F.col("vertex").alias("jv"), F.col("label").alias("jlabel")
                ).alias("l2"),
                F.col("l1.label") == F.col("jv"),
            )
            .select(F.col("l1.vertex").alias("vertex"), F.col("jlabel"))
        )
        new_labels = (
            labels.join(nbr_min, "vertex", "left")
            .join(jump, "vertex", "left")
            .select(
                "vertex",
                F.least(
                    "label",
                    F.coalesce("nbr_min", F.col("label")),
                    F.coalesce("jlabel", F.col("label")),
                ).alias("label"),
            )
            .repartition("vertex")
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.select("vertex", F.col("label").alias("old")).alias("o"), "vertex")
            .where(F.col("label") != F.col("old"))
            .count()
        )
        labels = new_labels
        if checkpoint_manager is not None:
            checkpoint_manager.commit(
                job_id, rnd, labels, {"changed": changed}
            )
        if changed == 0:
            break
    und.unpersist()
    return labels.select("vertex", F.col("label").alias("component"))
