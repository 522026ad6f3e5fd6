"""Synchronous label propagation with deterministic tie-breaking.

Per superstep, every vertex adopts the most frequent label among its
undirected neighbors; ties break to the *smallest* label (SURVEY.md §7 hard
part (d) — without a total-order tie-break the algorithm is
nondeterministic and oracle comparison is impossible). Vertices with no
neighbors keep their label.

Plan per superstep: join(neighbors, labels) → groupBy(vertex, label).count
→ window argmax (row_number over count desc, label asc). The histogram
aggregation gets map-side partial combine; the window's partitionBy(vertex)
reuses the same hash partitioning as the groupBy, so Catalyst plans one
exchange for both.

Fixed-iteration mode (``num_iter``) is what the oracle compares —
synchronous LP is only well-defined per iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.derived_graph import undirected_symmetrize


def label_propagation(
    edges: DataFrame,
    verts: DataFrame,
    num_iter: int = 5,
    checkpoint_manager=None,
    job_id: str = "lp",
) -> DataFrame:
    """(vertex long, label long) after exactly ``num_iter`` synchronous steps."""
    und = undirected_symmetrize(edges).persist()
    und.count()

    labels = verts.select("vertex", F.col("vertex").alias("label"))
    start = 0
    if checkpoint_manager is not None:
        resumed = checkpoint_manager.latest_snapshot(job_id)
        if resumed is not None:
            start, labels = resumed
    labels = labels.localCheckpoint(eager=True)

    w = Window.partitionBy("vertex").orderBy(F.desc("cnt"), F.asc("nbr_label"))
    for it in range(start + 1, num_iter + 1):
        hist = (
            und.join(labels.withColumnRenamed("vertex", "nv"), und["dst"] == F.col("nv"))
            .groupBy(und["src"].alias("vertex"), F.col("label").alias("nbr_label"))
            .agg(F.count("*").alias("cnt"))
        )
        best = (
            hist.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vertex", F.col("nbr_label"))
        )
        labels = (
            labels.join(best, "vertex", "left")
            .select("vertex", F.coalesce("nbr_label", F.col("label")).alias("label"))
            .localCheckpoint(eager=True)
        )
        if checkpoint_manager is not None:
            checkpoint_manager.commit(job_id, it, labels, {})
    und.unpersist()
    return labels
