"""Degree operators — the engine analogue of the reference's outdegree read.

Reference: ``read_outdegree`` decodes the first symbol of each node record
(/root/reference/src/ans/decoder.rs:104-106); per-node degree is a first-class
quantity of the BvGraph format. Here degrees are one hash aggregation with
map-side partial combine — the plan Catalyst produces for
``edges.groupBy('src').count()`` is a partial_count → shuffle(src) →
final_count, which scales linearly in edges and never materializes adjacency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def outdegrees(edges: DataFrame, verts: DataFrame) -> DataFrame:
    """(vertex, outdeg) for every vertex, 0 for danglers."""
    od = edges.groupBy(F.col("src").alias("vertex")).agg(F.count("*").alias("outdeg"))
    return verts.join(od, "vertex", "left").select(
        "vertex", F.coalesce("outdeg", F.lit(0)).cast("long").alias("outdeg")
    )


def indegrees(edges: DataFrame, verts: DataFrame) -> DataFrame:
    ind = edges.groupBy(F.col("dst").alias("vertex")).agg(F.count("*").alias("indeg"))
    return verts.join(ind, "vertex", "left").select(
        "vertex", F.coalesce("indeg", F.lit(0)).cast("long").alias("indeg")
    )


def degree_distribution(edges: DataFrame, verts: DataFrame) -> DataFrame:
    """(outdeg, n_vertices) histogram — the engine analogue of the reference's
    symbol-frequency stats pass (model4encoder_builder.rs:67-78): the
    histogram later drives bucket-count / salt-factor choices."""
    return (
        outdegrees(edges, verts)
        .groupBy("outdeg")
        .agg(F.count("*").alias("n_vertices"))
    )
