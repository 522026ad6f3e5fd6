"""Graph transforms: transpose, simplify, quotient (host) graph.

The WebGraph toolchain ships these as first-class graph-to-graph
transforms (webgraph's ``transform`` module; the reference's compressed
graphs are routinely stored alongside their transpose — e.g. the
``*-t`` datasets its benches read, /root/reference/README.md:99-150 —
because backlink queries need the transposed adjacency). On Spark they
are plain DataFrame expressions, so Catalyst fuses them with whatever
runs downstream:

* ``transpose`` — a projection, zero cost until a CSR build shuffles by
  the new ``src``; the transposed adjacency build costs exactly one
  shuffle, same as the forward build.
* ``simplify`` — symmetrize + drop loops + dedup: the canonical prep
  step for undirected algorithms (CC, triangles). One hash-aggregation
  shuffle keyed (src, dst); map-side partial dedup keeps hub fan-out
  bounded.
* ``quotient_graph`` — collapse vertices by a grouping attribute (host,
  domain, shard) and aggregate parallel edges into weights: the
  host-graph construction of web-graph practice. The vertex→group
  mapping join is E ⋈ V keyed by vertex id on both endpoints; at scale
  co-partition edges and mapping on the id, or — when the group is a
  pure function of the vertex's URL (host extraction) — compute it
  map-side and skip the join entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transpose(edges: DataFrame) -> DataFrame:
    """Reverse every arc: (src, dst) → (dst, src). Pure projection."""
    return edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )


def simplify(edges: DataFrame) -> DataFrame:
    """Symmetric, loop-free, duplicate-free version of the graph (the
    WebGraph ``simplify`` transform): arcs in both directions, self-loops
    removed. One distinct-aggregation shuffle."""
    return (
        edges.select("src", "dst")
        .unionAll(transpose(edges))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def quotient_graph(
    edges: DataFrame,
    groups: DataFrame,
    vertex_col: str = "vertex",
    group_col: str = "grp",
    keep_loops: bool = True,
) -> DataFrame:
    """Host-graph style quotient: map both endpoints through the
    vertex→group table and count collapsed parallel edges.

    Returns (src_grp, dst_grp, links). ``groups`` must have one row per
    vertex. The two joins hash-shuffle on the vertex id; the final count
    aggregates map-side first (#groups² is tiny next to E). With
    ``keep_loops=False`` intra-group arcs are dropped (pure inter-host
    link graph)."""
    g_src = groups.select(
        F.col(vertex_col).alias("src"), F.col(group_col).alias("src_grp")
    )
    g_dst = groups.select(
        F.col(vertex_col).alias("dst"), F.col(group_col).alias("dst_grp")
    )
    q = (
        edges.join(g_src, "src")
        .join(g_dst, "dst")
        .groupBy("src_grp", "dst_grp")
        .agg(F.count("*").alias("links"))
    )
    if not keep_loops:
        q = q.where(F.col("src_grp") != F.col("dst_grp"))
    return q
