"""HITS (Kleinberg hubs & authorities) — fixed-iteration power method.

The reference engine's kernel surface is PageRank-shaped gather/scatter
over the compressed adjacency (src/ans/..; the BVGraph layout serves any
left- or right-multiplication by the adjacency matrix); HITS is the
canonical second spectral kernel a web-graph user runs on the same edge
table, so it rides the same discipline: declarative join+groupBy supersteps
(one hash aggregation per direction), sum-normalization (no sqrt — keeps
the oracle's float story to plain IEEE adds/divides), fixed iteration
count so the DuckDB oracle can unroll the identical chain.

Scale: each iteration is two shuffles (gather by dst for authorities,
gather by src for hubs) on the edge key — the same exchange pattern as a
PageRank superstep in its plain-DataFrame form. The edge table is
repartitioned once per direction and cached by the caller if the loop is
long; at the gate's k=3 the AQE plan reuses the exchange. Normalization
totals are single-row aggregates (driver scalars), never a crossJoin of
big frames — Spark broadcasts the 1-row frame automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits(
    edges: DataFrame,
    verts: DataFrame,
    num_iter: int = 3,
) -> DataFrame:
    """(vertex, auth, hub) after ``num_iter`` sum-normalized iterations.

    auth_i(v) = Σ_{u→v} hub_{i-1}(u) / Σ_raw;  hub_i(u) = Σ_{u→v} auth_i(v)
    / Σ_raw. Vertices with no in-edges (out-edges) get auth (hub) = 0.
    Sum-normalization instead of the textbook L2: identical fixed point up
    to scaling, and the oracle replays it with plain SUM — no sqrt ulps.
    """
    e = edges.select("src", "dst")
    hub = verts.select("vertex", F.lit(1.0).alias("hub"))
    auth = None
    for _ in range(num_iter):
        a_raw = (
            e.join(hub.withColumnRenamed("vertex", "src"), "src")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum("hub").alias("raw"))
        )
        # coalesce: an edgeless graph sums to NULL — scores become 0, not null
        a_tot = a_raw.agg(F.coalesce(F.sum("raw"), F.lit(1.0)).alias("t"))
        auth = (
            verts.join(a_raw, "vertex", "left")
            .crossJoin(a_tot)  # 1-row frame → broadcast, not a real cross
            .select(
                "vertex",
                (F.coalesce(F.col("raw"), F.lit(0.0)) / F.col("t")).alias("auth"),
            )
        )
        h_raw = (
            e.join(auth.withColumnRenamed("vertex", "dst"), "dst")
            .groupBy(F.col("src").alias("vertex"))
            .agg(F.sum("auth").alias("raw"))
        )
        h_tot = h_raw.agg(F.coalesce(F.sum("raw"), F.lit(1.0)).alias("t"))
        hub = (
            verts.join(h_raw, "vertex", "left")
            .crossJoin(h_tot)
            .select(
                "vertex",
                (F.coalesce(F.col("raw"), F.lit(0.0)) / F.col("t")).alias("hub"),
            )
        )
    return verts.join(auth, "vertex").join(hub, "vertex").select(
        "vertex", "auth", "hub"
    )
