"""Global graph statistics: the one-pass structural summary.

The WebGraph toolchain prints exactly this family when it loads a graph
(nodes, arcs, density, average degree — the reference surfaces
``num_nodes``/``num_arcs`` through its loader, /root/reference/src/
bvgraph/random_access.rs:118,169 and src/ans/mod.rs:44), and web-graph
papers report reciprocity and degree
assortativity as the first-order shape of a crawl. All of it is
expressible as hash aggregations and one self-join, so the whole summary
is a single Catalyst plan: map-side-combinable degree counts, a
shuffle-hash semi join of the edge table against its own transpose for
reciprocity, and a streaming Pearson co-moment for assortativity — no
Python, no windows, no collect. At 100 TB each piece is linear in edges
with one shuffle keyed (src, dst) or vertex.

Output is long-form (metric, value) so the schema is stable as metrics
are added.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def graph_global_stats(edges: DataFrame, verts: DataFrame) -> DataFrame:
    """(metric string, value double) rows:

    - ``n_vertices``, ``n_arcs`` (distinct arcs incl. self-loops),
      ``n_self_loops``
    - ``density``            arcs_noself / (n·(n−1))
    - ``avg_outdeg``         arcs_noself / n
    - ``reciprocity``        |{(u,v): u≠v, (v,u)∈E}| / |{(u,v): u≠v}|
    - ``assortativity_out_in`` Pearson corr of (outdeg(src), indeg(dst))
      over non-self arcs — the directed out→in degree assortativity

    ``edges`` must be distinct (the engine's builders are); self-loops are
    counted then excluded from the ratio metrics. Ratios are rounded to
    6 dp: Pearson/ratio drift between engines is float-reorder only
    (~1e-12), far below the rounding."""
    # materialized once (round-7): the non-self arc set feeds the
    # reciprocity semi-join (both sides), the two degree tables and the
    # assortativity join — six consumers whose shared subtree (for
    # derived-graph inputs, a full dedup shuffle) Catalyst would
    # otherwise re-execute per consumer
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .localCheckpoint(eager=True)
    )
    nv = verts.agg(F.count("*").cast("double").alias("n"))
    tot = edges.agg(
        F.count("*").cast("double").alias("m_all"),
        F.sum(
            F.when(F.col("src") == F.col("dst"), F.lit(1)).otherwise(F.lit(0))
        ).cast("double").alias("loops"),
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = (
        e.join(rev, ["src", "dst"], "left_semi")
        .agg(F.count("*").cast("double").alias("r"))
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("od"))
    indeg = e.groupBy("dst").agg(F.count("*").alias("id_"))
    # Pearson from covar_pop / stddev_pop with an explicit zero-variance
    # guard: F.corr's internal division raises under ANSI mode when either
    # degree sequence is constant (DuckDB's CORR returns NULL there)
    assort = (
        e.join(outdeg, "src")
        .join(indeg, "dst")
        .agg(
            F.covar_pop(
                F.col("od").cast("double"), F.col("id_").cast("double")
            ).alias("cxy"),
            F.stddev_pop(F.col("od").cast("double")).alias("sx"),
            F.stddev_pop(F.col("id_").cast("double")).alias("sy"),
        )
        .select(
            F.when(
                F.col("sx") * F.col("sy") == 0, F.lit(None).cast("double")
            )
            .otherwise(F.col("cxy") / (F.col("sx") * F.col("sy")))
            .alias("a")
        )
    )
    return (
        nv.crossJoin(tot)
        .crossJoin(recip)
        .crossJoin(assort)
        .select(
            F.expr(
                "stack(7,"
                " 'n_vertices', n,"
                " 'n_arcs', m_all,"
                " 'n_self_loops', loops,"
                " 'density', round((m_all - loops) / (n * (n - 1.0)), 6),"
                " 'avg_outdeg', round((m_all - loops) / n, 6),"
                " 'reciprocity', round(r / (m_all - loops), 6),"
                " 'assortativity_out_in', round(a, 6)"
                ") as (metric, value)"
            )
        )
    )


def partition_modularity(edges: DataFrame, groups: DataFrame) -> DataFrame:
    """Single row (value double): Newman modularity Q of a vertex
    partition (``groups`` = (vertex, grp)) on the undirected simple view
    of ``edges`` — the community-quality statistic of web-graph practice
    (host-level clustering of a crawl). Q = Σ_c [ intra_c/2m −
    (deg_c/2m)² ] with every count taken on the symmetrized arc set
    (each undirected edge counted in both directions, so 2m = |und|).

    Counts are integer-exact; the per-community term is three float ops
    mirrored verbatim in the oracle, and the cross-community sum is a
    sorted fold from 0.0 (community terms are small-denominator rationals
    — the betweenness half-grid lesson), so both engines round identical
    doubles. One edges⋈groups join per endpoint (map-side if the group is
    a pure function of the vertex), one grouped count — linear in edges."""
    e = edges.where(F.col("src") != F.col("dst")).select("src", "dst")
    # materialized once (round-7): consumed by the label join AND the
    # 2m count — each execution re-ran the symmetrize+dedup shuffle
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    gs = groups.select(F.col("vertex").alias("src"), F.col("grp").alias("sg"))
    gd = groups.select(F.col("vertex").alias("dst"), F.col("grp").alias("dg"))
    lab = und.join(gs, "src").join(gd, "dst")
    per = lab.groupBy("sg").agg(
        F.count("*").cast("double").alias("deg2"),
        F.sum(
            F.when(F.col("sg") == F.col("dg"), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("double")
        .alias("intra2"),
    )
    two_m = float(und.count())
    term = (F.col("intra2") / F.lit(two_m)) - (
        F.col("deg2") / F.lit(two_m)
    ) * (F.col("deg2") / F.lit(two_m))
    return per.select(
        F.struct(F.col("sg"), term.alias("t")).alias("st")
    ).agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list("st")),
                F.lit(0.0),
                lambda acc, s: acc + s["t"],
            ),
            6,
        ).alias("value")
    )
