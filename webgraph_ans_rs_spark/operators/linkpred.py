"""Adamic–Adar link prediction — wedge join with a hub-degree cap.

AA(u, v) = Σ_{w ∈ N(u) ∩ N(v)} 1 / ln(deg(w)) over the undirected graph,
scored for NON-adjacent candidate pairs at distance 2 — the standard
link-prediction / related-page signal computed on exactly the adjacency
the reference engine stores (its successor lists are the N(·) sets).

Scale discipline: candidate pairs are enumerated as wedges through their
common neighbor w (self-join of the undirected edge list on the center),
which is Σ deg(w)² — quadratic in hub degree. Centers with degree above
``center_cap`` are EXCLUDED from scoring, bounding per-key join fan-out
by cap² regardless of skew; this is principled, not just pragmatic: a
hub center contributes at most 1/ln(cap) per wedge, the vanishing tail
of the AA weight (the same corpus-frequency-cap discipline as
dedup.ngram_jaccard's stop-shingle cut — a w linked by everyone carries
no similarity signal). The cap is part of the operator contract and the
DuckDB oracle applies the identical cut, so results stay exact.

The top-N cut ranks on the 6dp-ROUNDED score (desc, then u, v asc):
rounding first makes the selection boundary deterministic across engines
— two engines whose unrounded sums differ by ulps see identical rounded
keys, so LIMIT picks the same rows (the float-portability pattern of
plans/oracles.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.derived_graph import undirected_symmetrize


def adamic_adar(
    edges: DataFrame,
    center_cap: int = 64,
    top_n: int = 200,
    round_dp: int = 6,
) -> DataFrame:
    """(u, v, aa) — top ``top_n`` non-adjacent distance-2 pairs by
    Adamic–Adar score; u < v; score rounded to ``round_dp``."""
    # self-loops excluded: a loop would make a vertex its own "common
    # neighbor" and inflate its center degree (seen on real web graphs).
    # Materialized once (round-7): the frame feeds the degree table, the
    # legs build AND the existing-edge anti-join — without the barrier the
    # symmetrize+dedup shuffle of the full edge set ran twice per call.
    und = (
        undirected_symmetrize(edges)
        .where(F.col("src") != F.col("dst"))
        .localCheckpoint(eager=True)
    )
    deg = und.groupBy(F.col("src").alias("w")).agg(F.count("*").alias("d"))
    # d >= 2: a degree-1 center spans no wedge, and ln(1) = 0 would put an
    # inf weight in the legs frame
    centers = deg.where((F.col("d") >= 2) & (F.col("d") <= center_cap))
    # (w, u) legs for eligible centers, weighted 1/ln(deg(w)).
    # Materialized ONCE (localCheckpoint: eager, lineage-truncating, no
    # unpersist bookkeeping for a lazily-returned result) — the frame
    # feeds BOTH sides of the wedge self-join, and without the barrier
    # the symmetrize + degree join would be computed twice: noise at gate
    # scale, a full extra scan+join of the edge table at 100×.
    legs = (
        und.select(F.col("src").alias("w"), F.col("dst").alias("n"))
        .join(centers, "w")
        .select("w", "n", (F.lit(1.0) / F.log(F.col("d"))).alias("wt"))
        .localCheckpoint(eager=True)
    )
    pairs = (
        legs.alias("l1")
        .join(legs.select("w", F.col("n").alias("m")).alias("l2"), "w")
        .where(F.col("n") < F.col("m"))
        .groupBy(F.col("n").alias("u"), F.col("m").alias("v"))
        .agg(F.round(F.sum("wt"), round_dp).alias("aa"))
    )
    existing = und.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    return (
        pairs.join(existing, ["u", "v"], "left_anti")
        .orderBy(F.col("aa").desc(), "u", "v")
        .limit(top_n)
    )
