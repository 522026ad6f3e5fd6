"""Fan-out-capped k-hop sampling: the per-seed cap binds on hubs, the
salted two-stage top-K equals the window top-K, and capped output is a
subset of the uncapped neighborhood."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from webgraph_ans_rs_spark.operators.sampling import (
    _rank_hex,
    _topk_per_seed,
    choose_salts,
    khop_neighbors,
    khop_neighbors_capped,
)

from tests.conftest import seeded_random_graph


def test_cap_binds_on_hub(spark):
    """A seed pointing at 200 sampled neighbors keeps exactly max_per_hop."""
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 201)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "seed long")
    out = khop_neighbors_capped(edges, seeds, k=1, pct=100, max_per_hop=5)
    rows = out.collect()
    assert len(rows) == 5
    assert all(r.hop == 1 for r in rows)


def test_salted_topk_equals_window_topk(spark):
    edges, _, _, _ = seeded_random_graph(spark, n=100, m=1500)
    cand = edges.select(F.col("src").alias("seed"), F.col("dst").alias("v")).dropDuplicates(
        ["seed", "v"]
    )
    k = 3
    salted = sorted((r.seed, r.v) for r in _topk_per_seed(cand, k, n_salts=8).collect())
    w = Window.partitionBy("seed").orderBy(_rank_hex(F.col("seed"), F.col("v")), F.col("v"))
    window = sorted(
        (r.seed, r.v)
        for r in cand.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).collect()
    )
    assert salted == window


def test_pagerank_dense_relabel_matches_plain(spark):
    """dense_relabel=True (the production loop layout for hashed-id graphs,
    BENCH_EXCHANGE.json: 29% fewer bytes through the gather exchange) must
    return the same ranks on the same vertex ids — allclose 1e-12 (float
    association order differs across the relabel's repartitioning)."""
    from webgraph_ans_rs_spark.operators.pagerank import pagerank

    edges, _, _, _ = seeded_random_graph(spark)
    hashed = edges.select(
        F.xxhash64(F.col("src").cast("string")).alias("src"),
        F.xxhash64(F.col("dst").cast("string")).alias("dst"),
    )
    hverts = (
        hashed.select(F.col("src").alias("vertex"))
        .union(hashed.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    a = {r.vertex: r.pr for r in pagerank(hashed, hverts, max_iter=5, tol=None).ranks.collect()}
    b = {
        r.vertex: r.pr
        for r in pagerank(
            hashed, hverts, max_iter=5, tol=None, dense_relabel=True
        ).ranks.collect()
    }
    assert set(a) == set(b)
    assert max(abs(a[k] - b[k]) for k in a) < 1e-12


def test_choose_salts_bounds_stage1_buffer():
    """The stats-pass salt count keeps per-(seed,salt) stage-1 buffers ≤
    ~target_buffer: candidates/n_salts ≤ target for the hub bound, and no
    salting overhead when the graph can't produce big groups."""
    assert choose_salts(max_outdeg=100, max_per_hop=8, pct=100) == 1
    n = choose_salts(max_outdeg=200_000, max_per_hop=8, pct=100, target_buffer=4096)
    assert (8 * 200_000) / n <= 2 * 4096  # power-of-two rounding ≤ 2× target
    assert n <= 1024
    # monotone in the candidate bound; pct scales it down
    assert choose_salts(10**7, 8, 100) >= choose_salts(10**7, 8, 10)


def test_capped_auto_salts_equals_fixed_salts(spark):
    """The result is independent of the chosen salt count (the global top-K
    is contained in every salted partition of the candidates) — so the
    stats-driven n_salts=None path must return exactly the fixed-salt
    result."""
    edges, _, _, _ = seeded_random_graph(spark, n=100, m=1500)
    seeds = spark.createDataFrame([(i,) for i in range(0, 100, 7)], "seed long")
    auto = sorted(
        (r.seed, r.vertex, r.hop)
        for r in khop_neighbors_capped(
            edges, seeds, k=2, pct=50, max_per_hop=3
        ).collect()
    )
    fixed = sorted(
        (r.seed, r.vertex, r.hop)
        for r in khop_neighbors_capped(
            edges, seeds, k=2, pct=50, max_per_hop=3, n_salts=8
        ).collect()
    )
    assert auto == fixed


def test_capped_subset_of_uncapped_first_hop(spark):
    """Hop-1 capped vertices are always a subset of the uncapped hop-1 set
    (later hops may differ legitimately — the frontier itself is capped)."""
    edges, _, _, _ = seeded_random_graph(spark, n=100, m=1500)
    seeds = spark.createDataFrame([(i,) for i in range(0, 100, 7)], "seed long")
    full = {
        (r.seed, r.vertex)
        for r in khop_neighbors(edges, seeds, k=1, pct=50).collect()
    }
    capped = {
        (r.seed, r.vertex)
        for r in khop_neighbors_capped(edges, seeds, k=1, pct=50, max_per_hop=3).collect()
    }
    assert capped <= full
