from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import seeded_random_graph
from webgraph_ans_rs_spark.operators.degrees import (
    degree_distribution,
    indegrees,
    outdegrees,
)
from webgraph_ans_rs_spark.operators.graph_build import (
    build_csr_adjacency,
    choose_bucket_count,
    successors,
    successors_batch,
)


def test_outdegrees_tiny(tiny_graph):
    edges, verts = tiny_graph
    got = {r.vertex: r.outdeg for r in outdegrees(edges, verts).collect()}
    assert got == {0: 2, 1: 1, 2: 0, 3: 0, 4: 1, 5: 0}


def test_indegrees_tiny(tiny_graph):
    edges, verts = tiny_graph
    got = {r.vertex: r.indeg for r in indegrees(edges, verts).collect()}
    assert got == {0: 1, 1: 0, 2: 1, 3: 1, 4: 0, 5: 1}


def test_csr_sorted_successors(tiny_graph):
    edges, _ = tiny_graph
    adj = {r.src: r.dsts for r in build_csr_adjacency(edges).collect()}
    assert adj[0] == [2, 3]
    assert adj[1] == [5]
    assert 2 not in adj  # empty lists not materialized


def test_successors_point_lookup(tiny_graph):
    edges, _ = tiny_graph
    adj = build_csr_adjacency(edges)
    rows = successors(adj, 0).collect()
    assert len(rows) == 1 and rows[0].dsts == [2, 3]


def test_successors_batch(spark, tiny_graph):
    edges, _ = tiny_graph
    adj = build_csr_adjacency(edges)
    nodes = spark.createDataFrame([(0,), (4,)], "vertex long")
    got = {r.src: r.dsts for r in successors_batch(adj, nodes).collect()}
    assert got == {0: [2, 3], 4: [0]}


def test_csr_invariants_random(spark):
    """FIXTURES.md §3: sum(outdeg)==|E|; dsts sorted & distinct; explode==edges."""
    edges, verts, es, n = seeded_random_graph(spark)
    adj = build_csr_adjacency(edges)
    assert adj.agg(F.sum("outdeg")).first()[0] == len(es)
    rows = adj.collect()
    for r in rows:
        assert r.dsts == sorted(set(r.dsts))
    exploded = {(r.src, d) for r in rows for d in r.dsts}
    assert exploded == set(es)


def test_degree_distribution_sums_to_vertices(spark):
    edges, verts, es, n = seeded_random_graph(spark)
    dist = degree_distribution(edges, verts)
    assert dist.agg(F.sum("n_vertices")).first()[0] == n
    # weighted sum = |E|
    assert (
        dist.select(F.sum(F.col("outdeg") * F.col("n_vertices"))).first()[0] == len(es)
    )


def test_choose_bucket_count():
    assert choose_bucket_count(0) == 1
    assert choose_bucket_count(4_000_000) == 1
    assert choose_bucket_count(40_000_000_000) == 16384  # 100TB-ish edge count


def test_dense_ids_rank_order(spark):
    """dense_ids = rank 0..N-1 in ascending id order, window-free."""
    from webgraph_ans_rs_spark.operators.graph_build import dense_ids

    vals = [977, 3, 512, -40, 0, 123456789, 7, 8, 9, 10, 2**40, -(2**40)]
    verts = spark.createDataFrame([(v,) for v in vals], "vertex long")
    got = {r.vertex: r.dense_id for r in dense_ids(verts).collect()}
    want = {v: i for i, v in enumerate(sorted(vals))}
    assert got == want


def test_dense_ids_many_partitions(spark):
    from webgraph_ans_rs_spark.operators.graph_build import dense_ids

    verts = spark.range(0, 5000).select((F.col("id") * 7919 % 5000).alias("vertex"))
    out = dense_ids(verts.distinct())
    rows = out.orderBy("dense_id").collect()
    assert [r.dense_id for r in rows] == list(range(5000))
    assert [r.vertex for r in rows] == sorted(set((i * 7919) % 5000 for i in range(5000)))
