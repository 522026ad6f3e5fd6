from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import seeded_random_graph
from webgraph_ans_rs_spark.operators.graph_build import (
    build_csr_adjacency,
    write_adjacency_table,
)
from webgraph_ans_rs_spark.operators.triangles import (
    oriented_edges,
    triangle_count,
    triangle_count_csr,
)


def test_write_load_roundtrip(spark, tmp_path):
    """The store→load path (reference: ANSBvGraph::store/load round-trips,
    tests/test_bvgraph.rs:105-129): persisted adjacency equals in-memory."""
    edges, verts, es, n = seeded_random_graph(spark, n=100, m=400)
    path = str(tmp_path / "adj")
    write_adjacency_table(spark, edges, path, num_buckets=4, table_name="adj_t1")
    loaded = spark.read.parquet(path)
    want = {r.src: r.dsts for r in build_csr_adjacency(edges).collect()}
    got = {r.src: r.dsts for r in loaded.collect()}
    assert got == want
    # point lookup pushes the filter into the scan
    plan = loaded.where(F.col("src") == 5)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" not in plan or "src" in plan


def test_triangle_count_csr_matches_join_variant(spark):
    edges, verts, es, n = seeded_random_graph(spark, n=60, m=300)
    want = triangle_count(edges).first().n_triangles
    adj = build_csr_adjacency(oriented_edges(edges).withColumnRenamed("a", "src").withColumnRenamed("b", "dst"))
    got = triangle_count_csr(adj).first().n_triangles
    assert got == want
