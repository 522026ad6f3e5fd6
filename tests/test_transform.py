"""Graph transforms: transpose / simplify / quotient_graph semantics.

WebGraph-toolchain analogues (the reference benches read `*-t` transposed
datasets, /root/reference/README.md:99-150); the driver gate re-proves
each against DuckDB via the `predecessors`, `simplify`, and `host_graph`
queries — these tests pin the operator-level contracts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from webgraph_ans_rs_spark.operators.transform import (
    quotient_graph,
    simplify,
    transpose,
)


def _pairs(df):
    return sorted((r.src, r.dst) for r in df.collect())


def test_transpose_is_involution(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 1)], "src long, dst long"
    )
    assert _pairs(transpose(transpose(edges))) == _pairs(edges)
    assert _pairs(transpose(edges)) == [(0, 2), (1, 0), (1, 3), (2, 1)]


def test_simplify_symmetric_loopfree_distinct(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 1), (2, 3), (2, 3)], "src long, dst long"
    )
    got = _pairs(simplify(edges))
    assert got == [(0, 1), (1, 0), (2, 3), (3, 2)]
    # simplify is idempotent
    assert _pairs(simplify(simplify(edges))) == got


def test_quotient_graph_counts_and_loops(spark):
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (3, 0), (2, 3)], "src long, dst long"
    )
    groups = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, "b")], "vertex long, grp string"
    )
    q = {
        (r.src_grp, r.dst_grp): r.links
        for r in quotient_graph(edges, groups).collect()
    }
    assert q == {("a", "a"): 1, ("a", "b"): 2, ("b", "a"): 1, ("b", "b"): 1}
    q2 = {
        (r.src_grp, r.dst_grp): r.links
        for r in quotient_graph(edges, groups, keep_loops=False).collect()
    }
    assert q2 == {("a", "b"): 2, ("b", "a"): 1}


def test_quotient_graph_plan_has_mapside_partial_agg(spark):
    """The links count must partial-aggregate map-side (a hot host pair at
    web scale is reduced before the shuffle, not after)."""
    edges = spark.createDataFrame([(0, 1), (0, 2)], "src long, dst long")
    groups = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b")], "vertex long, grp string"
    )
    plan = (
        quotient_graph(edges, groups)._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_count" in plan
