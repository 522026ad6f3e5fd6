from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from tests.conftest import seeded_random_graph
from webgraph_ans_rs_spark.checkpoint import CheckpointManager
from webgraph_ans_rs_spark.operators.components import connected_components
from webgraph_ans_rs_spark.operators.pagerank import pagerank


def test_pagerank_resume_identical(spark):
    """FIXTURES.md §6: kill after iteration k, restart, final ranks must be
    identical to an uninterrupted run."""
    edges, verts, es, n = seeded_random_graph(spark, n=120, m=500)
    uninterrupted = pagerank(edges, verts, max_iter=5, tol=None)
    want = {r.vertex: r.pr for r in uninterrupted.ranks.collect()}

    with tempfile.TemporaryDirectory() as root:
        cm = CheckpointManager(spark, root)
        # "crash" after 3 supersteps
        pagerank(edges, verts, max_iter=3, tol=None, checkpoint_manager=cm)
        assert cm.committed_iterations("pagerank") == [1, 2, 3]
        # restart: must resume at 3 and run only 4, 5
        res = pagerank(edges, verts, max_iter=5, tol=None, checkpoint_manager=cm)
        assert res.history[0]["iteration"] == 4
        got = {r.vertex: r.pr for r in res.ranks.collect()}
        # identical up to float summation order inside groupBy partials
        assert max(abs(got[v] - want[v]) for v in want) < 1e-15

        lin = cm.lineage("pagerank")
        assert lin is not None
        rows = lin.groupBy("iteration").agg(F.sum("rows").alias("n")).collect()
        assert {r.iteration: r.n for r in rows} == {i: 120 for i in range(1, 6)}


def test_cc_with_checkpoints(spark):
    edges, verts, es, n = seeded_random_graph(spark, n=100, m=110)
    want = {r.vertex: r.component for r in connected_components(edges, verts).collect()}
    with tempfile.TemporaryDirectory() as root:
        cm = CheckpointManager(spark, root)
        got = {
            r.vertex: r.component
            for r in connected_components(edges, verts, checkpoint_manager=cm).collect()
        }
        assert got == want
        assert len(cm.committed_iterations("cc")) >= 1


def test_cc_resume_at_fixpoint_returns_labels(spark):
    """Resuming a previously-COMPLETED run with max_rounds == the last
    committed round (empty round range) must recognize the checkpointed
    edge set as a fixpoint and return labels — not raise 'no convergence'
    (round-4 ADVICE: components.py resume-at-fixpoint)."""
    edges, verts, es, n = seeded_random_graph(spark, n=80, m=90)
    want = {r.vertex: r.component for r in connected_components(edges, verts).collect()}
    with tempfile.TemporaryDirectory() as root:
        cm = CheckpointManager(spark, root)
        connected_components(edges, verts, checkpoint_manager=cm).collect()
        last = max(cm.committed_iterations("cc"))
        got = {
            r.vertex: r.component
            for r in connected_components(
                edges, verts, max_rounds=last, checkpoint_manager=cm
            ).collect()
        }
        assert got == want
