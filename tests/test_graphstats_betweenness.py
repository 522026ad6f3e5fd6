"""Round-6 structural kernels: global graph stats (operators/graphstats.py)
and sampled k-bounded Brandes betweenness (operators/betweenness.py) —
analytic fixtures with hand-derivable ground truth plus a reference
Brandes implemented independently in plain Python; the cross-engine float
story is covered by the driver gate's DuckDB oracles
(plans/oracles.py graph_global_stats_sql / betweenness_sql)."""

from __future__ import annotations

import collections
import math

import pytest

from webgraph_ans_rs_spark.operators.betweenness import betweenness_sampled
from webgraph_ans_rs_spark.operators.graphstats import graph_global_stats


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "vertex long")


def _bc(edges_df, seeds_df, depth):
    return {
        r.vertex: r.bc
        for r in betweenness_sampled(edges_df, seeds_df, depth).collect()
    }


def test_betweenness_path_graph_single_source(spark):
    # a path 0→1→2→3 from seed 0: delta(2)=1 (covers 3), delta(1)=2
    # (covers 2 and 3 through the chain), delta(3)=0
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    got = _bc(edges, _seeds(spark, [0]), 4)
    assert got == {1: 2.0, 2: 1.0, 3: 0.0}


def test_betweenness_diamond_splits_dependency(spark):
    # 0→{1,2}→3: two shortest 0→3 paths, each middle vertex carries 1/2
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    got = _bc(edges, _seeds(spark, [0]), 4)
    assert got == {1: 0.5, 2: 0.5, 3: 0.0}


def test_betweenness_depth_truncation(spark):
    # same path but depth 2: vertex 3 is beyond the horizon, so delta(2)=0
    # (no level-3 successors) and delta(1)=1 (covers only vertex 2)
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    got = _bc(edges, _seeds(spark, [0]), 2)
    assert got == {1: 1.0, 2: 0.0}


def test_betweenness_multiple_seeds_sum(spark):
    # seeds 0 and 1 on the path 0→1→2→3: from 0, delta(1)=2, delta(2)=1;
    # from 1, delta(2)=1; bc sums across seeds (vertex 1 is also level-1
    # of seed 0)
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    got = _bc(edges, _seeds(spark, [0, 1]), 4)
    assert got == {1: 2.0, 2: 2.0, 3: 0.0}


def _brandes_python(edge_list, n, seeds, depth):
    adj = collections.defaultdict(list)
    for s, d in edge_list:
        adj[s].append(d)
    bc = collections.defaultdict(float)
    reached = set()
    for s in seeds:
        dist = {s: 0}
        sigma = {s: 1.0}
        levels = [[s]]
        for t in range(1, depth + 1):
            nxt = collections.defaultdict(float)
            for u in levels[-1]:
                for w in adj[u]:
                    if w not in dist:
                        nxt[w] += sigma[u]
            for w, sg in nxt.items():
                dist[w] = t
                sigma[w] = sg
            levels.append(sorted(nxt))
            if not nxt:
                break
        top = len(levels) - 1
        delta = {v: 0.0 for v in dist}
        for t in range(top - 1, -1, -1):
            for v in levels[t]:
                acc = 0.0
                for w in sorted(adj[v]):
                    if dist.get(w) == t + 1:
                        acc += sigma[v] / sigma[w] * (1.0 + delta[w])
                delta[v] = acc
        for t in range(1, top + 1):
            for v in levels[t]:
                bc[v] += delta[v]
                reached.add(v)
    return {v: round(bc[v], 4) for v in reached}


def test_betweenness_matches_independent_brandes_random_graph(spark):
    from tests.conftest import seeded_random_graph

    edges, verts, el, _n = seeded_random_graph(spark, n=120, m=500, seed=7)
    seeds = [0, 17, 40, 99]
    want = _brandes_python(el, 120, seeds, 4)
    got = _bc(edges, _seeds(spark, seeds), 4)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-4), v


def test_graph_global_stats_analytic(spark):
    # 0↔1 reciprocal pair, 0→2, 2→2 self-loop; 3 isolated
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 2), (2, 2)], "src long, dst long"
    )
    verts = spark.createDataFrame([(i,) for i in range(4)], "vertex long")
    got = {r.metric: r.value for r in graph_global_stats(edges, verts).collect()}
    assert got["n_vertices"] == 4.0
    assert got["n_arcs"] == 4.0
    assert got["n_self_loops"] == 1.0
    assert got["density"] == pytest.approx(3.0 / 12.0, abs=1e-6)
    assert got["avg_outdeg"] == pytest.approx(0.75, abs=1e-6)
    assert got["reciprocity"] == pytest.approx(2.0 / 3.0, abs=1e-6)


def test_graph_global_stats_assortativity_matches_numpy(spark):
    import numpy as np

    from tests.conftest import seeded_random_graph

    edges, verts, el, _n = seeded_random_graph(spark, n=80, m=400, seed=11)
    od = collections.Counter(s for s, _ in el)
    ind = collections.Counter(d for _, d in el)
    xs = np.array([od[s] for s, d in el], dtype=float)
    ys = np.array([ind[d] for s, d in el], dtype=float)
    want = float(np.corrcoef(xs, ys)[0, 1])
    got = {r.metric: r.value for r in graph_global_stats(edges, verts).collect()}
    assert got["assortativity_out_in"] == pytest.approx(want, abs=1e-5)
    assert got["reciprocity"] == pytest.approx(
        sum(1 for s, d in el if (d, s) in set(el)) / len(el), abs=1e-6
    )


def test_partition_modularity_two_cliques(spark):
    # two triangles {0,1,2} and {3,4,5} joined by one bridge 2-3:
    # m = 7 undirected edges; perfect 2-community split has
    # Q = sum_c [intra_c/2m - (deg_c/2m)^2]
    #   = 2*(6/14 - (7/14)^2) = 2*(3/7 - 1/4) = 5/14
    from webgraph_ans_rs_spark.operators.graphstats import partition_modularity

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)],
        "src long, dst long",
    )
    groups = spark.createDataFrame(
        [(v, "a" if v < 3 else "b") for v in range(6)],
        "vertex long, grp string",
    )
    got = partition_modularity(edges, groups).first().value
    assert got == pytest.approx(5.0 / 14.0, abs=1e-6)


def test_partition_modularity_single_community_is_zero(spark):
    # the whole graph in one community: Q = m'/2m - (2m/2m)^2 ... for the
    # all-in-one partition intra2 == deg2 == 2m, so Q = 1 - 1 = 0
    from webgraph_ans_rs_spark.operators.graphstats import partition_modularity

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    groups = spark.createDataFrame(
        [(v, "all") for v in range(3)], "vertex long, grp string"
    )
    assert partition_modularity(edges, groups).first().value == 0.0
