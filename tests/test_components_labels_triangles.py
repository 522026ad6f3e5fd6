from __future__ import annotations

import itertools

from tests.conftest import seeded_random_graph
from webgraph_ans_rs_spark.operators.components import connected_components
from webgraph_ans_rs_spark.operators.labelprop import label_propagation
from webgraph_ans_rs_spark.operators.triangles import (
    orient_by_degree,
    triangle_count,
    triangle_list,
    triangles_per_vertex,
)


def unionfind_components(es, n):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in es:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id labeling
    comp = {}
    for v in range(n):
        r = find(v)
        comp.setdefault(r, []).append(v)
    out = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def python_lp(es, n, iters):
    """Synchronous LP oracle: argmax neighbor-label count, ties→smallest."""
    nbrs = {v: set() for v in range(n)}
    for a, b in es:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    labels = {v: v for v in range(n)}
    for _ in range(iters):
        new = {}
        for v in range(n):
            if not nbrs[v]:
                new[v] = labels[v]
                continue
            cnt = {}
            for u in nbrs[v]:
                cnt[labels[u]] = cnt.get(labels[u], 0) + 1
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
    return labels


def brute_triangles(es, n):
    und = set()
    for a, b in es:
        if a != b:
            und.add((min(a, b), max(a, b)))
    tri = [
        (a, b, c)
        for a, b, c in itertools.combinations(range(n), 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    ]
    return tri


def test_cc_tiny(tiny_graph):
    edges, verts = tiny_graph
    got = {r.vertex: r.component for r in connected_components(edges, verts).collect()}
    # components: {0,2,3,4} -> 0, {1,5} -> 1
    assert got == {0: 0, 2: 0, 3: 0, 4: 0, 1: 1, 5: 1}


def test_cc_random_matches_unionfind(spark):
    edges, verts, es, n = seeded_random_graph(spark, n=150, m=160)
    got = {r.vertex: r.component for r in connected_components(edges, verts).collect()}
    assert got == unionfind_components(es, n)


def test_cc_long_path(spark):
    """Path graph stresses pointer jumping (diameter >> rounds)."""
    n = 64
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "vertex long")
    got = {r.vertex: r.component for r in connected_components(edges, verts, max_rounds=20).collect()}
    assert got == {v: 0 for v in range(n)}


def test_lp_matches_python(spark):
    edges, verts, es, n = seeded_random_graph(spark, n=100, m=300)
    for iters in (1, 3):
        got = {r.vertex: r.label for r in label_propagation(edges, verts, num_iter=iters).collect()}
        assert got == python_lp(es, n, iters)


def test_triangles_fixture(triangle_graph):
    edges, verts = triangle_graph
    assert triangle_count(edges).first().n_triangles == 2
    got = {r.vertex: r.n_tri for r in triangles_per_vertex(edges, verts).collect()}
    assert got == {0: 1, 1: 2, 2: 2, 3: 1}


def test_triangles_random_matches_brute(spark):
    edges, verts, es, n = seeded_random_graph(spark, n=60, m=300)
    want = brute_triangles(es, n)
    got = sorted(tuple(r) for r in triangle_list(edges).collect())
    assert got == sorted(want)


def test_degree_orientation_same_count(spark):
    """Degree-ordered orientation must count the same triangles."""
    edges, verts, es, n = seeded_random_graph(spark, n=60, m=300)
    e = orient_by_degree(edges)
    from pyspark.sql import functions as F

    e1 = e.alias("e1")
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = e.select(F.col("a"), F.col("b").alias("c"))
    # with degree orientation the wedge check needs all 3 orientations of
    # the closing edge handled; count via undirected closing-edge test
    und = e.select("a", "b").unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    closing = und.select(F.col("a"), F.col("b").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    n_tri = wedges.join(closing, ["a", "c"]).count()
    assert n_tri == len(brute_triangles(es, n))
