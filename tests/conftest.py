from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from webgraph_ans_rs_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def tiny_graph(spark):
    """FIXTURES.md §2 tiny fixture: nodes 0..5, arcs {4→0, 0→2, 0→3, 1→5},
    expected successors(0)=[2,3], successors(1)=[5], successors(2)=[]."""
    edges = spark.createDataFrame(
        [(4, 0), (0, 2), (0, 3), (1, 5)], "src long, dst long"
    )
    verts = spark.createDataFrame([(i,) for i in range(6)], "vertex long")
    return edges, verts


@pytest.fixture(scope="session")
def triangle_graph(spark):
    """3-cycle {0,1,2} + chord vertex 3: edges form exactly 2 triangles
    (0,1,2) and (1,2,3) in the undirected view."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (1, 3), (3, 2)], "src long, dst long"
    )
    verts = spark.createDataFrame([(i,) for i in range(4)], "vertex long")
    return edges, verts


def seeded_random_graph(spark, n=200, m=800, seed=42):
    """Deterministic pseudo-random directed graph (pure function of seed)."""
    import random

    rng = random.Random(seed)
    es = set()
    while len(es) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            es.add((a, b))
    edges = spark.createDataFrame(sorted(es), "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "vertex long")
    return edges, verts, sorted(es), n
