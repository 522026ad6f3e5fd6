"""Deterministic edge tables derived from the ``documents`` testdata table.

The driver's correctness gate compares every Spark query against a DuckDB
SQL oracle over the same parquet files, so the graph itself must be a pure
function of ``documents.doc_id`` expressible identically in both engines
(FIXTURES.md §5). Two graphs:

* **hash graph** — the "web graph": per doc, 2 local links ``(doc_id + j) % n``
  (guarantees triangles (i, i+1, i+2) and outdeg >= 2) plus 3 multiplicative
  hash links ``(doc_id * HASH_MULT + k * HASH_STEP) % n`` (long-range,
  expander-like). Self-loops dropped, duplicates dropped. Used by degrees /
  successors / PageRank / triangles.

* **clustered graph** — node set partitioned into groups of CLUSTER_GROUP;
  one intra-group functional edge per node. Components stay <= CLUSTER_GROUP
  nodes so a DuckDB recursive-CTE reachability oracle is cheap. Used by
  connected components / label propagation.

All arithmetic is int64, all operands positive, so Spark and DuckDB agree
bit-for-bit. Reference analogue: the seeded synthetic graphs of
/root/reference/tests/utils/mod.rs:17-26 (deterministic Zipf streams) — our
graphs are the deterministic fixtures the oracle can regenerate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_MULT = 2654435761  # Knuth multiplicative hash constant
HASH_STEP = 998244353
LOCAL_LINKS = 2
HASH_LINKS = 3
HUB_MOD = 16  # every page links to hub (doc_id % 16) → 16 high-indegree hubs
SQUARE_OFF = 7  # non-bijective square map adds indegree skew
CLUSTER_GROUP = 20
CLUSTER_MULT = 7
CLUSTER_OFF = 3


def vertices(documents: DataFrame) -> DataFrame:
    """All vertex ids — every document is a vertex even if isolated."""
    return documents.select(F.col("doc_id").cast("long").alias("vertex"))


def vertices_sql() -> str:
    return "SELECT CAST(doc_id AS BIGINT) AS vertex FROM documents"


def _n_docs(documents: DataFrame) -> int:
    return documents.count()


def hash_edges(documents: DataFrame, n: int | None = None) -> DataFrame:
    """Directed edge table (src long, dst long), distinct, no self-loops.

    Built with explode over a literal offset array — a narrow map-side op,
    no shuffle until the final dropDuplicates (which Catalyst folds into a
    single hash aggregation keyed (src, dst) — at web scale this is the one
    unavoidable shuffle of edge building).
    """
    if n is None:
        n = _n_docs(documents)
    doc = F.col("doc_id").cast("long")
    local = [((doc + F.lit(j)) % F.lit(n)) for j in range(1, LOCAL_LINKS + 1)]
    hashed = [
        ((doc * F.lit(HASH_MULT) + F.lit(k * HASH_STEP)) % F.lit(n))
        for k in range(1, HASH_LINKS + 1)
    ]
    # skew: a hub link (16 hot destinations) and a non-bijective square link
    skew = [doc % F.lit(HUB_MOD), (doc * doc + F.lit(SQUARE_OFF)) % F.lit(n)]
    dsts: list[Column] = local + hashed + skew
    return (
        documents.select(doc.alias("src"), F.explode(F.array(*dsts)).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def hash_edges_sql() -> str:
    """DuckDB CTE body producing the identical (src, dst) set."""
    n = "(SELECT COUNT(*) FROM documents)"
    parts = []
    for j in range(1, LOCAL_LINKS + 1):
        parts.append(
            f"SELECT CAST(doc_id AS BIGINT) AS src,"
            f" (CAST(doc_id AS BIGINT) + {j}) % {n} AS dst FROM documents"
        )
    for k in range(1, HASH_LINKS + 1):
        parts.append(
            f"SELECT CAST(doc_id AS BIGINT) AS src,"
            f" (CAST(doc_id AS BIGINT) * {HASH_MULT} + {k * HASH_STEP}) % {n} AS dst"
            f" FROM documents"
        )
    parts.append(
        f"SELECT CAST(doc_id AS BIGINT) AS src,"
        f" CAST(doc_id AS BIGINT) % {HUB_MOD} AS dst FROM documents"
    )
    parts.append(
        f"SELECT CAST(doc_id AS BIGINT) AS src,"
        f" (CAST(doc_id AS BIGINT) * CAST(doc_id AS BIGINT) + {SQUARE_OFF}) % {n} AS dst"
        f" FROM documents"
    )
    union = " UNION ALL ".join(parts)
    return f"SELECT DISTINCT src, dst FROM ({union}) WHERE src <> dst"


def clustered_edges(documents: DataFrame, n: int | None = None) -> DataFrame:
    """One functional intra-group edge per doc; components <= CLUSTER_GROUP."""
    if n is None:
        n = _n_docs(documents)
    doc = F.col("doc_id").cast("long")
    # group base = doc - doc % G  (int64-exact; avoids float division)
    dst = (doc - doc % F.lit(CLUSTER_GROUP)) + (
        (doc * F.lit(CLUSTER_MULT) + F.lit(CLUSTER_OFF)) % F.lit(CLUSTER_GROUP)
    )
    return (
        documents.select(doc.alias("src"), dst.alias("dst"))
        .where((F.col("src") != F.col("dst")) & (F.col("dst") < F.lit(n)))
        .dropDuplicates(["src", "dst"])
    )


def clustered_edges_sql() -> str:
    n = "(SELECT COUNT(*) FROM documents)"
    g = CLUSTER_GROUP
    return (
        f"SELECT DISTINCT src, dst FROM ("
        f"SELECT CAST(doc_id AS BIGINT) AS src,"
        f" (CAST(doc_id AS BIGINT) - CAST(doc_id AS BIGINT) % {g})"
        f" + (CAST(doc_id AS BIGINT) * {CLUSTER_MULT} + {CLUSTER_OFF}) % {g} AS dst"
        f" FROM documents) WHERE src <> dst AND dst < {n}"
    )


def undirected_symmetrize(edges: DataFrame) -> DataFrame:
    """(src, dst) ∪ (dst, src), distinct — the undirected view."""
    return edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).dropDuplicates(
        ["src", "dst"]
    )


def undirected_sql(edges_cte: str) -> str:
    return (
        f"SELECT DISTINCT src, dst FROM ("
        f"SELECT src, dst FROM ({edges_cte})"
        f" UNION ALL SELECT dst AS src, src AS dst FROM ({edges_cte}))"
    )
