"""Incremental adjacency maintenance: recrawl merge at bucket granularity.

The reference's artifact is a static compressed file — any change means a
full ``ANSBvGraph::store`` re-run (/root/reference/src/bvgraph/
random_access.rs:91-222). A 100 TB production adjacency cannot work that
way: a daily recrawl touches a fraction of pages, and rewriting the whole
table for it is the difference between a 10-minute and a 10-hour job.
This module pairs with ``VersionedTable``'s copy-on-write commits
(sources/catalog.py): only the buckets containing a re-crawled source are
rebuilt and rewritten; every other bucket is inherited by the new
snapshot without moving a byte, and time travel to the pre-merge graph
stays free.

Semantics: ``new_edges`` carries the COMPLETE new outlink set of every
re-crawled source (crawl output is per-page, so this is the natural
shape). Sources absent from ``new_edges`` are unchanged; a page whose
links all vanished (or that was deleted) goes in ``removed_srcs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import VersionedTable
from .graph_build import build_csr_adjacency


def bucket_of(col: str | F.Column, num_buckets: int) -> F.Column:
    """The table's bucket transform — must match the layout the full
    snapshot was committed with (Iceberg's bucket(B, src))."""
    return F.pmod(F.xxhash64(col), F.lit(num_buckets)).cast("int")


def commit_adjacency_partitioned(
    table: VersionedTable, edges: DataFrame, num_buckets: int
) -> int:
    """Initial full snapshot: CSR in bucket=K partition layout."""
    adj = build_csr_adjacency(edges, num_buckets).withColumn(
        "bucket", bucket_of("src", num_buckets)
    )
    # co-locate each bucket's rows in one task before the partitionBy
    # write: otherwise every task writes a sliver into every leaf and the
    # table is T×B tiny files (measured 17× slower commit at B=256)
    adj = adj.repartition(num_buckets, "bucket")
    return table.commit_partitioned(adj, properties={"num_buckets": num_buckets})


def merge_adjacency(
    spark: SparkSession,
    table: VersionedTable,
    new_edges: DataFrame,
    removed_srcs: DataFrame | None = None,
    base_snapshot: int | None = None,
) -> int:
    """Copy-on-write recrawl merge; returns the new snapshot id.

    Plan shape (scale notes): the touched-bucket list is a ≤ num_buckets
    row collect (never data-sized). Old rows are read ONLY from touched
    leaf dirs — partition pruning by construction, the same 1/B read the
    point-lookup path gets. The re-crawled-source anti join and the new
    CSR build shuffle only the delta, never the full table.
    """
    num_buckets = int(table.manifest(base_snapshot)["properties"]["num_buckets"])
    if removed_srcs is not None:
        # removal wins over re-crawl: a page both re-crawled and then
        # deleted in the same batch must NOT be resurrected by its delta
        # edges — mirror a full rebuild over (edges minus removed pages)
        removed = removed_srcs.select("src").distinct()
        new_edges = new_edges.join(removed, "src", "left_anti")
        changed = new_edges.select("src").unionByName(removed)
    else:
        changed = new_edges.select("src")
    changed = changed.distinct().persist()
    try:
        touched = sorted(
            r.b
            for r in changed.select(
                bucket_of("src", num_buckets).alias("b")
            ).distinct().collect()
        )
        if not touched:
            return table.manifest(base_snapshot)["snapshot_id"]
        old = [table.read_partition(k, base_snapshot) for k in touched]
        kept_old = old[0]
        for df in old[1:]:
            kept_old = kept_old.unionByName(df)
        kept_old = kept_old.join(changed, "src", "left_anti")
        # delta-sized parallelism: no explicit repartition — a 50M-edge
        # delta confined to one bucket must still build its CSR across
        # the cluster (partitionBy handles the leaf layout at write time)
        new_csr = build_csr_adjacency(new_edges).withColumn(
            "bucket", bucket_of("src", num_buckets)
        )
        partial = kept_old.unionByName(new_csr.select(*kept_old.columns))
        partial = partial.repartition(max(1, len(touched)), "bucket")
        return table.commit_replace_partitions(
            partial, replaced=touched, base_snapshot=base_snapshot
        )
    finally:
        changed.unpersist()
