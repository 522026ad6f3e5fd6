"""Copy-on-write incremental adjacency: bucket-granular recrawl merge.

The catalog's REPLACE-PARTITIONS protocol (Iceberg bucket-transform
analogue) + merge_adjacency: only touched buckets are rewritten, untouched
leaf dirs are inherited across snapshots byte-for-byte, expiry is
reference-counted, and time travel to the pre-merge graph stays intact.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from webgraph_ans_rs_spark.operators.graph_build import build_csr_adjacency
from webgraph_ans_rs_spark.operators.incremental import (
    bucket_of,
    commit_adjacency_partitioned,
    merge_adjacency,
)
from webgraph_ans_rs_spark.sources.catalog import VersionedTable

B = 4


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _canon(adj):
    return sorted(
        (r.src, tuple(r.dsts), r.outdeg)
        for r in adj.select("src", "dsts", "outdeg").collect()
    )


def _base_pairs():
    # 40 sources spread across all 4 buckets, 3 links each
    return [(s, (s * 7 + k) % 100 + 100) for s in range(40) for k in range(3)]


def test_merge_equals_full_rebuild(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path), "adj")
    base = _base_pairs()
    commit_adjacency_partitioned(t, _edges(spark, base), B)

    # recrawl sources 3 and 17: new outlink sets (17 shrinks to one link)
    delta = [(3, 900), (3, 901), (17, 950)]
    sid = merge_adjacency(spark, t, _edges(spark, delta))

    updated = [(s, d) for s, d in base if s not in (3, 17)] + delta
    expect = build_csr_adjacency(_edges(spark, updated))
    got = t.read_partitioned(sid).select("src", "dsts", "outdeg")
    assert _canon(got) == _canon(expect)
    # manifest row count stays exact through the incremental path
    assert t.manifest(sid)["rows"] == expect.count()


def test_merge_shares_untouched_leaf_dirs(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path), "adj")
    s1 = commit_adjacency_partitioned(t, _edges(spark, _base_pairs()), B)
    # a delta confined to one source touches exactly one bucket
    sid = merge_adjacency(spark, t, _edges(spark, [(5, 900)]))
    m1, m2 = t.manifest(s1), t.manifest(sid)
    touched = {
        r.b
        for r in _edges(spark, [(5, 900)])
        .select(bucket_of("src", B).alias("b"))
        .collect()
    }
    assert m2["replaced"] == sorted(touched)
    for k, path in m2["partitions"].items():
        if int(k) in touched:
            assert path.startswith(m2["data_dir"])  # rewritten
        else:
            assert path == m1["partitions"][k]  # inherited, zero copy


def test_time_travel_pre_merge_intact(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path), "adj")
    base = _base_pairs()
    s1 = commit_adjacency_partitioned(t, _edges(spark, base), B)
    merge_adjacency(spark, t, _edges(spark, [(5, 900), (11, 901)]))
    old = t.read_partitioned(s1).select("src", "dsts", "outdeg")
    assert _canon(old) == _canon(build_csr_adjacency(_edges(spark, base)))


def test_removed_srcs_disappear(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path), "adj")
    base = _base_pairs()
    commit_adjacency_partitioned(t, _edges(spark, base), B)
    removed = spark.createDataFrame([(7,), (23,)], "src long")
    # source 7 is BOTH re-crawled and removed: removal must win (no
    # resurrection through the delta edges)
    sid = merge_adjacency(
        spark, t, _edges(spark, [(1, 990), (7, 991)]), removed_srcs=removed
    )
    got = t.read_partitioned(sid)
    assert got.where(F.col("src").isin(7, 23)).count() == 0
    kept = [(s, d) for s, d in base if s not in (1, 7, 23)] + [(1, 990)]
    assert _canon(got.select("src", "dsts", "outdeg")) == _canon(
        build_csr_adjacency(_edges(spark, kept))
    )


def test_expire_is_reference_counted(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path), "adj")
    s1 = commit_adjacency_partitioned(t, _edges(spark, _base_pairs()), B)
    s2 = merge_adjacency(spark, t, _edges(spark, [(5, 900)]))
    replaced = t.manifest(s2)["replaced"]
    expired = t.expire_snapshots(keep_last=1)
    assert expired == [s1]
    # the base snapshot's dir must SURVIVE (s2 inherits leaves) — but its
    # SUPERSEDED leaves must be reclaimed (leaf-granular refcount)
    root1 = os.path.join(str(tmp_path), "adj", f"snap-{s1:06d}")
    assert os.path.isdir(root1)
    for k in range(B):
        leaf = os.path.join(root1, f"bucket={k}")
        if k in replaced:
            assert not os.path.exists(leaf), f"dead leaf bucket={k} not reclaimed"
        else:
            assert os.path.isdir(leaf)
    # and the merged view still reads completely
    assert t.read_partitioned(s2).count() == t.manifest(s2)["rows"]


def test_expire_never_touches_inflight_commit_dirs(spark, tmp_path):
    """A renamed-but-unmanifested snap dir (in-flight commit between rename
    and manifest write) must survive expiry untouched."""
    t = VersionedTable(spark, str(tmp_path), "adj")
    commit_adjacency_partitioned(t, _edges(spark, _base_pairs()), B)
    s2 = commit_adjacency_partitioned(t, _edges(spark, _base_pairs()), B)
    inflight = os.path.join(str(tmp_path), "adj", "snap-000099")
    os.makedirs(os.path.join(inflight, "bucket=0"))
    t.expire_snapshots(keep_last=1)
    assert os.path.isdir(os.path.join(inflight, "bucket=0"))
    assert t.snapshots() == [s2]


def test_point_lookup_reads_one_leaf(spark, tmp_path):
    """read_partition scans only its own leaf dir: the scan's file list
    never mentions any other bucket (pruning by construction)."""
    t = VersionedTable(spark, str(tmp_path), "adj")
    sid = commit_adjacency_partitioned(t, _edges(spark, _base_pairs()), B)
    m = t.manifest(sid)
    k = next(iter(m["partitions"]))
    df = t.read_partition(int(k))
    files = df.inputFiles()
    assert files, "leaf scan lists no files"
    leaf = m["partitions"][k]
    assert all(f.removeprefix("file://").startswith(leaf) for f in files)


def test_commit_rejects_null_bucket_at_commit_time(spark, tmp_path):
    import pytest

    t = VersionedTable(spark, str(tmp_path), "adj")
    df = spark.createDataFrame(
        [(1, [2], 1, 0), (2, [3], 1, None)],
        "src long, dsts array<long>, outdeg int, bucket int",
    )
    with pytest.raises(ValueError, match="non-integer partition"):
        t.commit_partitioned(df)
    # the failed commit must not be readable or claim a snapshot
    assert t.snapshots() == []


def test_read_partition_clear_error_on_empty_snapshot(spark, tmp_path):
    import pytest

    t = VersionedTable(spark, str(tmp_path), "adj")
    empty = spark.createDataFrame(
        [], "src long, dsts array<long>, outdeg int, bucket int"
    )
    t.commit_partitioned(empty)
    with pytest.raises(ValueError, match="no partitions"):
        t.read_partition(0)


def test_cow_commit_inherits_base_properties(spark, tmp_path):
    """A raw commit_replace_partitions without explicit properties must not
    lose num_buckets — otherwise the next merge_adjacency would crash."""
    t = VersionedTable(spark, str(tmp_path), "adj")
    commit_adjacency_partitioned(t, _edges(spark, _base_pairs()), B)
    m1 = t.manifest()
    k = next(iter(m1["partitions"]))
    partial = t.read_partition(int(k))
    sid = t.commit_replace_partitions(partial, replaced=[int(k)])
    assert t.manifest(sid)["properties"]["num_buckets"] == B
    # and a follow-up merge over the COW snapshot works
    sid2 = merge_adjacency(spark, t, _edges(spark, [(5, 900)]))
    assert t.manifest(sid2)["base_snapshot"] == sid
