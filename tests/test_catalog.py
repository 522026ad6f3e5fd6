from __future__ import annotations

import pytest

from webgraph_ans_rs_spark.sources.catalog import VersionedTable


def test_commit_read_time_travel(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path), "ranks")
    df1 = spark.createDataFrame([(1, 0.5), (2, 0.5)], "vertex long, pr double")
    df2 = spark.createDataFrame([(1, 0.7), (2, 0.3)], "vertex long, pr double")
    s1 = t.commit(df1, {"iteration": 1})
    s2 = t.commit(df2, {"iteration": 2})
    assert t.snapshots() == [s1, s2]
    assert {r.vertex: r.pr for r in t.read().collect()} == {1: 0.7, 2: 0.3}
    assert {r.vertex: r.pr for r in t.read(s1).collect()} == {1: 0.5, 2: 0.5}
    m = t.manifest(s2)
    assert m["rows"] == 2 and m["properties"]["iteration"] == 2


def test_snapshots_immutable(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path), "adj")
    df = spark.createDataFrame([(1, [2, 3])], "src long, dsts array<long>")
    sid = t.commit(df)
    with pytest.raises(Exception):
        # snapshot data dirs are write-once
        df.write.mode("errorifexists").parquet(t.manifest(sid)["data_dir"])


def test_orphaned_snapshot_dir_never_wedges_commits(spark, tmp_path):
    """A crash between the data rename and the manifest write leaves an
    orphaned snap dir; later commits must skip its id, not fail forever."""
    import os

    t = VersionedTable(spark, str(tmp_path), "ranks")
    df = spark.createDataFrame([(1, 0.5)], "vertex long, pr double")
    s1 = t.commit(df)
    # simulate the crash artifact: an orphan data dir with the next id
    os.makedirs(os.path.join(t.dir, f"snap-{s1 + 1:06d}"))
    s2 = t.commit(df)
    s3 = t.commit(df)
    assert s2 == s1 + 2 and s3 == s1 + 3
    assert t.snapshots() == [s1, s2, s3]
    assert t.read(s3).count() == 1


def test_schema_evolution_add_column(spark, tmp_path):
    """Add-column evolution across snapshots: each snapshot reads back with
    exactly its own schema (the manifest pins it), and time travel to the
    pre-evolution snapshot still returns the old shape — the protocol
    Iceberg provides natively (the reference's Prelude likewise versions
    its models with the data, SURVEY.md §1.4)."""
    t = VersionedTable(spark, str(tmp_path), "adj")
    v1 = spark.createDataFrame([(1, [2, 3]), (2, [3])], "src long, dsts array<long>")
    v2 = spark.createDataFrame(
        [(1, [2, 3], 2), (2, [3], 1)], "src long, dsts array<long>, outdeg int"
    )
    s1 = t.commit(v1)
    s2 = t.commit(v2)
    r1, r2 = t.read(s1), t.read(s2)
    assert r1.columns == ["src", "dsts"]
    assert r2.columns == ["src", "dsts", "outdeg"]
    assert {r.src: r.outdeg for r in r2.collect()} == {1: 2, 2: 1}
    # manifest schema matches the data written at that snapshot
    assert [f["name"] for f in t.manifest(s1)["schema"]["fields"]] == ["src", "dsts"]
    assert [f["name"] for f in t.manifest(s2)["schema"]["fields"]] == [
        "src",
        "dsts",
        "outdeg",
    ]


def test_time_travel_previous_after_overwrite_commit(spark, tmp_path):
    """An overwrite-style commit (same logical table, new content) must
    leave snapshot N−1 byte-identical and readable."""
    t = VersionedTable(spark, str(tmp_path), "ranks")
    old = [(i, 1.0 / 4) for i in range(4)]
    s1 = t.commit(spark.createDataFrame(old, "vertex long, pr double"))
    s2 = t.commit(spark.createDataFrame([(0, 1.0)], "vertex long, pr double"))
    assert sorted((r.vertex, r.pr) for r in t.read(s1).collect()) == old
    assert t.read().count() == 1 and t.read(s2).count() == 1


def test_failed_commit_leaves_no_tmp_dirs(spark, tmp_path):
    """A write that fails mid-commit must clean its .tmp-* dir (ADVICE:
    previously orphaned forever)."""
    import os

    from pyspark.sql import functions as F

    t = VersionedTable(spark, str(tmp_path), "ranks")
    bad = spark.createDataFrame([(1,)], "vertex long").select(
        (F.col("vertex") / F.lit(0)).alias("boom")  # ANSI: division by zero raises
    )
    with pytest.raises(Exception):
        t.commit(bad)
    leftovers = [n for n in os.listdir(t.dir) if n.startswith(".tmp-")]
    assert leftovers == []
    # and the table still works afterwards
    sid = t.commit(spark.createDataFrame([(1, 0.5)], "vertex long, pr double"))
    assert t.read(sid).count() == 1


def test_partition_pruned_snapshot_read(spark, tmp_path):
    """A snapshot written partitioned by a column is readable with partition
    pruning: the filtered scan lists only the matching partition directory
    (PartitionFilters reach the scan)."""
    import os

    t = VersionedTable(spark, str(tmp_path), "events")
    df = spark.createDataFrame(
        [(h, i, float(i)) for h in range(4) for i in range(10)],
        "hour int, id int, v double",
    )
    # partitioned snapshot: write through the same commit protocol but
    # partitioned data layout
    tmp = os.path.join(t.dir, ".tmp-part")
    df.write.partitionBy("hour").parquet(tmp)
    sid_dir = os.path.join(t.dir, "snap-000001")
    os.rename(tmp, sid_dir)
    got = spark.read.parquet(sid_dir).where("hour = 2")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert got.count() == 10
    assert "PartitionFilters: [isnotnull(hour" in plan or "hour#" in plan


def test_expire_snapshots_keeps_newest(spark, tmp_path):
    import os

    t = VersionedTable(spark, str(tmp_path), "ranks")
    sids = [
        t.commit(spark.createDataFrame([(i, float(i))], "vertex long, pr double"))
        for i in range(4)
    ]
    expired = t.expire_snapshots(keep_last=2)
    assert expired == sids[:2]
    assert t.snapshots() == sids[2:]
    # survivors still readable, expired data gone from disk
    assert t.read(sids[3]).count() == 1 and t.read(sids[2]).count() == 1
    assert not any(
        n == f"snap-{sids[0]:06d}" for n in os.listdir(t.dir)
    )
    # committing after expiry never reuses an expired id
    s_new = t.commit(spark.createDataFrame([(9, 9.0)], "vertex long, pr double"))
    assert s_new > sids[-1]


def test_lp_checkpoint_rejects_changed_edges(spark, tmp_path):
    """LP resume must reject snapshots from a different edge set or argmax
    variant (the fingerprint gap ADVICE flagged for pagerank, applied
    uniformly)."""
    import pytest as _pytest

    from webgraph_ans_rs_spark.checkpoint import CheckpointManager
    from webgraph_ans_rs_spark.operators.labelprop import label_propagation

    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(3)], "vertex long")
    cm = CheckpointManager(spark, str(tmp_path))
    label_propagation(edges, verts, num_iter=2, checkpoint_manager=cm, job_id="lp")
    other = spark.createDataFrame([(0, 2)], "src long, dst long")
    cm2 = CheckpointManager(spark, str(tmp_path))
    with _pytest.raises(ValueError, match="params mismatch"):
        label_propagation(other, verts, num_iter=2, checkpoint_manager=cm2, job_id="lp")


def test_checkpoint_rejects_mismatched_params(spark, tmp_path):
    import pytest as _pytest

    from webgraph_ans_rs_spark.checkpoint import CheckpointManager

    cm = CheckpointManager(spark, str(tmp_path))
    df = spark.createDataFrame([(1, 0.5)], "vertex long, pr double")
    cm.commit("pr", 1, df, params={"damping": 0.85, "n": 10})
    # same params resume fine
    it, snap = cm.latest_snapshot("pr", params={"damping": 0.85, "n": 10})
    assert it == 1 and snap.count() == 1
    # different params refuse to resume (fresh manager: no warm cache)
    cm2 = CheckpointManager(spark, str(tmp_path))
    with _pytest.raises(ValueError, match="params mismatch"):
        cm2.latest_snapshot("pr", params={"damping": 0.5, "n": 10})
