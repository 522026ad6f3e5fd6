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
