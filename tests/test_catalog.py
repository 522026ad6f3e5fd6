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
