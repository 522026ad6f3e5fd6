"""Streaming watermark-bounded dedup (streaming/dedup.py): first arrival
wins, re-deliveries within the horizon are dropped across a checkpointed
restart, and state expiry past the watermark re-admits the key — the
documented boundary of horizon-bounded dedup, pinned on purpose."""

from __future__ import annotations

import datetime as dt

from webgraph_ans_rs_spark.streaming.dedup import dedup_events_stream

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
T0 = dt.datetime(2024, 1, 1)


def _row(eid, minutes, value=1.0):
    return (eid, T0 + dt.timedelta(minutes=minutes), 1, "click", value)


def _run_pass(spark, src, out_dir, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    dd = dedup_events_stream(stream, key_cols=("event_id",), watermark="10 minutes")
    q = (
        dd.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()


def test_streaming_dedup_within_watermark_and_expiry(spark, tmp_path):
    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(src)

    def emitted():
        rows = spark.read.parquet(out_dir).collect()
        out: dict[int, int] = {}
        for r in rows:
            out[r.event_id] = out.get(r.event_id, 0) + 1
        return out

    # pass 1: e0, e1, and an in-batch re-delivery of e0 → each key once
    write([_row(0, 0), _row(1, 1), _row(0, 2, value=99.0)])
    _run_pass(spark, src, out_dir, ckpt)
    assert emitted() == {0: 1, 1: 1}

    # pass 2 (restart from checkpoint): cross-batch re-delivery of e0
    # within the horizon is dropped by restored state; fresh e2 passes
    write([_row(0, 3, value=99.0), _row(2, 4)])
    _run_pass(spark, src, out_dir, ckpt)
    assert emitted() == {0: 1, 1: 1, 2: 1}

    # pass 3: advance event time far past the horizon (watermark moves to
    # ~170min after this batch), expiring e0's state
    write([_row(3, 180)])
    _run_pass(spark, src, out_dir, ckpt)
    # pass 4: a re-delivery of e0 after expiry is re-admitted — the
    # honest boundary of watermark-bounded dedup (state is O(horizon
    # keys), so ancient keys cannot be remembered)
    write([_row(0, 181, value=99.0)])
    _run_pass(spark, src, out_dir, ckpt)
    got = emitted()
    assert got[1] == 1 and got[2] == 1 and got[3] == 1
    assert got[0] == 2


def test_batch_fallback_plain_dedup(spark):
    df = spark.createDataFrame([_row(0, 0), _row(0, 2), _row(1, 1)], SCHEMA)
    out = dedup_events_stream(df).collect()
    assert sorted(r.event_id for r in out) == [0, 1]
