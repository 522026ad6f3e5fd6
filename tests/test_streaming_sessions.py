"""Custom stateful streaming sessionization (applyInPandasWithState):
inline closes, event-time-timeout closes across a checkpointed restart,
and cross-check against the built-in session_window path."""

from __future__ import annotations

import datetime as dt

from webgraph_ans_rs_spark.streaming.sessions import sessionize_stateful
from webgraph_ans_rs_spark.streaming.windows import sessionize

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
T0 = dt.datetime(2024, 1, 1)


def _run_pass(spark, src, out_dir, ckpt, gap_minutes=30):
    stream = spark.readStream.schema(SCHEMA).parquet(src).withWatermark(
        "ts", "10 minutes"
    )
    q = (
        sessionize_stateful(stream, gap_minutes=gap_minutes)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()


def test_stateful_sessions_close_inline_and_by_timeout(spark, tmp_path):
    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def m(minutes):
        return T0 + dt.timedelta(minutes=minutes)

    # pass 1 — user 1: events at 0,10 then 90 (gap 80 > 30 → inline close
    # of [0,10]); user 2: events at 0,5 (stays open; watermark after this
    # batch = 90-10 = 80, past 5+30 → timeout fires on the NEXT trigger)
    spark.createDataFrame(
        [
            (0, m(0), 1, "click", 1.0),
            (1, m(10), 1, "click", 1.0),
            (2, m(90), 1, "click", 1.0),
            (3, m(0), 2, "view", 1.0),
            (4, m(5), 2, "view", 1.0),
        ],
        SCHEMA,
    ).write.mode("append").parquet(src)
    _run_pass(spark, src, out_dir, ckpt)
    got1 = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert (1, m(0), m(10), 2) in got1  # inline close

    # pass 2 — restart from the checkpoint (state survives); one far-
    # future event advances the watermark past every open session + gap →
    # user 2's [0,5] and user 1's open [90,90] close by TIMEOUT
    spark.createDataFrame(
        [(5, m(600), 3, "click", 1.0)], SCHEMA
    ).write.mode("append").parquet(src)
    _run_pass(spark, src, out_dir, ckpt)
    got2 = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert (2, m(0), m(5), 2) in got2, got2
    assert (1, m(90), m(90), 1) in got2, got2


def test_stateful_sessions_match_builtin_session_window(spark, tmp_path):
    """On a flushed stream (sentinel advances the watermark past every
    real session), the custom-state closed sessions must equal the
    built-in F.session_window batch result on the real events."""
    import random

    rng = random.Random(11)
    rows = []
    eid = 0
    for user in range(1, 9):
        t = 0
        for _ in range(rng.randint(3, 12)):
            t += rng.choice([1, 3, 7, 40, 95])  # mixes intra/inter-gap steps
            rows.append((eid, T0 + dt.timedelta(minutes=t), user, "e", 1.0))
            eid += 1
    src = str(tmp_path / "src2")
    out_dir = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(src)
    # sentinel user far in the future: watermark sails past last+gap
    spark.createDataFrame(
        [(eid, T0 + dt.timedelta(days=30), 999, "flush", 1.0)], SCHEMA
    ).write.mode("append").parquet(src)
    _run_pass(spark, src, out_dir, ckpt)
    _run_pass(spark, src, out_dir, ckpt)  # second pass fires the timeouts
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
        if r.user_id != 999
    }
    batch = spark.createDataFrame(rows, SCHEMA)
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(batch, gap="30 minutes").collect()
    }
    # session_window's end = last_ts + gap; ours = last event ts
    want = {
        (u, s, e - dt.timedelta(minutes=30), n) for (u, s, e, n) in want
    }
    assert got == want


def test_stateful_sessions_merge_admissible_late_events(spark, tmp_path):
    """Out-of-order events ABOVE the watermark must merge into the session
    they belong to — never split it or regress its bounds. Batch 1: events
    at 0 and 29 (watermark → 19). Batch 2: a late in-gap event at 25 plus
    a far event at 60. True sessions: [0,29] ×3 events, then [60,60] —
    the pre-rework state machine emitted a bogus [0,25] close here."""
    src = str(tmp_path / "src3")
    out_dir = str(tmp_path / "out3")
    ckpt = str(tmp_path / "ckpt3")

    def m(minutes):
        return T0 + dt.timedelta(minutes=minutes)

    spark.createDataFrame(
        [(0, m(0), 7, "e", 1.0), (1, m(29), 7, "e", 1.0)], SCHEMA
    ).write.mode("append").parquet(src)
    _run_pass(spark, src, out_dir, ckpt)
    spark.createDataFrame(
        [(2, m(25), 7, "e", 1.0), (3, m(60), 7, "e", 1.0)], SCHEMA
    ).write.mode("append").parquet(src)
    _run_pass(spark, src, out_dir, ckpt)
    # flush: advance the watermark far past 60 + gap
    spark.createDataFrame(
        [(4, m(1000), 999, "flush", 1.0)], SCHEMA
    ).write.mode("append").parquet(src)
    _run_pass(spark, src, out_dir, ckpt)
    _run_pass(spark, src, out_dir, ckpt)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
        if r.user_id == 7
    }
    assert got == {(7, m(0), m(29), 3), (7, m(60), m(60), 1)}, got


def test_stateful_sessions_emit_only_after_watermark(spark, tmp_path):
    """Append-mode finality: a session whose last+gap the watermark has
    NOT passed is never emitted, even when a later event in the same
    batch sits more than a gap away (the pre-rework 'inline close')."""
    src = str(tmp_path / "src4")
    out_dir = str(tmp_path / "out4")
    ckpt = str(tmp_path / "ckpt4")

    def m(minutes):
        return T0 + dt.timedelta(minutes=minutes)

    # one batch: [0] and [45] — gap 30 splits them, but the watermark
    # DURING this batch is 0, so nothing may be emitted yet
    spark.createDataFrame(
        [(0, m(0), 8, "e", 1.0), (1, m(45), 8, "e", 1.0)], SCHEMA
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src).withWatermark(
        "ts", "10 minutes"
    )
    q = (
        sessionize_stateful(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sess_finality")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sess_finality").collect()
    }
    # the [0,0] session may close once the watermark (45-10=35) passes
    # 0+30 — on the availableNow timeout sweep — but [45,45] must NOT
    assert (8, m(45), m(45), 1) not in rows
