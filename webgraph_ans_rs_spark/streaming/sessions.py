"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The built-in ``F.session_window`` (streaming/windows.py `sessionize`)
covers the declarative case; this is the CUSTOM-state escape hatch —
the pattern for stateful logic Structured Streaming's built-ins cannot
express (per-key state machines, CEP-ish rules, incremental sketches).
Semantics are deliberately the same gap-sessionization so the two paths
cross-check each other: an emitted row per CLOSED session, a session
closing only once the WATERMARK passes its last event + gap.

Late-data correctness (the round-5 advisor finding): state holds the
user's full set of PENDING sessions as merged intervals, and a session
is emitted ONLY when the watermark has passed ``last_ts + gap`` — never
inline on a later in-batch event. An out-of-order event above the
watermark therefore lands in (or bridges) exactly the session it
belongs to: intervals within ``gap`` of each other merge, starts take
the min, ends the max — the same merge rule as ``F.session_window``
(strict overlap: an event extends a session iff t − last < gap), and
emitted rows are FINAL under any arrival order the watermark admits.
Events below the watermark are dropped by Spark before this operator
runs, which is precisely what makes the emitted rows final.

State per user: the pending merged intervals (start_us[], last_us[],
n[]) — bounded by the user's ACTIVE sessions (intervals more than
``gap`` apart that the watermark hasn't released yet), typically one;
event-time timeouts fire at the earliest pending ``last + gap`` so
closed sessions drain without new traffic.

Scale shape: state is hash-partitioned by user_id across executors (the
normal streaming state store); each micro-batch touches only keys with
new events plus timed-out keys. Skewed users cost one state row like
anyone else — the per-batch group fan-in is the events of one user in
one micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
    ]
)
# state carries micros since epoch (long) — timestamps don't round-trip
# the state schema as cleanly across Arrow batches. Parallel arrays of
# the user's pending (unreleased) merged session intervals.
SESSION_STATE = StructType(
    [
        StructField("start_us", ArrayType(LongType())),
        StructField("last_us", ArrayType(LongType())),
        StructField("n", ArrayType(IntegerType())),
    ]
)


def _merge_sessions(sess: list, gap_us: int) -> list:
    """Interval merge with gap tolerance: sessions sorted by start; two
    merge when the later's start is within (strictly less than) gap of
    the earlier's last — identical to F.session_window's overlap rule
    (each event spans [t, t+gap))."""
    sess.sort()
    merged: list = []
    for s, l, n in sess:
        if merged and s - merged[-1][1] < gap_us:
            ps, pl, pn = merged[-1]
            merged[-1] = (ps, max(pl, l), pn + n)
        else:
            merged.append((s, l, n))
    return merged


def sessionize_stateful(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """STREAMING input (user_id, ts, ...) → stream of CLOSED sessions
    (user_id, session_start, session_end, n_events).

    A session closes when the WATERMARK passes ``last_ts + gap`` — on
    the batch after the watermark advances (for keys with traffic) or by
    event-time timeout (for idle keys); it is never emitted early, so
    every emitted row is FINAL even when admissible late events arrive
    out of order (they merge into the still-pending interval). The input
    must already carry a watermark (withWatermark('ts', ...)); the
    operator runs in append mode — compatible with append-mode file
    sinks."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        ts_us: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                ts_us.extend(
                    (pdf["ts"].astype("int64") // 1000).tolist()
                    if pdf["ts"].dtype.kind == "M"
                    else pdf["ts"].tolist()
                )
        if state.exists:
            starts, lasts, ns = state.get
            sess = [
                (int(s), int(l), int(n)) for s, l, n in zip(starts, lasts, ns)
            ]
        else:
            sess = []
        sess.extend((t, t, 1) for t in ts_us)
        merged = _merge_sessions(sess, gap_us)
        # release = watermark passed last + gap: no admissible future
        # event (t >= watermark) can merge into the interval anymore
        wm_us = state.getCurrentWatermarkMs() * 1000
        closed = [x for x in merged if x[1] + gap_us <= wm_us]
        pending = [x for x in merged if x[1] + gap_us > wm_us]
        if pending:
            state.update(
                (
                    [s for s, _, _ in pending],
                    [l for _, l, _ in pending],
                    [n for _, _, n in pending],
                )
            )
            # wake at the earliest pending release; CEIL to ms so a firing
            # watermark always satisfies the µs close condition, and the
            # timestamp must exceed the current watermark (Spark's
            # timeout contract)
            release_us = min(l for _, l, _ in pending) + gap_us
            release_ms = -((-release_us) // 1000)
            state.setTimeoutTimestamp(max(release_ms, wm_us // 1000 + 1))
        elif state.exists:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _ in closed
                    ],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUT,
        SESSION_STATE,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
