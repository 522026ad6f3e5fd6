"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The built-in ``F.session_window`` (streaming/windows.py `sessionize`)
covers the declarative case; this is the CUSTOM-state escape hatch —
the pattern for stateful logic Structured Streaming's built-ins cannot
express (per-key state machines, CEP-ish rules, incremental sketches).
Semantics are deliberately the same gap-sessionization so the two paths
cross-check each other: an emitted row per CLOSED session, a session
closing when no event lands within ``gap`` of its last event.

State per user: (session_start, last_ts, n_events) — O(1) per active
key, the state-size discipline that survives a day-long run at web
scale (state is bounded by ACTIVE sessions, and event-time timeouts
evict a session as soon as the watermark passes last_ts + gap).

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
# the state schema as cleanly across Arrow batches
SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", IntegerType()),
    ]
)


def sessionize_stateful(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """STREAMING input (user_id, ts, ...) → stream of CLOSED sessions
    (user_id, session_start, session_end, n_events).

    A session closes (a) inline, when a later event in the same or a
    later micro-batch arrives more than ``gap`` after the session's last
    event, or (b) by event-time timeout, when the WATERMARK passes
    last_ts + gap (so results are deterministic given the watermark — an
    open session is never emitted early). The input must already carry a
    watermark (withWatermark('ts', ...)); emitted rows are FINAL (a
    closed session never changes), so the operator runs in append
    mode — compatible with append-mode file sinks."""
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
        closed: list[tuple[int, int, int]] = []  # (start_us, end_us, n)
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0
        if ts_us:
            for t in sorted(ts_us):
                if start_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    closed.append((start_us, last_us, n))
                    start_us, last_us, n = t, t, 1
                else:
                    last_us = t
                    n += 1
            state.update((int(start_us), int(last_us), int(n)))
            state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        elif state.hasTimedOut and start_us is not None:
            closed.append((start_us, last_us, n))
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
