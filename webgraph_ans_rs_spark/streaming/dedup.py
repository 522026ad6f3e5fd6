"""Streaming event deduplication under bounded late data.

A crawl-event / training-data ingestion stream sees re-deliveries: the
fetcher retries, the queue redelivers on timeout, a producer double-sends
after a network blip. Exactly-once downstream semantics need a dedup
stage, but keeping every key ever seen is O(stream length) state — the
production contract is *dedup within the lateness horizon*: a re-delivery
arriving within the watermark is dropped, and key state is expired once
the watermark passes it, bounding state to the keys of the horizon.

That is precisely Structured Streaming's ``dropDuplicatesWithinWatermark``
(the watermark-bounded variant of ``dropDuplicates``): first arrival per
key wins and is emitted in append mode; state eviction is the engine's,
driven by the same event-time watermark the windowed aggregations use.
After state expiry a re-delivery is emitted again — the documented (and
honest) boundary of horizon-bounded dedup; the test pins both sides.

At 100 TB scale the state store is per-key hash state partitioned by the
dedup key (one shuffle), checkpointed via the streaming commit log —
restart-safe across micro-batches, the same recovery contract as the
stateful sessionizer (streaming/sessions.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_events_stream(
    events: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-arrival-wins dedup of ``events`` on ``key_cols`` within the
    event-time ``watermark`` horizon. Streaming inputs get the
    watermark-bounded state-expiring semantics; batch inputs degrade to
    plain ``dropDuplicates`` (batch has no horizon — the whole input is
    the horizon), so the same call sites serve backfill and live paths."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    return events.dropDuplicates(list(key_cols))
