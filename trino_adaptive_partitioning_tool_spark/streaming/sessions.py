"""Streaming session windows + watermarked deduplication (SURVEY §2.9
extension — the reference is batch-only; src/cli.py:14-15 re-scans the
log per run).

Two canonical stateful-streaming topologies the batch engine already has
twins for:

* `user_session_rollup` — per-user `session_window` aggregation over an
  event stream, the streaming twin of the batch sessionize_events query
  (queries/core_sql2.py). Spark's native session window merges adjacent
  state as events arrive; with a watermark the state store only retains
  open sessions newer than the watermark, so state is bounded by the
  number of concurrently-active users × gap, independent of history.

* `dedup_events_stream` — exact streaming deduplication with
  `dropDuplicatesWithinWatermark`: the state store keeps one fingerprint
  per key only until the watermark passes it, the standard way to
  de-duplicate an at-least-once ingest feed (e.g. Kafka replays) without
  unbounded state. Batch twin: dedup_exact (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_session_rollup(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 days",
) -> DataFrame:
    """Per-user session aggregation over an event-time stream.

    Output: one row per (user_id, session) with event count, total value
    and session bounds — identical columns to the batch
    sessionize_events query so tests can assert stream == batch.
    """
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def dedup_events_stream(
    events_stream: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 days",
) -> DataFrame:
    """Watermark-bounded exact dedup of an event stream.

    Keeps the first arrival per key; the per-key state entry is dropped
    once the watermark passes its event time, so a replayed/duplicated
    feed dedupes with O(active-window keys) state.
    """
    keys = keys or ["event_id"]
    return events_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys
    )
