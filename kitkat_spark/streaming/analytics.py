"""Streaming-native analytics: the q_stream_* batch analogs as REAL
Structured Streaming transforms with watermarks and state.

The driver oracle checks the batch analogs (operators/temporal.py); this
module is the production streaming form of the same operators, tested by
replaying ``events`` through a file source and asserting the streaming
result equals the batch result (the exactly-once contract).

State sizing at 100 TB (SURVEY.md §4): state per key-window is O(aggregate
size), evicted at watermark; with a 10-minute delay and ~1e6 active
user-keys the state store holds ~minutes of keys, not history. For larger
cardinalities configure the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass`` ->
``RocksDBStateStoreProvider``) — spillable, incremental-checkpointed state
instead of executor-heap HDFSBackedStateStore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "10 minutes"


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type (streaming form of
    q_stream_tumbling). Late rows beyond the watermark are dropped; the
    window close emits exactly one final row per (window, event_type) in
    append mode."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked sliding-window aggregate (q_stream_sliding streaming
    form). Each event lands in window/slide buckets — state is
    (window/slide)x larger than tumbling; watermark eviction bounds it."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(F.col(ts_col), window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user (q_sessionize streaming form) via the native
    ``session_window`` — dynamic-gap state merged by the state store, not a
    gap-and-island window function (that's the batch/oracle analog)."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.session_window(F.col(ts_col), gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "ts",
) -> DataFrame:
    """Exact streaming dedup (q_dedup streaming form). With a watermark the
    key set is evicted as event time advances — bounded state, the only way
    dedup survives an unbounded stream; unbounded dropDuplicates state grows
    forever at 100 TB/day."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
        return events.dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
