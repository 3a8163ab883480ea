"""Watermarked event-time windowed aggregation (Structured Streaming).

The streaming face of the batch `events_hourly` query: tumbling event-time
windows with a watermark, so late data inside the allowed lateness still
lands in its window while data later than the watermark is dropped and the
window state is finalized + garbage-collected (bounded state at any stream
length — the 100 TB requirement for an unbounded stream).

Append output mode emits each window exactly once, when the watermark
passes its end — the deterministic-finalization analogue of the engine's
batch determinism contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(window_start, window_end, event_type, n_events, max_value) over
    tumbling event-time windows. Works on a streaming OR batch DataFrame
    (the watermark is a no-op in batch, so batch output is the oracle for
    the on-time part of the stream)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "max_value",
        )
    )
