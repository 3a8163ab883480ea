"""Structured-Streaming face of the engine (SURVEY.md §2.9).

The north rule is batch; the reference's only streaming surface is a
pull-based record iterator (crates/copybook-codec/src/iterator.rs:259) and a
Kafka example. This module provides the Spark-idiomatic equivalent: an
incremental encode over a file stream with exactly-once sink semantics via
foreachBatch + the manifest."""

from copybook_rs_spark.streaming.incremental import incremental_encode  # noqa: F401
from copybook_rs_spark.streaming.windows import windowed_event_counts  # noqa: F401
from copybook_rs_spark.streaming.dedup import streaming_exact_dedup  # noqa: F401
