"""Incremental (micro-batch) encode over a growing token-table directory.

Spark translation of the reference's streaming decode loop
(crates/copybook-codec/src/iterator.rs:259 RecordIterator;
crates/copybook-codec-memory/src/streaming.rs:103 bounded-memory pipeline):
`readStream` watches a parquet directory, each micro-batch is encoded with
the SAME deterministic salt plan (fixed at stream start, so group identity
is stable across batches) and committed under its own `batch=` directory.

Per-batch work is O(batch), never O(table):

- chunks land in   chunks/batch=b{id}/source=.../   (mode=overwrite — a
  replayed batch_id rewrites the same directory, so retries are idempotent
  and cross-batch chunk_id uniqueness follows from the b{id} prefix;
  within-batch uniqueness is asserted on the batch's own table)
- a per-batch manifest lands in manifest_parts/batch=b{id}/ (same
  idempotent overwrite)
- the table manifest is re-aggregated from manifest_parts — one row per
  (batch, group), NOT a rescan of the chunk table
  (sources/manifest.py:merge_manifest_parts)

Chunk ids get a `batch_id` prefix in part-local sequence space: within one
micro-batch chunking is deterministic; across batches, arrival order is the
stream's own ordering (same stance as the reference: stream order is
preserved, never invented — SURVEY.md §2.6). A later `compact_chunks` pass
restores the canonical single-batch layout (operators/encode.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from copybook_rs_spark.config import EncodeConfig
from copybook_rs_spark.operators.encode import encode_tokens
from copybook_rs_spark.sources.manifest import (
    assert_unique_chunk_ids,
    build_manifest,
    merge_manifest_parts,
)


def commit_batch(
    chunk_df: DataFrame, out_dir: str, batch_id: int
) -> None:
    """Idempotently commit one micro-batch's chunk table + manifest part,
    then refresh the table manifest from the (small) manifest parts."""
    spark = chunk_df.sparkSession
    tag = f"batch=b{batch_id:08d}"
    batch_dir = os.path.join(out_dir, "chunks", tag)
    chunk_df.write.mode("overwrite").partitionBy("source").parquet(batch_dir)
    written = spark.read.parquet(batch_dir)
    # every chunk-table write path asserts the no-split contract; the b{id}
    # prefix + per-batch overwrite extend uniqueness across batches/replays
    assert_unique_chunk_ids(written)
    part_dir = os.path.join(out_dir, "manifest_parts", tag)
    build_manifest(written).write.mode("overwrite").parquet(part_dir)
    parts = spark.read.parquet(os.path.join(out_dir, "manifest_parts"))
    merge_manifest_parts(parts).write.mode("overwrite").parquet(
        os.path.join(out_dir, "manifest")
    )


def incremental_encode(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    cfg: EncodeConfig | None = None,
    salts: dict[str, int] | None = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Start a streaming encode: parquet dir -> chunk table + manifest.

    `salts` must be provided (or defaults to {}) because a stream cannot
    run the batch pre-pass; pass the plan from a bootstrap batch run.
    """
    cfg = cfg or EncodeConfig()
    salts = salts or {}
    checkpoint = os.path.join(out_dir, "_checkpoint")

    # stream schema follows the config (int64 tokens / extra array columns
    # stream through the same sink unchanged)
    from copybook_rs_spark.operators.decode import _build_schemas

    cols = ("doc_id", "tokens", "n_tok", "source") + tuple(cfg.extra_columns)
    _, stream_schema = _build_schemas(cfg, cols)
    stream = (
        spark.readStream.schema(stream_schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        chunk_df = encode_tokens(batch_df, cfg, salts=salts).withColumn(
            "chunk_id",
            F.concat(F.lit(f"b{batch_id:08d}/"), F.col("chunk_id")),
        )
        commit_batch(chunk_df, out_dir, batch_id)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
