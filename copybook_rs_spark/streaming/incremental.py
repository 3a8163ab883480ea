"""Incremental (micro-batch) encode over a growing token-table directory.

Spark translation of the reference's streaming decode loop
(crates/copybook-codec/src/iterator.rs:259 RecordIterator;
crates/copybook-codec-memory/src/streaming.rs:103 bounded-memory pipeline):
`readStream` watches a parquet directory, each micro-batch is encoded with
the SAME deterministic salt plan (fixed at stream start, so group identity
is stable across batches) and appended to the chunk table; the checkpoint
directory gives exactly-once micro-batch tracking, and the manifest is
rebuilt per batch (idempotent aggregation).

Chunk ids get a `batch_id` prefix in part-local sequence space: within one
micro-batch chunking is deterministic; across batches, arrival order is the
stream's own ordering (same stance as the reference: stream order is
preserved, never invented — SURVEY.md §2.6).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from copybook_rs_spark.config import EncodeConfig
from copybook_rs_spark.operators.decode import TOKEN_SPARK_SCHEMA
from copybook_rs_spark.operators.encode import encode_tokens
from copybook_rs_spark.sources.manifest import build_manifest


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
    chunks_path = os.path.join(out_dir, "chunks")
    manifest_path = os.path.join(out_dir, "manifest")
    checkpoint = os.path.join(out_dir, "_checkpoint")

    stream = (
        spark.readStream.schema(TOKEN_SPARK_SCHEMA)
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
        chunk_df.write.mode("append").partitionBy("source").parquet(chunks_path)
        build_manifest(
            batch_df.sparkSession.read.parquet(chunks_path)
        ).write.mode("overwrite").parquet(manifest_path)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
