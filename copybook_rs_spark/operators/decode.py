"""Decode pipeline: chunk-blob table -> token table via mapInArrow.

Inverse of operators/encode.py. Output must be bit-identical to the original
token arrays (the reference's round-trip contract,
crates/copybook-codec/src/roundtrip.rs:89; SHA-256-grade fidelity enforced
here by crc32-verified blobs + array equality pytest fixtures).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from copybook_rs_spark import blob
from copybook_rs_spark.errors import ValueOverflowError

TOKEN_SPARK_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType(), False), False),
        StructField("n_tok", IntegerType(), False),
        StructField("source", StringType(), False),
    ]
)

_TOKEN_PA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def _decode_one(blob_bytes: bytes, source: str) -> pa.RecordBatch:
    doc_bytes, doc_lens, lengths, values = blob.decode_chunk(blob_bytes)
    n = len(doc_lens)
    if len(values) and (values.min() < -(2**31) or values.max() >= 2**31):
        raise ValueOverflowError("decoded token outside int32 range")
    # doc_id StringArray straight from (offsets, bytes) — no per-row Python
    doc_offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(doc_lens, out=doc_offsets[1:])
    doc_arr = pa.StringArray.from_buffers(
        n,
        pa.py_buffer(doc_offsets.tobytes()),
        pa.py_buffer(doc_bytes),
    )
    tok_offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lengths, out=tok_offsets[1:])
    tokens_arr = pa.ListArray.from_arrays(
        pa.array(tok_offsets),
        pa.array(values.astype(np.int32), type=pa.int32()),
    )
    return pa.RecordBatch.from_arrays(
        [
            doc_arr,
            tokens_arr,
            pa.array(lengths.astype(np.int32), type=pa.int32()),
            pa.array(np.full(n, source, dtype=object), type=pa.string()),
        ],
        schema=_TOKEN_PA_SCHEMA,
    )


def decode_kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        blobs = batch.column("blob")
        sources = batch.column("source").to_pylist()
        for i in range(batch.num_rows):  # per-chunk loop (chunks are large)
            yield _decode_one(blobs[i].as_py(), sources[i])


def decode_tokens(chunk_df: DataFrame) -> DataFrame:
    """Chunk table -> (doc_id, tokens, n_tok, source). Only the two needed
    columns are read (Catalyst prunes the scan to blob+source)."""
    return chunk_df.select("blob", "source").mapInArrow(
        decode_kernel, TOKEN_SPARK_SCHEMA
    )
