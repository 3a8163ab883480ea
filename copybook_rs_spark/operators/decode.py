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


_ALL_COLUMNS = ("doc_id", "tokens", "n_tok", "source")


def _decode_one(
    blob_bytes: bytes, source: str, columns: tuple[str, ...], out_schema: pa.Schema
) -> pa.RecordBatch:
    need_docs = "doc_id" in columns
    need_values = "tokens" in columns
    doc_bytes, doc_lens, lengths, values = blob.decode_chunk(
        blob_bytes, need_docs=need_docs, need_values=need_values
    )
    n = len(lengths)
    arrays = []
    for col in columns:
        if col == "doc_id":
            # StringArray straight from (offsets, bytes) — no per-row Python
            doc_offsets = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(doc_lens, out=doc_offsets[1:])
            arrays.append(
                pa.StringArray.from_buffers(
                    n,
                    pa.py_buffer(doc_offsets.tobytes()),
                    pa.py_buffer(doc_bytes),
                )
            )
        elif col == "tokens":
            if len(values) and (
                values.min() < -(2**31) or values.max() >= 2**31
            ):
                raise ValueOverflowError("decoded token outside int32 range")
            tok_offsets = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(lengths, out=tok_offsets[1:])
            arrays.append(
                pa.ListArray.from_arrays(
                    pa.array(tok_offsets),
                    pa.array(values.astype(np.int32), type=pa.int32()),
                )
            )
        elif col == "n_tok":
            arrays.append(pa.array(lengths.astype(np.int32), type=pa.int32()))
        else:  # source
            arrays.append(
                pa.array(np.full(n, source, dtype=object), type=pa.string())
            )
    return pa.RecordBatch.from_arrays(arrays, schema=out_schema)


def make_decode_kernel(columns: tuple[str, ...], out_schema: pa.Schema):
    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            blobs = batch.column("blob")
            sources = batch.column("source").to_pylist()
            for i in range(batch.num_rows):  # per-chunk loop (chunks are large)
                yield _decode_one(blobs[i].as_py(), sources[i], columns, out_schema)

    return kernel


def decode_kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    yield from make_decode_kernel(_ALL_COLUMNS, _TOKEN_PA_SCHEMA)(batches)


def decode_tokens(chunk_df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Chunk table -> token table. Only blob+source are read from parquet
    (Catalyst prunes the scan), and `columns` pushes projection INTO the
    blob: sections decode independently, so e.g. columns=["doc_id","n_tok"]
    never decompresses token values (the storage-level --select closure,
    reference crates/copybook-core/src/projection.rs:48)."""
    if columns is None:
        cols = _ALL_COLUMNS
    else:
        unknown = set(columns) - set(_ALL_COLUMNS)
        if unknown:
            from copybook_rs_spark.functions.projection import UnknownColumnError

            raise UnknownColumnError(f"unknown decode columns {sorted(unknown)}")
        cols = tuple(c for c in _ALL_COLUMNS if c in set(columns))
    out_pa = pa.schema([f for f in _TOKEN_PA_SCHEMA if f.name in cols])
    out_spark = StructType([f for f in TOKEN_SPARK_SCHEMA.fields if f.name in cols])
    return chunk_df.select("blob", "source").mapInArrow(
        make_decode_kernel(cols, out_pa), out_spark
    )
