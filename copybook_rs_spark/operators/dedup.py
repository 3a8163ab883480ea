"""Deduplication operators over the documents table.

Exact (hash-groupBy), MinHash-LSH (shingle -> minhash -> band -> bucket
join), SimHash (64-bit majority fingerprint via numpy kernel), n-gram
Jaccard verification. The SQL-expressible faces live in functions/text.py
(with DuckDB oracle twins); these are the DataFrame/kernel engines.

At 100 TB scale: exact dedup is one hash-shuffle on the digest; MinHash-LSH
shuffles (band, bucket) pairs — bucket join is an equi-join Catalyst plans
as a shuffled hash join; SimHash is embarrassingly parallel (mapInArrow).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one row per distinct content digest (deterministic winner:
    min doc_id per digest) — hash-groupBy, one shuffle."""
    digest = F.md5(F.col(text_col))
    w = df.withColumn("_digest", digest)
    winners = w.groupBy("_digest").agg(F.min("doc_id").alias("doc_id"))
    return w.join(winners, ["_digest", "doc_id"], "inner").drop("_digest")


def minhash_buckets(
    df: DataFrame, n_seeds: int = 8, band_size: int = 4, text_col: str = "text"
) -> DataFrame:
    """(doc_id, band_idx, bucket) — the LSH candidate index.

    md5-string MinHash (see functions/text.py): deterministic, no UDF,
    whole pipeline stays in Catalyst expressions."""
    words = F.split(F.col(text_col), " ")
    sh = F.expr(
        "transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)), "
        "i -> concat_ws('_', element_at(split(text, ' '), i), "
        "element_at(split(text, ' '), least(i + 1, size(split(text, ' ')))), "
        "element_at(split(text, ' '), least(i + 2, size(split(text, ' '))))))"
    )
    out = df.select("doc_id", sh.alias("sh"))
    sig_cols = [
        F.array_min(
            F.transform("sh", lambda x, k=k: F.md5(F.concat(F.lit(f"s{k}_"), x)))
        ).alias(f"s{k}")
        for k in range(n_seeds)
    ]
    sigs = out.select("doc_id", *sig_cols)
    bands = None
    for b in range(n_seeds // band_size):
        cols = [f"s{b * band_size + j}" for j in range(band_size)]
        part = sigs.select(
            "doc_id",
            F.lit(b).alias("band_idx"),
            F.md5(F.concat(*[F.col(c) for c in cols])).alias("bucket"),
        )
        bands = part if bands is None else bands.unionAll(part)
    return bands


def near_dup_candidates(df: DataFrame, **kw) -> DataFrame:
    """Candidate pairs (id_a < id_b) sharing any LSH bucket."""
    b = minhash_buckets(df, **kw)
    a = b.alias("a")
    c = b.alias("b")
    return (
        a.join(
            c,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


_SIMHASH_SCHEMA = "doc_id long, simhash long"
_SIMHASH_PA = pa.schema([("doc_id", pa.int64()), ("simhash", pa.int64())])


def _simhash_kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    # 64-bit SimHash over word unigrams: per word an FNV-1a 64 hash; the
    # fingerprint bit b is the majority vote of word-hash bits, vectorized.
    FNV_OFF = np.uint64(0xCBF29CE484222325)
    FNV_PRM = np.uint64(0x100000001B3)
    for batch in batches:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        out = np.zeros(len(texts), dtype=np.uint64)
        for r, t in enumerate(texts):  # per-doc loop; inner ops vectorized
            words = t.split(" ")
            if not words:
                continue
            # vectorized FNV-1a over the padded byte matrix
            maxlen = max(len(w) for w in words)
            mat = np.zeros((len(words), maxlen), dtype=np.uint64)
            lens = np.empty(len(words), dtype=np.int64)
            for i, w in enumerate(words):
                bw = w.encode()
                lens[i] = len(bw)
                if bw:
                    mat[i, : len(bw)] = np.frombuffer(bw, np.uint8)
            h = np.full(len(words), FNV_OFF, dtype=np.uint64)
            for c in range(maxlen):
                live = lens > c
                h[live] = (h[live] ^ mat[live, c]) * FNV_PRM
            bits = (h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            votes = bits.sum(axis=0)
            fp = ((votes * 2 > len(words)).astype(np.uint64)
                  << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
            out[r] = fp
        yield pa.RecordBatch.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(out.view(np.int64), pa.int64())],
            schema=_SIMHASH_PA,
        )


def simhash(df: DataFrame) -> DataFrame:
    """(doc_id, simhash int64). Near-dups = small Hamming distance; pairs
    within distance d are found by joining on rotated prefix bands."""
    return df.select("doc_id", "text").mapInArrow(_simhash_kernel, _SIMHASH_SCHEMA)
