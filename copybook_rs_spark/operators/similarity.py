"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline (one pass, no shuffle beyond
the final top-k); the LSH-bucketed variant is the 100 TB path: a seeded
random-hyperplane signature per vector, bucket equi-join, exact re-rank
inside the candidate bucket only. Hyperplanes are derived from a fixed seed
so the index is deterministic and rebuildable on any cluster size.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F


def cosine_topk(df: DataFrame, query: list[float], k: int = 10) -> DataFrame:
    """Exact brute-force cosine top-k, JVM-side expressions only."""
    q = F.array(*[F.lit(float(x)) for x in query])
    dot = F.aggregate(
        F.zip_with("embedding", q, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm_e = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    qn = float(np.sqrt(np.sum(np.asarray(query, dtype=np.float64) ** 2)))
    sim = F.round(dot / (norm_e * F.lit(qn)), 4)
    return (
        df.select("vec_id", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


_SIG_SCHEMA = "vec_id long, bucket int"
_SIG_PA = pa.schema([("vec_id", pa.int64()), ("bucket", pa.int32())])


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def _sig_kernel(dim: int, n_planes: int, seed: int):
    planes = _hyperplanes(dim, n_planes, seed)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        weights = (1 << np.arange(n_planes)).astype(np.int32)
        for batch in batches:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            emb = batch.column("embedding")
            offs = np.frombuffer(emb.buffers()[1], dtype=np.int32)[
                emb.offset : emb.offset + len(emb) + 1
            ]
            flat = emb.values.to_numpy(zero_copy_only=False)
            mat = flat[offs[0] : offs[-1]].reshape(len(ids), dim)
            proj = mat @ planes.T  # (n, n_planes) — one BLAS call per batch
            buckets = ((proj > 0).astype(np.int32) * weights).sum(axis=1)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(buckets, pa.int32())],
                schema=_SIG_PA,
            )

    return kernel


def lsh_signatures(
    df: DataFrame, dim: int, n_planes: int = 8, seed: int = 42
) -> DataFrame:
    """(vec_id, bucket): random-hyperplane LSH signature per vector."""
    return df.select("vec_id", "embedding").mapInArrow(
        _sig_kernel(dim, n_planes, seed), _SIG_SCHEMA
    )


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: exact cosine re-rank restricted to the query's LSH bucket.
    At scale the signature table is precomputed/bucketed; here it is derived
    inline. Falls back to fewer than k rows if the bucket is small (standard
    LSH behavior; multi-probe is the recall knob)."""
    dim = len(query)
    planes = _hyperplanes(dim, n_planes, seed)
    qsig = int(
        (((np.asarray(query, dtype=np.float32) @ planes.T) > 0).astype(np.int32)
         * (1 << np.arange(n_planes))).sum()
    )
    sigs = lsh_signatures(df, dim, n_planes, seed)
    candidates = df.join(
        sigs.filter(F.col("bucket") == qsig), "vec_id", "inner"
    )
    return cosine_topk(candidates, query, k)
