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


def build_ann_index(
    df: DataFrame, dim: int, out_dir: str, n_planes: int = 8, seed: int = 42
) -> None:
    """Persist the LSH signature table partitioned by bucket, so a probe
    reads ONLY its bucket directories (partition pruning — the Iceberg
    hidden-partitioning shape). The index is a pure function of
    (data, n_planes, seed): rebuildable on any cluster size, and usable by
    every later query without recomputing signatures over the corpus."""
    sigs = lsh_signatures(df, dim, n_planes, seed)
    sigs.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(out_dir)


def read_ann_index(spark, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)


def probe_buckets(
    query: list[float], n_planes: int = 8, seed: int = 42, n_probes: int = 1
) -> list[int]:
    """Multi-probe sequence: the query's own bucket, then buckets reached by
    flipping the LEAST-confident hyperplane bits first (smallest |proj| —
    standard multi-probe LSH), deterministic for a given query."""
    import itertools

    planes = _hyperplanes(len(query), n_planes, seed)
    proj = np.asarray(query, dtype=np.float32) @ planes.T
    qsig = int(
        ((proj > 0).astype(np.int32) * (1 << np.arange(n_planes))).sum()
    )
    order = np.argsort(np.abs(proj), kind="stable").tolist()
    probes = [qsig]
    for r in range(1, n_planes + 1):
        for comb in itertools.combinations(order, r):
            if len(probes) >= n_probes:
                return probes
            mask = 0
            for b in comb:
                mask |= 1 << b
            probes.append(qsig ^ mask)
    return probes[:n_probes]


_IVF_SCHEMA = "vec_id long, list_id int"
_IVF_PA = pa.schema([("vec_id", pa.int64()), ("list_id", pa.int32())])


def train_ivf_centroids(
    df: DataFrame,
    dim: int,
    n_lists: int = 64,
    sample_cap: int = 65536,
    iters: int = 10,
) -> np.ndarray:
    """Spherical k-means coarse quantizer (IVF), trained driver-side on a
    deterministic sample (first sample_cap vectors by vec_id — a TakeOrdered,
    cheap at any scale). Deterministic init (first n_lists sample rows) +
    fixed Lloyd iterations -> the same centroids on any cluster size.
    Returns (n_lists, dim) float32, unit-normalized."""
    rows = (
        df.select("vec_id", "embedding").orderBy("vec_id").limit(sample_cap).collect()
    )
    mat = np.array([r["embedding"] for r in rows], dtype=np.float32)
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    cents = unit[: min(n_lists, len(unit))].copy()
    if len(cents) < n_lists:
        n_lists = len(cents)
    for _ in range(iters):
        assign = np.argmax(unit @ cents.T, axis=1)
        for c in range(n_lists):
            members = unit[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-30)
    return cents


def _ivf_kernel(cents: np.ndarray):
    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        dim = cents.shape[1]
        for batch in batches:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            emb = batch.column("embedding")
            offs = np.frombuffer(emb.buffers()[1], dtype=np.int32)[
                emb.offset : emb.offset + len(emb) + 1
            ]
            flat = emb.values.to_numpy(zero_copy_only=False)
            mat = flat[offs[0] : offs[-1]].reshape(len(ids), dim)
            unit = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-30
            )
            lists = np.argmax(unit @ cents.T, axis=1).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(lists, pa.int32())],
                schema=_IVF_PA,
            )

    return kernel


def ivf_assignments(df: DataFrame, cents: np.ndarray) -> DataFrame:
    """(vec_id, list_id): nearest-centroid assignment, one BLAS call per
    Arrow batch (centroids ship in the task closure — n_lists x dim floats)."""
    return df.select("vec_id", "embedding").mapInArrow(
        _ivf_kernel(cents), _IVF_SCHEMA
    )


def build_ivf_index(df: DataFrame, cents: np.ndarray, out_dir: str) -> None:
    """Persist IVF assignments partitioned by list_id: a query reads only
    its probed inverted lists (partition pruning), the 100 TB ANN shape.
    Measured on the embeddings fixture: recall@10 = 0.67 scanning 3% of the
    corpus at n_probe=1 (n_lists=32) vs 0.11 for single-table hyperplane
    LSH at the same scan budget — see BENCH/BASELINE.md."""
    ivf_assignments(df, cents).repartition("list_id").write.mode(
        "overwrite"
    ).partitionBy("list_id").parquet(out_dir)


def ivf_topk(
    df: DataFrame,
    cents: np.ndarray,
    query: list[float],
    k: int = 10,
    n_probe: int = 2,
    index: DataFrame | None = None,
) -> DataFrame:
    """ANN top-k via IVF: exact cosine re-rank inside the n_probe nearest
    inverted lists. Pass `index` (build_ivf_index output) to skip the
    assignment pass."""
    q = np.asarray(query, dtype=np.float32)
    qu = q / max(np.linalg.norm(q), 1e-30)
    probes = [int(x) for x in np.argsort(-(cents @ qu), kind="stable")[:n_probe]]
    sigs = index if index is not None else ivf_assignments(df, cents)
    cand = sigs.filter(F.col("list_id").isin(probes)).select("vec_id")
    return cosine_topk(df.join(cand, "vec_id", "inner"), query, k)


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    n_probes: int = 1,
    index: DataFrame | None = None,
) -> DataFrame:
    """ANN top-k: exact cosine re-rank restricted to the query's probed LSH
    buckets. Pass `index` (from build_ann_index/read_ann_index) to skip the
    corpus-wide signature pass — the probe then costs one partition-pruned
    index read + a semi-join on vec_id. n_probes is the recall knob
    (recall@10 vs brute force on the embeddings fixture is receipted in
    BENCH/BASELINE.md)."""
    probes = probe_buckets(query, n_planes, seed, n_probes)
    sigs = (
        index
        if index is not None
        else lsh_signatures(df, len(query), n_planes, seed)
    )
    cand = sigs.filter(F.col("bucket").isin(probes)).select("vec_id")
    return cosine_topk(df.join(cand, "vec_id", "inner"), query, k)


def _pair_cosine() -> "F.Column":
    """cos(a.embedding, b.embedding) in DOUBLE with a sequential fold —
    the exact expression shape of ann_cosine_topk_sql, so Spark and DuckDB
    compute bit-identical values (order-stable, no parallel reduction)."""
    dot = F.expr(
        "aggregate(zip_with(a.embedding, b.embedding, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    na = F.expr(
        "sqrt(aggregate(transform(a.embedding, x -> CAST(x AS DOUBLE) * "
        "CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    nb = F.expr(
        "sqrt(aggregate(transform(b.embedding, x -> CAST(x AS DOUBLE) * "
        "CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    return dot / (na * nb)


_SQNORM = (
    "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)


def _nonzero(df: DataFrame) -> DataFrame:
    """Drop zero-norm vectors: their cosine is undefined — under ANSI mode
    the division raises, with ANSI off NaN compares true against any
    threshold and the zero vector would pair with the whole corpus. The
    oracle twin (functions/text.py) filters identically."""
    return df.filter(F.expr(_SQNORM) > 0)


def embedding_pairs_exact(df: DataFrame, threshold: float) -> DataFrame:
    """All (id_a < id_b) pairs with cosine >= threshold by brute-force
    self-join — O(n^2): the correctness oracle twin and the small-corpus
    path. At scale use embedding_near_dup_pairs (LSH-bucketed). Zero-norm
    vectors never pair (see _nonzero)."""
    nz = _nonzero(df)
    a, b = nz.alias("a"), nz.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(_pair_cosine() >= threshold)
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
        )
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float,
    n_planes: int = 8,
    seed: int = 42,
    n_tables: int = 4,
    max_bucket_size: int = 4096,
) -> DataFrame:
    """(id_a < id_b) candidate pairs sharing a random-hyperplane LSH bucket
    in ANY of n_tables independent signature tables, verified with exact
    cosine >= threshold. The 100 TB shape: per table one bucket equi-join
    over the signature table (same plan as MinHash-LSH text dedup), exact
    re-rank only inside candidate buckets; degenerate buckets above
    max_bucket_size are dropped (boilerplate/zero vectors — the text-LSH
    cap argument, operators/dedup.py:near_dup_candidates).

    Recall: P[same bucket in >=1 of t tables] = 1 - (1 - (1 - θ/π)^p)^t for
    angle θ; tested against embedding_pairs_exact on planted near-dups.
    Zero-norm vectors never pair (see _nonzero)."""
    df = _nonzero(df)
    cand = None
    for t in range(n_tables):
        sigs = lsh_signatures(df, dim, n_planes, seed + 1000003 * t)
        sizes = sigs.groupBy("bucket").agg(F.count("*").alias("_bsz"))
        keep = sigs.join(
            sizes.filter(F.col("_bsz") <= max_bucket_size).drop("_bsz"),
            "bucket",
        )
        p = (
            keep.alias("x")
            .join(
                keep.alias("y"),
                (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.vec_id") < F.col("y.vec_id")),
            )
            .select(
                F.col("x.vec_id").alias("id_a"), F.col("y.vec_id").alias("id_b")
            )
        )
        cand = p if cand is None else cand.unionAll(p)
    cand = cand.distinct()
    a = df.select(F.col("vec_id").alias("id_a"), F.col("embedding"))
    b = df.select(F.col("vec_id").alias("id_b"), F.col("embedding"))
    joined = (
        cand.join(a.alias("a"), "id_a").join(b.alias("b"), "id_b")
    )
    return joined.filter(_pair_cosine() >= threshold).select("id_a", "id_b")


def dedup_embeddings(
    df: DataFrame,
    dim: int | None = None,
    threshold: float = 0.9,
    method: str = "lsh",
    **kw,
) -> DataFrame:
    """Embedding-cosine near-duplicate removal: pairs (exact or LSH) ->
    connected components -> keep the deterministic representative (min
    vec_id) per cluster — the embedding-space twin of dedup_near
    (operators/dedup.py), sharing its clustering operator."""
    from copybook_rs_spark.operators.dedup import connected_components

    if method == "exact":
        pairs = embedding_pairs_exact(df, threshold)
    else:
        if dim is None:
            raise ValueError("dedup_embeddings(method='lsh') requires dim")
        pairs = embedding_near_dup_pairs(df, dim, threshold, **kw)
    comp = connected_components(pairs)
    losers = (
        comp.filter(F.col("doc_id") != F.col("cluster_id"))
        .select(F.col("doc_id").alias("vec_id"))
    )
    return df.join(losers, "vec_id", "left_anti")
