"""Token-table sources.

Two providers of the canonical input table
(doc_id:string, tokens:array<int32>, n_tok:int32, source:string):

1. `token_table(spark, sf_dir)` — deterministic derivation from the driver's
   `lineitem` parquet, expressed with a SQL formula that DuckDB can replay
   verbatim (FIXTURES.md "Driver testdata mapping"), so every engine query has
   an oracle twin over the *same* data.
2. `synthetic_tokens(spark, profile, n_docs)` — seeded numpy generators per
   codec-stress profile (FIXTURES.md profiles; the analogue of the
   reference's copybook-gen templates, tools/copybook-gen/src/data.rs:24-110).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

VOCAB = 50257  # GPT-2-ish

# Keep these formulas in exact lockstep with oracle_sql() in
# __spark_entry__.py — the driver hash-compares values. (l_orderkey,
# l_linenumber) is NOT unique in the driver's synthetic lineitem, so doc_id
# uses 4 key columns + a partitioned row_number tiebreaker (full rows are
# unique, so the ORDER BY makes rn deterministic; no global window needed —
# scales to any SF).
_RN = (
    "row_number() OVER (PARTITION BY l_orderkey, l_linenumber, l_partkey, "
    "l_suppkey ORDER BY l_quantity, l_extendedprice, l_shipdate)"
)
DOC_ID_EXPR = (
    f"concat('doc_', l_orderkey, '_', l_linenumber, '_', l_partkey, '_', "
    f"l_suppkey, '_', {_RN})"
)

TOKENS_SPARK_EXPR = (
    "transform(sequence(1, 1 + pmod(l_partkey, 64)), "
    "i -> cast(pmod(l_suppkey * 31 + i * 17, 50257) as int))"
)
TOKENS_DUCKDB_EXPR = (
    "list_transform(range(1, 2 + l_partkey % 64), "
    "i -> CAST((l_suppkey * 31 + i * 17) % 50257 AS INTEGER))"
)

TOKEN_TABLE_DUCKDB_SQL = f"""
SELECT {DOC_ID_EXPR} AS doc_id,
       {TOKENS_DUCKDB_EXPR} AS tokens,
       CAST(1 + l_partkey % 64 AS INTEGER) AS n_tok,
       l_returnflag AS source
FROM lineitem
"""


def token_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (doc_id, tokens, n_tok, source) table from lineitem.

    `source` = l_returnflag is naturally skewed (N ≈ 50%), exercising the
    salting path; n_tok is the ODO-counter analogue (size(tokens) == n_tok,
    cf. Occurs::ODO, reference crates/copybook-core/src/schema.rs:204-220).
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.selectExpr(
        f"{DOC_ID_EXPR} as doc_id",
        f"{TOKENS_SPARK_EXPR} as tokens",
        "cast(1 + pmod(l_partkey, 64) as int) as n_tok",
        "l_returnflag as source",
    )


TOKEN_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)

# FIXTURES.md generation profiles (seed 42) — each stresses one codec.
PROFILES = (
    "uniform_hi",
    "lowcard",
    "runs",
    "narrow_range",
    "texty",
    "mixed",
    "skewed_source",
    "edge",
)


def _profile_doc(rng: np.random.Generator, profile: str) -> np.ndarray:
    if profile == "uniform_hi":
        n = int(np.clip(rng.lognormal(6.0, 0.6), 8, 4096))
        return rng.integers(0, VOCAB, n, dtype=np.int32)
    if profile == "lowcard":
        n = int(np.clip(rng.lognormal(5.0, 0.5), 8, 2048))
        # Zipf(s=1.3) over 256 symbols
        ranks = np.arange(1, 257, dtype=np.float64)
        p = ranks**-1.3
        p /= p.sum()
        return rng.choice(256, n, p=p).astype(np.int32)
    if profile == "runs":
        n = int(np.clip(rng.lognormal(5.5, 0.5), 8, 4096))
        out = np.empty(n, dtype=np.int32)
        pos = 0
        while pos < n:
            tok = rng.integers(0, 1000)
            run = min(int(rng.geometric(0.05)), n - pos)
            out[pos : pos + run] = tok
            pos += run
        return out
    if profile == "narrow_range":
        n = int(np.clip(rng.lognormal(5.5, 0.5), 8, 2048))
        k = int(rng.choice([4, 8, 12]))
        return (100000 + rng.integers(0, 1 << k, n)).astype(np.int32)
    if profile == "texty":
        # heavy bigram reuse from a 4096-symbol vocab
        n = int(np.clip(rng.lognormal(5.5, 0.5), 8, 2048))
        bigrams = rng.integers(0, 4096, (64, 2), dtype=np.int32)
        picks = rng.integers(0, 64, (n + 1) // 2)
        return bigrams[picks].reshape(-1)[:n].astype(np.int32)
    if profile == "edge":
        kind = int(rng.integers(0, 4))
        if kind == 0:
            return rng.integers(0, VOCAB, 1, dtype=np.int32)
        if kind == 1:
            return rng.integers(0, VOCAB, 2, dtype=np.int32)
        if kind == 2:
            n = int(rng.integers(1, 64))
            return np.full(n, int(rng.integers(0, VOCAB)), dtype=np.int32)
        return np.array([0, 2**31 - 1, VOCAB - 1], dtype=np.int32)
    raise ValueError(f"unknown profile {profile}")


def synthetic_arrays(
    profile: str, n_docs: int, seed: int = 42
) -> tuple[list[str], list[np.ndarray], list[str]]:
    """Seeded generation -> (doc_ids, token arrays, sources)."""
    rng = np.random.default_rng(seed)
    doc_ids = [f"{profile}_{i:08d}" for i in range(n_docs)]
    base_profiles = ["uniform_hi", "lowcard", "runs", "narrow_range", "texty"]
    arrays = []
    sources = []
    for i in range(n_docs):
        p = profile
        if profile == "mixed":
            p = base_profiles[int(rng.integers(0, len(base_profiles)))]
        elif profile == "skewed_source":
            p = "uniform_hi"
        arrays.append(_profile_doc(rng, p))
        if profile == "skewed_source":
            r = rng.random()
            sources.append(
                "web" if r < 0.90 else "books" if r < 0.95 else "code" if r < 0.99 else "wiki"
            )
        else:
            sources.append(profile)
    return doc_ids, arrays, sources


def synthetic_tokens(
    spark: SparkSession, profile: str, n_docs: int, seed: int = 42
) -> DataFrame:
    """Seeded fixture table as a Spark DataFrame (driver-side generation is
    test-only; bench/production input comes from parquet)."""
    doc_ids, arrays, sources = synthetic_arrays(profile, n_docs, seed)
    lens = np.array([len(a) for a in arrays], dtype=np.int32)
    values = np.concatenate(arrays) if arrays else np.empty(0, np.int32)
    offsets = np.zeros(len(arrays) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    tokens_arr = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(values, type=pa.int32())
    )
    batch = pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "tokens": tokens_arr,
            "n_tok": pa.array(lens, type=pa.int32()),
            "source": pa.array(sources, type=pa.string()),
        },
        schema=TOKEN_SCHEMA,
    )
    return spark.createDataFrame(batch)
