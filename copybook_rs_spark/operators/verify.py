"""Round-trip verification as a DataFrame job.

The engine-side analogue of the reference's `copybook verify` command and
RoundTripConfig::run (crates/copybook-cli/src/commands/verify.rs,
crates/copybook-codec/src/roundtrip.rs:89): decode(encode(df)) must equal df
exactly, reported as a mismatch DataFrame (empty == pass) instead of a CLI
report. Full-outer join on doc_id catches drops, duplicates and corruption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from copybook_rs_spark.config import EncodeConfig
from copybook_rs_spark.operators.decode import decode_tokens
from copybook_rs_spark.operators.encode import encode_tokens


def roundtrip_mismatches(df: DataFrame, cfg: EncodeConfig | None = None) -> DataFrame:
    """Rows where decode(encode(df)) differs from df (must be empty).

    Sort-merge/hash equi-join on doc_id — built-in, test-scale only
    (SURVEY.md §2.3); production verification samples per partition.
    """
    decoded = decode_tokens(encode_tokens(df, cfg))
    a = df.select(
        F.col("doc_id"),
        F.col("tokens").alias("tokens_a"),
        F.col("n_tok").alias("n_tok_a"),
        F.col("source").alias("source_a"),
    )
    b = decoded.select(
        F.col("doc_id"),
        F.col("tokens").alias("tokens_b"),
        F.col("n_tok").alias("n_tok_b"),
        F.col("source").alias("source_b"),
    )
    joined = a.join(b, "doc_id", "full_outer")
    return joined.filter(
        F.col("tokens_a").isNull()
        | F.col("tokens_b").isNull()
        | (F.col("tokens_a") != F.col("tokens_b"))
        | (F.col("n_tok_a") != F.col("n_tok_b"))
        | (F.col("source_a") != F.col("source_b"))
    )


def verified_counts(df: DataFrame, cfg: EncodeConfig | None = None) -> DataFrame:
    """Per-source count of docs/tokens that survive the round-trip exactly —
    the SQL-checkable face of verification (oracle: plain counts over the
    input, since the invariant is 100% survival)."""
    decoded = decode_tokens(encode_tokens(df, cfg))
    a = df.select("doc_id", "tokens", "n_tok", "source")
    b = decoded.select(
        F.col("doc_id"),
        F.col("tokens").alias("tokens_b"),
        F.col("n_tok").alias("n_tok_b"),
        F.col("source").alias("source_b"),
    )
    ok = a.join(b, "doc_id", "inner").filter(
        (F.col("tokens") == F.col("tokens_b"))
        & (F.col("n_tok") == F.col("n_tok_b"))
        & (F.col("source") == F.col("source_b"))
    )
    return ok.groupBy("source").agg(
        F.count("*").alias("docs_verified"),
        F.sum("n_tok").alias("tokens_verified"),
    )
