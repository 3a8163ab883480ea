"""Skew-aware deterministic partition plan.

The reference processes one stream with a worker pool + sequence-ring reorder
(crates/copybook-codec-memory/src/worker_pool.rs:110-236) so parallel output
is byte-identical to single-threaded. Spark's analogue of that guarantee:
make *group membership* a pure function of the data, never of the scheduler —

    part_id = pmod(xxhash64(doc_id, seed=42), S(source))

where S(source) is a salting factor chosen by a driver-side pre-pass over
`groupBy(source).count()` (north rule: explicit skew handling for the hot
`source`). All rows of a (source, part_id) group land in one task after
`repartition`, are sorted by doc_id, and chunked by a fixed value budget —
so chunk content is identical at local[2], local[32], or 1000 executors.

At 100 TB the pre-pass is a cheap single shuffle over a low-cardinality key;
S caps any one group at ~target_values_per_part token values, so no task ever sees an
unbounded hot partition. AQE remains enabled as a backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_SEED = 42


def plan_salts(
    df: DataFrame,
    target_values_per_part: int,
    max_salt: int,
    min_groups: int = 64,
    chunk_floor: int = 65536,
) -> dict[str, int]:
    """Pre-pass: token values per source -> salt factor per source
    (driver-side; result is small: one row per distinct source). Value-based
    so task granularity tracks data volume, not doc counts.

    The effective per-group target is min(configured target, total/min_groups)
    so small inputs still fan out to ~min_groups tasks while huge inputs keep
    the configured ~2M-value groups. Both terms are functions of the DATA, so
    group membership — and therefore chunk content — stays identical at any
    cluster size."""
    rows = df.groupBy("source").agg(F.sum("n_tok").alias("values")).collect()
    total = sum(int(r["values"] or 0) for r in rows)
    # never shatter below one full chunk per group: tiny inputs keep full
    # chunks (compression) over fan-out (parallelism they don't need)
    target = max(
        min(target_values_per_part, max(total // min_groups, chunk_floor)), 1
    )
    plan: dict[str, int] = {}
    for r in rows:
        s = max(1, -(-int(r["values"] or 0) // target))  # ceil
        plan[r["source"]] = min(s, max_salt)
    return plan


def salt_mapping(salts: dict[str, int]):
    """source -> S literal map expression. The ONE construction shared by
    the encode side (with_part_id) and the lookup side (operators/lookup.py
    recovers S and replays the same hash + map to find a doc's part) — any
    drift between the two silently mis-routes point lookups."""
    return F.create_map(
        *[x for k, v in sorted(salts.items()) for x in (F.lit(k), F.lit(v))]
    )


def salt_hash(col):
    """EXACTLY the part-assignment hash: xxhash64(doc_id, lit(SALT_SEED)).
    Shared with operators/lookup.py for the same no-drift reason."""
    return F.xxhash64(col, F.lit(SALT_SEED))


def with_part_id(df: DataFrame, salts: dict[str, int]) -> DataFrame:
    """Add deterministic part_id = pmod(xxhash64(doc_id), S(source))."""
    salt_expr = F.lit(1)
    if salts:
        salt_expr = F.coalesce(salt_mapping(salts)[F.col("source")], F.lit(1))
    return df.withColumn(
        "part_id",
        F.pmod(salt_hash(F.col("doc_id")), salt_expr).cast("int"),
    )


def repartition_for_encode(
    df: DataFrame,
    num_partitions: int,
    content_cols: tuple[str, ...] = ("tokens",),
) -> DataFrame:
    """Co-locate each (source, part_id) group in one task, deterministic
    order within: the Spark translation of the reference's reader->workers->
    reorder triangle (SURVEY.md §3.1).

    The schema allows duplicate doc_ids; without a tiebreaker their relative
    order would be shuffle arrival order and chunk bytes would stop being a
    pure function of the data (invariant 2). xxhash64 over ALL content
    columns (tokens + any configured extra array columns) is
    content-derived, so duplicates sort deterministically; rows that tie on
    BOTH keys are identical rows (n_tok is derived), where order cannot
    affect bytes."""
    tie = F.xxhash64(*[F.col(c) for c in content_cols])
    return df.repartition(num_partitions, "source", "part_id").sortWithinPartitions(
        "source", "part_id", "doc_id", tie
    )
