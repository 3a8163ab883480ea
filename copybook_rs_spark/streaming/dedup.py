"""Stateful streaming exact-dedup: first-occurrence pass-through.

Spark's native `dropDuplicates` on a stream keeps UNBOUNDED state (every
digest ever seen, forever). This operator implements the custom stateful
shape the engine needs at 100 TB — `applyInPandasWithState` with an
explicit per-digest state cell and an optional processing-time TTL that
EXPIRES old digests, trading cross-epoch dedup for bounded state (the
standard production compromise: near-in-time duplicates dominate real
crawl streams).

Semantics per micro-batch, per content digest:
  - digest never seen (no state): emit the first-seen row (deterministic
    winner: min doc_id within the batch — exact_dedup's stance), remember
    the digest;
  - digest in state: emit nothing;
  - TTL elapsed since last sighting: state expires, the digest's next
    occurrence is treated as new.

State per digest is a single int64 marker (the TTL clock itself lives in
Spark's timeout machinery, not in the cell) — the minimum possible
footprint. Grouping shuffles (digest) once per batch, identical to the
batch exact_dedup plan.

Reference analogue: the reference dedups nothing itself, but its streaming
iterator contract (crates/copybook-codec/src/iterator.rs:259 — stream
order preserved, bounded memory) is the constraint this operator obeys.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def streaming_exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming DataFrame -> first occurrence per content digest.

    Output schema = input schema (the digest grouping column is internal).
    state_ttl_minutes = None keeps digests forever (exact, unbounded state
    like dropDuplicates); a value bounds state at the cost of re-admitting
    duplicates that recur after the TTL."""
    if state_ttl_minutes is not None and state_ttl_minutes <= 0:
        raise ValueError(
            f"state_ttl_minutes must be positive or None, got {state_ttl_minutes}"
        )
    out_schema = df.schema
    cols = df.columns
    use_ttl = bool(state_ttl_minutes)
    ttl_ms = (state_ttl_minutes or 0) * 60_000

    def dedup_fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        if not seen:
            # deterministic winner across the whole batch group: min id_col
            best: pd.DataFrame | None = None
            for pdf in pdf_iter:
                if not len(pdf):
                    continue
                idx = pdf[id_col].idxmin()
                cand = pdf.loc[[idx]]
                if best is None or cand.iloc[0][id_col] < best.iloc[0][id_col]:
                    best = cand
            if best is not None:
                yield best[cols]
        else:
            for _ in pdf_iter:  # drain: all occurrences are duplicates
                pass
        state.update((0,))
        if use_ttl:
            state.setTimeoutDuration(ttl_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if use_ttl
        else GroupStateTimeout.NoTimeout
    )
    return (
        df.withColumn("_digest", F.md5(F.col(text_col)))
        .groupBy("_digest")
        .applyInPandasWithState(
            dedup_fn, out_schema, _STATE_SCHEMA, "append", timeout
        )
    )
