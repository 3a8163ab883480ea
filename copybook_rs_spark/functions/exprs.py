"""Shared SQL expressions with exact Spark/DuckDB twins.

Each pair must stay value-identical — the driver hash-compares query output
against the DuckDB oracle (CORRECTNESS gate). Run counting is done with
1-indexed element access (identical semantics in both dialects) instead of a
window, so it also serves as the RLE-stats oracle (SURVEY.md §2.5).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# runs per doc = 1 + #(i in [2..n] : t[i] != t[i-1]); Spark element_at and
# DuckDB list indexing are both 1-based. NB Spark's sequence(2, 1) counts
# DOWN ([2,1]) instead of returning empty, so single-token docs need a guard.
RUNS_PER_DOC_SPARK = (
    "CASE WHEN n_tok < 2 THEN 1 ELSE "
    "1 + size(filter(sequence(2, n_tok), "
    "i -> element_at(tokens, i) != element_at(tokens, i - 1))) END"
)
RUNS_PER_DOC_DUCKDB = (
    "CASE WHEN n_tok < 2 THEN 1 ELSE "
    "1 + length(list_filter(range(2, n_tok + 1), "
    "i -> tokens[i] != tokens[i - 1])) END"
)


def condition(col: str, values: list | None = None, between: tuple | None = None) -> Column:
    """Level-88 condition analogue: a named value-set predicate
    (reference crates/copybook-core/src/parser.rs:1380, VALUE / VALUE THRU).
    """
    c = F.col(col)
    preds = []
    if values:
        preds.append(c.isin(values))
    if between:
        preds.append(c.between(*between))
    if not preds:
        raise ValueError("condition needs values or between")
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out
