"""Projection with dependency closure.

The reference's `--select` projection auto-includes fields a selected field
depends on: ODO counter fields, parent groups, level-88 children
(crates/copybook-core/src/projection.rs:48-160, errors CBKS701-703).
Our table's one dependency is the ODO-counter analogue: `tokens` depends on
its counter column `n_tok`. Column pruning itself is Catalyst-native; this
closure rule is the only projection logic we own (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from copybook_rs_spark.errors import EngineError

# column -> columns it depends on (must ride along when selected)
DEPENDENCIES: dict[str, tuple[str, ...]] = {
    "tokens": ("n_tok",),  # ODO: counter_path analogue (schema.rs:211-220)
}


class UnknownColumnError(EngineError):
    code = "CBSP701"  # mirrors CBKS701 unknown-field


def projection_closure(
    columns: list[str], available: list[str] | None = None
) -> list[str]:
    """Selected columns + their dependency closure, in stable order:
    requested order first, then auto-added dependencies."""
    out: list[str] = []
    for c in columns:
        if available is not None and c not in available:
            raise UnknownColumnError(f"unknown column {c!r} in projection")
        if c not in out:
            out.append(c)
    for c in list(out):
        for dep in DEPENDENCIES.get(c, ()):
            if dep not in out:
                out.append(dep)
    return out


def project_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """`df.select` with the dependency closure applied."""
    cols = projection_closure(columns, available=df.columns)
    return df.select(*cols)
