"""Projection with dependency closure + alias (RENAMES) expansion.

The reference's `--select` projection auto-includes fields a selected field
depends on: ODO counter fields, parent groups, level-88 children — and
expands level-66 RENAMES aliases to the fields they cover
(crates/copybook-core/src/projection.rs:48-160, errors CBKS701-703).
Our table's built-in dependency is the ODO-counter analogue: `tokens`
depends on its counter column `n_tok`; schema-driven configs contribute
their extra array columns, and user-declared aliases expand to column sets
before the closure runs. Column pruning itself is Catalyst-native; this
closure logic is the only projection logic we own (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from copybook_rs_spark.errors import EngineError

# column -> columns it depends on (must ride along when selected)
DEPENDENCIES: dict[str, tuple[str, ...]] = {
    "tokens": ("n_tok",),  # ODO: counter_path analogue (schema.rs:211-220)
}

# built-in aliases (level-66 RENAMES analogue): name -> columns it covers.
# `content` = every value-bearing column; `identity` = the key columns.
ALIASES: dict[str, tuple[str, ...]] = {
    "content": ("tokens",),
    "identity": ("doc_id", "source"),
}


class UnknownColumnError(EngineError):
    code = "CBSP701"  # mirrors CBKS701 unknown-field


def projection_closure(
    columns: list[str],
    available: list[str] | None = None,
    aliases: dict[str, tuple[str, ...]] | None = None,
    cfg=None,
) -> list[str]:
    """Selected columns + alias expansion + dependency closure, in stable
    order: requested order first, then auto-added dependencies.

    aliases: extra user aliases layered over the built-ins (RENAMES,
    projection.rs:101: an alias is replaced by the fields it covers before
    dependency resolution). cfg: an EncodeConfig whose extra_columns join
    the `content` alias, so `--select content` follows the schema."""
    amap = dict(ALIASES)
    if cfg is not None and getattr(cfg, "extra_columns", ()):
        amap["content"] = amap["content"] + tuple(cfg.extra_columns)
    if aliases:
        amap.update(aliases)
    out: list[str] = []
    for c in columns:
        expanded = amap.get(c, (c,))
        for e in expanded:
            if available is not None and e not in available:
                raise UnknownColumnError(
                    f"unknown column {e!r} in projection"
                    + (f" (expanded from alias {c!r})" if e != c else "")
                )
            if e not in out:
                out.append(e)
    for c in list(out):
        for dep in DEPENDENCIES.get(c, ()):
            if dep not in out:
                out.append(dep)
    return out


def project_columns(
    df: DataFrame,
    columns: list[str],
    aliases: dict[str, tuple[str, ...]] | None = None,
    cfg=None,
) -> DataFrame:
    """`df.select` with alias expansion and the dependency closure applied."""
    cols = projection_closure(columns, available=df.columns, aliases=aliases, cfg=cfg)
    return df.select(*cols)
