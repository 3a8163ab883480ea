"""Frozen engine configuration, compiled once on the driver and shipped to
executors inside the mapInArrow closure — the analogue of the reference's
DecodeOptions/EncodeOptions (crates/copybook-options/src/lib.rs:48-110) and
its ahead-of-time layout resolution (crates/copybook-core/src/layout.rs:73).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field


TOKEN_TABLE_FIELDS = (
    ("doc_id", "string"),
    ("tokens", "array<int>"),
    ("n_tok", "int"),
    ("source", "string"),
)


def schema_fingerprint(fields=TOKEN_TABLE_FIELDS) -> str:
    """SHA-256 over the canonical JSON of the logical schema — provenance tag
    carried in every chunk/manifest row (reference:
    crates/copybook-core/src/schema.rs:248-260)."""
    canon = json.dumps([list(f) for f in fields], separators=(",", ":"))
    return hashlib.sha256(canon.encode()).hexdigest()


@dataclass(frozen=True)
class EncodeConfig:
    """Tunables for the encode pipeline.

    codec: 'auto' (stats-driven selection) or a forced codec name.
    chunk_values: target token values per chunk (the unit of codec choice).
    target_values_per_part: salting pre-pass aims for about this many token
        values in one (source, part_id) group — bounds skew (north rule) AND
        sets task granularity: group count grows with data volume, never with
        cluster size, so chunk content stays parallelism-invariant while a
        bigger cluster just gets more groups to steal. ~32 chunks / a few
        hundred ms of kernel work per group, so per-task overhead stays <5%.
    max_salt: cap on salt buckets per source (a 90%-hot source at 10^12
        values needs ~2M buckets, so the cap is generous).
    """

    codec: str = "auto"
    chunk_values: int = 65536
    target_values_per_part: int = 2_097_152
    max_salt: int = 1 << 21
    shuffle_partitions: int | None = None
    # schema knobs (the reference's type-authority analogue,
    # crates/copybook-arrow/src/schema_convert.rs:87-147): tokens may be
    # int32 (default) or int64, and additional integer array columns ride
    # along in the same chunk (each with its own per-doc lengths). The
    # fingerprint covers the EFFECTIVE schema, so chunk tables written
    # under different schemas can never be silently mixed.
    token_dtype: str = "int32"
    extra_columns: tuple[str, ...] = ()
    fingerprint: str = ""

    def __post_init__(self):
        if self.token_dtype not in ("int32", "int64"):
            raise ValueError(f"token_dtype {self.token_dtype!r}")
        if not self.fingerprint:
            object.__setattr__(self, "fingerprint", schema_fingerprint(self.fields()))

    def fields(self) -> tuple[tuple[str, str], ...]:
        elem = "int" if self.token_dtype == "int32" else "bigint"
        out = [
            ("doc_id", "string"),
            ("tokens", f"array<{elem}>"),
            ("n_tok", "int"),
            ("source", "string"),
        ]
        out.extend((c, "array<bigint>") for c in self.extra_columns)
        return tuple(out)
