"""Encoded-table mutation: physical delete / insert / upsert over a chunk
table WITHOUT re-encoding the corpus.

The reference's only mutation story is a full re-run of encode over edited
input (crates/copybook-cli/src/commands/encode.rs drives whole files); at
100 TB that makes a GDPR delete of a handful of documents — or purging the
losers of a near-dup pass — cost a full corpus rewrite. This module makes
mutations cost O(affected chunks):

- **delete_docs**: the zone map + recovered salt plan (operators/lookup.py)
  prune the key set to its candidate chunks; every other chunk passes
  through VERBATIM (blob bytes untouched — at the storage layer those
  files need not even rewrite). Candidate chunks decode once, drop the
  matched docs with Arrow-vectorized membership + numpy ragged masks, and
  re-encode through the normal codec-selection path. Chunks whose docs are
  all deleted disappear (chunk_seq gaps are legal — the zone map orders by
  seq, it never requires density).

- **insert_docs**: new docs route to their hash-assigned (source, part_id)
  by the SAME salt plan the encode used, then to the one zone-map bracket
  chunk inside the part, preserving the sorted-per-part layout point
  lookups rely on. Parts/sources with no existing chunks take the normal
  encode path. Inserted chunks may exceed the value budget; compact_chunks
  restores canonical cuts.

- **upsert_docs**: delete the incoming doc_ids, then insert — replace-or-
  insert with the two passes above.

Zone-map soundness under mutation (why lookup_docs stays correct): deletes
only raise a chunk's first_doc_id — a surviving doc below the new first
cannot exist in that chunk, so brackets stay a superset; inserts go to the
unique bracket chunk, and lowering the FIRST chunk's first_doc_id keeps
per-part ascension intact. Determinism (invariant 2): whether a chunk is
rewritten and its rewritten bytes are pure functions of (table content,
mutation set) — never of parallelism. Rewritten chunks keep their
chunk_id/part_id/chunk_seq but train FSST tables per chunk (the encode
path's cross-chunk cache is group-order-dependent, which a rewrite cannot
reproduce — same documented stance as operators/extras.py appends), so a
rewrite is decode-equal, not byte-equal, to the chunk's canonical encode;
crc32/enc_bytes change, which is exactly what the resumable-decode
membership fingerprint and the incremental ledger key on.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from collections.abc import Iterator

from pyspark.sql import DataFrame, Window, functions as F

from copybook_rs_spark import blob
from copybook_rs_spark.config import EncodeConfig, decimal_params
from copybook_rs_spark.errors import PipelineContractError
from copybook_rs_spark.operators.decode import _offsets32
from copybook_rs_spark.operators.encode import (
    _CHUNK_PA_SCHEMA,
    _EXTRA_NP_DTYPES,
    _decimal_parts,
    _list_parts,
    _string_parts,
    CHUNK_SCHEMA,
    chunk_row,
    encode_tokens,
)
from copybook_rs_spark.operators.extras import _check_schema_fp
from copybook_rs_spark.operators.lookup import (
    _MAX_COLLECTED,
    _bracketed_meta,
    _normalize_keys,
    candidate_hits,
    recover_salt_plan,
)
from copybook_rs_spark.plans.partition import with_part_id

_OUT_SCHEMA = ", ".join(
    f"{f.name} {f.dataType.simpleString()}" for f in CHUNK_SCHEMA.fields
)


def _passthrough(cols, i) -> dict:
    """Original chunk row, blob bytes untouched."""
    return {f.name: cols[f.name][i].as_py() for f in _CHUNK_PA_SCHEMA}


def _doc_id_array(doc_b: bytes, doc_l: np.ndarray) -> pa.StringArray:
    """Decoded doc-id section -> Arrow string array (no per-doc Python)."""
    offs = _offsets32(doc_l, len(doc_l), "doc_id bytes")
    return pa.StringArray.from_buffers(
        len(doc_l), pa.py_buffer(offs.tobytes()), pa.py_buffer(doc_b)
    )


def _split_candidates(
    chunk_df: DataFrame, cand_ids: DataFrame, max_collected: int
) -> tuple[DataFrame, DataFrame, bool]:
    """-> (candidate chunks, untouched chunks, any_candidates). Small
    candidate sets collect into an In() filter the parquet scan can push
    down (untouched blobs are never read); larger ones stay distributed."""
    ids = [r["chunk_id"] for r in cand_ids.limit(max_collected + 1).collect()]
    if not ids:
        return chunk_df.limit(0), chunk_df, False
    if len(ids) <= max_collected:
        mask = F.col("chunk_id").isin(ids)
        return chunk_df.where(mask), chunk_df.where(~mask), True
    return (
        chunk_df.join(cand_ids, "chunk_id", "left_semi"),
        chunk_df.join(cand_ids, "chunk_id", "left_anti"),
        True,
    )


# ------------------------------------------------------------------ delete


def _ragged_mask(keep: np.ndarray, lens: np.ndarray, flat: np.ndarray):
    """Per-doc keep mask applied to a flat stream segmented by lens."""
    return flat[np.repeat(keep, lens)]


def _make_delete_kernel(cfg: EncodeConfig):
    fp = cfg.fingerprint

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            cols = {c: b.column(c) for c in b.schema.names}
            rows = []
            for i in range(b.num_rows):
                targets = cols["__del_ids"][i]
                if not targets.is_valid:
                    rows.append(_passthrough(cols, i))
                    continue
                cid = cols["chunk_id"][i].as_py()
                _check_schema_fp(
                    "delete_docs", "", cid, cols["schema_fp"][i].as_py(), fp
                )
                buf = memoryview(cols["blob"][i].as_buffer())
                doc_b, doc_l, lens, vals = blob.decode_chunk(buf)
                hit = pc.is_in(
                    _doc_id_array(doc_b, doc_l), value_set=targets.values
                )
                keep = ~np.asarray(hit)
                if keep.all():
                    # bracket superset member with no real hits: blob
                    # bytes must pass through untouched (determinism —
                    # a re-encode would retrain FSST tables per chunk)
                    rows.append(_passthrough(cols, i))
                    continue
                if not keep.any():
                    continue  # every doc deleted: the chunk disappears
                extras = blob.decode_extras(buf, len(doc_l))
                doc_u8 = np.frombuffer(doc_b, dtype=np.uint8)
                new_doc_l = doc_l[keep]
                new_doc_b = _ragged_mask(keep, doc_l, doc_u8).tobytes()
                new_lens = lens[keep]
                new_vals = _ragged_mask(keep, lens, vals).astype(
                    np.int64, copy=False
                )
                new_extras = [
                    (name, etype, el[keep], _ragged_mask(keep, el, ev))
                    for name, (etype, el, ev) in extras.items()
                ]
                nb, info = blob.encode_chunk(
                    new_doc_b, new_doc_l, new_lens, new_vals,
                    codec=cfg.codec, extras=new_extras or None,
                )
                rows.append(
                    chunk_row(
                        cfg,
                        cols["source"][i].as_py(),
                        int(cols["part_id"][i].as_py()),
                        int(cols["chunk_seq"][i].as_py()),
                        new_doc_b, new_doc_l, new_vals, new_extras,
                        nb, info, chunk_id=cid,
                    )
                )
            if rows:
                yield pa.RecordBatch.from_pylist(rows, schema=_CHUNK_PA_SCHEMA)

    return kernel


def delete_docs(
    chunk_df: DataFrame,
    keys,
    cfg: EncodeConfig | None = None,
    salts: dict[str, int] | None = None,
    validate: bool = True,
    max_collected: int = _MAX_COLLECTED,
) -> DataFrame:
    """Remove the named (source, doc_id) docs from an encoded chunk table,
    touching only the chunks that can contain them (module docstring).

    keys: DataFrame with doc_id (+ optional source) or iterable of doc_id
    strings. Keys not present in the table delete nothing (their bracket
    chunks pass through verbatim). Duplicate doc_ids in the DATA are all
    removed (delete-by-key semantics).
    cfg: the EncodeConfig the table decodes with (schema_fp checked per
    rewritten chunk — typed error on mismatch, never silent data loss).
    salts: encode-time salt plan; omitted -> recover_salt_plan (recover
    once and pass in when issuing many mutations against one table)."""
    cfg = cfg or EncodeConfig()
    kdf, _ = _normalize_keys(chunk_df, keys)
    if salts is None:
        salts = recover_salt_plan(chunk_df)
    hits = candidate_hits(chunk_df, kdf, salts=salts, validate=validate)
    per_chunk = hits.groupBy("chunk_id").agg(
        F.collect_set("__k_doc").alias("__del_ids")
    )
    cand_chunks, untouched, any_cand = _split_candidates(
        chunk_df, per_chunk.select("chunk_id"), max_collected
    )
    if not any_cand:
        return chunk_df
    joined = cand_chunks.join(per_chunk, "chunk_id", "left")
    rewritten = joined.mapInArrow(_make_delete_kernel(cfg), _OUT_SCHEMA)
    return untouched.unionByName(rewritten)


# ------------------------------------------------------------------ insert


def _permute_ragged(
    lens_all: np.ndarray, flat_all: np.ndarray, perm: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Reorder ragged segments (lens, flat) by a doc permutation without
    per-doc Python: one repeat + one arange-offset gather."""
    n = len(lens_all)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens_all, out=offs[1:])
    lens_p = lens_all[perm]
    out_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens_p, out=out_offs[1:])
    idx = np.repeat(offs[:-1][perm] - out_offs[:-1], lens_p) + np.arange(
        offs[-1], dtype=np.int64
    )
    return lens_p, flat_all[idx]


def _struct_field_parts(field: pa.Array, etype: str):
    """(lens, flat values) of one extras field from the collected insert
    structs — the struct-side mirror of encode._extra_parts."""
    if etype == "string":
        return _string_parts(field)
    if decimal_params(etype) is not None:
        return _decimal_parts(field)
    return _list_parts(field, _EXTRA_NP_DTYPES[etype])


def _make_insert_kernel(cfg: EncodeConfig):
    fp = cfg.fingerprint
    extra_specs = cfg.extra_specs()

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            cols = {c: b.column(c) for c in b.schema.names}
            rows = []
            for i in range(b.num_rows):
                news = cols["__new"][i]
                if not news.is_valid:
                    rows.append(_passthrough(cols, i))
                    continue
                cid = cols["chunk_id"][i].as_py()
                _check_schema_fp(
                    "insert_docs", "", cid, cols["schema_fp"][i].as_py(), fp
                )
                structs = news.values  # sorted by doc_id (sort_array)
                new_ids = structs.field("doc_id")
                dup = pc.any(
                    pc.equal(new_ids.slice(1), new_ids.slice(0, len(new_ids) - 1))
                ).as_py() if len(new_ids) > 1 else False
                if dup:
                    raise PipelineContractError(
                        "insert_docs: duplicate doc_ids in the insert batch "
                        f"for chunk {cid!r} — canonical order of duplicate "
                        "ids is content-tiebroken by the encode path; "
                        "insert one row per doc_id (or encode duplicates "
                        "as a fresh batch)"
                    )
                buf = memoryview(cols["blob"][i].as_buffer())
                doc_b, doc_l, lens, vals = blob.decode_chunk(buf)
                old_ids = _doc_id_array(doc_b, doc_l)
                clash = pc.any(pc.is_in(new_ids, value_set=old_ids)).as_py()
                if clash:
                    raise PipelineContractError(
                        f"insert_docs: chunk {cid!r} already holds one of "
                        "the inserted doc_ids — use upsert_docs (or "
                        "delete_docs first) to replace documents"
                    )
                extras = blob.decode_extras(buf, len(doc_l))
                ndl, ndb = _string_parts(new_ids)
                ntl, ntv = _list_parts(structs.field("tokens"))
                # merge order: stable argsort over the concatenated ids —
                # all ids distinct (dup + clash guards), so the order is
                # simply doc_id and a pure function of the data
                ids_all = np.concatenate(
                    [
                        old_ids.to_numpy(zero_copy_only=False),
                        new_ids.to_numpy(zero_copy_only=False),
                    ]
                )
                perm = np.argsort(ids_all, kind="stable")
                doc_u8 = np.frombuffer(doc_b, dtype=np.uint8)
                m_doc_l, m_doc_u8 = _permute_ragged(
                    np.concatenate([doc_l, ndl]),
                    np.concatenate([doc_u8, ndb]),
                    perm,
                )
                m_lens, m_vals = _permute_ragged(
                    np.concatenate([lens, ntl]),
                    np.concatenate(
                        [vals.astype(np.int64, copy=False), ntv]
                    ),
                    perm,
                )
                m_extras = []
                for name, etype in extra_specs:
                    etype_d, el, ev = extras[name]
                    nel, nev = _struct_field_parts(
                        structs.field(name), etype
                    )
                    mel, mev = _permute_ragged(
                        np.concatenate([el, nel]),
                        np.concatenate(
                            [ev, nev.astype(ev.dtype, copy=False)]
                        ),
                        perm,
                    )
                    m_extras.append((name, etype_d, mel, mev))
                m_doc_b = m_doc_u8.tobytes()
                nb, info = blob.encode_chunk(
                    m_doc_b, m_doc_l, m_lens, m_vals,
                    codec=cfg.codec, extras=m_extras or None,
                )
                rows.append(
                    chunk_row(
                        cfg,
                        cols["source"][i].as_py(),
                        int(cols["part_id"][i].as_py()),
                        int(cols["chunk_seq"][i].as_py()),
                        m_doc_b, m_doc_l, m_vals, m_extras,
                        nb, info, chunk_id=cid,
                    )
                )
            if rows:
                yield pa.RecordBatch.from_pylist(rows, schema=_CHUNK_PA_SCHEMA)

    return kernel


def insert_docs(
    chunk_df: DataFrame,
    new_df: DataFrame,
    cfg: EncodeConfig | None = None,
    salts: dict[str, int] | None = None,
    validate: bool = True,
    max_collected: int = _MAX_COLLECTED,
) -> DataFrame:
    """Insert NEW documents into an encoded chunk table at their canonical
    position (module docstring). new_df: token-table rows (doc_id, tokens,
    source + every cfg extras column). A doc_id already present in its
    target chunk fails typed — use upsert_docs to replace.

    Routing: docs of sources already in the table go to their hash part
    under `salts` (recovered + certified when omitted; a source present in
    the table but NOT certifiable fails typed rather than guessing), then
    to the one bracket chunk; docs landing in an empty part, and docs of
    brand-new sources, take the normal encode path as fresh chunks."""
    cfg = cfg or EncodeConfig()
    spark = chunk_df.sparkSession
    if salts is None:
        salts = recover_salt_plan(chunk_df)
    table_sources = {
        r["source"]
        for r in chunk_df.select("source").distinct().collect()
    }
    new_sources = {
        r["source"] for r in new_df.select("source").distinct().collect()
    }
    uncertified = (new_sources & table_sources) - set(salts)
    if uncertified:
        raise PipelineContractError(
            "insert_docs: cannot certify the encode-time salt plan for "
            f"source(s) {sorted(uncertified)!r} — pass salts= (the plan "
            "the table was encoded with) or compact_chunks the table first"
        )
    fresh = new_df.where(~F.col("source").isin(list(table_sources)))
    existing = new_df.where(F.col("source").isin(list(table_sources)))
    routed = with_part_id(existing, salts)
    meta = _bracketed_meta(chunk_df, validate)
    # the part's lowest-seq chunk also owns every key below its first doc
    w = Window.partitionBy("source", "part_id")
    meta = meta.withColumn(
        "__lo",
        F.when(
            F.col("chunk_seq") == F.min("chunk_seq").over(w), F.lit("")
        ).otherwise(F.col("first_doc_id")),
    )
    extra_names = [n for n, _ in cfg.extra_specs()]
    payload = F.struct(
        F.col("doc_id"), F.col("tokens"),
        *[F.col(n) for n in extra_names],
    )
    j = routed.join(
        meta,
        on=(
            (routed["source"] == meta["source"])
            & (routed["part_id"] == meta["part_id"])
            & (F.col("__lo") <= routed["doc_id"])
            & (
                F.col("__next_first").isNull()
                | (F.col("__next_first") > routed["doc_id"])
            )
        ),
        how="left",
    ).select(
        routed["source"], routed["part_id"], routed["doc_id"],
        payload.alias("__doc"), meta["chunk_id"],
    )
    unmatched = j.where(F.col("chunk_id").isNull())
    per_chunk = (
        j.where(F.col("chunk_id").isNotNull())
        .groupBy("chunk_id")
        .agg(F.sort_array(F.collect_list("__doc")).alias("__new"))
    )
    cand_chunks, untouched, any_cand = _split_candidates(
        chunk_df, per_chunk.select("chunk_id"), max_collected
    )
    out = untouched
    if any_cand:
        joined = cand_chunks.join(per_chunk, "chunk_id", "left")
        out = out.unionByName(
            joined.mapInArrow(_make_insert_kernel(cfg), _OUT_SCHEMA)
        )
    # empty-part landings re-derive their part_id from the same salts
    # inside encode_tokens, so chunk_seq starts at 0 in a part that has
    # no chunks — no id collisions with existing chunks by construction
    leftover_cols = ["doc_id", "tokens", "source", *extra_names]
    leftovers = unmatched.select(
        F.col("__doc.doc_id").alias("doc_id"),
        F.col("__doc.tokens").alias("tokens"),
        F.col("source"),
        *[F.col(f"__doc.{n}").alias(n) for n in extra_names],
    ).unionByName(fresh.select(*leftover_cols))
    out = out.unionByName(encode_tokens(leftovers, cfg, salts=salts))
    return out


def upsert_docs(
    chunk_df: DataFrame,
    new_df: DataFrame,
    cfg: EncodeConfig | None = None,
    salts: dict[str, int] | None = None,
    validate: bool = True,
) -> DataFrame:
    """Replace-or-insert: delete every incoming doc_id (a no-op for ids
    not present), then insert the new rows. The intermediate table is
    persisted — insert's routing jobs would otherwise re-run the delete
    rewrite once per metadata pass; callers should write (or unpersist)
    the result promptly."""
    cfg = cfg or EncodeConfig()
    if salts is None:
        salts = recover_salt_plan(chunk_df)
    keys = new_df.select("source", "doc_id")
    mid = delete_docs(
        chunk_df, keys, cfg=cfg, salts=salts, validate=validate
    ).persist()
    return insert_docs(mid, new_df, cfg=cfg, salts=salts, validate=validate)
