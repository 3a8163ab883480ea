"""Self-describing chunk-blob format — the analogue of the reference's RDW
length-prefixed record framing (crates/copybook-rdw/src/lib.rs:84-91) plus its
golden SHA-256 fidelity discipline (crates/copybook-codec/src/roundtrip.rs:89).

Layout (little-endian):

  header (34 bytes):
    magic   : 4s  = b"CBS1"
    version : u8  = 1
    vcodec  : u8  codec id of the values section (informational; sections
                  are themselves self-describing payloads)
    n_rows  : u32 documents in this chunk
    n_values: u64 total token values
    crc32   : u32 over the concatenated sections
    sec_doc : u32 byte length of the doc_id section
    sec_len : u32 byte length of the lengths section
    sec_val : u32 byte length of the values section
  doc_id section:
    dl_len  : u32 byte length of the doc-id-lengths payload
    payload (doc_id byte lengths, int payload grammar)
    enc     : u8  0 = raw, 1 = FSST (whichever is smaller; ids share heavy
                  structure, FSST typically halves them)
    raw concatenated UTF-8 doc_id bytes            (enc == 0)
    | codes_len:u32 fsst-table fsst-codes          (enc == 1)
  lengths section: int payload (n_tok per document)
  values section : int payload (all token values, document-major)

Everything in the blob is a pure function of (doc_ids, tokens) content — no
timestamps, no task ids — so encode is deterministic across runs and
parallelism levels (reference: crates/copybook-codec/src/determinism.rs:29-87).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from copybook_rs_spark.codecs import core
from copybook_rs_spark.codecs import fsst as fsst_mod
from copybook_rs_spark.errors import (
    BadMagicError,
    BadVersionError,
    CountMismatchError,
    CrcMismatchError,
    HeaderInvalidError,
    TruncatedBlobError,
)

MAGIC = b"CBS1"
VERSION = 1
_HEADER = struct.Struct("<4sBBIQIIII")
HEADER_LEN = _HEADER.size
_U32 = struct.Struct("<I")


def _encode_doc_bytes(doc_bytes: bytes) -> bytes:
    """Multi-pass-FSST-or-raw doc-id byte stream, smaller wins.

    Encoded form: 0x01 passes:u8 len_0..len_passes:u32 tables codes."""
    if len(doc_bytes) >= 64:
        data = np.frombuffer(doc_bytes, dtype=np.uint8)
        tables, streams = fsst_mod.compress_multi(data)
        if tables:
            parts = [b"\x01", bytes([len(tables)])]
            parts.extend(_U32.pack(len(s)) for s in streams)
            parts.extend(t.serialize() for t in tables)
            parts.append(streams[-1].tobytes())
            enc = b"".join(parts)
            if len(enc) < 1 + len(doc_bytes):
                return enc
    return b"\x00" + doc_bytes


def _decode_doc_bytes(buf: memoryview, out_len: int) -> bytes:
    if len(buf) < 1:
        raise HeaderInvalidError("doc-bytes encoding flag missing")
    enc = buf[0]
    body = buf[1:]
    if enc == 0:
        return bytes(body)
    if enc != 1:
        raise HeaderInvalidError(f"unknown doc-bytes encoding {enc}")
    if len(body) < 1:
        raise TruncatedBlobError("fsst doc-bytes header truncated")
    passes = body[0]
    if passes == 0 or passes > 8:
        raise HeaderInvalidError(f"fsst doc-bytes passes {passes}")
    off = 1
    if len(body) < off + 4 * (passes + 1):
        raise TruncatedBlobError("fsst doc-bytes lengths truncated")
    lens = [_U32.unpack_from(body, off + 4 * i)[0] for i in range(passes + 1)]
    off += 4 * (passes + 1)
    if lens[0] != out_len:
        raise CountMismatchError("fsst doc-bytes length mismatch")
    tables = []
    for _ in range(passes):
        table, used = fsst_mod.SymbolTable.deserialize(body[off:])
        tables.append(table)
        off += used
    if len(body) < off + lens[-1]:
        raise TruncatedBlobError("fsst doc-bytes codes truncated")
    final = np.frombuffer(body, dtype=np.uint8, count=lens[-1], offset=off)
    return fsst_mod.decompress_multi(final, tables, lens).tobytes()


def encode_chunk(
    doc_bytes: bytes,
    doc_lens: np.ndarray,
    lengths: np.ndarray,
    values: np.ndarray,
    codec: str = "auto",
) -> tuple[bytes, dict]:
    """Build a chunk blob. Returns (blob, info) where info carries the chosen
    values-codec name and the chunk statistics used for selection."""
    n_rows = len(doc_lens)
    if len(lengths) != n_rows:
        raise CountMismatchError("doc_lens and lengths disagree")
    n_values = int(lengths.sum()) if n_rows else 0
    if n_values != len(values):
        raise CountMismatchError(
            f"sum(lengths)={n_values} but {len(values)} values given"
        )
    stats = core.ChunkStats.analyze(values)
    val_payload, vcodec = core.encode_array(values, codec=codec, stats=stats)
    len_payload, _ = core.encode_array(lengths, codec="auto")
    dl_payload, _ = core.encode_array(doc_lens, codec="auto")
    doc_enc = _encode_doc_bytes(doc_bytes)
    doc_sec = _U32.pack(len(dl_payload)) + dl_payload + doc_enc
    body = doc_sec + len_payload + val_payload
    crc = zlib.crc32(body) & 0xFFFFFFFF
    header = _HEADER.pack(
        MAGIC,
        VERSION,
        core.CODEC_IDS[vcodec],
        n_rows,
        n_values,
        crc,
        len(doc_sec),
        len(len_payload),
        len(val_payload),
    )
    info = {"codec": vcodec, "stats": stats, "crc32": crc}
    return header + body, info


def decode_chunk(blob: bytes | memoryview) -> tuple[bytes, np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of encode_chunk -> (doc_bytes, doc_lens, lengths, values).

    Raises structured CBSP1xx errors on any corruption; never returns wrong
    data (reference corruption-detector stance,
    crates/copybook-corruption-detectors/src/lib.rs:17)."""
    buf = memoryview(blob)
    if len(buf) < HEADER_LEN:
        raise TruncatedBlobError(f"blob shorter than header: {len(buf)}")
    magic, version, _vcodec, n_rows, n_values, crc, sd, sl, sv = _HEADER.unpack_from(
        buf
    )
    if magic != MAGIC:
        raise BadMagicError(f"bad magic {magic!r}")
    if version != VERSION:
        raise BadVersionError(f"unsupported version {version}")
    end = HEADER_LEN + sd + sl + sv
    if len(buf) < end:
        raise TruncatedBlobError(f"blob truncated: need {end}, have {len(buf)}")
    body = buf[HEADER_LEN:end]
    if (zlib.crc32(body) & 0xFFFFFFFF) != crc:
        raise CrcMismatchError("chunk body crc32 mismatch")
    doc_sec = body[:sd]
    if len(doc_sec) < 4:
        raise HeaderInvalidError("doc section too short")
    (dl_len,) = _U32.unpack_from(doc_sec)
    if 4 + dl_len > sd:
        raise HeaderInvalidError("doc-length payload overruns section")
    doc_lens = core.decode_array(doc_sec[4 : 4 + dl_len])
    if len(doc_lens) != n_rows:
        raise CountMismatchError("doc_lens count != n_rows")
    expected_doc_len = int(doc_lens.sum()) if n_rows else 0
    doc_bytes = _decode_doc_bytes(doc_sec[4 + dl_len :], expected_doc_len)
    if len(doc_bytes) != expected_doc_len:
        raise CountMismatchError("doc_id bytes length mismatch")
    lengths = core.decode_array(body[sd : sd + sl])
    if len(lengths) != n_rows:
        raise CountMismatchError("lengths count != n_rows")
    values = core.decode_array(body[sd + sl : sd + sl + sv])
    if len(values) != n_values:
        raise CountMismatchError("values count != n_values")
    if n_rows and int(lengths.sum()) != n_values:
        raise CountMismatchError("sum(lengths) != n_values")
    return doc_bytes, doc_lens, lengths, values
