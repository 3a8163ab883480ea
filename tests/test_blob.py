"""Chunk-blob framing tests: round-trip, determinism, corruption taxonomy.

Reference analogues: RDW framing (crates/copybook-rdw/src/lib.rs:84-91),
round-trip SHA-256 fidelity (crates/copybook-codec/src/roundtrip.rs:19-120),
corruption detectors (crates/copybook-corruption-detectors/src/lib.rs:17,41).
"""

import hashlib

import numpy as np
import pytest

from copybook_rs_spark import blob
from copybook_rs_spark.errors import (
    BadMagicError,
    BlobFormatError,
    CrcMismatchError,
    EngineError,
    TruncatedBlobError,
)

RNG = np.random.default_rng(42)


def _mk_chunk(n_docs=50, mean_len=30, codec="auto", seed=42):
    rng = np.random.default_rng(seed)
    doc_ids = [f"doc_{i:08d}" for i in range(n_docs)]
    doc_bytes = "".join(doc_ids).encode()
    doc_lens = np.array([len(d) for d in doc_ids], dtype=np.int64)
    lengths = rng.integers(1, 2 * mean_len, n_docs).astype(np.int64)
    values = rng.integers(0, 50257, int(lengths.sum())).astype(np.int64)
    b, info = blob.encode_chunk(doc_bytes, doc_lens, lengths, values, codec=codec)
    return doc_bytes, doc_lens, lengths, values, b, info


def test_blob_roundtrip():
    doc_bytes, doc_lens, lengths, values, b, info = _mk_chunk()
    db, dl, ln, vals = blob.decode_chunk(b)
    assert db == doc_bytes
    np.testing.assert_array_equal(dl, doc_lens)
    np.testing.assert_array_equal(ln, lengths)
    np.testing.assert_array_equal(vals, values)
    assert info["codec"] in ("plain", "bitpack", "for", "delta", "rle", "dict", "fsst")


def test_blob_empty_docs_and_zero_len_tokens():
    doc_ids = ["a", "bb", "ccc"]
    doc_bytes = "".join(doc_ids).encode()
    doc_lens = np.array([1, 2, 3], dtype=np.int64)
    lengths = np.array([0, 5, 0], dtype=np.int64)
    values = np.arange(5, dtype=np.int64)
    b, _ = blob.encode_chunk(doc_bytes, doc_lens, lengths, values)
    db, dl, ln, vals = blob.decode_chunk(b)
    assert db == doc_bytes
    np.testing.assert_array_equal(ln, lengths)
    np.testing.assert_array_equal(vals, values)


def test_blob_deterministic_bytes():
    # Same content -> byte-identical blob (determinism.rs:29-87 analogue).
    a = _mk_chunk(seed=7)[4]
    b = _mk_chunk(seed=7)[4]
    assert hashlib.sha256(a).hexdigest() == hashlib.sha256(b).hexdigest()


def test_blob_bad_magic():
    b = bytearray(_mk_chunk()[4])
    b[0] = ord("X")
    with pytest.raises(BadMagicError):
        blob.decode_chunk(bytes(b))


def test_blob_truncated():
    b = _mk_chunk()[4]
    with pytest.raises(TruncatedBlobError):
        blob.decode_chunk(b[: len(b) // 2])
    with pytest.raises(TruncatedBlobError):
        blob.decode_chunk(b[:10])


def test_blob_bitflip_detected():
    raw = bytearray(_mk_chunk()[4])
    raw[blob.HEADER_LEN + 13] ^= 0x40  # flip a payload bit
    with pytest.raises(CrcMismatchError):
        blob.decode_chunk(bytes(raw))


def test_blob_header_count_tamper_detected():
    raw = bytearray(_mk_chunk()[4])
    raw[6] ^= 0x01  # n_rows field inside header
    with pytest.raises(EngineError):
        blob.decode_chunk(bytes(raw))


def test_error_codes_stable():
    # Every framing error carries a stable CBSP code (ERROR_CODES.md analogue)
    try:
        blob.decode_chunk(b"nope")
    except BlobFormatError as e:
        assert str(e).startswith("CBSP104")
