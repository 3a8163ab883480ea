"""k-bit packing of non-negative integers — pure numpy, vectorized.

The generalization of the reference's packed-decimal (COMP-3) nibble logic
(crates/copybook-codec/src/numeric.rs:1833: 2 BCD values per byte = a 4-bit
pack with specialized fast paths). Here: any width 0..64, with byte-aligned
fast paths for 8/16/32/64.
"""

from __future__ import annotations

import numpy as np

from copybook_rs_spark.errors import TruncatedBlobError, ValueOverflowError


def bit_width(max_value: int) -> int:
    """Bits needed to represent max_value (>= 0). 0 for max_value == 0."""
    if max_value < 0:
        raise ValueOverflowError(f"bit_width of negative value {max_value}")
    return int(max_value).bit_length()


def pack(vals: np.ndarray, width: int) -> bytes:
    """Pack non-negative uint64 values into `width`-bit little-endian lanes."""
    n = len(vals)
    if n == 0 or width == 0:
        return b""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    if width == 8:
        return v.astype("<u1").tobytes()
    if width == 16:
        return v.astype("<u2").tobytes()
    if width == 32:
        return v.astype("<u4").tobytes()
    if width == 64:
        return v.astype("<u8").tobytes()
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def packed_size(n: int, width: int) -> int:
    return (n * width + 7) // 8


def unpack(buf: bytes | memoryview, n: int, width: int) -> np.ndarray:
    """Inverse of pack; returns uint64 array of length n."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    need = packed_size(n, width)
    if len(buf) < need:
        raise TruncatedBlobError(
            f"bitpack payload truncated: need {need} bytes, have {len(buf)}"
        )
    if width in (8, 16, 32, 64):
        return np.frombuffer(buf, dtype=f"<u{width // 8}", count=n).astype(np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8, count=need)
    bits = np.unpackbits(raw, count=n * width, bitorder="little")
    weights = np.uint64(1) << np.arange(width, dtype=np.uint64)
    return (bits.reshape(n, width).astype(np.uint64) * weights).sum(
        axis=1, dtype=np.uint64
    )
