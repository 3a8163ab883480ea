"""k-bit packing of non-negative integers — pure numpy, vectorized.

The generalization of the reference's packed-decimal (COMP-3) nibble logic
(crates/copybook-codec/src/numeric.rs:1833: 2 BCD values per byte = a 4-bit
pack with specialized fast paths). Byte-plane layout for speed: a width-w
value is stored as w//8 full byte planes plus one (w mod 8)-bit plane; the
sub-byte plane packs blocks of 8 values into exactly (w mod 8) bytes via a
single uint64 multiply-accumulate — no per-bit matrices, so memory traffic
is ~n*w/8 bytes (the reference's fast-path-by-width discipline,
numeric.rs:1872-1960, applied to arbitrary widths).

Layout for n values of width w (little-endian):
  plane_0 .. plane_{k-1}: n bytes each, plane_i = (v >> 8*i) & 0xFF, k = w//8
  tail plane (r = w mod 8 > 0): ceil(n/8) blocks of r bytes; block j packs
  values v[8j..8j+8] (zero-padded) as the r-byte LE integer
  sum(v_i << (r*i)).
"""

from __future__ import annotations

import sys

import numpy as np

from copybook_rs_spark.errors import TruncatedBlobError, ValueOverflowError

# byte-lane views of uint64 arrays (plane i == byte i of each value) assume a
# little-endian host; the shift-based fallback keeps big-endian correct
_LE = sys.byteorder == "little"

# sub-byte tail strategy gate (see pack): fused broadcast below, 8-pass
# strided loop above. Module-level so the A/B harness can pin either path;
# output bytes are identical on both sides of the gate.
_SMALL_TAIL_MAX = 8192


def bit_width(max_value: int) -> int:
    """Bits needed to represent max_value (>= 0). 0 for max_value == 0."""
    if max_value < 0:
        raise ValueOverflowError(f"bit_width of negative value {max_value}")
    return int(max_value).bit_length()


def bit_lengths(vals_u: np.ndarray) -> np.ndarray:
    """Exact per-element bit lengths (0..64) of a uint64 array, vectorized.
    Returns an integer array (int32); callers only histogram/compare it.

    Narrow fast path: when max < 2**32 every value is exactly representable
    in float64, so ONE frexp exponent IS the bit length (3 array passes vs
    8 for the split path — the round-5 profile had bit_lengths at 11% of
    chunk encode, nearly all on <2**32 residual streams). Wide path keeps
    the two-level 32-bit-half split for exactness past 2**53."""
    u = np.ascontiguousarray(vals_u, dtype=np.uint64)
    if len(u) == 0:
        return np.zeros(0, dtype=np.int32)
    if int(u.max()) < 1 << 32:
        return np.frexp(u.astype(np.float64))[1]
    hi = (u >> np.uint64(32)).astype(np.float64)
    lo = (u & np.uint64(0xFFFFFFFF)).astype(np.float64)
    bl_hi = np.frexp(hi)[1]
    bl_lo = np.frexp(lo)[1]
    return np.where(hi > 0, bl_hi + 32, bl_lo)


def packed_size(n: int, width: int) -> int:
    if n == 0 or width == 0:
        return 0
    k, r = divmod(width, 8)
    size = n * k
    if r:
        size += ((n + 7) // 8) * r
    return size


def pack(vals: np.ndarray, width: int) -> bytes:
    """Pack non-negative uint64 values (< 2**width) into byte planes."""
    n = len(vals)
    if n == 0 or width == 0:
        return b""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    k, r = divmod(width, 8)
    parts: list[bytes] = []
    if k:
        if _LE:
            vb = v.view(np.uint8).reshape(n, 8)
            parts.extend(np.ascontiguousarray(vb[:, i]).tobytes() for i in range(k))
        else:
            parts.extend(
                ((v >> np.uint64(8 * i)) & np.uint64(0xFF)).astype(np.uint8).tobytes()
                for i in range(k)
            )
    if r:
        if n <= _SMALL_TAIL_MAX:
            # small-stream fast path (round-5.2 profile: pack was 10-15% of
            # chunk encode, dominated by 256-4096-value sub-byte residual /
            # doc-id-field streams): one zero-padded buffer + a broadcast
            # shift + bitwise_or.reduce replaces the 8-pass strided loop —
            # ~2-3x at these sizes, byte-identical. Loses past ~16Ki (the
            # (nb, 8) uint64 temporary blows the cache), hence the gate.
            nb = (n + 7) // 8
            hi_pad = np.zeros(nb * 8, dtype=np.uint64)
            if k:
                np.right_shift(v, np.uint64(8 * k), out=hi_pad[:n])
            else:
                hi_pad[:n] = v
            shifts = np.uint64(r) * np.arange(8, dtype=np.uint64)
            words = np.bitwise_or.reduce(
                hi_pad.reshape(nb, 8) << shifts[None, :], axis=1
            )
        else:
            hi = v >> np.uint64(8 * k)  # < 2**r
            pad = (-n) % 8
            if pad:
                hi = np.concatenate([hi, np.zeros(pad, dtype=np.uint64)])
            words = np.zeros(len(hi) // 8, dtype=np.uint64)  # 8r <= 56 bits
            for i in range(8):
                words |= hi[i::8] << np.uint64(r * i)
        # words is freshly allocated native uint64; on LE that already IS
        # the <u8 layout, so view instead of an astype copy
        wsrc = words if _LE else words.astype("<u8")
        wb = wsrc.view(np.uint8).reshape(-1, 8)[:, :r]
        parts.append(np.ascontiguousarray(wb).tobytes())
    return b"".join(parts)


def _unpack_impl(buf, n: int, width: int, dtype, nbytes: int) -> np.ndarray:
    """Shared byte-plane unpack into `dtype` (uint64 or uint32): full byte
    planes land in the output's own byte lanes (LE fast path) and the
    sub-byte tail plane extracts 8 values per block with one broadcast."""
    if n == 0:
        return np.empty(0, dtype=dtype)
    if width == 0:
        return np.zeros(n, dtype=dtype)
    need = packed_size(n, width)
    if len(buf) < need:
        raise TruncatedBlobError(
            f"bitpack payload truncated: need {need} bytes, have {len(buf)}"
        )
    raw = np.frombuffer(buf, dtype=np.uint8, count=need)
    k, r = divmod(width, 8)
    out = np.zeros(n, dtype=dtype)
    ov = out.view(np.uint8).reshape(n, nbytes) if _LE else None
    for i in range(k):
        if ov is not None:
            ov[:, i] = raw[i * n : (i + 1) * n]
        else:
            out |= raw[i * n : (i + 1) * n].astype(dtype) << dtype(8 * i)
    if r:
        nb = (n + 7) // 8
        tail = raw[k * n : k * n + nb * r].reshape(nb, r)
        words = np.zeros((nb, 8), dtype=np.uint8)
        words[:, :r] = tail
        w64 = words.reshape(-1).view("<u8")
        mask = np.uint64((1 << r) - 1)
        shifts = np.uint64(r) * np.arange(8, dtype=np.uint64)
        # one broadcast extract: (nb, 8) lanes in C order == value order
        hi = (w64[:, None] >> shifts[None, :]) & mask
        if ov is not None:
            # r < 8 so each lane fits one byte: write straight into byte k
            ov[:, k] = hi.astype(np.uint8).reshape(-1)[:n]
        else:
            out |= hi.reshape(-1)[:n].astype(dtype) << dtype(8 * k)
    return out


def unpack(buf: bytes | memoryview, n: int, width: int) -> np.ndarray:
    """Inverse of pack; returns uint64 array of length n."""
    return _unpack_impl(buf, n, width, np.uint64, 8)


def unpack32(buf: bytes | memoryview, n: int, width: int) -> np.ndarray:
    """unpack() for width <= 32, emitting uint32 natively — half the
    memory traffic of the uint64 path plus no downstream astype, which is
    what the decode hot loop pays for on the bandwidth-bound box (values
    are int32 by contract)."""
    if width > 32:
        raise ValueOverflowError(f"unpack32 width {width} > 32")
    return _unpack_impl(buf, n, width, np.uint32, 4)
