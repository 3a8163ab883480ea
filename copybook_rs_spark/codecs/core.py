"""Self-describing integer-array payloads: plain / bitpack / FOR / delta /
RLE / dict / FSST, with cascades and honest try-encode auto-selection.

Payload grammar (all little-endian, `codec_id:u8` first — the analogue of the
reference's FieldKind dispatch in decode_record, crates/copybook-codec/src/
lib_api.rs:401, and of its detect-then-choose encoding policy,
crates/copybook-codec/src/numeric.rs:308-396):

  payload  := codec_id:u8 body
  plain    := n:u32 width:u8(4|8) raw[n*width]
  bitpack  := n:u32 width:u8 packed[ceil(n*width/8)]        (values >= 0)
  for      := n:u32 ref:i64 sub:payload(values - ref)       (modular uint64)
  delta    := n:u32 sub:payload(zigzag(modular diffs, first-from-0))
  rle      := n:u32 n_runs:u32 len1:u32 sub1:payload(run values)
                                len2:u32 sub2:payload(run lengths)
  dict     := n:u32 d:u32 len1:u32 sub1:payload(sorted unique values)
                           len2:u32 sub2:payload(indices)
  patch    := n:u32 mode:i64 n_exc:u32 len1:u32 sub1:payload(exception
              position gaps: pos[0], pos[i]-pos[i-1]) len2:u32
              sub2:payload(exception values) — PFOR-style "patched"
              coding for streams dominated by one value (e.g. the zigzag
              delta stream of fixed-stride token sequences, where one
              delta carries >90% of the mass but is interleaved with
              jumps, so RLE cannot see it)
  pfor     := n:u32 ref:i64 w:u8 n_exc:u32 packed[packed_size(n,w)]
              len1:u32 sub1:payload(exception position gaps)
              len2:u32 sub2:payload(exception high residuals >> w) —
              true PFOR (Zukowski et al. 2006): bit width chosen for the
              BULK of (v - ref), rare wide values patched, so a few
              spikes no longer blow up the pack width of everything
  fsst     := n:u32 nbytes:u32 table len:u32 codes[len]
              (values -> zigzag -> varint byte stream -> fsst codes)

Cascades come from sub-payloads choosing their own codec (depth-limited so
encoding terminates): delta->RLE crushes arithmetic sequences, dict values
(sorted) take delta->bitpack, RLE run lengths take FOR->bitpack, etc.

Auto-selection *encodes* every depth-appropriate candidate and keeps the
smallest (the reference's try-encode-and-measure stance); FSST is gated by a
sampled estimate because training is the one expensive candidate. Selection
is deterministic: fixed candidate order, strict-improvement replacement.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from copybook_rs_spark.codecs import bitpack as bp
from copybook_rs_spark.codecs import fsst as fsst_mod
from copybook_rs_spark.codecs import varint as vi
from copybook_rs_spark.errors import (
    CountMismatchError,
    PayloadCorruptError,
    TruncatedBlobError,
    UnknownCodecError,
    ValueOverflowError,
)

CODEC_PLAIN = 0
CODEC_BITPACK = 1
CODEC_FOR = 2
CODEC_RLE = 3
CODEC_DICT = 4
CODEC_FSST = 5
CODEC_DELTA = 6
CODEC_PATCH = 7
CODEC_PFOR = 8
CODEC_DOCDELTA = 9  # blob-level values-section mode 1 (blob.py); reported
# in the chunk header/manifest, never a payload codec id

CODEC_NAMES = {
    CODEC_PLAIN: "plain",
    CODEC_BITPACK: "bitpack",
    CODEC_FOR: "for",
    CODEC_RLE: "rle",
    CODEC_DICT: "dict",
    CODEC_FSST: "fsst",
    CODEC_DELTA: "delta",
    CODEC_PATCH: "patch",
    CODEC_PFOR: "pfor",
    CODEC_DOCDELTA: "docdelta",
}
CODEC_IDS = {v: k for k, v in CODEC_NAMES.items()}

# candidate order = deterministic tie-break (earlier wins on equal size)
_DEPTH_CANDIDATES = {
    0: ("bitpack", "for", "delta", "rle", "dict", "patch", "pfor", "plain"),
    1: ("bitpack", "for", "delta", "rle", "patch", "pfor", "plain"),
    # no delta at depth 2: third differences never paid in measurement and
    # the nested 64Ki-stream cascade cost ~10 ms/chunk (delta-of-delta is
    # still reachable via depth 0 -> 1)
    2: ("bitpack", "for", "patch", "pfor", "plain"),
    3: ("bitpack", "for", "plain"),
}
_MAX_DEPTH = 3

_U32 = struct.Struct("<I")
_HDR_PLAIN = struct.Struct("<IB")
_HDR_FOR = struct.Struct("<Iq")
_HDR_RLE = struct.Struct("<II")

_FSST_SAMPLE = 2048
_FSST_MIN_N = 64


@dataclass
class ChunkStats:
    """One-pass statistics over an int64 array; drives codec choice and the
    chunk-table metrics columns (the RunSummary + ZonedEncodingInfo analogue,
    crates/copybook-codec/src/lib_api.rs:232, numeric.rs:308)."""

    n: int
    vmin: int
    vmax: int
    n_distinct: int
    n_runs: int
    is_sorted: bool
    max_run_len: int
    max_zz_delta: int
    n_delta_runs: int = 0  # runs in the (modular) diff stream
    zz_delta_p99: int = 0  # 99th-percentile zigzag delta (0 = unknown,
    # -1 = deferred: analyze found the delta-gate precondition holds but
    # left the partition pass to zz_p99_value(), which most callers never
    # reach — round-5 profile: ~3/4 of the p99 partitions were unconsumed)
    mode_count: int = 0  # frequency of the most common value (0 = unknown)
    mode_value: int = 0  # the most common value (valid iff mode_count > 0;
    # ties broken toward the SMALLEST value on every stats path)
    _uniq: np.ndarray | None = field(default=None, repr=False)
    _run_break_idx: np.ndarray | None = field(default=None, repr=False)
    # full zigzag delta stream zigzag([v0, diffs...]) cached by analyze so
    # _encode_delta skips recomputing it (same reuse contract as
    # _run_break_idx: only ever attached to stats analyzed from the same
    # array the encoder receives)
    _zz_full: np.ndarray | None = field(default=None, repr=False)

    def zz_p99_value(self) -> int:
        """Resolve the (possibly deferred) robust delta width. The max(1,
        ...) keeps the outlier exclusion meaningful at small n, where a
        plain p99 degenerates to the max and re-includes the outlier.
        Identical to the value analyze used to compute eagerly; caches
        into zz_delta_p99 so repeat reads are free."""
        if self.zz_delta_p99 == -1 and self._zz_full is not None:
            zz_rest = self._zz_full[1:]
            k = len(zz_rest) - 1 - max(1, len(zz_rest) // 100)
            self.zz_delta_p99 = (
                int(np.partition(zz_rest, k)[k]) if k >= 0 else 0
            )
        return max(self.zz_delta_p99, 0)

    @classmethod
    def analyze(
        cls, vals: np.ndarray, deep: bool = True, with_uniq: bool = True
    ) -> "ChunkStats":
        """deep=False skips np.unique (the costly pass) — used for nested
        payloads where dict isn't a candidate; n_distinct is then an upper
        bound (n), not exact. with_uniq=False skips materializing the
        sorted uniques on the bincount path (dict is a depth-0-only
        candidate, so nested analyses never need them)."""
        n = len(vals)
        if n == 0:
            return cls(0, 0, 0, 0, 0, True, 0, 0)
        v = np.ascontiguousarray(vals, dtype=np.int64)
        if n == 1:
            # scalar fast path: every stat is trivially determined, and the
            # general path below would still pay ~20 numpy calls plus an
            # np.unique on ONE element (round-5.2 profile: 54 us/call,
            # ~9% of analyze time on the driver profile). Field-for-field
            # identical to what the general path returns for n == 1.
            x = int(v[0])
            zz_full = np.empty(1, dtype=np.uint64)
            zz_full[0] = ((x << 1) ^ (x >> 63)) & 0xFFFFFFFFFFFFFFFF
            return cls(
                n=1, vmin=x, vmax=x, n_distinct=1, n_runs=1,
                is_sorted=True, max_run_len=1, max_zz_delta=int(zz_full[0]),
                zz_delta_p99=int(zz_full[0]), n_delta_runs=1,
                mode_count=1 if deep else 0, mode_value=x if deep else 0,
                # .copy(): the general path's np.unique always returns a
                # fresh array; aliasing the caller's buffer here would let
                # a later in-place edit drift the dict encoder's uniques
                _uniq=v.copy() if (deep and with_uniq) else None,
                _run_break_idx=np.empty(0, dtype=np.int64),
                _zz_full=zz_full,
            )
        vmin = int(v.min())
        vmax = int(v.max())
        # modular (uint64) diffs: wrap-free even at int64 extremes
        vu = v.view(np.uint64)
        diffs_u = vu[1:] - vu[:-1]
        breaks = np.flatnonzero(diffs_u != 0)
        nb = len(breaks)
        n_runs = nb + 1
        if nb == 0:
            max_run = n  # one run
        elif nb == n - 1:
            max_run = 1  # run-free (every adjacent pair differs) — the
            # common shape for nested residual streams; skips the
            # concatenate/diff/max triple-pass below
        else:
            run_bounds = np.concatenate(([-1], breaks, [n - 1]))
            max_run = int(np.diff(run_bounds).max())
        is_sorted = bool((v[1:] >= v[:-1]).all()) if n > 1 else True
        # lower bound on runs in the zigzag-delta stream (zigzag injective,
        # so runs(diffs) lower-bounds runs of the full [v0]+diffs stream)
        n_delta_runs = (
            int((diffs_u[1:] != diffs_u[:-1]).sum()) + 1 if n > 2 else min(n, 1)
        )
        mode_val = 0
        n_dist = n
        if deep and n > 64 and 0 <= vmax - vmin <= max(4 * n, 1 << 16):
            # narrow-range fast path: exact distinct count + mode via
            # bincount — O(n + range), no sort. Tie-break identical to the
            # unique path (argmax returns the FIRST max = smallest value),
            # so every selection decision and payload byte is unchanged.
            # The sorted uniques + counts fall out of the histogram for
            # free (vmin + nonzero bins, in value order == np.unique), so
            # the dict candidate never pays np.unique's O(n log n) argsort
            # on these streams (round-5 profile: 27 ms/chunk, 13%).
            counts = np.bincount(v - vmin)
            mode_idx = int(np.argmax(counts))
            if with_uniq:
                nz = np.flatnonzero(counts)
                uniq = nz + vmin
                n_dist = len(nz)
            else:
                uniq = None
                n_dist = int(np.count_nonzero(counts))
            mode_cnt = int(counts[mode_idx])
            mode_val = vmin + mode_idx
        elif deep:
            uniq, ucounts = np.unique(v, return_counts=True)
            n_dist = len(uniq)
            mode_idx = int(np.argmax(ucounts))
            mode_cnt = int(ucounts[mode_idx])
            mode_val = int(uniq[mode_idx])
            if not with_uniq:
                uniq = None
        else:
            uniq = None
            mode_cnt = 0
        zz_full = np.empty(n, dtype=np.uint64)
        # scalar zigzag for the first element (python-int two's-complement
        # arithmetic + 64-bit mask == the vector op; saves a 1-element
        # array round-trip per analyze — 72 analyses/chunk)
        x = int(v[0])
        zz_full[0] = ((x << 1) ^ (x >> 63)) & 0xFFFFFFFFFFFFFFFF
        if n > 1:
            vi.zigzag_encode(diffs_u.view(np.int64), out=zz_full[1:])
        max_zz = int(zz_full.max())
        # robust delta width: largest zigzag delta EXCLUDING the top
        # max(1, 1%) outliers (exact kth via partition) — distinguishes
        # "uniformly wide deltas" (delta can't win) from "small deltas +
        # a few outlier jumps" (delta+pfor territory). Relevant only when
        # the delta gate's run-density precondition holds (0 disables the
        # gate, which would not have fired anyway) — and even then the
        # O(n) partition is DEFERRED to zz_p99_value(): the gate consults
        # it only when delta is still a live candidate with a best-so-far.
        if n > 2 and n_delta_runs > max(n // 2, 4):
            zz_p99 = -1  # deferred
        elif n > 2:
            zz_p99 = 0
        else:
            zz_p99 = max_zz
        return cls(
            n=n,
            vmin=vmin,
            vmax=vmax,
            n_distinct=n_dist,
            n_runs=n_runs,
            is_sorted=is_sorted,
            max_run_len=max_run,
            max_zz_delta=max_zz,
            zz_delta_p99=zz_p99,
            n_delta_runs=n_delta_runs,
            mode_count=mode_cnt,
            mode_value=mode_val,
            _uniq=uniq,
            _run_break_idx=breaks,
            _zz_full=zz_full,
        )


# ----------------------------------------------------------------- encoders

def _encode_plain(vals: np.ndarray) -> bytes:
    v = np.ascontiguousarray(vals, dtype=np.int64)
    n = len(v)
    if n and (v.min() < -(2**31) or v.max() >= 2**31):
        return bytes([CODEC_PLAIN]) + _HDR_PLAIN.pack(n, 8) + v.astype("<i8").tobytes()
    return bytes([CODEC_PLAIN]) + _HDR_PLAIN.pack(n, 4) + v.astype("<i4").tobytes()


def _encode_bitpack(vals: np.ndarray, width: int | None = None) -> bytes:
    v = np.ascontiguousarray(vals, dtype=np.int64)
    n = len(v)
    if n == 0:
        return bytes([CODEC_BITPACK]) + _HDR_PLAIN.pack(0, 0)
    mn, mx = int(v.min()), int(v.max())
    if mn < 0:
        raise ValueOverflowError("bitpack requires non-negative values")
    w = width if width is not None else bp.bit_width(mx)
    return (
        bytes([CODEC_BITPACK])
        + _HDR_PLAIN.pack(n, w)
        + bp.pack(v.astype(np.uint64), w)
    )


def _encode_sub_u64(vals_u: np.ndarray, max_val: int) -> bytes:
    """Terminal sub-payload for logically-unsigned uint64 values:
    the smaller of bitpack / plain (stored as the int64 bit view)."""
    u = np.ascontiguousarray(vals_u, dtype=np.uint64)
    n = len(u)
    if n:
        w = bp.bit_width(max_val)
        plain_w = 4 if max_val < 2**31 else 8
        if bp.packed_size(n, w) <= plain_w * n:
            return bytes([CODEC_BITPACK]) + _HDR_PLAIN.pack(n, w) + bp.pack(u, w)
    return _encode_plain(u.view(np.int64))


def _encode_for(vals: np.ndarray, depth: int) -> bytes:
    v = np.ascontiguousarray(vals, dtype=np.int64)
    n = len(v)
    ref = int(v.min()) if n else 0
    shifted_u = (
        v.view(np.uint64) - np.uint64(ref % (1 << 64)) if n else v.view(np.uint64)
    )
    mx = (int(v.max()) - ref) if n else 0
    return bytes([CODEC_FOR]) + _HDR_FOR.pack(n, ref) + _encode_sub_u64(shifted_u, mx)


def _encode_delta(
    vals: np.ndarray, depth: int, stats: ChunkStats | None = None
) -> bytes:
    v = np.ascontiguousarray(vals, dtype=np.int64)
    n = len(v)
    if stats is not None and stats._zz_full is not None and stats.n == n:
        # analyze already built zigzag([v0, diffs...]) for the delta-width
        # stats; identical by construction to the stream below
        zz = stats._zz_full
    else:
        vu = v.view(np.uint64)
        deltas_u = np.empty(n, dtype=np.uint64)
        if n:
            deltas_u[0] = vu[0]
            np.subtract(vu[1:], vu[:-1], out=deltas_u[1:])  # modular
        zz = vi.zigzag_encode(deltas_u.view(np.int64))
    sub, _ = encode_array(zz.view(np.int64), codec="auto", depth=depth + 1)
    return bytes([CODEC_DELTA]) + _U32.pack(n) + sub


def _run_split(vals: np.ndarray, breaks: np.ndarray | None = None):
    v = np.ascontiguousarray(vals, dtype=np.int64)
    n = len(v)
    if n == 0:
        return v, np.empty(0, dtype=np.int64)
    if breaks is None:
        vu = v.view(np.uint64)
        breaks = np.flatnonzero((vu[1:] - vu[:-1]) != 0)
    starts = np.concatenate(([0], breaks + 1))
    ends = np.concatenate((breaks + 1, [n]))
    return v[starts], ends - starts


def _encode_rle(vals: np.ndarray, depth: int, stats: ChunkStats | None = None) -> bytes:
    breaks = stats._run_break_idx if stats is not None else None
    run_vals, run_lens = _run_split(vals, breaks)
    sub_v, _ = encode_array(run_vals, codec="auto", depth=depth + 1)
    sub_l, _ = encode_array(run_lens, codec="auto", depth=depth + 1)
    return (
        bytes([CODEC_RLE])
        + _HDR_RLE.pack(len(vals), len(run_vals))
        + _U32.pack(len(sub_v))
        + sub_v
        + _U32.pack(len(sub_l))
        + sub_l
    )


def _encode_dict(vals: np.ndarray, depth: int, stats: ChunkStats | None = None) -> bytes:
    v = np.ascontiguousarray(vals, dtype=np.int64)
    uniq = stats._uniq if stats is not None and stats._uniq is not None else None
    if uniq is None:
        uniq, idx = np.unique(v, return_inverse=True)
    else:
        idx = np.searchsorted(uniq, v)
    d = len(uniq)
    sub_u, _ = encode_array(uniq, codec="auto", depth=depth + 1)
    # indices go straight to the terminal tier: when index order has
    # run/locality structure, rle/patch/delta on the ORIGINAL stream are
    # already candidates — a full cascade here re-finds the same structure
    # at ~10x the try cost (measured: no size change on real chunks)
    sub_i, _ = encode_array(idx.astype(np.int64), codec="auto", depth=_MAX_DEPTH)
    return (
        bytes([CODEC_DICT])
        + _HDR_RLE.pack(len(v), d)
        + _U32.pack(len(sub_u))
        + sub_u
        + _U32.pack(len(sub_i))
        + sub_i
    )


_HDR_PATCH = struct.Struct("<IqI")


def _exc_gaps(exc_idx: np.ndarray) -> np.ndarray:
    """Exception positions -> gap stream (gaps[0] = first position)."""
    return (
        np.diff(exc_idx, prepend=0)
        if len(exc_idx)
        else np.empty(0, np.int64)
    )


def _exc_positions(gaps: np.ndarray, n: int, what: str) -> np.ndarray:
    """Inverse of _exc_gaps with full corruption validation: positions must
    be strictly increasing and in [0, n). int64 cumsum overflow from
    adversarial gaps surfaces as a negative prefix sum (the first prefix
    past 2^63 goes negative), so `(pos < 0).any()` makes the bound check
    rigorous — corrupt payloads raise typed errors, never IndexError."""
    if gaps[0] < 0 or (len(gaps) > 1 and (gaps[1:] < 1).any()):
        raise PayloadCorruptError(f"{what}: non-increasing positions")
    pos = np.cumsum(gaps)
    if (pos < 0).any() or pos[-1] >= n:
        raise PayloadCorruptError(f"{what}: position out of range")
    return pos


def _encode_patch(vals: np.ndarray, depth: int, stats: ChunkStats | None = None) -> bytes:
    v = np.ascontiguousarray(vals, dtype=np.int64)
    n = len(v)
    if n == 0:
        mode = 0
        exc_idx = np.empty(0, dtype=np.int64)
    else:
        if stats is not None and stats.mode_count > 0:
            mode = int(stats.mode_value)  # every stats path ties toward the
            # smallest value, matching the unique+argmax derivation below
        else:
            uniq, counts = np.unique(v, return_counts=True)
            mode = int(uniq[np.argmax(counts)])  # first max = smallest value
        exc_idx = np.flatnonzero(v != mode)
    gaps = _exc_gaps(exc_idx)
    sub_pos, _ = encode_array(gaps, codec="auto", depth=depth + 1)
    sub_val, _ = encode_array(v[exc_idx], codec="auto", depth=depth + 1)
    return (
        bytes([CODEC_PATCH])
        + _HDR_PATCH.pack(n, mode, len(exc_idx))
        + _U32.pack(len(sub_pos))
        + sub_pos
        + _U32.pack(len(sub_val))
        + sub_val
    )


_HDR_PFOR = struct.Struct("<IqBI")
_POW2 = np.concatenate(
    [np.uint64(1) << np.arange(64, dtype=np.uint64), [np.uint64(0xFFFFFFFFFFFFFFFF)]]
)


def _pfor_plan(resid: np.ndarray, n: int) -> tuple[int, int]:
    """Deterministic width choice: minimize packed + per-exception cost over
    the residual bit-width histogram (one vectorized binary search, no
    sort). Returns (width, n_exc)."""
    if n == 0:
        return 0, 0
    bl = bp.bit_lengths(resid)  # bit width 0..64, exact
    hist = np.bincount(bl, minlength=65)
    exc_above = n - np.cumsum(hist)  # exc_above[w] = count with width > w
    max_bits = int(bl.max())
    if max_bits == 0:
        return 0, 0  # all residuals zero: plain FOR territory, not pfor's
    best_w, best_cost, best_exc = max_bits, None, 0
    gap_bytes = max(bp.bit_width(n), 1) / 8 + 0.5  # approx per-exception gap
    # w starts at 1: the w=0 degenerate (everything is an exception except
    # one value) is exactly the mode-based patch codec, already a candidate
    # — and excluding it makes the pfor lower bound (>= 1 packed bit/value)
    # exact, so pruning stays lossless
    for w in range(1, max_bits + 1):
        n_exc = int(exc_above[w])
        cost = (
            bp.packed_size(n, w)
            + n_exc * (gap_bytes + max((max_bits - w + 7) // 8, 1))
        )
        if best_cost is None or cost < best_cost:
            best_w, best_cost, best_exc = w, cost, n_exc
    return best_w, best_exc


def _encode_pfor(vals: np.ndarray, depth: int) -> bytes:
    v = np.ascontiguousarray(vals, dtype=np.int64)
    n = len(v)
    ref = int(v.min()) if n else 0
    resid = (v.view(np.uint64) - np.uint64(ref % (1 << 64))) if n else v.view(np.uint64)
    w, _ = _pfor_plan(resid, n)
    if w >= 64:
        exc_mask = np.zeros(n, dtype=bool)
    else:
        exc_mask = resid >= _POW2[w]
    exc_idx = np.flatnonzero(exc_mask)
    low = (resid & (_POW2[w] - np.uint64(1))) if w < 64 else resid
    packed = bp.pack(low, w)
    gaps = _exc_gaps(exc_idx)
    high = (resid[exc_idx] >> np.uint64(w)).view(np.int64) if w < 64 else np.empty(0, np.int64)
    sub_pos, _ = encode_array(gaps, codec="auto", depth=depth + 1)
    sub_high, _ = encode_array(high, codec="auto", depth=depth + 1)
    return (
        bytes([CODEC_PFOR])
        + _HDR_PFOR.pack(n, ref, w, len(exc_idx))
        + packed
        + _U32.pack(len(sub_pos))
        + sub_pos
        + _U32.pack(len(sub_high))
        + sub_high
    )


_FSST_MAX_PASSES = 3


def _encode_fsst(vals: np.ndarray) -> bytes:
    """Multi-pass FSST: each pass compresses the previous code stream with
    a freshly trained table (pairs-of-pairs => effective 4/8-byte symbols,
    the cheap stand-in for the paper's long symbols). Passes stack while
    they keep shrinking the stream by >=4%.

    body := n:u32 passes:u8 len_0:u32 .. len_passes:u32
            table_1 .. table_passes  codes[len_passes]
    (len_i = byte length of stream i; stream 0 is the varint-zigzag bytes.)
    """
    v = np.ascontiguousarray(vals, dtype=np.int64)
    n = len(v)
    stream = np.frombuffer(vi.varint_encode(vi.zigzag_encode(v)), dtype=np.uint8)
    tables, streams = fsst_mod.compress_multi(stream, _FSST_MAX_PASSES)
    out = [bytes([CODEC_FSST]), _U32.pack(n), bytes([len(tables)])]
    for s in streams:
        out.append(_U32.pack(len(s)))
    out.extend(t.serialize() for t in tables)
    out.append(streams[-1].tobytes())
    return b"".join(out)


def _encode_named(name: str, v: np.ndarray, stats: ChunkStats | None, depth: int) -> bytes:
    if name == "plain":
        return _encode_plain(v)
    if name == "bitpack":
        return _encode_bitpack(v)
    if name == "for":
        return _encode_for(v, depth)
    if name == "delta":
        return _encode_delta(v, depth, stats)
    if name == "rle":
        return _encode_rle(v, depth, stats)
    if name == "dict":
        return _encode_dict(v, depth, stats)
    if name == "patch":
        return _encode_patch(v, depth, stats)
    if name == "pfor":
        return _encode_pfor(v, depth)
    if name == "fsst":
        return _encode_fsst(v)
    raise UnknownCodecError(f"unknown codec {name!r}")


_DELTA_GATE_SAMPLE = 4096


def _delta_skip_confirmed(
    v: np.ndarray, best_len: int, depth: int, stats: ChunkStats | None = None
) -> bool:
    """Confirm the run-free-wide-delta skip: build the EXACT zigzag stream
    `_encode_delta` would hand to the sub-cascade and certify, with checks
    that mirror the sub-cascade's own gates plus two independent optimistic
    size estimates, that the delta candidate cannot beat `best_len`.

    Layers (any one failing -> no skip, the full delta cascade runs):
      1. zz sorted, run-dense, or near-majority mode -> the sub-cascade's
         rle/patch branches stay in play (they can reach O(1) bytes on such
         streams, so no closed-form floor is sound) -> never skip. The mode
         check is EXACT (max run in sorted zz), matching the sub-cascade's
         own patch gate on the same stream — this closes the round-3 ADVICE
         hole where a two-value oscillating delta stream (patch O(1)) was
         skipped at a measured 385x size cost.
      2. Width-frontier floor over SORTED zz with min-subtraction: best of
         direct bitpack, FOR(+bitpack), and every pfor split w with the
         exception high-bits themselves FOR-packed (gap streams taken as
         free). Min-subtraction matters: zigzag maps cancelling +/- deltas
         to ADJACENT codes, so run-free oscillations become a narrow
         re-referenced band the old absolute-width histogram priced at full
         magnitude.
      3. Prefix-sample real encode (the FSST-gate pattern): the actual
         sub-cascade on zz[:4096], linearly extrapolated. Catches global
         structure no closed form models — delta-of-delta, structured
         exception values. Skip only if BOTH estimates are >= best_len.

    Remaining escape: structure confined to the stream's suffix (regime
    change past the sample) that also defeats every exact check above —
    a deliberate heuristic residue, same stance as the rle/dict gates.
    Deterministic: a pure function of the data. Costs ~one sort + a
    4096-value encode vs the full try's analyze + recursive try-encodes."""
    n = len(v)
    if n <= _DELTA_GATE_SAMPLE:
        return False  # sample == whole stream: gate saves nothing
    if stats is not None and stats._zz_full is not None and stats.n == n:
        zz = stats._zz_full  # read-only below (np.sort copies)
    else:
        vu = np.ascontiguousarray(v, dtype=np.int64).view(np.uint64)
        d = np.empty(n, dtype=np.uint64)
        d[0] = vu[0]
        np.subtract(vu[1:], vu[:-1], out=d[1:])  # modular, as _encode_delta
        zz = vi.zigzag_encode(d.view(np.int64)).view(np.uint64)
    # --- layer 1: sub-cascade rle/patch branches must be provably closed
    if bool((zz[1:] >= zz[:-1]).all()):
        return False  # sorted zz: rle/delta-friendly downstream
    if np.count_nonzero(zz[1:] != zz[:-1]) + 1 <= max(n // 2, 4):
        return False  # run-dense zz: rle stays in play
    szz = np.sort(zz)
    brk = np.flatnonzero(szz[1:] != szz[:-1])
    run_bounds = np.concatenate(([-1], brk, [n - 1]))
    mode_count = int(np.diff(run_bounds).max())
    if n - mode_count <= max(n // 2, 4):
        return False  # near-majority: sub-cascade patch can reach O(1)
    # --- layer 2: width-frontier floor (min-referenced, sorted residuals)
    resid = szz - szz[0]
    top = bp.bit_width(int(resid[-1]))
    if top == 0:
        return False
    floor = 6 + bp.packed_size(n, bp.bit_width(int(szz[-1])))
    floor = min(floor, 13 + 6 + bp.packed_size(n, top))
    # count of residuals with bit length <= w == count < 2**w: one
    # vectorized searchsorted over the SORTED residuals replaces the
    # O(n) per-element bit_lengths pass (identical counts by definition)
    le_counts = np.searchsorted(resid, _POW2[1:top]) if top > 1 else None
    for w in range(1, top):
        k = n - int(le_counts[w - 1])
        if k == 0:
            continue
        w_exc = bp.bit_width((int(resid[-1]) >> w) - (int(resid[n - k]) >> w))
        floor = min(floor, 18 + bp.packed_size(n, w) + bp.packed_size(k, w_exc))
    if 5 + floor < best_len:
        return False
    # --- layer 3: prefix-sample real sub-cascade, extrapolated
    sub, _ = encode_array(
        zz[:_DELTA_GATE_SAMPLE].view(np.int64), codec="auto", depth=depth + 1
    )
    if 5 + len(sub) * (n / _DELTA_GATE_SAMPLE) < best_len:
        return False
    return True


def encode_array(
    vals: np.ndarray,
    codec: str = "auto",
    stats: ChunkStats | None = None,
    depth: int = 0,
) -> tuple[bytes, str]:
    """Encode an int array -> (payload bytes, codec name actually used)."""
    v = np.ascontiguousarray(vals, dtype=np.int64)
    if codec != "auto":
        out = _encode_named(codec, v, stats, depth)
        if codec != "plain":
            plain = _encode_plain(v)
            if len(plain) < len(out):  # guard: never worse than plain
                return plain, "plain"
        return out, codec
    if stats is None:
        # deep stats (unique + counts) through depth 2 so dict gating is
        # exact and patch can see the mode of delta/index sub-streams
        stats = ChunkStats.analyze(
            v, deep=(depth <= 2), with_uniq=(depth == 0)
        )
    names = _DEPTH_CANDIDATES[min(depth, _MAX_DEPTH)]
    est = estimate_sizes(stats)
    lb = _lower_bounds(stats)
    # best-estimate-first with lower-bound pruning. The lb skips are exact
    # (a skipped candidate provably cannot be strictly smaller than the
    # current best); the rle/dict gates below are deliberate heuristics —
    # the structures they might miss (periodic/low-cardinality streams)
    # are exactly what patch/pfor capture directly. Deterministic either
    # way: every decision is a pure function of the data.
    ordered = [
        nm for _, _, nm in sorted(
            (est.get(nm, 1 << 60), i, nm) for i, nm in enumerate(names)
        )
    ]
    best: bytes | None = None
    best_name = "plain"
    for name in ordered:
        if name == "bitpack" and stats.n and stats.vmin < 0:
            continue
        if name == "rle" and stats.n_runs > max(stats.n // 2, 4) and (
            not stats.is_sorted
        ):
            continue  # heuristic: run-dominated wins at this density are
            # periodic structures patch/pfor capture on the original
            # stream. SORTED streams stay in play even at high run density:
            # their run-values are monotone, so rle's value sub-stream
            # delta-compresses (e.g. sorted timestamps with duplicate
            # bursts beat delta-on-raw by ~15%)
        if name == "dict" and stats.n_distinct > max(stats.n // 2, 4):
            continue  # heuristic, same reasoning
        if name == "dict" and best is not None and (
            est.get("dict", 0) > 1.25 * len(best) + 64
        ):
            continue  # heuristic est-prune: est["dict"] is the closed-form
            # non-cascaded layout; the cascade can shrink the sorted-uniques
            # and index sub-streams, but an index stream structured enough
            # to close a >25% gap implies equal structure in the original
            # values, which the direct candidates already capture
        if name == "for" and stats.n and stats.vmin >= 0 and (
            bp.bit_width(stats.vmax) == bp.bit_width(stats.vmax - stats.vmin)
        ):
            continue  # EXACT dominance: equal widths make FOR's terminal
            # sub-payload byte-identical to direct bitpack/plain plus a
            # 13-byte reference header — it can never win
        if name == "delta" and best is not None and (
            stats.n_delta_runs > max(stats.n // 2, 4)
            and 0 < stats.zz_p99_value()
            and stats.zz_p99_value() >= stats.vmax - stats.vmin
        ) and _delta_skip_confirmed(v, len(best), depth, stats):
            continue  # a run-free delta stream whose typical (p99) width
            # already covers the value range usually offers the cascade
            # nothing; _delta_skip_confirmed certifies that with exact
            # mirrors of the sub-cascade's rle/patch gates plus TWO
            # optimistic estimates (min-referenced width frontier AND a
            # prefix-sample real encode) — see its docstring for the one
            # documented heuristic residue (suffix-only structure).
        if name == "patch" and (
            stats.mode_count == 0  # mode unknown (shallow stats): skip
            or stats.n - stats.mode_count > max(stats.n // 2, 4)
        ):
            continue  # 2 sub-values per exception can't beat bitpack
        if name == "pfor" and (
            stats.n < 16 or bp.bit_width(stats.vmax - stats.vmin) <= 1
        ):
            continue  # nothing to patch below 2 bits of range
        if best is not None and lb.get(name, 0) >= len(best):
            continue
        enc = _encode_named(name, v, stats, depth)
        if best is None or len(enc) < len(best):
            best, best_name = enc, name
    assert best is not None
    # FSST only pays off when the numeric codecs compress poorly (byte-level
    # patterns the int codecs can't see); gate on the best-so-far ratio to
    # keep the trainer off the hot path.
    if depth == 0 and stats.n >= _FSST_MIN_N and len(best) > 1.25 * stats.n:
        sample = v[:_FSST_SAMPLE]
        est = len(_encode_fsst(sample)) * (stats.n / len(sample))
        if est < len(best):
            enc = _encode_fsst(v)
            if len(enc) < len(best):
                best, best_name = enc, "fsst"
    return best, best_name


def _lower_bounds(s: ChunkStats) -> dict[str, int]:
    """Safe per-codec size minima (cascades included): used to SKIP a
    candidate only when it provably cannot beat the current best.

    plain/bitpack/for/pfor are closed-form exact for their non-cascaded
    part (pfor packs >= 1 bit per value by construction — its w=0
    degenerate case is patch). The cascading codecs (delta/rle/dict/patch)
    get only their fixed framing as the bound: with patch/pfor in the
    cascade, a periodic sub-stream can legally compress to O(1) bytes
    (constant exception gaps + constant exception values -> FOR width 0),
    so any per-element term would wrongly prune a winning candidate —
    measured: tile([0,7], 32768) patch-encodes to 82 bytes."""
    n = s.n
    out: dict[str, int] = {}
    out["plain"] = 1 + 6 + (4 * n if -(2**31) <= s.vmin and s.vmax < 2**31 else 8 * n)
    if s.vmin >= 0:
        out["bitpack"] = 1 + 6 + bp.packed_size(n, bp.bit_width(s.vmax))
    out["for"] = 1 + 13 + min(
        6 + bp.packed_size(n, bp.bit_width(s.vmax - s.vmin)),
        6 + (4 * n if s.vmax - s.vmin < 2**31 else 8 * n),
    ) if n else 20
    out["delta"] = 11
    out["rle"] = 21
    out["dict"] = 21
    out["patch"] = 29
    out["pfor"] = 30 + n // 8
    return out


def choose_codec(vals: np.ndarray, stats: ChunkStats | None = None, **_) -> str:
    """Name of the codec auto-selection would use (try-encode, exact)."""
    return encode_array(vals, codec="auto", stats=stats)[1]


def estimate_sizes(s: ChunkStats) -> dict[str, int]:
    """Closed-form size estimates (non-cascaded layouts) — used for tests and
    observability, NOT for selection (selection try-encodes)."""
    n = s.n

    def sub(k: int, mx: int) -> int:
        if k == 0:
            return 6
        plain = 6 + (4 * k if mx < 2**31 else 8 * k)
        # int.bit_length inlined (== bp.bit_width for the non-negative
        # inputs this helper receives): this runs ~6x per encode_array call
        # and the extra frame was visible in the round-5.2 profile
        return min(plain, 6 + bp.packed_size(k, mx.bit_length()))

    est: dict[str, int] = {}
    est["plain"] = 1 + 6 + (4 * n if -(2**31) <= s.vmin and s.vmax < 2**31 else 8 * n)
    if s.vmin >= 0:
        est["bitpack"] = 1 + 6 + bp.packed_size(n, bp.bit_width(s.vmax))
    rng = s.vmax - s.vmin
    est["for"] = 1 + 13 + (sub(n, rng) if n else 6)
    est["delta"] = 1 + 5 + sub(n, s.max_zz_delta)
    r = s.n_runs
    est["rle"] = 1 + 9 + (1 + 13 + sub(r, rng)) + 4 + sub(r, s.max_run_len) + 4
    d = s.n_distinct
    if d > 0:
        est["dict"] = (
            1 + 9 + 8 + (1 + 13 + sub(d, rng)) + sub(n, max(d - 1, 0))
        )
    if s.mode_count:
        e = n - s.mode_count
        est["patch"] = 1 + 16 + 8 + sub(e, n) + sub(e, rng)
    return est


# ----------------------------------------------------------------- decoders

def _need(buf: memoryview, k: int, what: str) -> None:
    if len(buf) < k:
        raise TruncatedBlobError(f"payload truncated reading {what}")


def describe_payload(payload: bytes | memoryview) -> dict:
    """Walk a payload's codec tree WITHOUT decompressing any values:
    {codec, n, bytes, ...params, children: [...]} — the engine's "inspect"
    surface (the reference ships a copybook-level inspect command; this is
    its chunk-level analogue for debugging one blob out of a 100 TB table).
    Raises the same typed CBSP errors as decode_array on malformed framing,
    but touches only headers and sub-payload lengths."""
    buf = memoryview(payload)
    _need(buf, 1, "codec id")
    cid = buf[0]
    body = buf[1:]
    out: dict = {
        "codec": CODEC_NAMES.get(cid, f"unknown({cid})"),
        "bytes": len(buf),
    }
    if cid not in CODEC_NAMES:
        raise UnknownCodecError(f"unknown codec id {cid}")

    def _two_subs(rest, what):
        _need(rest, 4, f"{what} len1")
        (l1,) = _U32.unpack_from(rest)
        _need(rest, 4 + l1 + 4, f"{what} sub1")
        (l2,) = _U32.unpack_from(rest, 4 + l1)
        _need(rest, 8 + l1 + l2, f"{what} sub2")
        return (
            describe_payload(rest[4 : 4 + l1]),
            describe_payload(rest[8 + l1 : 8 + l1 + l2]),
        )

    if cid in (CODEC_PLAIN, CODEC_BITPACK):
        _need(body, 5, "header")
        n, width = _HDR_PLAIN.unpack_from(body)
        out.update(n=n, width=width)
    elif cid == CODEC_FOR:
        _need(body, 12, "for header")
        n, ref = _HDR_FOR.unpack_from(body)
        out.update(n=n, ref=ref, children=[describe_payload(body[12:])])
    elif cid == CODEC_DELTA:
        _need(body, 4, "delta header")
        (n,) = _U32.unpack_from(body)
        out.update(n=n, children=[describe_payload(body[4:])])
    elif cid == CODEC_RLE:
        _need(body, 8, "rle header")
        n, n_runs = _HDR_RLE.unpack_from(body)
        values, lengths = _two_subs(body[8:], "rle")
        out.update(n=n, n_runs=n_runs, children=[values, lengths])
    elif cid == CODEC_DICT:
        _need(body, 8, "dict header")
        n, d = _HDR_RLE.unpack_from(body)
        uniques, indices = _two_subs(body[8:], "dict")
        out.update(n=n, n_distinct=d, children=[uniques, indices])
    elif cid == CODEC_PATCH:
        _need(body, 16, "patch header")
        n, mode, n_exc = _HDR_PATCH.unpack_from(body)
        gaps, vals = _two_subs(body[16:], "patch")
        out.update(n=n, mode=mode, n_exceptions=n_exc, children=[gaps, vals])
    elif cid == CODEC_PFOR:
        _need(body, 17, "pfor header")
        n, ref, w, n_exc = _HDR_PFOR.unpack_from(body)
        packed = bp.packed_size(n, w)
        _need(body, 17 + packed, "pfor packed data")
        gaps, high = _two_subs(body[17 + packed :], "pfor")
        out.update(
            n=n, ref=ref, width=w, n_exceptions=n_exc,
            packed_bytes=packed, children=[gaps, high],
        )
    elif cid == CODEC_FSST:
        _need(body, 5, "fsst header")
        (n,) = _U32.unpack_from(body)
        passes = body[4]
        out.update(n=n, passes=passes)
    else:  # e.g. CODEC_DOCDELTA: a chunk-level mode tag, never a payload id
        raise UnknownCodecError(f"codec id {cid} is not a payload codec")
    return out


def decode_array(payload: bytes | memoryview) -> np.ndarray:
    """Inverse of encode_array; returns int64 array. Raises structured errors
    on corruption (never returns wrong data silently)."""
    buf = memoryview(payload)
    _need(buf, 1, "codec id")
    cid = buf[0]
    body = buf[1:]
    if cid == CODEC_PLAIN:
        _need(body, 5, "plain header")
        n, width = _HDR_PLAIN.unpack_from(body)
        if width not in (4, 8):
            raise PayloadCorruptError(f"plain width {width}")
        _need(body, 5 + n * width, "plain data")
        return np.frombuffer(
            body, dtype=f"<i{width}", count=n, offset=5
        ).astype(np.int64)
    if cid == CODEC_BITPACK:
        _need(body, 5, "bitpack header")
        n, width = _HDR_PLAIN.unpack_from(body)
        if width > 64:
            raise PayloadCorruptError(f"bitpack width {width}")
        u = bp.unpack(body[5:], n, width)
        return u.view(np.int64) if u.flags.owndata else u.astype(np.int64)
    if cid == CODEC_FOR:
        _need(body, 12, "for header")
        n, ref = _HDR_FOR.unpack_from(body)
        sub = decode_array(body[12:])
        if len(sub) != n:
            raise CountMismatchError(f"for: {len(sub)} != {n}")
        return (sub.view(np.uint64) + np.uint64(ref % (1 << 64))).view(np.int64)
    if cid == CODEC_DELTA:
        _need(body, 4, "delta header")
        (n,) = _U32.unpack_from(body)
        zz = decode_array(body[4:])
        if len(zz) != n:
            raise CountMismatchError(f"delta: {len(zz)} != {n}")
        deltas = vi.zigzag_decode(zz.view(np.uint64))
        return np.cumsum(deltas.view(np.uint64)).view(np.int64)
    if cid == CODEC_RLE:
        _need(body, 8, "rle header")
        n, n_runs = _HDR_RLE.unpack_from(body)
        off = 8
        _need(body, off + 4, "rle len1")
        (len1,) = _U32.unpack_from(body, off)
        off += 4
        _need(body, off + len1, "rle values")
        run_vals = decode_array(body[off : off + len1])
        off += len1
        _need(body, off + 4, "rle len2")
        (len2,) = _U32.unpack_from(body, off)
        off += 4
        _need(body, off + len2, "rle lengths")
        run_lens = decode_array(body[off : off + len2])
        if len(run_vals) != n_runs or len(run_lens) != n_runs:
            raise CountMismatchError("rle: run count mismatch")
        if (run_lens < 0).any():
            raise PayloadCorruptError("rle: negative run length")
        if n_runs and int(run_lens.sum()) != n:
            raise CountMismatchError("rle: total length mismatch")
        return np.repeat(run_vals, run_lens)
    if cid == CODEC_DICT:
        _need(body, 8, "dict header")
        n, d = _HDR_RLE.unpack_from(body)
        off = 8
        _need(body, off + 4, "dict len1")
        (len1,) = _U32.unpack_from(body, off)
        off += 4
        _need(body, off + len1, "dict values")
        uniq = decode_array(body[off : off + len1])
        off += len1
        _need(body, off + 4, "dict len2")
        (len2,) = _U32.unpack_from(body, off)
        off += 4
        _need(body, off + len2, "dict indices")
        idx = decode_array(body[off : off + len2])
        if len(uniq) != d:
            raise CountMismatchError("dict: dictionary size mismatch")
        if len(idx) != n:
            raise CountMismatchError("dict: index count mismatch")
        if n and ((idx < 0).any() or (idx >= d).any()):
            raise PayloadCorruptError("dict: index out of range")
        return uniq[idx]
    if cid == CODEC_PFOR:
        _need(body, 17, "pfor header")
        n, ref, w, n_exc = _HDR_PFOR.unpack_from(body)
        if w > 64:
            raise PayloadCorruptError(f"pfor width {w}")
        off = 17
        psize = bp.packed_size(n, w)
        _need(body, off + psize, "pfor packed")
        resid = bp.unpack(body[off : off + psize], n, w)
        off += psize
        _need(body, off + 4, "pfor len1")
        (len1,) = _U32.unpack_from(body, off)
        off += 4
        _need(body, off + len1, "pfor positions")
        gaps = decode_array(body[off : off + len1])
        off += len1
        _need(body, off + 4, "pfor len2")
        (len2,) = _U32.unpack_from(body, off)
        off += 4
        _need(body, off + len2, "pfor high residuals")
        high = decode_array(body[off : off + len2])
        if len(gaps) != n_exc or len(high) != n_exc:
            raise CountMismatchError("pfor: exception count mismatch")
        if n_exc > n:
            raise PayloadCorruptError("pfor: more exceptions than values")
        if w == 64 and n_exc:
            raise PayloadCorruptError("pfor: exceptions at full width")
        if n_exc:
            pos = _exc_positions(gaps, n, "pfor")
            resid[pos] |= high.view(np.uint64) << np.uint64(w)
        return (resid + np.uint64(ref % (1 << 64))).view(np.int64)
    if cid == CODEC_PATCH:
        _need(body, 16, "patch header")
        n, mode, n_exc = _HDR_PATCH.unpack_from(body)
        off = 16
        _need(body, off + 4, "patch len1")
        (len1,) = _U32.unpack_from(body, off)
        off += 4
        _need(body, off + len1, "patch positions")
        gaps = decode_array(body[off : off + len1])
        off += len1
        _need(body, off + 4, "patch len2")
        (len2,) = _U32.unpack_from(body, off)
        off += 4
        _need(body, off + len2, "patch values")
        exc_vals = decode_array(body[off : off + len2])
        if len(gaps) != n_exc or len(exc_vals) != n_exc:
            raise CountMismatchError("patch: exception count mismatch")
        if n_exc > n:
            raise PayloadCorruptError("patch: more exceptions than values")
        out = np.full(n, mode, dtype=np.int64)
        if n_exc:
            pos = _exc_positions(gaps, n, "patch")
            out[pos] = exc_vals
        return out
    if cid == CODEC_FSST:
        _need(body, 5, "fsst header")
        (n,) = _U32.unpack_from(body, 0)
        passes = body[4]
        if passes > _FSST_MAX_PASSES:
            raise PayloadCorruptError(f"fsst passes {passes}")
        off = 5
        _need(body, off + 4 * (passes + 1), "fsst lengths")
        lens = [
            _U32.unpack_from(body, off + 4 * i)[0] for i in range(passes + 1)
        ]
        off += 4 * (passes + 1)
        tables = []
        for _ in range(passes):
            table, used = fsst_mod.SymbolTable.deserialize(body[off:])
            tables.append(table)
            off += used
        _need(body, off + lens[-1], "fsst codes")
        stream = np.frombuffer(body, dtype=np.uint8, count=lens[-1], offset=off)
        for p in range(passes - 1, -1, -1):
            stream = fsst_mod.decompress(stream, tables[p], lens[p])
        u = vi.varint_decode(stream.tobytes(), n)
        return vi.zigzag_decode(u)
    raise UnknownCodecError(f"unknown codec id {cid}")


def try_decode_u32(payload: bytes | memoryview) -> np.ndarray | None:
    """Decode a payload natively into uint32 when it is a terminal bitpack
    of width <= 32, or a FOR wrapper (non-negative reference, certified
    in-range) around one — the dominant shapes on token-scale data; None
    otherwise. Values are < 2**32 and non-negative by construction, so the
    caller's 32-bit arithmetic lane needs no further certification. Half
    the memory traffic of decode_array + astype on the decode hot path."""
    buf = memoryview(payload)
    if len(buf) < 6:
        return None
    if buf[0] == CODEC_FOR:
        if len(buf) < 13:
            return None
        n, ref = _HDR_FOR.unpack_from(buf, 1)
        if not 0 <= ref < (1 << 32):
            return None
        sub = try_decode_u32(buf[13:])
        if sub is None:
            return None
        if len(sub) != n:
            raise CountMismatchError(f"for: {len(sub)} != {n}")
        if len(sub) and ref + int(sub.max()) >= (1 << 32):
            return None  # would wrap the 32-bit lane; take the 64-bit path
        return sub + np.uint32(ref)
    if buf[0] != CODEC_BITPACK:
        return None
    n, width = _HDR_PLAIN.unpack_from(buf, 1)
    if width > 32:
        return None
    return bp.unpack32(buf[6:], n, width)
