"""FSST-style symbol-table compression over byte streams — pure numpy.

A simplified Fast Static Symbol Table (Boncz, Neumann, Leis — VLDB 2020)
restricted to symbols of length 1 and 2: codes 0..254 map to trained symbols,
code 255 is an escape marker followed by one literal byte. Training is a
single frequency pass over a bounded sample, so the table is a deterministic
function of the chunk bytes (same stance as the reference's data-driven
zoned-encoding detection, crates/copybook-codec/src/numeric.rs:308-396;
its 256-entry charset tables at crates/copybook-charset/src/lib.rs:40 are
the fixed-table precedent).

Both encode and decode are fully vectorized. The only sequential dependency
in greedy pair matching (a taken pair consumes the next byte) is resolved
with a run-parity trick: within each maximal run of consecutive pair-eligible
positions, greedy left-to-right takes exactly the even offsets.
"""

from __future__ import annotations

import numpy as np

from copybook_rs_spark.errors import PayloadCorruptError, TruncatedBlobError

ESCAPE = 255
MAX_CODES = 255  # 0..254 usable, 255 reserved for escape
_MAX_PAIRS = 192
_MIN_PAIR_FREQ = 4
_TRAIN_SAMPLE = 1 << 16


class SymbolTable:
    """Trained table: per-code symbol length (0 = unused) and bytes."""

    __slots__ = ("sym_len", "sym_b0", "sym_b1", "pair_code", "single_code")

    def __init__(self, sym_len: np.ndarray, sym_b0: np.ndarray, sym_b1: np.ndarray):
        self.sym_len = sym_len  # uint8[256]
        self.sym_b0 = sym_b0  # uint8[256]
        self.sym_b1 = sym_b1  # uint8[256]
        pair_code = np.full(65536, -1, dtype=np.int16)
        single_code = np.full(256, -1, dtype=np.int16)
        for c in np.flatnonzero(sym_len == 2):
            pair_code[int(sym_b0[c]) * 256 + int(sym_b1[c])] = c
        for c in np.flatnonzero(sym_len == 1):
            single_code[int(sym_b0[c])] = c
        self.pair_code = pair_code
        self.single_code = single_code

    def serialize(self) -> bytes:
        """255 length bytes + concatenated symbol bytes (codes 0..254)."""
        lens = self.sym_len[:MAX_CODES]
        parts = [lens.tobytes()]
        order = np.flatnonzero(lens > 0)
        blob = np.empty(int(lens.sum()), dtype=np.uint8)
        pos = 0
        for c in order:
            blob[pos] = self.sym_b0[c]
            if lens[c] == 2:
                blob[pos + 1] = self.sym_b1[c]
            pos += int(lens[c])
        parts.append(blob.tobytes())
        return b"".join(parts)

    @classmethod
    def deserialize(cls, buf: memoryview) -> tuple["SymbolTable", int]:
        if len(buf) < MAX_CODES:
            raise TruncatedBlobError("fsst table truncated")
        lens = np.frombuffer(buf, dtype=np.uint8, count=MAX_CODES)
        if (lens > 2).any():
            raise PayloadCorruptError("fsst symbol length > 2")
        total = int(lens.sum())
        if len(buf) < MAX_CODES + total:
            raise TruncatedBlobError("fsst symbol bytes truncated")
        blob = np.frombuffer(buf, dtype=np.uint8, count=total, offset=MAX_CODES)
        sym_len = np.zeros(256, dtype=np.uint8)
        sym_len[:MAX_CODES] = lens
        sym_b0 = np.zeros(256, dtype=np.uint8)
        sym_b1 = np.zeros(256, dtype=np.uint8)
        starts = np.zeros(MAX_CODES, dtype=np.int64)
        np.cumsum(lens[:-1].astype(np.int64), out=starts[1:])
        used = np.flatnonzero(lens > 0)
        sym_b0[used] = blob[starts[used]]
        two = np.flatnonzero(lens == 2)
        sym_b1[two] = blob[starts[two] + 1]
        return cls(sym_len, sym_b0, sym_b1), MAX_CODES + total


def _build_table(pairs: np.ndarray, singles: np.ndarray) -> SymbolTable:
    sym_len = np.zeros(256, dtype=np.uint8)
    sym_b0 = np.zeros(256, dtype=np.uint8)
    sym_b1 = np.zeros(256, dtype=np.uint8)
    n_pairs = len(pairs)
    codes = np.arange(n_pairs)
    sym_len[codes] = 2
    sym_b0[codes] = (pairs >> 8).astype(np.uint8)
    sym_b1[codes] = (pairs & 0xFF).astype(np.uint8)
    codes = np.arange(n_pairs, n_pairs + len(singles))
    sym_len[codes] = 1
    sym_b0[codes] = singles.astype(np.uint8)
    return SymbolTable(sym_len, sym_b0, sym_b1)


def train(data: np.ndarray) -> SymbolTable:
    """Single-pass frequency training over a bounded prefix sample.

    Longer effective symbols come from stacking passes (compress the code
    stream with a freshly trained table — pairs-of-pairs give 4-byte
    symbols), which the caller controls; see codecs/core.py _encode_fsst."""
    sample = data[:_TRAIN_SAMPLE]
    if len(sample) == 0:
        return _build_table(np.empty(0, np.uint16), np.empty(0, np.uint8))
    bk, bc = np.unique(sample, return_counts=True)
    singles_order = bk[np.lexsort((bk, -bc))]
    pk = np.empty(0, np.uint16)
    if len(sample) >= 2:
        keys = sample[:-1].astype(np.uint16) * 256 + sample[1:]
        pk, pc = np.unique(keys, return_counts=True)
        good = pc >= _MIN_PAIR_FREQ
        pk, pc = pk[good], pc[good]
        order = np.lexsort((pk, -pc))[:_MAX_PAIRS]  # by (-count, key)
        pk = pk[order]
    singles = singles_order[: MAX_CODES - len(pk)]
    return _build_table(pk, singles)


def compress_multi(
    data: np.ndarray, max_passes: int = 3, min_gain: float = 0.96
) -> tuple[list["SymbolTable"], list[np.ndarray]]:
    """Stack compression passes while each shrinks the stream enough to pay
    for its table (pairs-of-pairs => effective 4/8-byte symbols).
    Returns (tables, streams) with streams[0] = input, streams[-1] = final."""
    streams = [data]
    tables: list[SymbolTable] = []
    for _ in range(max_passes):
        cur = streams[-1]
        if len(cur) < 16:
            break
        table = train(cur)
        nxt = np.frombuffer(compress(cur, table), dtype=np.uint8)
        if len(nxt) + len(table.serialize()) > min_gain * len(cur):
            break
        streams.append(nxt)
        tables.append(table)
    return tables, streams


def decompress_multi(
    final: np.ndarray, tables: list["SymbolTable"], lens: list[int]
) -> np.ndarray:
    """Inverse of compress_multi: lens[i] = byte length of stream i."""
    stream = final
    for p in range(len(tables) - 1, -1, -1):
        stream = decompress(stream, tables[p], lens[p])
    return stream


def _ffill_run_starts(flags: np.ndarray) -> np.ndarray:
    """For each True position, index of the start of its True-run."""
    idx = np.arange(len(flags), dtype=np.int64)
    begin = flags & ~np.concatenate(([False], flags[:-1]))
    return np.maximum.accumulate(np.where(begin, idx, -1))


def compress(data: np.ndarray, table: SymbolTable) -> bytes:
    """Encode uint8 array -> code bytes. Vectorized greedy pair matching."""
    n = len(data)
    if n == 0:
        return b""
    if n >= 2:
        keys = data[:-1].astype(np.uint16) * 256 + data[1:]
        ok = table.pair_code[keys] >= 0
        starts = _ffill_run_starts(ok)
        idx = np.arange(n - 1, dtype=np.int64)
        taken = ok & (((idx - starts) & 1) == 0)
    else:
        taken = np.zeros(0, dtype=bool)
        keys = np.zeros(0, dtype=np.uint16)
    is_pair = np.zeros(n, dtype=bool)
    is_pair[: n - 1] = taken
    consumed = np.zeros(n, dtype=bool)
    consumed[1:] = taken
    is_single = ~is_pair & ~consumed
    sc = table.single_code[data]
    out_len = np.zeros(n, dtype=np.int64)
    out_len[is_pair] = 1
    single_known = is_single & (sc >= 0)
    single_esc = is_single & (sc < 0)
    out_len[single_known] = 1
    out_len[single_esc] = 2
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(out_len[:-1], out=offs[1:])
    total = int(out_len.sum())
    out = np.empty(total, dtype=np.uint8)
    pair_pos = np.flatnonzero(is_pair)
    out[offs[pair_pos]] = table.pair_code[keys[pair_pos]].astype(np.uint8)
    kp = np.flatnonzero(single_known)
    out[offs[kp]] = sc[kp].astype(np.uint8)
    ep = np.flatnonzero(single_esc)
    out[offs[ep]] = ESCAPE
    out[offs[ep] + 1] = data[ep]
    return out.tobytes()


def decompress(codes: np.ndarray, table: SymbolTable, out_bytes: int) -> np.ndarray:
    """Decode code bytes -> uint8 array of exactly out_bytes. Vectorized."""
    n = len(codes)
    if n == 0:
        if out_bytes != 0:
            raise PayloadCorruptError("fsst: empty stream, nonzero expected output")
        return np.empty(0, dtype=np.uint8)
    is255 = codes == ESCAPE
    starts = _ffill_run_starts(is255)
    idx = np.arange(n, dtype=np.int64)
    marker = is255 & (((idx - starts) & 1) == 0)
    if marker[-1]:
        raise TruncatedBlobError("fsst: escape marker at end of stream")
    literal = np.zeros(n, dtype=bool)
    literal[1:] = marker[:-1]
    normal = ~marker & ~literal
    slen = table.sym_len[codes]
    if (slen[normal] == 0).any():
        raise PayloadCorruptError("fsst: undefined symbol code in stream")
    out_len = np.zeros(n, dtype=np.int64)
    out_len[marker] = 1
    out_len[normal] = slen[normal]
    total = int(out_len.sum())
    if total != out_bytes:
        raise PayloadCorruptError(
            f"fsst: decoded {total} bytes, expected {out_bytes}"
        )
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(out_len[:-1], out=offs[1:])
    out = np.empty(total, dtype=np.uint8)
    mp = np.flatnonzero(marker)
    out[offs[mp]] = codes[mp + 1]
    npos = np.flatnonzero(normal)
    out[offs[npos]] = table.sym_b0[codes[npos]]
    two = npos[slen[npos] == 2]
    out[offs[two] + 1] = table.sym_b1[codes[two]]
    return out
