"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schema, partition-parallel mapInArrow over
Arrow binary buffers, batch shapes, deterministic feature vectors — while
the actual media decode is STUBBED (`decode_media` raises
NotImplementedError: pillow/ffmpeg are not in this container). Swapping the
stub for a real decoder changes one function, not the pipeline.

Media rows: (media_id long, media binary, meta struct<kind string,
width int, height int>). `fake_features` derives a deterministic
FEATURE_DIM-float vector from the bytes (rolling uint64 hash -> floats), so
the distributed path is testable end-to-end without codecs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "media_id long, media binary, kind string, width int, height int"
)
FEATURES_SCHEMA = "media_id long, kind string, n_bytes long, features array<float>"

_FEAT_PA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("n_bytes", pa.int64()),
        ("features", pa.list_(pa.float32())),
    ]
)


def _decode_bmp(data: bytes) -> np.ndarray:
    """Pure-numpy decoder for uncompressed 24-bit BMP -> uint8 HxWx3 RGB.
    No imaging library needed; covers the windows-bitmap baseline
    (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding)."""
    import struct as _struct

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP file")
    (pix_off,) = _struct.unpack_from("<I", data, 10)
    hdr_size, width, height = _struct.unpack_from("<Iii", data, 14)
    planes, bpp = _struct.unpack_from("<HH", data, 26)
    (compression,) = _struct.unpack_from("<I", data, 30)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = height > 0
    h = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    need = pix_off + row_bytes * h
    if len(data) < need:
        raise ValueError("BMP pixel data truncated")
    raw = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=pix_off)
    rows = raw.reshape(h, row_bytes)[:, : width * 3].reshape(h, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Pure-numpy decoder for 16-bit PCM WAV -> (int16 [n, channels],
    sample_rate)."""
    import struct as _struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    off = 12
    channels = rate = bits = None
    payload = None
    while off + 8 <= len(data):
        cid = data[off : off + 4]
        (clen,) = _struct.unpack_from("<I", data, off + 4)
        body = data[off + 8 : off + 8 + clen]
        if cid == b"fmt ":
            fmt, channels, rate = _struct.unpack_from("<HHI", body, 0)
            (bits,) = _struct.unpack_from("<H", body, 14)
            if fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only 16-bit PCM WAV supported (fmt={fmt}, bits={bits})"
                )
        elif cid == b"data":
            payload = body
        off += 8 + clen + (clen & 1)  # chunks are word-aligned
    if channels is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    wave = np.frombuffer(payload, dtype="<i2")
    wave = wave[: (len(wave) // channels) * channels].reshape(-1, channels)
    return wave, rate


def decode_media(data: bytes, kind: str):
    """Dependency-free media decode for the formats a pure-numpy engine can
    own: image -> 24-bit BMP to uint8 HxWx3 RGB, audio -> 16-bit PCM WAV to
    (int16 [n, channels], rate). Other containers (jpeg/png/mp3/mp4) remain
    a declared hook — wire PIL/soundfile/av here when available."""
    if kind == "image":
        return _decode_bmp(data)
    if kind == "audio":
        return _decode_wav(data)
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires imaging/audio libraries "
        "not present in this environment; wire PIL/soundfile/av here"
    )


def decoded_features(data: bytes, kind: str) -> np.ndarray:
    """FEATURE_DIM float32 vector from the DECODED media (vs fake_features'
    byte-level hash): per-channel means/extrema + shape for images,
    channel stats + zero-crossing rate for audio. Deterministic."""
    out = np.zeros(FEATURE_DIM, dtype=np.float32)
    if kind == "image":
        img = decode_media(data, kind).astype(np.float64)
        h, w, _ = img.shape
        out[0:3] = img.mean(axis=(0, 1))
        out[3:6] = img.std(axis=(0, 1))
        out[6:9] = img.max(axis=(0, 1))
        out[9:12] = img.min(axis=(0, 1))
        out[12], out[13] = h, w
        out[14] = img.mean()
        out[15] = np.abs(np.diff(img.mean(axis=2), axis=1)).mean() if w > 1 else 0.0
        return out
    if kind == "audio":
        wave, rate = decode_media(data, kind)
        wv = wave.astype(np.float64)
        n, ch = wv.shape
        out[0] = wv.mean()
        out[1] = wv.std()
        out[2] = np.abs(wv).mean()
        out[3] = wv.max()
        out[4] = wv.min()
        out[5] = float((np.diff(np.signbit(wv[:, 0])) != 0).mean()) if n > 1 else 0.0
        out[6], out[7], out[8] = n, ch, rate
        out[9] = np.sqrt((wv**2).mean())
        return out
    raise NotImplementedError(f"no feature extractor for kind={kind!r}")


def _feature_kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        kinds = batch.column("kind").to_pylist()
        media = batch.column("media")
        # zero-copy view of the binary column: offsets + contiguous bytes
        offs = np.frombuffer(media.buffers()[1], dtype=np.int32)[
            media.offset : media.offset + len(media) + 1
        ]
        raw = (
            np.frombuffer(media.buffers()[2], dtype=np.uint8)
            if media.buffers()[2] is not None
            else np.empty(0, np.uint8)
        )
        n = len(ids)
        feats = np.zeros((n, FEATURE_DIM), dtype=np.float32)
        lens = (offs[1:] - offs[:-1]).astype(np.int64)
        total = int(offs[-1] - offs[0])
        if total:
            # deterministic per-byte accumulation into FEATURE_DIM lanes:
            # byte j of item i lands in lane (j % DIM) with a rolling weight
            raw_slice = raw[offs[0] : offs[-1]]
            byte_item = np.repeat(np.arange(n), lens)
            within = np.arange(total) - np.repeat(offs[:-1] - offs[0], lens)
            lanes = (within % FEATURE_DIM).astype(np.int64)
            w = ((within * 2654435761) % 1000003).astype(np.float64) / 1000003.0
            vals = raw_slice.astype(np.float64) * (0.5 + w)
            flat_idx = byte_item * FEATURE_DIM + lanes
            acc = np.bincount(flat_idx, weights=vals, minlength=n * FEATURE_DIM)
            feats = (acc.reshape(n, FEATURE_DIM) / np.maximum(lens, 1)[:, None]).astype(
                np.float32
            )
        f_offs = np.arange(0, (n + 1) * FEATURE_DIM, FEATURE_DIM, dtype=np.int32)
        flist = pa.ListArray.from_arrays(
            pa.array(f_offs), pa.array(feats.reshape(-1), pa.float32())
        )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(kinds, pa.string()),
                pa.array(lens, pa.int64()),
                flist,
            ],
            schema=_FEAT_PA,
        )


def extract_features(media_df: DataFrame) -> DataFrame:
    """Partition-parallel feature extraction over the binary column.
    Deterministic byte-level features (no decode; works for any format)."""
    return media_df.select("media_id", "media", "kind").mapInArrow(
        _feature_kernel, FEATURES_SCHEMA
    )


def _decoded_feature_kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        kinds = batch.column("kind").to_pylist()
        media = batch.column("media")
        n = len(ids)
        lens = np.empty(n, dtype=np.int64)
        feats = np.zeros((n, FEATURE_DIM), dtype=np.float32)
        for i in range(n):  # per-MEDIA loop: one row = one whole image/clip,
            # the same work granularity as one chunk in the codec kernels
            data = media[i].as_py()
            lens[i] = len(data)
            feats[i] = decoded_features(data, kinds[i])
        f_offs = np.arange(0, (n + 1) * FEATURE_DIM, FEATURE_DIM, dtype=np.int32)
        flist = pa.ListArray.from_arrays(
            pa.array(f_offs), pa.array(feats.reshape(-1), pa.float32())
        )
        yield pa.RecordBatch.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(kinds, pa.string()),
             pa.array(lens, pa.int64()), flist],
            schema=_FEAT_PA,
        )


def extract_decoded_features(media_df: DataFrame) -> DataFrame:
    """Feature extraction over DECODED media (real BMP/WAV decode via
    decode_media) — the end-to-end multimodal path."""
    return media_df.select("media_id", "media", "kind").mapInArrow(
        _decoded_feature_kernel, FEATURES_SCHEMA
    )


def make_bmp(pixels: np.ndarray) -> bytes:
    """Serialize uint8 HxWx3 RGB -> 24-bit BMP bytes (test/fixture helper,
    the exact inverse of _decode_bmp)."""
    import struct as _struct

    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    pix = np.zeros((h, row_bytes), dtype=np.uint8)
    pix[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    body = pix.tobytes()
    header = _struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + body


def make_wav(wave: np.ndarray, rate: int = 16000) -> bytes:
    """Serialize int16 [n, channels] -> 16-bit PCM WAV bytes (test helper)."""
    import struct as _struct

    n, ch = wave.shape
    payload = wave.astype("<i2").tobytes()
    fmt = _struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    chunks = b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + _struct.pack("<I", len(payload)) + payload
    return b"RIFF" + _struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
