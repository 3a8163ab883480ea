"""Generate fixture-parquet oracles for the engine-internal deterministic
kernels (SimHash fingerprints, multimodal byte-features).

These two driver queries were rows-only: their outputs are pure functions of
the documents fixture, but not expressible in portable ANSI SQL. This script
pins them with an INDEPENDENT reimplementation — plain per-doc Python loops,
no imports from copybook_rs_spark — so the oracle checks the vectorized
kernels against a second implementation, not against themselves (the
reference's dual-implementation fidelity stance,
crates/copybook-codec/src/roundtrip.rs:89).

Each fixture row carries sf_key = sum(n_chars) of the documents table it was
computed from, so one parquet file serves every scale factor; the oracle SQL
selects the slice matching the table under test:

    WHERE sf_key = (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents)

Regenerate (after a DELIBERATE kernel-semantics change only):
    PYTHONPATH=. python scripts/make_oracle_fixtures.py
"""

from decimal import ROUND_HALF_UP, Decimal
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
OUT_DIR = Path(__file__).resolve().parent.parent / "tests" / "fixtures"

FNV_OFF = 0xCBF29CE484222325
FNV_PRM = 0x100000001B3
M64 = (1 << 64) - 1
FEATURE_DIM = 16


def fnv1a(b: bytes) -> int:
    h = FNV_OFF
    for byte in b:
        h = ((h ^ byte) * FNV_PRM) & M64
    return h


def simhash_doc(text: str) -> int:
    """64-bit SimHash: FNV-1a per space-split word, strict-majority vote
    per bit. Returns the signed-int64 view of the fingerprint."""
    hashes = [fnv1a(w.encode("utf-8")) for w in text.split(" ")]
    n = len(hashes)
    fp = 0
    for b in range(64):
        votes = sum((h >> b) & 1 for h in hashes)
        if votes * 2 > n:
            fp |= 1 << b
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def features_doc(data: bytes) -> np.ndarray:
    """Deterministic byte-level features: byte at position p lands in lane
    p % DIM with rolling weight 0.5 + ((p * 2654435761) % 1000003)/1000003,
    lane sums divided by the byte count."""
    acc = [0.0] * FEATURE_DIM
    for pos, byte in enumerate(data):
        w = ((pos * 2654435761) % 1000003) / 1000003.0
        acc[pos % FEATURE_DIM] += byte * (0.5 + w)
    ln = max(len(data), 1)
    return np.array([a / ln for a in acc], dtype=np.float32)


def round_half_up_4(x: np.float32) -> np.float32:
    """Spark ROUND(float, 4): shortest-repr decimal of the value, HALF_UP
    at scale 4, back to float32 (BigDecimal.valueOf semantics)."""
    d = Decimal(repr(float(x))).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    return np.float32(d)


def main() -> None:
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    sim_rows = {k: [] for k in ("sf_key", "doc_id", "simhash")}
    mm_rows = {k: [] for k in ("sf_key", "media_id", "kind", "n_bytes", "f0", "f15")}
    for sf in SF_DIRS:
        docs = duckdb.sql(
            f"SELECT doc_id, text, n_chars FROM '{sf}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
        sf_key = sum(r[2] for r in docs)
        for doc_id, text, _n in docs:
            sim_rows["sf_key"].append(sf_key)
            sim_rows["doc_id"].append(doc_id)
            sim_rows["simhash"].append(simhash_doc(text))
            data = text.encode("utf-8")
            f = features_doc(data)
            mm_rows["sf_key"].append(sf_key)
            mm_rows["media_id"].append(doc_id)
            mm_rows["kind"].append("image")
            mm_rows["n_bytes"].append(len(data))
            mm_rows["f0"].append(round_half_up_4(f[0]))
            mm_rows["f15"].append(round_half_up_4(f[15]))
        print(f"{sf}: sf_key={sf_key} docs={len(docs)}")
    pq.write_table(
        pa.table(
            {
                "sf_key": pa.array(sim_rows["sf_key"], pa.int64()),
                "doc_id": pa.array(sim_rows["doc_id"], pa.int64()),
                "simhash": pa.array(sim_rows["simhash"], pa.int64()),
            }
        ),
        OUT_DIR / "simhash_oracle.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "sf_key": pa.array(mm_rows["sf_key"], pa.int64()),
                "media_id": pa.array(mm_rows["media_id"], pa.int64()),
                "kind": pa.array(mm_rows["kind"], pa.string()),
                "n_bytes": pa.array(mm_rows["n_bytes"], pa.int64()),
                "f0": pa.array(mm_rows["f0"], pa.float32()),
                "f15": pa.array(mm_rows["f15"], pa.float32()),
            }
        ),
        OUT_DIR / "multimodal_oracle.parquet",
    )
    print(f"wrote {OUT_DIR}/simhash_oracle.parquet, multimodal_oracle.parquet")


if __name__ == "__main__":
    main()
