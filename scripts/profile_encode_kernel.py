"""Single-core encode-kernel profile over the driver token profile.

Replays the exact driver token table (TOKEN_TABLE_DUCKDB_SQL on the sf-dir
lineitem parquet — same values Spark derives) through make_encode_kernel
with NO Spark in the loop, so cProfile sees only the kernel. Batches are
sliced to the production Arrow batch size (16Ki rows) so cumsum/setup
amortization matches the real pipeline.

Usage: python scripts/profile_encode_kernel.py [sf_dir] [reps]
Prints warm throughput then a cProfile table sorted by tottime.
"""

from __future__ import annotations

import cProfile
import pstats
import sys
import time

import duckdb
import numpy as np
import pyarrow as pa

from copybook_rs_spark.config import EncodeConfig
from copybook_rs_spark.operators.encode import make_encode_kernel
from copybook_rs_spark.sources.tokens import TOKEN_TABLE_DUCKDB_SQL

BATCH_ROWS = 16384


def load_batches(sf_dir: str) -> tuple[list[pa.RecordBatch], int]:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    tbl = con.execute(
        TOKEN_TABLE_DUCKDB_SQL + " ORDER BY source, doc_id"
    ).arrow()
    n = tbl.num_rows
    tbl = tbl.append_column(
        "part_id", pa.array(np.zeros(n, dtype=np.int64))
    ).combine_chunks()
    n_tok = int(
        duckdb.arrow(tbl).aggregate("sum(n_tok)").fetchone()[0]
    )
    batches = tbl.to_batches(max_chunksize=BATCH_ROWS)
    return batches, n_tok


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    batches, n_tok = load_batches(sf_dir)
    cfg = EncodeConfig()

    def run() -> int:
        kernel = make_encode_kernel(cfg)
        return sum(out.num_rows for out in kernel(iter(batches)))

    n_chunks = run()  # warmup
    t0 = time.perf_counter()
    n_chunks = run()
    dt = time.perf_counter() - t0
    print(
        f"warm: {n_chunks} chunks, {n_tok} tokens, {dt:.3f} s, "
        f"{n_tok / dt / 1e6:.2f}M tok/s single-core"
    )
    pr = cProfile.Profile()
    pr.enable()
    for _ in range(reps):
        run()
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("tottime").print_stats(35)


if __name__ == "__main__":
    main()
