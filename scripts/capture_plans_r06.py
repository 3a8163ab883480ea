"""Capture .explain('formatted') for the round-6 optimization targets.

Usage: python scripts/capture_plans_r06.py <suffix> [name ...]
Writes plans/r06/<name>_<suffix>.txt (suffix = before|after).
Covers the bench.py lanes (the driver-timed jobs) plus the declared
queries whose physical plans round 6 touches.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

from copybook_rs_spark.config import EncodeConfig
from copybook_rs_spark.operators import decode_tokens, encode_tokens
from copybook_rs_spark.operators.packing import pack_sequences
from copybook_rs_spark.operators.verify import hash_mismatched_sources
from copybook_rs_spark.session import get_spark
from copybook_rs_spark.sources.manifest import build_manifest, read_chunks, write_encoded
from copybook_rs_spark.sources.tokens import token_table


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("cbsp-plans-r06", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    tok = token_table(spark, sf_dir)
    cfg = EncodeConfig()
    import tempfile, shutil

    tmp = tempfile.mkdtemp(prefix="cbsp_plans_")
    enc_dir = os.path.join(tmp, "enc")
    write_encoded(encode_tokens(tok, cfg), enc_dir)
    chunks = read_chunks(spark, enc_dir)

    plans = {
        "bench_encode": lambda: encode_tokens(tok, cfg),
        "bench_decode": lambda: decode_tokens(chunks),
        "bench_verify": lambda: hash_mismatched_sources(tok, decode_tokens(chunks)),
        "bench_stats_minmax": lambda: tok.select(
            "source", F.explode("tokens").alias("token")
        ).groupBy("source").agg(F.min("token"), F.max("token"), F.count("*")),
        "bench_manifest_agg": lambda: build_manifest(chunks),
        "sequence_pack": lambda: pack_sequences(tok, 512),
    }
    try:
        for name, fn in plans.items():
            if only and name not in only:
                continue
            txt = plan_text(fn())
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path} ({len(txt)} bytes)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
