"""Benchmark harness: headline engine jobs at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys (informational): encode_tokens_per_sec, bytes_per_token,
ref_parquet_zstd_bytes_per_token (the "reference encoder" bar from
BASELINE.md — parquet dict/RLE+zstd on the same token column).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from copybook_rs_spark.config import EncodeConfig
from copybook_rs_spark.operators import decode_tokens, encode_tokens, prepare_grouped
from copybook_rs_spark.operators.packing import pack_sequences
from copybook_rs_spark.operators.verify import hash_mismatched_sources

from copybook_rs_spark.session import get_spark
from copybook_rs_spark.sources.manifest import build_manifest, read_chunks, write_encoded
from copybook_rs_spark.sources.tokens import token_table


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("cbsp-bench", cores=cpus, shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="cbsp_bench_")
    out = os.path.join(tmp, "enc")
    times: dict[str, float] = {}
    try:
        # materialize the input once so job timings measure the engine,
        # not the synthetic derivation
        tok = token_table(spark, sf_dir).cache()
        totals = tok.agg(
            F.count("*").alias("docs"), F.sum("n_tok").alias("tokens")
        ).collect()[0]
        n_docs, n_tokens = int(totals["docs"]), int(totals["tokens"])

        cfg = EncodeConfig()  # production defaults: 64Ki-value chunks, auto codec

        # one-time Python-worker spawn + numpy/pyarrow import (~4 s for 32
        # procs) is process setup, not engine work: warm it on a tiny slice
        # first (criterion-style warmup, BASELINE_METHODOLOGY discipline)
        encode_tokens(tok.limit(2000), cfg).count()

        t = time.perf_counter()
        write_encoded(encode_tokens(tok, cfg), out)
        times["encode_write"] = time.perf_counter() - t

        # steady-state encode (workers warm, no sink) — the criterion-style
        # post-warmup number the scaling receipts use
        t = time.perf_counter()
        encode_tokens(tok, cfg).count()
        times["encode_warm_nosink"] = time.perf_counter() - t

        # zero-shuffle fast path over a pre-grouped layout (the persisted-
        # bucketed-input case at cluster scale; byte-identical chunks)
        grouped = prepare_grouped(tok, cfg).cache()
        grouped.count()
        t = time.perf_counter()
        encode_tokens(grouped, cfg, pregrouped=True).count()
        times["encode_pregrouped_nosink"] = time.perf_counter() - t
        grouped.unpersist()

        chunks = read_chunks(spark, out)
        t = time.perf_counter()
        dec_tokens = decode_tokens(chunks).agg(F.sum("n_tok")).collect()[0][0]
        times["decode"] = time.perf_counter() - t
        assert int(dec_tokens) == n_tokens, "decode token-count mismatch"

        # verify the WRITTEN artifact: decode-from-disk must reproduce every
        # row bit-identically. Scale-path check: per-source exact digest
        # sums (no row shuffle) — see operators/verify.py.
        t = time.perf_counter()
        mismatches = hash_mismatched_sources(tok, decode_tokens(chunks)).count()
        times["verify_written"] = time.perf_counter() - t
        assert mismatches == 0, "verification failed"

        t = time.perf_counter()
        tok.select("source", F.explode("tokens").alias("token")).groupBy(
            "source"
        ).agg(F.min("token"), F.max("token"), F.count("*")).collect()
        times["stats_minmax"] = time.perf_counter() - t

        t = time.perf_counter()
        build_manifest(chunks).collect()
        times["manifest_agg"] = time.perf_counter() - t

        # training-sequence packing over the decoded-equivalent token table
        # (L=2048, distributed prefix sum + slice shuffle) — tracked so the
        # packing stack has a per-round number like encode/decode. Same
        # warmup discipline as encode above: the first pack in a JVM pays
        # ~5 s of one-time codegen/stage setup that is process setup, not
        # engine work (measured: cold 8.1 s vs warm 3.4 s on an idle box)
        pack_sequences(tok.limit(2000), 2048).count()
        t = time.perf_counter()
        packed_tokens = (
            pack_sequences(tok, 2048).agg(F.sum("n_tokens")).collect()[0][0]
        )
        times["pack_sequences"] = time.perf_counter() - t
        assert int(packed_tokens) == n_tokens, "packing token-count mismatch"

        sizes = chunks.agg(
            F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc")
        ).collect()[0]

        # reference encoder bar: parquet dictionary/RLE + zstd on same column
        ref_dir = os.path.join(tmp, "ref_parquet")
        t = time.perf_counter()
        tok.select("doc_id", "tokens").write.mode("overwrite").option(
            "compression", "zstd"
        ).parquet(ref_dir)
        times["ref_parquet_zstd_write"] = time.perf_counter() - t
        ref_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(ref_dir)
            for f in fs
            if f.endswith(".parquet")
        )

        # headline total stays comparable across rounds: it covers exactly
        # the jobs the metric label names; the pack_sequences lane is
        # reported per-query + as pack_tokens_per_sec only
        total = sum(v for k, v in times.items() if k != "pack_sequences")
        result = {
            "metric": "engine e2e sec (encode+write, decode, verify, stats, manifest, ref-parquet)",
            "value": round(total, 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in times.items()},
            "sf": float(sf),
            "cpus": cpus,
            "worker_warmup": True,
            "n_docs": n_docs,
            "n_tokens": n_tokens,
            "encode_tokens_per_sec": round(n_tokens / times["encode_write"]),
            "encode_warm_tokens_per_sec": round(
                n_tokens / times["encode_warm_nosink"]
            ),
            "encode_pregrouped_tokens_per_sec": round(
                n_tokens / times["encode_pregrouped_nosink"]
            ),
            "decode_tokens_per_sec": round(n_tokens / times["decode"]),
            "pack_tokens_per_sec": round(n_tokens / times["pack_sequences"]),
            "bytes_per_token": round(int(sizes["enc"]) / n_tokens, 4),
            "ref_parquet_zstd_bytes_per_token": round(ref_bytes / n_tokens, 4),
        }
        print(json.dumps(result))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
