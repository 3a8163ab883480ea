"""Phase-isolated profiling for the round-6 optimization pass (guide §1.4:
noop-sink isolation; §1.5: labelled jobs). NOT the driver bench — bench.py
stays frozen; this file exists so OPTIMIZATION_r06.md can cite per-phase
numbers for the same jobs bench.py times end-to-end.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
       python bench_extra.py [phase ...]
Phases: encode pack verify decode stats all
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
from copybook_rs_spark.operators import decode_tokens, encode_tokens
from copybook_rs_spark.operators.packing import pack_sequences
from copybook_rs_spark.operators.verify import hash_mismatched_sources
from copybook_rs_spark.plans.partition import plan_salts
from copybook_rs_spark.session import get_spark
from copybook_rs_spark.sources.manifest import (
    build_manifest,
    read_chunks,
    write_encoded,
)
from copybook_rs_spark.sources.tokens import token_table

T: dict[str, float] = {}


def timed(spark, name: str, fn):
    spark.sparkContext.setJobDescription(name)
    t = time.perf_counter()
    out = fn()
    T[name] = round(time.perf_counter() - t, 3)
    spark.sparkContext.setJobDescription(None)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    phases = set(sys.argv[1:]) or {"all"}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("cbsp-bench-extra", cores=cpus, shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="cbsp_bx_")
    out = os.path.join(tmp, "enc")
    try:
        tok = token_table(spark, sf_dir).cache()
        tok.count()
        T["tok_cache_partitions"] = tok.rdd.getNumPartitions()
        cfg = EncodeConfig()
        # mirror bench.py's warmup exactly
        encode_tokens(tok.limit(2000), cfg).count()

        if phases & {"encode", "all"}:
            salts = timed(spark, "encode/plan_salts", lambda: plan_salts(
                tok, cfg.target_values_per_part, cfg.max_salt,
                chunk_floor=cfg.chunk_values))
            timed(spark, "encode/kernel_noop_first", lambda: noop(
                encode_tokens(tok, cfg, salts=salts)))
            timed(spark, "encode/kernel_noop_second", lambda: noop(
                encode_tokens(tok, cfg, salts=salts)))
            timed(spark, "encode/write_encoded_full", lambda: write_encoded(
                encode_tokens(tok, cfg), out))
            # post-write sub-jobs, isolated
            written = read_chunks(spark, out)
            timed(spark, "encode/post_dupcheck", lambda: written.groupBy(
                "chunk_id").count().filter(F.col("count") > 1).limit(1).count())
            timed(spark, "encode/post_manifest", lambda: build_manifest(
                written).write.mode("overwrite").parquet(
                    os.path.join(tmp, "m2")))

        if phases & {"pack", "verify", "decode", "stats", "all"} and not os.path.exists(
            os.path.join(out, "chunks")
        ):
            write_encoded(encode_tokens(tok, cfg), out)

        if phases & {"pack", "all"}:
            # warmup as bench.py does
            pack_sequences(tok.limit(2000), 2048).count()
            timed(spark, "pack/full_agg", lambda: pack_sequences(tok, 2048)
                  .agg(F.sum("n_tokens")).collect())
            timed(spark, "pack/full_noop", lambda: noop(pack_sequences(tok, 2048)))
            # narrow-side only: prefix sum join output without reassembly
            from copybook_rs_spark.operators.packing import _distributed_prefix_sum

            base = tok.select(
                "source", F.col("doc_id").alias("__ord"), "tokens",
                F.size("tokens").cast("long").alias("__len"))
            timed(spark, "pack/prefix_sum_join_noop", lambda: noop(
                _distributed_prefix_sum(base)))
            timed(spark, "pack/prefix_sum_narrow_only", lambda: noop(
                _distributed_prefix_sum(
                    base.select("source", "__ord", F.lit(None).cast("string")
                                .alias("tokens"), "__len"))))

        if phases & {"decode", "all"}:
            chunks = read_chunks(spark, out)
            T["decode_scan_partitions"] = chunks.rdd.getNumPartitions()
            timed(spark, "decode/noop", lambda: noop(decode_tokens(chunks)))
            timed(spark, "decode/agg_as_bench", lambda: decode_tokens(chunks)
                  .agg(F.sum("n_tok")).collect())

        if phases & {"verify", "all"}:
            chunks = read_chunks(spark, out)
            timed(spark, "verify/digest_orig_only", lambda: tok.groupBy("source")
                  .agg(F.count("*"),
                       F.sum(F.xxhash64("doc_id", "tokens", "n_tok", "source")
                             .cast("decimal(38,0)"))).collect())
            timed(spark, "verify/full_as_bench", lambda: hash_mismatched_sources(
                tok, decode_tokens(chunks)).count())

        if phases & {"stats", "all"}:
            timed(spark, "stats/explode_as_bench", lambda: tok.select(
                "source", F.explode("tokens").alias("token")).groupBy("source")
                .agg(F.min("token"), F.max("token"), F.count("*")).collect())

        print(json.dumps(T))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
