"""One-off config experiment: warm encode throughput under a Spark conf.

Usage: python scripts/exp_conf.py '{"spark.io.compression.codec":"zstd"}' [batch]
Prints one JSON line with warm median.
"""
from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession, functions as F

from copybook_rs_spark.config import EncodeConfig
from copybook_rs_spark.operators import encode_tokens
from copybook_rs_spark.sources.tokens import token_table


def main() -> None:
    extra = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/cbsp-spark")
    os.makedirs(local_dir, exist_ok=True)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("exp")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.local.dir", local_dir)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in extra.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    tok = token_table(spark, sf_dir).cache()
    n_tokens = int(tok.agg(F.sum("n_tok")).collect()[0][0])
    cfg = EncodeConfig()
    samples = []
    for i in range(8):  # 2 warmup + 6 timed
        t = time.perf_counter()
        encode_tokens(tok, cfg).count()
        dt = time.perf_counter() - t
        if i >= 2:
            samples.append(dt)
        spark.sparkContext._jvm.System.gc()
    med = sorted(samples)[len(samples) // 2]
    print(json.dumps({
        "conf": extra, "median_s": round(med, 3),
        "tokens_per_sec": round(n_tokens / med),
        "samples": [round(s, 3) for s in samples],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
