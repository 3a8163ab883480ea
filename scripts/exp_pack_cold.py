"""Round-6 experiment: where does the FIRST full pack_sequences of a fresh
JVM spend its extra ~2.4 s vs the warm steady state (identical plans)?

Modes (argv[1]):
  anatomy  - fresh JVM, bench-exact warmups, then 5 consecutive timed full
             packs with the narrow phase (prefix-sum jobs) timed separately
             from the main job on each iteration.
  synth    - same, but first run a SYNTHETIC pack (range-generated docs,
             argv[2]=n_docs, argv[3]=toks/doc) after session init; then the
             5 real packs. If t1_real drops toward warm level, the cold cost
             is JIT/codegen warmable without touching real data.
  xms      - anatomy but with spark.driver.extraJavaOptions=-Xms8g
             -XX:+AlwaysPreTouch (heap pre-sizing hypothesis).

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from copybook_rs_spark.config import EncodeConfig
from copybook_rs_spark.operators import encode_tokens
from copybook_rs_spark.operators.packing import pack_sequences
from copybook_rs_spark.sources.tokens import token_table

T: dict = {}


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "anatomy"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if mode == "xms":
        # must be set before the JVM launches -> builder config, not get_spark
        os.environ.setdefault(
            "SPARK_GRAFT_XJAVA", "-Xms8g -XX:+AlwaysPreTouch"
        )
        from pyspark.sql import SparkSession

        local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/cbsp-spark")
        os.makedirs(local_dir, exist_ok=True)
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName("exp-pack-xms")
            .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
            .config("spark.local.dir", local_dir)
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
            .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
            .config("spark.driver.extraJavaOptions", os.environ["SPARK_GRAFT_XJAVA"])
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        from copybook_rs_spark.session import warm_python_workers

        warm_python_workers(spark, cpus)
    else:
        from copybook_rs_spark.session import get_spark

        spark = get_spark("exp-pack", cores=cpus, shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    tok = token_table(spark, sf_dir).cache()
    tok.count()
    cfg = EncodeConfig()
    # bench-exact warmups
    encode_tokens(tok.limit(2000), cfg).count()
    pack_sequences(tok.limit(2000), 2048).count()

    if mode == "synth":
        n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
        tpd = int(sys.argv[3]) if len(sys.argv) > 3 else 48
        t = time.perf_counter()
        synth = spark.range(0, n_docs).select(
            F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
            F.col("id").alias("doc_id"),
            F.sequence(F.lit(1), F.lit(tpd)).alias("tokens"),
            F.lit(tpd).cast("int").alias("n_tok"),
        )
        pack_sequences(synth, 2048).agg(F.sum("n_tokens")).collect()
        T["synth_warm_pack_s"] = round(time.perf_counter() - t, 3)
        T["synth_docs"] = n_docs
        T["synth_tpd"] = tpd

    for i in range(5):
        spark.sparkContext.setJobDescription(f"exp pack iter{i}")
        t0 = time.perf_counter()
        packed = pack_sequences(tok, 2048)
        t1 = time.perf_counter()  # narrow phase ran inside pack_sequences
        total = packed.agg(F.sum("n_tokens")).collect()[0][0]
        t2 = time.perf_counter()
        T[f"iter{i}_narrow_s"] = round(t1 - t0, 3)
        T[f"iter{i}_main_s"] = round(t2 - t1, 3)
        T[f"iter{i}_total_s"] = round(t2 - t0, 3)
        assert total is not None
        spark.sparkContext.setJobDescription(None)

    T["mode"] = mode
    print(json.dumps(T))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
