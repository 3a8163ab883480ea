"""Two-parallelism scaling receipt (north rule: throughput at N and 4N
workers, efficiency = (T_4N / T_N) / 4 >= 0.8; no real cluster in this
sandbox, so parallelism levels are local[N] vs local[4N] cores — each level
in a fresh JVM subprocess).

Methodology mirrors the reference's criterion discipline
(tools/copybook-bench/BASELINE_METHODOLOGY.md: warmup + repeated samples,
median reported): per level, one warmup run (JIT + python-worker spawn),
then --runs timed runs of the same encode job, median taken. The input is
the deterministic sf-dir token table replicated --rep times (distinct
doc_ids), cached before timing so the job measures the engine, not parquet
reads. Also records the cross-level chunk-table content hash (must be
identical — crates/copybook-codec/src/processor.rs:1298 analogue).

Usage: python scripts/scaling_bench.py [--n 8] [--rep 4] [--runs 3]
Writes receipts to BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import statistics
import subprocess
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(cores: int, rep: int, runs: int, sf_dir: str, job: str = "encode") -> None:
    from pyspark.sql import functions as F

    from copybook_rs_spark.config import EncodeConfig
    from copybook_rs_spark.operators.encode import encode_tokens
    from copybook_rs_spark.plans.partition import plan_salts
    from copybook_rs_spark.session import get_spark
    from copybook_rs_spark.sources.tokens import token_table

    spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    tok = token_table(spark, sf_dir)
    if rep > 1:
        tok = tok.withColumn(
            "rep", F.explode(F.array(*[F.lit(i) for i in range(rep)]))
        ).withColumn(
            "doc_id", F.concat_ws("_", F.col("doc_id"), F.col("rep"))
        ).drop("rep")
    tok = tok.cache()
    totals = tok.agg(F.count("*"), F.sum("n_tok")).collect()[0]
    n_docs, n_tokens = int(totals[0]), int(totals[1])
    cfg = EncodeConfig()
    salts = plan_salts(tok, cfg.target_values_per_part, cfg.max_salt)

    import shutil
    import tempfile

    from copybook_rs_spark.operators.decode import decode_tokens

    # warmups (python workers, codegen); also grab the content hash
    chunks = encode_tokens(tok, cfg, salts=salts)
    rows = chunks.select("chunk_id", "crc32", "n_values", "codec").collect()
    canon = sorted((r[0], r[1], r[2], r[3]) for r in rows)
    content_hash = hashlib.sha256(repr(canon).encode()).hexdigest()
    enc_bytes = int(chunks.agg(F.sum("enc_bytes")).collect()[0][0])
    tmpdir = None
    if job == "decode":
        tmpdir = tempfile.mkdtemp(prefix="cbsp_scale_", dir="/dev/shm")
        encode_tokens(tok, cfg, salts=salts).write.parquet(tmpdir + "/chunks")
        src = spark.read.parquet(tmpdir + "/chunks")

        def run_job():
            decode_tokens(src).count()
    else:
        def run_job():
            encode_tokens(tok, cfg, salts=salts).count()

    run_job()  # second warmup
    jvm = spark.sparkContext._jvm
    samples = []
    for _ in range(runs):
        jvm.System.gc()  # drop accumulated shuffle files / old gen
        time.sleep(0.5)
        t = time.perf_counter()
        run_job()
        samples.append(time.perf_counter() - t)
    spark.stop()
    if tmpdir:
        shutil.rmtree(tmpdir, ignore_errors=True)
    print(
        "CHILD_RESULT "
        + json.dumps(
            {
                "cores": cores,
                "job": job,
                "n_docs": n_docs,
                "n_tokens": n_tokens,
                "samples_sec": [round(s, 3) for s in samples],
                "median_sec": round(statistics.median(samples), 3),
                "tokens_per_sec": round(n_tokens / statistics.median(samples)),
                "content_hash": content_hash,
                "enc_bytes": enc_bytes,
                "bytes_per_token": round(enc_bytes / n_tokens, 4),
            }
        )
    )


def run_child(
    cores: int, rep: int, runs: int, sf_dir: str, job: str, pin: bool = False
) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_DRIVER_MEM="24g")
    cmd = [
        sys.executable, os.path.abspath(__file__),
        "--child", "--cores", str(cores), "--rep", str(rep),
        "--runs", str(runs), "--sf-dir", sf_dir, "--job", job,
    ]
    if pin:
        # Bind the WHOLE process tree (JVM + python workers) to exactly
        # `cores` physical CPUs. Without this, local[N] overstates the N
        # baseline: the python worker and the JVM are separate processes, so
        # a "1-core" run really consumes ~2 cores of concurrent work, and a
        # 4N run at high N oversubscribes the socket. Pinning makes each
        # level an honest fixed-size-executor emulation.
        cmd = ["taskset", "-c", f"0-{cores - 1}" if cores > 1 else "0"] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3000,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(f"child (cores={cores}) failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cores", type=int, default=0)
    ap.add_argument("--n", type=int, default=8, help="small level N (big = 4N)")
    ap.add_argument("--rep", type=int, default=4)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--job", choices=["encode", "decode"], default="encode")
    ap.add_argument(
        "--pin", action="store_true",
        help="taskset each level to exactly N / 4N CPUs (fixed-size-executor emulation)",
    )
    ap.add_argument(
        "--pairs", type=int, default=1,
        help="interleave this many N/4N child pairs (fresh JVM each) and take "
        "the median per level — defends against host-level noise drift "
        "between sequential runs",
    )
    args = ap.parse_args()
    if not args.child and args.n < 1:
        ap.error("--n must be >= 1")
    if args.child and args.cores < 1:
        ap.error("--cores must be >= 1 in child mode")
    if args.child:
        child(args.cores, args.rep, args.runs, args.sf_dir, args.job)
        return

    smalls, bigs = [], []
    for _ in range(args.pairs):
        smalls.append(
            run_child(args.n, args.rep, args.runs, args.sf_dir, args.job, args.pin)
        )
        bigs.append(
            run_child(4 * args.n, args.rep, args.runs, args.sf_dir, args.job, args.pin)
        )
    small = min(smalls, key=lambda r: abs(
        r["tokens_per_sec"] - statistics.median(x["tokens_per_sec"] for x in smalls)
    ))
    big = min(bigs, key=lambda r: abs(
        r["tokens_per_sec"] - statistics.median(x["tokens_per_sec"] for x in bigs)
    ))
    if args.pairs > 1:
        small = dict(small, all_tokens_per_sec=[x["tokens_per_sec"] for x in smalls])
        big = dict(big, all_tokens_per_sec=[x["tokens_per_sec"] for x in bigs])
    eff = (big["tokens_per_sec"] / small["tokens_per_sec"]) / 4
    det = small["content_hash"] == big["content_hash"]
    result = {
        "metric": f"{args.job} scaling efficiency (N vs 4N cores"
        + (", CPU-pinned)" if args.pin else ")"),
        "pinned": args.pin,
        "N": args.n,
        "n_tokens": small["n_tokens"],
        "tokens_per_sec_N": small["tokens_per_sec"],
        "tokens_per_sec_4N": big["tokens_per_sec"],
        "efficiency": round(eff, 3),
        "pass": eff >= 0.8,
        "deterministic_across_levels": det,
        "bytes_per_token": small["bytes_per_token"],
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    lines = [
        f"\n## Scaling receipt ({args.job}) — {stamp}\n",
        f"Input: {args.sf_dir} token table × {args.rep} replicas "
        f"= {small['n_docs']:,} docs / {small['n_tokens']:,} tokens (cached); "
        f"{args.job} job (salt plan fixed, auto codec, 64Ki-value chunks); "
        f"1 warmup + {args.runs} timed runs per level, median reported "
        f"(criterion-style, cf. reference BASELINE_METHODOLOGY.md); "
        + (
            "each level CPU-pinned (taskset) to exactly its core count — "
            "fixed-size-executor emulation.\n"
            if args.pin
            else "unpinned (JVM + python workers float across the socket).\n"
        ),
        "| level | cores | samples (s) | median (s) | tokens/s |",
        "|---|---|---|---|---|",
        f"| N | {small['cores']} | {small['samples_sec']} | {small['median_sec']} | {small['tokens_per_sec']:,} |",
        f"| 4N | {big['cores']} | {big['samples_sec']} | {big['median_sec']} | {big['tokens_per_sec']:,} |",
        "",
        f"- scaling efficiency (T_4N/T_N)/4 = **{eff:.3f}** "
        f"({'PASS' if eff >= 0.8 else 'FAIL'} vs the >= 0.8 north-rule gate)",
        *(
            [
                f"- interleaved {args.pairs} fresh-JVM pairs (median per level): "
                f"N={small.get('all_tokens_per_sec')} "
                f"4N={big.get('all_tokens_per_sec')} tok/s"
            ]
            if args.pairs > 1
            else []
        ),
        f"- chunk-table content hash identical across levels: **{det}** "
        f"(`{small['content_hash'][:16]}…`)",
        f"- compressed size: {small['bytes_per_token']} bytes/token",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
