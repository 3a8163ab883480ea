"""Interleaved A/B of the encode hot path between two code versions.

Round-3 VERDICT flagged encode_warm -17% / pregrouped -24% in the driver's
r2->r3 bench comparison — but cross-run bench.py numbers swing +-40% with
host co-tenancy, so the protocol (CLAUDE.md) demands interleaved fresh-JVM
pairs with per-child medians before believing any cross-version delta.

This harness checks out nothing itself: point --a/--b at two repo roots
(e.g. the live repo and a `git worktree add /tmp/r2wt <commit>` checkout).
Each child process imports the engine from ONE root via PYTHONPATH and
measures the exact driver-bench warm protocol: cache the sf token table,
one tiny-slice worker warmup, 2 warmup runs, then --runs timed runs of
encode_tokens(tok, cfg).count() (and the pregrouped variant) with
System.gc() + 0.5 s settle between samples. Children alternate A,B,A,B,...
so host drift hits both sides equally; the report takes per-side medians
of the per-child medians.

Usage:
  git worktree add /tmp/r2wt 8eeb751
  python scripts/ab_encode_versions.py --a /root/repo --b /tmp/r2wt \
      --pairs 3 --runs 5 --cpus 32 --sf-dir /root/testdata/sf0.1
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

_CHILD_SRC = r"""
import json, os, statistics, sys, time

cores = int(os.environ["AB_CORES"])
runs = int(os.environ["AB_RUNS"])
sf_dir = os.environ["AB_SF_DIR"]

from pyspark.sql import functions as F
from copybook_rs_spark.config import EncodeConfig
from copybook_rs_spark.operators.encode import encode_tokens, prepare_grouped
from copybook_rs_spark.session import get_spark
from copybook_rs_spark.sources.tokens import token_table

spark = get_spark("ab-encode", cores=cores, shuffle_partitions=max(cores, 8))
spark.sparkContext.setLogLevel("ERROR")
tok = token_table(spark, sf_dir).cache()
n_tokens = int(tok.agg(F.sum("n_tok")).collect()[0][0])
cfg = EncodeConfig()
encode_tokens(tok.limit(2000), cfg).count()  # python-worker spawn warmup

jvm = spark.sparkContext._jvm

def sample(fn, n):
    fn(); fn()  # 2 warmups
    out = []
    for _ in range(n):
        jvm.System.gc(); time.sleep(0.5)
        t = time.perf_counter(); fn(); out.append(time.perf_counter() - t)
    return out

warm = sample(lambda: encode_tokens(tok, cfg).count(), runs)
grouped = prepare_grouped(tok, cfg).cache(); grouped.count()
pre = sample(lambda: encode_tokens(grouped, cfg, pregrouped=True).count(), runs)
enc_bytes = int(encode_tokens(tok, cfg).agg(F.sum("enc_bytes")).collect()[0][0])
spark.stop()
print("CHILD_RESULT " + json.dumps({
    "n_tokens": n_tokens,
    "warm_samples": [round(s, 3) for s in warm],
    "warm_median": round(statistics.median(warm), 3),
    "warm_tok_s": round(n_tokens / statistics.median(warm)),
    "pre_samples": [round(s, 3) for s in pre],
    "pre_median": round(statistics.median(pre), 3),
    "pre_tok_s": round(n_tokens / statistics.median(pre)),
    "bytes_per_token": round(enc_bytes / n_tokens, 4),
}))
"""


def run_child(root: str, cpus: int, runs: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        PYTHONPATH=root,
        SPARK_DRIVER_MEM="24g",
        AB_CORES=str(cpus),
        AB_RUNS=str(runs),
        AB_SF_DIR=sf_dir,
    )
    out = subprocess.run(
        [sys.executable, "-c", _CHILD_SRC],
        capture_output=True, text=True, env=env, cwd=root, timeout=3000,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(
        f"child ({root}) failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="repo root for side A (current)")
    ap.add_argument("--b", required=True, help="repo root for side B (baseline)")
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    res = {"a": [], "b": []}
    for i in range(args.pairs):
        for side, root in (("a", args.a), ("b", args.b)):
            t = time.time()
            r = run_child(root, args.cpus, args.runs, args.sf_dir)
            res[side].append(r)
            print(
                f"pair {i + 1} side {side} ({root}): warm {r['warm_tok_s']:,} "
                f"tok/s {r['warm_samples']}, pregrouped {r['pre_tok_s']:,} "
                f"tok/s {r['pre_samples']}, b/tok {r['bytes_per_token']} "
                f"[{time.time() - t:.0f}s]",
                flush=True,
            )

    def med(side, key):
        return statistics.median(x[key] for x in res[side])

    summary = {
        "metric": "encode A/B (interleaved fresh-JVM pairs, median of medians)",
        "pairs": args.pairs,
        "runs_per_child": args.runs,
        "cpus": args.cpus,
        "sf_dir": args.sf_dir,
        "a_root": args.a,
        "b_root": args.b,
        "warm_tok_s": {"a": med("a", "warm_tok_s"), "b": med("b", "warm_tok_s")},
        "pre_tok_s": {"a": med("a", "pre_tok_s"), "b": med("b", "pre_tok_s")},
        "warm_ratio_a_over_b": round(med("a", "warm_tok_s") / med("b", "warm_tok_s"), 3),
        "pre_ratio_a_over_b": round(med("a", "pre_tok_s") / med("b", "pre_tok_s"), 3),
        "bytes_per_token": {"a": med("a", "bytes_per_token"), "b": med("b", "bytes_per_token")},
        "all_warm_tok_s": {k: [x["warm_tok_s"] for x in v] for k, v in res.items()},
        "all_pre_tok_s": {k: [x["pre_tok_s"] for x in v] for k, v in res.items()},
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
