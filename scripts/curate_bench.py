"""Curation-pipeline scaling ladder: run jobs/curate.py's DAG on a
deterministically expanded document corpus at two local parallelism
levels (the sandbox stand-in for N vs 4N executors), report tokens/sec
at both + scaling efficiency, and append a BENCH/BASELINE.md section.

The corpus is the sf0.1 documents table replicated ``--factor`` times
with a per-replica marker word appended (deterministic, and the marker
keeps replicas out of EXACT-dup collapse so every stage does real work;
near-dup LSH still finds the replicas as clusters, which is the
realistic hard case for the dedup stages). Each level runs in its own
subprocess (fresh JVM) on the byte-identical parquet; fresh output dir
per level so no stage resumes.

Usage: python scripts/curate_bench.py [--factor 40] [--low 8 --high 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from metarank_spark.session import get_spark
spark = get_spark("curate-gen", parallelism=32)
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
reps = spark.range({factor}).select(F.col("id").alias("rep"))
big = (docs.crossJoin(reps)
    .select(
        (F.col("doc_id") * {factor} + F.col("rep")).alias("doc_id"),
        F.concat_ws(" ", F.col("text"),
                    F.concat(F.lit("replica"), F.col("rep"))).alias("text"),
        "source"))
big.repartition(64).write.mode("overwrite").parquet({corpus!r})
print("GENERATED", big.count())
"""

CHILD = r"""
import json, shutil, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from metarank_spark.session import get_spark
from metarank_spark.operators.curate import CurateParams, curate

cpus = {cpus}
spark = get_spark("curate-bench", parallelism=cpus, shuffle_partitions=cpus * 4)
docs = spark.read.parquet({corpus!r})
p = CurateParams(min_tokens=3, max_rep=0.9, near_threshold=0.5,
                 benchmark_ids=("0", "1", "2"), pack_budget=2048,
                 checkpoint_stages={ckpt!r})
out = "/tmp/curate_bench_out_{cpus}"
shutil.rmtree(out, ignore_errors=True)
t0 = time.perf_counter()
ms = curate(spark, docs, out, p)
wall = time.perf_counter() - t0
toks_in = ms[0]["tokens"]
print("RESULT " + json.dumps({{
    "cpus": cpus, "wall_sec": round(wall, 3),
    "docs_in": ms[0]["rows"], "tokens_in": toks_in,
    "docs_out": ms[-1]["rows"], "tokens_out": ms[-1]["tokens"],
    "tokens_per_sec": round(toks_in / wall, 1),
    "stage_walls": {{m["range_id"].rsplit(":", 1)[-1]: m["wall_sec"]
                     for m in ms}},
}}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=40)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--full-materialize", action="store_true",
                    help="materialize every stage (default: fused — "
                         "checkpoints at tokenize/dedup_near/pack only)")
    ap.add_argument("--write-md", action="store_true")
    args = ap.parse_args()
    ckpt = () if args.full_materialize else ("tokenize", "dedup_near")
    corpus = f"/tmp/curate_bench_docs_{args.factor}.parquet"

    if not os.path.isdir(corpus):
        r = subprocess.run(
            [sys.executable, "-c",
             GEN.format(repo=REPO, factor=args.factor, corpus=corpus)],
            capture_output=True, text=True)
        if "GENERATED" not in r.stdout:
            print(r.stdout, r.stderr)
            return 1
        print(r.stdout.strip().splitlines()[-1])

    results = {}
    for cpus in (args.low, args.high):
        r = subprocess.run(
            [sys.executable, "-c",
             CHILD.format(repo=REPO, cpus=cpus, corpus=corpus, ckpt=ckpt)],
            capture_output=True, text=True)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("RESULT ")), None)
        if line is None:
            print(r.stdout[-3000:], r.stderr[-3000:])
            return 1
        results[cpus] = json.loads(line[len("RESULT "):])
        print(json.dumps(results[cpus]))

    lo, hi = results[args.low], results[args.high]
    eff = (hi["tokens_per_sec"] / lo["tokens_per_sec"]) / (args.high / args.low)
    summary = {
        "low_cpus": args.low, "high_cpus": args.high,
        "low_tokens_per_sec": lo["tokens_per_sec"],
        "high_tokens_per_sec": hi["tokens_per_sec"],
        "efficiency": round(eff, 3),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
