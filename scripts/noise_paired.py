"""Single-JVM paired noise adjudication for cross-round bench swings.

BENCH_rN.json values come from SEPARATE JVMs run hours apart; this box's
documented cross-run noise floor is ~±15%, and sub-second queries swing
harder. When a query's recorded wall moves between rounds WITHOUT a code
change, the separate-JVM comparison cannot distinguish a regression from
load noise. This harness removes the JVM/load axis: it runs the suspect
queries INTERLEAVED in one process (round-robin ABAB over R rounds, same
page-cache/JIT/thermal state) and reports each query's dispersion. A
cross-round delta inside the same-JVM dispersion envelope is noise; one
far outside it on identical code is real and needs a root cause.

Usage:
    python scripts/noise_paired.py --queries interaction_count simhash \
        decontaminate freq_share_sampled [--rounds 7] [--cpus 32]
Prints one JSON line; the interpretation goes into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--rounds", type=int, default=7)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from metarank_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark("noise-paired", parallelism=args.cpus,
                      shuffle_partitions=args.cpus)
    qs = em.all_queries()
    frames = {n: qs[n](spark, args.sf_dir) for n in args.queries}
    for df in frames.values():  # warmup: JIT/codegen/page cache for all
        df.write.format("noop").mode("overwrite").save()

    samples: dict[str, list[float]] = {n: [] for n in args.queries}
    for _ in range(args.rounds):  # interleaved: drift hits all equally
        for n, df in frames.items():
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples[n].append(time.perf_counter() - t0)
    out = {
        n: {
            "min": round(min(s), 3),
            "median": round(statistics.median(s), 3),
            "max": round(max(s), 3),
            "spread_pct": round((max(s) / min(s) - 1) * 100, 1),
            "samples": [round(x, 3) for x in s],
        }
        for n, s in samples.items()
    }
    print(json.dumps({"cpus": args.cpus, "sf_dir": args.sf_dir,
                      "rounds": args.rounds, "queries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
