"""Paired expiry-anchor isolation: time commit-at-expiry and
commit-at-completion ALTERNATELY inside one JVM (ABAB, best-of-2 per
mode) at each parallelism level. The separate-ladder comparison
(scaling_bench.py --isolate-expiry) is dominated by cross-JVM load
variance on this shared box (±15% between widely separated runs); pairing
the modes in one process under the same page-cache/thermal state isolates
the anchor machinery's true cost at each level.

Usage: python scripts/expiry_paired.py [--users 1000000] [--cpus 4 16]
Prints one JSON line; interpretation goes into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from metarank_spark.session import get_spark
from metarank_spark.engine import FeatureEngine, InteractionCount, Rate, WindowCount
from metarank_spark.operators.clickthrough import training_matrix

cpus = {cpus}
spark = get_spark("expiry-paired", parallelism=cpus, shuffle_partitions=cpus * 4)
ev = spark.read.parquet("/tmp/scaling_events_{users}.parquet")
engine = FeatureEngine([
    InteractionCount("clicks", "click"),
    WindowCount("cnt7", "click", (7,)),
    Rate("ctr", "click", "impression", (7, 14)),
])
plans = {{
    "expiry": training_matrix(ev, engine, commit_at_expiry=True),
    "completion": training_matrix(ev, engine, commit_at_expiry=False),
}}
for tm in plans.values():  # warmup both (JIT/codegen/page cache)
    tm.write.format("noop").mode("overwrite").save()
best = {{k: None for k in plans}}
for _ in range(2):  # ABAB: drift hits both modes equally
    for k, tm in plans.items():
        t0 = time.perf_counter()
        tm.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best[k] = dt if best[k] is None or dt < best[k] else best[k]
print(json.dumps({{"cpus": cpus,
                   "expiry_sec": round(best["expiry"], 3),
                   "completion_sec": round(best["completion"], 3),
                   "anchor_overhead": round(
                       best["expiry"] / best["completion"] - 1, 4)}}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, nargs="+", default=[4, 16])
    args = ap.parse_args()
    path = f"/tmp/scaling_events_{args.users}.parquet"
    if not os.path.exists(path):
        raise SystemExit(f"run scaling_bench.py first to generate {path}")
    out = []
    for c in args.cpus:
        r = subprocess.run(
            [sys.executable, "-c",
             CHILD.format(repo=REPO, cpus=c, users=args.users)],
            capture_output=True, text=True, timeout=3600,
            env={**os.environ, "SPARK_GRAFT_CPUS": str(c)},
        )
        lines = [ln for ln in r.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if not lines:
            raise RuntimeError(f"child failed:\n{r.stderr[-3000:]}")
        out.append(json.loads(lines[-1]))
        print(out[-1])
    print(json.dumps({"paired": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
