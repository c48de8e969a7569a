"""Decompose the measured commit-at-expiry overhead (expiry_paired.py:
+16% @4 threads, +35% @16) into its two ingredients, paired in one JVM:

  A  expiry, anchored formula (default)      — full faithful semantics
  B  expiry, late_types=∅ (monotone formula) — pays the vts payload and
     the commit-order reshuffle of injected rows, but skips the anchor
     (running max + per-period carry) window aggregates. NOT
     semantically faithful (late writes would read wrong buckets) —
     measurement-only.
  C  completion (no vts column at all)       — the cheap ordering

cost(A)-cost(B) = the anchor aggregates; cost(B)-cost(C) = the value-ts
payload + injected-row reordering. Usage:
  python scripts/anchor_decompose.py [--users 1000000] [--cpus 8]
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

def eng(late):
    return FeatureEngine([
        InteractionCount("clicks", "click"),
        WindowCount("cnt7", "click", (7,)),
        Rate("ctr", "click", "impression", (7, 14)),
    ], late_types=late)

from metarank_spark.operators.clickthrough import training_matrix
cpus = {cpus}
spark = get_spark("anchor-decompose", parallelism=cpus, shuffle_partitions=cpus * 4)
ev = spark.read.parquet("/tmp/scaling_events_{users}.parquet")
plans = {{
    "A_expiry_anchored": training_matrix(ev, eng(frozenset({{"impression"}})), commit_at_expiry=True),
    "B_expiry_monotone": training_matrix(ev, eng(frozenset()), commit_at_expiry=True),
    "C_completion": training_matrix(ev, eng(frozenset({{"impression"}})), commit_at_expiry=False),
}}
for tm in plans.values():
    tm.write.format("noop").mode("overwrite").save()  # warmup
best = {{k: None for k in plans}}
for _ in range(2):  # ABC ABC
    for k, tm in plans.items():
        t0 = time.perf_counter()
        tm.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best[k] = dt if best[k] is None or dt < best[k] else best[k]
a, b, c = best["A_expiry_anchored"], best["B_expiry_monotone"], best["C_completion"]
print(json.dumps({{"cpus": cpus,
  "A_expiry_anchored": round(a, 3), "B_expiry_monotone": round(b, 3),
  "C_completion": round(c, 3),
  "anchor_aggregates_pct": round((a / b - 1) * 100, 1),
  "vts_and_reorder_pct": round((b / c - 1) * 100, 1)}}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, nargs="+", default=[8])
    args = ap.parse_args()
    path = f"/tmp/scaling_events_{args.users}.parquet"
    if not os.path.exists(path):
        raise SystemExit(f"run scaling_bench.py first to generate {path}")
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
        print(lines[-1])
    return 0


if __name__ == "__main__":
    sys.exit(main())
