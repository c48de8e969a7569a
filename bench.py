"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with total seconds + per-query seconds + derived rows/sec.

Queries are fully materialized via the noop sink (whole plan executes,
nothing is collected to the driver). Usage:

    SPARK_GRAFT_CPUS=32 python bench.py
    python bench.py --cpus 8 --sf-dir /root/testdata/sf0.01  # scaling runs
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "asof_snapshot",
    "window_count_multi",
    "rate_normalized",
    "rate_field_scoped",
    "sessionize",
    "interaction_count",
    "incremental_count",
    "asof_join",
    "bounded_list",
    "trending",
    "tokenize",
    "dedup_minhash",
    "decontaminate",
    "simhash",
    "ann_cosine",
    "ann_lsh",
    "ann_ivf",
    "ngram_match",
    "freq_share_sampled",
    "token_stats",
    "bm25",
    "chunk_tokens",
    "pack_sequences",
    "rank_eval",
    "lm_quality",
    # round-5 additions (cross-round comparisons use the shared prefix)
    "dedup_window",
    "importance_weight",
    "mixture_sample",
]


def run(sf_dir: str, cpus: int, names: list[str] | None = None) -> dict:
    from metarank_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark("metarank-spark-bench", parallelism=cpus, shuffle_partitions=cpus)
    # all_queries includes driver-retired redundant twins — the headline
    # set stays comparable across rounds
    qs = em.all_queries() if hasattr(em, "all_queries") else em.queries()
    names = [n for n in (names or HEADLINE) if n in qs]

    # warmup: small full pipeline to JIT/codegen before timing
    qs[names[0]](spark, sf_dir).limit(1).collect()

    # best-of-N per query: a single timing under incidental machine load
    # can fake a 1.5-2x regression (BENCH_r02 did exactly that); the min
    # of repeated runs is the stable statistic for a deterministic plan
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    per_query: dict[str, float] = {}
    total_rows = 0
    t_all = time.perf_counter()
    for name in names:
        df = qs[name](spark, sf_dir)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        per_query[name] = round(best, 3)
        total_rows += df.count()  # not timed: row accounting for rows/sec
    total = time.perf_counter() - t_all

    # north metric: entity×timestamp feature rows emitted per second of
    # timed query execution (sum of per-query times, excluding the count
    # passes)
    timed = sum(per_query.values())
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    return {
        "metric": "feature_rows_per_sec",
        "value": round(timed, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "rows": total_rows,
        "rows_per_sec": round(total_rows / timed, 1) if timed > 0 else None,
        "cpus": cpus,
        "wall_total_sec": round(total, 3),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()
    print(json.dumps(run(args.sf_dir, args.cpus, args.queries)))
