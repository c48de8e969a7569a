"""Hot-entity skew bench — two modes:

--mode carry (default): benches the merged scan's as-of carry operator
  directly (run_merged with a scalar feature) on a synthetic frame where
  one entity holds --hot-frac of all rows. This is the event-scale stage
  hot-entity salting targets: at 10^12 rows the carry IS the job, and a
  hot key's whole timeline otherwise sorts+folds in ONE task.

--mode engine: full FeatureEngine.ranking_values on skewed synthetic
  ranklens events (counters + periodic rates, composed hot series). At
  small single-box volumes the carry is a minor slice of wall-clock, so
  expect parity here — the mode exists to show the salted path costs
  nothing end-to-end while removing the single-task ceiling.

Representative run (this box, 16 cores, 24M rows, hot-frac 0.6,
chunk=1d): carry plain 44.1s vs salted 7.6-11.2s (~4-6x) — the plain
tail is the hot entity's single sort+window task and grows linearly with
hot volume; the salted path spreads it over timeline/chunk tasks.

Usage: python scripts/hot_entity_bench.py [--mode carry|engine]
       [--rows 24000000 | --users 400000] [--hot-frac 0.6] [--cpus 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DAY = 86_400_000
T0 = 1_700_000_000_000


def _time(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def bench_carry(spark, args):
    from pyspark.sql import functions as F

    from metarank_spark.operators.merge import MergedFeature, run_merged

    n = args.rows
    hot_pm = int(args.hot_frac * 10)
    base = spark.range(n).select(
        F.when(F.pmod("id", F.lit(10)) < hot_pm, F.lit("hot"))
        .otherwise(F.concat(F.lit("u"), F.pmod(F.xxhash64("id"), F.lit(200_000))))
        .alias("entity"),
        (F.lit(T0) + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(60 * DAY))).alias("ts_ms"),
        F.col("id").alias("seq"),
        (F.pmod("id", F.lit(8)) == 0).alias("is_write"),
        F.col("id").cast("double").alias("val"),
    )
    writes = base.filter("is_write").select("entity", "ts_ms", "seq", "val")
    queries = base.filter(~F.col("is_write")).select(
        "entity", "ts_ms", "seq", F.col("seq").alias("qid")
    )
    feat = MergedFeature(
        "last_val",
        {"lv": F.when(F.col("__side") == 1, F.col("val"))},
        lambda c: F.coalesce(c["lv"], F.lit(float("nan"))),
    )

    def mk(**kw):
        return run_merged(queries, writes, "entity", [feat], ["qid"], **kw)

    return mk(), mk(salt_chunk_ms=args.chunk_days * DAY, hot_entities=["hot"]), n


def bench_engine(spark, args):
    from pyspark.sql import functions as F

    from metarank_spark.datagen import synthetic_ranklens
    from metarank_spark.engine import (
        FeatureEngine, InteractionCount, Rate, WindowCount,
    )

    ev = synthetic_ranklens(spark, users=args.users)
    hot = (
        F.pmod(F.xxhash64("user_id"), F.lit(1000)) < int(args.hot_frac * 1000)
    ) & F.col("user_id").isNotNull()
    skewed = ev.withColumn(
        "user_id", F.when(hot, F.lit("u_hot")).otherwise(F.col("user_id"))
    )
    path = f"/tmp/hot_entity_events_{args.users}.parquet"
    skewed.repartition(64).write.mode("overwrite").parquet(path)
    ev = spark.read.parquet(path)

    def feats():
        return [
            InteractionCount("clicks", "click"),
            WindowCount("cnt7", "click", (7,)),
            Rate("ctr", "click", "impression", (7, 14)),
        ]

    plain = FeatureEngine(feats()).ranking_values(ev)
    salted = FeatureEngine(
        feats(), hot_chunk_ms=args.chunk_days * DAY, hot_entities=["u_hot"]
    ).ranking_values(ev)
    return plain, salted, args.users * 2 * 12


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("carry", "engine"), default="carry")
    ap.add_argument("--rows", type=int, default=24_000_000)
    ap.add_argument("--users", type=int, default=400_000)
    ap.add_argument("--hot-frac", type=float, default=0.6)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--chunk-days", type=int, default=1)
    args = ap.parse_args()

    from metarank_spark.session import get_spark

    spark = get_spark("hot-entity-bench", parallelism=args.cpus,
                      shuffle_partitions=args.cpus * 4)
    plain, salted, rows = (
        bench_carry(spark, args) if args.mode == "carry"
        else bench_engine(spark, args)
    )
    _time(plain)  # JVM/codegen warmup
    times: dict[str, list[float]] = {"plain": [], "salted": []}
    for order in ((("plain", plain), ("salted", salted)),
                  (("salted", salted), ("plain", plain))):
        for name, df in order:
            times[name].append(_time(df))
    out = {
        "mode": args.mode, "hot_frac": args.hot_frac, "cpus": args.cpus,
        "chunk_days": args.chunk_days, "rows": rows,
        "plain_sec": round(min(times["plain"]), 3),
        "salted_sec": round(min(times["salted"]), 3),
        "speedup": round(min(times["plain"]) / min(times["salted"]), 3),
        "all_times": {k: [round(x, 3) for x in v] for k, v in times.items()},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
