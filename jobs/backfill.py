"""spark-submit entry point: checkpointed feature backfill.

Usage (local or cluster — on a cluster drop the --master and let
spark-submit decide):

    python -m zipfile -c /tmp/metarank_spark.zip metarank_spark
    spark-submit --driver-memory 16g --py-files /tmp/metarank_spark.zip \
        jobs/backfill.py \
        --events /path/events.parquet --output /path/features \
        --n-ranges 64 [--synthetic-users 100000] [--features features.json]

(local mode runs executors inside the driver JVM — size --driver-memory
accordingly; spark.driver.memory set in-session is ignored by a launched
JVM.)

Features come from a JSON list of {type: ..., ...kwargs} mirroring the
reference's YAML config (model/FeatureSchema.scala:44-75). The job prints
one JSON line per completed range (the lineage manifest) and a final
summary line; a killed job rerun with the same args resumes.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


FEATURE_TYPES = None  # populated after imports (spark-submit path setup)


def parse_features(spec: list[dict]):
    from metarank_spark import engine as E

    types = {
        "window_count": E.WindowCount,
        "interaction_count": E.InteractionCount,
        "rate": E.Rate,
        "number": E.Number,
        "boolean": E.Boolean,
        "string": E.StringEncode,
        "item_age": E.ItemAge,
        "word_count": E.WordCount,
        "relevancy": E.Relevancy,
        "position": E.Position,
        "interacted_with": E.InteractedWith,
        "local_time": E.LocalTime,
        "vector": E.Vector,
        "stats": E.Stats,
        "freq": E.Freq,
        "recent_items": E.RecentItems,
        "diversity": E.Diversity,
        "map": E.MapFeature,
        "random": E.RandomFeature,
    }
    out = []
    for f in spec:
        f = dict(f)
        t = f.pop("type")
        for k in ("periods", "values", "fields", "reducers", "percentiles"):
            if k in f and isinstance(f[k], list):
                f[k] = tuple(f[k])
        out.append(types[t](**f))
    return out


DEFAULT_FEATURES = [
    {"type": "interaction_count", "name": "clicks", "interaction": "click"},
    {"type": "window_count", "name": "cnt7", "interaction": "click", "periods": [7]},
    {"type": "rate", "name": "ctr", "top": "click", "bottom": "impression", "periods": [7, 14]},
]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", help="parquet path of canonical events")
    ap.add_argument("--table", help="catalog table of canonical events "
                    "(bucketed tables elide the write-fold shuffle — "
                    "sources/tables.write_events_table; needs a shared "
                    "metastore/Iceberg catalog, or same-session tables "
                    "with Spark's in-memory catalog)")
    ap.add_argument("--synthetic-users", type=int, default=0,
                    help="generate synthetic ranklens events instead of reading --events")
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-ranges", type=int, default=16)
    ap.add_argument("--entity", default="user_id")
    ap.add_argument("--features", help="JSON file with feature specs")
    ap.add_argument("--config", help="reference-style Metarank YAML config "
                    "(the features: section; model/FeatureSchema.scala:41-80)")
    ap.add_argument("--cpus", type=int, default=None, help="local[N] when not on a cluster")
    ap.add_argument("--materialize-input", action="store_true",
                    help="stage events once as a bucketed+sorted table before the range loop")
    ap.add_argument("--hot-chunk-ms", type=int, default=0,
                    help="salt per-entity windows by floor(ts/chunk) with "
                         "exact reassembly — spreads a hot entity's "
                         "timeline over timeline/chunk tasks (0 = off)")
    ap.add_argument("--hot-auto-share", type=float, default=0.0,
                    help="with --hot-chunk-ms: detect hot entities holding "
                         "at least this share of events (sampled "
                         "heavy-hitter scan) instead of salting every key")
    ap.add_argument("--materialize-series", action="store_true",
                    help="two-phase: fold each scope group's write-value series once, "
                         "then run assembly-only per range")
    ap.add_argument("--snapshot-out",
                    help="build an incremental-backfill snapshot of the "
                         "input events at --snapshot-t0 and write it here "
                         "(operators/incremental.py), then exit — the "
                         "once-per-checkpoint pass that makes later "
                         "deltas fold in O(delta + horizon)")
    ap.add_argument("--snapshot-t0", type=int,
                    help="epoch-ms history cut for --snapshot-out")
    ap.add_argument("--from-snapshot",
                    help="incremental mode: treat the input events as the "
                         "DELTA (ts > snapshot t0), fold them on the "
                         "snapshot at this path, and write the delta's "
                         "training matrix to --output — bit-identical to "
                         "a full-history replay restricted to the delta")
    ap.add_argument("--roll-to", type=int,
                    help="with --from-snapshot AND --snapshot-out: advance "
                         "the snapshot to this epoch-ms cut using only "
                         "tail ∪ delta (no full-history rescan) and write "
                         "it to --snapshot-out, then exit")
    args = ap.parse_args(argv)

    from metarank_spark.checkpoint import backfill, load_manifests
    from metarank_spark.datagen import synthetic_ranklens
    from metarank_spark.engine import FeatureEngine
    from metarank_spark.session import get_spark

    spark = get_spark("metarank-backfill", parallelism=args.cpus)
    if args.synthetic_users:
        events = synthetic_ranklens(spark, users=args.synthetic_users)
    elif args.table:
        events = spark.table(args.table)
    elif args.events:
        events = spark.read.parquet(args.events)
    else:
        ap.error("need --events, --table or --synthetic-users")

    hot_entities = None
    if args.hot_chunk_ms and args.hot_auto_share:
        from metarank_spark.plans.prefix import detect_hot_entities

        hot_entities = detect_hot_entities(
            events, args.entity, min_share=args.hot_auto_share
        ) or None
        print(json.dumps({"hot_entities": hot_entities}))

    if args.config:
        from metarank_spark.config import load_config

        cfg = load_config(args.config)
        kw = cfg.engine_kwargs()
        if args.hot_chunk_ms:  # CLI flags override the engine: section
            kw["hot_chunk_ms"] = args.hot_chunk_ms
        if hot_entities:
            kw["hot_entities"] = hot_entities
        engine = FeatureEngine(cfg.features, **kw)
    else:
        spec = DEFAULT_FEATURES
        if args.features:
            with open(args.features) as fh:
                spec = json.load(fh)
        engine = FeatureEngine(parse_features(spec),
                               hot_chunk_ms=args.hot_chunk_ms or None,
                               hot_entities=hot_entities)

    if args.roll_to is not None:
        if not (args.from_snapshot and args.snapshot_out):
            ap.error("--roll-to needs --from-snapshot and --snapshot-out")
        from metarank_spark.operators.incremental import (
            load_snapshot,
            roll_snapshot,
            save_snapshot,
        )

        t0 = time.perf_counter()
        snap = load_snapshot(spark, args.from_snapshot)
        rolled = roll_snapshot(snap, events, args.roll_to, engine)
        save_snapshot(rolled, args.snapshot_out)
        print(json.dumps({
            "rolled": args.snapshot_out,
            "from_t0_ms": snap.t0_ms,
            "t0_ms": rolled.t0_ms,
            "tail_rows": rolled.tail.count(),
            "wall_sec": round(time.perf_counter() - t0, 3),
        }))
        return 0

    if args.snapshot_out:
        if args.snapshot_t0 is None:
            ap.error("--snapshot-out needs --snapshot-t0 (epoch ms)")
        from metarank_spark.operators.incremental import (
            save_snapshot,
            snapshot,
        )

        t0 = time.perf_counter()
        snap = snapshot(events, args.snapshot_t0, engine)
        save_snapshot(snap, args.snapshot_out)
        print(json.dumps({
            "snapshot": args.snapshot_out,
            "t0_ms": snap.t0_ms,
            "horizon_ms": snap.horizon_ms,
            "tail_rows": snap.tail.count(),
            "offset_features": sorted(snap.offsets),
            "wall_sec": round(time.perf_counter() - t0, 3),
        }))
        return 0

    if args.from_snapshot:
        from pyspark.sql import functions as F

        from metarank_spark.operators.incremental import (
            incremental_training_matrix,
            load_snapshot,
        )

        t0 = time.perf_counter()
        snap = load_snapshot(spark, args.from_snapshot)
        delta = events.filter(F.col("ts_ms") > snap.t0_ms)
        out = incremental_training_matrix(snap, delta, engine)
        out.write.mode("overwrite").parquet(args.output)
        rows = spark.read.parquet(args.output).count()
        wall = round(time.perf_counter() - t0, 3)
        print(json.dumps({
            "incremental": True, "t0_ms": snap.t0_ms, "rows": rows,
            "wall_sec": wall,
            "rows_per_sec": round(rows / wall, 1) if wall else None,
        }))
        return 0

    completed = backfill(
        events, engine, args.output, n_ranges=args.n_ranges, entity=args.entity,
        materialize_input=args.materialize_input,
        materialize_series=args.materialize_series,
    )
    for m in completed:
        print(json.dumps(m))
    all_m = {
        k: m for k, m in load_manifests(args.output).items()
        if isinstance(k, int) and k >= 0
    }
    total_rows = sum(m["rows"] for m in all_m.values())
    total_sec = sum(m["wall_sec"] for m in all_m.values())
    print(json.dumps({
        "summary": True,
        "ranges_total": len(all_m),
        "ranges_this_run": len(completed),
        "rows": total_rows,
        "wall_sec": round(total_sec, 3),
        "rows_per_sec": round(total_rows / total_sec, 1) if total_sec else None,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
