"""spark-submit entry point: events → training dataset export.

The reference's `metarank export` workflow (main/command/Export.scala:28-77)
as one job: read/generate the canonical event stream, assemble the
clickthrough training matrix (impression injection + feature snapshots +
labels), split train/test, and write LibSVM (XGBoost), CSV (LightGBM) or
parquet:

    python -m zipfile -c /tmp/metarank_spark.zip metarank_spark
    spark-submit --driver-memory 16g --py-files /tmp/metarank_spark.zip \
        jobs/export_dataset.py \
        --events /path/events.parquet --output /path/dataset \
        --format libsvm [--config features.yaml] [--split hold_last]

Outputs land under <output>/train and <output>/test plus a dataset.json
descriptor (feature names, dense widths, row counts — the DatasetDescriptor
analog, ml/Dataset parity boundary).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", help="parquet path of canonical events")
    ap.add_argument("--table", help="catalog table of canonical events")
    ap.add_argument("--synthetic-users", type=int, default=0)
    ap.add_argument("--output", required=True)
    ap.add_argument("--format", choices=("libsvm", "csv", "parquet"),
                    default="libsvm")
    ap.add_argument("--config", help="reference-style Metarank YAML config")
    ap.add_argument("--model", help="export the dataset FOR one model from "
                    "the config's models: section — its selector "
                    "(config/Selector.scala) picks which clickthroughs "
                    "this model trains on")
    ap.add_argument("--split", choices=("random", "time", "hold_last"),
                    default="hold_last")
    ap.add_argument("--split-ratio", type=float, default=0.8)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from metarank_spark.engine import FeatureEngine
    from metarank_spark.operators import splits
    from metarank_spark.operators.clickthrough import training_matrix
    from metarank_spark.operators.export import write_csv, write_libsvm
    from metarank_spark.session import get_spark

    spark = get_spark("metarank-export", parallelism=args.cpus)
    if args.synthetic_users:
        from metarank_spark.datagen import synthetic_ranklens

        events = synthetic_ranklens(spark, users=args.synthetic_users)
    elif args.table:
        events = spark.table(args.table)
    elif args.events:
        events = spark.read.parquet(args.events)
    else:
        ap.error("need --events, --table or --synthetic-users")

    cfg = None
    if args.config:
        from metarank_spark.config import load_config

        cfg = load_config(args.config)
        features = cfg.features
    else:
        try:
            from jobs.backfill import DEFAULT_FEATURES, parse_features
        except ModuleNotFoundError:  # spark-submit puts jobs/ itself on path
            from backfill import DEFAULT_FEATURES, parse_features

        features = parse_features(DEFAULT_FEATURES)

    engine = FeatureEngine(features)
    tm = training_matrix(events, engine)
    feature_cols = [f.name for f in features]

    selector = None
    if args.model:
        if cfg is None:
            ap.error("--model needs --config (the models: section)")
        try:
            selector = cfg.model_selectors()[args.model]
        except KeyError:
            ap.error(f"model {args.model!r} not in the config's models: "
                     f"section ({sorted(cfg.models)})")
        from metarank_spark.operators.clickthrough import clickthroughs
        from metarank_spark.selectors import Accept, select_clickthroughs

        if selector != Accept():
            # the TrainBuffer routing step (Selector.accept per
            # clickthrough): accepted ranking ids leftsemi-prune the
            # matrix — one ranking-cardinality frame, one hash join on
            # the key the matrix is already organized by
            accepted = select_clickthroughs(
                clickthroughs(events), selector).select("ranking_id")
            tm = tm.join(accepted, "ranking_id", "leftsemi")

    split_fn = {
        "random": lambda df: splits.split_random(df, ratio=args.split_ratio),
        "time": lambda df: splits.split_time(df, ratio=args.split_ratio),
        # ranking granularity: a qid group must never straddle the split
        "hold_last": lambda df: splits.split_hold_last_ranking(df),
    }[args.split]
    # persist the marked matrix: both part writes and both row counts read
    # the cache instead of re-running the feature fold per pass
    marked = split_fn(tm).persist()

    counts = {}
    for part in ("train", "test"):
        sub = marked.filter(marked["split"] == part).drop("split")
        path = f"{args.output}/{part}"
        if args.format == "libsvm":
            write_libsvm(sub, feature_cols, path)
        elif args.format == "csv":
            write_csv(sub, feature_cols, path)
        else:
            sub.write.mode("overwrite").parquet(path)
        counts[part] = sub.count()

    from metarank_spark.operators.export import feature_width

    desc = {
        "format": args.format,
        "features": feature_cols,
        "dense_width": feature_width(features),
        "split": args.split,
        "rows": counts,
    }
    if args.model:
        desc["model"] = args.model
        desc["selector"] = repr(selector)
    # write the descriptor through the Hadoop FS API so --output works on
    # any supported filesystem (hdfs://, s3a://, file:), not just the
    # driver's local disk
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(f"{args.output}/dataset.json")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.create(jpath, True)
    try:
        stream.write(bytearray(json.dumps(desc, indent=2).encode("utf-8")))
    finally:
        stream.close()
    marked.unpersist()
    print(json.dumps(desc))
    return 0


if __name__ == "__main__":
    sys.exit(main())
