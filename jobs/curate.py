"""spark-submit entry point: resumable training-corpus curation.

    python -m zipfile -c /tmp/metarank_spark.zip metarank_spark
    spark-submit --driver-memory 8g --py-files /tmp/metarank_spark.zip \
        jobs/curate.py --documents /path/documents.parquet \
        --output /path/curated [--min-tokens 5] [--max-rep 0.5] ...

Runs the tokenize → dedup(exact, near) → quality → decontaminate →
mixture → pack DAG (operators/curate.py). One JSON manifest line per
stage, one summary line at the end; a killed run rerun with the same
args resumes — only stages whose input or parameters changed recompute
(chained lineage fingerprints, see the module docstring)."""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True,
                    help="parquet with (doc_id, text, source) columns")
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--max-rep", type=float, default=1.0,
                    help="top-bigram-fraction cap (1.0 = off)")
    ap.add_argument("--langs", default="",
                    help="comma-separated language keep-list (empty = all)")
    ap.add_argument("--near-threshold", type=float, default=0.1,
                    help="MinHash-LSH verify Jaccard threshold")
    ap.add_argument("--benchmark-ids", default="",
                    help="comma-separated doc ids standing in for the "
                         "benchmark/eval set to decontaminate against")
    ap.add_argument("--no-mixture", action="store_true",
                    help="skip balanced-mixture downsampling")
    ap.add_argument("--target-sources", default="",
                    help="comma-separated DSIR target-domain sources; "
                         "with --importance-keep < 1 adds an importance-"
                         "resampling stage (functions/selection.py)")
    ap.add_argument("--importance-keep", type=float, default=1.0,
                    help="fraction of docs kept by log importance weight")
    ap.add_argument("--pack-budget", type=int, default=256,
                    help="tokens per packed training sequence")
    ap.add_argument("--checkpoint-stages", default="",
                    help="comma-separated stages to materialize (fused "
                         "mode — stages between checkpoints run as one "
                         "codegen pass, ~3x less IO at scale); empty = "
                         "materialize every stage")
    ap.add_argument("--publish-state", action="store_true",
                    help="after the run, publish the frozen-history "
                         "state tables later --delta runs dedup against")
    ap.add_argument("--delta", action="store_true",
                    help="treat --documents as a crawl DELTA: curate it "
                         "against the frozen state at --output (O(delta), "
                         "history never rescanned) and fold the "
                         "survivors into the state")
    ap.add_argument("--cpus", type=int, default=None,
                    help="local[N] when not on a cluster")
    args = ap.parse_args(argv)

    from metarank_spark.operators.curate import (
        CurateParams,
        curate,
        curate_delta,
        publish_state,
        summarize,
    )
    from metarank_spark.session import get_spark

    spark = get_spark("metarank-curate", parallelism=args.cpus)
    docs = spark.read.parquet(args.documents)
    p = CurateParams(
        min_tokens=args.min_tokens,
        min_quality=args.min_quality,
        max_rep=args.max_rep,
        langs=tuple(s for s in args.langs.split(",") if s),
        near_threshold=args.near_threshold,
        benchmark_ids=tuple(s for s in args.benchmark_ids.split(",") if s),
        mixture=not args.no_mixture,
        target_sources=tuple(s for s in args.target_sources.split(",") if s),
        importance_keep=args.importance_keep,
        pack_budget=args.pack_budget,
        checkpoint_stages=tuple(
            s for s in args.checkpoint_stages.split(",") if s),
    )
    if args.publish_state and p.checkpoint_stages:
        # state derivation reads these stage outputs from parquet —
        # force them to materialize even in fused mode
        need = ("dedup_exact", "decontaminate") + (
            ("importance",)
            if p.target_sources and p.importance_keep < 1.0 else ())
        p = CurateParams(**{
            **p.__dict__,
            "checkpoint_stages": p.checkpoint_stages + tuple(
                s for s in need if s not in p.checkpoint_stages),
        })
    if args.delta:
        manifests = curate_delta(spark, docs, args.output, p)
    else:
        manifests = curate(spark, docs, args.output, p)
        if args.publish_state:
            publish_state(spark, args.output, p)
    for m in manifests:
        print(json.dumps(m))
    print(json.dumps(summarize(manifests)))
    return 0


if __name__ == "__main__":
    import os
    import sys

    # spark-submit runs this file as __main__ from anywhere; make the
    # repo-root package importable like jobs/backfill.py does
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    raise SystemExit(main())
