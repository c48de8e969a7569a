"""spark-submit entry point: streaming dedup-on-ingest.

    python -m zipfile -c /tmp/metarank_spark.zip metarank_spark
    spark-submit --driver-memory 8g --py-files /tmp/metarank_spark.zip \
        jobs/ingest.py --source /path/incoming_docs \
        --output /path/curated [--near-threshold 0.5] [--follow]

Watches ``--source`` for new parquet files of raw documents
(doc_id, text, source) and curates every micro-batch as a frozen-history
delta against the state at ``--output``: exact + LSH near dedup vs all
previously accepted content, survivors written per batch, state folded
forward (streaming/pipeline.streaming_dedup_near). Default is one
availableNow pass (drain what's there, then exit — cron-friendly);
``--follow`` keeps the query running on a processing-time trigger. The
checkpoint lives under ``<output>/_ingest_checkpoint``, so a killed job
resumes at the batch boundary and replayed batches overwrite their own
output/state partitions (exactly-once results under at-least-once
delivery).

Swapping the file source for a broker is the standard one-line change
(``spark.readStream.format("kafka")...`` + the wire decode from
streaming/pipeline.decode_wire_stream); no broker runs in this
environment, so the file source is the tested path."""

from __future__ import annotations

import argparse
import json
import os


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True,
                    help="directory of incoming parquet docs "
                         "(doc_id, text, source)")
    ap.add_argument("--output", required=True,
                    help="curation root: survivors under stream/batch=N, "
                         "state under _state/")
    ap.add_argument("--near-threshold", type=float, default=0.1)
    ap.add_argument("--full", action="store_true",
                    help="run the FULL curation pipeline per micro-batch "
                         "(quality, decontaminate, importance, mixture, "
                         "pack with continued offsets) against the frozen "
                         "state of a prior curate --publish-state run, "
                         "instead of dedup-only ingest")
    # --full mode knobs — MUST match the base curate run's params (the
    # frozen importance LM validates its targets; the rest is on you)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--max-rep", type=float, default=1.0)
    ap.add_argument("--benchmark-ids", default="")
    ap.add_argument("--no-mixture", action="store_true")
    ap.add_argument("--target-sources", default="")
    ap.add_argument("--importance-keep", type=float, default=1.0)
    ap.add_argument("--pack-budget", type=int, default=256)
    ap.add_argument("--max-files-per-trigger", type=int, default=None,
                    help="bound micro-batch size (files); default: all "
                         "available files in one batch")
    ap.add_argument("--follow", action="store_true",
                    help="keep running (10s processing-time trigger) "
                         "instead of one availableNow drain")
    ap.add_argument("--compact-after", action="store_true",
                    help="after the drain completes (checkpoint "
                         "committed), fold the accumulated _state "
                         "delta=* partitions into one clustered "
                         "partition per table (curate.compact_state); "
                         "bounds the per-table partition-dir and file "
                         "count that every probe must list and scan")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from metarank_spark.operators.curate import CurateParams, compact_state
    from metarank_spark.session import get_spark
    from metarank_spark.streaming.pipeline import (
        streaming_curate,
        streaming_dedup_near,
    )

    spark = get_spark("metarank-ingest", parallelism=args.cpus)
    reader = spark.readStream.schema("doc_id long, text string, source string")
    if args.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", args.max_files_per_trigger)
    stream = reader.parquet(args.source)
    p = CurateParams(
        min_tokens=args.min_tokens,
        min_quality=args.min_quality,
        max_rep=args.max_rep,
        near_threshold=args.near_threshold,
        benchmark_ids=tuple(s for s in args.benchmark_ids.split(",") if s),
        mixture=not args.no_mixture,
        target_sources=tuple(s for s in args.target_sources.split(",") if s),
        importance_keep=args.importance_keep,
        pack_budget=args.pack_budget,
    )
    wrap = streaming_curate if args.full else streaming_dedup_near
    writer = (
        wrap(stream, args.output, p)
        .option("checkpointLocation",
                os.path.join(args.output, "_ingest_checkpoint"))
    )
    if args.follow:
        q = writer.trigger(processingTime="10 seconds").start()
        q.awaitTermination()
    else:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    if args.compact_after:
        # safe here: the drain's checkpoint is committed, so no batch can
        # replay against the partitions being folded (and compact_state
        # keeps the newest partition out of the fold regardless)
        stats = compact_state(spark, args.output)
        print(json.dumps({"compacted": stats}))
    return 0


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    raise SystemExit(main())
