"""spark-submit entry point: BPE subword-vocabulary training (+ encode).

    python -m zipfile -c /tmp/metarank_spark.zip metarank_spark
    spark-submit --driver-memory 8g --py-files /tmp/metarank_spark.zip \
        jobs/train_vocab.py --documents /path/documents.parquet \
        --output /path/vocab --n-merges 1000 [--encode]

Trains a BPE merge table on the corpus (functions/bpe.py: one corpus
scan to the (word,count) vocabulary, then vocab-table-sized merge
iterations — corpus-size-independent training) and writes it as
``<output>/merges.parquet``; with ``--encode`` also writes the corpus
re-tokenized with the learned vocabulary as ``<output>/encoded.parquet``
(doc_id, pieces array<long>, n_pieces).

Same manifest-resume discipline as jobs/backfill.py / jobs/curate.py:
each artifact carries a lineage receipt keyed by the corpus fingerprint
+ training params, so a killed run rerun with the same args skips
completed artifacts (and retraining is skipped when only --encode was
added — encoding resumes from the stored merge table)."""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-merges", type=int, default=1000)
    ap.add_argument("--min-freq", type=int, default=2)
    ap.add_argument("--encode", action="store_true",
                    help="also write the corpus encoded with the "
                         "learned vocabulary")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from metarank_spark.checkpoint import (
        load_manifests,
        require_local_output,
        write_manifest,
    )
    from metarank_spark.functions import bpe
    from metarank_spark.operators.curate import _docs_fingerprint
    from metarank_spark.session import get_spark

    spark = get_spark("metarank-train-vocab", parallelism=args.cpus)
    require_local_output(args.output)
    docs = spark.read.parquet(args.documents)
    fp = (f"{_docs_fingerprint(docs)};merges={args.n_merges};"
          f"min_freq={args.min_freq}")
    done = load_manifests(args.output)
    mpath = os.path.join(args.output, "merges.parquet")

    m = done.get("vocab:merges")
    if m and m["input_fingerprint"] == fp:
        print(json.dumps({**m, "resumed": True}))
        merges = [
            (r["rank"], r["left"], r["right"], r["new_id"])
            for r in spark.read.parquet(mpath).orderBy("rank").collect()
        ]
    else:
        t0 = time.perf_counter()
        merges = bpe.train_bpe(
            docs, n_merges=args.n_merges, min_freq=args.min_freq)
        spark.createDataFrame(
            merges or [], "rank long, left long, right long, new_id long"
        ).coalesce(1).write.mode("overwrite").parquet(mpath)
        manifest = {
            "range_id": "vocab:merges",
            "input_fingerprint": fp,
            "rows": len(merges),
            "output": mpath,
            "wall_sec": round(time.perf_counter() - t0, 3),
        }
        write_manifest(args.output, manifest)
        print(json.dumps({**manifest, "resumed": False}))

    if args.encode:
        epath = os.path.join(args.output, "encoded.parquet")
        m = done.get("vocab:encoded")
        if m and m["input_fingerprint"] == fp:
            print(json.dumps({**m, "resumed": True}))
        else:
            t0 = time.perf_counter()
            enc = bpe.encode_bpe(docs, merges)
            enc.write.mode("overwrite").parquet(epath)
            back = spark.read.parquet(epath)
            from pyspark.sql import functions as F

            stats = back.agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum("n_pieces").alias("pieces"),
            ).collect()[0]
            manifest = {
                "range_id": "vocab:encoded",
                "input_fingerprint": fp,
                "rows": stats["rows"],
                "pieces": stats["pieces"],
                "output": epath,
                "wall_sec": round(time.perf_counter() - t0, 3),
            }
            write_manifest(args.output, manifest)
            print(json.dumps({**manifest, "resumed": False}))
    return 0


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    raise SystemExit(main())
