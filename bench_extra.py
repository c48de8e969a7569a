"""Round-6 auxiliary benchmarks — NOT the driver metric (bench.py is
frozen for measurement; this file exists so OPTIMIZATION_r06.md's claims
outside the headline query set are reproducible).

Sections (pick with --section, default runs all):

- ``floor``: the event-pipeline hardware floor at the bench SF — scan
  only, scan+exchange, scan+exchange+window — the guide-§1.3 yardstick
  the sub-second event queries are judged against.
- ``ingest_soak``: N micro-batches through dedup_ingest_batch with the
  r6 shingle state, recording per-batch wall and state size per batch.
  This is the VERDICT-r5 #1/#8 "done" evidence: per-batch cost must stay
  flat (state folds grow, probe work must not — the O(history) shingle
  fold is gone; what remains is the state scan, which grows only with
  distinct survivors).

Usage: SPARK_GRAFT_CPUS=32 python bench_extra.py [--section ingest_soak]
Prints one JSON line per section.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def bench_floor(spark, sf_dir: str, repeats: int = 5) -> dict:
    from metarank_spark.schema import load_events

    ev = load_events(spark, sf_dir)
    out = {}
    cases = {
        "scan": ev,
        "scan_exchange": ev.repartition("user_id"),
        "scan_exchange_window": ev.select(
            "event_id",
            F.row_number()
            .over(Window.partitionBy("user_id").orderBy("ts_ms", "event_id"))
            .alias("rn"),
        ),
    }
    for name, df in cases.items():
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            _noop(df)
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    return out


def _state_file_part_counts(out_dir: str) -> tuple[int, int]:
    files = parts = 0
    for name in os.listdir(os.path.join(out_dir, "_state")):
        tbl = os.path.join(out_dir, "_state", name)
        if not os.path.isdir(tbl):
            continue
        for d in os.listdir(tbl):
            if d.startswith("delta="):
                parts += 1
                files += len([f for f in os.listdir(os.path.join(tbl, d))
                              if f.endswith(".parquet")])
    return parts, files


def bench_ingest_soak(
    spark, sf_dir: str, out_dir: str, n_batches: int = 20,
    compact_every: int = 0,
) -> dict:
    """Slice the documents table into n_batches deterministic batches and
    ingest them sequentially; per-batch wall + state row counts. With
    ``compact_every`` > 0, run curate.compact_state after every K batches
    (the jobs/ingest.py --compact-after analog) — the per-table partition
    and file counts then stay bounded by K instead of growing linearly
    with batch count, while per-batch wall and survivors are unchanged
    (compaction preserves the state row multiset; probe-equality is
    test-pinned in test_curate_job.py)."""
    from metarank_spark.operators.curate import (
        CurateParams,
        compact_state,
        dedup_ingest_batch,
    )

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    p = CurateParams(near_threshold=0.5)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    per = n_docs // n_batches
    walls, state_rows, part_counts, file_counts, compact_walls = [], [], [], [], []
    for b in range(n_batches):
        lo, hi = b * per, (b + 1) * per if b < n_batches - 1 else n_docs
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        t0 = time.perf_counter()
        dedup_ingest_batch(spark, batch, out_dir, p, str(b))
        walls.append(round(time.perf_counter() - t0, 3))
        if compact_every and (b + 1) % compact_every == 0:
            t0 = time.perf_counter()
            compact_state(spark, out_dir)
            compact_walls.append(round(time.perf_counter() - t0, 3))
        state_rows.append(
            spark.read.parquet(
                os.path.join(out_dir, "_state", "near_docs")).count())
        parts, files = _state_file_part_counts(out_dir)
        part_counts.append(parts)
        file_counts.append(files)
    state_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(os.path.join(out_dir, "_state"))
        for f in fs
    )
    half = n_batches // 2
    return {
        "n_batches": n_batches,
        "docs_per_batch": per,
        "compact_every": compact_every,
        "walls_sec": walls,
        "compact_walls_sec": compact_walls,
        "state_rows_after_each": state_rows,
        "state_partitions_after_each": part_counts,
        "state_files_after_each": file_counts,
        "state_bytes_final": state_bytes,
        "mean_wall_first_half": round(sum(walls[:half]) / half, 3),
        "mean_wall_second_half": round(
            sum(walls[half:]) / (n_batches - half), 3),
    }


def bench_bpe_scale(spark, n_docs: int = 20000, words_per_doc: int = 200,
                    rank_space: int = 200000, n_merges: int = 48) -> dict:
    """BPE at realistic vocabulary scale (VERDICT-r5 #5): a synthetic
    zipf-ish corpus with >=10^5 DISTINCT words (word rank drawn
    log-uniformly — density ~1/rank, the zipf s=1 shape — from a
    deterministic per-(doc,pos) hash), train n_merges merges, then
    encode with the broadcast path AND the broadcast=False fallback
    under autoBroadcastJoinThreshold=-1. Reported: distinct-word count,
    total/per-merge train wall (the vocab-bound claim: per-merge cost
    tracks vocab rows x mean word length, not corpus tokens), and both
    encode walls."""
    import math

    from metarank_spark.functions import bpe

    # per-(doc,pos) word rank ~ exp(U * ln(rank_space)): log-uniform
    # over [1, rank_space] — density ~1/rank
    docs = (
        spark.range(n_docs).toDF("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            F.concat_ws(" ", F.transform(
                F.sequence(F.lit(1), F.lit(words_per_doc)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.conv(F.floor(F.exp(
                        (F.pmod(F.xxhash64(F.col("doc_id"), i),
                                F.lit(1 << 20)) / F.lit(float(1 << 20)))
                        * F.lit(math.log(rank_space))))
                        .cast("string"), 10, 36)),
            )).alias("text"),
            F.lit("s").alias("source"),
        )
        .localCheckpoint(eager=True)
    )
    n_distinct = bpe.word_counts(docs).count()
    t0 = time.perf_counter()
    merges = bpe.train_bpe(docs, n_merges=n_merges)
    train_s = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _noop(bpe.encode_bpe(docs, merges))
    enc_bcast_s = round(time.perf_counter() - t0, 3)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t0 = time.perf_counter()
        _noop(bpe.encode_bpe(docs, merges, broadcast=False))
        enc_fallback_s = round(time.perf_counter() - t0, 3)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    return {
        "n_docs": n_docs,
        "word_instances": n_docs * words_per_doc,
        "n_distinct_words": n_distinct,
        "n_merges": len(merges),
        "train_total_sec": train_s,
        "train_per_merge_sec": round(train_s / max(1, len(merges)), 3),
        "encode_broadcast_sec": enc_bcast_s,
        "encode_fallback_noautobcast_sec": enc_fallback_s,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--section", default="all",
                    choices=("all", "floor", "ingest_soak", "bpe_scale"))
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--compact-every", type=int, default=0)
    ap.add_argument("--out", default="/tmp/ingest_soak")
    args = ap.parse_args()

    from metarank_spark.session import get_spark

    spark = get_spark("bench-extra", parallelism=args.cpus,
                      shuffle_partitions=args.cpus)
    if args.section in ("all", "floor"):
        print(json.dumps({"section": "floor", "sf_dir": args.sf_dir,
                          **bench_floor(spark, args.sf_dir)}))
    if args.section in ("all", "ingest_soak"):
        print(json.dumps({
            "section": "ingest_soak", "sf_dir": args.sf_dir,
            **bench_ingest_soak(spark, args.sf_dir, args.out,
                                args.batches, args.compact_every)}))
    if args.section == "bpe_scale":
        print(json.dumps({"section": "bpe_scale",
                          **bench_bpe_scale(spark)}))
