"""Curation pipeline job (operators/curate.py + jobs/curate.py):
end-to-end run, chained-lineage resume, and the per-row repetition
signal's equivalence to the aggregation form."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from conftest import SF_SMALL
from metarank_spark.functions import text as tx
from metarank_spark.operators.curate import (
    CurateParams,
    curate,
    summarize,
    top_bigram_frac_expr,
)

PARAMS = CurateParams(
    min_tokens=3,
    max_rep=0.9,
    benchmark_ids=("0", "1"),
    pack_budget=64,
)


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_SMALL, "documents.parquet"))


def _by_stage(ms):
    return {m["range_id"].rsplit(":", 1)[-1]: m for m in ms}


def test_top_bigram_frac_matches_aggregation(spark):
    """The per-row sorted-run fold must equal the explode+groupBy count
    (q_rep_ngram's semantics) on every real doc."""
    seq = tx.tokenized_sequences(spark, SF_SMALL).filter(F.col("n_tok") >= 2)
    got = {
        r["doc_id"]: r["frac"]
        for r in seq.select(
            "doc_id", top_bigram_frac_expr(F.col("tokens")).alias("frac")
        ).collect()
    }
    bg = seq.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("tokens", 1, F.size("tokens") - 1),
                F.slice("tokens", 2, F.size("tokens") - 1),
                lambda a, b: a.cast("long") * 1_000_003 + b,
            )
        ).alias("bg"),
    )
    counts = bg.groupBy("doc_id", "bg").count()
    exp = {
        r["doc_id"]: r["frac"]
        for r in counts.groupBy("doc_id")
        .agg((F.max("count") / F.sum("count")).alias("frac"))
        .collect()
    }
    assert got == exp and len(got) > 0


def test_curate_end_to_end(spark, tmp_path):
    out = str(tmp_path / "cur")
    ms = curate(spark, _docs(spark), out, PARAMS)
    st = _by_stage(ms)
    assert list(st) == [
        "tokenize", "dedup_exact", "dedup_near", "quality",
        "decontaminate", "importance", "mixture", "pack",
    ]
    assert all(not m["resumed"] for m in ms)
    # doc counts can only shrink along the filter stages; pack keeps rows
    order = list(st)
    for a, b in zip(order[:-1], order[1:]):
        assert st[b]["rows"] <= st[a]["rows"], (a, b)
    assert st["pack"]["rows"] == st["mixture"]["rows"]
    assert st["pack"]["tokens"] == st["mixture"]["tokens"]
    # benchmark stand-ins are gone after decontamination
    dec = spark.read.parquet(os.path.join(out, "decontaminate"))
    assert dec.filter(F.col("doc_id").isin("0", "1")).count() == 0
    # packed output carries the assignment columns, budget respected
    packed = spark.read.parquet(os.path.join(out, "pack"))
    assert {"seq_id", "seq_offset"} <= set(packed.columns)
    assert packed.filter(
        (F.col("seq_offset") < 0) | (F.col("seq_offset") >= PARAMS.pack_budget)
    ).count() == 0
    s = summarize(ms)
    assert [x["stage"] for x in s["stages"]] == order
    assert s["wall_sec"] > 0


def test_curate_resume_is_noop_and_suffix_invalidation(spark, tmp_path):
    out = str(tmp_path / "cur")
    first = curate(spark, _docs(spark), out, PARAMS)
    again = curate(spark, _docs(spark), out, PARAMS)
    assert all(m["resumed"] for m in again)
    # identical receipts (minus the resume flag)
    assert [
        {k: v for k, v in m.items() if k != "resumed"} for m in again
    ] == [{k: v for k, v in m.items() if k != "resumed"} for m in first]
    # a mid-pipeline param change reruns exactly that stage + downstream
    p2 = CurateParams(**{**PARAMS.__dict__, "max_rep": 0.5})
    third = _by_stage(curate(spark, _docs(spark), out, p2))
    assert third["tokenize"]["resumed"] and third["dedup_near"]["resumed"]
    for s in ("quality", "decontaminate", "importance", "mixture", "pack"):
        assert not third[s]["resumed"], s


def test_curate_deleted_stage_recomputes_alone(spark, tmp_path):
    import shutil

    out = str(tmp_path / "cur")
    curate(spark, _docs(spark), out, PARAMS)
    shutil.rmtree(os.path.join(out, "quality"))
    ms = _by_stage(curate(spark, _docs(spark), out, PARAMS))
    assert not ms["quality"]["resumed"]
    for s in ("tokenize", "dedup_exact", "dedup_near",
              "decontaminate", "importance", "mixture", "pack"):
        assert ms[s]["resumed"], s


def test_curate_importance_stage(spark, tmp_path):
    """With a target domain and keep<1, the importance stage thins to
    ~the requested fraction and every kept doc clears the cutoff."""
    from metarank_spark.functions import selection as sel
    from metarank_spark.functions import text as tx

    p = CurateParams(**{**PARAMS.__dict__,
                        "target_sources": ("src0", "src1"),
                        "importance_keep": 0.5})
    out = str(tmp_path / "cur_iw")
    st = _by_stage(curate(spark, _docs(spark), out, p))
    n_in, n_out = st["decontaminate"]["rows"], st["importance"]["rows"]
    assert n_out < n_in
    assert abs(n_out - 0.5 * n_in) <= max(3, 0.05 * n_in)
    kept = spark.read.parquet(os.path.join(out, "importance"))
    dec = spark.read.parquet(os.path.join(out, "decontaminate"))
    iw = sel.log_importance_weights(dec, p.target_sources)
    scores = {r["doc_id"]: r["log_iw"] for r in iw.collect()}
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    dropped = set(scores) - kept_ids
    if dropped and (kept_scores := [scores[d] for d in kept_ids if d in scores]):
        assert min(kept_scores) >= max(scores[d] for d in dropped)


def test_curate_cli(spark, tmp_path):
    """jobs/curate.py drives the same pipeline through argparse (shares
    the session via get_spark's singleton)."""
    import jobs.curate as jc

    out = str(tmp_path / "cli")
    rc = jc.main([
        "--documents", os.path.join(SF_SMALL, "documents.parquet"),
        "--output", out,
        "--min-tokens", "3", "--benchmark-ids", "0,1",
        "--pack-budget", "64",
    ])
    assert rc == 0
    assert os.path.isdir(os.path.join(out, "pack"))


def _raw(spark, rows):
    """(doc_id, text, source) raw docs frame."""
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


DELTA_P = CurateParams(min_tokens=3, near_threshold=0.5, mixture=False,
                       pack_budget=64)


def test_curate_delta_dedups_against_frozen_history(spark, tmp_path):
    from metarank_spark.operators.curate import curate_delta, publish_state

    out = str(tmp_path / "inc")
    w = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    base = _raw(spark, [
        (1, w, "src0"),
        (2, w, "src0"),                                # within-base exact dup
        (3, "kilo lima mike november oscar papa quebec romeo sierra tango",
         "src0"),
    ])
    curate(spark, base, out, DELTA_P)
    publish_state(spark, out, DELTA_P)

    near_of_3 = ("kilo lima mike november oscar papa quebec romeo sierra "
                 "uniform")  # 1 word off doc 3 → Jaccard ≈ 0.78
    delta = _raw(spark, [
        (10, w, "src0"),           # exact dup of history doc 1 → drop
        (11, near_of_3, "src0"),   # near-dup of history doc 3 → drop
        (12, "victor whiskey xray yankee zulu one two three", "src0"),
        (13, "victor whiskey xray yankee zulu one two three", "src0"),
        # exact dup of 12 within the delta → drop
    ])
    ms = _by_stage(curate_delta(spark, delta, out, DELTA_P))
    kept = spark.read.parquet(ms["pack"]["output"])
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} == {"12"}

    # a SECOND delta dedups against the first delta's survivors too, and
    # pack offsets continue across history
    delta2 = _raw(spark, [
        (20, "victor whiskey xray yankee zulu one two four", "src0"),
        # near-dup of delta-1 survivor 12 (7/9 shingles) → drop
        (21, "gamma beta epsilon zeta eta theta iota kappa", "src0"),
    ])
    ms2 = _by_stage(curate_delta(spark, delta2, out, DELTA_P))
    kept2 = spark.read.parquet(ms2["pack"]["output"]).collect()
    assert {r["doc_id"] for r in kept2} == {"21"}
    # src0 history tokens: doc1(10) + doc3(10) from base, doc12(8) from
    # delta 1 → doc 21 starts at offset 28
    (r21,) = kept2
    assert r21["seq_id"] * DELTA_P.pack_budget + r21["seq_offset"] == 28


def test_curate_delta_equals_batch_union(spark, tmp_path):
    """With mixture off and no near-dup cluster straddling the split,
    base+delta must reproduce the batch run of the union — including
    continued pack offsets. (A straddling cluster is the documented
    frozen-history divergence: batch may crown the delta-side doc, the
    delta path never rewrites history — so the fixture removes the
    delta-side members of straddling pairs first.)"""
    from metarank_spark.functions import dedup as dd
    from metarank_spark.operators.curate import curate_delta, publish_state

    docs = _docs(spark)
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    seqs = tx.tokenized_sequences(spark, SF_SMALL)
    strad = [
        int(r["id_b"]) if int(r["id_b"]) > mid else int(r["id_a"])
        for r in dd.minhash_lsh_pairs(
            seqs, threshold=DELTA_P.near_threshold).collect()
        if (int(r["id_a"]) <= mid) != (int(r["id_b"]) <= mid)
    ]
    docs = docs.filter(~F.col("doc_id").isin(strad))
    a, b = docs.filter(F.col("doc_id") <= mid), docs.filter(F.col("doc_id") > mid)
    p = DELTA_P
    out_u = str(tmp_path / "union")
    batch = _by_stage(curate(spark, docs, out_u, p))
    out_i = str(tmp_path / "inc")
    curate(spark, a, out_i, p)
    publish_state(spark, out_i, p)
    dm = _by_stage(curate_delta(spark, b, out_i, p))

    cols = ("doc_id", "source", "n_tok", "seq_id", "seq_offset")
    got = sorted(
        tuple(r[c] for c in cols)
        for r in spark.read.parquet(os.path.join(out_i, "pack"))
        .unionByName(spark.read.parquet(dm["pack"]["output"]))
        .select(*cols).collect()
    )
    exp = sorted(
        tuple(r[c] for c in cols)
        for r in spark.read.parquet(os.path.join(out_u, "pack"))
        .select(*cols).collect()
    )
    assert got == exp and len(got) > 0


def test_curate_delta_resume_and_state_idempotent(spark, tmp_path):
    from metarank_spark.operators.curate import curate_delta, publish_state

    out = str(tmp_path / "inc")
    docs = _docs(spark)
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    a, b = docs.filter(F.col("doc_id") <= mid), docs.filter(F.col("doc_id") > mid)
    curate(spark, a, out, DELTA_P)
    publish_state(spark, out, DELTA_P)
    first = curate_delta(spark, b, out, DELTA_P)
    assert all(not m["resumed"] for m in first)
    n_hashes = spark.read.parquet(
        os.path.join(out, "_state", "exact_hashes")).count()
    again = curate_delta(spark, b, out, DELTA_P)
    assert all(m["resumed"] for m in again)
    # state republish is idempotent — same partition overwritten
    assert spark.read.parquet(
        os.path.join(out, "_state", "exact_hashes")).count() == n_hashes


def test_curate_fused_checkpoints_match_full(spark, tmp_path):
    """checkpoint_stages fuses the filter stages into one codegen pass:
    identical final output, metrics only at checkpoints, and resume
    restarts from the last materialized stage."""
    full = str(tmp_path / "full")
    fused = str(tmp_path / "fused")
    pf = CurateParams(**{**PARAMS.__dict__,
                         "checkpoint_stages": ("tokenize", "dedup_near")})
    curate(spark, _docs(spark), full, PARAMS)
    ms = _by_stage(curate(spark, _docs(spark), fused, pf))
    # only the checkpoints (+pack) materialized
    assert ms["tokenize"]["output"] and ms["dedup_near"]["output"] \
        and ms["pack"]["output"]
    for s in ("dedup_exact", "quality", "decontaminate", "importance",
              "mixture"):
        assert ms[s]["output"] is None and ms[s]["rows"] is None, s
    cols = ("doc_id", "source", "n_tok", "seq_id", "seq_offset")
    got = sorted(tuple(r[c] for c in cols) for r in spark.read.parquet(
        os.path.join(fused, "pack")).select(*cols).collect())
    exp = sorted(tuple(r[c] for c in cols) for r in spark.read.parquet(
        os.path.join(full, "pack")).select(*cols).collect())
    assert got == exp and len(got) > 0
    # resume: everything green on rerun; deleting pack recomputes only
    # the fused tail (checkpoints resume from parquet)
    import shutil
    shutil.rmtree(os.path.join(fused, "pack"))
    ms2 = _by_stage(curate(spark, _docs(spark), fused, pf))
    assert not ms2["pack"]["resumed"]
    assert ms2["tokenize"]["resumed"] and ms2["dedup_near"]["resumed"]


def test_curate_delta_chain_bounded_and_equals_batch(spark, tmp_path):
    """Production shape: one base + N consecutive deltas. Asserts (a) the
    chained runs reproduce the batch union exactly (straddle-free fixture,
    as test_curate_delta_equals_batch_union), (b) every state table gains
    exactly one partition per fold, and (c) state size tracks SURVIVORS
    (no growth leak: dropped dups never enter the band/hash tables)."""
    from metarank_spark.functions import dedup as dd
    from metarank_spark.operators.curate import (
        STATE_DIR, curate_delta, publish_state)

    docs = _docs(spark)
    n_cuts = 4
    cuts = [
        docs.agg(F.expr(f"percentile(doc_id, {q})")).collect()[0][0]
        for q in (0.25, 0.5, 0.75)
    ]
    part = lambda d: (  # noqa: E731 — slice index 0..3 by doc_id quartile
        sum(int(d) > c for c in cuts))
    seqs = tx.tokenized_sequences(spark, SF_SMALL)
    strad = [  # drop the later-slice member of every cross-slice pair
        max(int(r["id_a"]), int(r["id_b"]))
        for r in dd.minhash_lsh_pairs(
            seqs, threshold=DELTA_P.near_threshold).collect()
        if part(r["id_a"]) != part(r["id_b"])
    ]
    docs = docs.filter(~F.col("doc_id").isin(strad))
    slices = [
        docs.filter(F.udf(lambda d: part(d) == i, "boolean")("doc_id"))
        for i in range(n_cuts)
    ]

    out_u = str(tmp_path / "union")
    curate(spark, docs, out_u, DELTA_P)
    out_i = str(tmp_path / "inc")
    curate(spark, slices[0], out_i, DELTA_P)
    publish_state(spark, out_i, DELTA_P)

    packs = [spark.read.parquet(os.path.join(out_i, "pack"))]
    hash_counts = []
    for s in slices[1:]:
        dm = _by_stage(curate_delta(spark, s, out_i, DELTA_P))
        packs.append(spark.read.parquet(dm["pack"]["output"]))
        hash_counts.append(spark.read.parquet(
            os.path.join(out_i, STATE_DIR, "exact_hashes")).count())

    cols = ("doc_id", "source", "n_tok", "seq_id", "seq_offset")
    got = sorted(
        tuple(r[c] for c in cols)
        for pk in packs for r in pk.select(*cols).collect()
    )
    exp = sorted(
        tuple(r[c] for c in cols)
        for r in spark.read.parquet(os.path.join(out_u, "pack"))
        .select(*cols).collect()
    )
    assert got == exp and len(got) > 0

    # one state partition per fold (base + 3 deltas), and the hash-set
    # growth equals each delta's exact-survivor count — dropped docs
    # never leak into state
    hash_dir = os.path.join(out_i, STATE_DIR, "exact_hashes")
    parts = [d for d in os.listdir(hash_dir) if d.startswith("delta=")]
    assert len(parts) == n_cuts
    assert hash_counts == sorted(hash_counts)  # monotone, bounded by docs
    assert hash_counts[-1] <= docs.count()


def test_curate_cli_fused_publish_state_forces_checkpoints(spark, tmp_path):
    """--publish-state with fused checkpoints must force the state-source
    stages to materialize (dedup_exact/decontaminate/pack) so state
    derivation succeeds; publish_state alone on a fused run without them
    raises a clear error naming the missing stages."""
    import jobs.curate as jc
    from metarank_spark.operators.curate import publish_state

    out = str(tmp_path / "cli_fused")
    rc = jc.main([
        "--documents", os.path.join(SF_SMALL, "documents.parquet"),
        "--output", out, "--min-tokens", "3", "--pack-budget", "64",
        "--checkpoint-stages", "tokenize", "--publish-state",
    ])
    assert rc == 0
    assert os.path.isdir(os.path.join(out, "_state", "exact_hashes"))
    # the forced stages materialized despite fused mode
    for s in ("dedup_exact", "decontaminate", "pack"):
        assert os.path.isdir(os.path.join(out, s)), s
    # but the un-forced fused stages did not
    assert not os.path.isdir(os.path.join(out, "quality"))

    # direct publish_state on a fused run missing its sources: clear error
    out2 = str(tmp_path / "fused_nostate")
    p = CurateParams(**{**PARAMS.__dict__,
                        "checkpoint_stages": ("tokenize",)})
    curate(spark, _docs(spark), out2, p)
    try:
        publish_state(spark, out2, p)
        raise AssertionError("expected ValueError for missing stages")
    except ValueError as e:
        assert "dedup_exact" in str(e) and "decontaminate" in str(e)


def test_near_state_stores_shingles_probe_never_refolds(spark, tmp_path):
    """r6 near-dedup state shape: near_docs stores SHINGLE-HASH arrays,
    not raw tokens — the delta probe reads them as stored columns, so no
    trigram fold can run over history (the confirmed O(history)-per-delta
    defect). Proof is the schema: the history side has no tokens column
    to fold, and the probe's scan of near_docs reads (doc_id, sh)."""
    from metarank_spark.functions import dedup as dd
    from metarank_spark.operators.curate import (
        _delta_dedup_near, _stage_tokenize, curate, publish_state)

    out = str(tmp_path / "c")
    base = _docs(spark).filter(F.col("doc_id") < 250)
    curate(spark, base, out, PARAMS)
    publish_state(spark, out, PARAMS)
    nd = spark.read.parquet(os.path.join(out, "_state", "near_docs"))
    assert set(nd.columns) >= {"doc_id", "sh"} and "tokens" not in nd.columns
    # stored shingles equal a fresh fold over the same docs
    exact = spark.read.parquet(os.path.join(out, "dedup_exact"))
    fresh = {
        r["doc_id"]: r["sh"]
        for r in exact.select(
            "doc_id", dd.shingles_expr(F.col("tokens")).alias("sh")).collect()
    }
    stored = {r["doc_id"]: r["sh"] for r in nd.select("doc_id", "sh").collect()}
    assert stored == fresh
    # and the probe plan reads near_docs with ReadSchema (doc_id, sh) —
    # nothing tokenize-shaped below the join on the history branch
    delta = _stage_tokenize(_docs(spark).filter(F.col("doc_id") >= 250), PARAMS)
    probe = _delta_dedup_near(spark, delta, out, PARAMS)
    plan = probe._jdf.queryExecution().optimizedPlan().toString()
    import re
    # the state relation is recognizable by its (doc_id, sh, delta)
    # columns; it must carry NO tokens column for any fold to consume
    scans = [
        s for s in re.findall(r"Relation \[[^\]]*\] parquet", plan)
        if "sh#" in s and "delta#" in s
    ]
    assert scans, plan
    for s in scans:
        assert "tokens" not in s, s


def test_ingest_batch_replay_preserves_batch(spark, tmp_path):
    """A foreachBatch REPLAY of the same batch tag (crash after the state
    publish, before the streaming checkpoint commit) must converge to the
    same survivors — the state probe excludes the batch's own delta=b<tag>
    partitions, so the rerun does not mark every doc a duplicate of
    itself and silently empty the batch."""
    from metarank_spark.operators.curate import (
        CurateParams, dedup_ingest_batch)

    p = CurateParams(near_threshold=0.5)
    docs = spark.createDataFrame(
        [(1, "alpha bravo charlie delta echo", "s"),
         (2, "alpha bravo charlie delta echo", "s"),      # exact dup of 1
         (3, "alpha bravo charlie delta foxtrot", "s")],  # near dup of 1
        "doc_id long, text string, source string")
    out = str(tmp_path / "o")
    sp = dedup_ingest_batch(spark, docs, out, p, "0")
    first = {r["doc_id"] for r in spark.read.parquet(sp).select("doc_id").collect()}
    assert first == {"1"}
    # replay the SAME batch (same tag) after its state was published
    sp2 = dedup_ingest_batch(spark, docs, out, p, "0")
    second = {r["doc_id"] for r in spark.read.parquet(sp2).select("doc_id").collect()}
    assert second == first
    # state partition for the tag still holds the exact-survivors
    hashes = spark.read.parquet(os.path.join(out, "_state", "exact_hashes"))
    assert hashes.filter(F.col("delta") == "b0").count() > 0


def _ingest_state_rows(spark, out):
    return {
        name: sorted(map(tuple, spark.read.parquet(
            os.path.join(out, "_state", name)).drop("delta").collect()))
        for name in ("exact_hashes", "near_bands", "near_docs")
    }


def test_compact_state_preserves_probe_results(spark, tmp_path):
    """compact_state folds the accumulated delta=* partitions into ONE
    clustered partition per table without changing a single state row —
    so a batch ingested against compacted state yields exactly the
    survivors it would against the sprawled state."""
    import shutil

    from metarank_spark.operators.curate import (
        CurateParams, compact_state, dedup_ingest_batch)

    p = CurateParams(near_threshold=0.5)
    docs = _docs(spark).filter(F.col("doc_id") < 120)
    out_a = str(tmp_path / "sprawl")
    for b in range(3):
        batch = docs.filter(
            (F.col("doc_id") >= b * 40) & (F.col("doc_id") < (b + 1) * 40))
        dedup_ingest_batch(spark, batch, out_a, p, str(b))
    out_b = str(tmp_path / "compacted")
    shutil.copytree(out_a, out_b)
    rows_before = _ingest_state_rows(spark, out_b)
    # keep_latest=0: fold EVERYTHING (no in-flight batch in this test)
    stats = compact_state(spark, out_b, keep_latest=0)
    for name in ("exact_hashes", "near_bands", "near_docs"):
        tbl = os.path.join(out_b, "_state", name)
        parts = [d for d in os.listdir(tbl) if d.startswith("delta=")]
        assert len(parts) == 1 and parts[0].startswith("delta=c"), parts
        assert stats[name]["folded"] == 4  # bootstrap + 3 batches
    # row multiset identical (only the delta tag value changed)
    assert _ingest_state_rows(spark, out_b) == rows_before
    # probe equality: the next batch survives identically on both states
    probe = _docs(spark).filter(
        (F.col("doc_id") >= 120) & (F.col("doc_id") < 160))
    sp_a = dedup_ingest_batch(spark, probe, out_a, p, "3")
    sp_b = dedup_ingest_batch(spark, probe, out_b, p, "3")
    surv_a = {r["doc_id"] for r in spark.read.parquet(sp_a).collect()}
    surv_b = {r["doc_id"] for r in spark.read.parquet(sp_b).collect()}
    assert surv_a == surv_b
    # idempotent: nothing left to fold (compacted + the new b3 partition)
    again = compact_state(spark, out_b, keep_latest=1)
    assert all(s["folded"] == 0 for s in again.values())


def test_compact_state_keep_latest_preserves_replay(spark, tmp_path):
    """The replay-safety contract survives compaction: keep_latest=1
    (the default) never folds the newest partition, so a crashed batch
    replayed AFTER a compaction ran still excludes its own state rows
    and converges to the same survivors."""
    from metarank_spark.operators.curate import (
        CurateParams, compact_state, dedup_ingest_batch)

    p = CurateParams(near_threshold=0.5)
    base = spark.createDataFrame(
        [(10, "golf hotel india juliet kilo", "s")],
        "doc_id long, text string, source string")
    docs = spark.createDataFrame(
        [(1, "alpha bravo charlie delta echo", "s"),
         (2, "alpha bravo charlie delta echo", "s"),      # exact dup of 1
         (3, "alpha bravo charlie delta foxtrot", "s")],  # near dup of 1
        "doc_id long, text string, source string")
    out = str(tmp_path / "o")
    dedup_ingest_batch(spark, base, out, p, "0")
    sp = dedup_ingest_batch(spark, docs, out, p, "1")
    first = {r["doc_id"] for r in spark.read.parquet(sp).collect()}
    assert first == {"1"}
    # maintenance runs between the state publish and the (crashed)
    # checkpoint commit: b1's partitions are the newest → stay unfolded
    compact_state(spark, out)
    hashes = os.path.join(out, "_state", "exact_hashes")
    assert any(d == "delta=b1" for d in os.listdir(hashes))
    sp2 = dedup_ingest_batch(spark, docs, out, p, "1")
    second = {r["doc_id"] for r in spark.read.parquet(sp2).collect()}
    assert second == first


def test_compact_state_crash_recovery(spark, tmp_path):
    """Intent-marker recovery: a marker with a committed rewrite
    (_SUCCESS present) finishes the source deletions; a marker with an
    uncommitted rewrite removes the partial target and redoes the fold —
    either way the final row multiset is the uncompacted one."""
    import json as _json
    import shutil

    from metarank_spark.operators.curate import (
        CurateParams, compact_state, dedup_ingest_batch)

    p = CurateParams(near_threshold=0.5)
    docs = _docs(spark).filter(F.col("doc_id") < 80)
    out = str(tmp_path / "o")
    for b in range(2):
        batch = docs.filter(
            (F.col("doc_id") >= b * 40) & (F.col("doc_id") < (b + 1) * 40))
        dedup_ingest_batch(spark, batch, out, p, str(b))
    rows_before = _ingest_state_rows(spark, out)
    # crash case 1: marker written, rewrite NOT committed (partial dir)
    tbl = os.path.join(out, "_state", "exact_hashes")
    parts = sorted(d.split("=", 1)[1] for d in os.listdir(tbl)
                   if d.startswith("delta="))
    partial = os.path.join(tbl, "delta=cdeadbeef")
    os.makedirs(partial)  # no _SUCCESS → uncommitted
    with open(os.path.join(out, "_state", ".compact_exact_hashes.json"),
              "w") as fh:
        _json.dump({"folded": parts, "into": "cdeadbeef"}, fh)
    compact_state(spark, out, keep_latest=0)
    assert not os.path.isdir(partial)  # partial rewrite removed
    assert _ingest_state_rows(spark, out) == rows_before
    # crash case 2: rewrite committed, source deletions unfinished —
    # simulate by re-creating the marker for the ALREADY-compacted table
    # (its single c-partition stands in for the committed rewrite; the
    # listed folded tags are gone, so recovery just clears the marker)
    cpart = [d for d in os.listdir(tbl) if d.startswith("delta=c")][0]
    with open(os.path.join(out, "_state", ".compact_exact_hashes.json"),
              "w") as fh:
        _json.dump({"folded": parts, "into": cpart.split("=", 1)[1]}, fh)
    compact_state(spark, out, keep_latest=0)
    assert not os.path.exists(
        os.path.join(out, "_state", ".compact_exact_hashes.json"))
    assert _ingest_state_rows(spark, out) == rows_before


def test_fully_resumed_fused_run_rechains_nothing(spark, tmp_path, monkeypatch):
    """ADVICE r5: a fully-resumed FUSED run used to re-execute the whole
    upstream chain at re-chain time (_stage_importance's percentile
    collect, _stage_mixture's eager totals checkpoint) even though the
    resumed pack checkpoint replaces the frame. The resume now skips
    re-chaining any fused stage whose chain nothing downstream consumes
    — pinned by tripwiring every stage fn on the second run."""
    from metarank_spark.operators import curate as cu

    p = CurateParams(
        min_tokens=3, pack_budget=64, mixture=True,
        target_sources=("src0",), importance_keep=0.8,
        checkpoint_stages=("dedup_exact",),
    )
    docs = _docs(spark).filter(F.col("doc_id") < 150)
    out = str(tmp_path / "c")
    first = cu.curate(spark, docs, out, p)
    assert not any(m["resumed"] for m in first)

    def _trip(stage):
        def fn(*a, **k):
            raise AssertionError(f"resumed fused run re-chained {stage}")
        return fn

    monkeypatch.setattr(
        cu, "STAGES",
        tuple((name, _trip(name), pf) for name, _, pf in cu.STAGES))
    second = cu.curate(spark, docs, out, p)
    assert [m["resumed"] for m in second] == [True] * len(first)


def test_docs_fingerprint_covers_content(spark, tmp_path):
    """The resume fingerprint hashes text and source, not just the id
    set: editing a document's TEXT under an unchanged id must invalidate
    every stage instead of silently resuming from stale parquet."""
    from metarank_spark.operators.curate import _docs_fingerprint, curate

    a = spark.createDataFrame(
        [(1, "alpha bravo charlie", "s"), (2, "delta echo foxtrot", "s")],
        "doc_id long, text string, source string")
    b = spark.createDataFrame(
        [(1, "alpha bravo charlie", "s"), (2, "delta echo CHANGED", "s")],
        "doc_id long, text string, source string")
    c = spark.createDataFrame(
        [(1, "alpha bravo charlie", "s"), (2, "delta echo foxtrot", "t")],
        "doc_id long, text string, source string")
    fa, fb, fc = map(_docs_fingerprint, (a, b, c))
    assert fa != fb and fa != fc and fb != fc
    # end-to-end: re-running curate after a text edit recomputes
    out = str(tmp_path / "c")
    pr = CurateParams(min_tokens=1, pack_budget=64)
    curate(spark, a, out, pr)
    rerun = curate(spark, b, out, pr)
    assert not any(m["resumed"] for m in rerun)
