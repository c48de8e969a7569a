"""Data-selection operators (functions/selection.py): DSIR importance
weights + deterministic mixture balancing.

The full DuckDB oracle comparison for the registered queries runs in
test_correctness.py (parametrized over all_queries); here we pin the
semantics on hand-built frames where the expected answer is computable by
eye, plus the plan shapes that must survive 100 TB."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL
from metarank_spark.functions import selection as sel

SEQ_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def _seq(spark, rows):
    return spark.createDataFrame(
        [(str(i), t, len(t), s) for i, (t, s) in enumerate(rows)], SEQ_SCHEMA
    )


def test_bigram_hash_matches_python(spark):
    toks = [3, 7, 11, 13]
    df = spark.createDataFrame([(toks,)], "tokens array<int>")
    got = df.select(sel.bigram_hash_expr(F.col("tokens")).alias("h")).head()["h"]
    exp = [(a * 131 + b) % sel.N_BUCKETS for a, b in zip(toks, toks[1:])]
    assert got == exp
    # <2 tokens → no bigrams
    one = spark.createDataFrame([([5],)], "tokens array<int>")
    assert one.select(sel.bigram_hash_expr(F.col("tokens")).alias("h")).head()["h"] == []


def test_importance_weights_prefer_target_domain(spark):
    # two disjoint vocab domains: target docs repeat (1,2), raw-only docs
    # repeat (900001, 900002) — a doc from the target vocab must score
    # strictly higher than a raw-vocab doc of the same length
    rows = (
        [([1, 2] * 5, "tgt")] * 3
        + [([900001, 900002] * 5, "web")] * 3
        + [([1, 2] * 5, "web")]        # web doc that LOOKS like target
    )
    out = {
        (r["doc_id"], r["source"]): r["log_iw"]
        for r in sel.log_importance_weights(
            _seq(spark, rows), ("tgt",)).collect()
    }
    tgt_like = [v for (d, s), v in out.items() if d in ("0", "6")]
    raw_like = [v for (d, s), v in out.items() if d == "3"]
    assert min(tgt_like) > max(raw_like)
    # the look-alike web doc scores EQUAL to real target docs (same
    # features) — selection is content-based, not label-based
    assert out[("6", "web")] == out[("0", "tgt")]


def test_importance_weight_value_exact(spark):
    # one target doc [1,2] (bigram h1), one raw doc [5,6] (bigram h2):
    # hand-computed add-1 smoothed log ratio
    rows = [([1, 2], "tgt"), ([5, 6], "web")]
    out = {r["doc_id"]: r["log_iw"]
           for r in sel.log_importance_weights(_seq(spark, rows), ("tgt",)).collect()}
    b = float(sel.N_BUCKETS)
    # corpus: 2 bigrams total, target: 1; h1: cr=1 ct=1; h2: cr=1 ct=0
    exp0 = math.log((1 + 1) / (1 + b)) - math.log((1 + 1) / (2 + b))
    exp1 = math.log((0 + 1) / (1 + b)) - math.log((1 + 1) / (2 + b))
    assert out["0"] == pytest.approx(exp0, abs=1e-6)
    assert out["1"] == pytest.approx(exp1, abs=1e-6)
    assert out["0"] > 0 > out["1"]


def test_mixture_sample_keeps_smallest_source_whole(spark):
    # source budgets: "small" has the fewest tokens → rate 1.0 → every
    # small doc survives; the big source thins deterministically
    rows = [([1] * 4, "small")] * 5 + [([2] * 40, "big")] * 50
    seq = _seq(spark, rows)
    kept = sel.mixture_sample(seq).collect()
    small = [r for r in kept if r["source"] == "small"]
    assert len(small) == 5
    big_toks = sum(r["n_tok"] for r in kept if r["source"] == "big")
    # expectation is the small source's budget (20 tokens); Bernoulli
    # noise at n=50 docs is wide, so just bound it away from "no thinning"
    assert big_toks < 2000
    # deterministic: a second run produces the identical keep set
    again = sel.mixture_sample(seq).collect()
    assert sorted(map(tuple, kept)) == sorted(map(tuple, again))


def test_mixture_plan_agrees_with_sample(spark):
    rows = [([1] * 4, "small")] * 5 + [([2] * 40, "big")] * 50
    seq = _seq(spark, rows)
    kept = sel.mixture_sample(seq).collect()
    plan = {r["source"]: r for r in sel.mixture_plan(seq).collect()}
    for src in ("small", "big"):
        docs = [r for r in kept if r["source"] == src]
        assert plan[src]["kept_docs"] == len(docs)
        assert plan[src]["kept_toks"] == sum(r["n_tok"] for r in docs)
    assert plan["small"]["rate"] == 1.0
    assert plan["small"]["budget_toks"] == plan["big"]["budget_toks"] == 20


def test_selection_plan_shapes(spark):
    """100 TB gates: LM/totals joins must be broadcasts (build sides are
    ≤N_BUCKETS / |sources| rows), no sort-merge join, no window, and the
    scoring pass is ONE corpus scan (the LM barrier keeps Catalyst from
    re-expanding the tokenize chain under each consumer)."""
    import __spark_entry__ as em

    # r6: importance_weight's scoring pass reads the materialized
    # per-(doc, bucket) count table (the single-corpus-scan barrier), so
    # its final plan holds ZERO parquet scans — the one scan lives in the
    # checkpointed subtree; mixture_sample keeps its single direct scan
    for name, scans in (("importance_weight", 0), ("mixture_sample", 1)):
        df = em.all_queries()[name](spark, SF_SMALL)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" not in plan, name
        assert "Window" not in plan, name
        assert "BroadcastHashJoin" in plan, name
        assert final.count("FileScan parquet") == scans, name
        if scans == 0:
            assert "Scan ExistingRDD" in final, name
