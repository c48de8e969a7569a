"""Data selection for LLM training corpora — DSIR-style hashed n-gram
importance weights and deterministic mixture balancing.

Both operators are pure Spark higher-order-function / aggregate plans
(JVM-side, no Python on the data path) and SQL-expressible, so each has a
full DuckDB oracle like the rest of the curation layer.

Scale shape (the part that must survive 100 TB):

- ``log_importance_weights``: the two hashed-n-gram language models are
  frames of at most ``n_buckets`` rows (default 8192) regardless of corpus
  size — built by one hash aggregation each over the exploded bigram
  stream (map-side partial combine does the heavy lifting), then joined
  back to the stream with an explicit ``broadcast()``. No windows, no
  skew-sensitive keys: the join key is the bucket id, and a hot bucket
  splits fine under AQE because the build side is a broadcast.
- ``mixture_sample``: per-source token totals are a |sources|-row frame;
  the acceptance test is integer-only (``hash * toks_s < min_toks * M``)
  so Spark and any oracle engine agree bit-for-bit — no float threshold
  can flip a boundary doc between engines. One aggregation + one
  broadcast join + one filter; the filter arrives with the scan under
  whole-stage codegen.

Public grounding: importance resampling with hashed n-gram features is the
DSIR recipe (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling" — target/raw bag-of-hashed-ngrams LMs, per-example
log importance weight = sum of per-feature log ratios). Mixture balancing
by per-source acceptance rates is standard corpus curation (e.g. the
uniform/token-budget mixtures in public LLM data recipes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# bucket count for the hashed-bigram feature space (DSIR uses 10^4; a
# power of two keeps the modulo cheap and the LM frame broadcastable)
N_BUCKETS = 8192
# multiplier for the bigram rolling hash — matches functions/text's word
# hash so the whole token path shares one hash family
BIGRAM_MULT = 131
# acceptance-rate denominator for mixture sampling; small enough that
# hash * per-source-token-totals stays far from int64 overflow at 100 TB
# (1e4 * ~1e13 tokens/source = 1e17 << 9.2e18)
SAMPLE_M = 10_000
# Knuth multiplicative hash over the doc id — the same deterministic
# accept family engine.sample_accept_expr uses for event sampling
HASH_MOD = 1_000_003
HASH_MULT = 2_654_435_761


def bigram_hash_expr(tokens: Column, n_buckets: int = N_BUCKETS) -> Column:
    """array<int> token ids → array<int> hashed-bigram bucket ids
    (length n-1): ``(t_i * 131 + t_{i+1}) mod n_buckets``. Pure zip_with
    over two slices — JVM-side, no explode until the caller asks."""
    n = F.size(tokens)
    return F.zip_with(
        F.slice(tokens, 1, n - 1),
        F.slice(tokens, 2, n - 1),
        lambda a, b: ((a.cast("long") * BIGRAM_MULT + b) % n_buckets).cast("int"),
    )


def doc_accept_expr(doc_id: Column, toks_src: Column, min_toks: Column,
                    m: int = SAMPLE_M) -> Column:
    """Deterministic per-doc Bernoulli(min_toks/toks_src) acceptance,
    integer-exact: accept iff ``hash(doc_id) * toks_src < min_toks * m``
    with ``hash`` uniform on [0, m). Equivalent to comparing
    hash/m < rate but with no float threshold, so every engine computes
    the identical keep set."""
    h = ((doc_id.cast("long") % HASH_MOD) * HASH_MULT) % m
    return h * toks_src.cast("long") < min_toks.cast("long") * m


def bigram_lm_weights(
    seq: DataFrame,
    target_sources: tuple[str, ...],
    n_buckets: int = N_BUCKETS,
) -> tuple[DataFrame, Column]:
    """The DSIR language-model core: per-bucket log ratio weights
    ``(h, w)`` (≤n_buckets rows — broadcastable at any corpus size) plus
    the default weight of a bucket NEVER seen in the estimation corpus
    (``ln((Nr+B)/(Nt+B))`` — what add-1 smoothing assigns to count-0/
    count-0), needed when a FROZEN LM scores later deltas containing new
    buckets. The frame is localCheckpointed: totals and weights both
    derive from it, and without the barrier Catalyst re-expands the
    corpus scan under each consumer (measured: 5 scans of the tokenize
    chain instead of the algorithm's minimum 2)."""
    big = (
        seq.filter(F.size("tokens") >= 2)
        .select(
            "source",
            F.explode(bigram_hash_expr(F.col("tokens"), n_buckets)).alias("h"),
        )
    )
    is_t = F.col("source").isin(*target_sources)
    lm = big.groupBy("h").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(is_t, 1).otherwise(0)).alias("ct"),
    ).localCheckpoint(eager=True)
    totals = lm.agg(
        F.sum("cr").cast("double").alias("nr"),
        F.sum("ct").cast("double").alias("nt"),
    )
    b = float(n_buckets)
    w = lm.crossJoin(F.broadcast(totals)).select(
        "h",
        (
            F.log((F.col("ct") + 1) / (F.col("nt") + b))
            - F.log((F.col("cr") + 1) / (F.col("nr") + b))
        ).alias("w"),
    )
    default_w = totals.select(
        F.log((F.col("nr") + b) / (F.col("nt") + b)).alias("w")
    )
    return w, default_w


def log_importance_weights(
    seq: DataFrame,
    target_sources: tuple[str, ...],
    n_buckets: int = N_BUCKETS,
    round_dp: int = 6,
) -> DataFrame:
    """DSIR log importance weight per document.

    Features are hashed token bigrams; the target LM is the bag of
    bigrams from ``target_sources`` docs, the raw LM the whole corpus,
    both add-1 smoothed over ``n_buckets``:

        log_iw(doc) = sum over doc bigrams h of
            ln((cnt_t[h]+1)/(N_t+B)) - ln((cnt_r[h]+1)/(N_r+B))

    High log_iw = looks like the target domain. Output:
    ``(doc_id, source, n_bigrams, log_iw)`` for every doc with ≥1 bigram;
    log_iw rounded (sum order differs per engine).

    Plan (r6 single-scan shape): ONE corpus scan — the exploded bigram
    stream folds into per-(doc, bucket) counts behind a materialization
    barrier, and BOTH the LM estimate and the scoring pass derive from
    that table. The old estimate-then-score tree scanned (and re-ran the
    tokenize + bigram folds over) the corpus twice; the fused count
    table is doc×distinct-bucket rows (≤n_buckets per doc) and replaces
    every later corpus touch. Per-bucket weights are identical
    expressions; the per-doc sum becomes the count-weighted sum of the
    same addends (same round_dp absorbing engine summation order, as the
    docstring above already required)."""
    big = (
        seq.filter(F.size("tokens") >= 2)
        .select(
            "doc_id", "source",
            F.explode(bigram_hash_expr(F.col("tokens"), n_buckets)).alias("h"),
        )
    )
    dt = (
        big.groupBy("doc_id", "source", "h")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    is_t = F.col("source").isin(*target_sources)
    lm = dt.groupBy("h").agg(
        F.sum("c").alias("cr"),
        F.sum(F.when(is_t, F.col("c")).otherwise(0)).alias("ct"),
    ).localCheckpoint(eager=False)
    totals = lm.agg(
        F.sum("cr").cast("double").alias("nr"),
        F.sum("ct").cast("double").alias("nt"),
    )
    b = float(n_buckets)
    w = lm.crossJoin(F.broadcast(totals)).select(
        "h",
        (
            F.log((F.col("ct") + 1) / (F.col("nt") + b))
            - F.log((F.col("cr") + 1) / (F.col("nr") + b))
        ).alias("w"),
    )
    return (
        dt.join(F.broadcast(w), "h")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.round(F.sum(F.col("c") * F.col("w")), round_dp).alias("log_iw"),
        )
    )


def mixture_sample(seq: DataFrame, m: int = SAMPLE_M) -> DataFrame:
    """Deterministic balanced-mixture downsampling: every source is
    Bernoulli-thinned to (in expectation) the token budget of the
    SMALLEST source, so the kept corpus is a uniform source mixture —
    the standard rebalancing step before LLM pre-training.

    Acceptance is doc-level (documents stay intact) and integer-exact
    (doc_accept_expr), so the keep set is reproducible across engines,
    runs, and cluster sizes. Output: kept ``(doc_id, source, n_tok)``."""
    tot = seq.groupBy("source").agg(
        F.sum("n_tok").cast("long").alias("__toks")
    ).localCheckpoint(eager=True)  # |sources| rows; mn derives scan-free
    mn = tot.agg(F.min("__toks").alias("__mn"))
    return (
        seq.join(F.broadcast(tot), "source")
        .crossJoin(F.broadcast(mn))
        .filter(doc_accept_expr(F.col("doc_id"), F.col("__toks"), F.col("__mn"), m))
        .select("doc_id", "source", "n_tok")
    )


def mixture_plan(seq: DataFrame, m: int = SAMPLE_M) -> DataFrame:
    """The audit twin of mixture_sample: per-source totals, the
    integer-exact acceptance rate (as num/den plus a rounded double),
    and the kept doc/token counts — what a pipeline operator logs before
    committing a mixture. One aggregation over the kept frame joined to
    the totals frame (both |sources|-row)."""
    tot = seq.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum("n_tok").cast("long").alias("toks"),
    ).localCheckpoint(eager=True)  # |sources| rows (see mixture_sample)
    mn = tot.agg(F.min("toks").alias("__mn"))
    kept = (
        seq.join(F.broadcast(tot.select("source", F.col("toks").alias("__toks"))),
                 "source")
        .crossJoin(F.broadcast(mn))
        .filter(doc_accept_expr(F.col("doc_id"), F.col("__toks"), F.col("__mn"), m))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("kept_docs"),
            F.sum("n_tok").cast("long").alias("kept_toks"),
        )
    )
    return (
        tot.crossJoin(F.broadcast(mn))
        .join(kept, "source", "left")
        .select(
            "source", "docs", "toks",
            F.col("__mn").alias("budget_toks"),
            F.round(F.least(F.lit(1.0), F.col("__mn") / F.col("toks")), 6)
            .alias("rate"),
            F.coalesce(F.col("kept_docs"), F.lit(0)).alias("kept_docs"),
            F.coalesce(F.col("kept_toks"), F.lit(0)).alias("kept_toks"),
        )
    )
