"""Driver contract for the spark-graft builder (PySpark target).

Each entry in ``queries()`` is a Spark-first implementation of one operator
from SURVEY.md §2 (the Metarank feature inventory re-expressed over the
driver's event/document/embedding tables); ``oracle_sql()`` carries the
DuckDB-checkable ANSI-SQL statement with identical column names/semantics.

All time math is epoch-millis arithmetic (no timezone-dependent date
functions) so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# robust against being imported by file path (driver-side importlib)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metarank_spark import operators as ops
from metarank_spark.functions import dedup as dd
from metarank_spark.functions import similarity as sim
from metarank_spark.functions import selection as sel
from metarank_spark.functions import text as tx
from metarank_spark.plans import asof_join, sessionize
from metarank_spark.plans.sessionize import session_bounds
from metarank_spark.schema import load_documents, load_embeddings, load_events

MS_DAY = 86_400_000
GAP_MS = 30 * 60 * 1000

# Shared DuckDB prelude: canonical event stream (mirrors schema.load_events)
EV = (
    "WITH ev AS (SELECT event_id::BIGINT AS event_id, epoch_ms(ts) AS ts_ms, "
    "user_id::BIGINT AS user_id, event_type, value::DOUBLE AS value FROM events)"
)

KEYS = "event_id, user_id, ts_ms"
W_ROWS = (
    "PARTITION BY user_id ORDER BY ts_ms, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
)
W_ROWS_STRICT = (
    "PARTITION BY user_id ORDER BY ts_ms, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
)


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_events(spark, sf_dir)


def _keys(df: DataFrame, *extra: str) -> DataFrame:
    return df.select("event_id", "user_id", "ts_ms", *extra)


# --------------------------------------------------------------------------
# feature-engine queries over the event stream
# --------------------------------------------------------------------------

def q_interaction_count(spark: SparkSession, sf: str) -> DataFrame:
    """Lifetime interaction count (InteractionCountFeature.scala:33-59)."""
    return _keys(ops.interaction_count(_ev(spark, sf), "click", out="clicks_cum"), "clicks_cum")


def q_last_scalar(spark: SparkSession, sf: str) -> DataFrame:
    """ScalarFeature / number extractor: as-of last purchase value
    (NumberFeature.scala:37-94, MemScalarFeature.scala:14-17)."""
    df = ops.last_scalar(
        _ev(spark, sf),
        F.when(F.col("event_type") == "purchase", F.col("value")),
        out="last_purchase",
    )
    return _keys(df, "last_purchase")


def q_lag_lead(spark: SparkSession, sf: str) -> DataFrame:
    """lag/lead within the entity's time-sorted stream."""
    df = ops.lag_lead(_ev(spark, sf))
    return _keys(df, "value_lag1", "value_lead1", "ts_delta_ms")


def q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization, 30-min event-time gap
    (TrainBuffer.scala:33-148, CoreConfig.scala:22)."""
    return _keys(sessionize(_ev(spark, sf), gap_ms=GAP_MS), "session_idx")


def q_sessionize_salted(spark: SparkSession, sf: str) -> DataFrame:
    """The hot-entity (chunk-decomposed) sessionizer
    (plans/sessionize.salted_sessionize) checked against the SAME DuckDB
    oracle as `sessionize` — the salted plan is oracle-verified
    end-to-end, not just property-tested against its Spark twin."""
    from metarank_spark.plans.sessionize import salted_sessionize

    return _keys(
        salted_sessionize(
            _ev(spark, sf), gap_ms=GAP_MS, chunk_ms=3 * MS_DAY
        ),
        "session_idx",
    )


def q_interaction_count_salted(spark: SparkSession, sf: str) -> DataFrame:
    """The salted two-pass prefix counter
    (plans/prefix.salted_cumulative_sum) against interaction_count's
    oracle — same rationale as sessionize_salted."""
    from metarank_spark.plans.prefix import salted_cumulative_sum

    clicks = F.when(F.col("event_type") == "click", 1).otherwise(0)
    df = salted_cumulative_sum(
        _ev(spark, sf), clicks, entity="user_id",
        order=("ts_ms", "event_id"), chunk_ms=3 * MS_DAY, out="clicks_cum",
    )
    return _keys(
        df.withColumn("clicks_cum", F.col("clicks_cum").cast("long")),
        "clicks_cum",
    )


def q_incremental_count(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental backfill (operators/incremental.py): fold ONLY the
    delta (events after the mid-range cut) plus a per-entity counter
    offset snapshotted from history — and land on numbers identical to a
    full-history replay. The offset mechanism is the same one
    ``IncrementalSnapshot.offsets`` uses; the oracle recomputes the
    running count over the FULL stream and restricts to post-cut rows,
    so a hash match proves the incremental fold is exact."""
    ev = _ev(spark, sf)
    mid = ev.agg(
        F.floor((F.min("ts_ms") + F.max("ts_ms")) / 2).cast("long")
    ).collect()[0][0]  # scalar-only driver read (1 row)
    hist = ev.filter(F.col("ts_ms") <= mid)
    delta = ev.filter(F.col("ts_ms") > mid)
    offsets = (
        hist.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("__off"))
    )
    run = ops.interaction_count(delta, "click", out="clicks_cum")
    out = (
        run.join(offsets, "user_id", "left")
        .withColumn(
            "clicks_cum",
            (F.col("clicks_cum") + F.coalesce(F.col("__off"), F.lit(0)))
            .cast("long"),
        )
        .drop("__off")
    )
    return _keys(out, "clicks_cum")


def q_incremental_count_ttl(spark: SparkSession, sf: str) -> DataFrame:
    """TTL'd incremental counter (operators/incremental.py TTL lift): the
    snapshot retains each user's LAST click — so replayed freshness
    decisions equal the full stream's — plus a count offset for the rest
    of history; the offset is added only where the replayed TTL-masked
    value is positive (a stale key reads 0 in BOTH runs, and must not be
    resurrected by the offset). The oracle recomputes the TTL'd running
    count over the FULL stream and restricts to post-cut rows, so a hash
    match proves the gated incremental fold is exact."""
    ttl = 3 * MS_DAY
    ev = _ev(spark, sf)
    mid = ev.agg(
        F.floor((F.min("ts_ms") + F.max("ts_ms")) / 2).cast("long")
    ).collect()[0][0]  # scalar-only driver read (1 row)
    hist = ev.filter(F.col("ts_ms") <= mid)
    delta = ev.filter(F.col("ts_ms") > mid)
    clicks = hist.filter(F.col("event_type") == "click")
    wl = Window.partitionBy("user_id").orderBy(
        F.col("ts_ms").desc(), F.col("event_id").desc())
    tail = (
        clicks.withColumn("__rn", F.row_number().over(wl))
        .filter(F.col("__rn") == 1).drop("__rn")
    )
    offsets = clicks.groupBy("user_id").agg(
        (F.count(F.lit(1)) - 1).alias("__off"))
    stream = tail.unionByName(delta)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cnt = F.sum(
        F.when(F.col("event_type") == "click", 1).otherwise(0)).over(w)
    last_w = F.max(
        F.when(F.col("event_type") == "click", F.col("ts_ms"))).over(w)
    out = stream.join(offsets, "user_id", "left").select(
        "event_id", "user_id", "ts_ms",
        F.when(
            (F.col("ts_ms") - last_w) <= F.lit(ttl),
            cnt + F.when(
                cnt > 0, F.coalesce(F.col("__off"), F.lit(0))
            ).otherwise(F.lit(0)),
        ).otherwise(F.lit(0)).cast("long").alias("clicks_ttl"),
    )
    return out.filter(F.col("ts_ms") > mid)


def q_session_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-session bounds/counts on top of gap sessionization."""
    s = sessionize(_ev(spark, sf), gap_ms=GAP_MS)
    return session_bounds(s)


def q_window_count(spark: SparkSession, sf: str) -> DataFrame:
    """window_count periods=[7], 24h buckets
    (WindowInteractionCountFeature.scala:25-46)."""
    return _keys(ops.window_count(_ev(spark, sf), "click", [7]), "wcnt7")


def q_window_count_multi(spark: SparkSession, sf: str) -> DataFrame:
    """window_count periods=[1,7,30] — the multi-period vector, one column
    per period (vector assembled per MValue.VectorValue)."""
    return _keys(
        ops.window_count(_ev(spark, sf), "click", [1, 7, 30]), "wcnt1", "wcnt7", "wcnt30"
    )


def q_rate(spark: SparkSession, sf: str) -> DataFrame:
    """rate = clicks/views over trailing 7+1 day buckets
    (RateFeature.scala:313-330)."""
    return _keys(ops.rate(_ev(spark, sf), "click", "view", [7]), "rate7")


def q_rate_normalized(spark: SparkSession, sf: str) -> DataFrame:
    """Bayesian-normalized rate, weight=10 (RateFeature.scala:331-355):
    (w + top)/(w*(globalBottom/globalTop) + bottom), global counts via
    two-level agg + broadcast (GlobalScope skew handling)."""
    df = ops.rate_normalized(_ev(spark, sf), "click", "view", [7], weight=10.0)
    return _keys(df, "nrate7")


def q_rate_field_scoped(spark: SparkSession, sf: str) -> DataFrame:
    """Field-scoped rate (ItemFieldScope, Scope.scala:43-47 /
    RateFeature.scala:103-217): the counter entity is a FIELD VALUE, not
    the id — here the user's segment (props.k of their last signup,
    strictly before), so the rate pools across every user in the same
    segment. Increments land in the segment the user was in AT the
    interaction; each view reads its user's segment as-of the view;
    unknown segment → missing.

    A segment key is LOW-cardinality — every segment is a hot entity at
    scale — so no event-scale window may partition by the bare segment.
    Plan (one fused salted pass, round-4 shape): one window to derive
    the segment (shuffle on the high-cardinality user key), then ONE
    (segment, day) window computing both strict within-chunk sums, and
    ONE per-(segment, day) aggregate whose day rows serve double duty —
    a strict day-prefix gives the chunk offsets (exact reassembly of the
    running sums) and a ≤ day−8 RANGE prefix gives the older-than-window
    totals — joined back in a single (AQE-broadcast) join. Same outputs
    as the single-window form (hash-pinned oracle); no event-scale frame
    partitions by the bare segment (plan gate in test_plans_quality).
    The previous form chained two generic salted passes + a third
    aggregate over their joined output, recomputing the segment window
    ~6x (Catalyst copies trees); this runs it twice."""
    ev = load_events(spark, sf, with_props=True)
    k_sig = F.when(
        F.col("event_type") == "signup", F.get_json_object("props", "$.k")
    )
    w_user = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_c = F.when(F.col("event_type") == "click", 1).otherwise(0)
    is_v = F.when(F.col("event_type") == "view", 1).otherwise(0)
    staged = ev.select(
        "event_id", "user_id", "ts_ms", "event_type",
        F.last(k_sig, ignorenulls=True).over(w_user).alias("fscope"),
        F.floor(F.col("ts_ms") / F.lit(MS_DAY)).alias("__salt"),
        is_c.alias("__c"), is_v.alias("__v"),
    ).localCheckpoint(eager=False)
    # ^ r6 barrier: the staged frame (segment derived by the user-key
    # window) feeds BOTH the within-day running sums and the per-day
    # aggregate — without it Catalyst re-expands the scan + user window
    # under each consumer (two full event passes; measured in the before
    # plan: 2 parquet scans). Blocks GC-release with the frame; at
    # warehouse scale write the staged frame out instead.
    # strict within-(segment, day) running sums — bounded tasks even for
    # a segment holding the whole corpus
    w_in = (
        Window.partitionBy("fscope", "__salt")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = staged.select(
        "*",
        F.coalesce(F.sum("__c").over(w_in), F.lit(0)).alias("win_c"),
        F.coalesce(F.sum("__v").over(w_in), F.lit(0)).alias("win_v"),
    )
    # per-(segment, day) totals: one aggregate row per segment-day —
    # never event-scale; both prefix frames read from it
    per_day = staged.groupBy("fscope", "__salt").agg(
        F.sum("__c").alias("__dc"), F.sum("__v").alias("__dv")
    )
    w_off = (
        Window.partitionBy("fscope").orderBy("__salt")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_old = (
        Window.partitionBy("fscope").orderBy("__salt")
        .rangeBetween(Window.unboundedPreceding, -8)
    )
    aux = per_day.select(
        "fscope", "__salt",
        F.coalesce(F.sum("__dc").over(w_off), F.lit(0)).alias("off_c"),
        F.coalesce(F.sum("__dv").over(w_off), F.lit(0)).alias("off_v"),
        F.coalesce(F.sum("__dc").over(w_old), F.lit(0)).alias("older_c"),
        F.coalesce(F.sum("__dv").over(w_old), F.lit(0)).alias("older_v"),
    )
    d = staged.join(aux, ["fscope", "__salt"], "left")
    top7 = (F.col("off_c") + F.col("win_c")) - F.col("older_c")
    bot7 = (F.col("off_v") + F.col("win_v")) - F.col("older_v")
    known = F.col("fscope").isNotNull()
    out = d.select(
        "event_id", "user_id", "ts_ms", "event_type", "fscope",
        F.when(known, top7).cast("long").alias("top7_fs"),
        F.when(known, bot7).cast("long").alias("bot7_fs"),
        F.when(known, top7 / F.nullif(bot7.cast("double"), F.lit(0.0))).alias("rate7_fs"),
    )
    return out.filter(F.col("event_type") == "view").drop("event_type")


def q_asof_snapshot(spark: SparkSession, sf: str) -> DataFrame:
    """FLAGSHIP: strictly-before point-in-time snapshot at every 'view'
    (= ranking) event — zero temporal leakage. Mirrors the snapshot
    ordering contract of MetarankFlow.scala:31-55 / TrainBuffer.scala:51-71:
    the ranking sees no state from itself or later (even same-ts) events.
    """
    ev = _ev(spark, sf)
    day = F.floor(F.col("ts_ms") / F.lit(MS_DAY))
    w_strict = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_older = (
        Window.partitionBy("user_id")
        .orderBy(day)
        .rangeBetween(Window.unboundedPreceding, -8)
    )
    is_click = F.when(F.col("event_type") == "click", 1).otherwise(0)
    is_view = F.when(F.col("event_type") == "view", 1).otherwise(0)
    snap = ev.select(
        "event_id",
        "user_id",
        "ts_ms",
        "event_type",
        F.coalesce(F.sum(is_click).over(w_strict), F.lit(0)).cast("long").alias("clicks_before"),
        (
            F.coalesce(F.sum(is_view).over(w_strict), F.lit(0))
            - F.coalesce(F.sum(is_view).over(w_older), F.lit(0))
        ).cast("long").alias("views7_before"),
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("value")), ignorenulls=True
        ).over(w_strict).alias("last_purchase_before"),
    )
    return snap.filter(F.col("event_type") == "view").drop("event_type")


def q_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """Standalone as-of join primitive: each click ← latest strictly-earlier
    purchase value of the same user (plans/asof.py union-merge; the scalable
    replacement for an O(n*m) range join)."""
    ev = _ev(spark, sf)
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts_ms")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_ms", F.col("event_id").alias("pid"), "value"
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_seq="event_id",
        right_seq="pid",
        values=["value"],
        strict=True,
    )
    return out.select("event_id", "user_id", "ts_ms", F.col("value_asof"))


def q_bounded_list(spark: SparkSession, sf: str) -> DataFrame:
    """BoundedListFeature: last 3 event types within 24h, newest first
    (MemBoundedList.scala:18-37 evict-on-write semantics)."""
    df = ops.bounded_list_string(
        _ev(spark, sf), "event_type", count=3, duration_ms=MS_DAY, out="recent"
    )
    return _keys(df, "recent")


def q_rank_eval(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking-eval metrics over the driver stream — NDCG@10 and MRR per
    user, with ltrlib semantics (the reference's eval library,
    LambdaMARTRanker.scala:116-122: gain 2^rel - 1 ≡ rel for binary
    labels, log2(pos+1) discount, nolabels → 1.0): candidates = the
    user's view/click events ranked by `value` (the score analog),
    relevant = clicks. Two same-partition windows + one grouped
    aggregation — a single user-hash exchange at any scale."""
    ev = load_events(spark, sf).filter(F.col("event_type").isin("view", "click"))
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    wi = Window.partitionBy("user_id").orderBy(F.col("rel").desc(), "event_id")
    d = ev.select(
        "user_id", "event_id",
        (F.col("event_type") == "click").cast("double").alias("rel"),
        "value",
    ).select(
        "user_id", "event_id", "rel",
        F.row_number().over(w).alias("pos"),
    ).select(
        "user_id", "rel", "pos",
        F.row_number().over(wi).alias("ipos"),
    )
    dcg = F.sum(F.when(F.col("pos") <= 10, F.col("rel") / F.log2(F.col("pos") + 1)))
    idcg = F.sum(F.when(F.col("ipos") <= 10, F.col("rel") / F.log2(F.col("ipos") + 1)))
    first_rel = F.min(F.when(F.col("rel") == 1.0, F.col("pos")))
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.round(
            F.when(idcg.isNull() | (idcg == 0), F.lit(1.0))
            .otherwise(F.coalesce(dcg, F.lit(0.0)) / idcg),
            6,
        ).alias("ndcg10"),
        F.round(F.coalesce(F.lit(1.0) / first_rel, F.lit(0.0)), 6).alias("mrr"),
    )


def q_rank_krr(spark: SparkSession, sf: str) -> DataFrame:
    """Kendall rank correlation between arrival order and score order per
    user — the per-request ``krr`` the reference's reranker logs
    (ml/Ranker.scala:71, util/KendallCorrelation.scala:8-15), over the
    driver stream: original order = (ts, event_id), reranked order =
    `value` desc. One user-hash exchange feeding two same-partition
    windows + the grouped O(n²)-array inversion count
    (operators/ranker.kendall_krr) — no UDF, no second shuffle."""
    from metarank_spark.operators.ranker import kendall_krr

    ev = load_events(spark, sf).filter(
        F.col("event_type").isin("view", "click"))
    worig = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    wnew = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), "event_id")
    d = ev.select(
        "user_id",
        (F.row_number().over(worig) - 1).alias("position"),
        (F.row_number().over(wnew) - 1).alias("new_position"),
    )
    out = kendall_krr(d, ranking_col="user_id")
    return out.select("user_id", F.round("krr", 6).alias("krr"))


def q_interacted_with(spark: SparkSession, sf: str) -> DataFrame:
    """InteractedWith analog over the driver stream (engine.py
    InteractedWith; feature/InteractedWithFeature.scala two-stage read):
    the user's bounded list of last-3 clicked `props.k` values strictly
    before each view, and the multiset overlap with the view's own k.
    One window pass on the user partition — the visitor-profile read of
    the reference expressed as a strict collect + slice, no join."""
    ev = load_events(spark, sf, with_props=True)
    k = F.get_json_object("props", "$.k")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = F.collect_list(F.when(F.col("event_type") == "click", k)).over(w)
    d = ev.select(
        "event_id", "user_id", "ts_ms", "event_type",
        k.alias("k"), arr.alias("ks"),
    )
    last3 = F.when(F.size("ks") <= 3, F.col("ks")).otherwise(
        F.slice("ks", F.size("ks") - 2, 3)
    )
    return d.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts_ms",
        F.array_join(last3, ",").alias("recent_ks"),
        F.size(F.filter(last3, lambda x: x == F.col("k")))
        .cast("long").alias("overlap"),
    )


def q_stats_window(spark: SparkSession, sf: str) -> DataFrame:
    """StatsEstimator over a 10-sample pool of purchase values
    (model/Feature.scala:213-234, sampleRate pinned to 1)."""
    purchases = _ev(spark, sf).filter(F.col("event_type") == "purchase")
    return _keys(
        ops.stats_window(purchases, "value", pool=10),
        "stat_min", "stat_max", "stat_avg", "stat_n",
    )


def q_freq_share(spark: SparkSession, sf: str) -> DataFrame:
    """FreqEstimator with sampleRate=1: share of clicks in the last-10 pool
    (model/Feature.scala:112-126)."""
    return _keys(ops.freq_share(_ev(spark, sf), "click", pool=10), "freq_share")


def q_stats_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """StatsEstimator percentiles over the 10-sample pool (exact linear
    interpolation, Guava Quantiles parity — model/Feature.scala:213-234).
    Complements `stats_window` (min/max/avg) with the p50/p90 read."""
    ev = _ev(spark, sf).filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return _keys(
        ev.withColumns({
            "stat_p50": F.round(F.percentile(F.col("value"), F.lit(0.5)).over(w), 6),
            "stat_p90": F.round(F.percentile(F.col("value"), F.lit(0.9)).over(w), 6),
        }),
        "stat_p50", "stat_p90",
    )


def q_freq_share_sampled(spark: SparkSession, sf: str) -> DataFrame:
    """FreqEstimator with sampleRate=0.5 (model/Feature.scala:249
    shouldSample): the pool sees only hash-accepted writes; every event
    reads the latest at-or-before pool state via the as-of merge."""
    df = ops.freq_share(
        _ev(spark, sf), "click", pool=10, sample_rate=0.5, out="freq_share_s"
    )
    return _keys(df, "freq_share_s")


def q_map_feature(spark: SparkSession, sf: str) -> DataFrame:
    """MapFeature final state: latest value per (user, event_type)
    (MemMapFeature.scala:12-24)."""
    return ops.map_feature_last(_ev(spark, sf))


def q_item_age(spark: SparkSession, sf: str) -> DataFrame:
    """item_age: seconds since the entity's last 'signup' (metadata update),
    strictly before (ItemAgeFeature.scala:41-84)."""
    df = ops.item_age_sec(_ev(spark, sf), F.col("event_type") == "signup", out="age_sec")
    return _keys(df, "age_sec")


def q_local_time(spark: SparkSession, sf: str) -> DataFrame:
    """local_time extractor (LocalDateTimeFeature.scala): hour-of-day and
    ISO day-of-week (getDayOfWeek, 1=Monday..7=Sunday) as pure epoch
    arithmetic, timezone-free."""
    ev = _ev(spark, sf)
    return ev.select(
        "event_id",
        "user_id",
        "ts_ms",
        F.floor((F.col("ts_ms") % MS_DAY) / F.lit(3_600_000)).cast("long").alias("hour_utc"),
        (((F.floor(F.col("ts_ms") / F.lit(MS_DAY)) + 3) % 7) + 1).cast("long").alias("dow"),
    )


def q_split_hold_last(spark: SparkSession, sf: str) -> DataFrame:
    """SplitStrategy hold_last: each user's latest event is test, rest train
    (main/command/train/SplitStrategy.scala:62-80)."""
    ev = _ev(spark, sf)
    w = Window.partitionBy("user_id").orderBy(F.col("ts_ms").desc(), F.col("event_id").desc())
    return ev.select(
        "event_id",
        "user_id",
        F.when(F.row_number().over(w) == 1, F.lit("test")).otherwise(F.lit("train")).alias("split"),
    )


def q_split_time(spark: SparkSession, sf: str) -> DataFrame:
    """SplitStrategy time split (SplitStrategy.scala:42-60): first 80% of
    events by exact ts quantile → train."""
    from metarank_spark.operators.splits import split_time

    ev = _ev(spark, sf)
    return split_time(ev, 0.8).select("event_id", "user_id", "split")


def q_data_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Pre-flight validation aggregates (validate/checks/* analog for a
    generic event table): row/id/null/order integrity. Ordering violations
    use the range-partitioned check_ordering (lag within seq ranges +
    boundary-pair compare) — no unpartitioned global lag window, so the
    full event table never lands in one partition."""
    from metarank_spark.events import order_violation_count

    ev = _ev(spark, sf)
    agg = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("event_id").alias("n_ids"),
        F.sum(F.col("user_id").isNull().cast("int")).cast("long").alias("null_users"),
        F.sum(F.col("value").isNull().cast("int")).cast("long").alias("null_values"),
    )
    viol = order_violation_count(ev, seq_col="event_id", ts_col="ts_ms")
    return agg.join(F.broadcast(viol))  # two single-row frames


def q_trending(spark: SparkSession, sf: str) -> DataFrame:
    """TrendingRecommender aggregate (ml/recommend/TrendingRecommender.scala:
    39-87): per user, sum over day-ages of count(day)*decay^age*weight per
    interaction type; 30-day window, decay 0.9, click=1.0 purchase=5.0;
    ages anchored at the global max day."""
    ev = _ev(spark, sf).filter(F.col("event_type").isin("click", "purchase"))
    day = F.floor(F.col("ts_ms") / F.lit(MS_DAY))
    ev = ev.withColumn("day", day)
    max_day = ev.agg(F.max("day").alias("max_day"))
    ev = ev.join(F.broadcast(max_day))
    ev = ev.withColumn("age", F.col("max_day") - F.col("day")).filter(F.col("age") < 30)
    weight = F.when(F.col("event_type") == "purchase", 5.0).otherwise(1.0)
    score = F.pow(F.lit(0.9), F.col("age")) * weight
    return (
        ev.groupBy("user_id")
        .agg(F.round(F.sum(score), 6).alias("trend_score"), F.count(F.lit(1)).alias("n_inter"))
    )


# --------------------------------------------------------------------------
# training-data pipeline queries (documents / embeddings)
# --------------------------------------------------------------------------

BM25_TERMS = ("spark", "join", "window")
TERM_QUERY = ("spark", "fast", "join", "query", "window")


def q_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """The input_hint table: (doc_id, tokens:array<int32>, n_tok, source).

    Oracle projection note: the driver's canonicalizer sorts every output
    column with pandas, which cannot factorize a raw list column — so the
    oracle-checked row renders the token array as its byte-faithful
    space-joined string (`tokens_str`, order-sensitive, lossless for the
    non-negative int ids both engines emit). The raw array<int32>
    passthrough itself stays the API (tx.tokenized_sequences) and is
    asserted element-byte-equal against DuckDB in
    tests/test_correctness.py::test_tokens_passthrough_byte_equal."""
    seq = tx.tokenized_sequences(spark, sf)
    return seq.select(
        "doc_id",
        F.array_join(F.transform("tokens", lambda t: t.cast("string")), " ").alias(
            "tokens_str"
        ),
        "n_tok",
        "source",
    )


def q_doc_quality(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_documents(spark, sf)
    feats = tx.quality_features("text")
    return docs.select(F.col("doc_id"), *[c.alias(n) for n, c in feats.items()])


def q_langid(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_documents(spark, sf)
    return docs.select("doc_id", tx.langid_expr("text").alias("lang_pred"))


def q_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    seq = tx.tokenized_sequences(spark, sf)
    return seq.select("doc_id", tx.fingerprint_expr(F.col("tokens")).alias("fp"), "n_tok")


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_documents(spark, sf)
    out = dd.exact_dedup(docs, F.col("text"), id_col="doc_id")
    return out.select("doc_id", "dup_rank", "group_size", "is_dup")


def q_dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    seq = tx.tokenized_sequences(spark, sf)
    return dd.minhash_lsh_pairs(seq, threshold=0.1)


def q_simhash(spark: SparkSession, sf: str) -> DataFrame:
    # explode → codegen hash-agg twin of simhash_expr (r6): 20 interpreted
    # HOF passes per row → one pipelined partial aggregate; bit-identical
    # (dd.simhash_table docstring, equality pinned in test_text_dedup_sim)
    seq = tx.tokenized_sequences(spark, sf)
    return dd.simhash_table(seq)


def q_term_match(spark: SparkSession, sf: str) -> DataFrame:
    """field_match/term analog (matcher/TermMatcher.scala via
    FieldMatcher.scala:15-47): distinct-word Jaccard vs a fixed query."""
    docs = load_documents(spark, sf)
    w = F.array_distinct(tx.words_expr("text"))
    qarr = F.array(*[F.lit(t) for t in TERM_QUERY])
    score = F.round(
        F.size(F.array_intersect(w, qarr))
        / F.nullif(F.size(F.array_union(w, qarr)).cast("double"), F.lit(0.0)),
        6,
    )
    return docs.select("doc_id", score.alias("term_score"))


def q_ngram_match(spark: SparkSession, sf: str) -> DataFrame:
    """field_match/ngram (matcher/NgramMatcher.scala:10-28 via
    FieldMatchFeature.scala:41-54): char-trigram Jaccard vs a fixed query,
    both sides tokenized with the same sliding-window matcher."""
    docs = load_documents(spark, sf)
    return docs.select(
        "doc_id",
        tx.ngram_match_expr("text", " ".join(TERM_QUERY)).alias("ngram_score"),
    )


def q_bm25(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) vs fixed terms, df/avgdl from the corpus
    (matcher/BM25Matcher.scala:26-40; dict build :68-85)."""
    docs = load_documents(spark, sf)
    words = tx.words_expr("text")
    d = docs.select("doc_id", words.alias("w"), F.size(words).alias("dl"))
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.array_contains("w", t).cast("int")).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    j = d.join(F.broadcast(stats))
    k1, b = 1.2, 0.75
    score = F.lit(0.0)
    for t in BM25_TERMS:
        tf = F.size(F.filter(F.col("w"), lambda x: x == F.lit(t))).cast("double")
        idf = F.log(
            1.0
            + (F.col("n_docs") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5)
        )
        score = score + idf * (
            tf * (k1 + 1) / (tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
        )
    return j.select("doc_id", F.round(score, 6).alias("bm25"))


def q_ann_cosine(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_embeddings(spark, sf)
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return sim.cosine_topk(emb, query, k=5)


def q_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-bucketed ANN: candidates share the query's 8-bit hyperplane
    signature; exact cosine only within the bucket."""
    emb = load_embeddings(spark, sf)
    dim = 64
    sig = emb.select(
        "vec_id", "embedding", sim.lsh_signature(F.col("embedding"), dim).alias("sig")
    ).localCheckpoint(eager=False)
    # ^ r6 barrier: the signature table is probed by the query row AND
    # the candidate side — without it the 8-plane signature pass (and
    # its sizable expression tree, re-optimized on every action) runs
    # under both join branches
    qsig = sig.filter(F.col("vec_id") == 0).select(
        F.col("sig").alias("qs"), F.col("embedding").alias("q")
    )
    cand = sig.join(F.broadcast(qsig), F.col("sig") == F.col("qs"))
    score = F.round(sim.cosine_expr(F.col("embedding"), F.col("q")), 6)
    # distributed top-k: the broadcast join preserves the scan's
    # partitioning, so even a mega-bucket stays spread across partitions;
    # sort+limit → TakeOrderedAndProject caps every partition's
    # contribution at k rows (no global rank window, no single-partition
    # stage — the scale cap the LSH bucket itself can't guarantee).
    return sim.rank_topk(cand.select("vec_id", score.alias("score")), k=3)


IVF_CENTROID_IDS = (1, 2, 3, 4)


def q_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-style ANN: partition the corpus into K cells by nearest
    centroid (deterministic centroids = fixed corpus vectors, so both
    engines agree), probe only the query's cell, exact cosine top-3
    inside it. The scale path complement to the LSH variant: at 10^9
    vectors the assignment is one broadcast of K centroids + a per-row
    argmax, and the cell table is written partitioned by cell id so a
    probe is a partition-pruned scan."""
    emb = load_embeddings(spark, sf)
    cents = emb.filter(F.col("vec_id").isin(*IVF_CENTROID_IDS)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    scored = emb.join(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "cid",
        F.round(sim.cosine_expr(F.col("embedding"), F.col("cvec")), 6).alias("cs"),
    )
    # argmax centroid, ties to the smallest cid (deterministic)
    assigned = scored.groupBy("vec_id").agg(
        F.max_by("cid", F.struct(F.col("cs"), (-F.col("cid")).alias("nc"))).alias("cell"),
        F.first("embedding").alias("embedding"),
    ).localCheckpoint(eager=False)
    # ^ r6 barrier: `assigned` is read by the query-cell probe AND the
    # candidate side; without it the K-centroid scoring + argmax agg ran
    # twice (before plan: 2 embedding scans, 18 exchanges)
    qcell = assigned.filter(F.col("vec_id") == 0).select(
        F.col("cell").alias("qc"), F.col("embedding").alias("q")
    )
    cand = assigned.join(F.broadcast(qcell), F.col("cell") == F.col("qc"))
    score = F.round(sim.cosine_expr(F.col("embedding"), F.col("q")), 6)
    return sim.rank_topk(cand.select("vec_id", score.alias("score")), k=3)


def q_dedup_window(spark: SparkSession, sf: str) -> DataFrame:
    """Exact duplicated-window detection over the input_hint token table
    (functions/dedup.duplicated_windows — the Lee et al. 2022
    exact-substring dedup analog): per doc, how many of its 30-token
    windows (stride 10) occur verbatim ≥2 times anywhere in the corpus.
    Hash-keyed count + mark join + doc agg — shuffle rows are 16-byte
    keys regardless of window width."""
    return dd.duplicated_windows(
        tx.tokenized_sequences(spark, sf), window=30, stride=10)


def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash-bucket dedup: documents sharing an identical simhash form a
    near-dup cluster (the zero-hamming-distance tier of simhash dedup —
    one hash shuffle on the signature, same plan as exact dedup)."""
    seq = tx.tokenized_sequences(spark, sf)
    sh = dd.simhash_table(seq)  # codegen agg twin of simhash_expr (r6)
    out = dd.exact_dedup(sh, F.col("simhash"), id_col="doc_id")
    return out.select("doc_id", "simhash", "dup_rank", "group_size", "is_dup")


def q_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source token-count distribution (training-data curation stats):
    min/max/exact p50/p90 of n_tok. Exact percentiles are fine per source
    (bounded group count); at petabyte scale swap percentile() for
    percentile_approx with the same output columns."""
    seq = tx.tokenized_sequences(spark, sf)
    return seq.groupBy("source").agg(
        F.min("n_tok").cast("long").alias("tok_min"),
        F.max("n_tok").cast("long").alias("tok_max"),
        F.round(F.expr("percentile(n_tok, 0.5)"), 6).alias("tok_p50"),
        F.round(F.expr("percentile(n_tok, 0.9)"), 6).alias("tok_p90"),
    )


CHUNK_WINDOW, CHUNK_STRIDE = 64, 32
PACK_BUDGET = 256


def q_chunk_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Token-window chunking — split each document's token sequence into
    sliding windows of CHUNK_WINDOW ids at CHUNK_STRIDE offsets (the
    standard LLM pretraining chunker; last partial window kept). Pure
    per-row HOF compute + explode: linear, shuffle-free, embarrassingly
    parallel at any scale."""
    seq = tx.tokenized_sequences(spark, sf)
    starts = F.sequence(F.lit(0), F.col("n_tok") - 1, F.lit(CHUNK_STRIDE))
    return (
        seq.filter(F.col("n_tok") > 0)
        .select(
            "doc_id", "source", "n_tok",
            # r6: render token ids to strings ONCE per document, below
            # the explode — window/stride overlap means every id lands in
            # ~window/stride chunks, and the per-chunk transform was
            # re-casting it that many times
            F.transform("tokens", lambda t: t.cast("string")).alias("__ts"),
            F.posexplode(starts).alias("chunk_id", "s"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.array_join(
                F.slice("__ts", F.col("s") + 1, F.lit(CHUNK_WINDOW)), " "
            ).alias("chunk_str"),
            F.least(F.lit(CHUNK_WINDOW), F.col("n_tok") - F.col("s"))
            .cast("long").alias("chunk_len"),
            "source",
        )
    )


def q_rep_ngram(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition quality: the fraction of a document's
    token bigrams taken by its single most frequent bigram (high value =
    repetitive boilerplate). explode → two-level hash agg — map-side
    partials absorb any hot document; no windows, no joins. The ratio is
    an IEEE-exact integer division (no rounding needed)."""
    seq = tx.tokenized_sequences(spark, sf).filter(F.col("n_tok") >= 2)
    bg = seq.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_tok") - 2),
                lambda i: F.concat_ws(
                    "_",
                    F.get("tokens", i).cast("string"),
                    F.get("tokens", i + 1).cast("string"),
                ),
            )
        ).alias("bg"),
    )
    counts = bg.groupBy("doc_id", "bg").count()
    return counts.groupBy("doc_id").agg(
        (F.max("count") / F.sum("count")).alias("top_bigram_frac"),
        F.sum("count").cast("long").alias("n_bigrams"),
    )


PACK_CHUNK_DOCS = 512


def q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Training-sequence packing: lay each source's documents end-to-end
    in doc_id order and cut PACK_BUDGET-token training sequences at fixed
    token offsets (seq_id = token_offset div budget).

    Every source is a hot entity by construction (~20 sources carrying
    the whole corpus), so the per-source prefix sum runs the engine's
    salted two-pass shape (plans/prefix.salted_cumulative_sum) with the
    doc-id range as the monotone chunk key: within-(source, doc-range)
    running sums over bounded tasks + a per-chunk-totals prefix (one row
    per source × range — corpus/PACK_CHUNK_DOCS rows, never event-scale)
    joined back. No window in the plan partitions an event-scale frame by
    the bare source key (pinned by test_plans_quality). At a larger
    corpus, scale PACK_CHUNK_DOCS with n_docs/(tasks·sources) so the
    chunk-totals frame stays small relative to the corpus."""
    from metarank_spark.plans.prefix import salted_cumulative_sum

    seq = tx.tokenized_sequences(spark, sf).select(
        "doc_id", "source", "n_tok", F.col("doc_id").cast("long").alias("__ord")
    ).localCheckpoint(eager=False)
    # ^ r6: project to the 4 columns the packer reads (the token arrays
    # never cross the prefix machinery) and barrier the frame — the
    # salted two-pass shape reads its input twice (within-chunk windows
    # + per-chunk totals), which re-ran the scan + word split per pass
    packed = salted_cumulative_sum(
        seq, F.col("n_tok"), entity="source", order=("__ord", "doc_id"),
        chunk_ms=PACK_CHUNK_DOCS, out="off", strictly_before=True,
    ).select(
        "source", "n_tok",
        F.expr(f"off div {PACK_BUDGET}").alias("seq_id"),
    )
    return packed.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("seq_tokens"),
    )


EMB_DEDUP_THRESHOLD = 0.15
EMB_DEDUP_MAX_BUCKET = 20


def q_dedup_embedding(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: banded 24-plane hyperplane
    LSH (3 bands × 8 bits, multi-probe) with the minhash-style
    mega-bucket cap before the self-join, exact cosine verified only
    within buckets — never all-pairs, never quadratic in a bucket."""
    emb = load_embeddings(spark, sf)
    return sim.embedding_near_dup_pairs(
        emb, dim=64, threshold=EMB_DEDUP_THRESHOLD, max_bucket=EMB_DEDUP_MAX_BUCKET
    )


def q_lm_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram-LM quality score (the CCNet-style statistical filter): a
    document's cross-entropy in bits under the corpus unigram MLE —
    gibberish scores high, boilerplate low. Two aggregations (corpus
    vocab, per-doc mean) + one token-key join; the vocab frame is
    |unique tokens|, orders of magnitude smaller than the corpus, and
    the join key is the token id, so common-token skew is AQE-splittable
    (no windows anywhere). Rounded to 6dp: the mean crosses different
    summation orders per engine."""
    seq = tx.tokenized_sequences(spark, sf).filter(F.col("n_tok") > 0)
    tok = seq.select("doc_id", F.explode("tokens").alias("t"))
    # single-scan shape (r6): the naive vocab/total/probe tree referenced
    # `tok` three times, so Catalyst re-expanded the tokenize fold into
    # THREE corpus scans. Aggregate the exploded stream once into per-doc
    # term frequencies behind a materialization barrier; the vocab
    # (≤HASH_MOD = 1,000,003 rows at ANY corpus size — broadcastable by
    # construction) and the grand total both derive from it, and the
    # probe join moves doc×distinct-token rows instead of every token
    # instance. avg over instances ≡ tf-weighted mean (same 6dp round
    # absorbing engine summation order, as before).
    tf = (
        tok.groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    vocab = tf.groupBy("t").agg(F.sum("tf").alias("tf_corpus")).localCheckpoint(
        eager=False
    )
    total = vocab.agg(F.sum("tf_corpus").cast("double").alias("__n"))
    return (
        tf.join(F.broadcast(vocab), "t")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tok"),
            F.round(
                -F.sum(F.col("tf") * F.log2(F.col("tf_corpus") / F.col("__n")))
                / F.sum("tf"),
                6,
            ).alias("bits_per_token"),
        )
    )


def q_keywords(spark: SparkSession, sf: str) -> DataFrame:
    """Characteristic terms per document: top-3 tokens by (term frequency
    desc, document frequency asc, token asc) — the TF-IDF idea with an
    integer-only ordering, so the selection is bit-stable across engines.
    Grouped counts + a doc-partitioned top-k window."""
    seq = tx.tokenized_sequences(spark, sf).filter(F.col("n_tok") > 0)
    tok = seq.select("doc_id", F.explode("tokens").alias("t"))
    tf = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    j = tf.join(dfreq, "t")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("t").asc()
    )
    return (
        j.withColumn("kw_rank", F.row_number().over(w))
        .filter(F.col("kw_rank") <= 3)
        .select(
            "doc_id",
            F.col("kw_rank").cast("long").alias("kw_rank"),
            F.col("t").cast("long").alias("token"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
        )
    )


IW_TARGET_SOURCES = ("src0", "src1")


def q_importance_weight(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023): per-document log
    importance weight under hashed-bigram target/raw language models —
    the target domain is the IW_TARGET_SOURCES subset, the raw LM the
    whole corpus, both add-1 smoothed over 8192 buckets. High log_iw =
    resample into the training set. The LM frames are ≤8192 rows at ANY
    corpus size, so both joins are broadcasts; no windows anywhere."""
    seq = tx.tokenized_sequences(spark, sf)
    return sel.log_importance_weights(seq, IW_TARGET_SOURCES)


def q_mixture_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Balanced-mixture downsampling: deterministically Bernoulli-thin
    every source to the token budget of the smallest source (doc-level,
    integer-exact acceptance, functions/selection.doc_accept_expr) —
    the source-rebalancing step before pre-training. One |sources|-row
    aggregate + broadcast join + codegen filter."""
    seq = tx.tokenized_sequences(spark, sf)
    return sel.mixture_sample(seq)


def q_mixture_plan(spark: SparkSession, sf: str) -> DataFrame:
    """The audit twin of mixture_sample: per-source totals, the
    acceptance rate, and the kept doc/token counts — what the curation
    job logs before committing a mixture. All frames |sources|-row."""
    seq = tx.tokenized_sequences(spark, sf)
    return sel.mixture_plan(seq)


def q_ann_quantized(spark: SparkSession, sf: str) -> DataFrame:
    """int8-quantized ANN: symmetric per-vector scalar quantization
    (floor(x*127/max|x|)) + exact integer dot-product ranking — the 4x
    memory-bandwidth variant of brute-force search; scores are int64 so
    the ordering is bit-stable across engines."""
    emb = load_embeddings(spark, sf)
    return sim.quantized_topk(emb, k=5)


DECON_BENCH_IDS = ("0", "1", "2")


def q_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination — the training-data op that drops
    documents overlapping an eval set: a document is contaminated when it
    shares any token-trigram shingle with the benchmark corpus (here the
    first 3 docs stand in for the benchmark). Plan: benchmark shingles
    are a small broadcast dim; each document's distinct shingles explode
    and semi-join it — linear in corpus shingles, no window, no
    all-pairs. At 100 TB the benchmark side stays broadcastable (eval
    sets are tiny) and the doc side is a single scan."""
    from pyspark import StorageLevel

    seq = tx.tokenized_sequences(spark, sf)
    # persist: the shingle table is referenced by the benchmark dim, the
    # exploded probe side, and the full-corpus left join — without a
    # materialization barrier CollapseProject re-inlines the tokenize +
    # shingle HOF chain into every reference (the round-1 minhash lesson)
    sh = seq.select(
        "doc_id", dd.shingles_expr(F.col("tokens")).alias("sh")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bench = (
        sh.filter(F.col("doc_id").isin(*DECON_BENCH_IDS))
        .select(F.explode("sh").alias("g"))
        .distinct()
    )
    ex = sh.select("doc_id", F.explode("sh").alias("g"))
    hits = ex.join(F.broadcast(bench), "g").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        sh.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def _doc_clusters(spark: SparkSession, sf: str):
    """Shared MinHash-LSH pairs → connected-components prefix for the
    cluster/keep queries: (tokenized sequences, cluster assignment). As
    independent oracle queries each runs its own job, but in one job the
    common frames are built once."""
    seq = tx.tokenized_sequences(spark, sf)
    pairs = dd.minhash_lsh_pairs(seq, threshold=0.1)
    return seq, dd.connected_components(pairs, seq.select("doc_id"))


def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup CLUSTER assignment: connected components over the
    MinHash-LSH pair list (iterative min-label propagation; the canonical
    survivor of each component is its lexicographically smallest doc).
    The step a real curation pipeline runs after pair generation — keep
    one doc per cluster."""
    return _doc_clusters(spark, sf)[1]


def q_dedup_keep(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical-survivor selection — the step after clustering in a real
    curation pipeline: per near-dup cluster keep the LONGEST document
    (most tokens), ties to the smallest doc_id. Two grouped aggregations
    over the cluster frame; integer keep-scores make the choice
    bit-stable across engines."""
    seq, clusters = _doc_clusters(spark, sf)
    j = clusters.join(seq.select("doc_id", "n_tok"), "doc_id")
    m = j.groupBy("cluster_id").agg(F.max("n_tok").alias("__mx"))
    return (
        j.join(m, "cluster_id")
        .filter(F.col("n_tok") == F.col("__mx"))
        .groupBy("cluster_id")
        .agg(F.min("doc_id").alias("keep_id"))
        .join(
            clusters.groupBy("cluster_id").agg(
                F.count(F.lit(1)).cast("long").alias("cluster_size")
            ),
            "cluster_id",
        )
        .select(
            "cluster_id", "keep_id", "cluster_size",
            (F.col("cluster_size") - 1).cast("long").alias("n_dups"),
        )
    )


def q_vector_reduce(spark: SparkSession, sf: str) -> DataFrame:
    """vector extractor reducers min/max/avg/size
    (NumVectorFeature.scala:28,192)."""
    emb = load_embeddings(spark, sf)
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    avg = F.aggregate(e, F.lit(0.0), lambda a, x: a + x) / F.nullif(
        F.size(e).cast("double"), F.lit(0.0)
    )
    return emb.select(
        "vec_id",
        F.round(F.array_min(e), 6).alias("v_min"),
        F.round(F.array_max(e), 6).alias("v_max"),
        F.round(avg, 6).alias("v_avg"),
        F.size(e).cast("long").alias("v_dim"),
    )


def q_source_stats(spark: SparkSession, sf: str) -> DataFrame:
    seq = tx.tokenized_sequences(spark, sf)
    return seq.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.avg("n_tok"), 6).alias("avg_tokens"),
    )


# shared DuckDB tokenizer prelude (mirrors functions/text.py bit-for-bit)
SEQ = """WITH seq AS (
  SELECT doc_id::VARCHAR AS doc_id,
    list_transform(list_filter(string_split(text,' '), w -> w <> ''),
      w -> CAST(list_reduce(list_prepend(0::BIGINT,
             list_transform(range(1, length(w)+1), i -> ascii(substr(w,i,1)))),
             (acc,c) -> (acc*31 + c) % 1000003) AS INT)) AS tokens,
    source, text
  FROM documents)"""


def _simhash_sql() -> str:
    terms = []
    for j in range(dd.SIMHASH_BITS):
        p = 2**j
        terms.append(
            f"(CASE WHEN 2*len(list_filter(tokens, t -> "
            f"(((t::BIGINT*{dd.SIMHASH_MULT}) % {dd.SIMHASH_MOD}) // {p}) % 2 = 1)) "
            f"> len(tokens) THEN {p} ELSE 0 END)"
        )
    return " + ".join(terms)


def _minhash_sql(threshold: float, cte_only: bool = False) -> str:
    sigs = ", ".join(
        f"list_min(list_transform(sh, s -> ({a}*s + {b}) % {dd.HASH_MOD})) AS m{i}"
        for i, (a, b) in enumerate(dd.MINHASH_PARAMS)
    )
    n_bands = dd.MINHASH_K // dd.BAND_ROWS
    bands = ", ".join(
        "concat("
        + f"'{bi}', "
        + ", '_', ".join([f"''"] + [f"m{bi * dd.BAND_ROWS + r}" for r in range(dd.BAND_ROWS)])
        + ")"
        for bi in range(n_bands)
    )
    body = f"""{SEQ},
    sh AS (SELECT doc_id, list_distinct(list_transform(range(0, len(tokens)-2),
             i -> ((tokens[i+1]::BIGINT*{dd.SHINGLE_MULT} + tokens[i+2]) % {dd.HASH_MOD}
                   * {dd.SHINGLE_MULT} + tokens[i+3]) % {dd.HASH_MOD})) AS sh
           FROM seq WHERE len(tokens) >= 3),
    sig AS (SELECT doc_id, sh, {sigs} FROM sh),
    bands0 AS (SELECT doc_id, unnest([{bands}]) AS band FROM sig),
    bands AS (SELECT doc_id, band FROM bands0
              QUALIFY count(*) OVER (PARTITION BY band) <= 20),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b USING (band) WHERE a.doc_id < b.doc_id),
    verified AS (SELECT id_a, id_b,
        round(len(list_intersect(x.sh, y.sh))::DOUBLE
              / nullif(len(list_distinct(list_concat(x.sh, y.sh))), 0), 6) AS jaccard
      FROM cand JOIN sh x ON x.doc_id = id_a JOIN sh y ON y.doc_id = id_b)"""
    if cte_only:
        return body + f""",
    pairs AS (SELECT id_a, id_b FROM verified WHERE jaccard >= {threshold})"""
    return body + f"""
    SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= {threshold}"""


def _dedup_clusters_sql(threshold: float = 0.1) -> str:
    """Connected components over the minhash pair list via a recursive
    transitive-closure CTE (exact for the fixture's small components):
    cluster_id = min id reachable from a node, singletons self-cluster."""
    chain = _minhash_sql(threshold, cte_only=True)
    chain = chain.replace("WITH seq AS", "WITH RECURSIVE seq AS", 1)
    return f"""{chain},
    e AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    reach(a, b) AS (SELECT a, b FROM e
                    UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
    lab AS (SELECT a, min(b) AS mn FROM reach GROUP BY a),
    outp AS (SELECT d.doc_id::VARCHAR AS doc_id,
               coalesce(least(l.a, l.mn), d.doc_id::VARCHAR) AS cluster_id
             FROM documents d LEFT JOIN lab l ON l.a = d.doc_id::VARCHAR)
    SELECT doc_id, cluster_id,
      (count(*) OVER (PARTITION BY cluster_id))::BIGINT AS cluster_size,
      doc_id <> cluster_id AS is_dup
    FROM outp"""


def _ngram_sql(n: int = 3) -> str:
    query = " ".join(TERM_QUERY)
    qgrams = sorted(
        {w[j : j + n] for w in query.split() for j in range(len(w) - n + 1)}
    )
    return f"""
        WITH g AS (SELECT doc_id,
          list_sort(list_distinct(flatten(list_transform(
            list_filter(string_split(text,' '), x -> x <> ''),
            w -> CASE WHEN length(w) >= {n}
                 THEN list_transform(range(1, length(w)-{n - 2}), i -> substr(w, i, {n}))
                 ELSE []::VARCHAR[] END)))) AS grams
          FROM documents)
        SELECT doc_id,
          round(len(list_intersect(grams, {qgrams}))::DOUBLE
                / nullif(len(list_distinct(list_concat(grams, {qgrams}))), 0), 6)
            AS ngram_score
        FROM g"""


def _bm25_sql() -> str:
    k1, b = 1.2, 0.75
    dfs = ", ".join(
        f"sum(CASE WHEN list_contains(w, '{t}') THEN 1 ELSE 0 END) AS df_{t}"
        for t in BM25_TERMS
    )
    parts = []
    for t in BM25_TERMS:
        tf = f"len(list_filter(w, x -> x = '{t}'))::DOUBLE"
        idf = f"ln(1.0 + (n_docs - df_{t} + 0.5) / (df_{t} + 0.5))"
        parts.append(
            f"{idf} * ({tf} * ({k1} + 1) / ({tf} + {k1} * (1 - {b} + {b} * dl / avgdl)))"
        )
    expr = " + ".join(parts)
    return f"""WITH d AS (
      SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS w,
             len(list_filter(string_split(text,' '), x -> x <> '')) AS dl
      FROM documents),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl, {dfs} FROM d)
    SELECT doc_id, round(0.0 + {expr}, 6) AS bm25 FROM d, stats"""


def _cos_sql(a: str, b: str) -> str:
    return (
        f"round(list_sum(list_transform(range(1, len({a})+1), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)) / nullif("
        f"sqrt(list_sum(list_transform(range(1, len({a})+1), i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE))) * "
        f"sqrt(list_sum(list_transform(range(1, len({b})+1), i -> {b}[i]::DOUBLE * {b}[i]::DOUBLE))), 0), 6)"
    )


_COS = _cos_sql("embedding", "q")


def _lsh_sig_sql(col: str) -> str:
    terms = []
    for j in range(sim.LSH_PLANES):
        dot = (
            f"list_sum(list_transform(range(1, len({col})+1), i -> {col}[i]::DOUBLE * "
            f"((({j}::BIGINT*2654435761 + (i-1)::BIGINT*40503) % {sim.LSH_MOD})::DOUBLE / {sim.LSH_MOD} - 0.5)))"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {2**j} ELSE 0 END)")
    return " + ".join(terms)


def _lsh_band_keys_sql(
    col: str,
    planes: int = sim.EMB_PLANES,
    band_bits: int = sim.EMB_BAND_BITS,
) -> str:
    """DuckDB mirror of similarity.lsh_band_keys: list of banded sign-bit
    bucket keys '<band>_<bits>' over the same closed-form hyperplanes
    (global plane index j = band*band_bits + r)."""
    n_bands = planes // band_bits
    keys = []
    for bi in range(n_bands):
        dot = (
            f"list_sum(list_transform(range(1, len({col})+1), i -> {col}[i]::DOUBLE * "
            f"(((({bi * band_bits}::BIGINT + r) * 2654435761 + (i-1)::BIGINT * 40503) "
            f"% {sim.LSH_MOD})::DOUBLE / {sim.LSH_MOD} - 0.5)))"
        )
        val = (
            f"CAST(coalesce(list_sum(list_transform(range(0, {band_bits}), r -> "
            f"CASE WHEN {dot} > 0 THEN CAST(power(2, r) AS BIGINT) ELSE 0 END)), 0) AS BIGINT)"
        )
        keys.append(f"concat('{bi}', '_', CAST({val} AS VARCHAR))")
    return "[" + ", ".join(keys) + "]"


_TEXT_ORACLES: dict[str, str] = {
    "tokenize": (
        f"{SEQ} SELECT doc_id, array_to_string(tokens, ' ') AS tokens_str, "
        "len(tokens)::INT AS n_tok, source FROM seq"
    ),
    "doc_quality": """
        WITH w AS (SELECT doc_id, length(text) AS n_chars,
                     list_filter(string_split(text,' '), x -> x <> '') AS words
                   FROM documents)
        SELECT doc_id,
          len(words)::BIGINT AS n_words,
          n_chars::BIGINT AS n_chars,
          round(list_sum(list_transform(words, x -> length(x)))::DOUBLE
                / nullif(len(words), 0), 6) AS mean_word_len,
          round(len(list_distinct(words))::DOUBLE / nullif(len(words), 0), 6) AS type_token_ratio,
          round(len(list_filter(words, x -> x IN ('the','a','of','and','to')))::DOUBLE
                / nullif(len(words), 0), 6) AS stopword_ratio,
          round(least(len(words)::DOUBLE / 100.0, 1.0) * 0.4
                + round(len(list_distinct(words))::DOUBLE / nullif(len(words), 0), 6) * 0.4
                + (1.0 - round(len(list_filter(words, x -> x IN ('the','a','of','and','to')))::DOUBLE
                               / nullif(len(words), 0), 6)) * 0.2, 6) AS quality_score
        FROM w""",
    "langid": """
        WITH w AS (SELECT doc_id,
                     list_distinct(list_filter(string_split(text,' '), x -> x <> '')) AS words
                   FROM documents),
        s AS (SELECT doc_id,
          len(list_intersect(words, ['the','a','and'])) AS s_en,
          len(list_intersect(words, ['el','la','de'])) AS s_es,
          len(list_intersect(words, ['der','die','und'])) AS s_de
        FROM w)
        SELECT doc_id, CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
                            WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS lang_pred
        FROM s""",
    "fingerprint": f"""{SEQ}
        SELECT doc_id,
          list_reduce(list_prepend(0::BIGINT, list_transform(tokens, t -> t::BIGINT)),
                      (acc, t) -> (acc*{tx.FP_MULT} + t) % {tx.HASH_MOD}) AS fp,
          len(tokens)::INT AS n_tok
        FROM seq""",
    "dedup_exact": """
        SELECT doc_id,
          (row_number() OVER (PARTITION BY text ORDER BY doc_id))::BIGINT AS dup_rank,
          (count(*) OVER (PARTITION BY text))::BIGINT AS group_size,
          row_number() OVER (PARTITION BY text ORDER BY doc_id) > 1 AS is_dup
        FROM documents""",
    "dedup_minhash": _minhash_sql(0.1),
    "dedup_clusters": _dedup_clusters_sql(0.1),
    "dedup_keep": f"""
        WITH c AS ({_dedup_clusters_sql(0.1)}),
        n AS (SELECT doc_id::VARCHAR AS doc_id,
                len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS n_tok
              FROM documents),
        j AS (SELECT c.cluster_id, c.doc_id, n.n_tok
              FROM c JOIN n USING (doc_id)),
        m AS (SELECT cluster_id, max(n_tok) AS mx FROM j GROUP BY 1),
        k AS (SELECT j.cluster_id, min(j.doc_id) AS keep_id
              FROM j JOIN m ON j.cluster_id = m.cluster_id
                            AND j.n_tok = m.mx
              GROUP BY 1),
        s AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
              FROM c GROUP BY 1)
        SELECT k.cluster_id, k.keep_id, s.cluster_size,
          (s.cluster_size - 1)::BIGINT AS n_dups
        FROM k JOIN s USING (cluster_id)""",
    "decontaminate": f"""{SEQ},
        sh AS (SELECT doc_id, CASE WHEN len(tokens) >= 3
                 THEN list_distinct(list_transform(range(0, len(tokens)-2),
                   i -> ((tokens[i+1]::BIGINT*{dd.SHINGLE_MULT} + tokens[i+2]) % {dd.HASH_MOD}
                         * {dd.SHINGLE_MULT} + tokens[i+3]) % {dd.HASH_MOD}))
                 ELSE []::BIGINT[] END AS sh
               FROM seq),
        bench AS (SELECT DISTINCT unnest(sh) AS g FROM sh
                  WHERE doc_id IN {DECON_BENCH_IDS}),
        ex AS (SELECT doc_id, unnest(sh) AS g FROM sh),
        hits AS (SELECT doc_id, count(*) AS n FROM ex JOIN bench USING (g)
                 GROUP BY doc_id)
        SELECT s.doc_id, coalesce(h.n, 0)::BIGINT AS n_hits,
               coalesce(h.n, 0) > 0 AS contaminated
        FROM sh s LEFT JOIN hits h USING (doc_id)""",
    "simhash": f"{SEQ} SELECT doc_id, ({_simhash_sql()})::BIGINT AS simhash FROM seq",
    "term_match": f"""
        WITH w AS (SELECT doc_id,
                     list_distinct(list_filter(string_split(text,' '), x -> x <> '')) AS words
                   FROM documents)
        SELECT doc_id,
          round(len(list_intersect(words, {list(TERM_QUERY)}))::DOUBLE
                / nullif(len(list_distinct(list_concat(words, {list(TERM_QUERY)}))), 0), 6)
            AS term_score
        FROM w""",
    "ngram_match": _ngram_sql(),
    "bm25": _bm25_sql(),
    "ann_cosine": f"""
        WITH q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
        s AS (SELECT vec_id, {_COS} AS score FROM embeddings, q)
        SELECT vec_id, score, rank FROM
          (SELECT *, (row_number() OVER (ORDER BY score DESC, vec_id))::BIGINT AS rank FROM s)
        WHERE rank <= 5""",
    "ann_lsh": f"""
        WITH sig AS (SELECT vec_id, embedding, ({_lsh_sig_sql('embedding')}) AS sig FROM embeddings),
        qs AS (SELECT sig AS qsig, embedding AS q FROM sig WHERE vec_id = 0),
        cand AS (SELECT vec_id, {_COS} AS score
                 FROM sig, qs WHERE sig.sig = qs.qsig)
        SELECT vec_id, score, rank FROM
          (SELECT *, (row_number() OVER (ORDER BY score DESC, vec_id))::BIGINT AS rank FROM cand)
        WHERE rank <= 3""",
    "dedup_embedding": f"""
        WITH sig AS (SELECT vec_id, embedding, {_lsh_band_keys_sql('embedding')} AS bands
                     FROM embeddings),
        b0 AS (SELECT vec_id, embedding, unnest(bands) AS band FROM sig),
        b AS (SELECT vec_id, embedding, band FROM b0
              QUALIFY count(*) OVER (PARTITION BY band) <= {EMB_DEDUP_MAX_BUCKET}),
        cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
                 FROM b x JOIN b y USING (band) WHERE x.vec_id < y.vec_id),
        pairs AS (SELECT id_a, id_b, {_cos_sql('e1.embedding', 'e2.embedding')} AS cosine
                  FROM cand JOIN embeddings e1 ON e1.vec_id = id_a
                            JOIN embeddings e2 ON e2.vec_id = id_b)
        SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= {EMB_DEDUP_THRESHOLD}""",
    "ann_ivf": f"""
        WITH cents AS (SELECT vec_id AS cid, embedding AS cvec
                       FROM embeddings WHERE vec_id IN {IVF_CENTROID_IDS}),
        scored AS (SELECT e.vec_id, e.embedding, c.cid,
                     {_cos_sql('e.embedding', 'c.cvec')} AS cs
                   FROM embeddings e, cents c),
        assigned AS (SELECT vec_id, embedding, cid AS cell FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY cs DESC, cid ASC) AS rn FROM scored) WHERE rn = 1),
        qc AS (SELECT cell AS qcell, embedding AS q FROM assigned WHERE vec_id = 0),
        cand AS (SELECT a.vec_id, {_cos_sql('a.embedding', 'qc.q')} AS score
                 FROM assigned a, qc WHERE a.cell = qc.qcell)
        SELECT vec_id, score, rank FROM
          (SELECT *, (row_number() OVER (ORDER BY score DESC, vec_id))::BIGINT AS rank
           FROM cand)
        WHERE rank <= 3""",
    "dedup_window": f"""
        {SEQ},
        d AS (SELECT doc_id, tokens, len(tokens) AS n_tok FROM seq),
        w AS (SELECT doc_id,
                array_to_string(list_slice(tokens, s + 1, s + 30), ' ') AS win
              FROM d, unnest(range(0, n_tok - 30 + 1, 10)) AS t(s)
              WHERE n_tok >= 30),
        c AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2),
        m AS (SELECT w.doc_id, count(*)::BIGINT AS n_windows,
                sum(CASE WHEN c.win IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                  AS n_dup
              FROM w LEFT JOIN c ON w.win = c.win GROUP BY w.doc_id)
        SELECT d.doc_id,
          coalesce(m.n_windows, 0)::BIGINT AS n_windows,
          coalesce(m.n_dup, 0)::BIGINT AS n_dup_windows,
          round(m.n_dup::DOUBLE / nullif(m.n_windows, 0), 6) AS dup_fraction
        FROM d LEFT JOIN m ON d.doc_id = m.doc_id""",
    "dedup_simhash": f"""
        {SEQ}, sh AS (SELECT doc_id, ({_simhash_sql()})::BIGINT AS simhash FROM seq)
        SELECT doc_id, simhash,
          (row_number() OVER (PARTITION BY simhash ORDER BY doc_id))::BIGINT AS dup_rank,
          (count(*) OVER (PARTITION BY simhash))::BIGINT AS group_size,
          row_number() OVER (PARTITION BY simhash ORDER BY doc_id) > 1 AS is_dup
        FROM sh""",
    "token_stats": f"""{SEQ}
        SELECT source,
          min(len(tokens))::BIGINT AS tok_min,
          max(len(tokens))::BIGINT AS tok_max,
          round(quantile_cont(len(tokens), 0.5), 6) AS tok_p50,
          round(quantile_cont(len(tokens), 0.9), 6) AS tok_p90
        FROM seq GROUP BY source""",
    "vector_reduce": """
        WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)
        SELECT vec_id,
          round(list_min(v), 6) AS v_min,
          round(list_max(v), 6) AS v_max,
          round(list_sum(v) / nullif(len(v), 0), 6) AS v_avg,
          len(v)::BIGINT AS v_dim
        FROM e""",
    "source_stats": f"""{SEQ}
        SELECT source, count(*)::BIGINT AS n_docs,
          sum(len(tokens))::BIGINT AS total_tokens,
          round(avg(len(tokens)), 6) AS avg_tokens
        FROM seq GROUP BY source""",
    "chunk_tokens": f"""{SEQ},
        ch AS (
          SELECT doc_id, source, tokens, len(tokens) AS n,
                 unnest(range(0, len(tokens), {CHUNK_STRIDE})) AS s
          FROM seq WHERE len(tokens) > 0)
        SELECT doc_id, (s / {CHUNK_STRIDE})::BIGINT AS chunk_id,
          array_to_string(list_slice(tokens, s + 1,
                                     least(s + {CHUNK_WINDOW}, n)), ' ')
            AS chunk_str,
          least({CHUNK_WINDOW}, n - s)::BIGINT AS chunk_len, source
        FROM ch""",
    "rep_ngram": f"""{SEQ},
        b AS (
          SELECT doc_id,
                 unnest(list_transform(range(0, len(tokens) - 1),
                   i -> tokens[i + 1]::VARCHAR || '_' || tokens[i + 2]::VARCHAR))
                   AS bg
          FROM seq WHERE len(tokens) >= 2),
        c AS (SELECT doc_id, bg, count(*) AS cnt FROM b GROUP BY 1, 2)
        SELECT doc_id, max(cnt)::DOUBLE / sum(cnt) AS top_bigram_frac,
               sum(cnt)::BIGINT AS n_bigrams
        FROM c GROUP BY doc_id""",
    "lm_quality": f"""{SEQ},
        tok AS (SELECT doc_id, unnest(tokens) AS t FROM seq
                WHERE len(tokens) > 0),
        vocab AS (SELECT t, count(*) AS tf_corpus FROM tok GROUP BY t),
        tot AS (SELECT count(*)::DOUBLE AS n FROM tok)
        SELECT doc_id, count(*)::BIGINT AS n_tok,
          round(-avg(log2(tf_corpus / tot.n)), 6) AS bits_per_token
        FROM tok JOIN vocab USING (t), tot
        GROUP BY doc_id""",
    "keywords": f"""{SEQ},
        tok AS (SELECT doc_id, unnest(tokens) AS t FROM seq
                WHERE len(tokens) > 0),
        tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        r AS (SELECT tf.doc_id, tf.t, tf.tf, dfreq.df,
                row_number() OVER (PARTITION BY tf.doc_id
                  ORDER BY tf.tf DESC, dfreq.df ASC, tf.t ASC) AS kw_rank
              FROM tf JOIN dfreq USING (t))
        SELECT doc_id, kw_rank::BIGINT AS kw_rank, t::BIGINT AS token,
          tf::BIGINT AS tf, df::BIGINT AS df
        FROM r WHERE kw_rank <= 3""",
    "importance_weight": f"""{SEQ},
        big AS (SELECT doc_id, source,
                  unnest(list_transform(range(1, len(tokens)),
                    i -> ((tokens[i]::BIGINT * 131 + tokens[i+1]) % 8192)::INT
                  )) AS h
                FROM seq WHERE len(tokens) >= 2),
        lm AS (SELECT h, count(*)::BIGINT AS cr,
                 sum(CASE WHEN source IN ('src0', 'src1')
                     THEN 1 ELSE 0 END)::BIGINT AS ct
               FROM big GROUP BY h),
        tt AS (SELECT sum(cr)::DOUBLE AS nr, sum(ct)::DOUBLE AS nt FROM lm),
        w AS (SELECT h, ln((ct + 1) / (nt + 8192.0))
                       - ln((cr + 1) / (nr + 8192.0)) AS w
              FROM lm, tt)
        SELECT big.doc_id, big.source, count(*)::BIGINT AS n_bigrams,
          round(sum(w.w), 6) AS log_iw
        FROM big JOIN w USING (h)
        GROUP BY big.doc_id, big.source""",
    "mixture_sample": f"""{SEQ},
        s2 AS (SELECT doc_id, source, len(tokens)::INT AS n_tok FROM seq),
        tot AS (SELECT source, sum(n_tok)::BIGINT AS toks
                FROM s2 GROUP BY source),
        mn AS (SELECT min(toks)::BIGINT AS mn FROM tot)
        SELECT s2.doc_id, s2.source, s2.n_tok
        FROM s2 JOIN tot USING (source), mn
        WHERE ((s2.doc_id::BIGINT % 1000003) * 2654435761) % 10000
                * tot.toks
              < mn.mn * 10000""",
    "ann_quantized": """
        WITH e AS (SELECT vec_id,
               list_transform(embedding, x -> x::DOUBLE) AS v
             FROM embeddings),
        qz AS (SELECT vec_id,
               list_transform(v, x -> floor(
                 x * coalesce(127.0 / nullif(
                   list_max(list_transform(v, y -> abs(y))), 0), 0))::BIGINT)
               AS qv
             FROM e),
        q AS (SELECT qv AS qq FROM qz WHERE vec_id = 0),
        s AS (SELECT vec_id,
               list_sum(list_transform(range(1, len(qv) + 1),
                 i -> qv[i] * qq[i]))::BIGINT AS score
             FROM qz, q)
        SELECT vec_id, score, rank FROM
          (SELECT *, (row_number() OVER (ORDER BY score DESC, vec_id))::BIGINT
             AS rank FROM s)
        WHERE rank <= 5""",
    "pack_sequences": f"""{SEQ},
        p AS (
          SELECT source, len(tokens) AS n_tok,
            coalesce(sum(len(tokens)) OVER (
              PARTITION BY source ORDER BY doc_id::BIGINT
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
          FROM seq)
        SELECT source, (off // {PACK_BUDGET})::BIGINT AS seq_id,
          count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS seq_tokens
        FROM p GROUP BY 1, 2""",
}

_TEXT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "tokenize": q_tokenize,
    "doc_quality": q_doc_quality,
    "langid": q_langid,
    "fingerprint": q_fingerprint,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash": q_dedup_minhash,
    "dedup_clusters": q_dedup_clusters,
    "dedup_keep": q_dedup_keep,
    "dedup_window": q_dedup_window,
    "decontaminate": q_decontaminate,
    "simhash": q_simhash,
    "term_match": q_term_match,
    "ngram_match": q_ngram_match,
    "bm25": q_bm25,
    "ann_cosine": q_ann_cosine,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "dedup_embedding": q_dedup_embedding,
    "dedup_simhash": q_dedup_simhash,
    "token_stats": q_token_stats,
    "vector_reduce": q_vector_reduce,
    "source_stats": q_source_stats,
    "chunk_tokens": q_chunk_tokens,
    "rep_ngram": q_rep_ngram,
    "pack_sequences": q_pack_sequences,
    "ann_quantized": q_ann_quantized,
    "lm_quality": q_lm_quality,
    "keywords": q_keywords,
    "importance_weight": q_importance_weight,
    "mixture_sample": q_mixture_sample,
}


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

_ORACLES: dict[str, str] = {
    "interaction_count": f"""
        {EV}
        SELECT {KEYS},
          sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END)
            OVER ({W_ROWS})::BIGINT AS clicks_cum
        FROM ev""",
    "incremental_count": f"""
        {EV}
        SELECT * FROM (
          SELECT {KEYS},
            sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END)
              OVER ({W_ROWS})::BIGINT AS clicks_cum
          FROM ev)
        WHERE ts_ms > (SELECT (min(ts_ms) + max(ts_ms)) // 2 FROM ev)""",
    "incremental_count_ttl": f"""
        {EV}
        SELECT * FROM (
          SELECT {KEYS},
            (CASE WHEN ts_ms - max(CASE WHEN event_type='click' THEN ts_ms END)
                    OVER ({W_ROWS}) <= {3 * MS_DAY}
             THEN sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END)
                    OVER ({W_ROWS})
             ELSE 0 END)::BIGINT AS clicks_ttl
          FROM ev)
        WHERE ts_ms > (SELECT (min(ts_ms) + max(ts_ms)) // 2 FROM ev)""",
    "last_scalar": f"""
        {EV}
        SELECT {KEYS},
          last_value(CASE WHEN event_type='purchase' THEN value END IGNORE NULLS)
            OVER ({W_ROWS}) AS last_purchase
        FROM ev""",
    "lag_lead": f"""
        {EV}
        SELECT {KEYS},
          lag(value) OVER w AS value_lag1,
          lead(value) OVER w AS value_lead1,
          ts_ms - lag(ts_ms) OVER w AS ts_delta_ms
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)""",
    "sessionize": f"""
        {EV}, g AS (
          SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL
                           OR ts_ms - lag(ts_ms) OVER w > {GAP_MS} THEN 1 ELSE 0 END AS ns
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id))
        SELECT {KEYS},
          (sum(ns) OVER ({W_ROWS}) - 1)::BIGINT AS session_idx
        FROM g""",
    "session_stats": f"""
        {EV}, g AS (
          SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL
                           OR ts_ms - lag(ts_ms) OVER w > {GAP_MS} THEN 1 ELSE 0 END AS ns
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        s AS (SELECT *, (sum(ns) OVER ({W_ROWS}) - 1)::BIGINT AS session_idx FROM g)
        SELECT user_id, session_idx,
          min(ts_ms) AS session_start_ms, max(ts_ms) AS session_end_ms,
          max(ts_ms) - min(ts_ms) AS session_dur_ms,
          count(*)::BIGINT AS n_events
        FROM s GROUP BY user_id, session_idx""",
    "window_count": f"""
        {EV}, d AS (SELECT *, floor(ts_ms/{MS_DAY})::BIGINT AS day FROM ev)
        SELECT {KEYS},
          (sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) OVER ({W_ROWS})
           - coalesce(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY day
                     RANGE BETWEEN UNBOUNDED PRECEDING AND 8 PRECEDING), 0))::BIGINT AS wcnt7
        FROM d""",
    "window_count_multi": f"""
        {EV}, d AS (SELECT *, floor(ts_ms/{MS_DAY})::BIGINT AS day,
                    CASE WHEN event_type='click' THEN 1 ELSE 0 END AS c FROM ev)
        SELECT {KEYS},
          (sum(c) OVER ({W_ROWS}) - coalesce(sum(c) OVER (PARTITION BY user_id ORDER BY day
              RANGE BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING), 0))::BIGINT AS wcnt1,
          (sum(c) OVER ({W_ROWS}) - coalesce(sum(c) OVER (PARTITION BY user_id ORDER BY day
              RANGE BETWEEN UNBOUNDED PRECEDING AND 8 PRECEDING), 0))::BIGINT AS wcnt7,
          (sum(c) OVER ({W_ROWS}) - coalesce(sum(c) OVER (PARTITION BY user_id ORDER BY day
              RANGE BETWEEN UNBOUNDED PRECEDING AND 31 PRECEDING), 0))::BIGINT AS wcnt30
        FROM d""",
    "rate": f"""
        {EV}, d AS (SELECT *, floor(ts_ms/{MS_DAY})::BIGINT AS day,
                    CASE WHEN event_type='click' THEN 1 ELSE 0 END AS c,
                    CASE WHEN event_type='view' THEN 1 ELSE 0 END AS v FROM ev)
        SELECT {KEYS},
          (sum(c) OVER ({W_ROWS}) - coalesce(sum(c) OVER (PARTITION BY user_id ORDER BY day
              RANGE BETWEEN UNBOUNDED PRECEDING AND 8 PRECEDING), 0))::DOUBLE
          / nullif((sum(v) OVER ({W_ROWS}) - coalesce(sum(v) OVER (PARTITION BY user_id
              ORDER BY day RANGE BETWEEN UNBOUNDED PRECEDING AND 8 PRECEDING), 0)), 0)
          AS rate7
        FROM d""",
    "rate_normalized": f"""
        {EV}, d AS (SELECT *, floor(ts_ms/{MS_DAY})::BIGINT AS day,
                    CASE WHEN event_type='click' THEN 1 ELSE 0 END AS c,
                    CASE WHEN event_type='view' THEN 1 ELSE 0 END AS v FROM ev),
        gb AS (SELECT day, sum(c) AS gt, sum(v) AS gbv FROM d GROUP BY day),
        gw AS (SELECT day,
            (sum(gt) OVER (ORDER BY day RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - coalesce(sum(gt) OVER (ORDER BY day RANGE BETWEEN UNBOUNDED PRECEDING AND 8 PRECEDING), 0)) AS gt7,
            (sum(gbv) OVER (ORDER BY day RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - coalesce(sum(gbv) OVER (ORDER BY day RANGE BETWEEN UNBOUNDED PRECEDING AND 8 PRECEDING), 0)) AS gb7
          FROM gb)
        SELECT {KEYS},
          (10.0 + (sum(c) OVER ({W_ROWS}) - coalesce(sum(c) OVER (PARTITION BY user_id
              ORDER BY day RANGE BETWEEN UNBOUNDED PRECEDING AND 8 PRECEDING), 0)))
          / nullif(10.0 * floor(gb7::DOUBLE / nullif(gt7, 0)::DOUBLE)
             + (sum(v) OVER ({W_ROWS}) - coalesce(sum(v) OVER (PARTITION BY user_id
                 ORDER BY day RANGE BETWEEN UNBOUNDED PRECEDING AND 8 PRECEDING), 0)), 0)
          AS nrate7
        FROM d JOIN gw USING (day)""",
    "rate_field_scoped": f"""
        WITH ev AS (SELECT event_id::BIGINT AS event_id, epoch_ms(ts) AS ts_ms,
                user_id::BIGINT AS user_id, event_type,
                CASE WHEN event_type='signup'
                     THEN json_extract_string(props, '$.k') END AS k_sig
              FROM events),
        k AS (SELECT event_id, user_id, ts_ms, event_type,
                last_value(k_sig IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts_ms, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS fscope
              FROM ev),
        d AS (SELECT *, floor(ts_ms/{MS_DAY})::BIGINT AS day,
                CASE WHEN event_type='click' THEN 1 ELSE 0 END AS c,
                CASE WHEN event_type='view' THEN 1 ELSE 0 END AS v FROM k),
        s AS (SELECT *,
                (coalesce(sum(c) OVER (PARTITION BY fscope ORDER BY ts_ms, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 - coalesce(sum(c) OVER (PARTITION BY fscope ORDER BY day
                    RANGE BETWEEN UNBOUNDED PRECEDING AND 8 PRECEDING), 0)) AS top7,
                (coalesce(sum(v) OVER (PARTITION BY fscope ORDER BY ts_ms, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 - coalesce(sum(v) OVER (PARTITION BY fscope ORDER BY day
                    RANGE BETWEEN UNBOUNDED PRECEDING AND 8 PRECEDING), 0)) AS bot7
              FROM d)
        SELECT event_id, user_id, ts_ms, fscope,
          (CASE WHEN fscope IS NOT NULL THEN top7 END)::BIGINT AS top7_fs,
          (CASE WHEN fscope IS NOT NULL THEN bot7 END)::BIGINT AS bot7_fs,
          CASE WHEN fscope IS NOT NULL
               THEN top7::DOUBLE / nullif(bot7, 0) END AS rate7_fs
        FROM s WHERE event_type='view'""",
    "asof_snapshot": f"""
        {EV}, d AS (SELECT *, floor(ts_ms/{MS_DAY})::BIGINT AS day,
                    CASE WHEN event_type='click' THEN 1 ELSE 0 END AS c,
                    CASE WHEN event_type='view' THEN 1 ELSE 0 END AS v FROM ev),
        s AS (SELECT {KEYS}, event_type,
          coalesce(sum(c) OVER ({W_ROWS_STRICT}), 0)::BIGINT AS clicks_before,
          (coalesce(sum(v) OVER ({W_ROWS_STRICT}), 0)
           - coalesce(sum(v) OVER (PARTITION BY user_id ORDER BY day
               RANGE BETWEEN UNBOUNDED PRECEDING AND 8 PRECEDING), 0))::BIGINT AS views7_before,
          last_value(CASE WHEN event_type='purchase' THEN value END IGNORE NULLS)
            OVER ({W_ROWS_STRICT}) AS last_purchase_before
        FROM d)
        SELECT {KEYS}, clicks_before, views7_before, last_purchase_before
        FROM s WHERE event_type='view'""",
    "asof_join": f"""
        {EV}
        SELECT c.event_id, c.user_id, c.ts_ms,
          (SELECT p.value FROM ev p
            WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
              AND (p.ts_ms < c.ts_ms OR (p.ts_ms = c.ts_ms AND p.event_id < c.event_id))
            ORDER BY p.ts_ms DESC, p.event_id DESC LIMIT 1) AS value_asof
        FROM ev c WHERE c.event_type = 'click'""",
    "bounded_list": f"""
        {EV}
        SELECT {KEYS},
          concat_ws(',', event_type,
            CASE WHEN lag(ts_ms,1) OVER w >= ts_ms - {MS_DAY} THEN lag(event_type,1) OVER w END,
            CASE WHEN lag(ts_ms,2) OVER w >= ts_ms - {MS_DAY} THEN lag(event_type,2) OVER w END
          ) AS recent
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)""",
    "rank_eval": f"""
        WITH ev AS (SELECT event_id::BIGINT AS event_id,
                user_id::BIGINT AS user_id, event_type, value
              FROM events WHERE event_type IN ('view', 'click')),
        r AS (SELECT user_id,
                CASE WHEN event_type='click' THEN 1.0 ELSE 0.0 END AS rel,
                row_number() OVER (PARTITION BY user_id
                  ORDER BY value DESC, event_id) AS pos,
                event_id
              FROM ev),
        ri AS (SELECT user_id, rel, pos,
                row_number() OVER (PARTITION BY user_id
                  ORDER BY rel DESC, event_id) AS ipos
               FROM r)
        SELECT user_id, count(*)::BIGINT AS n_items,
          round(CASE
            WHEN sum(CASE WHEN ipos <= 10 THEN rel / log2(ipos + 1) END)
                 IS NULL THEN 1.0
            ELSE coalesce(sum(CASE WHEN pos <= 10
                     THEN rel / log2(pos + 1) END), 0)
                 / sum(CASE WHEN ipos <= 10 THEN rel / log2(ipos + 1) END)
          END, 6) AS ndcg10,
          round(coalesce(1.0 / min(CASE WHEN rel = 1.0 THEN pos END), 0), 6)
            AS mrr
        FROM ri GROUP BY user_id""",
    "interacted_with": f"""
        WITH ev AS (SELECT event_id::BIGINT AS event_id, epoch_ms(ts) AS ts_ms,
                user_id::BIGINT AS user_id, event_type,
                json_extract_string(props, '$.k') AS k
              FROM events),
        l AS (SELECT *, coalesce(list(k) FILTER (
                WHERE event_type='click' AND k IS NOT NULL) OVER (
                PARTITION BY user_id ORDER BY ts_ms, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                []::VARCHAR[]) AS ks
              FROM ev),
        t AS (SELECT *, CASE WHEN len(ks) <= 3 THEN ks
                ELSE list_slice(ks, len(ks) - 2, len(ks)) END AS last3
              FROM l)
        SELECT event_id, user_id, ts_ms,
          coalesce(array_to_string(last3, ','), '') AS recent_ks,
          len(list_filter(last3, x -> x = k))::BIGINT AS overlap
        FROM t WHERE event_type='view'""",
    "stats_window": f"""
        {EV}, p AS (SELECT * FROM ev WHERE event_type='purchase')
        SELECT {KEYS},
          min(value) OVER w AS stat_min,
          max(value) OVER w AS stat_max,
          round(avg(value) OVER w, 6) AS stat_avg,
          (count(value) OVER w)::BIGINT AS stat_n
        FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                            ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)""",
    "freq_share": f"""
        {EV}
        SELECT {KEYS},
          (sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) OVER w)::DOUBLE
            / (count(*) OVER w) AS freq_share
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)""",
    "stats_percentile": f"""
        {EV}, p AS (SELECT * FROM ev WHERE event_type='purchase')
        SELECT {KEYS},
          round(quantile_cont(value, 0.5) OVER w, 6) AS stat_p50,
          round(quantile_cont(value, 0.9) OVER w, 6) AS stat_p90
        FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                            ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)""",
    "freq_share_sampled": f"""
        {EV}, acc AS (
          SELECT * FROM ev
          WHERE ((event_id % 1000003) * 2654435761) % 1000 < 500),
        p AS (SELECT event_id AS aid, user_id AS auid, ts_ms AS ats,
          (sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) OVER w)::DOUBLE
            / (count(*) OVER w) AS fs
          FROM acc WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
        SELECT {KEYS},
          (SELECT fs FROM p WHERE auid = e.user_id
             AND (ats < e.ts_ms OR (ats = e.ts_ms AND aid <= e.event_id))
           ORDER BY ats DESC, aid DESC LIMIT 1) AS freq_share_s
        FROM ev e""",
    "map_feature": f"""
        {EV}
        SELECT user_id, event_type AS map_key, value AS last_value, ts_ms AS last_ts_ms
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                ORDER BY ts_ms DESC, event_id DESC) AS rn FROM ev)
        WHERE rn = 1""",
    "item_age": f"""
        {EV}
        SELECT {KEYS},
          floor((ts_ms - last_value(CASE WHEN event_type='signup' THEN ts_ms END IGNORE NULLS)
            OVER ({W_ROWS_STRICT})) / 1000.0) AS age_sec
        FROM ev""",
    "local_time": f"""
        {EV}
        SELECT {KEYS},
          floor((ts_ms % {MS_DAY}) / 3600000)::BIGINT AS hour_utc,
          ((floor(ts_ms / {MS_DAY})::BIGINT + 3) % 7 + 1)::BIGINT AS dow
        FROM ev""",
    "split_hold_last": f"""
        {EV}
        SELECT event_id, user_id,
          CASE WHEN row_number() OVER (PARTITION BY user_id
                 ORDER BY ts_ms DESC, event_id DESC) = 1
               THEN 'test' ELSE 'train' END AS split
        FROM ev""",
    "data_quality": f"""
        {EV}, g AS (SELECT *, lag(ts_ms) OVER (ORDER BY event_id) AS prev FROM ev)
        SELECT count(*)::BIGINT AS n_rows,
               count(DISTINCT event_id)::BIGINT AS n_ids,
               sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_users,
               sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_values,
               sum(CASE WHEN ts_ms < prev THEN 1 ELSE 0 END)::BIGINT AS order_violations
        FROM g""",
    "split_time": f"""
        {EV}, c AS (SELECT quantile_cont(ts_ms, 0.8) AS cut FROM ev)
        SELECT event_id, user_id,
          CASE WHEN ts_ms <= cut THEN 'train' ELSE 'test' END AS split
        FROM ev, c""",
    "trending": f"""
        {EV}, d AS (
          SELECT user_id, event_type, floor(ts_ms/{MS_DAY})::BIGINT AS day
          FROM ev WHERE event_type IN ('click','purchase')),
        m AS (SELECT max(day) AS max_day FROM d)
        SELECT user_id,
          round(sum(pow(0.9, (max_day - day)) *
                    CASE WHEN event_type='purchase' THEN 5.0 ELSE 1.0 END), 6) AS trend_score,
          count(*)::BIGINT AS n_inter
        FROM d, m WHERE max_day - day < 30
        GROUP BY user_id""",
}

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "interaction_count": q_interaction_count,
    "incremental_count": q_incremental_count,
    "incremental_count_ttl": q_incremental_count_ttl,
    "last_scalar": q_last_scalar,
    "lag_lead": q_lag_lead,
    "sessionize": q_sessionize,
    "sessionize_salted": q_sessionize_salted,
    "interaction_count_salted": q_interaction_count_salted,
    "session_stats": q_session_stats,
    "window_count": q_window_count,
    "window_count_multi": q_window_count_multi,
    "rate": q_rate,
    "rate_normalized": q_rate_normalized,
    "rate_field_scoped": q_rate_field_scoped,
    "asof_snapshot": q_asof_snapshot,
    "asof_join": q_asof_join,
    "bounded_list": q_bounded_list,
    "interacted_with": q_interacted_with,
    "rank_eval": q_rank_eval,
    "stats_window": q_stats_window,
    "stats_percentile": q_stats_percentile,
    "freq_share": q_freq_share,
    "freq_share_sampled": q_freq_share_sampled,
    "map_feature": q_map_feature,
    "item_age": q_item_age,
    "local_time": q_local_time,
    "split_hold_last": q_split_hold_last,
    "split_time": q_split_time,
    "data_quality": q_data_quality,
    "trending": q_trending,
    **_TEXT_QUERIES,
}
_ORACLES.update(_TEXT_ORACLES)
# the salted twins answer the same question — same oracle
_ORACLES["sessionize_salted"] = _ORACLES["sessionize"]
_ORACLES["interaction_count_salted"] = _ORACLES["interaction_count"]

# The driver's correctness harness checks at most 50 queries per round, so
# every registered query must fit under that cap to get a driver oracle
# row. These five are the weaker member of a redundant pair — the
# registered twin exercises the identical machinery — and are retired
# from the DRIVER registry only:
#   lag_lead            ⊂ asof_join / sessionize (per-entity lag windows)
#   window_count        ⊂ window_count_multi ([1,7,30] ⊇ [7])
#   freq_share_sampled  ⊃ freq_share (same bounded-pool fold + a sample
#                         filter; the as-of hop is covered by asof_join)
#   simhash             ⊂ dedup_simhash (groups by the same simhash expr)
#   source_stats        ⊂ token_stats (same per-source agg, weaker stats)
#   stats_percentile    ⊂ stats_window (same bounded-pool StatsEstimator
#                         fold; the p50/p90 read is golden-tested and
#                         retired to make room for incremental_count)
#   interaction_count_salted ⊂ interaction_count (same query; the salted
#                         plan's bit-identity is property-tested in
#                         tests/test_engine_salted.py and plan-gated;
#                         sessionize_salted stays as the driver's salted
#                         representative — retired to make room for
#                         incremental_count_ttl)
#   dedup_keep          ⊂ dedup_clusters (shares _doc_clusters verbatim;
#                         the survivor pick is two grouped aggs on the
#                         cluster frame — retired in round 5 to make
#                         room for dedup_window, a NEW operator family)
#   ann_lsh             ⊂ ANN family (4 registered variants; the LSH
#                         banding scheme stays driver-checked through
#                         dedup_embedding, and ann_ivf/ann_quantized
#                         remain as the scale paths — retired to make
#                         room for importance_weight, a NEW family)
#   split_time          ⊂ split family (split_hold_last keeps the
#                         driver slot: it exercises the harder
#                         ranking-granularity cut; time split is a
#                         single filter over the same frame — retired
#                         to make room for mixture_sample, a NEW family)
# They remain first-class locally: all_queries()/all_oracles() feed
# tests/test_correctness.py and bench.py, so each still runs the full
# DuckDB comparison every CI pass.
_RETIRED: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_RETIRED_ORACLES: dict[str, str] = {}
for _rname in (
    "lag_lead", "window_count", "freq_share_sampled", "simhash",
    "source_stats", "stats_percentile", "interaction_count_salted",
    "dedup_keep", "ann_lsh", "split_time",
):
    _RETIRED[_rname] = _QUERIES.pop(_rname)
    _RETIRED_ORACLES[_rname] = _ORACLES.pop(_rname)

# mixture_plan (round 5) was BORN local-only: mixture_sample holds the
# family's driver slot; the plan/audit twin keeps its full DuckDB
# comparison via all_queries().
_RETIRED["mixture_plan"] = q_mixture_plan
_RETIRED_ORACLES["mixture_plan"] = f"""{SEQ},
    s2 AS (SELECT doc_id, source, len(tokens)::INT AS n_tok FROM seq),
    tot AS (SELECT source, count(*)::BIGINT AS docs,
              sum(n_tok)::BIGINT AS toks
            FROM s2 GROUP BY source),
    mn AS (SELECT min(toks)::BIGINT AS mn FROM tot),
    kept AS (SELECT s2.source, count(*)::BIGINT AS kept_docs,
               sum(s2.n_tok)::BIGINT AS kept_toks
             FROM s2 JOIN tot USING (source), mn
             WHERE ((s2.doc_id::BIGINT % 1000003) * 2654435761) % 10000
                     * tot.toks
                   < mn.mn * 10000
             GROUP BY s2.source)
    SELECT tot.source, tot.docs, tot.toks, mn.mn AS budget_toks,
      round(least(1.0, mn.mn::DOUBLE / tot.toks), 6) AS rate,
      coalesce(kept.kept_docs, 0)::BIGINT AS kept_docs,
      coalesce(kept.kept_toks, 0)::BIGINT AS kept_toks
    FROM tot LEFT JOIN kept USING (source), mn"""

# bpe_vocab (round 5) is local-only and rows-only here: BPE training is
# an ITERATIVE argmax-merge loop (not SQL-expressible as one query), so
# its exactness check is the stronger pure-Python reference-equality
# suite in tests/test_bpe.py (merge table AND per-doc encodings match a
# classic Sennrich-2016 implementation bit-for-bit, ties included).
def q_bpe_vocab(spark: SparkSession, sf: str) -> DataFrame:
    """Subword vocabulary induction: 10 BPE merges learned from the
    documents table (functions/bpe.py — one corpus scan to the
    (word,count) vocab, then vocab-table-sized merge iterations; driver
    traffic = 1 row per merge)."""
    from metarank_spark.functions import bpe

    docs = load_documents(spark, sf)
    merges = bpe.train_bpe(docs, n_merges=10)
    return spark.createDataFrame(
        merges, "rank long, left long, right long, new_id long")


_RETIRED["bpe_vocab"] = q_bpe_vocab

# rank_krr (round 5) was BORN local-only: the driver registry is at its
# 50-query cap, and rank_eval already holds the eval family's driver
# slot. Same full DuckDB comparison every CI pass via all_queries().
_RETIRED["rank_krr"] = q_rank_krr
_RETIRED_ORACLES["rank_krr"] = """
    WITH ev AS (SELECT event_id::BIGINT AS event_id,
            user_id::BIGINT AS user_id, epoch_ms(ts) AS ts_ms, value
          FROM events WHERE event_type IN ('view', 'click')),
    d AS (SELECT user_id,
            row_number() OVER (PARTITION BY user_id
              ORDER BY ts_ms, event_id) - 1 AS pos,
            row_number() OVER (PARTITION BY user_id
              ORDER BY value DESC, event_id) - 1 AS npos
          FROM ev),
    n AS (SELECT user_id, count(*)::BIGINT AS c FROM d GROUP BY user_id),
    inv AS (SELECT a.user_id,
            sum(CASE WHEN a.npos > b.npos THEN 1 ELSE 0 END)::BIGINT AS dis
          FROM d a JOIN d b ON a.user_id = b.user_id AND a.pos < b.pos
          GROUP BY a.user_id)
    SELECT n.user_id,
      CASE WHEN n.c >= 2 THEN round(1.0 - 4.0 * coalesce(inv.dis, 0)::DOUBLE
           / (n.c * (n.c - 1))::DOUBLE, 6) END AS krr
    FROM n LEFT JOIN inv ON n.user_id = inv.user_id"""


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registered + retired queries — the local test/bench surface."""
    return {**_QUERIES, **_RETIRED}


def all_oracles() -> dict[str, str]:
    return {**_ORACLES, **_RETIRED_ORACLES}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: zero-leakage point-in-time snapshot at sf0.001."""
    return q_asof_snapshot(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
