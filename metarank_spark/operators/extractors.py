"""Feature extractors — Spark-first restatements of the reference's 21
user-facing features (SURVEY.md §2.2; feature/*.scala).

Each extractor takes a canonical event DataFrame (schema.py) and returns a
DataFrame with one new feature column per config, computed at every
entity×timestamp with the reference's update-ordering semantics:

- value emitted AT an event includes that event's own write (<=)
  (FeatureValueFlow.scala:29-42: commit precedes computeValue);
- snapshot taken FOR a query/ranking event sees strictly-before state (<)
  (MetarankFlow.scala:31-55; TrainBuffer.scala:51-71) — pass
  ``strictly_before=True``.

All hot paths are built-in window functions (JVM, whole-stage codegen);
no Python on the data path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from metarank_spark.plans.windows import (
    MS_PER_DAY,
    bucket_col,
    bucketed_window_count,
)

ORDER = ("ts_ms", "event_id")


def _w(entity: str, end: int | None = None):
    end = Window.currentRow if end is None else end
    return (
        Window.partitionBy(entity)
        .orderBy(*ORDER)
        .rowsBetween(Window.unboundedPreceding, end)
    )


def interaction_count(
    df: DataFrame,
    interaction: str,
    entity: str = "user_id",
    out: str = "interaction_count",
    strictly_before: bool = False,
) -> DataFrame:
    """Lifetime count of interactions of a type per scope
    (InteractionCountFeature.scala:33-59; missing state reads as 0.0 at
    :55-58, hence coalesce-to-0)."""
    w = _w(entity, -1 if strictly_before else None)
    cnt = F.sum(F.when(F.col("event_type") == interaction, 1).otherwise(0)).over(w)
    return df.withColumn(out, F.coalesce(cnt, F.lit(0)).cast("long"))


def window_count(
    df: DataFrame,
    interaction: str,
    periods: list[int],
    entity: str = "user_id",
    bucket_ms: int = MS_PER_DAY,
    out_prefix: str = "wcnt",
    strictly_before: bool = False,
) -> DataFrame:
    """Sliding window counts over time buckets, one column per period
    (WindowInteractionCountFeature.scala:25-46; window shape = PeriodRange
    (p, 0) ⇒ buckets [cur - p, cur] inclusive, model/Feature.scala:142-161
    anchored at the current row's bucket — exact for read-at-write)."""
    b = bucket_col("ts_ms", bucket_ms)
    pred = F.col("event_type") == interaction
    cols = {
        f"{out_prefix}{p}": bucketed_window_count(
            pred, entity, b, p, *ORDER, strictly_before=strictly_before
        ).cast("long")
        for p in periods
    }
    return df.withColumns(cols)


def rate(
    df: DataFrame,
    top: str,
    bottom: str,
    periods: list[int],
    entity: str = "user_id",
    bucket_ms: int = MS_PER_DAY,
    out_prefix: str = "rate",
) -> DataFrame:
    """Plain ratio of two windowed interaction counts
    (RateFeature.scala:313-330: top/bottom per period, missing → NaN;
    here null when the bottom window is empty)."""
    b = bucket_col("ts_ms", bucket_ms)
    cols = {}
    for p in periods:
        t = bucketed_window_count(F.col("event_type") == top, entity, b, p, *ORDER)
        bo = bucketed_window_count(F.col("event_type") == bottom, entity, b, p, *ORDER)
        cols[f"{out_prefix}{p}"] = t / F.nullif(bo.cast("double"), F.lit(0.0))
    return df.withColumns(cols)


def rate_normalized(
    df: DataFrame,
    top: str,
    bottom: str,
    periods: list[int],
    weight: float,
    entity: str = "user_id",
    bucket_ms: int = MS_PER_DAY,
    out_prefix: str = "nrate",
) -> DataFrame:
    """Bayesian-normalized rate (RateFeature.scala:331-355):

        (weight + top) / (weight * (globalBottom / globalTop) + bottom)

    Global windowed counts are a single hot key (GlobalScope) — computed
    as a two-level aggregation: per-bucket global totals (tiny: one row
    per bucket), cumulative over buckets, then broadcast-joined back on
    the bucket index. No per-event global window, no skewed shuffle.
    Global priors use whole-bucket totals (day granularity), the natural
    definition for a smoothing prior.
    """
    df = df.withColumn("__bucket", bucket_col("ts_ms", bucket_ms))

    per_bucket = (
        df.groupBy("__bucket")
        .agg(
            F.sum(F.when(F.col("event_type") == top, 1).otherwise(0)).alias("gt"),
            F.sum(F.when(F.col("event_type") == bottom, 1).otherwise(0)).alias("gb"),
        )
    )
    # these windows run over the per-bucket global totals — one row per
    # time bucket, bounded by the calendar, so a single partition is the
    # intended plan; the constant partition key states that explicitly
    # (and avoids the misleading WindowExec global-window warning).
    # pmod(col, 1) == 0 but is not foldable, so Catalyst keeps it.
    one = F.pmod(F.col("__bucket"), F.lit(1))
    wb = Window.partitionBy(one).orderBy("__bucket")
    cols = []
    for p in periods:
        older = Window.partitionBy(one).orderBy("__bucket").rangeBetween(
            Window.unboundedPreceding, -(p + 1)
        )
        run = wb.rangeBetween(Window.unboundedPreceding, 0)
        cols.append(
            (F.sum("gt").over(run) - F.coalesce(F.sum("gt").over(older), F.lit(0))).alias(f"__gt{p}")
        )
        cols.append(
            (F.sum("gb").over(run) - F.coalesce(F.sum("gb").over(older), F.lit(0))).alias(f"__gb{p}")
        )
    global_buckets = per_bucket.select("__bucket", *cols)

    out = df.join(F.broadcast(global_buckets), "__bucket", "left")
    w = float(weight)
    newcols = {}
    for p in periods:
        t = bucketed_window_count(F.col("event_type") == top, entity, F.col("__bucket"), p, *ORDER)
        bo = bucketed_window_count(F.col("event_type") == bottom, entity, F.col("__bucket"), p, *ORDER)
        # nullif: ANSI mode raises on /0; an empty global-top window reads
        # as missing (null) rather than crashing the job.
        # floor: the reference divides two Longs (RateFeature.scala:346-348
        # bottomGlobalNum.value / topGlobalNum.value), i.e. integer
        # division — parity requires truncating the global ratio.
        g_ratio = F.floor(
            F.col(f"__gb{p}") / F.nullif(F.col(f"__gt{p}").cast("double"), F.lit(0.0))
        ).cast("double")
        # truncation can zero the whole denominator (ratio 0 and empty
        # bottom window) — read as missing rather than raise under ANSI
        newcols[f"{out_prefix}{p}"] = (F.lit(w) + t) / F.nullif(
            F.lit(w) * g_ratio + bo, F.lit(0.0)
        )
    out = out.withColumns(newcols)
    return out.drop("__bucket", *[c for p in periods for c in (f"__gt{p}", f"__gb{p}")])


def last_scalar(
    df: DataFrame,
    value: Column | str,
    entity: str = "user_id",
    out: str = "last_value",
    strictly_before: bool = False,
) -> DataFrame:
    """ScalarFeature: latest Put wins (MemScalarFeature.scala:14-17);
    null (⇒ NaN at the MValue layer) when no write yet."""
    col = F.col(value) if isinstance(value, str) else value
    w = _w(entity, -1 if strictly_before else None)
    return df.withColumn(out, F.last(col, ignorenulls=True).over(w))


def lag_lead(
    df: DataFrame,
    value: str = "value",
    entity: str = "user_id",
    n: int = 1,
) -> DataFrame:
    """lag/lead of a column within the entity's time-sorted stream."""
    w = Window.partitionBy(entity).orderBy(*ORDER)
    return df.withColumns(
        {
            f"{value}_lag{n}": F.lag(value, n).over(w),
            f"{value}_lead{n}": F.lead(value, n).over(w),
            "ts_delta_ms": F.col("ts_ms") - F.lag("ts_ms", n).over(w),
        }
    )


def item_age_sec(
    df: DataFrame,
    update_pred: Column,
    entity: str = "user_id",
    out: str = "age_sec",
) -> DataFrame:
    """ItemAgeFeature: whole seconds between now and the entity's last
    metadata update (ItemAgeFeature.scala:41-84: the update's ts is stored
    as a double; value = updatedAt.diff(request.ts).toSeconds — truncated
    to whole seconds, hence the floor)."""
    w = _w(entity, -1)  # strictly before: the event's own update not counted
    last_upd = F.last(F.when(update_pred, F.col("ts_ms")), ignorenulls=True).over(w)
    return df.withColumn(
        out, F.floor((F.col("ts_ms") - last_upd) / F.lit(1000.0)).cast("double")
    )


def bounded_list_string(
    df: DataFrame,
    value: Column | str,
    count: int,
    duration_ms: int,
    entity: str = "user_id",
    out: str = "recent",
    sep: str = ",",
) -> DataFrame:
    """BoundedListFeature read at write time, rendered as a joined string
    (newest first). Semantics (MemBoundedList.scala:18-37): prepend, then
    keep elements with ts >= append.ts - duration, take(count).

    Window form (r6 lag spelling): the list read at an append is the
    current value plus the ``count - 1`` prior appends whose ts clears
    the cutoff — exact because take(count) only ever evicts the oldest
    elements, so the surviving set is always a suffix-filter of the
    last-count appends (proof: eviction cutoffs are monotone in append
    time). Spelled as per-offset ``lag`` columns + ``concat_ws`` rather
    than a sliding ``collect_list`` + reverse/slice/filter/transform:
    the lag frame is whole-stage-codegen while every array HOF is
    interpreted, and no per-row struct array is materialized. concat_ws
    skips nulls exactly where array_join did (a lag beyond the
    partition start and an expired ts both read null)."""
    col = F.col(value) if isinstance(value, str) else value
    w = Window.partitionBy(entity).orderBy(*ORDER)
    cutoff = F.col("ts_ms") - F.lit(duration_ms)
    parts = [col]  # own append: its ts is the cutoff anchor, always kept
    for k in range(1, count):
        parts.append(
            F.when(F.lag("ts_ms", k).over(w) >= cutoff, F.lag(col, k).over(w))
        )
    return df.withColumn(out, F.concat_ws(sep, *parts))


def stats_window(
    df: DataFrame,
    value: str = "value",
    pool: int = 10,
    entity: str = "user_id",
    prefix: str = "stat",
) -> DataFrame:
    """StatsEstimatorFeature over a bounded pool = the last ``pool``
    samples (model/Feature.scala:213-234; sampleRate pinned to 1 — the
    reference's own tests do the same to stay deterministic)."""
    w = (
        Window.partitionBy(entity)
        .orderBy(*ORDER)
        .rowsBetween(-(pool - 1), Window.currentRow)
    )
    return df.withColumns(
        {
            f"{prefix}_min": F.min(value).over(w),
            f"{prefix}_max": F.max(value).over(w),
            f"{prefix}_avg": F.round(F.avg(value).over(w), 6),
            f"{prefix}_n": F.count(value).over(w).cast("long"),
        }
    )


SAMPLE_HASH_MOD = 1_000_003
SAMPLE_HASH_MULT = 2654435761


def sample_accept_numeric(event_id: Column | str, rate: float) -> Column:
    """Deterministic shouldSample analog (model/Feature.scala:249) for a
    numeric event id: accept iff ((id mod P) * MULT) mod 1000 < rate*1000.
    The inner mod keeps the product inside int64 for any BIGINT id."""
    c = F.col(event_id) if isinstance(event_id, str) else event_id
    h = ((c % SAMPLE_HASH_MOD) * F.lit(SAMPLE_HASH_MULT)) % 1000
    return h < F.lit(int(rate * 1000))


def freq_share(
    df: DataFrame,
    target: str,
    pool: int = 10,
    entity: str = "user_id",
    out: str = "freq_share",
    sample_rate: float = 1.0,
) -> DataFrame:
    """FreqEstimatorFeature: relative frequency of ``target`` among the
    last ``pool`` sampled events (model/Feature.scala:112-126:
    freq = count(value)/pool_size).

    sample_rate=1 is a plain bounded-rows window. With sample_rate<1 the
    pool holds only hash-accepted writes (deterministic shouldSample,
    Feature.scala:249), so the share is computed at each ACCEPTED row and
    carried to every event with the at-or-before as-of merge — one extra
    shuffle on the entity key, still no row explosion."""
    w = (
        Window.partitionBy(entity)
        .orderBy(*ORDER)
        .rowsBetween(-(pool - 1), Window.currentRow)
    )
    if sample_rate >= 1.0:
        hits = F.sum(F.when(F.col("event_type") == target, 1).otherwise(0)).over(w)
        total = F.count(F.lit(1)).over(w)
        return df.withColumn(out, hits / total.cast("double"))

    from metarank_spark.plans.asof import asof_join

    acc = df.filter(sample_accept_numeric("event_id", sample_rate))
    hits = F.sum(F.when(F.col("event_type") == target, 1).otherwise(0)).over(w)
    total = F.count(F.lit(1)).over(w)
    vals = acc.select(
        F.col(entity),
        "ts_ms",
        F.col("event_id").alias("__aid"),
        (hits / total.cast("double")).alias(out),
    )
    joined = asof_join(
        df,
        vals,
        on=entity,
        left_seq="event_id",
        right_seq="__aid",
        values=[out],
        strict=False,  # an accepted event reads its own write
    )
    return joined.withColumnRenamed(f"{out}_asof", out)


def map_feature_last(
    df: DataFrame,
    map_key: str = "event_type",
    value: str = "value",
    entity: str = "user_id",
) -> DataFrame:
    """MapFeature final state: latest value per (entity, mapKey)
    (MemMapFeature.scala:12-24: PutTuple upserts). Batch final-state read:
    one row per (entity, key) with the last written value."""
    w = Window.partitionBy(entity, map_key).orderBy(
        F.col("ts_ms").desc(), F.col("event_id").desc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(entity),
            F.col(map_key).alias("map_key"),
            F.col(value).alias("last_value"),
            F.col("ts_ms").alias("last_ts_ms"),
        )
    )
