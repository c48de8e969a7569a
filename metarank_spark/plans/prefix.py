"""Salted two-pass prefix aggregation — hot-entity skew handling for
running (cumulative) aggregates.

The merged scan partitions by entity; a pathological hot key (one user or
item carrying a macroscopic fraction of 10^12 events) would pin its whole
timeline to one task. Window partitions are NOT split by AQE skew
handling, so the fix is structural: salt the hot entity's timeline into
contiguous time chunks and reassemble exactly.

    salt      = floor(ts_ms / chunk_ms)            (time-contiguous!)
    pass 1    = running aggregate within (entity, salt)   — bounded tasks
    pass 2    = per-(entity, salt) totals, prefix-summed over salts
                (tiny: one row per entity-chunk) — broadcast back
    result    = within-chunk running value + offset of all earlier chunks

Exactness: the salt is a non-decreasing function of the (ts_ms, seq)
order, so every row's strictly-earlier set splits cleanly into "earlier
chunks" (covered by the offset) and "earlier rows in my chunk" (covered by
the within-chunk window). This is the classic parallel prefix-sum shape,
the same trick rate_normalized uses for the GlobalScope counters
(operators/extractors.py) — generalized to any entity.

North-star citation: "events are range-partitioned and salted by entity
key" — salting here = (entity, time-chunk) sub-partitioning with exact
reassembly, not random salt + approximate merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DAY_MS = 86_400_000


def salted_cumulative_sum(
    df: DataFrame,
    value: Column,
    entity: str = "user_id",
    order: tuple[str, str] = ("ts_ms", "event_id"),
    chunk_ms: int = 7 * DAY_MS,
    out: str = "cum",
    strictly_before: bool = False,
) -> DataFrame:
    """Running sum of ``value`` per entity, computed skew-safely: the
    per-task partition key is (entity, time-chunk) instead of entity, so a
    hot entity's timeline spreads over timeline_length/chunk_ms tasks.

    Bit-identical to the single-window form
    ``sum(value) OVER (PARTITION BY entity ORDER BY order ROWS UNBOUNDED
    PRECEDING [AND 1 PRECEDING])`` (property-tested)."""
    ts, seq = order
    salt = F.floor(F.col(ts) / F.lit(chunk_ms))
    staged = df.withColumn("__salt", salt).withColumn("__v", value)

    end = -1 if strictly_before else Window.currentRow
    w_in = (
        Window.partitionBy(entity, "__salt")
        .orderBy(ts, seq)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    within = F.coalesce(F.sum("__v").over(w_in), F.lit(0))

    # pass 2: per-chunk totals → offsets of strictly-earlier chunks.
    # one row per (entity, chunk): |entities| * timeline/chunk rows — tiny
    # relative to events, and never skewed (each row is an aggregate).
    totals = staged.groupBy(entity, "__salt").agg(
        F.sum("__v").alias("__chunk_total")
    )
    w_off = (
        Window.partitionBy(entity)
        .orderBy("__salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        entity,
        "__salt",
        F.coalesce(F.sum("__chunk_total").over(w_off), F.lit(0)).alias("__offset"),
    )

    joined = staged.join(offsets, [entity, "__salt"], "left")
    return (
        joined.withColumn(out, F.coalesce(F.col("__offset"), F.lit(0)) + within)
        .drop("__salt", "__v", "__offset")
    )


def salted_strict_last_carry(
    df: DataFrame,
    cols: list[str],
    entity: str,
    order: tuple[str, ...],
    chunk_ms: int,
    out_prefix: str = "__carr_",
    broadcast_offsets: bool = False,
) -> DataFrame:
    """``last(col, ignorenulls=True) OVER (PARTITION BY entity ORDER BY
    order ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)`` for every name in
    ``cols`` — the merged scan's as-of carry — computed with
    (entity, time-chunk) window partitions so a hot entity's timeline
    spreads over timeline/chunk_ms tasks instead of one.

    Decomposition (exact for ANY column type, list/map included):
      within  = strict last non-null inside my chunk          (chunk window)
      final_c = chunk's last non-null value, one row per
                (entity, chunk)                               (tiny frame)
      offset  = last non-null final_c over strictly-earlier
                chunks                                        (tiny window)
      carry   = coalesce(within, offset)
    Chunks partition the ``order`` prefix ordering because the chunk key
    floor(ts/chunk_ms) is non-decreasing in (ts, ...): every row of an
    earlier chunk is strictly earlier, and within-chunk strictness handles
    the rest — so the union of {earlier chunks} and {earlier rows in my
    chunk} is exactly the strictly-before set. Property-tested
    bit-identical in tests/test_prefix_salted.py."""
    ts = order[0]
    staged = df.withColumn("__salt", F.floor(F.col(ts) / F.lit(chunk_ms)))
    w_in = (
        Window.partitionBy(entity, "__salt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = staged.select(
        "*",
        *[F.last(F.col(n), ignorenulls=True).over(w_in).alias(f"__in_{n}") for n in cols],
    )
    # chunk-final non-null value per column: max_by over the order-prefix
    # position — max_by skips rows whose ordinal is null (our null-value
    # rows) and puts NO orderability requirement on the value itself, so
    # map-typed columns work. One aggregate row per (entity, chunk).
    pos = F.struct(*[F.col(o) for o in order])
    finals = staged.groupBy(entity, "__salt").agg(*[
        F.max_by(F.col(n), F.when(F.col(n).isNotNull(), pos)).alias(f"__f_{n}")
        for n in cols
    ])
    w_off = (
        Window.partitionBy(entity)
        .orderBy("__salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = finals.select(
        entity,
        "__salt",
        *[
            F.last(F.col(f"__f_{n}"), ignorenulls=True).over(w_off).alias(f"__off_{n}")
            for n in cols
        ],
    )
    # one row per (entity, chunk) — for a declared-hot-entity subset this
    # is tiny (|hot| × timeline/chunk): broadcast it and the event-scale
    # side needs no exchange beyond its own chunk window
    if broadcast_offsets:
        offsets = F.broadcast(offsets)
    joined = within.join(offsets, [entity, "__salt"], "left")
    out = joined.select(
        "*",
        *[
            F.coalesce(F.col(f"__in_{n}"), F.col(f"__off_{n}")).alias(f"{out_prefix}{n}")
            for n in cols
        ],
    )
    drop = ["__salt"] + [p + n for n in cols for p in ("__in_", "__off_")]
    return out.drop(*drop)


def salted_running_count(
    w: DataFrame,
    entity: str,
    order: tuple[str, ...],
    chunk_ms: int,
    out: str = "cnt",
) -> DataFrame:
    """Inclusive running row count per entity (MemCounter semantics) with
    (entity, time-chunk) partitions: within-chunk index + strictly-earlier
    chunk totals. Bit-identical to ``count(1) OVER (PARTITION BY entity
    ORDER BY order ROWS UNBOUNDED PRECEDING)`` — the count depends only on
    the partition of rows into earlier/later, which the chunking preserves."""
    ts = order[0]
    staged = w.withColumn("__salt", F.floor(F.col(ts) / F.lit(chunk_ms)))
    w_in = (
        Window.partitionBy(entity, "__salt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = staged.withColumn("__idx", F.count(F.lit(1)).over(w_in))
    totals = staged.groupBy(entity, "__salt").agg(F.count(F.lit(1)).alias("__n"))
    w_off = (
        Window.partitionBy(entity)
        .orderBy("__salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        entity, "__salt",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    joined = within.join(offsets, [entity, "__salt"], "left")
    return (
        joined.withColumn(out, F.coalesce(F.col("__off"), F.lit(0)) + F.col("__idx"))
        .drop("__salt", "__idx", "__off")
    )


def salted_monotone_period_counts(
    w: DataFrame,
    entity: str,
    order: tuple[str, ...],
    bucket_ms: int,
    periods: tuple[int, ...],
    out: str = "vec",
) -> DataFrame:
    """PeriodicCounter write-row vector (element p = #writes in buckets
    [own-p, own] up to and including this row) for commit-time-stamped
    (monotone-bucket) streams, decomposed so no window partitions by the
    bare entity over the event-scale frame:

      B        = per-(entity, bucket) write counts       (groupBy — partial
                 agg absorbs the hot key map-side)
      cum      = running bucket totals \\ older_p = totals at buckets
                 <= own-p-1                              (bucket-level frame:
                 one row per entity-day — 10-year timeline = ~3.6k rows,
                 never event-scale)
      idx      = within-(entity, bucket) inclusive index (chunk window —
                 the hot entity spreads across its buckets)
      element  = (cum - B_own + idx) - older_p

    Bit-identical to engine._monotone_period_counts (running total minus
    older-than-window RANGE total) on monotone streams — both count the
    same earlier/later partition of rows. Property-tested in
    tests/test_prefix_salted.py."""
    ts = order[0]
    staged = w.withColumn("__bkt", F.floor(F.col(ts) / F.lit(bucket_ms)))
    per_bucket = staged.groupBy(entity, "__bkt").agg(F.count(F.lit(1)).alias("__bn"))
    w_cum = (
        Window.partitionBy(entity)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stats = per_bucket.select(
        entity, "__bkt", "__bn",
        F.sum("__bn").over(w_cum).alias("__cum"),
        *[
            F.coalesce(
                F.sum("__bn").over(
                    Window.partitionBy(entity)
                    .orderBy("__bkt")
                    .rangeBetween(Window.unboundedPreceding, -(p + 1))
                ),
                F.lit(0),
            ).alias(f"__older_{p}")
            for p in periods
        ],
    )
    w_in = (
        Window.partitionBy(entity, "__bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rows = staged.withColumn("__idx", F.count(F.lit(1)).over(w_in))
    joined = rows.join(stats, [entity, "__bkt"], "left")
    vec = F.array(*[
        (F.col("__cum") - F.col("__bn") + F.col("__idx") - F.col(f"__older_{p}"))
        for p in periods
    ])
    return joined.withColumn(out, vec).drop(
        "__bkt", "__bn", "__cum", "__idx", *[f"__older_{p}" for p in periods]
    )


def detect_hot_entities(
    df: DataFrame,
    entity: str,
    min_share: float = 0.01,
    sample_fraction: float = 0.01,
    seed: int = 42,
    max_keys: int = 64,
) -> list:
    """Sampled heavy-hitter scan: entity keys holding at least
    ``min_share`` of rows, estimated from a Bernoulli sample — feed the
    result to FeatureEngine(hot_entities=...). A key macroscopic enough
    to skew a window stage is by definition massively oversampled at any
    fraction (expected sample count = share × n × fraction), so a 1%
    sample finds a 1% key in a 10^9-row table with ~10^5 sampled rows of
    evidence; tiny keys never survive the share filter. One aggregation
    over the sample, map-side partials absorb the hot key itself; capped
    at ``max_keys`` (an isin() filter and a broadcast offsets frame both
    want a small set)."""
    sampled = df.select(entity).sample(fraction=sample_fraction, seed=seed)
    n = sampled.count()
    if n == 0:
        return []
    rows = (
        sampled.groupBy(entity)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= n * min_share)
        .orderBy(F.col("__n").desc(), F.col(entity))
        .limit(max_keys)
        .collect()
    )
    return [r[entity] for r in rows if r[entity] is not None]


def salted_running_max(
    df: DataFrame,
    col: str,
    entity: str,
    order: tuple[str, ...],
    chunk_ms: int,
    out: str,
) -> DataFrame:
    """Inclusive running max of ``col`` per entity with (entity,
    time-chunk) partitions: greatest(within-chunk running max, max of all
    earlier chunks). Max is associative, so the chunk split is exact."""
    ts = order[0]
    staged = df.withColumn("__salt", F.floor(F.col(ts) / F.lit(chunk_ms)))
    w_in = (
        Window.partitionBy(entity, "__salt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = staged.withColumn("__w", F.max(F.col(col)).over(w_in))
    totals = staged.groupBy(entity, "__salt").agg(F.max(F.col(col)).alias("__t"))
    w_off = (
        Window.partitionBy(entity)
        .orderBy("__salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        entity, "__salt", F.max("__t").over(w_off).alias("__o")
    )
    joined = within.join(offsets, [entity, "__salt"], "left")
    return joined.withColumn(
        out,
        F.when(F.col("__o").isNull(), F.col("__w"))
        .otherwise(F.greatest(F.col("__w"), F.col("__o"))),
    ).drop("__salt", "__w", "__t", "__o")


def salted_anchored_period_counts(
    w: DataFrame,
    entity: str,
    order: tuple[str, ...],
    bucket_ms: int,
    periods: tuple[int, ...],
    chunk_ms: int,
    bucket: Column,
    out: str = "vec",
) -> DataFrame:
    """Exact anchored PeriodicCounter vector under bounded-late writes
    (engine._anchored_period_counts) with every unbounded per-entity
    window decomposed. On a writes-only frame (every row is a write) the
    anchored element simplifies:

        a_i     = running max bucket                  (salted running max)
        cnt_i   = running row count                   (salted prefix count)
        older_p = #rows with bucket <= b_i - p - 1    (per-bucket totals +
                  a bucket-level RANGE prefix — one row per entity-day,
                  joined back on (entity, bucket))
        base    = std - cnt = (cnt - older_p) - cnt = -older_p
                  masked to at-max rows (bucket == a)
        element = last(base, ignorenulls) + cnt       (salted strict carry)

    Each piece is the exact chunk decomposition of the corresponding
    window in the sequential formula, so the result is bit-identical
    (tests/test_prefix_salted.py) while a hot entity's anchored fold
    spreads over timeline/chunk tasks."""
    staged = w.withColumn("__bkt", bucket)
    staged = salted_running_count(staged, entity, order, chunk_ms, out="__cnt")
    staged = salted_running_max(staged, "__bkt", entity, order, chunk_ms, out="__a")
    per_bucket = staged.groupBy(entity, "__bkt").agg(
        F.count(F.lit(1)).alias("__bn")
    )
    stats = per_bucket.select(
        entity, "__bkt",
        *[
            F.coalesce(
                F.sum("__bn").over(
                    Window.partitionBy(entity)
                    .orderBy("__bkt")
                    .rangeBetween(Window.unboundedPreceding, -(p + 1))
                ),
                F.lit(0),
            ).alias(f"__older_{p}")
            for p in periods
        ],
    )
    joined = staged.join(stats, [entity, "__bkt"], "left")
    base_cols = [f"__base_{p}" for p in periods]
    joined = joined.select(
        "*",
        *[
            F.when(F.col("__bkt") == F.col("__a"), -F.col(f"__older_{p}"))
            .alias(f"__base_{p}")
            for p in periods
        ],
    )
    carried = salted_strict_last_carry(
        joined, base_cols, entity, order, chunk_ms, out_prefix="__c_"
    )
    # the strictly-before carry must still see the CURRENT row's base when
    # it is itself at-max (the sequential last() frame is inclusive):
    # carried value at row i = coalesce(own base, strict carry)
    vec = F.array(*[
        F.coalesce(F.col(f"__base_{p}"), F.col(f"__c___base_{p}"))
        + F.col("__cnt")
        for p in periods
    ])
    drop = (
        ["__bkt", "__cnt", "__a"]
        + [f"__older_{p}" for p in periods]
        + base_cols
        + [f"__c___base_{p}" for p in periods]
    )
    return carried.withColumn(out, vec).drop(*drop)


def chunked_ordinal(
    df: DataFrame,
    entity: str,
    order: tuple[str, ...],
    chunk_ms: int,
    out: str = "__rn",
) -> DataFrame:
    """Global 1-based per-entity ordinal in ``order``, computed with
    (entity, time-chunk) partitions: within-chunk row_number + the
    running count of strictly-earlier chunks (a chunk-cardinality frame)
    — the skew-safe equivalent of ``row_number() OVER (PARTITION BY
    entity ORDER BY order)`` for hot/constant keys. Ties in ``order``
    get an arbitrary-but-single-pass-consistent rank, exactly like the
    window form."""
    ts = order[0]
    staged = df.withColumn("__salt", F.floor(F.col(ts) / F.lit(chunk_ms)))
    counts = staged.groupBy(entity, "__salt").agg(
        F.count(F.lit(1)).alias("__n"))
    w_off = (
        Window.partitionBy(entity)
        .orderBy("__salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        entity, "__salt",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy(entity, "__salt").orderBy(*order)
    return (
        staged.join(offs, [entity, "__salt"], "left")
        .withColumn(out, F.col("__off") + F.row_number().over(w_in))
        .drop("__salt", "__off")
    )


def banded_trailing_rows(
    df: DataFrame,
    entity: str,
    order: tuple[str, ...],
    k: int,
    chunk_ms: int,
    payload: list[str],
) -> DataFrame:
    """Pair every row (reader) with its trailing ``k`` rows (itself
    included) in per-entity ``order`` — the distributed equivalent of a
    ``rowsBetween(-(k-1), currentRow)`` window partitioned by a
    hot/constant entity, where a bare-key window would pin the whole
    timeline to one task.

    Shape: global ordinal rn (chunked_ordinal) → band blocks of size k
    (reader block floor((rn-1)/k); each writer published to its block
    and the next) → equi-join on (entity, block) + range filter
    ``wrn ∈ (rn-k, rn]``. Each reader matches ≤ 2k candidates filtered
    to ≤ k, partitions are block-sized, and no task ever holds more
    than ~2k² rows of one band. Returns reader rows (all original
    columns + ``__rn``) joined with writer payload columns renamed
    ``__w_<name>`` plus ``__w_rn`` — ready for
    ``groupBy(entity, "__rn")``."""
    r = chunked_ordinal(df, entity, order, chunk_ms)
    blk = lambda rn: F.floor((rn - 1) / F.lit(k))  # noqa: E731
    readers = r.withColumn("__blk", blk(F.col("__rn")))
    writers = r.select(
        F.col(entity).alias("__w_ent"),
        F.col("__rn").alias("__w_rn"),
        *[F.col(p).alias(f"__w_{p}") for p in payload],
    ).withColumn(
        "__w_blk",
        F.explode(F.array(blk(F.col("__w_rn")), blk(F.col("__w_rn")) + 1)),
    )
    return readers.join(
        writers,
        (F.col(entity) == F.col("__w_ent"))
        & (F.col("__blk") == F.col("__w_blk"))
        & (F.col("__w_rn") <= F.col("__rn"))
        & (F.col("__w_rn") > F.col("__rn") - k),
    ).drop("__blk", "__w_blk", "__w_ent")
