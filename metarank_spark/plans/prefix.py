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
