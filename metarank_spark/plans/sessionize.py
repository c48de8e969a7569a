"""Gap-based sessionization — the batch restatement of TrainBuffer's
event-time session eviction (flow/TrainBuffer.scala:33-148; default gap =
maxSessionLength = 30 min, config/CoreConfig.scala:22; event-time ticker
fstore/EventTicker.scala:6-15 — sessions close on EVENT time, not wall
clock, so a batch replay is deterministic).

Plan shape: one shuffle on the entity key, then two window passes over the
same sorted partition (lag → gap flag → running sum). Catalyst fuses both
windows into a single sort + scan (same partitioning/ordering), so this is
O(n) per entity and scales linearly with data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_MS = 30 * 60 * 1000  # TrainBuffer maxSessionLength


def sessionize(
    events: DataFrame,
    entity: str = "user_id",
    ts: str = "ts_ms",
    seq: str | None = None,
    gap_ms: int = DEFAULT_GAP_MS,
    out_col: str = "session_idx",
) -> DataFrame:
    """Assign a 0-based per-entity session index; a new session starts when
    the gap to the previous event is > gap_ms (strictly greater: an event
    exactly at the gap boundary continues the session, matching Caffeine
    expireAfterAccess semantics where expiry happens after the duration
    elapses)."""
    order = [ts] + ([seq] if seq else [])
    w = Window.partitionBy(entity).orderBy(*order)
    prev = F.lag(ts).over(w)
    new_sess = F.when(prev.isNull() | (F.col(ts) - prev > gap_ms), 1).otherwise(0)
    run = (
        Window.partitionBy(entity)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn(out_col, (F.sum(new_sess).over(run) - 1).cast("long"))


def session_bounds(
    sessions: DataFrame,
    entity: str = "user_id",
    ts: str = "ts_ms",
    session_col: str = "session_idx",
) -> DataFrame:
    """Per-session summary: start/end/duration/event count."""
    return sessions.groupBy(entity, session_col).agg(
        F.min(ts).alias("session_start_ms"),
        F.max(ts).alias("session_end_ms"),
        (F.max(ts) - F.min(ts)).alias("session_dur_ms"),
        F.count(F.lit(1)).alias("n_events"),
    )


def salted_sessionize(
    events: DataFrame,
    entity: str = "user_id",
    ts: str = "ts_ms",
    seq: str = "event_id",
    gap_ms: int = DEFAULT_GAP_MS,
    chunk_ms: int = 7 * 24 * 3_600_000,
    out_col: str = "session_idx",
) -> DataFrame:
    """sessionize() with (entity, time-chunk) window partitions — the
    hot-entity variant: a key holding a macroscopic share of events would
    otherwise run its lag + running-sum windows in ONE task.

    Exact decomposition: the new-session flag needs only the previous
    row's ts — within chunks that is a chunk-partitioned lag, and each
    chunk's first row takes the handoff from the latest earlier non-empty
    chunk's max ts (a one-row-per-entity-chunk frame). The session index
    is then a running sum of resolved flags — the salted prefix sum
    (plans/prefix.salted_cumulative_sum). Bit-identical to sessionize()
    (tests/test_prefix_salted.py)."""
    from metarank_spark.plans.prefix import salted_cumulative_sum

    df = events.withColumn("__ck", F.floor(F.col(ts) / F.lit(chunk_ms)))
    w_in = Window.partitionBy(entity, "__ck").orderBy(ts, seq)
    bounds = df.groupBy(entity, "__ck").agg(F.max(F.col(ts)).alias("__last"))
    w_off = (
        Window.partitionBy(entity)
        .orderBy("__ck")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    handoff = bounds.select(
        entity, "__ck",
        F.last("__last", ignorenulls=True).over(w_off).alias("__prev_last"),
    )
    df = (
        df.withColumn("__prev_in", F.lag(ts).over(w_in))
        .join(handoff, [entity, "__ck"], "left")
    )
    prev_eff = F.coalesce(F.col("__prev_in"), F.col("__prev_last"))
    flag = F.when(
        prev_eff.isNull() | (F.col(ts) - prev_eff > gap_ms), 1
    ).otherwise(0)
    df = df.withColumn("__ns", flag)
    out = salted_cumulative_sum(
        df, F.col("__ns"), entity=entity, order=(ts, seq),
        chunk_ms=chunk_ms, out="__cum",
    )
    return out.withColumn(out_col, (F.col("__cum") - 1).cast("long")).drop(
        "__ck", "__prev_in", "__prev_last", "__ns", "__cum"
    )
