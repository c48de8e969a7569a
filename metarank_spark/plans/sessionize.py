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
