"""Entity-partitioned time-window plan primitives.

These are the Spark-first translations of Metarank's stateful feature
primitives (model/Feature.scala, fstore/memory/*):

- ``cumulative``       — CounterFeature: running total over the entity's
  time-sorted stream (MemCounter.scala:13-22).
- ``bucketed_window_count / _sum`` — PeriodicCounterFeature read at write
  time: the count/sum over the trailing ``periods`` time buckets,
  *anchored at the current row's bucket*. Metarank anchors at the last
  bucket present in the state map (model/Feature.scala:142-161); when the
  value is read at an event that itself wrote (the import-path emit,
  flow/FeatureValueFlow.scala:24-42), the last bucket IS the current row's
  bucket, so this window-function form is exact. The general
  anchor-at-last-bucket read (snapshot at an arbitrary later timestamp) is
  handled by the Arrow kernel (operators/kernel.py).

Scaling notes (100 TB):
- each helper is a window over ``partitionBy(entity)`` — one hash shuffle
  on the entity key, then a sorted scan per partition; no joins, no
  O(n^2) frames (every frame here is O(1) state per row: running sums and
  value-range offsets).
- multiple features over the same entity key share the single shuffle
  (Catalyst reuses the Exchange when the window specs share partitioning).
- skewed entities: AQE skew handling does not split window partitions, so
  pathological single-entity skew is handled upstream by the two-pass
  prefix aggregation in plans/prefix.py (global-scope features) — normal
  user/item keys at 10^12 rows are fine: state per key is O(1).
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F

MS_PER_DAY = 86_400_000


def entity_window(entity: str | Column, *order: str | Column) -> WindowSpec:
    """Rows-unbounded-preceding window over one entity's time-sorted stream.

    ``order`` must be a total order — pass (ts_ms, seq) so same-timestamp
    events keep stream order (the reference relies on stream order for
    same-ts events; SURVEY.md §3.1).
    """
    return (
        Window.partitionBy(entity)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


def cumulative(
    value: Column,
    entity: str | Column,
    *order: str | Column,
    strictly_before: bool = False,
) -> Column:
    """Running aggregate (sum) over the entity stream.

    ``strictly_before=True`` excludes the current row — the snapshot
    semantics used for ranking-time feature reads (zero leakage;
    MetarankFlow.scala:31-55: the ranking's snapshot is taken before its
    own writes commit). Default includes the row itself — the semantics of
    the value emitted *for* an interaction event
    (FeatureValueFlow.scala:29-42 commits before computeValue).
    """
    end = -1 if strictly_before else Window.currentRow
    w = (
        Window.partitionBy(entity)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    return F.sum(value).over(w)


def bucket_col(ts_ms: str | Column, bucket_ms: int = MS_PER_DAY) -> Column:
    """toStartOfPeriod bucket index: floor(ts/bucket) (Timestamp.scala:18-21).

    Returned as a bucket *index* (long) rather than a start-of-period
    timestamp — window RANGE frames need a numeric order key.
    """
    c = F.col(ts_ms) if isinstance(ts_ms, str) else ts_ms
    return F.floor(c / F.lit(bucket_ms))


def bucketed_window_sum(
    value: Column,
    entity: str | Column,
    bucket: Column,
    periods: int,
    *order: str | Column,
    strictly_before: bool = False,
) -> Column:
    """Trailing-bucket windowed sum anchored at the current row's bucket.

    Sum of ``value`` over rows of the same entity whose bucket lies in
    ``[bucket(cur) - periods, bucket(cur)]`` — i.e. ``periods + 1``
    buckets inclusive, matching PeriodRange(p, 0):
    start = last - period*p, end = last + period, inclusive compare on
    bucket starts (model/Feature.scala:142-161).

    Computed shuffle-free relative to the cumulative pass as
    ``running_total - running_total_before_window``:

    - ``run``  : rows frame over (order) — respects same-ts stream order.
    - ``older``: RANGE frame on the bucket value, unbounded preceding to
      ``-(periods+1)`` — every row at least periods+1 buckets old. RANGE
      frames are value-based so this is exact regardless of ties, and it
      is O(1) per row (Spark maintains a sliding aggregate).
    """
    end = -1 if strictly_before else Window.currentRow
    run_w = (
        Window.partitionBy(entity).orderBy(*order).rowsBetween(Window.unboundedPreceding, end)
    )
    older_w = (
        Window.partitionBy(entity)
        .orderBy(bucket)
        .rangeBetween(Window.unboundedPreceding, -(periods + 1))
    )
    run = F.sum(value).over(run_w)
    older = F.sum(value).over(older_w)
    return F.coalesce(run, F.lit(0)) - F.coalesce(older, F.lit(0))


def bucketed_window_count(
    predicate: Column,
    entity: str | Column,
    bucket: Column,
    periods: int,
    *order: str | Column,
    strictly_before: bool = False,
) -> Column:
    """window_count: trailing-bucket count of events matching ``predicate``.

    Reference: WindowInteractionCountFeature.scala:36-46 (PeriodicIncrement
    of 1 per matching interaction), window shape per PeriodRange(p, 0).
    """
    one = F.when(predicate, F.lit(1)).otherwise(F.lit(0))
    return bucketed_window_sum(
        one, entity, bucket, periods, *order, strictly_before=strictly_before
    )
