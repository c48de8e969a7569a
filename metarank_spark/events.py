"""The canonical Metarank event table (T1 in FIXTURES.md).

One long DataFrame holding all four reference event types
(model/Event.scala:14-62) discriminated by ``event_type``:

    item | user | ranking | interaction

with an explicit total order ``(ts_ms, seq)`` — the reference requires a
time-sorted stream and preserves file order for equal timestamps
(flow/CheckOrderingPipe.scala:12-27, main/Sort.scala:23-151); ``seq`` makes
that order a first-class column so distributed sorts reproduce it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# RankItem (model/Event.scala:64-67): id + relevancy + optional explicit
# label (explicitLabelInteractions, TrainBuffer.scala:73-79) + optional
# per-item field overrides (NumberFeature.scala:84-94 /
# StringFeature.scala:95-105 values() fieldOverride paths)
RANK_ITEM = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("relevancy", T.DoubleType()),
        T.StructField("label", T.IntegerType()),
        T.StructField("str_fields", T.MapType(T.StringType(), T.ArrayType(T.StringType()))),
        T.StructField("num_fields", T.MapType(T.StringType(), T.DoubleType())),
    ]
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("item_id", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("session_id", T.StringType()),
        T.StructField("ranking_id", T.StringType()),
        T.StructField("interaction_type", T.StringType()),
        T.StructField("items", T.ArrayType(RANK_ITEM)),
        T.StructField("str_fields", T.MapType(T.StringType(), T.ArrayType(T.StringType()))),
        T.StructField("num_fields", T.MapType(T.StringType(), T.DoubleType())),
        # NumberListField (model/Field.scala:13-17)
        T.StructField("numlist_fields", T.MapType(T.StringType(), T.ArrayType(T.DoubleType()))),
    ]
)

_COUNTER = 0


def _next_id() -> str:
    global _COUNTER
    _COUNTER += 1
    return f"e{_COUNTER}"


def item_event(item, ts_ms, seq, str_fields=None, num_fields=None, numlist_fields=None, id=None):
    """ItemEvent (Event.scala:25-30): item metadata upsert."""
    return dict(
        event_id=id or _next_id(), event_type="item", ts_ms=ts_ms, seq=seq,
        item_id=item, user_id=None, session_id=None, ranking_id=None,
        interaction_type=None, items=None,
        str_fields=str_fields or {}, num_fields=num_fields or {},
        numlist_fields=numlist_fields or {},
    )


def user_event(user, ts_ms, seq, str_fields=None, num_fields=None, id=None):
    """UserEvent (Event.scala:32-37)."""
    return dict(
        event_id=id or _next_id(), event_type="user", ts_ms=ts_ms, seq=seq,
        item_id=None, user_id=user, session_id=None, ranking_id=None,
        interaction_type=None, items=None,
        str_fields=str_fields or {}, num_fields=num_fields or {},
        numlist_fields={},
    )


def _rank_item(i) -> dict:
    if isinstance(i, str):
        i = {"id": i}
    return dict(
        id=i["id"],
        relevancy=i.get("relevancy", 1.0),
        label=i.get("label"),
        str_fields=i.get("str_fields"),
        num_fields=i.get("num_fields"),
    )


def ranking_event(id, items, ts_ms, seq, user=None, session=None, str_fields=None, num_fields=None):
    """RankingEvent (Event.scala:44-51): the impression list / query.
    Items may be plain ids or dicts with relevancy / label (explicit
    judgment) / str_fields / num_fields (ranking-time overrides)."""
    return dict(
        event_id=id, event_type="ranking", ts_ms=ts_ms, seq=seq,
        item_id=None, user_id=user, session_id=session, ranking_id=None,
        interaction_type=None,
        items=[_rank_item(i) for i in items],
        str_fields=str_fields or {}, num_fields=num_fields or {},
        numlist_fields={},
    )


def interaction_event(item, type, ts_ms, seq, user=None, session=None, ranking=None,
                      str_fields=None, num_fields=None, id=None):
    """InteractionEvent (Event.scala:53-62)."""
    return dict(
        event_id=id or _next_id(), event_type="interaction", ts_ms=ts_ms, seq=seq,
        item_id=item, user_id=user, session_id=session, ranking_id=ranking,
        interaction_type=type, items=None,
        str_fields=str_fields or {}, num_fields=num_fields or {},
        numlist_fields={},
    )


def events_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    return spark.createDataFrame(rows, schema=EVENT_SCHEMA)


def check_ordering(
    events: DataFrame,
    partitions: int | None = None,
    seq_col: str = "seq",
    ts_col: str = "ts_ms",
    id_col: str = "event_id",
) -> DataFrame:
    """CheckOrderingPipe analog (flow/CheckOrderingPipe.scala:12-27): assert
    the (ts_col, seq_col) order is a valid total order — seq strictly
    increasing implies ts nondecreasing. Returns violating rows with
    columns (id_col, ts_col, seq_col, prev_ts); empty = sorted.

    Distributed: range-partition by seq, lag-check within partitions, and
    compare boundary (min/max per partition) pairs — no global single-
    partition window, so this scales to the full event volume."""
    from pyspark.sql import Window

    spark = events.sparkSession
    n = partitions or spark.sparkContext.defaultParallelism
    cols = list(dict.fromkeys([id_col, ts_col, seq_col]))
    ranged = events.select(*cols).repartitionByRange(n, seq_col)
    ranged = ranged.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(seq_col)
    inner = ranged.select(
        *cols, F.lag(ts_col).over(w).alias("prev_ts")
    ).filter(F.col("prev_ts").isNotNull() & (F.col(ts_col) < F.col("prev_ts")))

    # boundary pairs: last ts of partition k must be <= first ts of k+1
    key = F.struct(
        F.col(seq_col).alias("s"), F.col(ts_col).alias("t"), F.col(id_col).alias("i")
    )
    bounds = ranged.groupBy("__pid").agg(
        F.min(key).alias("first"), F.max(key).alias("last")
    )
    # one row per input partition: tiny by construction — the constant
    # (non-foldable: pmod(col,1)==0) partition key makes the intended
    # single-partition stage explicit instead of tripping the WindowExec
    # global-window warning
    bw = Window.partitionBy(F.pmod(F.col("first.s"), F.lit(1))).orderBy(F.col("first.s"))
    cross = bounds.select(
        F.col("first.i").alias(id_col),
        F.col("first.t").alias(ts_col),
        *([F.col("first.s").alias(seq_col)] if seq_col not in (id_col, ts_col) else []),
        F.lag("last.t").over(bw).alias("prev_ts"),
    ).filter(F.col("prev_ts").isNotNull() & (F.col(ts_col) < F.col("prev_ts")))
    return inner.unionByName(cross).drop("__pid")


def order_violation_count(
    events: DataFrame,
    seq_col: str = "seq",
    ts_col: str = "ts_ms",
    id_col: str = "event_id",
    out: str = "order_violations",
) -> DataFrame:
    """Single-row count of (seq asc ⇒ ts nondecreasing) violations, built
    on the range-partitioned check_ordering (scale-safe replacement for an
    unpartitioned global lag window)."""
    return check_ordering(events, seq_col=seq_col, ts_col=ts_col, id_col=id_col).agg(
        F.count(F.lit(1)).cast("long").alias(out)
    )
