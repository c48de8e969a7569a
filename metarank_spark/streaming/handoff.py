"""Batch-snapshot → streaming-resume handoff.

The batch incremental snapshot (operators/incremental.py) and the
streaming state ops (streaming/pipeline.py ``applyInPandasWithState``)
describe the SAME state — per-entity fold results at a cut. This module
derives, from an ``IncrementalSnapshot``, the seed state a streaming
query needs to continue the fold over the post-cut delta as if it had
folded full history:

- counter: total at the cut = lifetime offset (full − tail, both ≤ t0)
  plus the tail's own writes ≤ t0 — i.e. exactly the full stream's count.
- scalar: the last non-null write ≤ t0, which the tail retains by the
  last-1 rule.

The seed ships as a Spark ``Broadcast`` of ``{entity: state}`` consulted
by the state fn only for keys the store has never seen (first sight), so
a checkpointed restart never overrides live state. On a real cluster
with state bigger than one executor's memory, the same seed frame feeds
Spark's initial-state API (``transformWithStateInPandas(initialState=)``)
instead of a broadcast — that API needs protobuf, absent in this
sandbox, so the broadcast path is the tested one; the seed-frame
DERIVATION below is shared by both.

Equality contract (tests/test_streaming_multimodal.py handoff tests):
resumed-stream outputs over the delta == from-scratch stream over full
history, restricted to delta rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metarank_spark.engine import InteractionCount, _entity_col
from metarank_spark.operators.incremental import (
    IncrementalSnapshot,
    _feature_by_name,
    _parse_field_scope,
)


def counter_seed_frame(
    snap: IncrementalSnapshot, engine, name: str
) -> DataFrame:
    """``(entity, total)`` at the cut for an ``InteractionCount`` feature:
    the snapshot's offset (history the tail dropped) plus the tail's own
    matching writes ≤ t0. Distributed end-to-end — entity-cardinality
    sized, one grouped agg over the bounded tail + one full join with the
    offsets frame."""
    cfg = _feature_by_name(engine, name)
    if not isinstance(cfg, InteractionCount):
        raise ValueError(f"{name} is not an InteractionCount feature")
    if _parse_field_scope(cfg.scope) or cfg.ttl_ms or \
            cfg.interaction == "impression":
        raise NotImplementedError(
            "streaming handoff v1 covers plain-scoped, un-TTL'd, "
            "non-impression counters (the streaming twin itself has no "
            "TTL/injection leg yet)"
        )
    tail_counts = (
        snap.tail.filter(
            (F.col("event_type") == "interaction")
            & (F.col("interaction_type") == cfg.interaction)
            & (F.col("ts_ms") <= snap.t0_ms)
        )
        .withColumn("entity", _entity_col(cfg.scope))
        .groupBy("entity")
        .agg(F.count(F.lit(1)).alias("__tc"))
    )
    off = snap.offsets[name].select(
        "entity", F.col("offset").alias("__off"))
    return (
        tail_counts.join(off, "entity", "full")
        .select(
            "entity",
            (F.coalesce(F.col("__tc"), F.lit(0))
             + F.coalesce(F.col("__off"), F.lit(0))).alias("total"),
        )
    )


def scalar_seed_frame(
    snap: IncrementalSnapshot, value, entity: str
) -> DataFrame:
    """``(entity, last)`` at the cut: the last non-null ``value`` write
    ≤ t0 per entity, read from the tail (which retains each entity's last
    write by the last-1 rule)."""
    src = snap.tail.filter(F.col("ts_ms") <= snap.t0_ms).select(
        F.col(entity).alias("entity"), "ts_ms", "seq",
        value.cast("double").alias("__w"),
    ).filter(F.col("entity").isNotNull() & F.col("__w").isNotNull())
    return (
        src.groupBy("entity")
        .agg(F.max_by("__w", F.struct("ts_ms", "seq")).alias("last"))
    )


def wcount_seed_frame(
    snap: IncrementalSnapshot, engine, name: str
) -> DataFrame:
    """``(entity, buckets, counts)`` at the cut for a ``WindowCount``
    feature: per-bucket write counts within max(periods) of the entity's
    LAST bucket — exactly the streaming op's bucket-map state
    (pipeline.WCOUNT_STATE), and exactly the writes the snapshot's
    window-context retention keeps, so no offset is needed: evicted
    buckets can never re-enter a window."""
    from metarank_spark.engine import WindowCount

    cfg = _feature_by_name(engine, name)
    if not isinstance(cfg, WindowCount):
        raise ValueError(f"{name} is not a WindowCount feature")
    if _parse_field_scope(cfg.scope) or cfg.ttl_ms or \
            cfg.interaction == "impression":
        raise NotImplementedError(
            "streaming handoff v1 covers plain-scoped, un-TTL'd, "
            "non-impression window counts"
        )
    w = (
        snap.tail.filter(
            (F.col("event_type") == "interaction")
            & (F.col("interaction_type") == cfg.interaction)
            & (F.col("ts_ms") <= snap.t0_ms)
        )
        .withColumn("entity", _entity_col(cfg.scope))
        .withColumn("bucket", F.floor(F.col("ts_ms") / F.lit(cfg.bucket_ms)))
    )
    per = w.groupBy("entity", "bucket").agg(F.count(F.lit(1)).alias("n"))
    last = per.groupBy("entity").agg(F.max("bucket").alias("__last"))
    kept = per.join(last, "entity").filter(
        F.col("bucket") >= F.col("__last") - F.lit(max(cfg.periods)))
    return kept.groupBy("entity").agg(
        F.sort_array(F.collect_list(F.struct("bucket", "n"))).alias("__bn")
    ).select(
        "entity",
        F.transform(F.col("__bn"), lambda x: x["bucket"]).alias("buckets"),
        F.transform(F.col("__bn"), lambda x: x["n"]).alias("counts"),
    )


def broadcast_seed(spark: SparkSession, seed: DataFrame, value_col):
    """Collect a seed frame into a ``Broadcast[{entity: value}]`` for the
    state fns' first-sight lookup; ``value_col`` may be a list of columns
    (the value becomes a tuple, e.g. a window count's (buckets, counts)).
    The frame is entity-cardinality sized (these primitives keep O(1)
    state per key); beyond driver memory, hand the frame to the
    initial-state API instead (module docstring)."""
    if isinstance(value_col, (list, tuple)):
        m = {r["entity"]: tuple(r[c] for c in value_col)
             for r in seed.collect() if r["entity"] is not None}
    else:
        m = {r["entity"]: r[value_col] for r in seed.collect()
             if r["entity"] is not None}
    return spark.sparkContext.broadcast(m)
