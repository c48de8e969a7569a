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
- window count: the per-bucket counts within max(periods) of the last
  bucket — the window-context retention verbatim, no offset needed.
- stats / freq / recent-items pools: the last-K accepted samples ≤ t0 —
  the last-K retention verbatim (evicted samples can never re-enter).
- map: the last value per (entity, map key) ≤ t0 (per-key last-1
  retention).

The seed ships one of two ways, both consulted only for keys the store
has never seen (first sight), so a checkpointed restart never overrides
live state:

- ``init=broadcast_seed(spark, frame, cols)``: a Broadcast
  ``{entity: state}`` dict — zero per-row cost, bounded by driver
  memory (the frame is collect()ed once).
- ``seed=<the seed frame itself>``: a stream-static LEFT JOIN attaches
  ``__seed*`` columns to the write stream (pipeline._attach_seed) — no
  driver collect anywhere, so seed cardinality is unbounded; Spark
  broadcasts the static side when small and shuffle-joins when not.
  This is the warehouse-scale path. (Spark's own initial-state API,
  ``transformWithStateInPandas(initialState=)``, would serve the same
  role; it needs protobuf, absent in this sandbox.)

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
    _str_head,
)


def _no_ttl_or_field_scope(cfg, what: str):
    if _parse_field_scope(cfg.scope) or getattr(cfg, "ttl_ms", None):
        raise NotImplementedError(
            f"streaming handoff v1 covers plain-scoped, un-TTL'd {what}"
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


def _last_k_structs(src: DataFrame, k: int):
    """Per-entity newest-first ``struct(ts_ms, seq, v)`` array capped at
    ``k`` — the shared pool-seed agg. One grouped aggregation; each
    entity's array is bounded by k, so the frame is entity-cardinality
    sized like every other seed."""
    return src.groupBy("entity").agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct("ts_ms", "seq", "v")), asc=False),
            1, k,
        ).alias("__p")
    )


def stats_seed_frame(snap: IncrementalSnapshot, engine, name: str) -> DataFrame:
    """``(entity, pool)`` at the cut for a ``Stats`` feature: the last
    ``pool`` accepted samples ≤ t0 oldest-first — exactly the streaming
    op's deque (pipeline.STATS_STATE), and exactly what the snapshot's
    last-K retention keeps (evicted samples can never re-enter a
    last-K pool, so no offset is needed)."""
    from metarank_spark.engine import Stats, sample_accept_expr

    cfg = _feature_by_name(engine, name)
    if not isinstance(cfg, Stats):
        raise ValueError(f"{name} is not a Stats feature")
    _no_ttl_or_field_scope(cfg, "stats pools")
    val = F.col("num_fields").getItem(cfg.field)
    pred = (
        (F.col("event_type") == "interaction")
        & val.isNotNull()
        & (F.col("ts_ms") <= snap.t0_ms)
    )
    if cfg.sample_rate < 1.0:
        pred = pred & sample_accept_expr(cfg.sample_rate)
    src = snap.tail.filter(pred).withColumn(
        "entity", _entity_col(cfg.scope)
    ).select("entity", "ts_ms", "seq", val.cast("double").alias("v"))
    return _last_k_structs(src, cfg.pool).select(
        "entity",
        F.reverse(F.transform(F.col("__p"), lambda x: x["v"])).alias("pool"),
    )


def freq_seed_frame(snap: IncrementalSnapshot, engine, name: str) -> DataFrame:
    """``(entity, pool)`` at the cut for a ``Freq`` feature: the last
    ``pool`` accepted string samples ≤ t0 oldest-first (same no-offset
    argument as stats_seed_frame)."""
    from metarank_spark.engine import Freq, sample_accept_expr

    cfg = _feature_by_name(engine, name)
    if not isinstance(cfg, Freq):
        raise ValueError(f"{name} is not a Freq feature")
    _no_ttl_or_field_scope(cfg, "freq pools")
    val = _str_head(cfg.field)
    pred = (
        (F.col("event_type") == "interaction")
        & val.isNotNull()
        & (F.col("ts_ms") <= snap.t0_ms)
    )
    if cfg.sample_rate < 1.0:
        pred = pred & sample_accept_expr(cfg.sample_rate)
    src = snap.tail.filter(pred).withColumn(
        "entity", _entity_col(cfg.scope)
    ).select("entity", "ts_ms", "seq", val.cast("string").alias("v"))
    return _last_k_structs(src, cfg.pool).select(
        "entity",
        F.reverse(F.transform(F.col("__p"), lambda x: x["v"])).alias("pool"),
    )


def blist_seed_frame(snap: IncrementalSnapshot, engine, name: str) -> DataFrame:
    """``(entity, ts, vals)`` newest-first at the cut for a
    ``RecentItems`` feature — the streaming op's deque
    (pipeline.BLIST_STATE) after its last pre-cut write. Sequential
    evict-on-write collapses to one expression over the last ``count``
    matching writes: time eviction is monotone with recency (anything
    older than an evicted row is also evicted), so the state is
    filter(ts ≥ last_ts − duration) ∘ take(count) of the newest-first
    write list — exactly the snapshot's last-K retention support."""
    from metarank_spark.engine import RecentItems

    cfg = _feature_by_name(engine, name)
    if not isinstance(cfg, RecentItems):
        raise ValueError(f"{name} is not a RecentItems feature")
    _no_ttl_or_field_scope(cfg, "recent-item lists")
    src = snap.tail.filter(
        (F.col("event_type") == "interaction")
        & (F.col("interaction_type") == cfg.interaction)
        & (F.col("ts_ms") <= snap.t0_ms)
    ).withColumn("entity", _entity_col(cfg.scope)).select(
        "entity", "ts_ms", "seq", F.col("item_id").cast("string").alias("v")
    )
    return (
        _last_k_structs(src, cfg.count)
        .withColumn(
            "__cut",
            F.element_at("__p", 1)["ts_ms"] - F.lit(cfg.duration_ms),
        )
        .withColumn(
            "__k",
            F.filter(F.col("__p"), lambda x: x["ts_ms"] >= F.col("__cut")),
        )
        .select(
            "entity",
            F.transform(F.col("__k"), lambda x: x["ts_ms"]).alias("ts"),
            F.transform(F.col("__k"), lambda x: x["v"]).alias("vals"),
        )
    )


def map_seed_frame(snap: IncrementalSnapshot, engine, name: str) -> DataFrame:
    """``(entity, keys, vals)`` at the cut for a ``MapFeature``: the last
    value per (entity, map key) ≤ t0 — the streaming op's map state
    (pipeline.MAP_STATE); upserts keep only the last write per key, which
    is the snapshot's per-(entity, key) last-1 retention."""
    from metarank_spark.engine import MapFeature

    cfg = _feature_by_name(engine, name)
    if not isinstance(cfg, MapFeature):
        raise ValueError(f"{name} is not a MapFeature feature")
    _no_ttl_or_field_scope(cfg, "map features")
    mk = _str_head(cfg.key_field)
    mv = F.col("num_fields").getItem(cfg.value_field)
    src = snap.tail.filter(
        (F.col("event_type") == "interaction")
        & mk.isNotNull() & mv.isNotNull()
        & (F.col("ts_ms") <= snap.t0_ms)
    ).withColumn("entity", _entity_col(cfg.scope)).select(
        "entity", mk.cast("string").alias("mk"), "ts_ms", "seq",
        mv.cast("double").alias("v"),
    )
    last = src.groupBy("entity", "mk").agg(
        F.max_by("v", F.struct("ts_ms", "seq")).alias("v"))
    return last.groupBy("entity").agg(
        F.sort_array(F.collect_list(F.struct("mk", "v"))).alias("__kv")
    ).select(
        "entity",
        F.transform(F.col("__kv"), lambda x: x["mk"]).alias("keys"),
        F.transform(F.col("__kv"), lambda x: x["v"]).alias("vals"),
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
