"""Structured Streaming ingestion — the streaming analog of the batch
engine (reference streaming sources: source/KafkaSource.scala:26,
KinesisSource.scala:26, PulsarEventSource.scala:20; the stateful fold:
flow/FeatureValueFlow.scala:24-42).

Design:
- sources: any Structured Streaming source producing the canonical event
  schema (file stream here, `readStream.format("kafka")` on a cluster —
  same downstream code; the source is a one-line swap);
- stateful primitives: `applyInPandasWithState` keyed by the scope entity,
  holding exactly the reference's per-key state (counter total, periodic
  bucket map) and emitting a FeatureValue row per write — the incremental
  counterpart of the batch window functions, golden-tested against them;
- output: append sink (parquet/foreachBatch) with the stream's own
  checkpointLocation, complementing the batch backfill's manifest-based
  resume.

Events must arrive in (ts, seq) order per entity for exact parity with
the batch engine (the reference requires globally sorted input and hard-
fails otherwise, CheckOrderingPipe.scala:12-27); out-of-order input under
a watermark would need buffering the reference explicitly does not
implement.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from metarank_spark.events import EVENT_SCHEMA

COUNTER_OUT = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("value", T.LongType()),
    ]
)
COUNTER_STATE = T.StructType(
    [T.StructField("total", T.LongType()), T.StructField("last_emit", T.LongType())]
)


def stream_events(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """File-based streaming source of canonical events (swap for kafka on a
    cluster: `.readStream.format("kafka")...` + from_json)."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .load(path)
    )


def stream_source(spark: SparkSession, fmt: str,
                  options: dict | None = None) -> DataFrame:
    """Raw broker-style streaming source: any readStream format that emits
    message payloads (kafka / kinesis-connector / socket / rate / text).
    No schema is imposed — broker sources define their own (kafka: key,
    value, topic, partition, offset, timestamp)."""
    reader = spark.readStream.format(fmt)
    for k, v in (options or {}).items():
        reader = reader.option(k, str(v))
    return reader.load()


def decode_wire_stream(raw: DataFrame, payload, seq) -> DataFrame:
    """Message-payload stream → canonical event stream, decoded with the
    SAME wire decoder as the batch path (sources/wire.parse_wire_json —
    source/format/JsonFormat.scala parity).

    ``payload``: Column holding one wire-format JSON event per message
    (kafka: ``col("value").cast("string")``). ``seq``: Column providing
    the commit order within the stream — kafka's ``offset`` (per
    partition, combine with ``partition`` upstream if topic-global order
    matters); the batch reader's monotonically_increasing_id is not
    available on streams."""
    from metarank_spark.sources.wire import parse_wire_json

    parsed = raw.select(
        *parse_wire_json(payload),
        seq.cast("long").alias("seq"),
    )
    return parsed.select([f.name for f in EVENT_SCHEMA.fields])


def stream_wire_events(spark: SparkSession, fmt: str,
                       options: dict | None = None,
                       value_col: str = "value",
                       seq_col: str = "offset") -> DataFrame:
    """Broker-format streaming ingest (source/KafkaSource.scala:26
    analog), e.g. on a real cluster:

        stream_wire_events(spark, "kafka", {
            "kafka.bootstrap.servers": "...", "subscribe": "events",
            "startingOffsets": "earliest"})

    No broker exists in this sandbox; tests drive the identical decode
    path through Spark's built-in ``rate`` source
    (tests/test_streaming_multimodal.py)."""
    raw = stream_source(spark, fmt, options)
    return decode_wire_stream(
        raw, F.col(value_col).cast("string"), F.col(seq_col)
    )


def _pdf_seed(pdf: "pd.DataFrame", *cols):
    """First-sight seed riding the stream itself (the ``seed=`` join
    path, see _attach_seed): the ``__seed*`` columns are constant per
    key, so read them off any row of the first batch. Returns the tuple
    of values (or the single value), or None when the key has no seed
    row (left-join miss) or the columns aren't attached."""
    if cols[0] not in pdf.columns or len(pdf) == 0:
        return None
    vals = []
    for c in cols:
        v = pdf[c].iloc[0]
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return None
        vals.append(v)
    return vals[0] if len(vals) == 1 else tuple(vals)


def _attach_seed(src: DataFrame, seed: DataFrame | None,
                 mapping: dict[str, str]) -> DataFrame:
    """Stream-static LEFT JOIN of the seed frame onto the write stream —
    the DISTRIBUTED alternative to broadcast_seed: no driver collect, so
    the seed cardinality is unbounded (Spark broadcasts it when small,
    shuffle-joins when not). ``mapping``: seed column → reserved
    ``__seed*`` name the state fn reads at first sight."""
    if seed is None:
        return src
    cols = [F.col("entity")] + [
        F.col(s).alias(d) for s, d in mapping.items()]
    return src.join(seed.select(*cols), "entity", "left")


def _init_get(init, entity):
    """Resolve a key's seed state from an init mapping that may be a
    plain dict or a Spark ``Broadcast`` of one (the broadcast form ships
    one copy per executor, not per task)."""
    if init is None:
        return None
    m = init.value if hasattr(init, "value") else init
    return m.get(entity)


def _make_counter_fn(refresh_ms: int, init=None):
    def _counter_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        """Running interaction counter per entity — the streaming twin of
        MemCounter (fstore/memory/MemCounter.scala:13-22): each write
        increments, the emitted value includes the write itself
        (FeatureValueFlow.scala:29-42). ``refresh_ms`` is the refresh gate
        (FeatureValueFlow.scala:64-80): suppress emissions until refresh
        elapsed since the last emitted ts for this key (0 = always emit,
        the reference's test default). ``init`` seeds state for keys the
        store has never seen — the batch-snapshot → streaming-resume
        handoff (streaming/handoff.py)."""
        if state.exists:
            total, last_emit = state.get
        else:
            total, last_emit = _init_get(init, key[0]) or 0, None
        seeded = state.exists
        out = []
        for pdf in pdfs:
            if not seeded:
                s = _pdf_seed(pdf, "__seed")
                if s is not None:
                    total = int(s)
                seeded = True
            pdf = pdf.sort_values(["ts_ms", "seq"])
            ts = pdf["ts_ms"].values
            counts = []
            emit = []
            for t in ts:
                total += 1
                counts.append(total)
                ok = refresh_ms == 0 or last_emit is None or t - last_emit >= refresh_ms
                emit.append(ok)
                if ok:
                    last_emit = int(t)
            frame = pd.DataFrame(
                {
                    "entity": key[0],
                    "ts_ms": ts,
                    "seq": pdf["seq"].values,
                    "value": counts,
                }
            )
            out.append(frame[pd.Series(emit, index=frame.index)])
        state.update((total, last_emit))
        yield from out

    return _counter_fn


def streaming_interaction_count(
    events: DataFrame, interaction: str, entity: str = "user_id",
    refresh_ms: int = 0, init=None, seed: DataFrame | None = None,
) -> DataFrame:
    """Per-event lifetime interaction count as an incrementally maintained
    stream (vectorized Arrow state op, no per-row Python). ``init``: an
    optional ``{entity: total}`` mapping (dict or Broadcast) seeding keys
    the state store has never seen — see streaming/handoff.py. ``seed``:
    the same handoff as a FRAME ``(entity, total)`` attached by a
    stream-static left join — distributed, no driver collect, unbounded
    seed cardinality (use instead of ``init`` past driver memory)."""
    writes = events.filter(
        (F.col("event_type") == "interaction")
        & (F.col("interaction_type") == interaction)
    ).select(F.col(entity).alias("entity"), "ts_ms", "seq")
    writes = _attach_seed(writes, seed, {"total": "__seed"})
    return writes.groupBy("entity").applyInPandasWithState(
        _make_counter_fn(refresh_ms, init),
        outputStructType=COUNTER_OUT,
        stateStructType=COUNTER_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


WCOUNT_OUT = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("wcnt", T.ArrayType(T.DoubleType())),
    ]
)
# state = the PeriodicCounter bucket map (MemPeriodicCounter.scala:16-27),
# truncated to the oldest bucket any configured period can reach
WCOUNT_STATE = T.StructType(
    [
        T.StructField("buckets", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ]
)


def _make_wcount_fn(periods: tuple[int, ...], bucket_ms: int, init=None):
    max_p = max(periods)

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            buckets, counts = state.get
            m = dict(zip(buckets, counts))
        else:
            seed = _init_get(init, key[0])  # (buckets, counts) or None
            m = dict(zip(seed[0], seed[1])) if seed else {}
        seeded = state.exists
        out = []
        for pdf in pdfs:
            if not seeded:
                s = _pdf_seed(pdf, "__seed_b", "__seed_c")
                if s is not None:
                    # plain ints: numpy scalars poison the state pickle
                    m = {int(b): int(c) for b, c in zip(s[0], s[1])}
                seeded = True
            pdf = pdf.sort_values(["ts_ms", "seq"])
            vals = []
            for t in pdf["ts_ms"].values:
                b = int(t) // bucket_ms
                m[b] = m.get(b, 0) + 1
                last = max(m)
                vals.append([
                    float(sum(v for bb, v in m.items() if last - p <= bb <= last))
                    for p in periods
                ])
            out.append(pd.DataFrame({
                "entity": key[0],
                "ts_ms": pdf["ts_ms"].values,
                "seq": pdf["seq"].values,
                "wcnt": vals,
            }))
        # evict buckets no period can ever reach again (bounded state)
        last = max(m)
        m = {b: v for b, v in m.items() if b >= last - max_p}
        state.update((list(m.keys()), list(m.values())))
        yield from out

    return fn


def streaming_window_count(
    events: DataFrame,
    interaction: str,
    periods: tuple[int, ...] = (7,),
    bucket_ms: int = 86_400_000,
    entity: str = "item_id",
    init=None,
    seed: DataFrame | None = None,
) -> DataFrame:
    """PeriodicCounter as an incrementally maintained stream: at each
    matching interaction emit the anchor-at-last-bucket window vector
    (model/Feature.scala:142-161 semantics). State is the bucket map,
    evicted past max(periods) — O(max_period) longs per key. ``init``:
    optional ``{entity: (buckets, counts)}`` seed mapping
    (streaming/handoff.py wcount_seed_frame); ``seed``: the same seed as
    a frame ``(entity, buckets, counts)`` via stream-static join (no
    driver collect)."""
    writes = events.filter(
        (F.col("event_type") == "interaction")
        & (F.col("interaction_type") == interaction)
    ).select(F.col(entity).alias("entity"), "ts_ms", "seq")
    writes = _attach_seed(
        writes, seed, {"buckets": "__seed_b", "counts": "__seed_c"})
    return writes.groupBy("entity").applyInPandasWithState(
        _make_wcount_fn(periods, bucket_ms, init),
        outputStructType=WCOUNT_OUT,
        stateStructType=WCOUNT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_sessionize(
    events: DataFrame, gap_ms: int = 30 * 60 * 1000, entity: str = "user_id"
) -> DataFrame:
    """Streaming gap-sessionization via Spark's native session_window —
    the incremental twin of plans/sessionize.py (TrainBuffer's event-time
    eviction). Watermark bounds state: sessions close once event time
    passes gap beyond their end. Emits one row per closed session with
    bounds and event count (session_bounds parity)."""
    ts = F.timestamp_millis(F.col("ts_ms"))
    with_ts = events.withColumn("__et", ts).withWatermark("__et", f"{gap_ms // 1000} seconds")
    return (
        with_ts.groupBy(F.col(entity), F.session_window("__et", f"{gap_ms // 1000} seconds"))
        .agg(
            F.min("ts_ms").alias("session_start_ms"),
            F.max("ts_ms").alias("session_end_ms"),
            (F.max("ts_ms") - F.min("ts_ms")).alias("session_dur_ms"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("session_window")
    )


def run_stream_to_parquet(
    result: DataFrame, out_path: str, checkpoint: str, await_sec: float | None = None
):
    """Append sink with checkpointing; returns the query handle."""
    q = (
        result.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_sec is not None:
        q.awaitTermination(await_sec)
    return q


SCALAR_OUT = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)
SCALAR_STATE = T.StructType([T.StructField("last", T.DoubleType())])


def _make_scalar_fn(init=None):
    def fn(key, pdfs, state: GroupState):
        last = state.get[0] if state.exists else _init_get(init, key[0])
        seeded = state.exists
        out = []
        for pdf in pdfs:
            if not seeded:
                s = _pdf_seed(pdf, "__seed")
                if s is not None:
                    last = float(s)
                seeded = True
            pdf = pdf.sort_values(["ts_ms", "seq"])
            vals = []
            for w in pdf["w"].values:
                if w == w and w is not None:  # non-NaN write
                    last = float(w)
                vals.append(last)
            out.append(pd.DataFrame({
                "entity": key[0],
                "ts_ms": pdf["ts_ms"].values,
                "seq": pdf["seq"].values,
                "value": vals,
            }))
        state.update((last,))
        yield from out

    return fn


def streaming_last_scalar(events: DataFrame, value, entity: str = "user_id",
                          init=None, seed: DataFrame | None = None
                          ) -> DataFrame:
    """ScalarFeature streaming twin (MemScalarFeature.scala:14-17): carry
    the latest non-null ``value`` write to every event of the entity —
    the incremental as-of read. State is one double per key. ``init``: an
    optional ``{entity: last_value}`` seed mapping (streaming/handoff.py);
    ``seed``: the same as a frame ``(entity, last)`` via stream-static
    join (no driver collect)."""
    src = events.select(
        F.col(entity).alias("entity"), "ts_ms", "seq", value.cast("double").alias("w")
    )
    src = _attach_seed(src, seed, {"last": "__seed"})
    return src.groupBy("entity").applyInPandasWithState(
        _make_scalar_fn(init),
        outputStructType=SCALAR_OUT,
        stateStructType=SCALAR_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BLIST_OUT = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("recent", T.StringType()),
    ]
)
BLIST_STATE = T.StructType(
    [
        T.StructField("ts", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.StringType())),
    ]
)


def _make_blist_fn(count: int, duration_ms: int, sep: str, init=None):
    def fn(key, pdfs, state: GroupState):
        if state.exists:
            ts_l, vs = list(state.get[0]), list(state.get[1])
        else:
            seed = _init_get(init, key[0])  # (ts newest-first, vals) or None
            ts_l, vs = (list(seed[0]), list(seed[1])) if seed else ([], [])
        seeded = state.exists
        out = []
        for pdf in pdfs:
            if not seeded:
                s = _pdf_seed(pdf, "__seed_ts", "__seed_vals")
                if s is not None:
                    ts_l, vs = [int(t) for t in s[0]], [str(v) for v in s[1]]
                seeded = True
            pdf = pdf.sort_values(["ts_ms", "seq"])
            joined = []
            for t, v in zip(pdf["ts_ms"].values, pdf["v"].values):
                # MemBoundedList.scala:18-37: prepend, filter
                # ts >= append.ts - duration, take(count)
                ts_l.insert(0, int(t))
                vs.insert(0, str(v))
                cutoff = int(t) - duration_ms
                kept = [(tt, vv) for tt, vv in zip(ts_l, vs) if tt >= cutoff][:count]
                ts_l = [tt for tt, _ in kept]
                vs = [vv for _, vv in kept]
                joined.append(sep.join(vs))
            out.append(pd.DataFrame({
                "entity": key[0],
                "ts_ms": pdf["ts_ms"].values,
                "seq": pdf["seq"].values,
                "recent": joined,
            }))
        state.update((ts_l, vs))
        yield from out

    return fn


def streaming_bounded_list(
    events: DataFrame,
    value,
    count: int,
    duration_ms: int,
    entity: str = "user_id",
    sep: str = ",",
    init=None,
    seed: DataFrame | None = None,
) -> DataFrame:
    """BoundedListFeature streaming twin: evict-on-write deque per key
    (newest first, time+count eviction), emitted as the joined string at
    every append — read-at-write parity with ops.bounded_list_string.
    State is at most ``count`` (ts, value) pairs per key. ``init``:
    optional ``{entity: (ts newest-first, vals)}`` seed
    (streaming/handoff.py blist_seed_frame); ``seed``: the same as a
    frame ``(entity, ts, vals)`` via stream-static join."""
    src = events.select(
        F.col(entity).alias("entity"), "ts_ms", "seq", value.cast("string").alias("v")
    )
    src = _attach_seed(
        src, seed, {"ts": "__seed_ts", "vals": "__seed_vals"})
    return src.groupBy("entity").applyInPandasWithState(
        _make_blist_fn(count, duration_ms, sep, init),
        outputStructType=BLIST_OUT,
        stateStructType=BLIST_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


STATS_OUT = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("stat_min", T.DoubleType()),
        T.StructField("stat_max", T.DoubleType()),
        T.StructField("stat_avg", T.DoubleType()),
        T.StructField("stat_n", T.LongType()),
    ]
)
STATS_STATE = T.StructType([T.StructField("pool", T.ArrayType(T.DoubleType()))])


def _make_stats_fn(pool: int, init=None):
    def fn(key, pdfs, state: GroupState):
        vals = (list(state.get[0]) if state.exists
                else list(_init_get(init, key[0]) or []))
        seeded = state.exists
        out = []
        for pdf in pdfs:
            if not seeded:
                s = _pdf_seed(pdf, "__seed")
                if s is not None:
                    vals = [float(v) for v in s]
                seeded = True
            pdf = pdf.sort_values(["ts_ms", "seq"])
            rows = []
            for v in pdf["v"].values:
                vals.append(float(v))
                vals = vals[-pool:]
                rows.append((min(vals), max(vals),
                             round(sum(vals) / len(vals), 6), len(vals)))
            frame = pd.DataFrame({
                "entity": key[0],
                "ts_ms": pdf["ts_ms"].values,
                "seq": pdf["seq"].values,
            })
            frame["stat_min"], frame["stat_max"], frame["stat_avg"], frame["stat_n"] = (
                [r[0] for r in rows], [r[1] for r in rows],
                [r[2] for r in rows], [r[3] for r in rows],
            )
            out.append(frame)
        state.update((vals,))
        yield from out

    return fn


def streaming_stats_pool(
    events: DataFrame, value, pool: int = 10, entity: str = "user_id",
    init=None, seed: DataFrame | None = None,
) -> DataFrame:
    """StatsEstimator streaming twin (model/Feature.scala:213-234): bounded
    last-``pool`` sample deque per key, min/max/avg/n emitted at every
    sample — read-at-write parity with ops.stats_window. ``init``:
    optional ``{entity: pool oldest-first}`` seed
    (streaming/handoff.py stats_seed_frame); ``seed``: the same as a
    frame ``(entity, pool)`` via stream-static join."""
    src = events.select(
        F.col(entity).alias("entity"), "ts_ms", "seq", value.cast("double").alias("v")
    )
    src = _attach_seed(src, seed, {"pool": "__seed"})
    return src.groupBy("entity").applyInPandasWithState(
        _make_stats_fn(pool, init),
        outputStructType=STATS_OUT,
        stateStructType=STATS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FREQ_OUT = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("freq_share", T.DoubleType()),
    ]
)
FREQ_STATE = T.StructType([T.StructField("pool", T.ArrayType(T.StringType()))])


def _make_freq_fn(target: str, pool: int, init=None):
    def fn(key, pdfs, state: GroupState):
        vals = (list(state.get[0]) if state.exists
                else list(_init_get(init, key[0]) or []))
        seeded = state.exists
        out = []
        for pdf in pdfs:
            if not seeded:
                s = _pdf_seed(pdf, "__seed")
                if s is not None:
                    vals = [str(v) for v in s]
                seeded = True
            pdf = pdf.sort_values(["ts_ms", "seq"])
            shares = []
            for v in pdf["v"].values:
                vals.append(str(v))
                vals = vals[-pool:]
                shares.append(sum(1 for x in vals if x == target) / len(vals))
            out.append(pd.DataFrame({
                "entity": key[0],
                "ts_ms": pdf["ts_ms"].values,
                "seq": pdf["seq"].values,
                "freq_share": shares,
            }))
        state.update((vals,))
        yield from out

    return fn


def streaming_freq_share(
    events: DataFrame, value, target: str, pool: int = 10,
    entity: str = "user_id", init=None, seed: DataFrame | None = None,
) -> DataFrame:
    """FreqEstimator streaming twin (model/Feature.scala:112-126): bounded
    last-``pool`` sample deque; emits the relative frequency of ``target``
    at every sample — read-at-write parity with ops.freq_share. ``init``:
    optional ``{entity: pool oldest-first}`` seed
    (streaming/handoff.py freq_seed_frame); ``seed``: the same as a
    frame ``(entity, pool)`` via stream-static join."""
    src = events.select(
        F.col(entity).alias("entity"), "ts_ms", "seq", value.cast("string").alias("v")
    )
    src = _attach_seed(src, seed, {"pool": "__seed"})
    return src.groupBy("entity").applyInPandasWithState(
        _make_freq_fn(target, pool, init),
        outputStructType=FREQ_OUT,
        stateStructType=FREQ_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MAP_OUT = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("map_state", T.StringType()),
    ]
)
MAP_STATE = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.StringType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
    ]
)


def _make_map_fn(init=None):
    def fn(key, pdfs, state: GroupState):
        if state.exists:
            m = dict(zip(*state.get))
        else:
            seed = _init_get(init, key[0])  # (keys, vals) or None
            m = dict(zip(seed[0], seed[1])) if seed else {}
        seeded = state.exists
        out = []
        for pdf in pdfs:
            if not seeded:
                s = _pdf_seed(pdf, "__seed_keys", "__seed_vals")
                if s is not None:
                    m = {str(k): float(v) for k, v in zip(s[0], s[1])}
                seeded = True
            pdf = pdf.sort_values(["ts_ms", "seq"])
            snap = []
            for mk, v in zip(pdf["mk"].values, pdf["v"].values):
                m[str(mk)] = float(v)  # PutTuple upsert
                snap.append(",".join(f"{k}={m[k]}" for k in sorted(m)))
            out.append(pd.DataFrame({
                "entity": key[0],
                "ts_ms": pdf["ts_ms"].values,
                "seq": pdf["seq"].values,
                "map_state": snap,
            }))
        state.update((list(m.keys()), list(m.values())))
        yield from out

    return fn


def streaming_map_feature(
    events: DataFrame, map_key, value, entity: str = "user_id", init=None,
    seed: DataFrame | None = None,
) -> DataFrame:
    """MapFeature streaming twin (MemMapFeature.scala:12-24 PutTuple
    upserts): per-key map state, emitted at every write as a
    deterministic sorted k=v rendering. The final emission per entity
    equals the batch final-state read (ops.map_feature_last). ``init``:
    optional ``{entity: (keys, vals)}`` seed
    (streaming/handoff.py map_seed_frame); ``seed``: the same as a frame
    ``(entity, keys, vals)`` via stream-static join."""
    src = events.select(
        F.col(entity).alias("entity"), "ts_ms", "seq",
        map_key.cast("string").alias("mk"), value.cast("double").alias("v"),
    )
    src = _attach_seed(
        src, seed, {"keys": "__seed_keys", "vals": "__seed_vals"})
    return src.groupBy("entity").applyInPandasWithState(
        _make_map_fn(init),
        outputStructType=MAP_OUT,
        stateStructType=MAP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CT_OUT = T.StructType(
    [
        T.StructField("ranking_id", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("session_id", T.StringType()),
        T.StructField("ts_ms", T.LongType()),       # the RANKING's ts (payload)
        T.StructField("commit_ms", T.LongType()),   # expiry event-time (commit order)
        T.StructField("item_id", T.StringType()),
        T.StructField("n_interactions", T.LongType()),
    ]
)
CT_STATE = T.StructType(
    [
        T.StructField("ts_ms", T.LongType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("session_id", T.StringType()),
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("int_items", T.ArrayType(T.StringType())),
        T.StructField("last_ts", T.LongType()),
    ]
)


def _make_clickthrough_fn(max_session_ms: int):
    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # session evicted: flush = ImpressionInject.process on the
            # buffered clickthrough (only if it saw interactions —
            # TrainBuffer.flushQueue filters interactions.nonEmpty)
            ts, user, session, items, int_items, last_ts = state.get
            state.remove()
            if int_items and items:
                positions = [
                    items.index(i) + 1 for i in int_items if i in items
                ]
                if positions:
                    max_pos = max(positions)
                    yield pd.DataFrame({
                        "ranking_id": key[0],
                        "user_id": user,
                        "session_id": session,
                        "ts_ms": ts,
                        "commit_ms": last_ts + max_session_ms,
                        "item_id": items[:max_pos],
                        "n_interactions": len(int_items),
                    })
            return
        ts, user, session, items, int_items, last_ts = (
            state.get if state.exists else (None, None, None, [], [], 0)
        )
        items, int_items = list(items or []), list(int_items or [])
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_ms", "seq"])
            for _, row in pdf.iterrows():
                if row["event_type"] == "ranking":
                    ts = int(row["ts_ms"])
                    user, session = row["user_id"], row["session_id"]
                    items = list(row["items"])
                else:  # FK interaction: joins the buffered clickthrough
                    int_items.append(str(row["item_id"]))
                last_ts = max(last_ts, int(row["ts_ms"]))
        state.update((ts, user, session, items, int_items, last_ts))
        # expireAfterWrite semantics: the eviction clock resets on every
        # put (TrainBuffer.scala:160-167) — event-time timeout at
        # last-write + maxSessionLength
        state.setTimeoutTimestamp(last_ts + max_session_ms)

    return fn


def streaming_clickthrough_expiry(
    events: DataFrame, max_session_ms: int = 30 * 60 * 1000, watermark: str = "1 second"
) -> DataFrame:
    """TrainBuffer + ImpressionInject streaming twin with TRUE
    commit-at-expiry semantics (flow/TrainBuffer.scala:33-167): rankings
    buffer keyed by id, FK interactions join the buffer and reset its
    event-time eviction clock (expireAfterWrite analog via
    setTimeoutTimestamp), and the flush — injected impressions for items
    up to the max interacted position, stamped with the RANKING's ts but
    committed at expiry (`commit_ms`) — fires when the watermark passes
    last_write + maxSessionLength.

    This is the faithful counterpart of the batch path's documented
    commit-at-completion deviation (operators/clickthrough.py): here a
    later same-session ranking inside the expiry window does NOT see the
    injected impressions, exactly like a live reference run."""
    src = events.filter(
        (F.col("event_type") == "ranking")
        | ((F.col("event_type") == "interaction") & F.col("ranking_id").isNotNull())
    ).select(
        F.coalesce(F.col("ranking_id"), F.col("event_id")).alias("__rk"),
        "event_type", "ts_ms", "seq", "user_id", "session_id", "item_id",
        F.transform(F.col("items"), lambda x: x["id"]).alias("items"),
        F.timestamp_millis(F.col("ts_ms")).alias("__et"),
    ).withWatermark("__et", watermark)
    return src.groupBy("__rk").applyInPandasWithState(
        _make_clickthrough_fn(max_session_ms),
        outputStructType=CT_OUT,
        stateStructType=CT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --------------------------------------------------------------------------
# streaming curation: first-sight exact dedup
# --------------------------------------------------------------------------

DEDUP_OUT = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("is_dup", T.BooleanType()),
    ]
)
DEDUP_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def _make_dedup_fn():
    def fn(key, pdfs, state: GroupState):
        """First-arrival-wins exact dedup per content-hash group: the
        first doc carrying this hash survives; every later one is a dup.
        State is ONE boolean per distinct content — the minimum possible
        streaming-dedup footprint (batch dedup of the same corpus holds
        the same cardinality as a shuffle instead)."""
        seen = state.exists
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")  # batch-internal tiebreak
            flags = []
            for _ in range(len(pdf)):
                flags.append(seen)
                seen = True
            out.append(pd.DataFrame({"doc_id": pdf["doc_id"], "is_dup": flags}))
        state.update((True,))
        return iter(out)

    return fn


def streaming_dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact-dedup streaming twin (functions/dedup.exact_dedup): mark
    every later arrival of an already-seen token sequence as a duplicate.
    The group key is xxhash64(tokens) — the same 8-byte shuffle key as
    the batch path, so megabyte payloads never ride an exchange. The
    SURVIVOR is first-arrival (batch picks min doc_id); on an
    arrival-ordered stream the two coincide, which the equality test
    pins. State per distinct content: one boolean."""
    src = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.xxhash64("tokens").alias("__kh"),
    )
    return src.groupBy("__kh").applyInPandasWithState(
        _make_dedup_fn(),
        outputStructType=DEDUP_OUT,
        stateStructType=DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_near(docs_stream: DataFrame, output: str,
                         params=None):
    """Streaming NEAR-dedup on ingest: every micro-batch is curated as a
    frozen-history delta against the state tables at ``output`` (exact
    hash set + LSH band table + retained token payloads), and its
    exact-survivors fold into the state for the next batch.

    Shape rationale: a near-dup decision needs consensus across all of a
    document's LSH bands plus within-batch connected components —
    cross-group logic applyInPandasWithState cannot express (state is
    per group key). foreachBatch over the batch delta operators is the
    idiomatic Spark answer; micro-batch boundaries ARE delta cuts, so
    semantics equal a curate_delta chain (first-sight history, never
    rewritten). Per-batch output + state partitions are tagged by
    batch_id, so foreachBatch's at-least-once replay converges to
    exactly-once results (the replay overwrites its own partitions).

    Returns a DataStreamWriter; caller adds checkpointLocation/trigger
    and starts it. Survivors land under ``<output>/stream/batch=<id>/
    survivors`` with the tokenized-sequence schema."""
    from metarank_spark.operators.curate import (
        CurateParams,
        dedup_ingest_batch,
    )

    p = params or CurateParams()

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        dedup_ingest_batch(
            batch_df.sparkSession, batch_df, output, p, str(batch_id))

    return docs_stream.writeStream.foreachBatch(fold)


def streaming_curate(docs_stream: DataFrame, output: str, params=None):
    """Streaming END-TO-END curation on ingest: every micro-batch runs
    the full frozen-history delta pipeline (operators/curate.curate_delta
    — tokenize → dedup exact/near vs all history → quality →
    decontaminate → [importance with the frozen base LM + cutoff] →
    mixture at the frozen base rates → pack with CONTINUED per-source
    offsets), then folds its survivors into the state for the next
    batch.

    Requires a completed base ``curate()`` + ``publish_state()`` at
    ``output`` (the frozen LM/rates/offsets come from the base run —
    curate_delta raises a clear error otherwise). Batch outputs land
    under ``<output>/deltas/<fingerprint>/`` exactly as driver-invoked
    deltas do: the delta tag is the batch's CONTENT fingerprint, so a
    foreachBatch replay recomputes into the same directories and
    manifests (idempotent), and a batch already curated in a previous
    run resumes receipt-by-receipt instead of recomputing.

    Returns a DataStreamWriter; caller adds checkpointLocation/trigger."""
    from metarank_spark.operators.curate import CurateParams, curate_delta

    p = params or CurateParams()

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        curate_delta(batch_df.sparkSession, batch_df, output, p)

    return docs_stream.writeStream.foreachBatch(fold)
