"""Incremental backfill: fold ONLY new events on top of a compact history
snapshot and produce feature rows bit-identical to a full-history replay.

The production pattern at warehouse scale: a feature pipeline that
reprocesses its entire event history for every daily delta does O(history)
work per day; this module makes the daily fold O(delta + horizon) and
*invariant to history length*, while keeping the engine's exactness
contract (the incremental matrix equals ``training_matrix`` over the full
stream restricted to rankings after the cut — property-tested in
tests/test_incremental.py).

Reference anchor: the reference achieves the same incrementality online —
its state store IS the snapshot (FeatureValue keys persisted in Redis,
``metarank import`` appending to them; feature/FeatureBackend semantics).
This is the batch restatement: the "state" a replay needs is reconstructed
as a *bounded retained event set* plus *counter offsets*, because every
reference primitive reads bounded state:

- PeriodicCounter / window rates read trailing-bucket sums anchored at the
  last write's bucket (model/Feature.scala:139-161) → retain each
  entity's last write PLUS its window context (writes within
  ``max(periods)`` buckets of the entity's last bucket). A later read
  carries that write's vector unchanged, so the retained context
  reproduces it exactly; delta-era reads only ever sum buckets younger
  than the horizon.
- Counter reads the lifetime count (MemCounter.scala:13-22) → retain the
  last write (key existence + TTL freshness) and carry the remainder as a
  per-entity integer offset added to the replayed column.
- Scalar / Map read the latest value (strictly-before) → retain the last
  event carrying the field per entity (per map key for MapFeature).
- Stats / Freq / BoundedList read a last-K pool
  (model/Feature.scala:112-126, 213-234; MemBoundedList.scala:18-37) →
  retain the last K matching (hash-accepted, so replay-deterministic)
  events per entity.

Clickthrough completeness: impression injection
(operators/clickthrough.inject_impressions) groups a ranking with ALL its
interactions, so the snapshot pulls the complete clickthrough for any
ranking touched inside the horizon window (the ranking event and its
out-of-window interactions). Sessions that straddle the cut re-inject at
incremental time with their delta interactions attached; their commit
timestamps land after the cut in both the full and the incremental run, so
offsets (counted at commit ≤ t0) stay consistent — exact under the
reference's own session-expiry contract (TrainBuffer.scala:160-167: an
interaction arriving after the buffer expired is dropped, i.e. no
attribution later than last_interaction + maxSessionLength).

Scale shape: snapshot construction is one pass over history (amortized —
it IS the checkpoint operation); every retention rule is a grouped
aggregation or a chunk-decomposed last-K (two bounded row_number windows,
never one task per whole entity history); the incremental fold runs the
unchanged engine over tail ∪ delta. Offsets join the OUTPUT matrix on its
entity column — a plain equi-join on the same key the matrix is already
hashed by.

TTL'd lifetime counters: freshness rides on the retained last write (the
replayed stream's last-write ts for any post-cut read equals the full
stream's, because retention keeps the true last write — for impression
counters, the generating clickthrough of each entity's last injected
impression). A stale key reads 0.0 in BOTH runs, so the offset join is
gated per row: the offset is added only where the replayed (TTL-masked)
value is positive, i.e. exactly where the full run's key is fresh.

Field-scoped counters (``item.<field>`` / ``ranking.<field>``,
Scope.scala:43-52): writes are keyed by a FIELD-derived entity — the
item's field value as-of the write for the item head (an as-of hop), the
interaction's ranking's own field + item id for the ranking head. Three
mechanisms make the bounded tail reproduce historical re-keyings exactly:

1. *Selection over derived entities*: which pre-cut interactions to
   retain (window context for windowed legs, last-1 for lifetime/TTL
   freshness) is decided on the derived write stream — for raw legs and
   for injected-impression legs (whose generating clickthroughs are
   pulled whole, as for plain scopes).
2. *As-of fix-up*: after the provisional tail is closed, one pass pulls,
   for EVERY tail interaction of an item-head-scoped type (and every
   injected impression of the tail's clickthroughs), the exact item
   event its as-of hop resolves to over FULL history. Replay then
   re-derives bit-identical entities: the true as-of target is present,
   and rows older than the true last never change an as-of read — which
   also makes these pulls safe for every other feature's retention.
3. *Derived-entity offsets*: lifetime-counter offsets group by the
   derived entity on both sides of the diff, and the fold re-derives
   each output row's entity (as-of against the tail∪delta field series
   for the item head; the ranking's own field + item id for the ranking
   head) before the gated offset join. Entity-null rows (field unknown)
   read 0.0 in both runs and get no offset.

The ranking head needs no fix-up: every retained FK'd interaction's
ranking is pulled by the completion closure, so replay re-joins the same
ranking fields.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metarank_spark.engine import (
    FIELD_SCOPE_SEP,
    GLOBAL_ENTITY,
    Boolean,
    Diversity,
    FieldMatch,
    InteractedWith,
    InteractionCount,
    ItemAge,
    Freq,
    MapFeature,
    Number,
    Rate,
    RecentItems,
    Referer,
    Stats,
    StringEncode,
    UserAgent,
    Vector,
    WindowCount,
    WordCount,
    _entity_col,
    _parse_field_scope,
)
from metarank_spark.plans.asof import asof_join
from metarank_spark.operators.clickthrough import (
    MAX_SESSION_MS,
    inject_impressions,
    training_matrix,
)

__all__ = [
    "IncrementalSnapshot",
    "engine_fingerprint",
    "history_horizon_ms",
    "snapshot",
    "roll_snapshot",
    "incremental_training_matrix",
    "save_snapshot",
    "load_snapshot",
]

_FIELD_SOURCES = {"item": "item", "user": "user"}


@dataclass
class IncrementalSnapshot:
    """Compact reconstruction state: ``tail`` is the retained raw event
    set (pre-injection, deduped on the total-order ``seq``), ``offsets``
    maps lifetime-counter feature names to (entity, offset) frames.
    ``fingerprint`` pins the engine config the tail's retention rules were
    derived from — folding or rolling with a different config would
    silently break the bit-identical contract, so it is validated at every
    use."""

    t0_ms: int
    horizon_ms: int
    tail: DataFrame
    offsets: dict[str, DataFrame]
    commit_at_expiry: bool = True
    fingerprint: str | None = None


def engine_fingerprint(engine, max_session_ms: int = MAX_SESSION_MS) -> str:
    """Deterministic hash of everything the snapshot's retention rules
    depend on: the full feature config list (order-sensitive — it is the
    output column order too), the engine's late-type set, and the session
    length that bounds the clickthrough closure."""
    payload = {
        "features": [
            {"type": type(c).__name__, **asdict(c)} for c in engine.features
        ],
        "late_types": sorted(engine.late_types),
        "max_session_ms": max_session_ms,
    }
    blob = json.dumps(payload, sort_keys=True, default=list)
    return hashlib.sha256(blob.encode("utf-8")).hexdigest()[:16]


def _check_fingerprint(snap: IncrementalSnapshot, engine,
                       max_session_ms: int, op: str) -> None:
    if snap.fingerprint is None:
        return  # pre-fingerprint snapshot: caller vouches for the config
    cur = engine_fingerprint(engine, max_session_ms)
    if cur != snap.fingerprint:
        raise ValueError(
            f"{op}: engine config fingerprint {cur} does not match the "
            f"snapshot's {snap.fingerprint} — the tail was retained under "
            "a different feature config (or max_session_ms) and cannot "
            "reproduce full-replay results for this one. Rebuild the "
            "snapshot with snapshot(events, t0, engine)."
        )


def history_horizon_ms(engine, max_session_ms: int = MAX_SESSION_MS) -> int:
    """Replay horizon: the widest trailing window any feature reads, plus
    one bucket of edge slack, plus two session lengths (impression commits
    lag their session's last interaction by max_session_ms, and the
    anchored-periodic lateness contract needs one more)."""
    span = 0
    for cfg in engine.features:
        if isinstance(cfg, (WindowCount, Rate)):
            span = max(span, (max(cfg.periods) + 1) * cfg.bucket_ms)
        if isinstance(cfg, (RecentItems, InteractedWith)):
            span = max(span, cfg.duration_ms)
    return span + 2 * max_session_ms


def _last_k_per_key(
    df: DataFrame, keys: list, k: int, chunk_ms: int
) -> DataFrame:
    """Chunk-decomposed last-K rows per key in (ts_ms, seq) order: first
    keep last K inside each (key, time-chunk) — bounded tasks even for an
    entity holding a macroscopic share of history — then last K among the
    ≤ K-per-chunk survivors."""
    desc = [F.col("ts_ms").desc(), F.col("seq").desc()]
    chunk = F.floor(F.col("ts_ms") / F.lit(chunk_ms))
    wc = Window.partitionBy(*keys, chunk).orderBy(*desc)
    pruned = (
        df.withColumn("__rn", F.row_number().over(wc))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    wk = Window.partitionBy(*keys).orderBy(*desc)
    return (
        pruned.withColumn("__rn", F.row_number().over(wk))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _window_context_keyed(w: DataFrame, periods: tuple,
                          bucket_ms: int) -> DataFrame:
    """Rows of ``w`` (pre-keyed: carries ``__ent``) inside each entity's
    last-anchored window: every write whose bucket is within max(periods)
    of the entity's LAST bucket. A read after the cut carries the last
    write's vector, whose trailing sums range over exactly these rows."""
    vts = (
        F.coalesce(F.col("vts_ms"), F.col("ts_ms"))
        if "vts_ms" in w.columns
        else F.col("ts_ms")
    )
    w = w.withColumn("__bucket", F.floor(vts / F.lit(bucket_ms)))
    last = w.groupBy("__ent").agg(F.max("__bucket").alias("__last_bucket"))
    return (
        w.join(last, "__ent")
        .filter(F.col("__bucket") >= F.col("__last_bucket") - max(periods))
        .drop("__ent", "__bucket", "__last_bucket")
    )


def _window_context(writes: DataFrame, scope: str,
                    periods: tuple, bucket_ms: int) -> DataFrame:
    return _window_context_keyed(
        writes.withColumn("__ent", _entity_col(scope)), periods, bucket_ms)


def _pull_by_seq(hist: DataFrame, picked: DataFrame) -> DataFrame:
    """The raw hist rows whose seq appears in ``picked`` (seq, plus the
    matched field event's __fseq when present) — selection frames over
    DERIVED write streams resolve back to raw events this way."""
    seqs = picked.select(F.col("seq").alias("__pull_seq"))
    if "__fseq" in picked.columns:
        seqs = seqs.unionByName(
            picked.filter(F.col("__fseq").isNotNull())
            .select(F.col("__fseq").alias("__pull_seq"))
        )
    return hist.join(
        seqs.distinct(), F.col("seq") == F.col("__pull_seq"), "leftsemi"
    )


def _interaction_of(df: DataFrame, itype: str) -> DataFrame:
    return df.filter(
        (F.col("event_type") == "interaction")
        & (F.col("interaction_type") == itype)
    )


def _str_head(field: str):
    return F.col("str_fields").getItem(field).getItem(0)


def _scalar_write_pred(cfg):
    """The EXACT merged-scan write predicate of a last-value feature
    (engine._compile_scope_group) — retention must match it exactly: a
    kept event that the engine would not treat as a write (or vice versa)
    shifts the replayed last-value."""
    from metarank_spark.functions.ua import ua_category

    if isinstance(cfg, Number):
        return (F.col("event_type") == cfg.source) & F.col(
            "num_fields").getItem(cfg.field).isNotNull()
    if isinstance(cfg, Boolean):
        return (F.col("event_type") == cfg.source) & _str_head(
            cfg.field).isin("true", "false")
    if isinstance(cfg, StringEncode):
        return (F.col("event_type") == cfg.source) & F.col(
            "str_fields").getItem(cfg.field).isNotNull()
    if isinstance(cfg, WordCount):
        return (F.col("event_type") == cfg.source) & _str_head(
            cfg.field).isNotNull()
    if isinstance(cfg, Vector):
        return (F.col("event_type") == cfg.source) & F.col(
            "numlist_fields").getItem(cfg.field).isNotNull()
    if isinstance(cfg, ItemAge):
        return F.col("event_type") == "item"
    if isinstance(cfg, FieldMatch):
        return (F.col("event_type") == "item") & _str_head(
            cfg.item_field).isNotNull()
    if isinstance(cfg, UserAgent):
        return F.col("event_type").isin("ranking", "interaction") & \
            ua_category(_str_head(cfg.field), cfg.mapper).isNotNull()
    if isinstance(cfg, Referer):
        src = {
            "ranking": F.col("event_type") == "ranking",
            "interaction": F.col("event_type") == "interaction",
        }.get(cfg.source, F.col("event_type").isin("ranking", "interaction"))
        return src & _str_head(cfg.field).isNotNull()
    raise ValueError(cfg)  # pragma: no cover


def _retention_frames(hist: DataFrame, engine, horizon: int) -> list[DataFrame]:
    """One bounded frame per feature: the events a replay needs to rebuild
    that feature's pre-cut state for post-cut reads. Every filter below
    mirrors the engine's own write predicate for that feature — retention
    keeps exactly the rows the engine treats as state writes."""
    from metarank_spark.engine import sample_accept_expr

    frames: list[DataFrame] = []
    ints = hist.filter(F.col("event_type") == "interaction")

    def last_k(df, scope, k, extra_keys=()):
        keyed = df.withColumn("__ent", _entity_col(scope))
        out = _last_k_per_key(keyed, ["__ent", *extra_keys], k, horizon)
        return out.drop("__ent")

    field_carry: set[str] = set()  # item-head fields needing last-1 carry

    def derived(itype, fs):
        return engine._field_scoped_writes(hist, itype, *fs, keep_src=True)

    for cfg in engine.features:
        if isinstance(cfg, (WindowCount, Rate)):
            fs = _parse_field_scope(cfg.scope)
            if fs and fs[0] == "item":
                field_carry.add(fs[1])
            itypes = (
                (cfg.interaction,) if isinstance(cfg, WindowCount)
                else (cfg.top, cfg.bottom)
            )
            for itype in itypes:
                # For itype == "impression" this covers the RAW
                # impression events only; the injected ones are
                # regenerated at replay via the clickthrough pulls in
                # snapshot(). Anchoring the context on the raw-only
                # stream is a safe SUPERSET: every raw row inside the
                # true (raw ∪ injected)-anchored window has bucket ≥
                # trueLast − max(p) ≥ rawLast − max(p), so it is inside
                # the raw-anchored window too.
                if fs:
                    # selection over the DERIVED entity: the window
                    # context of the field-keyed write stream, resolved
                    # back to raw rows (+ matched field events)
                    ctx = _window_context_keyed(
                        derived(itype, fs).withColumn(
                            "__ent", F.col("entity")),
                        cfg.periods, cfg.bucket_ms)
                    frames.append(_pull_by_seq(hist, ctx))
                else:
                    frames.append(_window_context(
                        _interaction_of(hist, itype), cfg.scope,
                        cfg.periods, cfg.bucket_ms))
                if isinstance(cfg, Rate) and cfg.normalize_weight is not None:
                    frames.append(_window_context(
                        _interaction_of(hist, itype), "global",
                        cfg.periods, cfg.bucket_ms))
        elif isinstance(cfg, InteractionCount):
            fs = _parse_field_scope(cfg.scope)
            if fs and fs[0] == "item":
                field_carry.add(fs[1])
            if cfg.interaction != "impression":
                if fs:
                    lw = _last_k_per_key(
                        derived(cfg.interaction, fs).withColumn(
                            "__ent", F.col("entity")),
                        ["__ent"], 1, horizon)
                    frames.append(_pull_by_seq(hist, lw))
                else:
                    frames.append(last_k(
                        _interaction_of(hist, cfg.interaction), cfg.scope, 1))
            elif cfg.ttl_ms:
                # TTL freshness needs the entity's true last write: a RAW
                # impression event is a matching write too (the
                # injected-side candidate is pulled via the clickthrough
                # closure in snapshot()); retaining both candidates keeps
                # the replayed last-write ts equal to the full stream's
                if fs:
                    lw = _last_k_per_key(
                        derived(cfg.interaction, fs).withColumn(
                            "__ent", F.col("entity")),
                        ["__ent"], 1, horizon)
                    frames.append(_pull_by_seq(hist, lw))
                else:
                    frames.append(last_k(
                        _interaction_of(hist, cfg.interaction), cfg.scope, 1))
        elif isinstance(cfg, (Number, Boolean, StringEncode, WordCount,
                              Vector)):
            if cfg.source == "ranking":
                continue  # per-ranking constant, no state
            frames.append(last_k(
                hist.filter(_scalar_write_pred(cfg)),
                _FIELD_SOURCES[cfg.source], 1))
        elif isinstance(cfg, (FieldMatch, ItemAge)):
            frames.append(last_k(hist.filter(_scalar_write_pred(cfg)),
                                 "item", 1))
        elif isinstance(cfg, (Stats, Freq)):
            val = (
                F.col("num_fields").getItem(cfg.field)
                if isinstance(cfg, Stats) else _str_head(cfg.field)
            )
            pred = val.isNotNull()
            if cfg.sample_rate < 1.0:
                pred = pred & sample_accept_expr(cfg.sample_rate)
            frames.append(last_k(ints.filter(pred), cfg.scope, cfg.pool))
        elif isinstance(cfg, (RecentItems, InteractedWith)):
            frames.append(last_k(
                _interaction_of(hist, cfg.interaction), cfg.scope, cfg.count))
            if isinstance(cfg, InteractedWith):
                # stage 2 reads each field's item series (_field_series:
                # item events whose str_fields carry the field)
                for fld in cfg.fields:
                    src = hist.filter(
                        (F.col("event_type") == "item")
                        & F.col("str_fields").getItem(fld).isNotNull()
                    )
                    frames.append(last_k(src, "item", 1))
        elif isinstance(cfg, MapFeature):
            m = ints.filter(
                _str_head(cfg.key_field).isNotNull()
                & F.col("num_fields").getItem(cfg.value_field).isNotNull()
            )
            keyed = m.withColumn("__mk", _str_head(cfg.key_field))
            frames.append(
                last_k(keyed, cfg.scope, 1, extra_keys=["__mk"]).drop("__mk"))
        elif isinstance(cfg, (UserAgent, Referer)):
            scope = "session" if isinstance(cfg, UserAgent) else cfg.scope
            frames.append(last_k(
                hist.filter(_scalar_write_pred(cfg)), scope, 1))
        elif isinstance(cfg, Diversity):
            # NOT ranking-local: the candidate values come from stored
            # item field state, read as-of the ranking
            # (engine._attach_diversity → _scalar_series)
            val = (
                F.col("num_fields").getItem(cfg.field)
                if cfg.kind == "numeric"
                else F.col("str_fields").getItem(cfg.field)
            )
            frames.append(last_k(
                hist.filter((F.col("event_type") == "item")
                            & val.isNotNull()),
                "item", 1))
        # Relevancy / Position / LocalTime / Random are ranking-local:
        # nothing to retain
    for fld in sorted(field_carry):
        # read-side carry for item-head field scopes: the last
        # field-value event per item, so post-cut reads and delta-era
        # writes resolve their as-of hop (predicate matches
        # engine._field_value_series exactly)
        src = hist.filter(
            (F.col("event_type") == "item")
            & F.col("str_fields").getItem(fld).getItem(0).isNotNull()
        )
        frames.append(last_k(src, "item", 1))
    return frames


def _impression_window_feats(engine):
    """(periods, bucket_ms, scope) of every windowed feature reading the
    injected impression stream."""
    out = []
    for cfg in engine.features:
        itypes = ()
        if isinstance(cfg, WindowCount):
            itypes = (cfg.interaction,)
        elif isinstance(cfg, Rate):
            itypes = (cfg.top, cfg.bottom)
        if "impression" not in itypes:
            continue
        out.append((cfg.periods, cfg.bucket_ms, cfg.scope))
        if isinstance(cfg, Rate) and cfg.normalize_weight is not None:
            out.append((cfg.periods, cfg.bucket_ms, "global"))
    return out


def _item_field_itypes(engine) -> dict[str, set[str]]:
    """field → interaction types, for every ``item.<field>``-scoped
    counter leg (the writes that derive their entity via an as-of hop)."""
    needed: dict[str, set[str]] = {}
    for cfg in engine.features:
        if not isinstance(cfg, (InteractionCount, WindowCount, Rate)):
            continue
        fs = _parse_field_scope(cfg.scope)
        if not fs or fs[0] != "item":
            continue
        itypes = (
            (cfg.top, cfg.bottom) if isinstance(cfg, Rate)
            else (cfg.interaction,)
        )
        needed.setdefault(fs[1], set()).update(itypes)
    return needed


def _field_asof_fixup(
    hist: DataFrame, tail: DataFrame, engine,
    commit_at_expiry: bool, max_session_ms: int,
) -> DataFrame:
    """Module docstring mechanism 2: for EVERY tail interaction of an
    item-head-scoped type — and every injected impression of the tail's
    clickthroughs — pull the exact item event its as-of hop resolves to
    over FULL history, so replay re-derives bit-identical entities. The
    pulled rows are item events OLDER than each item's retained last
    value, which never change any other feature's as-of reads."""
    needed = _item_field_itypes(engine)
    if not needed:
        return tail
    # the fix-up references the (bounded) tail several times and injects
    # it — truncate lineage at the composition boundary so Catalyst does
    # not copy the whole retention tree per reference
    tail = tail.localCheckpoint(eager=False)
    inj_tail = None
    if any("impression" in its for its in needed.values()):
        inj_tail = inject_impressions(tail, commit_at_expiry, max_session_ms)
    fix_frames = []
    for fld, its in sorted(needed.items()):
        fv = engine._field_value_series(hist, fld).withColumn(
            "__fsrc", F.col("seq"))
        raw_its = sorted(its - {"impression"})
        pull_seqs = []
        if raw_its:
            ints0 = tail.filter(
                (F.col("event_type") == "interaction")
                & F.col("interaction_type").isin(raw_its)
            ).select("item_id", "ts_ms", "seq")
            j = asof_join(
                ints0, fv, on="item_id", left_seq="seq", right_seq="seq",
                values=["__fsrc"], strict=True, suffix="_p")
            pull_seqs.append(
                j.filter(F.col("__fsrc_p").isNotNull())
                .select(F.col("__fsrc_p").alias("__pull_seq")))
        if "impression" in its:
            imps0 = inj_tail.filter(
                F.col("interaction_type") == "impression"
            ).select("item_id", "ts_ms", "seq")
            # injected seqs live in the doubled domain; lift the field
            # series into it for an order-identical as-of
            fv2 = fv.select(
                "item_id", "ts_ms",
                (F.col("seq") * 2).alias("seq"), "__fsrc")
            j = asof_join(
                imps0, fv2, on="item_id", left_seq="seq", right_seq="seq",
                values=["__fsrc"], strict=True, suffix="_p")
            pull_seqs.append(
                j.filter(F.col("__fsrc_p").isNotNull())
                .select(F.col("__fsrc_p").alias("__pull_seq")))
        allseq = reduce(lambda a, b: a.unionByName(b), pull_seqs).distinct()
        fix_frames.append(hist.join(
            allseq, F.col("seq") == F.col("__pull_seq"), "leftsemi"))
    out = reduce(
        lambda a, b: a.unionByName(b.select(*tail.columns)),
        [tail, *fix_frames],
    )
    return out.dropDuplicates(["seq"])


def _feature_by_name(engine, name: str):
    for c in engine.features:
        if c.name == name:
            return c
    raise ValueError(
        f"snapshot carries offsets for feature {name!r} which the engine "
        "does not define — config drift between snapshot and fold"
    )


def _entity_out_col(scope: str):
    """The training-matrix output column holding a plain scope's entity."""
    return {
        "item": F.col("item_id"),
        "user": F.col("user_id"),
        "session": F.col("session_id"),
        "ranking": F.col("ranking_id"),
        "global": F.lit(GLOBAL_ENTITY),
    }[scope]


def _delta_entities(delta: DataFrame, scope: str) -> DataFrame | None:
    """The entities a delta's rankings can read at ``scope`` — the only
    rows of the offsets table the fold needs. Derived from the (small)
    delta, so the offsets join prunes to delta-entity size instead of
    shuffling per-entity state for EVERY entity ever seen (which grows
    with corpus age even when the delta doesn't)."""
    rk = delta.filter(F.col("event_type") == "ranking")
    if scope == "item":
        ent = F.explode(F.transform(F.col("items"), lambda x: x["id"]))
    elif scope == "user":
        ent = F.col("user_id")
    elif scope == "session":
        ent = F.col("session_id")
    elif scope == "ranking":
        ent = F.col("event_id")
    else:  # global: a single row, nothing to prune
        return None
    return rk.select(ent.alias("entity")).distinct()


def _counter_offsets(
    hist: DataFrame, tail: DataFrame, engine, t0_ms: int,
    commit_at_expiry: bool, max_session_ms: int,
) -> dict[str, DataFrame]:
    """Per lifetime-counter feature: matching-write count at commit ≤ t0
    in the full history MINUS the same count over the retained tail — the
    constant the replayed running count is short by, for every read after
    the cut."""
    ics = [c for c in engine.features if isinstance(c, InteractionCount)]
    if not ics:
        return {}
    needs_inject = any(c.interaction == "impression" for c in ics)
    if needs_inject:
        full = inject_impressions(hist, commit_at_expiry, max_session_ms)
        part = inject_impressions(tail, commit_at_expiry, max_session_ms)
    else:
        full, part = hist, tail
    out: dict[str, DataFrame] = {}
    for cfg in ics:
        fs = _parse_field_scope(cfg.scope)

        def counts(df, cfg=cfg, fs=fs):
            if fs:
                # derived-entity counts: the tail side re-derives the
                # same entities as full history (as-of fix-up), so the
                # per-entity diff is exact
                w = engine._field_scoped_writes(df, cfg.interaction, *fs)
                return (
                    w.filter(F.col("ts_ms") <= t0_ms)
                    .groupBy("entity")
                    .agg(F.count(F.lit(1)).alias("n"))
                )
            return (
                df.filter(
                    (F.col("event_type") == "interaction")
                    & (F.col("interaction_type") == cfg.interaction)
                    & (F.col("ts_ms") <= t0_ms)
                )
                .groupBy(_entity_col(cfg.scope).alias("entity"))
                .agg(F.count(F.lit(1)).alias("n"))
            )
        diff = (
            counts(full).alias("f")
            .join(counts(part).alias("p"), "entity", "left")
            .select(
                "entity",
                (F.col("f.n") - F.coalesce(F.col("p.n"), F.lit(0)))
                .alias("offset"),
            )
            .filter(F.col("offset") != 0)
        )
        out[cfg.name] = diff
    return out


def snapshot(
    events: DataFrame,
    t0_ms: int,
    engine,
    max_session_ms: int = MAX_SESSION_MS,
    commit_at_expiry: bool = True,
) -> IncrementalSnapshot:
    """One pass over history (this IS the checkpoint operation): build the
    bounded retained event set + counter offsets that make
    ``incremental_training_matrix`` bit-identical to a full replay for
    every ranking after ``t0_ms``."""
    horizon = history_horizon_ms(engine, max_session_ms)
    hist = events.filter(F.col("ts_ms") <= t0_ms)
    recent = hist.filter(F.col("ts_ms") > t0_ms - horizon)

    frames = [recent]
    frames += [f.select(*recent.columns) for f in
               _retention_frames(hist, engine, horizon)]
    kept = reduce(
        lambda a, b: a.unionByName(b.select(*a.columns)), frames
    )

    # Impression-windowed features read the INJECTED stream; their
    # pre-cut state is reproduced by pulling the clickthroughs whose
    # injected impressions sit inside each entity's last impression
    # window — replay injection then regenerates exactly those writes.
    imp_ranking_ids = None
    imp_feats = _impression_window_feats(engine)
    imp_pools = [
        cfg for cfg in engine.features
        if isinstance(cfg, (RecentItems, InteractedWith))
        and cfg.interaction == "impression"
    ]
    # TTL'd impression counters: freshness needs the entity's LAST
    # impression write reproduced at replay — pull its generating
    # clickthrough (a count=1 pool pull per scope)
    imp_ttl_scopes = sorted({
        cfg.scope for cfg in engine.features
        if isinstance(cfg, InteractionCount)
        and cfg.interaction == "impression" and cfg.ttl_ms
    })
    imp_field_pulls: list[DataFrame] = []
    if imp_feats or imp_pools or imp_ttl_scopes:
        inj = inject_impressions(hist, commit_at_expiry, max_session_ms)
        imps = inj.filter(F.col("interaction_type") == "impression")

        def inj_derived(fs):
            return engine._field_scoped_writes(
                inj, "impression", *fs, keep_src=True)

        def inj_field_events(picked):
            # __fseq on the injected stream is the matched item event's
            # DOUBLED raw seq — resolve back to raw hist rows
            seqs = picked.filter(F.col("__fseq").isNotNull()).select(
                (F.col("__fseq") / 2).cast("long").alias("__pull_seq"))
            return hist.join(
                seqs.distinct(),
                F.col("seq") == F.col("__pull_seq"), "leftsemi")

        id_frames = []
        for periods, bucket_ms, scope in imp_feats:
            fs = _parse_field_scope(scope)
            if fs:
                ctx = _window_context_keyed(
                    inj_derived(fs).withColumn("__ent", F.col("entity")),
                    periods, bucket_ms)
                id_frames.append(ctx.select("ranking_id"))
                imp_field_pulls.append(inj_field_events(ctx))
            else:
                id_frames.append(
                    _window_context(imps, scope, periods, bucket_ms)
                    .select("ranking_id"))
        for cfg in imp_pools:
            keyed = imps.withColumn("__ent", _entity_col(cfg.scope))
            id_frames.append(
                _last_k_per_key(keyed, ["__ent"], cfg.count, horizon)
                .select("ranking_id")
            )
        for scope in imp_ttl_scopes:
            fs = _parse_field_scope(scope)
            if fs:
                lw = _last_k_per_key(
                    inj_derived(fs).withColumn("__ent", F.col("entity")),
                    ["__ent"], 1, horizon)
                id_frames.append(lw.select("ranking_id"))
                imp_field_pulls.append(inj_field_events(lw))
            else:
                keyed = imps.withColumn("__ent", _entity_col(scope))
                id_frames.append(
                    _last_k_per_key(keyed, ["__ent"], 1, horizon)
                    .select("ranking_id")
                )
        imp_ranking_ids = reduce(
            lambda a, b: a.unionByName(b), id_frames
        ).distinct()

    # Completion closure: every clickthrough touched by a kept
    # interaction (or an impression-context pull) enters the tail WHOLE —
    # the ranking event and ALL its interactions — so replay injection
    # reproduces the full run's max_pos and commit time for it. One pass
    # closes the set: pulled interactions only reference already-pulled
    # rankings.
    ref_ids = kept.filter(
        (F.col("event_type") == "interaction")
        & F.col("ranking_id").isNotNull()
    ).select("ranking_id").distinct()
    if imp_ranking_ids is not None:
        ref_ids = ref_ids.unionByName(imp_ranking_ids).distinct()
    # renamed column breaks the self-join lineage ambiguity (ref_ids
    # derives from hist too)
    ref_ids = ref_ids.select(F.col("ranking_id").alias("__ref_rid"))
    rankings_h = hist.filter(F.col("event_type") == "ranking")
    pulled_rankings = rankings_h.join(
        ref_ids, F.col("event_id") == F.col("__ref_rid"), "leftsemi"
    )
    pulled_ints = hist.filter(F.col("event_type") == "interaction").join(
        ref_ids, F.col("ranking_id") == F.col("__ref_rid"), "leftsemi"
    )
    tail = (
        kept.unionByName(pulled_rankings.select(*kept.columns))
        .unionByName(pulled_ints.select(*kept.columns))
        .dropDuplicates(["seq"])
    )
    for f in imp_field_pulls:
        # item events backing injected-leg as-of hops (no closure impact)
        tail = tail.unionByName(f.select(*kept.columns))
    if imp_field_pulls:
        tail = tail.dropDuplicates(["seq"])
    tail = _field_asof_fixup(
        hist, tail, engine, commit_at_expiry, max_session_ms)
    offsets = _counter_offsets(
        hist, tail, engine, t0_ms, commit_at_expiry, max_session_ms)
    return IncrementalSnapshot(
        t0_ms, horizon, tail, offsets, commit_at_expiry,
        engine_fingerprint(engine, max_session_ms))


def roll_snapshot(
    snap: IncrementalSnapshot,
    delta_events: DataFrame,
    t1_ms: int,
    engine,
    max_session_ms: int = MAX_SESSION_MS,
) -> IncrementalSnapshot:
    """Advance a snapshot to a later cut WITHOUT rescanning full history —
    the daily production loop: after the first checkpoint, every
    subsequent day is snapshot-roll + delta-fold, both O(delta + horizon).

    Correctness: every retention rule's support set is preserved by the
    previous tail — last-K pools keep the true last K (older rows can't
    displace them), window context keeps everything in the entity's
    last-anchored window (a new last bucket only moves the window
    FORWARD), scalars keep the last write, and the completion closure
    keeps clickthroughs whole — so ``snapshot(tail ∪ delta, t1)`` equals
    ``snapshot(full, t1)`` except its counter offsets are missing exactly
    the events the previous snapshot already folded away, i.e. the
    previous offsets. Fold them back in by entity-wise sum.
    Property-tested transitive-equal to a from-scratch snapshot
    (tests/test_incremental.py::test_roll_equals_fresh)."""
    if t1_ms <= snap.t0_ms:
        raise ValueError(f"roll target {t1_ms} must exceed cut {snap.t0_ms}")
    _check_fingerprint(snap, engine, max_session_ms, "roll_snapshot")
    # The previous tail is itself a ~20-frame union/join tree; the new
    # snapshot references its stream once per retention rule, so rolling
    # on the raw lineage squares the plan tree (Catalyst walks trees, not
    # DAGs — the same blowup the attach path hit). Truncate at the roll
    # boundary: production rolls read the tail back from parquet anyway
    # (save_snapshot/load_snapshot), this is the in-memory equivalent.
    tail = snap.tail.localCheckpoint(eager=True)
    # defensive cut: rows ≤ t0 are already represented by the tail (or
    # were deliberately dropped by it) — a caller passing the full event
    # table must not double-count them
    delta = delta_events.filter(F.col("ts_ms") > snap.t0_ms)
    stream = tail.unionByName(delta.select(*tail.columns))
    new = snapshot(stream, t1_ms, engine, max_session_ms,
                   snap.commit_at_expiry)
    # engine drift between roll steps (a counter removed from the config)
    # would silently drop its accumulated offsets — same failure class the
    # fingerprint catches, kept as a second line for pre-fingerprint snaps
    dropped = sorted(set(snap.offsets) - set(new.offsets))
    if dropped:
        raise ValueError(
            f"roll_snapshot: prior snapshot carries offsets for "
            f"{dropped} but the engine no longer defines these "
            "InteractionCount features — config drift between rolls"
        )
    merged: dict[str, DataFrame] = {}
    for name in new.offsets:
        prev = snap.offsets.get(name)
        if prev is None:
            merged[name] = new.offsets[name]
            continue
        a = prev.select("entity", F.col("offset").alias("__o1"))
        b = new.offsets[name].select("entity", F.col("offset").alias("__o2"))
        merged[name] = (
            a.join(b, "entity", "full")
            .select(
                "entity",
                (F.coalesce(F.col("__o1"), F.lit(0))
                 + F.coalesce(F.col("__o2"), F.lit(0))).alias("offset"),
            )
            .filter(F.col("offset") != 0)
        )
    return IncrementalSnapshot(
        t1_ms, new.horizon_ms, new.tail, merged, snap.commit_at_expiry,
        new.fingerprint)


def incremental_training_matrix(
    snap: IncrementalSnapshot,
    delta_events: DataFrame,
    engine,
    **training_kwargs,
) -> DataFrame:
    """The training matrix for rankings after the cut, folding only
    tail ∪ delta through the UNCHANGED engine, then adding the counter
    offsets. Equals ``training_matrix(full_events, engine)`` filtered to
    ``ts_ms > t0`` (tests/test_incremental.py property suite)."""
    training_kwargs.setdefault("commit_at_expiry", snap.commit_at_expiry)
    _check_fingerprint(
        snap, engine,
        training_kwargs.get("max_session_ms", MAX_SESSION_MS),
        "incremental_training_matrix")
    # defensive cut (mirrors roll_snapshot's): rows ≤ t0 are already
    # represented by the tail — a caller passing the full event table
    # instead of the delta must not double-count them
    delta_events = delta_events.filter(F.col("ts_ms") > snap.t0_ms)
    stream = snap.tail.unionByName(
        delta_events.select(*snap.tail.columns)
    )
    out = training_matrix(stream, engine, **training_kwargs).filter(
        F.col("ts_ms") > snap.t0_ms
    )
    for name, off in snap.offsets.items():
        cfg = _feature_by_name(engine, name)
        fs = _parse_field_scope(cfg.scope)
        if fs is None:
            ents = _delta_entities(delta_events, cfg.scope)
            if ents is not None:
                # delta-entity semi-join: AQE broadcasts the small delta
                # dim, so the (entity-cardinality-sized) offsets frame is
                # scanned once and never shuffled
                off = off.join(ents, "entity", "leftsemi")
        # field scopes skip pruning: the readable entities are derived
        # values, not a static column of the delta
        renamed = off.select(
            F.col("entity").alias(f"__off_ent_{name}"),
            F.col("offset").alias(f"__off_{name}"),
        )
        off_val = F.coalesce(F.col(f"__off_{name}"), F.lit(0))
        if cfg.ttl_ms:
            # TTL gate: retention keeps the entity's true last write, so
            # the replayed TTL-masked value is positive exactly where the
            # full run's key is fresh (module docstring); where it reads
            # 0.0 the key is expired in BOTH runs and the offset must not
            # resurrect it
            off_val = F.when(F.col(name) > 0, off_val).otherwise(F.lit(0))
        if fs is None:
            row_ent = _entity_out_col(cfg.scope)
        else:
            # re-derive each output row's field-scoped entity, exactly as
            # the engine's read side does (_asof_field_series): the
            # item's field value as-of the ranking for the item head, the
            # ranking's own field + item id for the ranking head
            head, fld = fs
            if head == "item":
                fv = engine._field_value_series(stream, fld)
                fv2 = fv.select(
                    "item_id", "ts_ms",
                    (F.col("seq") * 2).alias("seq"), "fval")
                der = asof_join(
                    out.select(
                        "ranking_id", "position", "item_id",
                        "ts_ms", "seq"),
                    fv2, on="item_id", left_seq="seq", right_seq="seq",
                    values=["fval"], strict=True, suffix="_oe",
                ).select(
                    "ranking_id", "position",
                    F.col("fval_oe").alias("__row_ent"))
                out = out.join(der, ["ranking_id", "position"], "left")
            else:
                rk = stream.filter(
                    F.col("event_type") == "ranking"
                ).select(
                    F.col("event_id").alias("ranking_id"),
                    F.col("str_fields").getItem(fld).getItem(0)
                    .alias("__rk_fval"),
                )
                out = out.join(rk, "ranking_id", "left").withColumn(
                    "__row_ent",
                    F.when(
                        F.col("__rk_fval").isNotNull(),
                        F.concat(
                            F.col("__rk_fval"), F.lit(FIELD_SCOPE_SEP),
                            F.col("item_id")),
                    ),
                ).drop("__rk_fval")
            row_ent = F.col("__row_ent")
        out = (
            out.join(
                renamed,
                row_ent == F.col(f"__off_ent_{name}"),
                "left",
            )
            .withColumn(name, F.col(name) + off_val)
            .drop(f"__off_ent_{name}", f"__off_{name}", "__row_ent")
        )
    return out


def save_snapshot(snap: IncrementalSnapshot, path: str) -> None:
    """Persist to a directory: tail + offsets as parquet, meta as JSON.
    The descriptor goes through the Hadoop FS API (same as the export
    job's dataset.json) so ``path`` works on any supported filesystem —
    hdfs://, s3a://, file: — not just the driver's local disk.

    Writes go to a temp sibling first and swap in at the end: the daily
    roll loop saves the NEW snapshot whose offsets/tail still lazily
    READ the previous snapshot at this same path (roll_snapshot only
    checkpoints the tail) — overwriting in place would delete the
    parquet files mid-scan (FAILED_READ_FILE). The swap also means a
    crashed save leaves the previous snapshot intact."""
    spark = snap.tail.sparkSession
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    final = jvm.org.apache.hadoop.fs.Path(path)
    fs = final.getFileSystem(hconf)
    tmp = jvm.org.apache.hadoop.fs.Path(
        path.rstrip("/") + f".__tmp_{snap.t0_ms}")
    fs.delete(tmp, True)
    tmp_s = tmp.toString()
    snap.tail.write.mode("overwrite").parquet(os.path.join(tmp_s, "tail"))
    for name, off in snap.offsets.items():
        off.write.mode("overwrite").parquet(
            os.path.join(tmp_s, "offsets", name))
    meta = {
        "t0_ms": snap.t0_ms,
        "horizon_ms": snap.horizon_ms,
        "offsets": sorted(snap.offsets),
        "commit_at_expiry": snap.commit_at_expiry,
        "fingerprint": snap.fingerprint,
    }
    jpath = jvm.org.apache.hadoop.fs.Path(os.path.join(tmp_s, "snapshot.json"))
    stream = fs.create(jpath, True)
    try:
        stream.write(bytearray(json.dumps(meta, indent=2).encode("utf-8")))
    finally:
        stream.close()
    fs.delete(final, True)
    if not fs.rename(tmp, final):
        raise IOError(f"save_snapshot: rename {tmp_s} -> {path} failed")


def load_snapshot(spark: SparkSession, path: str) -> IncrementalSnapshot:
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(os.path.join(path, "snapshot.json"))
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(jpath)
    try:
        # snapshot.json is a few hundred bytes; commons-io (shipped with
        # Spark) drains it JVM-side — py4j cannot mutate a Python
        # bytearray through stream.read(byte[])
        raw = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    meta = json.loads(bytes(raw).decode("utf-8"))
    tail = spark.read.parquet(os.path.join(path, "tail"))
    offsets = {
        name: spark.read.parquet(os.path.join(path, "offsets", name))
        for name in meta["offsets"]
    }
    return IncrementalSnapshot(
        meta["t0_ms"], meta["horizon_ms"], tail, offsets,
        meta.get("commit_at_expiry", True), meta.get("fingerprint"))
