"""Clickthrough assembly: ranking↔interaction join, impression injection,
and the training-matrix export — the batch restatement of TrainBuffer +
ImpressionInject + ClickthroughQuery.

Reference semantics:
- A clickthrough = a ranking plus the interactions foreign-keyed to it
  (flow/TrainBuffer.scala:80-125); clickthroughs with no interactions are
  not flushed to the train store (TrainBuffer.scala:127-137 filter).
- ImpressionInject (flow/ImpressionInject.scala:16-41): for each flushed
  clickthrough, emit synthetic `impression` InteractionEvents for items
  [0 .. max interacted position], carrying the RANKING's id, ts, user and
  session.
- Ordering: the reference commits injected impressions when the session
  buffer flushes — expireAfterWrite(maxSessionLength) on an event-time
  ticker reset by every put (TrainBuffer.scala:160-167), i.e. visibility
  starts at last_interaction.ts + maxSessionLength — while stamping them
  with the RANKING's ts: a deliberate bounded out-of-order write
  (SURVEY.md §3.1 item 3). The default here is the faithful
  commit-at-expiry: injected rows take their COMMIT position
  (ts_ms = last_interaction + max_session_ms, the merged scan's ordering
  key) and carry the ranking's ts as their VALUE timestamp (`vts_ms`,
  consumed by engine._with_vts for bucket placement and list entries).
  A later same-session ranking inside the expiry window therefore does
  NOT see the impressions — exactly like a live reference run, and
  exactly like the streaming twin
  (streaming/pipeline.streaming_clickthrough_expiry).
  ``commit_at_expiry=False`` keeps the earlier commit-at-completion
  ordering (injected rows sort right after the clickthrough's last real
  interaction) for pipelines that want read-your-session-writes.

Plan shape: one equi-join interactions→rankings on ranking_id (broadcastable
when rankings-per-partition are small; AQE picks the strategy), one groupBy
per ranking, one posexplode. No windows, no skew beyond ranking_id
cardinality (bounded: items-per-ranking ≤ ~100s).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metarank_spark.events import EVENT_SCHEMA


def clickthroughs(events: DataFrame) -> DataFrame:
    """One row per ranking with its attached interactions
    (Clickthrough, model/Clickthrough.scala:9-21). Only rankings with ≥1
    interaction (TrainBuffer.scala:127-137)."""
    rankings = events.filter(F.col("event_type") == "ranking").select(
        F.col("event_id").alias("ranking_id"),
        "ts_ms", "seq", "user_id", "session_id", "items",
        # the ranking event's own fields — model selectors route on them
        # (selectors.FieldSelector, Selector.scala:35-41)
        "str_fields",
    )
    ints = events.filter(
        (F.col("event_type") == "interaction") & F.col("ranking_id").isNotNull()
    ).select(
        "ranking_id",
        F.struct(
            F.col("item_id").alias("item"),
            F.col("interaction_type").alias("type"),
            F.col("ts_ms").alias("ts"),
            F.col("seq").alias("seq"),
        ).alias("inter"),
    )
    agg = ints.groupBy("ranking_id").agg(
        F.sort_array(F.collect_list("inter")).alias("interactions"),
        F.max(F.col("inter.seq")).alias("last_int_seq"),
        F.max(F.col("inter.ts")).alias("last_int_ts"),
    )
    return rankings.join(agg, "ranking_id", "inner")


MAX_SESSION_MS = 30 * 60 * 1000  # ClickthroughJoinConfig.maxSessionLength


def inject_impressions(
    events: DataFrame,
    commit_at_expiry: bool = True,
    max_session_ms: int = MAX_SESSION_MS,
) -> DataFrame:
    """Append synthetic impression interactions per ImpressionInject
    semantics and return the re-sequenced event stream (original seq → 2n;
    injected seq → 2*last_interaction_seq+1).

    commit_at_expiry=True (default, reference-faithful): injected rows'
    ORDER position is the buffer eviction time — ts_ms =
    last_interaction.ts + max_session_ms — while their VALUE timestamp
    (`vts_ms` column, null on real events) stays the ranking's ts, so
    periodic counters bucket them into the ranking's bucket but no read
    inside the still-open session sees them. False: they sort immediately
    after the clickthrough's last real interaction (commit-at-completion).
    """
    cts = clickthroughs(events)
    item_ids = F.transform(F.col("items"), lambda x: x["id"])
    # 1-based positions of interacted items present in the ranking
    positions = F.filter(
        F.transform(
            F.col("interactions"), lambda i: F.array_position(item_ids, i["item"])
        ),
        lambda p: p > 0,
    )
    max_pos = F.array_max(positions)  # null if no interacted item is in the list
    if commit_at_expiry:
        # commit position = eviction time; value ts = the ranking's ts.
        # only this mode emits the vts_ms column: downstream the engine
        # pays the anchor-exact periodic machinery only for streams that
        # actually carry late writes
        commit_ts = F.col("last_int_ts") + F.lit(max_session_ms)
        vts_cols = [F.col("ts_ms").alias("vts_ms")]
    else:
        commit_ts = F.col("ts_ms")
        vts_cols = []
    injected = (
        cts.withColumn("max_pos", max_pos)
        .filter(F.col("max_pos").isNotNull())
        .select(
            F.col("ranking_id").alias("event_id"),
            F.lit("interaction").alias("event_type"),
            commit_ts.alias("ts_ms"),
            (F.col("last_int_seq") * 2 + 1).alias("seq"),
            *vts_cols,
            F.explode(F.slice(item_ids, 1, F.col("max_pos"))).alias("item_id"),
            F.col("user_id"),
            F.col("session_id"),
            F.col("ranking_id"),
            F.lit("impression").alias("interaction_type"),
            F.lit(None).cast(EVENT_SCHEMA["items"].dataType).alias("items"),
            F.lit(None).cast(EVENT_SCHEMA["str_fields"].dataType).alias("str_fields"),
            F.lit(None).cast(EVENT_SCHEMA["num_fields"].dataType).alias("num_fields"),
            F.lit(None).cast(EVENT_SCHEMA["numlist_fields"].dataType).alias("numlist_fields"),
        )
    )
    orig = events.withColumn("seq", F.col("seq") * 2)
    if commit_at_expiry:
        orig = orig.withColumn("vts_ms", F.lit(None).cast("long"))
    return orig.unionByName(injected.select(orig.columns))


_SHAPED_NODES = re.compile(
    r"^[\s:+-]*'?(Union|Join|Aggregate|Window|Generate|Expand|"
    r"Intersect|Except|Distinct)\b")


def _is_shaped(df: DataFrame) -> bool:
    """True when the frame's analyzed plan contains a node class whose
    subtree is expensive for Catalyst to re-optimize per reference."""
    plan = df._jdf.queryExecution().analyzed().toString()
    return any(_SHAPED_NODES.match(ln) for ln in plan.splitlines())


def training_matrix(
    events: DataFrame,
    engine,
    interaction_weights: dict[str, float] | None = None,
    inject: bool = True,
    ranking_pred=None,
    series=None,
    commit_at_expiry: bool = True,
    max_session_ms: int = MAX_SESSION_MS,
    events_barrier: bool | str = "auto",
) -> DataFrame:
    """ClickthroughValues-equivalent table: per (ranking, position, item)
    feature columns + label from interaction weights
    (flow/ClickthroughQuery.scala:9-74; labels via weights, default
    click=1.0, non-interacted=0.0). The allclose parity surface.

    ``series``: pre-materialized write-value series per scope group
    (engine.write_series over the SAME injected stream) — two-phase
    backfill's assembly-only path.

    ``events_barrier``: the engine references ``events`` once per feature
    leg, and Catalyst re-copies (and re-optimizes) the input subtree at
    every reference — a SHAPED input (unions, joins, aggregations,
    generators) multiplies its own optimization cost by the feature
    count (a 21-feature config over a 3-way-union generator measured
    230 s of pure planning vs 7 s over a flat input). ``"auto"``
    (default) inserts a lazy ``localCheckpoint`` barrier only when the
    input's analyzed plan contains a multi-child or aggregating node;
    a bare scan lineage stays intact so filter/column pushdown still
    reaches the files. ``True``/``False`` force either way."""
    weights = interaction_weights or {"click": 1.0}
    if events_barrier == "auto":
        events_barrier = _is_shaped(events)
    if events_barrier:
        events = events.localCheckpoint(eager=False)
    stream = (
        inject_impressions(events, commit_at_expiry, max_session_ms)
        if inject else events
    )
    values = engine.ranking_values(stream, ranking_pred=ranking_pred, series=series)

    ints = events.filter(
        (F.col("event_type") == "interaction") & F.col("ranking_id").isNotNull()
    ).select(
        "ranking_id",
        F.col("item_id"),
        F.col("interaction_type"),
    )
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    labels = ints.groupBy("ranking_id", "item_id").agg(
        F.max(
            F.coalesce(F.element_at(wmap, F.col("interaction_type")), F.lit(0.0))
        ).alias("label")
    )
    out = values.join(labels, ["ranking_id", "item_id"], "left")
    # explicit judgment labels on the ranking's items win over
    # interaction-weight labels (ClickthroughQuery.scala:20-24: a
    # TypedInteraction with Some(rel) — produced by
    # explicitLabelInteractions — takes precedence)
    return out.withColumn(
        "label",
        F.coalesce(F.col("item_label").cast("double"), F.col("label"), F.lit(0.0)),
    )
