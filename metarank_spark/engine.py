"""FeatureEngine — config-driven Metarank feature pipeline on Spark.

Semantics contract (golden-tested in tests/test_engine_goldens.py against
fixtures transcribed from the reference's own unit tests):

- Every feature is an *event-sourced series*: writes happen at events, and
  the value emitted at a write includes that write
  (flow/FeatureValueFlow.scala:29-42: commit precedes computeValue).
- A ranking's snapshot reads each feature as-of STRICTLY BEFORE the ranking
  (ts, seq) (flow/MetarankFlow.scala:31-55, flow/TrainBuffer.scala:51-71) —
  zero temporal leakage, same-timestamp interactions excluded
  (e2e proof: RanklensTest.scala:95-100).
- Key reduction: because state changes only at writes, the value read at
  any time T equals the value emitted at the last write < T. This turns
  every "anchor-at-last-bucket" periodic read (model/Feature.scala:142-161)
  into a plain as-of join against the write-time series — no custom state
  store, no Python kernel, pure Catalyst.

Plan shape per feature: one window pass over the write series (shuffle on
the scope entity) + one union-merge as-of join to the rankings (shuffle on
the same entity). All value math is JVM-side (arrays + higher-order
functions); missing values surface as NaN exactly like MValue
(model/MValue.scala:24-61), except interaction_count which reads 0.0 when
missing (InteractionCountFeature.scala:55-58) and interacted_with which
scores 0.0 (InteractedWithFeature.scala:133-164 fold starts at 0.0).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from metarank_spark.operators.merge import (
    MergedFeature,
    bucket_range_window,
    entity_rows_window,
    masked,
    run_merged,
)
from metarank_spark.plans.asof import asof_join

DAY_MS = 86_400_000
GLOBAL_ENTITY = "$global"
# default time-chunk for decomposing the $global timeline's folds (one
# hour: bounds a chunk's rows at any realistic event rate while keeping
# the chunk-totals carry frame small); deployments tune via hot_chunk_ms
GLOBAL_CHUNK_MS = 3_600_000
ORDER = ("ts_ms", "seq")
SAMPLE_MOD = 1_000_003


def _with_vts(events: DataFrame) -> DataFrame:
    """Commit-ts / value-ts split: ``(ts_ms, seq)`` is the COMMIT (stream
    processing) order everywhere; ``vts_ms`` is the event's VALUE
    timestamp — what PeriodicIncrement buckets and BoundedList entries
    are stamped with (Write.timestamp in the reference). They differ only
    for bounded-late writes such as expiry-committed injected impressions
    (flow/TrainBuffer.scala:160-167: flushed at last_write +
    maxSessionLength while stamped with the ranking's ts). For every
    normal event vts == ts and all plans are unchanged.

    Exactness contract for periodic counters: lateness must be bounded by
    ``min(periods) * bucket_ms`` (a 30-min session against daily buckets
    and periods >= 1 satisfies it by a wide margin) — see the anchor
    carry in _periodic_vec."""
    if "vts_ms" in events.columns:
        return events.withColumn("vts_ms", F.coalesce("vts_ms", "ts_ms"))
    return events.withColumn("vts_ms", F.col("ts_ms"))


def sample_accept_expr(rate: float, event_id: str = "event_id"):
    """Deterministic analog of Feature.scala:249 shouldSample
    (Random.nextDouble() <= rate): accept a write iff
    rolling-hash(event_id) mod M < rate*M. Hash-based instead of RNG so
    backfills, replays, and the brute-force oracle all agree bit-for-bit.
    The char fold matches functions/text.token_id_expr: (acc*31 + ascii)
    mod 1_000_003."""
    h = F.aggregate(
        F.split(F.col(event_id), ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % SAMPLE_MOD,
    )
    return h < F.lit(int(rate * SAMPLE_MOD))


# --------------------------------------------------------------------------
# feature configs (YAML-equivalent; registry model/FeatureSchema.scala:44-75)
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class WindowCount:
    """window_count (WindowInteractionCountFeature.scala:22-66).

    ``ttl_ms``: state expiry (model/Feature.scala:41-55, default 90d in
    the reference; None = never expire here) — a carried value whose last
    write is older than ttl at read time reads as missing, mirroring the
    live store's key expiry. Same field on every stateful config below.
    """
    name: str
    interaction: str
    periods: tuple[int, ...]
    bucket_ms: int = DAY_MS
    scope: str = "item"
    ttl_ms: int | None = None


@dataclass(frozen=True)
class InteractionCount:
    """interaction_count (InteractionCountFeature.scala)."""
    name: str
    interaction: str
    scope: str = "item"
    ttl_ms: int | None = None


@dataclass(frozen=True)
class Rate:
    """rate, optionally normalized (RateFeature.scala:51-355)."""
    name: str
    top: str
    bottom: str
    periods: tuple[int, ...]
    bucket_ms: int = DAY_MS
    scope: str = "item"
    normalize_weight: float | None = None
    ttl_ms: int | None = None


@dataclass(frozen=True)
class Number:
    """number (NumberFeature.scala): last numeric field value."""
    name: str
    field: str
    source: str = "item"
    ttl_ms: int | None = None


@dataclass(frozen=True)
class Boolean:
    """boolean (BooleanFeature.scala): last boolean field as 0/1."""
    name: str
    field: str
    source: str = "item"
    ttl_ms: int | None = None


@dataclass(frozen=True)
class StringEncode:
    """string (StringFeature.scala:52-138): index (0=missing, i+1 of the
    list head) or onehot (1.0 at EVERY list value) encode of the last
    string-list field. source='ranking' reads the ranking event's own
    field as a per-ranking constant."""
    name: str
    field: str
    values: tuple[str, ...]
    encode: str = "index"  # index | onehot
    source: str = "item"
    ttl_ms: int | None = None


@dataclass(frozen=True)
class ItemAge:
    """item_age (ItemAgeFeature.scala:41-84): (ranking.ts - last item
    update ts)/1000 seconds."""
    name: str
    ttl_ms: int | None = None


@dataclass(frozen=True)
class WordCount:
    """word_count (WordCountFeature.scala:47-74): whitespace token count of
    the last string field value."""
    name: str
    field: str
    source: str = "item"
    ttl_ms: int | None = None


@dataclass(frozen=True)
class Relevancy:
    """relevancy (RelevancyFeature.scala:24-48): per-item ranking field."""
    name: str


@dataclass(frozen=True)
class Position:
    """position (PositionFeature.scala:30-35): item index at offline
    training, the configured constant at online inference (the de-biasing
    trick: train with the real position, score every candidate at the
    same fixed slot)."""
    name: str
    position: int = 0


@dataclass(frozen=True)
class RandomFeature:
    """random (RandomFeature.scala:34): uniform noise column — excluded
    from golden/allclose checks like the reference's own tests exclude it;
    seedable for reproducible training runs."""
    name: str
    seed: int | None = None


@dataclass(frozen=True)
class LocalTime:
    """local_time (LocalDateTimeFeature.scala:25-55): calendar component
    of the ranking timestamp (UTC) or of an ISO datetime STRING carried
    in a ranking field (``source`` = the field name; the value's own
    offset defines its local calendar, exactly ZonedDateTime.parse).
    parts: time_of_day | day_of_week | month_of_year | year | hour |
    minute | second."""
    name: str
    part: str = "time_of_day"
    source: str = "timestamp"  # 'timestamp' | ranking field holding ISO text


@dataclass(frozen=True)
class Vector:
    """vector (NumVectorFeature.scala): reduce the item's last numeric-list
    field. Default reducers mirror :28 — (min, max, size, avg)."""
    name: str
    field: str
    reducers: tuple[str, ...] = ("min", "max", "size", "avg")
    source: str = "item"
    ttl_ms: int | None = None


@dataclass(frozen=True)
class Stats:
    """StatsEstimator primitive (model/Feature.scala:213-234): min/max +
    exact percentiles over a bounded pool of the last ``pool`` numeric
    samples from interactions. ``sample_rate`` < 1 drops writes before
    they reach the pool (Feature.scala:249 shouldSample), here as a
    deterministic event-id hash so replays/backfills reproduce."""
    name: str
    field: str
    pool: int = 100
    percentiles: tuple[int, ...] = (50, 90)
    scope: str = "item"
    sample_rate: float = 1.0
    ttl_ms: int | None = None


@dataclass(frozen=True)
class Freq:
    """FreqEstimator primitive (model/Feature.scala:112-126): relative
    frequency map over the last ``pool`` string samples. ``sample_rate``
    as in Stats (deterministic hash-accept analog of Feature.scala:249)."""
    name: str
    field: str
    pool: int = 100
    scope: str = "item"
    sample_rate: float = 1.0
    ttl_ms: int | None = None


@dataclass(frozen=True)
class RecentItems:
    """BoundedList primitive surfaced as a feature: the visitor's recent
    interacted item ids, newest first (MemBoundedList.scala:18-37)."""
    name: str
    interaction: str
    count: int = 10
    duration_ms: int = DAY_MS
    scope: str = "session"
    ttl_ms: int | None = None


@dataclass(frozen=True)
class Diversity:
    """diversity (DiversityFeature.scala): numeric → candidate value minus
    the median over the ranking's first ``top_n`` items (:118-130);
    string → share of the candidate's values in the ranking's value
    histogram (:105-117)."""
    name: str
    field: str
    kind: str = "numeric"  # numeric | string
    top_n: int = 10


@dataclass(frozen=True)
class MapFeature:
    """MapFeature primitive (MemMapFeature.scala:12-24): PutTuple upserts
    into a per-entity map; the snapshot is the latest value per map key
    strictly before the ranking. key/value come from interaction fields."""
    name: str
    key_field: str
    value_field: str
    scope: str = "user"


@dataclass(frozen=True)
class InteractedWith:
    """interacted_with (InteractedWithFeature.scala:44-164)."""
    name: str
    interaction: str
    fields: tuple[str, ...]
    scope: str = "session"
    count: int = 100
    duration_ms: int = DAY_MS


@dataclass(frozen=True)
class UserAgent:
    """ua (UserAgentFeature.scala:30-86): classify a UA string field into
    the ``mapper`` taxonomy (platform|os|browser|bot) and one-hot encode
    over its possible values. Session-scoped scalar state (the reference
    pins SessionScopeType); ANY feedback event (ranking or interaction)
    carrying the source field writes (:40-50); the ranking prefers stored
    session state and falls back to parsing its own field (:55-66)."""
    name: str
    field: str
    mapper: str = "platform"
    ttl_ms: int | None = None


@dataclass(frozen=True)
class Referer:
    """referer (RefererFeature.scala:41-113): referer URL → medium
    category index (unknown=0 search=1 internal=2 social=3 email=4
    paid=5). user|session-scoped scalar state; writes come from the
    configured source event type; a ranking with no stored state reads
    unknown=0 (:111 getOrElse)."""
    name: str
    field: str
    scope: str = "user"   # user | session
    source: str = "ranking"  # ranking | interaction | any
    ttl_ms: int | None = None


@dataclass(frozen=True, eq=True)
class FieldMatch:
    """field_match (FieldMatchFeature.scala:28-95): score the ranking's
    query field against the item's stored string field with the
    configured matcher (matcher/TermMatcher, NgramMatcher.scala:10-28,
    BM25Matcher.scala:26-40). Item-scoped scalar state: item events
    carrying ``item_field`` write; both sides tokenize with the same
    matcher at read. ``term_freq``: prebuilt TermFreq dict for bm25
    ({n_docs, avgdl, df} — functions/text.build_term_freq or the
    reference termfreq CLI artifact)."""
    name: str
    ranking_field: str
    item_field: str
    method: str = "term"  # term | ngram | bm25
    n: int = 3
    term_freq: "dict | None" = None
    ttl_ms: int | None = None

    def __hash__(self):  # dict field is unhashable; hash by identity keys
        return hash((self.name, self.ranking_field, self.item_field, self.method))


FeatureConfig = (
    WindowCount | InteractionCount | Rate | Number | Boolean | StringEncode
    | ItemAge | WordCount | Relevancy | Position | InteractedWith
)


# --------------------------------------------------------------------------
# engine
# --------------------------------------------------------------------------

# RankingFieldScope entity = field value + item id; the reference encodes
# this with explicit delimiters (Scope.scala:48-52 RankingFieldScope,
# 'irf=field:value:item'). A separator that cannot appear in ids keeps
# distinct (value, item) pairs like ('a1','2') vs ('a','12') from
# colliding into one state key.
FIELD_SCOPE_SEP = "\x01"


def _parse_field_scope(scope: str) -> tuple[str, str] | None:
    """'item.color' → ('item', 'color'), 'ranking.query' →
    ('ranking', 'query') (ScopeType.scala:38-44 itemFieldFormat /
    fieldItemFieldFormat); None for plain scopes."""
    if "." not in scope:
        return None
    head, fld = scope.split(".", 1)
    if head not in ("item", "ranking"):
        raise ValueError(
            f"field scope {scope!r} must be item.<field> or ranking.<field>"
        )
    return head, fld


def _entity_col(scope: str) -> Column:
    """Scope → state-keying entity value (model/Scope.scala:24-65)."""
    if scope == "item":
        return F.col("item_id")
    if scope == "user":
        return F.col("user_id")
    if scope == "session":
        return F.col("session_id")
    if scope == "global":
        return F.lit(GLOBAL_ENTITY)
    raise ValueError(f"unknown scope {scope}")


def _nan_array(dim: int) -> Column:
    return F.array(*[F.lit(float("nan")) for _ in range(dim)])


class FeatureEngine:
    """Computes per-(ranking, item) feature values (the ItemValue matrix,
    model/ItemValue.scala:25-72) from a canonical event table.

    ``late_types``: interaction types whose writes may carry a VALUE
    timestamp earlier than their commit position (``vts_ms != ts_ms``) —
    in the reference pipeline only ImpressionInject backdates
    (impressions committed at session expiry, stamped with the ranking's
    ts). Periodic counters pay the anchor-exact machinery ONLY for these
    types and only when the stream actually carries a ``vts_ms`` column;
    every other flag keeps the cheaper monotone formula, which is exact
    for writes stamped at commit time."""

    def __init__(self, features: list[FeatureConfig],
                 late_types: frozenset[str] = frozenset({"impression"}),
                 hot_chunk_ms: int | None = None,
                 hot_entities: "list | None" = None):
        self.features = features
        self.late_types = late_types
        self.hot_entities = list(hot_entities) if hot_entities else None
        # Hot-entity salting (the north star's "range-partitioned and
        # salted by entity key"): with hot_chunk_ms set, rows of the
        # declared hot_entities run every event-scale per-entity window
        # with (entity, floor(ts/hot_chunk_ms)) partitions and exact
        # cross-chunk reassembly (plans/prefix.py) — the merged scan's
        # as-of carry for ALL features, plus the counter and monotone
        # periodic folds — while cold entities keep the plain windows and
        # pay nothing. A hot key's timeline then spreads over
        # timeline/chunk tasks instead of pinning one. With no declared
        # set, every entity is salted (coarse key spaces). Output is
        # bit-identical in all modes (tests/test_engine_salted.py).
        # Counter, monotone periodic AND lateness-anchored folds are all
        # decomposed; only the pool features' bounded last-N frames keep
        # per-entity order (bounded sliding state, one sparse interaction
        # stream).
        self.hot_chunk_ms = hot_chunk_ms

    # ---------------- write-time series builders ----------------

    def _split_hot(self, w: DataFrame, plain_fn, salted_fn,
                   is_global: bool = False) -> DataFrame:
        """Route rows of the declared hot entities through the salted
        (chunk-partitioned, exactly-reassembled) fold and everything else
        through the plain per-entity window; with hot_chunk_ms but no
        declared set, salt every entity. Bit-identical either way.

        ``is_global``: the frame is keyed by the ``$global`` entity — a
        guaranteed hot key at ANY scale (the whole stream is one
        timeline), and a CONSTANT partition key, which Catalyst
        constant-folds into an unpartitioned single-task window. Global
        frames therefore always take the salted fold, chunked by
        ``hot_chunk_ms`` or ``GLOBAL_CHUNK_MS``."""
        if is_global:
            return salted_fn(w, self.hot_chunk_ms or GLOBAL_CHUNK_MS)
        if not self.hot_chunk_ms:
            return plain_fn(w)
        if not self.hot_entities:
            return salted_fn(w, self.hot_chunk_ms)
        is_hot = F.coalesce(
            F.col("entity").isin(self.hot_entities), F.lit(False)
        )
        return plain_fn(w.filter(~is_hot)).unionByName(
            salted_fn(w.filter(is_hot), self.hot_chunk_ms)
        )

    def _counter_fold(self, w: DataFrame,
                      is_global: bool = False) -> DataFrame:
        """Running count per entity over a (entity, ts_ms, seq) write
        frame (MemCounter.scala:13-22)."""
        from metarank_spark.operators.merge import SIDE_WRITE

        if "__side" not in w.columns:
            w = w.withColumn("__side", F.lit(SIDE_WRITE))

        def plain(df):
            run = (
                Window.partitionBy("entity")
                .orderBy(*ORDER)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            return df.select(
                "entity", "ts_ms", "seq",
                F.count(F.lit(1)).over(run).alias("cnt"),
            )

        def salted(df, chunk_ms):
            from metarank_spark.plans.prefix import salted_running_count

            return salted_running_count(
                df, "entity", ORDER, chunk_ms
            ).select("entity", "ts_ms", "seq", "cnt")

        return self._split_hot(w, plain, salted, is_global)

    def _counter_series(self, events: DataFrame, interaction: str, scope: str) -> DataFrame:
        """CounterFeature write series: running count at each matching
        interaction."""
        w = events.filter(
            (F.col("event_type") == "interaction")
            & (F.col("interaction_type") == interaction)
        ).select(_entity_col(scope).alias("entity"), "ts_ms", "seq")
        return self._counter_fold(w, is_global=(scope == "global"))

    @staticmethod
    def _monotone_period_counts(
        one: Column, bucket: Column, periods: tuple[int, ...]
    ) -> Column:
        """Per-period trailing-bucket counts for writes stamped at commit
        time (buckets monotone in the sort order): running total minus
        the older-than-window RANGE total — the cheap formula, exact when
        every write is at the state's max bucket."""
        run = entity_rows_window("entity")
        return F.array(*[
            (F.coalesce(F.sum(one).over(run), F.lit(0))
             - F.coalesce(F.sum(one).over(
                 bucket_range_window("entity", bucket, p)), F.lit(0)))
            for p in periods
        ])

    @staticmethod
    def _anchored_period_counts(
        is_write: Column, one: Column, bucket: Column,
        periods: tuple[int, ...], entity: str,
    ) -> Column:
        """Exact PeriodicCounter write-row vector under bounded-late
        writes (commit/value-ts split): element p at write i =
        #{writes j ≤ i in COMMIT order : bucket_j ∈ [A_i - p, A_i]} with
        A_i = max value-bucket committed so far — the reference's
        anchor-at-last-STATE-bucket read (model/Feature.scala:139-161
        fromMap: map.ts.last).

        Derivation: std_i = running_count - count(bucket ≤ own_bucket -
        p - 1) is exact exactly when own bucket == A_i. For a late write
        (own bucket < A_i), every write committed after the last at-max
        write m is itself within [A_i - p, A_i] (lateness ≤ p buckets),
        so the exact value is std_m + (writes since m): carry
        (std - running_count) from the last at-max write and add the
        current running count. On a monotone stream every write is
        at-max and this reduces bit-for-bit to std_i. Exactness needs
        lateness ≤ min(periods) * bucket_ms (the _with_vts contract).

        Plan shape: ``std - cnt`` algebraically collapses to ``-older``,
        and "the last at-max write" is exactly the lexicographic running
        max of ``struct(bucket, seq)`` (seq strictly increasing breaks
        bucket ties toward the latest commit), so the carry is ONE
        running ``max(struct(bucket, seq, -older...))`` instead of an
        anchor max plus one last-ignorenulls per period. The range-window
        ``older`` sums still force a second chained WindowExec (a window
        function cannot reference another in the same pass), but the
        second pass carries a single aggregate — measured ~30% off the
        expiry-mode backfill at 8 threads vs the per-period-carry
        formulation, and the overhead stops growing with thread count
        (scripts/anchor_decompose.py, scripts/expiry_paired.py)."""
        run = entity_rows_window(entity)
        cnt = F.coalesce(F.sum(one).over(run), F.lit(0))
        olders = [
            F.coalesce(
                F.sum(one).over(bucket_range_window(entity, bucket, p)), F.lit(0)
            )
            for p in periods
        ]
        carried = F.max(
            F.when(is_write, F.struct(
                bucket.alias("b"), F.col("seq").alias("s"),
                *[(-o).alias(f"o{i}") for i, o in enumerate(olders)],
            ))
        ).over(run)
        return F.array(*[
            carried.getField(f"o{i}") + cnt for i in range(len(periods))
        ])

    def _periodic_fold(
        self, w: DataFrame, periods: tuple[int, ...], bucket_ms: int,
        is_global: bool = False,
    ) -> DataFrame:
        """Per-period bucket-window vector at each write of a (entity,
        ts_ms, seq[, vts_ms]) frame — buckets use the VALUE ts, order is
        the commit order. The anchor-exact machinery runs only when the
        frame carries a vts_ms column (i.e. its writes can be late)."""
        from metarank_spark.operators.merge import SIDE_WRITE

        late = "vts_ms" in w.columns
        if late:
            bucket = F.floor(
                F.coalesce(F.col("vts_ms"), F.col("ts_ms")) / F.lit(bucket_ms)
            )
            if self.hot_chunk_ms or is_global:
                from metarank_spark.plans.prefix import (
                    salted_anchored_period_counts,
                )

                w = w.withColumn("__side", F.lit(SIDE_WRITE))

                def plain_a(df):
                    vec = self._anchored_period_counts(
                        F.lit(True), F.lit(1), bucket, periods, "entity"
                    )
                    return df.select("entity", "ts_ms", "seq", vec.alias("vec"))

                def salted_a(df, chunk_ms):
                    return salted_anchored_period_counts(
                        df, "entity", ORDER, bucket_ms, periods,
                        chunk_ms, bucket,
                    ).select("entity", "ts_ms", "seq", "vec")

                return self._split_hot(w, plain_a, salted_a, is_global)
            vec = self._anchored_period_counts(
                F.lit(True), F.lit(1), bucket, periods, "entity"
            )
        else:
            w = w.withColumn("__side", F.lit(SIDE_WRITE))

            def plain(df):
                bucket = F.floor(F.col("ts_ms") / F.lit(bucket_ms))
                vec = self._monotone_period_counts(F.lit(1), bucket, periods)
                return df.select("entity", "ts_ms", "seq", vec.alias("vec"))

            def salted(df, chunk_ms):
                # monotone streams decompose by BUCKET (the per-bucket
                # partial agg absorbs the hot key map-side) — no time
                # chunk needed
                from metarank_spark.plans.prefix import (
                    salted_monotone_period_counts,
                )

                return salted_monotone_period_counts(
                    df, "entity", ORDER, bucket_ms, periods
                ).select("entity", "ts_ms", "seq", "vec")

            return self._split_hot(w, plain, salted, is_global)
        # the shared window helpers order by (ts_ms, seq, __side); on a
        # writes-only frame the side marker is a constant
        w = w.withColumn("__side", F.lit(SIDE_WRITE))
        return w.select("entity", "ts_ms", "seq", vec.alias("vec"))

    def _periodic_series(
        self, events: DataFrame, interaction: str, scope: str,
        periods: tuple[int, ...], bucket_ms: int,
    ) -> DataFrame:
        """PeriodicCounter write series over a plain entity scope."""
        late = (
            "vts_ms" in events.columns and interaction in self.late_types
        )
        cols = ["ts_ms", "seq"] + (["vts_ms"] if late else [])
        w = events.filter(
            (F.col("event_type") == "interaction")
            & (F.col("interaction_type") == interaction)
        ).select(_entity_col(scope).alias("entity"), *cols)
        return self._periodic_fold(
            w, periods, bucket_ms, is_global=(scope == "global"))

    # ---------------- field-scoped state (Scope.scala:43-52) ----------------

    def _field_value_series(self, events: DataFrame, field: str) -> DataFrame:
        """The auxiliary `{name}_field` scalar: each item event carrying
        ``field`` puts its head value at ItemScope (RateFeature.scala
        writes(), ItemEvent branch — StringField or StringListField head).
        One shared series per field; all fields live in str_fields here."""
        head = F.col("str_fields").getItem(field).getItem(0)
        return events.filter(
            (F.col("event_type") == "item") & head.isNotNull()
        ).select("item_id", "ts_ms", "seq", head.alias("fval"))

    def _field_scoped_writes(
        self, events: DataFrame, interaction: str, head: str, field: str,
        keep_src: bool = False,
    ) -> DataFrame:
        """Interaction write stream keyed by the FIELD-derived entity.

        item.<field>: entity = the item's current field value at the
        interaction's processing time (an as-of hop against the item-field
        series — RateFeature.scala:176-217 computeValue at write).
        ranking.<field>: entity = (the interaction's ranking's field value,
        item) — RateFeature.scala:138-175 via the RankingScope put; the
        scope keeps the item id (Scope.scala:48-52 RankingFieldScope).
        Interactions whose field value is unknown write nothing (reference
        emits Nil).

        ``keep_src``: carry provenance for incremental retention — the
        interaction's ``ranking_id`` and the matched field event's seq
        (``__fseq``, null for the ranking head which has no as-of hop)."""
        vcols = (
            ["vts_ms"]
            if "vts_ms" in events.columns and interaction in self.late_types
            else []
        )
        ints = events.filter(
            (F.col("event_type") == "interaction")
            & (F.col("interaction_type") == interaction)
        ).select("item_id", "ranking_id", "ts_ms", "seq", *vcols)
        if head == "item":
            fv = self._field_value_series(events, field)
            values = ["fval"]
            if keep_src:
                fv = fv.withColumn("__fsrc", F.col("seq"))
                values = ["fval", "__fsrc"]
            j = asof_join(
                ints, fv, on="item_id",
                left_seq="seq", right_seq="seq", values=values,
                strict=True, suffix="_w",
            )
            ent = F.col("fval_w")
            fseq = F.col("__fsrc_w") if keep_src else None
        else:
            rk = events.filter(F.col("event_type") == "ranking").select(
                F.col("event_id").alias("ranking_id"),
                F.col("str_fields").getItem(field).getItem(0).alias("fval"),
            )
            j = ints.join(rk, "ranking_id", "left")
            ent = F.when(
                F.col("fval").isNotNull(),
                F.concat(F.col("fval"), F.lit(FIELD_SCOPE_SEP), F.col("item_id")),
            )
            fseq = F.lit(None).cast("long") if keep_src else None
        extra = (
            ["ranking_id", fseq.alias("__fseq")] if keep_src else []
        )
        return (
            j.select(ent.alias("entity"), "ts_ms", "seq", *vcols, *extra)
            .filter(F.col("entity").isNotNull())
        )

    def _asof_field_series(
        self, base: DataFrame, events: DataFrame, head: str, field: str,
        series: DataFrame, values: list[str], suffix: str,
    ) -> DataFrame:
        """Read a field-scoped series at each (ranking, item) row: derive
        the row's entity (item's field value as-of the ranking for
        item.<field>, the CURRENT ranking's own field + item id for
        ranking.<field> — RateFeature.scala value() targetScopeOption),
        then strict as-of against the series. Rows whose entity is unknown
        keep null values (missing state)."""
        if head == "item":
            fv = self._field_value_series(events, field)
            left = asof_join(
                base.select("ranking_id", "position", "item_id", "ts_ms", "seq"),
                fv, on="item_id",
                left_seq="seq", right_seq="seq", values=["fval"],
                strict=True, suffix="_r",
            ).withColumnRenamed("fval_r", "entity")
        else:
            fval = F.col("__rk_str").getItem(field).getItem(0)
            ent = F.when(
                fval.isNotNull(),
                F.concat(fval, F.lit(FIELD_SCOPE_SEP), F.col("item_id")),
            )
            left = base.select(
                "ranking_id", "position", "item_id", "ts_ms", "seq",
                ent.alias("entity"),
            )
        joined = asof_join(
            left, series, on="entity",
            left_seq="seq", right_seq="seq", values=values,
            strict=True, suffix=suffix,
        )
        keep = ["ranking_id", "position"] + [f"{v}{suffix}" for v in values]
        return base.join(joined.select(*keep), ["ranking_id", "position"], "left")

    def _scalar_series(
        self, events: DataFrame, source: str, value: Column, extra_filter: Column | None = None,
    ) -> DataFrame:
        """ScalarFeature write series: the written value itself; as-of join
        naturally reads last-write-wins (MemScalarFeature.scala:14-17)."""
        ent = {"item": "item_id", "user": "user_id"}[source]
        df = events.filter(F.col("event_type") == source)
        if extra_filter is not None:
            df = df.filter(extra_filter)
        return df.select(F.col(ent).alias("entity"), "ts_ms", "seq", value.alias("val")).filter(
            F.col("val").isNotNull()
        )

    def _bounded_list_series(self, events: DataFrame, cfg: InteractedWith) -> DataFrame:
        """BoundedList write series: at each matching interaction, the
        current list of visited item ids, newest first, time-filtered and
        truncated at write time (MemBoundedList.scala:18-37)."""
        vcols = ["vts_ms"] if "vts_ms" in events.columns else []
        w = events.filter(
            (F.col("event_type") == "interaction")
            & (F.col("interaction_type") == cfg.interaction)
        ).select(_entity_col(cfg.scope).alias("entity"), "ts_ms", "seq", "item_id", *vcols)
        frame = (
            Window.partitionBy("entity")
            .orderBy(*ORDER)
            .rowsBetween(-(cfg.count - 1), Window.currentRow)
        )
        vts = F.coalesce(F.col("vts_ms"), F.col("ts_ms")) if vcols else F.col("ts_ms")
        lst = F.collect_list(F.struct(vts.alias("ts"), F.col("item_id").alias("v"))).over(frame)
        lst = F.reverse(lst)  # newest first
        cutoff = vts - F.lit(cfg.duration_ms)
        kept = F.filter(lst, lambda x: x["ts"] >= cutoff)
        return w.select(
            "entity", "ts_ms", "seq",
            F.transform(kept, lambda x: x["v"]).alias("visited"),
        )

    def _field_series(self, events: DataFrame, field: str) -> DataFrame:
        """Item string-list field series (InteractedWithFeature writes,
        :68-87: Put of SStringList per item event carrying the field)."""
        return (
            events.filter(
                (F.col("event_type") == "item")
                & F.col("str_fields").getItem(field).isNotNull()
            )
            .select(
                F.col("item_id").alias("entity"), "ts_ms", "seq",
                F.col("str_fields").getItem(field).alias("vals"),
            )
        )

    def _multi_field_series(
        self, events: DataFrame, fields: tuple[str, ...]
    ) -> DataFrame:
        """Fused per-item state series: ONE frame carrying the LAST
        written value of every field at each metadata event (each field's
        value carried forward over the item's event order), equivalent to
        one ``_field_series`` per field read as-of the same seq — any
        per-field write is itself a row here, so the as-of row's carried
        value IS that field's last write before the read. One window over
        the (metadata-scale) item frame replaces len(fields) independent
        series → one as-of join instead of N on both the candidate and
        the visited-items read paths."""
        present = reduce(
            lambda a, b: a | b,
            [F.col("str_fields").getItem(f).isNotNull() for f in fields],
        )
        src = events.filter(
            (F.col("event_type") == "item") & present
        ).select(
            "item_id", "ts_ms", "seq",
            *[
                F.col("str_fields").getItem(f).alias(f"__mf_{i}")
                for i, f in enumerate(fields)
            ],
        )
        w = (
            Window.partitionBy("item_id")
            .orderBy("seq")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return src.select(
            "item_id", "ts_ms", "seq",
            *[
                F.last(F.col(f"__mf_{i}"), ignorenulls=True).over(w)
                .alias(f"__mf_{i}")
                for i in range(len(fields))
            ],
        )

    # ---------------- snapshot assembly ----------------

    def ranking_values(
        self,
        events: DataFrame,
        ranking_pred: Column | None = None,
        series: dict[str, DataFrame] | None = None,
        mode: str = "training",
    ) -> DataFrame:
        """One row per (ranking_id, position, item_id) with one column per
        feature — the offline-training feature matrix (ClickthroughValues
        parity surface, model/TrainValues.scala:13-15).

        ``ranking_pred`` restricts WHICH rankings get snapshots (e.g. one
        entity hash range of a checkpointed backfill) without truncating
        the state history — write series always see all events.

        ``series`` maps scope-group keys (write_series() keys) to
        pre-materialized write-value series; matching groups skip the
        write-side fold and run assembly only (two-phase backfill).
        Legacy-path features (interacted_with, normalized rate) always
        fold from events.

        ``mode``: 'training' (OfflineTraining) or 'inference'
        (OnlineInference) — only Position differs between the two
        (BaseFeature.ValueMode; PositionFeature.scala:30-35).
        """
        if mode not in ("training", "inference"):
            raise ValueError(f"mode must be training|inference, got {mode!r}")
        self._mode = mode
        self._has_late = "vts_ms" in events.columns
        events = _with_vts(events)
        rankings = events.filter(F.col("event_type") == "ranking").select(
            F.col("event_id").alias("ranking_id"),
            "ts_ms", "seq", "user_id", "session_id", "items",
            # the ranking event's own fields: ranking-sourced extractors
            # read these as a per-ranking constant (FieldName(Ranking, f),
            # e.g. StringFeature.scala:86-92)
            F.col("str_fields").alias("__rk_str"),
            F.col("num_fields").alias("__rk_num"),
        )
        if ranking_pred is not None:
            rankings = rankings.filter(ranking_pred)
        base = rankings.select(
            "ranking_id", "ts_ms", "seq", "user_id", "session_id",
            "__rk_str", "__rk_num",
            F.posexplode("items").alias("position", "item"),
        ).select(
            "ranking_id", "ts_ms", "seq", "user_id", "session_id", "position",
            "__rk_str", "__rk_num",
            F.col("item.id").alias("item_id"),
            F.col("item.relevancy").alias("relevancy"),
            # explicit judgment label (explicitLabelInteractions,
            # TrainBuffer.scala:73-79) — consumed by training_matrix
            F.col("item.label").alias("item_label"),
            # ranking-time per-item field overrides: values() prefers these
            # over stored state (NumberFeature.scala:84-94,
            # StringFeature.scala:95-105)
            F.col("item.str_fields").alias("__ov_str"),
            F.col("item.num_fields").alias("__ov_num"),
        )

        # partition features: merged-scan path (one shuffle per scope) vs
        # legacy per-feature joins (interacted_with, normalized rate)
        merged_groups, legacy, trivial = self._partition_features()

        # chain scope groups: each merged scan carries ALL current columns
        # through as query payload — no join back to base, so a K-feature
        # pipeline is exactly K-distinct-scopes shuffles + the label join
        out = base
        for scope, cfgs in merged_groups.items():
            out = self._run_scope_group(
                events, out, scope, cfgs, series=(series or {}).get(scope)
            )
        # legacy (join-path) features compute against the PRISTINE base,
        # then join their output columns in by (ranking, position). The
        # attach internals reference their input frame several times
        # (as-of join + join-back), so chaining them onto the ACCUMULATED
        # frame would copy the whole accumulated plan tree into every
        # feature — Catalyst transforms trees, not DAGs, and analysis
        # time explodes exponentially with attach-path feature count (the
        # RankLens config's 12 attach features took analysis from
        # milliseconds to minutes). Per-feature trees stay O(base+events)
        # and the total plan grows linearly; the shuffle count is
        # unchanged (one join per legacy feature either way).
        base_cols = set(base.columns)
        for cfg in legacy:
            att = self._attach(base, rankings, events, cfg)
            new_cols = [c for c in att.columns if c not in base_cols]
            out = out.join(
                att.select("ranking_id", "position", *new_cols),
                ["ranking_id", "position"], "left",
            )
        for cfg in trivial:
            out = self._attach(out, rankings, events, cfg)
        out = out.drop("__ov_str", "__ov_num", "__rk_str", "__rk_num")
        return out.drop("relevancy") if not any(
            isinstance(c, Relevancy) for c in self.features
        ) else out

    def _partition_features(self):
        """Split features into merged-scan scope groups / legacy join path
        / trivial per-row exprs."""
        merged_groups: dict[str, list] = {}
        legacy: list = []
        trivial: list = []
        for cfg in self.features:
            scope = self._merge_scope(cfg)
            if isinstance(cfg, (Relevancy, Position, LocalTime, RandomFeature)):
                trivial.append(cfg)
            elif scope is not None:
                merged_groups.setdefault(scope, []).append(cfg)
            else:
                legacy.append(cfg)
        return merged_groups, legacy, trivial

    def write_series(self, events: DataFrame) -> dict[str, DataFrame]:
        """Phase A of the two-phase backfill: one write-value-series
        DataFrame per merged scope group (operators/merge.write_series) —
        the expensive per-write window fold, materialized once per input
        and reused by every entity range's assembly pass."""
        from metarank_spark.operators.merge import write_series as _ws

        self._has_late = "vts_ms" in events.columns
        events = _with_vts(events)
        merged_groups, _, _ = self._partition_features()
        out = {}
        for scope_key, cfgs in merged_groups.items():
            writes, feats = self._compile_scope_group(events, scope_key, cfgs)
            if self.hot_chunk_ms and self.hot_entities:
                hot = F.coalesce(
                    F.col("entity").isin(self.hot_entities), F.lit(False)
                )
                out[scope_key] = _ws(
                    writes.filter(~hot), "entity", feats
                ).unionByName(
                    self._compose_hot_series(writes.filter(hot), feats)
                )
            elif self.hot_chunk_ms:
                # salt-every-entity mode: decomposed write-side fold for
                # every key (same shape _run_scope_group uses inline)
                out[scope_key] = self._compose_hot_series(writes, feats)
            else:
                out[scope_key] = _ws(writes, "entity", feats)
        return out

    # ---------------- merged-scan compilation ----------------

    @staticmethod
    def _merge_scope(cfg) -> str | None:
        """Scope key of the single-pass merged scan, or None for features
        that need the join path."""
        if isinstance(cfg, (WindowCount, InteractionCount)):
            # field scopes derive their entity through an as-of hop, so
            # they run on the join path, not the merged scan
            return None if "." in cfg.scope else cfg.scope
        if isinstance(cfg, Rate):
            if cfg.normalize_weight is not None or "." in cfg.scope:
                return None
            return cfg.scope
        if isinstance(cfg, (Number, Boolean, StringEncode, WordCount, Vector)):
            # ranking-sourced fields are per-ranking constants (no state):
            # handled on the attach path, not the merged scan
            return None if cfg.source == "ranking" else cfg.source
        if isinstance(cfg, ItemAge):
            return "item"
        if isinstance(cfg, UserAgent):
            return "session"  # UserAgentSchema pins SessionScopeType
        if isinstance(cfg, Referer):
            return cfg.scope
        if isinstance(cfg, FieldMatch):
            return "item"
        if isinstance(cfg, (Stats, Freq, RecentItems)):
            # pool features need last-N-WRITES frames, so each gets its own
            # writes stream (its window must not see other features' writes)
            return f"{cfg.scope}::pool::{cfg.name}"
        return None

    def _compose_hot_series(self, writes, feats):
        """Write-value series for HOT entities with every unbounded
        per-entity window decomposed. Rows are classed by interaction type
        (classes are disjoint — one event carries one type); each class's
        counter columns come from the salted builders over that class's
        sub-frame — exact, because the masked merged-frame windows skip
        other classes' rows anyway — window-free columns evaluate in
        place, other classes' columns are null, and the class frames
        union back into one series. Lateness-anchored legs keep their
        per-entity sequential carry but run class-local (one interaction
        type — far sparser than the merged frame). Pool groups (no
        salt_specs) fall back to the generic fold: their windows are
        bounded sliding frames, not unbounded aggregations."""
        from metarank_spark.operators.merge import SIDE_WRITE
        from metarank_spark.operators.merge import write_series as _ws
        from metarank_spark.plans.prefix import (
            salted_monotone_period_counts,
            salted_running_count,
        )

        specs: dict[str, tuple] = {}
        for f in feats:
            specs.update(f.salt_specs or {})
        if not specs:
            return _ws(writes, "entity", feats)
        exprs = {n: e for f in feats for n, e in f.write_cols.items()}
        names = list(exprs)
        gschema = _ws(writes, "entity", feats).schema
        by_itype: dict[str, list] = {}
        for n, spec in specs.items():
            by_itype.setdefault(spec[1], []).append((n, spec))
        w = writes.withColumn("__side", F.lit(SIDE_WRITE))
        chunk = self.hot_chunk_ms
        parts, covered = [], None
        for itype, cols in by_itype.items():
            pred = F.col(f"__f_{itype}") == 1
            covered = pred if covered is None else (covered | pred)
            sub = w.filter(pred)
            have = set()
            for n, spec in cols:
                have.add(n)
                if spec[0] == "count":
                    sub = salted_running_count(sub, "entity", ORDER, chunk, out=n)
                elif spec[0] == "periodic":
                    sub = salted_monotone_period_counts(
                        sub, "entity", ORDER, spec[3], spec[2], out=n)
                else:  # anchored — decomposed too (prefix.py)
                    from metarank_spark.plans.prefix import (
                        salted_anchored_period_counts,
                    )

                    bucket = F.floor(
                        F.coalesce(F.col("__vts"), F.col("ts_ms"))
                        / F.lit(spec[3]))
                    sub = salted_anchored_period_counts(
                        sub, "entity", ORDER, spec[3], spec[2],
                        chunk, bucket, out=n)
            parts.append(sub.select(
                "entity", "ts_ms", "seq",
                *[
                    (F.col(n) if n in have
                     else (F.lit(None).cast(gschema[n].dataType)
                           if n in specs
                           else exprs[n])).alias(n)
                    for n in names
                ],
            ))
        rest = w.filter(~F.coalesce(covered, F.lit(False)))
        parts.append(rest.select(
            "entity", "ts_ms", "seq",
            *[
                (F.lit(None).cast(gschema[n].dataType) if n in specs
                 else exprs[n]).alias(n)
                for n in names
            ],
        ))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _run_scope_group(self, events, base, scope_key, cfgs, series=None):
        """Build the merged write+query stream for one scope and compute all
        of its features in a single sorted-partition pass. ``base`` rows
        (one per ranking-item, plus any already-attached feature columns)
        ride through as query payload; the result is base + new columns.

        ``series``: a pre-materialized write-value series for this scope
        group (FeatureEngine.write_series output read back from storage) —
        when given, the expensive write-side window fold is skipped and
        only the as-of assembly runs (two-phase backfill)."""
        scope = scope_key.split("::")[0]  # pool groups encode scope::pool::name
        ent_read = {
            "item": F.col("item_id"), "user": F.col("user_id"),
            "session": F.col("session_id"), "global": F.lit(GLOBAL_ENTITY),
        }[scope]
        qkeys = [c for c in base.columns if c not in ("ts_ms", "seq")]
        queries = base.select(ent_read.alias("entity"), "ts_ms", "seq", *qkeys)
        writes, feats = self._compile_scope_group(events, scope_key, cfgs)
        if series is not None:
            from metarank_spark.operators.merge import assemble_from_series

            return assemble_from_series(
                queries, series, "entity", feats, qkeys,
                salt_chunk_ms=self.hot_chunk_ms,
                hot_entities=self.hot_entities,
            )
        if self.hot_chunk_ms and self.hot_entities:
            # hot keys: composed (decomposed-window) series + salted carry;
            # cold keys: the untouched single-pass merged scan
            from metarank_spark.operators.merge import assemble_from_series

            hot = F.coalesce(
                F.col("entity").isin(self.hot_entities), F.lit(False)
            )
            cold_out = run_merged(
                queries.filter(~hot), writes.filter(~hot),
                "entity", feats, qkeys,
            )
            hot_series = self._compose_hot_series(writes.filter(hot), feats)
            hot_out = assemble_from_series(
                queries.filter(hot), hot_series, "entity", feats, qkeys,
                salt_chunk_ms=self.hot_chunk_ms,
                hot_entities=self.hot_entities,
            )
            return cold_out.unionByName(hot_out)
        if self.hot_chunk_ms:
            # salt-EVERY-entity mode (coarse key spaces): the write-side
            # fold must be decomposed too, not just the carry — otherwise
            # the running/periodic windows still pin a hot key's whole
            # timeline to one task. Route every entity through the
            # composed salted series + salted-carry assembly.
            from metarank_spark.operators.merge import assemble_from_series

            series_all = self._compose_hot_series(writes, feats)
            return assemble_from_series(
                queries, series_all, "entity", feats, qkeys,
                salt_chunk_ms=self.hot_chunk_ms,
            )
        return run_merged(queries, writes, "entity", feats, qkeys)

    @staticmethod
    def _ttl_wrap(cfg, wc: dict, fin, flags: dict[str, Column] | None = None,
                  self_ts: bool = False):
        """Thread per-feature TTL through the merged scan
        (model/Feature.scala:41-55: every feature carries a ttl, default
        90d, enforced by the live store's key expiry — state whose last
        write is older than ttl reads as missing).

        Semantics note (documented divergence in a gap corner): the
        reference's stores refresh expiry on EVERY touch including reads
        (fstore/memory/MemPersistence.scala:35-45 Caffeine expireAfter
        create/update/READ; Redis per-key TTL likewise), and a key that
        does lapse is re-created EMPTY by the next write. Here expiry is
        anchored to the last WRITE only, and post-gap writes resume the
        historical aggregate rather than restarting it. For entities
        read within ttl (any ranking touching them — the common case)
        the reference never lapses between writes, so resume-semantics
        matches it; the divergence is confined to entities untouched by
        reads AND writes for a full ttl, where the reference restarts
        counts at 1 and this engine resumes. Exact touch-refresh
        semantics would make reads state-mutating (a cache property, not
        a model property) and is deliberately not replicated.

        Each value column gets a sibling write-ts column masked by the
        same write-row flag and carried by the same strictly-before rule;
        the finish expr then nulls values stale at the QUERY row's ts
        before the feature's own missing-value handling applies (NaN for
        scalars/vectors, 0.0 for interaction_count — exactly what an
        expired key reads in the reference). ``self_ts``: the value
        column already IS the write ts (ItemAge)."""
        ttl = getattr(cfg, "ttl_ms", None)
        if not ttl:
            return wc, fin
        ts_map: dict[str, str] = {}
        if self_ts:
            ts_map = {n: n for n in list(wc)}
        else:
            for vn, flag in (flags or {}).items():
                tsn = f"{vn}__wts"
                wc[tsn] = masked(flag, F.col("ts_ms"))
                ts_map[vn] = tsn

        def wrapped(c, fin=fin, ts_map=ts_map, ttl=ttl):
            fresh = {
                vn: F.when((F.col("ts_ms") - c[tsn]) <= F.lit(ttl), c[vn])
                for vn, tsn in ts_map.items()
            }
            return fin({**c, **fresh})

        return wc, wrapped

    def _pool_payload(self, w, scope, cfg, pname, sname) -> DataFrame:
        """Trailing-K pool payload (Stats percentile vector / Freq share
        map / RecentItems list) on the writes frame.

        Per-entity sliding window normally; for the ``$global`` scope —
        a constant partition key, i.e. a guaranteed single-task window —
        and for salted hot entities, the banded trailing-rows join
        (plans/prefix.banded_trailing_rows): a bounded ROWS frame does
        not help distribution, because the PARTITION holds the hot key's
        whole timeline regardless of the frame. Bit-identical for
        streams with a total (ts_ms, seq) order per entity
        (tests/test_engine_salted.py pool property tests); rows tied on
        both keys get an arbitrary order in EITHER mode, exactly like
        the window form."""
        sample = F.col(sname)
        has_vts = "__vts" in w.columns
        vts = (F.coalesce(F.col("__vts"), F.col("ts_ms"))
               if has_vts else F.col("ts_ms"))
        k = cfg.count if isinstance(cfg, RecentItems) else cfg.pool
        probs = (
            F.array(*[F.lit(p / 100.0) for p in cfg.percentiles])
            if isinstance(cfg, Stats) else None
        )

        def freq_map(pool):
            total = F.size(pool)
            return F.map_from_entries(F.transform(
                F.array_distinct(pool),
                lambda v: F.struct(
                    v.alias("key"),
                    (F.size(F.filter(pool, lambda x: x == v))
                     / total.cast("double")).alias("value"),
                ),
            ))

        def recent_list(lst):
            # newest first; stored/compared timestamps are the event's
            # VALUE ts (Write.timestamp); append order is commit order
            cutoff = vts - F.lit(cfg.duration_ms)
            return F.transform(
                F.filter(lst, lambda x: x["ts"] >= cutoff), lambda x: x["v"]
            )

        def window_mode(df):
            poolw = (
                Window.partitionBy("entity")
                .orderBy("ts_ms", "seq")
                .rowsBetween(-(k - 1), Window.currentRow)
            )
            if isinstance(cfg, Stats):
                percs = F.percentile(sample, probs).over(poolw)
                expr = F.array(
                    F.min(sample).over(poolw), F.max(sample).over(poolw),
                    *[F.get(percs, i) for i in range(len(cfg.percentiles))],
                )
            elif isinstance(cfg, Freq):
                expr = freq_map(F.collect_list(sample).over(poolw))
            else:
                expr = recent_list(F.reverse(F.collect_list(
                    F.struct(vts.alias("ts"), sample.alias("v"))
                ).over(poolw)))
            return df.withColumn(pname, expr)

        def banded_mode(df, chunk_ms):
            from metarank_spark.plans.prefix import banded_trailing_rows

            pay = [sname, "ts_ms"] + (["__vts"] if has_vts else [])
            j = banded_trailing_rows(
                df, "entity", ("ts_ms", "seq"), k, chunk_ms, pay)
            ws = F.col(f"__w_{sname}")
            wvts = (
                F.coalesce(F.col("__w___vts"), F.col("__w_ts_ms"))
                if has_vts else F.col("__w_ts_ms")
            )
            others = [c for c in df.columns if c != "entity"]
            firsts = [F.first(F.col(c)).alias(c) for c in others]
            if isinstance(cfg, Stats):
                percs = F.percentile(ws, probs)
                agg = F.array(
                    F.min(ws), F.max(ws),
                    *[F.get(percs, i) for i in range(len(cfg.percentiles))],
                ).alias(pname)
                out = j.groupBy("entity", "__rn").agg(*firsts, agg)
            elif isinstance(cfg, Freq):
                agg = freq_map(F.collect_list(ws)).alias(pname)
                out = j.groupBy("entity", "__rn").agg(*firsts, agg)
            else:
                # collect (rn, ts, v), order newest-first by the global
                # ordinal, then the same value-ts eviction filter
                arr = F.sort_array(F.collect_list(F.struct(
                    F.col("__w_rn").alias("rn"), wvts.alias("ts"),
                    ws.alias("v"))), asc=False).alias("__pool")
                out = j.groupBy("entity", "__rn").agg(*firsts, arr)
                out = out.withColumn(
                    pname,
                    recent_list(F.transform(
                        F.col("__pool"),
                        lambda x: F.struct(x["ts"].alias("ts"),
                                           x["v"].alias("v")))),
                ).drop("__pool")
            return out.drop("__rn")

        if scope == "global":
            return banded_mode(w, self.hot_chunk_ms or GLOBAL_CHUNK_MS)
        if not self.hot_chunk_ms:
            return window_mode(w)
        if not self.hot_entities:
            return banded_mode(w, self.hot_chunk_ms)
        is_hot = F.coalesce(
            F.col("entity").isin(self.hot_entities), F.lit(False))
        return window_mode(w.filter(~is_hot)).unionByName(
            banded_mode(w.filter(is_hot), self.hot_chunk_ms))

    def _compile_scope_group(self, events, scope_key, cfgs):
        """Compile one scope group to (writes_df, MergedFeature list):
        write predicates, payload columns, write-side window exprs, and
        finish exprs — everything except the query side."""
        scope = scope_key.split("::")[0]
        ent_write = _entity_col(scope)

        preds, payloads, feats = [], {}, []
        pool_specs: list[tuple] = []
        has_late = getattr(self, "_has_late", False)
        if has_late:
            # the VALUE timestamp rides along as a payload so bucket exprs
            # on the merged frame can use it (null on query rows → fall
            # back to the row's own commit ts, which only affects frame
            # ordering); skipped entirely on streams with no late writes
            payloads["__vts"] = F.col("vts_ms")
        itypes: dict[str, str] = {}

        def itype_flag(itype: str) -> str:
            name = f"__f_{itype}"
            if name not in itypes:
                itypes[name] = itype
                payloads[name] = F.when(
                    (F.col("event_type") == "interaction")
                    & (F.col("interaction_type") == itype),
                    F.lit(1),
                )
                preds.append(
                    (F.col("event_type") == "interaction")
                    & (F.col("interaction_type") == itype)
                )
            return name

        nan = F.lit(float("nan"))
        for cfg in cfgs:
            if isinstance(cfg, InteractionCount):
                fl = itype_flag(cfg.interaction)
                run = entity_rows_window("entity")
                wc = {f"{cfg.name}__v": masked(
                    F.col(fl) == 1, F.sum(fl).over(run).cast("long"))}
                fin = lambda c, n=f"{cfg.name}__v": F.coalesce(  # noqa: E731
                    c[n].cast("double"), F.lit(0.0))
                wc, fin = self._ttl_wrap(
                    cfg, wc, fin, {f"{cfg.name}__v": F.col(fl) == 1})
                feats.append(MergedFeature(
                    cfg.name, wc, fin,
                    salt_specs={f"{cfg.name}__v": ("count", cfg.interaction)},
                ))
            elif isinstance(cfg, WindowCount):
                fl = itype_flag(cfg.interaction)
                vts = (
                    F.coalesce(F.col("__vts"), F.col("ts_ms"))
                    if has_late else F.col("ts_ms")
                )
                bucket = F.floor(vts / F.lit(cfg.bucket_ms))
                if has_late and cfg.interaction in self.late_types:
                    vec = self._anchored_period_counts(
                        F.col(fl) == 1, F.col(fl), bucket, cfg.periods, "entity"
                    )
                else:
                    vec = self._monotone_period_counts(
                        F.col(fl), bucket, cfg.periods
                    )
                wc = {f"{cfg.name}__v": masked(F.col(fl) == 1, vec)}
                dim = len(cfg.periods)
                fin = lambda c, n=f"{cfg.name}__v", d=dim: F.when(  # noqa: E731
                    c[n].isNull(), _nan_array(d)
                ).otherwise(F.transform(c[n], lambda x: x.cast("double")))
                wc, fin = self._ttl_wrap(
                    cfg, wc, fin, {f"{cfg.name}__v": F.col(fl) == 1})
                kind = (
                    "anchored"
                    if has_late and cfg.interaction in self.late_types
                    else "periodic"
                )
                feats.append(MergedFeature(
                    cfg.name, wc, fin,
                    salt_specs={f"{cfg.name}__v": (
                        kind, cfg.interaction, cfg.periods, cfg.bucket_ms)},
                ))
            elif isinstance(cfg, Rate):
                ft, fb = itype_flag(cfg.top), itype_flag(cfg.bottom)
                vts = (
                    F.coalesce(F.col("__vts"), F.col("ts_ms"))
                    if has_late else F.col("ts_ms")
                )
                bucket = F.floor(vts / F.lit(cfg.bucket_ms))

                def wvec(fl, itype):
                    # separate anchors: top/bottom are separate store
                    # keys; anchor machinery only for types that can be
                    # backdated (injected impressions)
                    if has_late and itype in self.late_types:
                        return self._anchored_period_counts(
                            F.col(fl) == 1, F.col(fl), bucket, cfg.periods, "entity"
                        )
                    return self._monotone_period_counts(
                        F.col(fl), bucket, cfg.periods
                    )
                wc = {
                    f"{cfg.name}__t": masked(F.col(ft) == 1, wvec(ft, cfg.top)),
                    f"{cfg.name}__b": masked(F.col(fb) == 1, wvec(fb, cfg.bottom)),
                }
                dim = len(cfg.periods)
                fin = lambda c, tn=f"{cfg.name}__t", bn=f"{cfg.name}__b", d=dim: F.when(  # noqa: E731,E501
                    c[tn].isNull() | c[bn].isNull(), _nan_array(d)
                ).otherwise(
                    F.zip_with(c[tn], c[bn], lambda x, y: x / y.cast("double"))
                )
                # top and bottom counters are separate store keys with
                # separate expiries (RateFeature.scala topTarget/bottomTarget)
                wc, fin = self._ttl_wrap(cfg, wc, fin, {
                    f"{cfg.name}__t": F.col(ft) == 1,
                    f"{cfg.name}__b": F.col(fb) == 1,
                })

                def leg_kind(itype):
                    return (
                        "anchored"
                        if has_late and itype in self.late_types
                        else "periodic"
                    )
                feats.append(MergedFeature(
                    cfg.name, wc, fin,
                    salt_specs={
                        f"{cfg.name}__t": (
                            leg_kind(cfg.top), cfg.top,
                            cfg.periods, cfg.bucket_ms),
                        f"{cfg.name}__b": (
                            leg_kind(cfg.bottom), cfg.bottom,
                            cfg.periods, cfg.bucket_ms),
                    },
                ))
            elif isinstance(cfg, (Stats, Freq, RecentItems)):
                # pool windows run over the feature's OWN write stream
                # (this group contains only this feature, see _merge_scope)
                if isinstance(cfg, RecentItems):
                    sample = F.when(
                        (F.col("event_type") == "interaction")
                        & (F.col("interaction_type") == cfg.interaction),
                        F.col("item_id"),
                    )
                    preds.append(
                        (F.col("event_type") == "interaction")
                        & (F.col("interaction_type") == cfg.interaction)
                    )
                else:
                    sample = F.when(
                        F.col("event_type") == "interaction",
                        F.col("num_fields" if isinstance(cfg, Stats) else "str_fields")
                        .getItem(cfg.field),
                    )
                    if isinstance(cfg, Freq):
                        sample = sample.getItem(0)
                    pred = (F.col("event_type") == "interaction") & sample.isNotNull()
                    rate = getattr(cfg, "sample_rate", 1.0)
                    if rate < 1.0:
                        # deterministic shouldSample (Feature.scala:249):
                        # the pool sees only hash-accepted writes; pool
                        # groups are single-feature so the filter is exact
                        pred = pred & sample_accept_expr(rate)
                    preds.append(pred)
                pname = f"__p_{cfg.name}"
                sname = f"__ps_{cfg.name}"
                # raw sample only; the trailing-K pool payload itself is
                # computed on the WRITES frame after it is built
                # (_pool_payload): per-entity sliding window normally,
                # the banded trailing-rows join for $global / salted hot
                # entities — a bounded ROWS frame still pins a hot key's
                # whole timeline to one task (the PARTITION skews, not
                # the frame)
                payloads[sname] = sample
                pool_specs.append((cfg, pname, sname))
                if isinstance(cfg, Stats):
                    dim = 2 + len(cfg.percentiles)
                    fin = lambda c, n=f"{cfg.name}__v", d=dim: F.when(
                        c[n].isNull(), _nan_array(d)).otherwise(c[n])
                elif isinstance(cfg, Freq):
                    fin = lambda c, n=f"{cfg.name}__v": c[n]
                else:  # RecentItems
                    fin = lambda c, n=f"{cfg.name}__v": F.coalesce(
                        c[n], F.array().cast("array<string>"))
                wc = {f"{cfg.name}__v": F.col(pname)}
                wc, fin = self._ttl_wrap(
                    cfg, wc, fin, {f"{cfg.name}__v": F.col(pname).isNotNull()})
                feats.append(MergedFeature(cfg.name, wc, fin))
            elif isinstance(cfg, Vector):
                val = F.col("numlist_fields").getItem(cfg.field)
                pname = f"__p_{cfg.name}"
                payloads[pname] = F.when(F.col("event_type") == cfg.source, val)
                preds.append((F.col("event_type") == cfg.source) & val.isNotNull())

                def reduce_vec(arr, reducers=cfg.reducers):
                    d = F.transform(arr, lambda x: x.cast("double"))
                    total = F.aggregate(d, F.lit(0.0), lambda a, x: a + x)
                    # nullif guards: ANSI mode (Spark 4 default) raises
                    # DIVIDE_BY_ZERO instead of returning NaN/Infinity
                    m = {
                        "min": F.array_min(d), "max": F.array_max(d),
                        "size": F.size(d).cast("double"),
                        "avg": total / F.nullif(F.size(d).cast("double"), F.lit(0.0)),
                        "sum": total,
                        "first": F.get(d, 0), "last": F.element_at(d, -1),
                        "euclidean_distance": F.sqrt(
                            F.aggregate(d, F.lit(0.0), lambda a, x: a + x * x)),
                    }
                    return F.array(*[F.coalesce(m[r], F.lit(float("nan"))) for r in reducers])

                dim = len(cfg.reducers)
                fin = lambda c, n=f"{cfg.name}__v", d=dim, rv=reduce_vec: F.when(
                    c[n].isNull(), _nan_array(d)).otherwise(rv(c[n]))
                wc = {f"{cfg.name}__v": F.col(pname)}
                wc, fin = self._ttl_wrap(
                    cfg, wc, fin, {f"{cfg.name}__v": F.col(pname).isNotNull()})
                feats.append(MergedFeature(cfg.name, wc, fin))
            elif isinstance(cfg, UserAgent):
                from metarank_spark.functions.ua import UA_VALUES, ua_category

                head = F.col("str_fields").getItem(cfg.field).getItem(0)
                val = ua_category(head, cfg.mapper)
                is_feedback = F.col("event_type").isin("ranking", "interaction")
                pname = f"__p_{cfg.name}"
                payloads[pname] = F.when(is_feedback, val)
                preds.append(is_feedback & val.isNotNull())
                wc = {f"{cfg.name}__v": F.col(pname)}
                vals = UA_VALUES[cfg.mapper]
                own = ua_category(
                    F.col("__rk_str").getItem(cfg.field).getItem(0), cfg.mapper
                )
                fin = lambda c, n=f"{cfg.name}__v", vs=vals, o=own: F.array(*[  # noqa: E731,E501
                    F.when(F.coalesce(c[n], o) == v, 1.0).otherwise(0.0)
                    for v in vs
                ])
                wc, fin = self._ttl_wrap(
                    cfg, wc, fin, {f"{cfg.name}__v": F.col(pname).isNotNull()})
                feats.append(MergedFeature(cfg.name, wc, fin))
            elif isinstance(cfg, Referer):
                from metarank_spark.functions.ua import (
                    referer_medium,
                    referer_medium_index,
                )

                head = F.col("str_fields").getItem(cfg.field).getItem(0)
                src_pred = {
                    "ranking": F.col("event_type") == "ranking",
                    "interaction": F.col("event_type") == "interaction",
                }.get(cfg.source,
                      F.col("event_type").isin("ranking", "interaction"))
                pname = f"__p_{cfg.name}"
                payloads[pname] = F.when(src_pred, referer_medium(head))
                preds.append(src_pred & head.isNotNull())
                wc = {f"{cfg.name}__v": F.col(pname)}
                fin = lambda c, n=f"{cfg.name}__v": referer_medium_index(c[n])  # noqa: E731,E501
                wc, fin = self._ttl_wrap(
                    cfg, wc, fin, {f"{cfg.name}__v": F.col(pname).isNotNull()})
                feats.append(MergedFeature(cfg.name, wc, fin))
            elif isinstance(cfg, FieldMatch):
                from metarank_spark.functions.text import (
                    bm25_score_cols,
                    ngram_match_cols,
                    term_match_cols,
                )

                head = F.col("str_fields").getItem(cfg.item_field).getItem(0)
                pname = f"__p_{cfg.name}"
                payloads[pname] = F.when(F.col("event_type") == "item", head)
                preds.append((F.col("event_type") == "item") & head.isNotNull())
                wc = {f"{cfg.name}__v": F.col(pname)}
                q = F.col("__rk_str").getItem(cfg.ranking_field).getItem(0)
                if cfg.method == "ngram":
                    score = lambda s, qq, cfg=cfg: ngram_match_cols(s, qq, cfg.n)  # noqa: E731,E501
                elif cfg.method == "bm25":
                    if not cfg.term_freq:
                        raise ValueError(
                            f"field_match {cfg.name!r}: bm25 needs a "
                            "termFreq dictionary (build_term_freq / the "
                            "termfreq CLI artifact)"
                        )
                    score = lambda s, qq, cfg=cfg: bm25_score_cols(  # noqa: E731
                        s, qq, cfg.term_freq)
                else:
                    score = term_match_cols
                fin = lambda c, n=f"{cfg.name}__v", qq=q, sc=score: F.when(  # noqa: E731,E501
                    c[n].isNull() | qq.isNull(), nan
                ).otherwise(sc(c[n], qq))
                wc, fin = self._ttl_wrap(
                    cfg, wc, fin, {f"{cfg.name}__v": F.col(pname).isNotNull()})
                feats.append(MergedFeature(cfg.name, wc, fin))
            elif isinstance(cfg, (Number, Boolean, StringEncode, WordCount, ItemAge)):
                src = "item" if isinstance(cfg, ItemAge) else cfg.source
                if isinstance(cfg, Number):
                    val = F.col("num_fields").getItem(cfg.field)
                elif isinstance(cfg, Boolean):
                    head = F.col("str_fields").getItem(cfg.field).getItem(0)
                    val = F.when(head == "true", 1.0).when(head == "false", 0.0)
                elif isinstance(cfg, StringEncode):
                    # store the full SStringList: onehot encodes EVERY
                    # value (OneHotEncoder.fromValues), index the head
                    val = F.col("str_fields").getItem(cfg.field)
                elif isinstance(cfg, WordCount):
                    val = F.size(
                        F.split(F.col("str_fields").getItem(cfg.field).getItem(0), r"\s+")
                    ).cast("double")
                else:  # ItemAge: store write ts (ItemAgeFeature.scala:41-70)
                    val = F.col("ts_ms").cast("double")
                pname = f"__p_{cfg.name}"
                payloads[pname] = F.when(F.col("event_type") == src, val)
                preds.append(
                    (F.col("event_type") == src) & val.isNotNull()
                )
                wc = {f"{cfg.name}__v": F.col(pname)}
                if isinstance(cfg, ItemAge):
                    # toSeconds truncation (ItemAgeFeature.scala:81)
                    fin = lambda c, n=f"{cfg.name}__v": F.coalesce(
                        F.floor((F.col("ts_ms") - c[n]) / 1000.0).cast("double"), nan)
                elif isinstance(cfg, StringEncode):
                    # ranking-time override: encode the rank item's own
                    # field list when present (StringFeature.scala:95-105)
                    ov_arr = F.col("__ov_str").getItem(cfg.field)
                    if cfg.encode == "index":
                        # index encode: head of the list (StringFeature.scala
                        # IndexCategoricalEncoder values.headOption)
                        mapping = F.array(*[F.lit(v) for v in cfg.values])
                        fin = lambda c, n=f"{cfg.name}__v", m=mapping, ov=ov_arr: F.coalesce(
                            F.array_position(
                                m, F.get(F.when(ov.isNotNull(), ov).otherwise(c[n]), 0)
                            ),
                            F.lit(0),
                        ).cast("double")
                    else:
                        # onehot: 1.0 at EVERY stored value, not just the
                        # head (util/OneHotEncoder.scala fromValues)
                        vals = cfg.values
                        fin = lambda c, n=f"{cfg.name}__v", vs=vals, ov=ov_arr: F.array(
                            *[
                                F.when(
                                    F.array_contains(
                                        F.when(ov.isNotNull(), ov).otherwise(c[n]), v
                                    ),
                                    1.0,
                                ).otherwise(0.0)
                                for v in vs
                            ])
                elif isinstance(cfg, Number):
                    # ranking-time numeric override (NumberFeature.scala:84-94)
                    ov = F.col("__ov_num").getItem(cfg.field)
                    fin = lambda c, n=f"{cfg.name}__v", o=ov: F.coalesce(o, c[n], nan)
                elif isinstance(cfg, Boolean):
                    ovh = F.col("__ov_str").getItem(cfg.field).getItem(0)
                    fin = lambda c, n=f"{cfg.name}__v", o=ovh: (
                        F.when(o == "true", 1.0)
                        .when(o == "false", 0.0)
                        .otherwise(F.coalesce(c[n], nan))
                    )
                elif isinstance(cfg, WordCount):
                    ovh = F.col("__ov_str").getItem(cfg.field).getItem(0)
                    fin = lambda c, n=f"{cfg.name}__v", o=ovh: F.when(
                        o.isNotNull(), F.size(F.split(o, r"\s+")).cast("double")
                    ).otherwise(F.coalesce(c[n], nan))
                else:
                    fin = lambda c, n=f"{cfg.name}__v": F.coalesce(c[n], nan)
                # ItemAge's stored value IS the write ts (self_ts); the
                # others mask on their own payload column
                wc, fin = self._ttl_wrap(
                    cfg, wc, fin,
                    flags=None if isinstance(cfg, ItemAge)
                    else {f"{cfg.name}__v": F.col(pname).isNotNull()},
                    self_ts=isinstance(cfg, ItemAge),
                )
                feats.append(MergedFeature(cfg.name, wc, fin))
            else:  # pragma: no cover
                raise ValueError(f"not mergeable: {cfg}")

        pred = preds[0]
        for p in preds[1:]:
            pred = pred | p
        writes = events.filter(pred).select(
            ent_write.alias("entity"), "ts_ms", "seq",
            *[expr.alias(n) for n, expr in payloads.items()],
        ).filter(F.col("entity").isNotNull())
        scope = scope_key.split("::")[0]
        for cfg_p, pn, sn in pool_specs:
            writes = self._pool_payload(writes, scope, cfg_p, pn, sn)
        return writes, feats

    # dispatch
    def _attach(self, base, rankings, events, cfg) -> DataFrame:
        m = {
            WindowCount: self._attach_window_count,
            InteractionCount: self._attach_interaction_count,
            Rate: self._attach_rate,
            Number: self._attach_scalar,
            Boolean: self._attach_scalar,
            WordCount: self._attach_scalar,
            StringEncode: self._attach_string,
            ItemAge: self._attach_item_age,
            Relevancy: self._attach_relevancy,
            Position: self._attach_position,
            LocalTime: self._attach_local_time,
            RandomFeature: self._attach_random,
            MapFeature: self._attach_map,
            Diversity: self._attach_diversity,
            InteractedWith: self._attach_interacted_with,
        }
        return m[type(cfg)](base, rankings, events, cfg)

    def _asof_to_base(self, base, rankings, series, scope, values, suffix) -> DataFrame:
        """Strict as-of join of the feature series to the reading side:
        item scope reads per candidate item, user/session/global at the
        ranking level then fan out to items."""
        if scope == "item":
            left = base.select("ranking_id", "position", "item_id", "ts_ms", "seq")
            joined = asof_join(
                left, series, on="item_id",
                left_seq="seq", right_seq="seq", values=values,
                strict=True, suffix=suffix,
            ).drop("ts_ms", "seq", "item_id")
            return base.join(joined, ["ranking_id", "position"], "left")
        ent = {"user": "user_id", "session": "session_id", "global": None}[scope]
        if ent is None:
            left = rankings.select(
                "ranking_id", "ts_ms", "seq", F.lit(GLOBAL_ENTITY).alias("entity")
            )
        else:
            left = rankings.select("ranking_id", "ts_ms", "seq", F.col(ent).alias("entity"))
        joined = asof_join(
            left, series, on="entity",
            left_seq="seq", right_seq="seq", values=values,
            strict=True, suffix=suffix,
        ).drop("ts_ms", "seq", "entity")
        return base.join(joined, "ranking_id", "left")

    def _rename_series(self, series: DataFrame, scope: str) -> DataFrame:
        if scope == "item":
            return series.withColumnRenamed("entity", "item_id")
        return series

    def _series_with_ttl(self, series: DataFrame, cfg, vals: list[str]):
        """Attach-path ttl plumbing: carry the series row's own ts as the
        last-write ts so reads can expire it (model/Feature.scala:41-55)."""
        if getattr(cfg, "ttl_ms", None) is None:
            return series, vals, []
        return series.withColumn("wts", F.col("ts_ms")), vals + ["wts"], ["wts"]

    def _ttl_guard(self, col: Column, cfg, suffix: str) -> Column:
        if getattr(cfg, "ttl_ms", None) is None:
            return col
        return F.when(F.col("ts_ms") - F.col(f"wts{suffix}") <= cfg.ttl_ms, col)

    def _attach_window_count(self, base, rankings, events, cfg: WindowCount):
        fs = _parse_field_scope(cfg.scope)
        if fs:
            w = self._field_scoped_writes(events, cfg.interaction, *fs)
            s = self._periodic_fold(w, cfg.periods, cfg.bucket_ms)
            s, vals, wcols = self._series_with_ttl(s, cfg, ["vec"])
            out = self._asof_field_series(base, events, *fs, s, vals, f"_{cfg.name}")
        else:
            s = self._rename_series(
                self._periodic_series(events, cfg.interaction, cfg.scope, cfg.periods, cfg.bucket_ms),
                cfg.scope,
            )
            s, vals, wcols = self._series_with_ttl(s, cfg, ["vec"])
            out = self._asof_to_base(base, rankings, s, cfg.scope, vals, f"_{cfg.name}")
        raw = self._ttl_guard(F.col(f"vec_{cfg.name}"), cfg, f"_{cfg.name}")
        val = F.when(raw.isNull(), _nan_array(len(cfg.periods))).otherwise(
            F.transform(raw, lambda x: x.cast("double"))
        )
        drops = [f"vec_{cfg.name}"] + [f"{c}_{cfg.name}" for c in wcols]
        return out.withColumn(cfg.name, val).drop(*drops)

    def _attach_interaction_count(self, base, rankings, events, cfg: InteractionCount):
        fs = _parse_field_scope(cfg.scope)
        if fs:
            w = self._field_scoped_writes(events, cfg.interaction, *fs)
            s = self._counter_fold(w)
            s, vals, wcols = self._series_with_ttl(s, cfg, ["cnt"])
            out = self._asof_field_series(base, events, *fs, s, vals, f"_{cfg.name}")
        else:
            s = self._rename_series(self._counter_series(events, cfg.interaction, cfg.scope), cfg.scope)
            s, vals, wcols = self._series_with_ttl(s, cfg, ["cnt"])
            out = self._asof_to_base(base, rankings, s, cfg.scope, vals, f"_{cfg.name}")
        cnt = self._ttl_guard(F.col(f"cnt_{cfg.name}"), cfg, f"_{cfg.name}")
        drops = [f"cnt_{cfg.name}"] + [f"{c}_{cfg.name}" for c in wcols]
        # missing state reads as 0.0 (InteractionCountFeature.scala:55-58)
        return out.withColumn(
            cfg.name, F.coalesce(cnt.cast("double"), F.lit(0.0))
        ).drop(*drops)

    def _attach_rate(self, base, rankings, events, cfg: Rate):
        dim = len(cfg.periods)
        fs = _parse_field_scope(cfg.scope)
        if fs:
            # ItemFieldScope / RankingFieldScope (Scope.scala:43-52):
            # increments keyed by the field-derived entity at write time,
            # reads keyed by the row's field-derived entity at the ranking
            top_s = self._periodic_fold(
                self._field_scoped_writes(events, cfg.top, *fs),
                cfg.periods, cfg.bucket_ms,
            )
            bot_s = self._periodic_fold(
                self._field_scoped_writes(events, cfg.bottom, *fs),
                cfg.periods, cfg.bucket_ms,
            )
        else:
            top_s = self._rename_series(
                self._periodic_series(events, cfg.top, cfg.scope, cfg.periods, cfg.bucket_ms), cfg.scope
            )
            bot_s = self._rename_series(
                self._periodic_series(events, cfg.bottom, cfg.scope, cfg.periods, cfg.bucket_ms), cfg.scope
            )
        vals = ["vec"]
        if cfg.ttl_ms is not None:
            # carry each counter's last-write ts so expired state (older
            # than ttl at the ranking) reads missing, like the store's key
            # expiry (model/Feature.scala:41-55)
            top_s = top_s.withColumn("wts", F.col("ts_ms"))
            bot_s = bot_s.withColumn("wts", F.col("ts_ms"))
            vals = ["vec", "wts"]
        if fs:
            out = self._asof_field_series(base, events, *fs, top_s, vals, f"_{cfg.name}_t")
            out = self._asof_field_series(out, events, *fs, bot_s, vals, f"_{cfg.name}_b")
        else:
            out = self._asof_to_base(base, rankings, top_s, cfg.scope, vals, f"_{cfg.name}_t")
            out = self._asof_to_base(out, rankings, bot_s, cfg.scope, vals, f"_{cfg.name}_b")
        t, b = F.col(f"vec_{cfg.name}_t"), F.col(f"vec_{cfg.name}_b")
        drop_extra = []
        if cfg.ttl_ms is not None:
            t = F.when(F.col("ts_ms") - F.col(f"wts_{cfg.name}_t") <= cfg.ttl_ms, t)
            b = F.when(F.col("ts_ms") - F.col(f"wts_{cfg.name}_b") <= cfg.ttl_ms, b)
            drop_extra = [f"wts_{cfg.name}_t", f"wts_{cfg.name}_b"]
        if cfg.normalize_weight is None:
            # top/bottom elementwise (RateFeature.scala:313-330)
            val = F.when(
                t.isNull() | b.isNull(), _nan_array(dim)
            ).otherwise(F.zip_with(t, b, lambda x, y: x / y.cast("double")))
            return out.withColumn(cfg.name, val).drop(
                f"vec_{cfg.name}_t", f"vec_{cfg.name}_b", *drop_extra
            )
        # normalized: (w + top)/(w*(gBot/gTop) + bottom) (RateFeature.scala:331-355)
        gt_s = self._periodic_series(events, cfg.top, "global", cfg.periods, cfg.bucket_ms)
        gb_s = self._periodic_series(events, cfg.bottom, "global", cfg.periods, cfg.bucket_ms)
        if cfg.ttl_ms is not None:
            # the global counters are store keys with the same ttl
            # (RateFeature.scala topGlobal/bottomGlobal take schema.ttl)
            gt_s = gt_s.withColumn("wts", F.col("ts_ms"))
            gb_s = gb_s.withColumn("wts", F.col("ts_ms"))
        out = self._asof_to_base(out, rankings, gt_s, "global", vals, f"_{cfg.name}_gt")
        out = self._asof_to_base(out, rankings, gb_s, "global", vals, f"_{cfg.name}_gb")
        gt, gb = F.col(f"vec_{cfg.name}_gt"), F.col(f"vec_{cfg.name}_gb")
        if cfg.ttl_ms is not None:
            gt = F.when(F.col("ts_ms") - F.col(f"wts_{cfg.name}_gt") <= cfg.ttl_ms, gt)
            gb = F.when(F.col("ts_ms") - F.col(f"wts_{cfg.name}_gb") <= cfg.ttl_ms, gb)
            drop_extra += [f"wts_{cfg.name}_gt", f"wts_{cfg.name}_gb"]
        w = F.lit(float(cfg.normalize_weight))
        idx = F.sequence(F.lit(0), F.lit(dim - 1))
        # the reference divides two Longs (RateFeature.scala:346-348:
        # bottomGlobalNum.value / topGlobalNum.value) — integer division,
        # so the global ratio is truncated before entering the formula
        formula = F.transform(
            idx,
            lambda i: (w + F.get(t, i))
            / F.nullif(
                w
                * F.floor(
                    F.get(gb, i) / F.nullif(F.get(gt, i).cast("double"), F.lit(0.0))
                ).cast("double")
                + F.get(b, i),
                F.lit(0.0),
            ),
        )
        val = F.when(t.isNull() | b.isNull() | gt.isNull() | gb.isNull(), _nan_array(dim)).otherwise(formula)
        return out.withColumn(cfg.name, val).drop(
            f"vec_{cfg.name}_t", f"vec_{cfg.name}_b",
            f"vec_{cfg.name}_gt", f"vec_{cfg.name}_gb", *drop_extra,
        )

    def _attach_scalar(self, base, rankings, events, cfg):
        if getattr(cfg, "source", None) == "ranking":
            # FieldName(Ranking, field): the ranking event's own field,
            # constant across its items (NumberFeature values() Ranking
            # branch; StringFeature.scala:86-92 analog for the others)
            if isinstance(cfg, Number):
                val = F.col("__rk_num").getItem(cfg.field)
            elif isinstance(cfg, Boolean):
                head = F.col("__rk_str").getItem(cfg.field).getItem(0)
                val = F.when(head == "true", 1.0).when(head == "false", 0.0)
            else:  # WordCount
                head = F.col("__rk_str").getItem(cfg.field).getItem(0)
                val = F.when(
                    head.isNotNull(), F.size(F.split(head, r"\s+")).cast("double")
                )
            return base.withColumn(cfg.name, F.coalesce(val, F.lit(float("nan"))))
        if isinstance(cfg, Number):
            value = F.col("num_fields").getItem(cfg.field)
        elif isinstance(cfg, Boolean):
            value = F.when(
                F.col("str_fields").getItem(cfg.field).getItem(0) == "true", 1.0
            ).when(F.col("str_fields").getItem(cfg.field).getItem(0) == "false", 0.0)
        else:  # WordCount: token count stored at write (WordCountFeature.scala:47,74)
            value = F.size(
                F.split(F.col("str_fields").getItem(cfg.field).getItem(0), r"\s+")
            ).cast("double")
        s = self._rename_series(self._scalar_series(events, cfg.source, value), cfg.source)
        scope = cfg.source
        out = self._asof_to_base(base, rankings, s, scope, ["val"], f"_{cfg.name}")
        return out.withColumn(
            cfg.name, F.coalesce(F.col(f"val_{cfg.name}"), F.lit(float("nan")))
        ).drop(f"val_{cfg.name}")

    def _attach_string(self, base, rankings, events, cfg: StringEncode):
        if cfg.source == "ranking":
            raw = F.col("__rk_str").getItem(cfg.field)
            if cfg.encode == "index":
                mapping = F.array(*[F.lit(v) for v in cfg.values])
                val = F.coalesce(
                    F.array_position(mapping, F.get(raw, 0)), F.lit(0)
                ).cast("double")
            else:
                val = F.array(*[
                    F.when(F.array_contains(raw, v), 1.0).otherwise(0.0)
                    for v in cfg.values
                ])
            return base.withColumn(cfg.name, val)
        # store the full SStringList (StringFeature.scala:60-66 puts the
        # whole list); encoders read head (index) or all values (onehot)
        value = F.col("str_fields").getItem(cfg.field)
        s = self._rename_series(self._scalar_series(events, cfg.source, value), cfg.source)
        out = self._asof_to_base(base, rankings, s, cfg.source, ["val"], f"_{cfg.name}")
        raw = F.col(f"val_{cfg.name}")
        if cfg.encode == "index":
            # 0 = missing, i+1 otherwise (StringFeature.scala:119-138,
            # IndexCategoricalEncoder: values.headOption)
            mapping = F.array(*[F.lit(v) for v in cfg.values])
            val = F.coalesce(
                F.array_position(mapping, F.get(raw, 0)), F.lit(0)
            ).cast("double")
        else:
            # onehot: membership over ALL values (OneHotEncoder.fromValues)
            val = F.array(*[
                F.when(F.array_contains(raw, v), 1.0).otherwise(0.0)
                for v in cfg.values
            ])
        return out.withColumn(cfg.name, val).drop(f"val_{cfg.name}")

    def _attach_item_age(self, base, rankings, events, cfg: ItemAge):
        s = self._rename_series(
            self._scalar_series(events, "item", F.col("ts_ms").cast("double")), "item"
        )
        out = self._asof_to_base(base, rankings, s, "item", ["val"], f"_{cfg.name}")
        # whole seconds: ItemAgeFeature.scala:81 toSeconds truncates
        age = F.floor(
            (F.col("ts_ms") - F.col(f"val_{cfg.name}")) / 1000.0
        ).cast("double")
        return out.withColumn(
            cfg.name, F.coalesce(age, F.lit(float("nan")))
        ).drop(f"val_{cfg.name}")

    def _attach_relevancy(self, base, rankings, events, cfg: Relevancy):
        return base.withColumn(cfg.name, F.col("relevancy"))

    def _attach_position(self, base, rankings, events, cfg: Position):
        # OnlineInference emits the configured constant for EVERY item;
        # OfflineTraining the real item index (PositionFeature.values)
        if getattr(self, "_mode", "training") == "inference":
            return base.withColumn(cfg.name, F.lit(float(cfg.position)))
        return base.withColumn(cfg.name, F.col("position").cast("double"))

    def _attach_random(self, base, rankings, events, cfg: RandomFeature):
        r = F.rand(cfg.seed) if cfg.seed is not None else F.rand()
        return base.withColumn(cfg.name, r)

    def _attach_local_time(self, base, rankings, events, cfg: LocalTime):
        """LocalDateTimeFeature mappers at UTC (LocalDateTimeFeature.scala
        :36-40 + :58-95), value parity:

        - time_of_day = secondOfDay / 3600 (HOURS, 0..24 — not a 0..1
          day fraction)
        - day_of_week = ISO getDayOfWeek (1=Monday .. 7=Sunday)
        - second      = toEpochSecond (whole epoch seconds)
        - month_of_year / year via tz-free DATE arithmetic (calendar
          functions on TIMESTAMP would silently follow the session tz)

        hour/minute are engine extensions beyond the reference's mappers.

        Field-sourced variant (LocalDateTimeFeature.scala:41-53): the
        ranking field holds an ISO_DATE_TIME string parsed as
        ZonedDateTime — the mappers then read the string's OWN local
        calendar parts, so the implementation extracts them textually
        (regexp), never converting through the session timezone. Parse
        requires an explicit offset (Z or ±hh:mm), like
        ZonedDateTime.parse; anything else reads missing (NaN).
        """
        if cfg.source != "timestamp":
            return self._attach_local_time_field(base, cfg)
        ms = F.col("ts_ms")
        day = F.floor(ms / F.lit(DAY_MS))
        d = F.date_add(F.to_date(F.lit("1970-01-01")), day.cast("int"))
        parts = {
            "time_of_day": (ms % DAY_MS) / F.lit(3_600_000.0),
            "day_of_week": (((day + 3) % 7) + 1).cast("double"),  # ISO 1=Mon
            "hour": F.floor((ms % DAY_MS) / 3_600_000).cast("double"),
            "minute": F.floor((ms % 3_600_000) / 60_000).cast("double"),
            "second": F.floor(ms / 1000).cast("double"),  # epoch seconds
            "month_of_year": F.month(d).cast("double"),
            "year": F.year(d).cast("double"),
        }
        return base.withColumn(cfg.name, parts[cfg.part])

    def _attach_local_time_field(self, base, cfg: LocalTime):
        """ISO datetime string in a ranking field → local calendar parts,
        extracted textually (timezone-free; the string's own offset only
        enters the epoch-second mapper)."""
        raw = F.col("__rk_str").getItem(cfg.source).getItem(0)
        pat = (
            r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})"
            r"(?:\.\d+)?(Z|[+-]\d{2}:?\d{2})$"
        )

        def g(i):
            return F.regexp_extract(raw, pat, i)

        ok = g(7) != ""
        y, mo = g(1).cast("int"), g(2).cast("int")
        h, mi, s = g(4).cast("int"), g(5).cast("int"), g(6).cast("int")
        # epoch day of the LOCAL date via tz-free DATE arithmetic
        epoch_day = F.datediff(
            F.to_date(F.concat_ws("-", g(1), g(2), g(3))),
            F.to_date(F.lit("1970-01-01")),
        )
        off = g(7)
        off_sec = F.when(off == "Z", 0).otherwise(
            (F.when(F.substring(off, 1, 1) == "-", -1).otherwise(1))
            * (
                F.substring(off, 2, 2).cast("int") * 3600
                + F.regexp_extract(off, r"(\d{2})$", 1).cast("int") * 60
            )
        )
        sod = h * 3600 + mi * 60 + s
        parts = {
            "time_of_day": sod / F.lit(3600.0),
            "day_of_week": (((epoch_day + 3) % 7) + 1).cast("double"),
            "hour": h.cast("double"),
            "minute": mi.cast("double"),
            # toEpochSecond: local wall seconds minus the offset
            "second": (
                epoch_day.cast("long") * 86400 + sod.cast("long") - off_sec
            ).cast("double"),
            "month_of_year": mo.cast("double"),
            "year": y.cast("double"),
        }
        val = F.when(ok, parts[cfg.part]).otherwise(F.lit(float("nan")))
        return base.withColumn(cfg.name, val)

    def _attach_diversity(self, base, rankings, events, cfg: Diversity):
        """DiversityFeature: the candidate's field value vs the ranking's
        own distribution — numeric: value - median(first top_n items'
        values) (:118-130); string: share of candidate's values among all
        ranking items' values (:105-117)."""
        if cfg.kind == "numeric":
            val = F.col("num_fields").getItem(cfg.field)
        else:
            val = F.col("str_fields").getItem(cfg.field)
        s = self._rename_series(self._scalar_series(events, "item", val), "item")
        out = self._asof_to_base(base, rankings, s, "item", ["val"], f"_{cfg.name}")
        raw = F.col(f"val_{cfg.name}")
        rank_w = Window.partitionBy("ranking_id")
        if cfg.kind == "numeric":
            top_val = F.when(F.col("position") < cfg.top_n, raw)
            median = F.percentile(top_val, F.lit(0.5)).over(rank_w)
            feat = F.coalesce(raw - median, F.lit(float("nan")))
        else:
            all_vals = F.flatten(
                F.collect_list(F.coalesce(raw, F.array().cast("array<string>"))).over(rank_w)
            )
            total = F.size(all_vals)
            cand = F.coalesce(raw, F.array().cast("array<string>"))
            hits = F.aggregate(
                cand, F.lit(0),
                lambda acc, v: acc + F.size(F.filter(all_vals, lambda x: x == v)),
            )
            feat = F.when(total > 0, hits / total.cast("double")).otherwise(
                F.lit(float("nan"))
            )
        return out.withColumn(cfg.name, feat).drop(f"val_{cfg.name}")

    def _attach_map(self, base, rankings, events, cfg: MapFeature):
        """Two-phase exact plan bounded by per-entity key cardinality (the
        same bound MemMapFeature's state has): sub-stream per
        (entity, mapKey) carries the latest value; rankings join the
        entity's key dimension (small) and as-of each key, then fold back
        into one map column."""
        ent = _entity_col(cfg.scope)
        writes = events.filter(
            (F.col("event_type") == "interaction")
            & F.col("str_fields").getItem(cfg.key_field).getItem(0).isNotNull()
            & F.col("num_fields").getItem(cfg.value_field).isNotNull()
        ).select(
            ent.alias("entity"), "ts_ms", "seq",
            F.col("str_fields").getItem(cfg.key_field).getItem(0).alias("mkey"),
            F.col("num_fields").getItem(cfg.value_field).alias("mval"),
        )
        keys_dim = writes.select("entity", "mkey").distinct()
        if cfg.scope == "item":
            # item scope reads per CANDIDATE item, so the key dimension
            # joins the exploded per-item base, not the ranking row (the
            # rankings frame has no item_id column)
            left = base.select(
                "ranking_id", "position", F.col("item_id").alias("entity"),
                "ts_ms", "seq",
            ).join(keys_dim, "entity")
            joined = asof_join(
                left, writes, on=["entity", "mkey"],
                left_seq="seq", right_seq="seq", values=["mval"], strict=True,
            )
            per_item = (
                joined.filter(F.col("mval_asof").isNotNull())
                .groupBy("ranking_id", "position")
                .agg(
                    F.map_from_entries(
                        F.collect_list(F.struct(F.col("mkey"), F.col("mval_asof")))
                    ).alias(cfg.name)
                )
            )
            return base.join(per_item, ["ranking_id", "position"], "left")
        ent_read = {
            "user": F.col("user_id"), "session": F.col("session_id"),
            "global": F.lit(GLOBAL_ENTITY),
        }[cfg.scope]
        left = rankings.select(
            ent_read.alias("entity"), "ts_ms", "seq", "ranking_id"
        ).join(keys_dim, "entity")
        joined = asof_join(
            left, writes, on=["entity", "mkey"],
            left_seq="seq", right_seq="seq", values=["mval"], strict=True,
        )
        per_rank = (
            joined.filter(F.col("mval_asof").isNotNull())
            .groupBy("ranking_id")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct(F.col("mkey"), F.col("mval_asof")))
                ).alias(cfg.name)
            )
        )
        return base.join(per_rank, "ranking_id", "left")

    def _attach_interacted_with(self, base, rankings, events, cfg: InteractedWith):
        visited_s = self._bounded_list_series(events, cfg)
        out = self._asof_to_base(base, rankings, visited_s, cfg.scope, ["visited"], f"_{cfg.name}")
        visited = F.coalesce(F.col(f"visited_{cfg.name}"), F.array().cast("array<string>"))

        # ONE fused multi-field state series feeds both read paths — a
        # multi-field profile (the reference ships 4) costs one as-of
        # join per path, not len(fields)
        mfs = self._multi_field_series(events, cfg.fields)
        mf_cols = [f"__mf_{i}" for i in range(len(cfg.fields))]

        # candidate items' current field values (as-of the ranking)
        out = self._asof_to_base(out, rankings, mfs, "item", mf_cols,
                                 f"_{cfg.name}c")

        # visited items' current field values → per-ranking flattened
        # multisets, all fields in one explode + as-of + agg
        vis = out.select(
            "ranking_id", "ts_ms", "seq", visited.alias("__visited")
        ).dropDuplicates(["ranking_id"])
        vis_ex = vis.select(
            "ranking_id", "ts_ms", "seq", F.explode_outer("__visited").alias("item_id")
        )
        vis_j = asof_join(
            vis_ex, mfs, on="item_id",
            left_seq="seq", right_seq="seq", values=mf_cols,
            strict=True, suffix="_vf",
        )
        vis_flat = vis_j.groupBy("ranking_id").agg(*[
            F.flatten(F.collect_list(F.col(f"__mf_{i}_vf"))).alias(f"__vflat_{i}")
            for i in range(len(cfg.fields))
        ])
        out = out.join(vis_flat, "ranking_id", "left")

        score_cols = []
        for i in range(len(cfg.fields)):
            vflat = F.coalesce(
                F.col(f"__vflat_{i}"), F.array().cast("array<string>"))
            cand = F.coalesce(
                F.col(f"__mf_{i}_{cfg.name}c"), F.array().cast("array<string>")
            )
            # score: Σ over candidate's values of multiset count among visited
            # (InteractedWithFeature.scala:133-164)
            score = F.aggregate(
                cand,
                F.lit(0.0),
                lambda acc, v: acc + F.size(F.filter(vflat, lambda x: x == v)),
            )
            out = out.withColumn(f"__score_{cfg.name}_{i}", score)
            score_cols.append(f"__score_{cfg.name}_{i}")
            out = out.drop(f"__mf_{i}_{cfg.name}c", f"__vflat_{i}")

        out = out.withColumn(cfg.name, F.array(*[F.col(c) for c in score_cols]))
        return out.drop(f"visited_{cfg.name}", *score_cols)
