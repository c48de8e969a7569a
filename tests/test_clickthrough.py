"""Clickthrough join + impression injection goldens (transcribed from
flow/ImpressionInjectTest + TrainBuffer semantics + FIXTURES.md)."""

from __future__ import annotations

from pyspark.sql import functions as F

from metarank_spark.engine import FeatureEngine, Rate
from metarank_spark.events import events_df, interaction_event, ranking_event
from metarank_spark.operators.clickthrough import (
    clickthroughs,
    inject_impressions,
    training_matrix,
)

T0 = 1_700_000_000_000


def test_impression_inject_up_to_max_clicked_position(spark):
    """Ranking [a,b,c,d,e], clicks on b and d → impressions for a,b,c,d with
    the ranking's id; VALUE ts = the ranking's ts (vts_ms), COMMIT position
    = last interaction + maxSessionLength (ImpressionInject.scala:16-41 +
    TrainBuffer.scala:160-167 expireAfterWrite)."""
    gap = 30 * 60 * 1000
    rows = [
        ranking_event("r1", ["a", "b", "c", "d", "e"], T0, 1, user="u1", session="s1"),
        interaction_event("b", "click", T0 + 10, 2, user="u1", session="s1", ranking="r1"),
        interaction_event("d", "click", T0 + 20, 3, user="u1", session="s1", ranking="r1"),
    ]
    out = inject_impressions(events_df(spark, rows))
    imp = out.filter(F.col("interaction_type") == "impression").orderBy("item_id").collect()
    assert [r["item_id"] for r in imp] == ["a", "b", "c", "d"]
    assert all(r["vts_ms"] == T0 for r in imp)          # ranking's ts (payload)
    assert all(r["ts_ms"] == T0 + 20 + gap for r in imp)  # commit at expiry
    assert all(r["event_id"] == "r1" and r["ranking_id"] == "r1" for r in imp)
    assert all(r["seq"] == 2 * 3 + 1 for r in imp)
    # original events re-sequenced to even slots, order preserved
    orig = out.filter(F.col("interaction_type").isNull() | (F.col("interaction_type") == "click"))
    assert sorted(r["seq"] for r in orig.collect()) == [2, 4, 6]
    # legacy commit-at-completion mode: ts stays the ranking's ts, and no
    # vts_ms column is emitted (no late writes → no anchor machinery)
    legacy = inject_impressions(events_df(spark, rows), commit_at_expiry=False)
    assert "vts_ms" not in legacy.columns
    limp = legacy.filter(F.col("interaction_type") == "impression").collect()
    assert all(r["ts_ms"] == T0 for r in limp)


def test_interaction_on_unknown_item_ignored(spark):
    """Interactions over items not in the ranking produce no impressions
    (ImpressionInject.scala:19-24 warn + Nil)."""
    rows = [
        ranking_event("r1", ["a", "b"], T0, 1, user="u1", session="s1"),
        interaction_event("zz", "click", T0 + 10, 2, user="u1", session="s1", ranking="r1"),
    ]
    out = inject_impressions(events_df(spark, rows))
    assert out.filter(F.col("interaction_type") == "impression").count() == 0


def test_clickthroughs_require_interactions(spark):
    rows = [
        ranking_event("r1", ["a"], T0, 1, user="u1", session="s1"),
        ranking_event("r2", ["b"], T0 + 10, 2, user="u1", session="s1"),
        interaction_event("b", "click", T0 + 20, 3, user="u1", session="s1", ranking="r2"),
    ]
    cts = clickthroughs(events_df(spark, rows)).collect()
    assert [r["ranking_id"] for r in cts] == ["r2"]


def test_training_matrix_rate_via_injected_impressions(spark):
    """End-to-end: ranking r1 [p1,p2] click p1. A ranking INSIDE r1's
    session window does not yet see the injected impressions
    (commit-at-expiry); one after the expiry does."""
    gap = 30 * 60 * 1000
    rows = [
        ranking_event("r1", ["p1", "p2"], T0, 1, user="u1", session="s1"),
        interaction_event("p1", "click", T0 + 1000, 2, user="u1", session="s1", ranking="r1"),
        # 100 s later: r1's buffer is still open → no impressions visible
        ranking_event("r2", ["p1", "p2"], T0 + 100_000, 3, user="u1", session="s1"),
        interaction_event("p2", "click", T0 + 101_000, 4, user="u1", session="s1", ranking="r2"),
        # well past both expiries → sees clicks + injected impressions
        ranking_event("r3", ["p1", "p2"], T0 + 2 * gap + 200_000, 5, user="u1", session="s1"),
    ]
    eng = FeatureEngine([Rate("ctr", "click", "impression", (7,))])
    tm = training_matrix(events_df(spark, rows), eng)
    got = {(r["ranking_id"], r["item_id"]): r.asDict() for r in tm.collect()}
    import math
    # r2/p1: click state exists but NO impressions committed yet → missing
    assert all(math.isnan(x) for x in got[("r2", "p1")]["ctr"])
    assert got[("r2", "p1")]["label"] == 0.0
    assert got[("r2", "p2")]["label"] == 1.0
    # r3: r1 injected 1 impression on p1 (max clicked pos 1); r2 injected
    # impressions on p1, p2 (clicked pos 2) → p1: 2 clicks? no — clicks:
    # p1 got 1 (r1), p2 got 1 (r2); impressions: p1 = 2, p2 = 1
    assert got[("r3", "p1")]["ctr"] == [0.5]
    assert got[("r3", "p2")]["ctr"] == [1.0]
    # r1 snapshot strictly-before: no state at all
    assert all(math.isnan(x) for x in got[("r1", "p1")]["ctr"])


def test_impression_visibility_commit_at_expiry(spark):
    """Reference semantics (flipped from the round-2 pinned deviation):
    a clickthrough's injected impressions commit when the session buffer
    EVICTS it — expireAfterWrite(maxSessionLength) on an event-time
    ticker, reset by every interaction put (TrainBuffer.scala:160-167 +
    evictionListener) — so a later same-session ranking INSIDE the expiry
    window does NOT see them, while one after the expiry does. The batch
    engine realizes this with the commit-ts/value-ts split: injected rows
    order at last_interaction + maxSessionLength but bucket at the
    ranking's ts. ``commit_at_expiry=False`` keeps the old
    commit-at-completion ordering."""
    from metarank_spark.engine import FeatureEngine, InteractionCount
    from metarank_spark.events import events_df, interaction_event, ranking_event

    t0 = 1_700_000_000_000
    gap = 30 * 60 * 1000
    rows = [
        ranking_event("r1", ["p1", "p2"], t0, 1, user="u1", session="s1"),
        interaction_event("p2", "click", t0 + 1_000, 2, user="u1",
                          session="s1", ranking="r1"),
        # second ranking 10 min later — inside the 30-min session window,
        # so r1's impressions are NOT yet committed
        ranking_event("r2", ["p1", "p2"], t0 + 600_000, 3, user="u1", session="s1"),
        interaction_event("p1", "click", t0 + 601_000, 4, user="u1",
                          session="s1", ranking="r2"),
        # third ranking after every expiry → sees r1's 2 + r2's 1
        ranking_event("r3", ["p1"], t0 + 601_000 + gap + 1, 5, user="u1", session="s1"),
    ]
    eng = FeatureEngine([InteractionCount("imps", "impression", scope="user")])
    ev = events_df(spark, rows)
    out = {
        (r["ranking_id"], r["item_id"]): r["imps"]
        for r in training_matrix(ev, eng).collect()
    }
    # r1's snapshot predates everything: 0 impressions
    assert out[("r1", "p1")] == 0.0
    # commit-at-expiry: r2 sees NOTHING from r1 yet
    assert out[("r2", "p1")] == 0.0
    # after expiry: r1 injected p1,p2 (max pos 2); r2 injected p1 (pos 1)
    assert out[("r3", "p1")] == 3.0
    # legacy commit-at-completion: r2 sees r1's 2 injected impressions
    legacy = {
        (r["ranking_id"], r["item_id"]): r["imps"]
        for r in training_matrix(ev, eng, commit_at_expiry=False).collect()
    }
    assert legacy[("r2", "p1")] == 2.0


def test_batch_expiry_matches_streaming_twin_fixture(spark):
    """The batch commit-at-expiry injection agrees with the streaming
    TrainBuffer twin on the twin's own fixture: same injected items, same
    VALUE ts (the ranking's), same COMMIT time (last interaction +
    maxSessionLength), and rankings without interactions never flush."""
    gap = 30 * 60 * 1000
    rows = [
        ranking_event("r1", ["p1", "p2", "p3"], T0, 1, user="u1", session="s1"),
        interaction_event("p2", "click", T0 + 60_000, 2, user="u1",
                          session="s1", ranking="r1"),
        interaction_event("p1", "click", T0 + 120_000, 3, user="u1",
                          session="s1", ranking="r1"),
        ranking_event("r2", ["p4"], T0 + 10_000, 4, user="u2", session="s2"),
        ranking_event("r9", ["p9"], T0 + 10 * gap, 5, user="u9", session="s9"),
    ]
    out = inject_impressions(events_df(spark, rows), max_session_ms=gap)
    imp = sorted(
        (r["ranking_id"], r["item_id"], r["vts_ms"], r["ts_ms"])
        for r in out.filter(F.col("interaction_type") == "impression").collect()
    )
    # == the streaming twin's asserted output in
    # test_streaming_multimodal.py::test_streaming_clickthrough_commit_at_expiry
    # (ts_ms there = ranking payload ts, commit_ms = expiry)
    assert imp == [
        ("r1", "p1", T0, T0 + 120_000 + gap),
        ("r1", "p2", T0, T0 + 120_000 + gap),
    ]


def test_periodic_anchor_exact_under_late_writes(spark):
    """PeriodicCounter anchor under the commit/value-ts split
    (model/Feature.scala:139-161 fromMap anchors at the last bucket IN
    STATE): a late write into an OLD bucket must not drag the anchor
    back. Stream (daily buckets, entity p1, 'impression' counter):

      i1: real impression, day D
      i2: real impression, day D+1           → state {D:1, D+1:1}
      i3: LATE impression committed after i2 with value ts in day D
                                             → state {D:2, D+1:1}
      ranking after i3, reads periods=(1,)   → anchor D+1, buckets
                                               [D, D+1] → 3

    A naive own-bucket anchor on the last write (i3, day D) would read
    buckets [D-1, D] = 2."""
    from metarank_spark.engine import DAY_MS, FeatureEngine, WindowCount
    from metarank_spark.events import EVENT_SCHEMA

    d0 = (T0 // DAY_MS) * DAY_MS  # midnight of day D
    rows = [
        interaction_event("p1", "impression", d0 + 3_600_000, 1, user="u1"),
        interaction_event("p1", "impression", d0 + DAY_MS + 600_000, 2, user="u1"),
        # late: committed at D+1 00:21, value ts D 23:50
        interaction_event("p1", "impression", d0 + DAY_MS + 1_260_000, 3, user="u1"),
        ranking_event("r1", ["p1"], d0 + DAY_MS + 1_800_000, 4, user="u1", session="s1"),
    ]
    ev = events_df(spark, rows).withColumn(
        "vts_ms",
        F.when(F.col("seq") == 3, F.lit(d0 + DAY_MS - 600_000)).cast("long"),
    )
    eng = FeatureEngine([WindowCount("imp_w", "impression", (1,))])
    got = {r["ranking_id"]: r["imp_w"] for r in eng.ranking_values(ev).collect()}
    assert got["r1"] == [3.0]
    # and with periods=(0,)-like narrow window the state-max bucket alone:
    eng2 = FeatureEngine([WindowCount("imp_w", "impression", (1, 7))])
    got2 = {r["ranking_id"]: r["imp_w"] for r in eng2.ranking_values(ev).collect()}
    assert got2["r1"] == [3.0, 3.0]
