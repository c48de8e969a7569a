"""Golden tests for FeatureEngine — fixtures and expected values transcribed
from the reference's own unit tests (values, not code):

- RateFeatureTest.scala:63-76       → ctr [0.25, 0.25]
- WindowInteractionCountFeatureTest.scala:47-58 → cnt [3.0]
- InteractedWithFeatureTest.scala:105-120 → [1.0],[1.0],[0.0]
- model/Feature.scala:142-161       → anchor-at-last-bucket periodic window
- RanklensTest.scala:95-100         → same-ts interactions do not leak
- MValue.scala:38,56-61             → missing = NaN / NaN-vector
- InteractionCountFeature.scala:55-58 → missing count reads 0.0
"""

from __future__ import annotations

import math

import pytest

from metarank_spark.engine import (
    DAY_MS,
    FeatureEngine,
    InteractedWith,
    InteractionCount,
    ItemAge,
    Number,
    Rate,
    StringEncode,
    WindowCount,
)
from metarank_spark.events import (
    events_df,
    interaction_event,
    item_event,
    ranking_event,
)

T0 = 1_700_000_000_000  # fixture epoch


def click(item, ts, seq, type="click", session="s1", user="u1"):
    return interaction_event(item, type, ts, seq, user=user, session=session)


def run(spark, rows, features):
    df = FeatureEngine(features).ranking_values(events_df(spark, rows))
    return {(r["ranking_id"], r["position"]): r.asDict() for r in df.collect()}


def nan_eq(a, b, tol=1e-9):
    if isinstance(a, list):
        return len(a) == len(b) and all(nan_eq(x, y) for x, y in zip(a, b))
    if a is None or b is None:
        return a is b
    if isinstance(a, float) and math.isnan(a):
        return isinstance(b, float) and math.isnan(b)
    return abs(a - b) <= tol


def test_rate_golden(spark):
    """4 impressions + 1 click on p1 → ctr [0.25, 0.25] (RateFeatureTest)."""
    rows = [
        click("p1", T0, 1, type="impression"),
        click("p1", T0, 2, type="impression"),
        click("p1", T0, 3, type="impression"),
        click("p1", T0, 4, type="impression"),
        click("p1", T0, 5, type="click"),
        ranking_event("r1", ["p1"], T0 + 1000, 6, user="u1", session="s1"),
    ]
    out = run(spark, rows, [Rate("ctr", "click", "impression", (7, 14))])
    assert nan_eq(out[("r1", 0)]["ctr"], [0.25, 0.25])


def test_window_count_golden(spark):
    """3 clicks on p1 → cnt [3.0] (WindowInteractionCountFeatureTest)."""
    rows = [
        click("p1", T0, 1),
        click("p1", T0, 2),
        click("p1", T0, 3),
        ranking_event("r1", ["p1"], T0 + 1000, 4, user="u1", session="s1"),
    ]
    out = run(spark, rows, [WindowCount("cnt", "click", (1,))])
    assert nan_eq(out[("r1", 0)]["cnt"], [3.0])


def test_window_count_missing_is_nan_vector(spark):
    """No state for p2 → NaN vector (MValue.scala:56-61)."""
    rows = [
        click("p1", T0, 1),
        ranking_event("r1", ["p2"], T0 + 1000, 2, user="u1", session="s1"),
    ]
    out = run(spark, rows, [WindowCount("cnt", "click", (1, 7))])
    v = out[("r1", 0)]["cnt"]
    assert len(v) == 2 and all(math.isnan(x) for x in v)


def test_interaction_count_and_missing_zero(spark):
    rows = [
        click("p1", T0, 1),
        click("p1", T0 + 10, 2),
        ranking_event("r1", ["p1", "p2"], T0 + 1000, 3, user="u1", session="s1"),
    ]
    out = run(spark, rows, [InteractionCount("clicks", "click")])
    assert out[("r1", 0)]["clicks"] == 2.0
    assert out[("r1", 1)]["clicks"] == 0.0  # missing → 0.0


def test_interacted_with_golden(spark):
    """p1=red p2=green, impressions on p1,p2 in s1, ranking [p1,p2,p3]
    → overlap [1.0],[1.0],[0.0] (InteractedWithFeatureTest.scala:105-120)."""
    rows = [
        item_event("p1", T0, 1, str_fields={"color": ["red"]}),
        item_event("p2", T0 + 1, 2, str_fields={"color": ["green"]}),
        click("p1", T0 + 100, 3, type="impression"),
        click("p2", T0 + 101, 4, type="impression"),
        ranking_event("r1", ["p1", "p2", "p3"], T0 + 1000, 5, user="u1", session="s1"),
    ]
    out = run(
        spark, rows,
        [InteractedWith("seen", "impression", ("color",), scope="session", count=10)],
    )
    assert nan_eq(out[("r1", 0)]["seen"], [1.0])
    assert nan_eq(out[("r1", 1)]["seen"], [1.0])
    assert nan_eq(out[("r1", 2)]["seen"], [0.0])


def test_periodic_anchor_at_last_bucket(spark):
    """Writes in buckets d0 and d5, ranking in d9, periods=[7]: the window
    anchors at the LAST WRITE bucket (d5), so [d5-7, d5] covers both writes
    → 2, not the ranking-anchored [d9-7, d9] → 1
    (model/Feature.scala:142-161)."""
    rows = [
        click("p1", T0, 1),
        click("p1", T0 + 5 * DAY_MS, 2),
        ranking_event("r1", ["p1"], T0 + 9 * DAY_MS, 3, user="u1", session="s1"),
    ]
    out = run(spark, rows, [WindowCount("cnt", "click", (7,))])
    assert nan_eq(out[("r1", 0)]["cnt"], [2.0])


def test_zero_leakage_same_ts(spark):
    """A ranking never sees interactions at the same (or later) timestamp —
    the snapshot is strictly-before (RanklensTest.scala:95-100 contract)."""
    rows = [
        click("p1", T0, 1),
        ranking_event("r1", ["p1"], T0 + 500, 2, user="u1", session="s1"),
        # same-ts click ordered AFTER the ranking in stream order
        click("p1", T0 + 500, 3),
        ranking_event("r2", ["p1"], T0 + 500, 4, user="u1", session="s1"),
        ranking_event("r3", ["p1"], T0 + 600, 5, user="u1", session="s1"),
    ]
    out = run(spark, rows, [InteractionCount("clicks", "click")])
    assert out[("r1", 0)]["clicks"] == 1.0  # only the first click
    assert out[("r2", 0)]["clicks"] == 2.0  # earlier seq at same ts IS visible
    assert out[("r3", 0)]["clicks"] == 2.0


def test_number_and_missing_nan(spark):
    rows = [
        item_event("p1", T0, 1, num_fields={"price": 9.5}),
        item_event("p1", T0 + 10, 2, num_fields={"price": 11.0}),
        ranking_event("r1", ["p1", "p2"], T0 + 1000, 3, user="u1", session="s1"),
    ]
    out = run(spark, rows, [Number("price", "price")])
    assert out[("r1", 0)]["price"] == 11.0  # last write wins
    assert math.isnan(out[("r1", 1)]["price"])  # missing → NaN


def test_string_index_encode(spark):
    rows = [
        item_event("p1", T0, 1, str_fields={"color": ["green"]}),
        ranking_event("r1", ["p1", "p2"], T0 + 1000, 2, user="u1", session="s1"),
    ]
    out = run(
        spark, rows,
        [StringEncode("color", "color", ("red", "green", "blue"), encode="index")],
    )
    assert out[("r1", 0)]["color"] == 2.0  # green → idx 1 → 2 (0=missing)
    assert out[("r1", 1)]["color"] == 0.0


def test_item_age(spark):
    rows = [
        item_event("p1", T0, 1),
        ranking_event("r1", ["p1"], T0 + 90_000, 2, user="u1", session="s1"),
    ]
    out = run(spark, rows, [ItemAge("age")])
    assert abs(out[("r1", 0)]["age"] - 90.0) < 1e-9


def test_bounded_list_eviction(spark):
    """count=2: only the 2 newest visited items survive
    (MemBoundedList.scala:34 take(count))."""
    rows = [
        item_event("p1", T0, 1, str_fields={"c": ["a"]}),
        item_event("p2", T0, 2, str_fields={"c": ["b"]}),
        item_event("p3", T0, 3, str_fields={"c": ["x"]}),
        click("p1", T0 + 1, 4, type="impression"),
        click("p2", T0 + 2, 5, type="impression"),
        click("p3", T0 + 3, 6, type="impression"),
        ranking_event("r1", ["p1", "p2", "p3"], T0 + 1000, 7, user="u1", session="s1"),
    ]
    out = run(
        spark, rows,
        [InteractedWith("seen", "impression", ("c",), scope="session", count=2)],
    )
    # visited = [p3, p2] (p1 evicted) → p1 scores 0, p2/p3 score 1
    assert nan_eq(out[("r1", 0)]["seen"], [0.0])
    assert nan_eq(out[("r1", 1)]["seen"], [1.0])
    assert nan_eq(out[("r1", 2)]["seen"], [1.0])


def test_bounded_list_duration_eviction(spark):
    """duration: elements older than (append ts - duration) are dropped at
    write time (MemBoundedList.scala:34 filter)."""
    rows = [
        item_event("p1", T0, 1, str_fields={"c": ["a"]}),
        item_event("p2", T0, 2, str_fields={"c": ["b"]}),
        click("p1", T0 + 1, 3, type="impression"),
        click("p2", T0 + 1 + 2 * DAY_MS, 4, type="impression"),  # p1 now stale
        ranking_event("r1", ["p1", "p2"], T0 + 2 * DAY_MS + 1000, 5, user="u1", session="s1"),
    ]
    out = run(
        spark, rows,
        [InteractedWith("seen", "impression", ("c",), scope="session",
                        count=10, duration_ms=DAY_MS)],
    )
    assert nan_eq(out[("r1", 0)]["seen"], [0.0])  # p1 evicted by duration
    assert nan_eq(out[("r1", 1)]["seen"], [1.0])


def test_string_onehot_multivalue(spark):
    """onehot sets 1.0 at EVERY stored list value, not only the head
    (util/OneHotEncoder.scala fromValues; StringFeature.scala:122)."""
    rows = [
        item_event("p1", T0, 1, str_fields={"color": ["green", "red"]}),
        item_event("p2", T0, 2, str_fields={"color": ["blue"]}),
        ranking_event("r1", ["p1", "p2", "p3"], T0 + 1000, 3, user="u1", session="s1"),
    ]
    out = run(
        spark, rows,
        [StringEncode("color", "color", ("red", "green", "blue"), encode="onehot")],
    )
    assert out[("r1", 0)]["color"] == [1.0, 1.0, 0.0]  # red AND green
    assert out[("r1", 1)]["color"] == [0.0, 0.0, 1.0]
    assert out[("r1", 2)]["color"] == [0.0, 0.0, 0.0]  # no write → zeros


def test_string_index_multivalue_head(spark):
    """index encode uses the list head only (IndexCategoricalEncoder
    values.headOption, StringFeature.scala:125-137)."""
    rows = [
        item_event("p1", T0, 1, str_fields={"color": ["green", "red"]}),
        ranking_event("r1", ["p1"], T0 + 1000, 2, user="u1", session="s1"),
    ]
    out = run(
        spark, rows,
        [StringEncode("color", "color", ("red", "green", "blue"), encode="index")],
    )
    assert out[("r1", 0)]["color"] == 2.0  # head=green → idx 1 → 2


def test_item_age_truncates_to_whole_seconds(spark):
    """ItemAgeFeature.scala:81: toSeconds truncates — 90.9 s reads 90."""
    rows = [
        item_event("p1", T0, 1),
        ranking_event("r1", ["p1"], T0 + 90_900, 2, user="u1", session="s1"),
    ]
    out = run(spark, rows, [ItemAge("age")])
    assert out[("r1", 0)]["age"] == 90.0


def test_rate_normalized_integer_global_ratio(spark):
    """RateFeature.scala:346-348 divides the global Long counters with
    integer division: gBottom=5 impressions / gTop=2 clicks → ratio 2
    (not 2.5). weight=1: (1+2)/(1*2+5) = 3/7."""
    rows = [
        click("p1", T0, 1, type="impression"),
        click("p1", T0, 2, type="impression"),
        click("p1", T0, 3, type="impression"),
        click("p1", T0, 4, type="impression"),
        click("p1", T0, 5, type="impression"),
        click("p1", T0, 6, type="click"),
        click("p1", T0, 7, type="click"),
        ranking_event("r1", ["p1"], T0 + 1000, 8, user="u1", session="s1"),
    ]
    out = run(
        spark, rows,
        [Rate("nctr", "click", "impression", (7,), normalize_weight=1.0)],
    )
    assert nan_eq(out[("r1", 0)]["nctr"], [3.0 / 7.0])


def test_ranking_time_field_overrides(spark):
    """values() prefers the rank item's own fields over stored state
    (NumberFeature.scala:84-94; StringFeature.scala:95-105)."""
    from metarank_spark.engine import WordCount

    rows = [
        item_event("p1", T0, 1, str_fields={"color": ["red"], "title": ["one two"]},
                   num_fields={"price": 5.0}),
        ranking_event(
            "r1",
            [
                {"id": "p1", "num_fields": {"price": 99.0},
                 "str_fields": {"color": ["blue", "green"], "title": ["a b c d"]}},
                "p2",  # no state, no override → missing
            ],
            T0 + 1000, 2, user="u1", session="s1",
        ),
    ]
    out = run(
        spark, rows,
        [
            Number("price", "price"),
            StringEncode("color", "color", ("red", "green", "blue"), encode="onehot"),
            WordCount("twords", "title"),
        ],
    )
    r0 = out[("r1", 0)]
    assert r0["price"] == 99.0                      # override beats state 5.0
    assert r0["color"] == [0.0, 1.0, 1.0]           # encode(override list)
    assert r0["twords"] == 4.0                      # 'a b c d'
    r1 = out[("r1", 1)]
    assert math.isnan(r1["price"]) and r1["color"] == [0.0, 0.0, 0.0]


def test_explicit_labels_win_over_interactions(spark):
    """RankItem labels → rel interactions that outrank weight labels
    (TrainBuffer.explicitLabelInteractions + ClickthroughQuery.scala:20-24)."""
    from metarank_spark.engine import FeatureEngine, InteractionCount
    from metarank_spark.operators.clickthrough import training_matrix

    rows = [
        ranking_event(
            "r1",
            [{"id": "p1", "label": 3}, {"id": "p2"}, {"id": "p3", "label": 0}],
            T0, 1, user="u1", session="s1",
        ),
        click("p2", T0 + 100, 2),
    ]
    # attach the click to the ranking (FK)
    rows[1]["ranking_id"] = "r1"
    eng = FeatureEngine([InteractionCount("clicks", "click")])
    from metarank_spark.events import events_df

    out = {
        (r["ranking_id"], r["item_id"]): r["label"]
        for r in training_matrix(events_df(spark, rows), eng).collect()
    }
    assert out[("r1", "p1")] == 3.0   # explicit judgment
    assert out[("r1", "p2")] == 1.0   # click weight
    assert out[("r1", "p3")] == 0.0   # explicit zero


def test_ranking_sourced_fields(spark):
    """source='ranking': the extractor reads the RANKING event's own
    field as a per-ranking constant across items (FieldName(Ranking, f),
    StringFeature.scala:86-92 / NumberFeature Ranking branch)."""
    from metarank_spark.engine import WordCount

    rows = [
        ranking_event("r1", ["p1", "p2"], T0, 1, user="u1", session="s1",
                      str_fields={"query": ["two words here"],
                                  "channel": ["web"]},
                      num_fields={"page": 2.0}),
    ]
    out = run(
        spark, rows,
        [
            Number("page", "page", source="ranking"),
            WordCount("qwords", "query", source="ranking"),
            StringEncode("chan", "channel", ("web", "app"), encode="index",
                         source="ranking"),
        ],
    )
    for pos in (0, 1):  # constant across the ranking's items
        r = out[("r1", pos)]
        assert r["page"] == 2.0
        assert r["qwords"] == 3.0
        assert r["chan"] == 1.0  # web → index 0 → 1
