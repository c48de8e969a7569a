"""Field-scoped feature state (ItemFieldScope / RankingFieldScope,
model/Scope.scala:43-52): counters keyed by a field VALUE — e.g. CTR per
category — with the entity derived by an as-of hop at write time and at
read time. Goldens transcribed from the reference's
ScopedRateFeatureTest.scala and RankFieldScopedRateFeatureTest.scala."""

from __future__ import annotations

import math

import pytest

from metarank_spark.config import load_config
from metarank_spark.engine import (
    FeatureEngine,
    InteractionCount,
    Rate,
    WindowCount,
)
from metarank_spark.events import (
    events_df,
    interaction_event,
    item_event,
    ranking_event,
)

T0 = 1_700_000_000_000


def _values(spark, rows, features):
    eng = FeatureEngine(features)
    out = eng.ranking_values(events_df(spark, rows))
    return {(r["ranking_id"], r["item_id"]): r.asDict() for r in out.collect()}


def test_item_field_scoped_rate_golden(spark):
    """ScopedRateFeatureTest 'compute value for field matches': 3 red
    items share one ItemFieldScope('color','red') bucket — 4 impressions
    and 1 click across p1/p2/p3 give ctr [0.25, 0.25] when ranking p1;
    p4 (green) and p5 (no color) increment other/no scopes."""
    rows = [
        item_event("p1", T0 + 1, 1, str_fields={"color": ["red"]}),
        item_event("p2", T0 + 2, 2, str_fields={"color": ["red"]}),
        item_event("p3", T0 + 3, 3, str_fields={"color": ["red"]}),
        item_event("p4", T0 + 4, 4, str_fields={"color": ["green"]}),
        item_event("p5", T0 + 5, 5, str_fields={"size": ["xl"]}),
        interaction_event("p1", "impression", T0 + 10, 6, user="u1"),
        interaction_event("p2", "impression", T0 + 11, 7, user="u1"),
        interaction_event("p3", "impression", T0 + 12, 8, user="u1"),
        interaction_event("p2", "impression", T0 + 13, 9, user="u1"),
        interaction_event("p4", "impression", T0 + 14, 10, user="u1"),  # mismatch
        interaction_event("p5", "impression", T0 + 15, 11, user="u1"),  # mismatch
        interaction_event("p1", "click", T0 + 16, 12, user="u1"),
        interaction_event("p4", "click", T0 + 17, 13, user="u1"),  # mismatch
        interaction_event("p5", "click", T0 + 18, 14, user="u1"),  # mismatch
        ranking_event("r1", ["p1"], T0 + 100, 15, user="u1", session="s1"),
    ]
    got = _values(spark, rows, [
        Rate("ctr", "click", "impression", (7, 14), scope="item.color"),
    ])
    assert got[("r1", "p1")]["ctr"] == [0.25, 0.25]


def test_item_field_scope_missing_field_reads_nan(spark):
    """An item with no field value has no target scope →
    VectorValue.missing (RateFeature.scala value() targetScopeOption)."""
    rows = [
        item_event("p1", T0 + 1, 1, str_fields={"color": ["red"]}),
        interaction_event("p1", "impression", T0 + 10, 2, user="u1"),
        interaction_event("p1", "click", T0 + 11, 3, user="u1"),
        ranking_event("r1", ["p1", "p9"], T0 + 100, 4, user="u1", session="s1"),
    ]
    got = _values(spark, rows, [
        Rate("ctr", "click", "impression", (7,), scope="item.color"),
    ])
    assert got[("r1", "p1")]["ctr"] == [1.0]
    assert all(math.isnan(v) for v in got[("r1", "p9")]["ctr"])


def test_item_field_value_read_as_of_write_time(spark):
    """An interaction BEFORE the item carries the field writes nothing;
    after a recolor, later increments land in the NEW color's bucket
    while old ones stay in the old bucket."""
    rows = [
        interaction_event("p1", "click", T0 + 0, 1, user="u1"),  # no field yet → Nil
        item_event("p1", T0 + 1, 2, str_fields={"color": ["red"]}),
        interaction_event("p1", "click", T0 + 2, 3, user="u1"),   # red += 1
        item_event("p1", T0 + 3, 4, str_fields={"color": ["blue"]}),
        interaction_event("p1", "click", T0 + 4, 5, user="u1"),   # blue += 1
        # p2 is red NOW: reads the red bucket (1 click), not blue's
        item_event("p2", T0 + 5, 6, str_fields={"color": ["red"]}),
        ranking_event("r1", ["p1", "p2"], T0 + 100, 7, user="u1", session="s1"),
    ]
    got = _values(spark, rows, [
        InteractionCount("clicks", "click", scope="item.color"),
        WindowCount("wc", "click", (7,), scope="item.color"),
    ])
    # p1 is blue as-of r1 → blue bucket has 1 click
    assert got[("r1", "p1")]["clicks"] == 1.0
    assert got[("r1", "p1")]["wc"] == [1.0]
    # p2 is red as-of r1 → red bucket has 1 click
    assert got[("r1", "p2")]["clicks"] == 1.0


def test_ranking_field_scoped_rate_golden(spark):
    """RankFieldScopedRateFeatureTest 'compute value for field matches':
    increments keyed by (the interaction's ranking's query value, item);
    reads keyed by (the CURRENT ranking's query value, item). p1 under
    query=test: 1 click / 2 impressions → [0.5, 0.5]."""
    rows = [
        ranking_event("r1", ["p1", "p2"], T0 + 1, 1, user="u1", session="s1",
                      str_fields={"query": ["test"]}),
        interaction_event("p1", "impression", T0 + 2, 2, user="u1", ranking="r1"),
        interaction_event("p2", "impression", T0 + 3, 3, user="u1", ranking="r1"),
        interaction_event("p1", "click", T0 + 4, 4, user="u1", ranking="r1"),
        ranking_event("r2", ["p1", "p2"], T0 + 5, 5, user="u1", session="s1",
                      str_fields={"query": ["test"]}),
        interaction_event("p1", "impression", T0 + 6, 6, user="u1", ranking="r2"),
        interaction_event("p2", "impression", T0 + 7, 7, user="u1", ranking="r2"),
        interaction_event("p2", "click", T0 + 8, 8, user="u1", ranking="r2"),
        ranking_event("r3", ["p1"], T0 + 100, 9, user="u1", session="s1",
                      str_fields={"query": ["test"]}),
    ]
    got = _values(spark, rows, [
        Rate("ctr", "click", "impression", (7, 14), scope="ranking.query"),
    ])
    assert got[("r3", "p1")]["ctr"] == [0.5, 0.5]


def test_ranking_field_scope_other_query_is_missing(spark):
    """A ranking with a DIFFERENT query value reads a different scope —
    no state there → missing."""
    rows = [
        ranking_event("r1", ["p1"], T0 + 1, 1, user="u1", session="s1",
                      str_fields={"query": ["shoes"]}),
        interaction_event("p1", "impression", T0 + 2, 2, user="u1", ranking="r1"),
        interaction_event("p1", "click", T0 + 3, 3, user="u1", ranking="r1"),
        ranking_event("r2", ["p1"], T0 + 100, 4, user="u1", session="s1",
                      str_fields={"query": ["hats"]}),
        ranking_event("r3", ["p1"], T0 + 101, 5, user="u1", session="s1",
                      str_fields={"query": ["shoes"]}),
    ]
    got = _values(spark, rows, [
        Rate("ctr", "click", "impression", (7,), scope="ranking.query"),
    ])
    assert all(math.isnan(v) for v in got[("r2", "p1")]["ctr"])
    assert got[("r3", "p1")]["ctr"] == [1.0]


def test_field_scope_yaml_config(spark):
    cfg = load_config(
        "features:\n"
        "  - name: ctr\n"
        "    type: rate\n"
        "    top: click\n"
        "    bottom: impression\n"
        "    bucket: 24h\n"
        "    periods: [7, 14]\n"
        "    scope: item.color\n"
    )
    assert cfg.features[0].scope == "item.color"
    # unsupported heads still rejected
    with pytest.raises(NotImplementedError):
        load_config(
            "features:\n"
            "  - name: iw\n"
            "    type: interacted_with\n"
            "    interaction: click\n"
            "    field: item.color\n"
            "    scope: item.color\n"
        )


def test_field_scoped_rate_with_ttl(spark):
    from metarank_spark.engine import DAY_MS

    rows = [
        item_event("p1", T0, 1, str_fields={"color": ["red"]}),
        interaction_event("p1", "impression", T0 + 1, 2, user="u1"),
        interaction_event("p1", "click", T0 + 2, 3, user="u1"),
        ranking_event("r1", ["p1"], T0 + 10 * DAY_MS, 4, user="u1", session="s1"),
    ]
    stale = _values(spark, rows, [
        Rate("ctr", "click", "impression", (30,), scope="item.color",
             ttl_ms=7 * DAY_MS),
    ])
    assert all(math.isnan(v) for v in stale[("r1", "p1")]["ctr"])
    fresh = _values(spark, rows, [
        Rate("ctr", "click", "impression", (30,), scope="item.color",
             ttl_ms=11 * DAY_MS),
    ])
    assert fresh[("r1", "p1")]["ctr"] == [1.0]
