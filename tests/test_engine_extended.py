"""Goldens for the extended extractor set (local_time, vector, stats,
freq, recent_items, diversity) — expected values hand-computed from the
reference semantics cited in each config's docstring."""

from __future__ import annotations

import math

from metarank_spark.engine import (
    Diversity,
    FeatureEngine,
    Freq,
    LocalTime,
    RecentItems,
    Stats,
    Vector,
)
from metarank_spark.events import events_df, interaction_event, item_event, ranking_event

DAY = 86_400_000
T0 = 1_704_067_200_000  # 2024-01-01 00:00 UTC (Monday)


def run(spark, rows, features):
    df = FeatureEngine(features).ranking_values(events_df(spark, rows))
    return {(r["ranking_id"], r["position"]): r.asDict() for r in df.collect()}


def test_local_time_parts(spark):
    ts = T0 + 2 * DAY + 5 * 3_600_000 + 30 * 60_000  # Wed 05:30 UTC
    rows = [ranking_event("r1", ["p1"], ts, 1, user="u1")]
    out = run(spark, rows, [
        LocalTime("dow", "day_of_week"), LocalTime("hour", "hour"),
        LocalTime("tod", "time_of_day"), LocalTime("month", "month_of_year"),
    ])
    r = out[("r1", 0)]
    assert r["dow"] == 3.0  # Wednesday, ISO getDayOfWeek (1=Monday)
    assert r["hour"] == 5.0
    # time_of_day = secondOfDay/3600, i.e. hours 0..24
    # (LocalDateTimeFeature.scala:64-69)
    assert abs(r["tod"] - 5.5) < 1e-12
    assert r["month"] == 1.0


def test_vector_reducers(spark):
    rows = [
        item_event("p1", T0, 1, numlist_fields={"emb": [3.0, 1.0, 2.0]}),
        ranking_event("r1", ["p1", "p2"], T0 + 1000, 2, user="u1"),
    ]
    out = run(spark, rows, [Vector("v", "emb")])  # min,max,size,avg
    assert out[("r1", 0)]["v"] == [1.0, 3.0, 3.0, 2.0]
    assert all(math.isnan(x) for x in out[("r1", 1)]["v"])


def test_stats_pool(spark):
    rows = [
        interaction_event("p1", "click", T0 + i, i, user="u1", num_fields={"price": float(i)})
        for i in range(1, 6)  # samples 1..5
    ] + [ranking_event("r1", ["p1"], T0 + 1000, 9, user="u1")]
    out = run(spark, rows, [Stats("st", "price", pool=10, percentiles=(50,))])
    assert out[("r1", 0)]["st"] == [1.0, 5.0, 3.0]  # min, max, p50


def test_stats_pool_eviction(spark):
    rows = [
        interaction_event("p1", "click", T0 + i, i, user="u1", num_fields={"price": float(i)})
        for i in range(1, 6)
    ] + [ranking_event("r1", ["p1"], T0 + 1000, 9, user="u1")]
    out = run(spark, rows, [Stats("st", "price", pool=3, percentiles=(50,))])
    assert out[("r1", 0)]["st"] == [3.0, 5.0, 4.0]  # pool = last 3 samples


def test_freq_pool(spark):
    types = ["a", "a", "b", "a"]
    rows = [
        interaction_event("p1", "click", T0 + i, i, user="u1", str_fields={"kind": [t]})
        for i, t in enumerate(types, start=1)
    ] + [ranking_event("r1", ["p1"], T0 + 1000, 9, user="u1")]
    out = run(spark, rows, [Freq("fr", "kind", pool=10)])
    assert out[("r1", 0)]["fr"] == {"a": 0.75, "b": 0.25}


def test_recent_items(spark):
    rows = [
        interaction_event("p1", "click", T0 + 1, 1, user="u1", session="s1"),
        interaction_event("p2", "click", T0 + 2, 2, user="u1", session="s1"),
        interaction_event("p3", "click", T0 + 3, 3, user="u1", session="s1"),
        ranking_event("r1", ["p9"], T0 + 1000, 4, user="u1", session="s1"),
    ]
    out = run(spark, rows, [RecentItems("rec", "click", count=2)])
    assert out[("r1", 0)]["rec"] == ["p3", "p2"]  # newest first, count evict


def test_diversity_numeric(spark):
    rows = [
        item_event("p1", T0, 1, num_fields={"price": 10.0}),
        item_event("p2", T0, 2, num_fields={"price": 20.0}),
        item_event("p3", T0, 3, num_fields={"price": 60.0}),
        ranking_event("r1", ["p1", "p2", "p3"], T0 + 1000, 4, user="u1"),
    ]
    out = run(spark, rows, [Diversity("div", "price", kind="numeric", top_n=10)])
    # median(10,20,60)=20 → deltas -10, 0, +40
    assert out[("r1", 0)]["div"] == -10.0
    assert out[("r1", 1)]["div"] == 0.0
    assert out[("r1", 2)]["div"] == 40.0


def test_diversity_string(spark):
    rows = [
        item_event("p1", T0, 1, str_fields={"genre": ["rock"]}),
        item_event("p2", T0, 2, str_fields={"genre": ["rock"]}),
        item_event("p3", T0, 3, str_fields={"genre": ["jazz"]}),
        ranking_event("r1", ["p1", "p2", "p3"], T0 + 1000, 4, user="u1"),
    ]
    out = run(spark, rows, [Diversity("div", "genre", kind="string")])
    # histogram rock:2 jazz:1 of 3 → shares 2/3, 2/3, 1/3
    assert abs(out[("r1", 0)]["div"] - 2 / 3) < 1e-12
    assert abs(out[("r1", 2)]["div"] - 1 / 3) < 1e-12
