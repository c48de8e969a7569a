"""Adversarial zero-leakage proof over the full feature set: appending
events that happen AFTER (or at the same timestamp but later stream order
than) every ranking must leave every ranking's feature matrix bit-for-bit
unchanged."""

from __future__ import annotations

from metarank_spark.engine import (
    FeatureEngine,
    Freq,
    InteractedWith,
    InteractionCount,
    MapFeature,
    Number,
    Rate,
    RecentItems,
    Stats,
    WindowCount,
)
from metarank_spark.events import events_df, interaction_event, item_event, ranking_event
from metarank_spark.operators.clickthrough import training_matrix
from tests.test_property_parity import gen_events

T0 = 1_704_067_200_000
DAY = 86_400_000

FEATURES = [
    InteractionCount("clicks", "click"),
    WindowCount("wcnt", "click", (7,)),
    Rate("ctr", "click", "impression", (7,)),
    Number("price", "price"),
    Stats("st", "price", pool=5, percentiles=(50,)),
    Freq("fr", "kind", pool=5),
    RecentItems("rec", "click", count=3),
    MapFeature("spend", "kind", "price", scope="user"),
    InteractedWith("seen", "click", ("color",), scope="session"),
]


def _canon(df):
    rows = []
    for r in df.collect():
        d = r.asDict()
        rows.append(tuple(sorted((k, str(v)) for k, v in d.items())))
    return sorted(rows)


def test_future_events_never_change_past_snapshots(spark):
    base_rows = gen_events(5)
    # enrich with fields so every feature has data
    for r in base_rows:
        if r["event_type"] == "interaction":
            r["num_fields"] = {"price": 5.0}
            r["str_fields"] = {"kind": ["a"]}
    extra = []
    max_ts = max(r["ts_ms"] for r in base_rows)
    max_seq = max(r["seq"] for r in base_rows)
    # hostile future: huge values, new items, same-ts-later-seq events
    for i in range(40):
        extra.append(interaction_event(
            f"p{i % 8}", "click", max_ts + (0 if i < 10 else i * 1000),
            max_seq + 1 + i, user=f"u{i % 6}", session=f"u{i % 6}",
            num_fields={"price": 1e9}, str_fields={"kind": ["ZZZ"]},
        ))
        extra.append(item_event(f"p{i % 8}", max_ts + i * 1000, max_seq + 100 + i,
                                str_fields={"color": ["poison"]},
                                num_fields={"price": -1e9}))

    eng = FeatureEngine(FEATURES)
    before = _canon(eng.ranking_values(events_df(spark, base_rows)))
    after_df = eng.ranking_values(events_df(spark, base_rows + extra))
    after = _canon(after_df)
    assert before == after


def test_future_events_never_change_training_matrix_features(spark):
    """Same property through the full training_matrix path (labels DO see
    the ranking's own later interactions by design — they're the target —
    so compare feature columns only, for the pre-existing rankings)."""
    rows = [
        item_event("p1", T0, 1, str_fields={"color": ["red"]}),
        ranking_event("r1", ["p1", "p2"], T0 + 100, 2, user="u1", session="s1"),
        interaction_event("p1", "click", T0 + 200, 3, user="u1", session="s1", ranking="r1"),
    ]
    future = [
        interaction_event("p1", "click", T0 + DAY, 10, user="u1", session="s1"),
        interaction_event("p2", "click", T0 + DAY, 11, user="u1", session="s1"),
    ]
    eng = FeatureEngine([InteractionCount("clicks", "click"), Rate("ctr", "click", "impression", (7,))])
    a = training_matrix(events_df(spark, rows), eng)
    b = training_matrix(events_df(spark, rows + future), eng)
    cols = ["ranking_id", "item_id", "clicks", "ctr"]
    ka = sorted(map(str, a.select(cols).collect()))
    kb = sorted(map(str, b.filter("ranking_id = 'r1'").select(cols).collect()))
    assert ka == kb
