"""Engine-level MapFeature: latest value per map key, strictly before."""

from __future__ import annotations

from metarank_spark.engine import FeatureEngine, MapFeature
from metarank_spark.events import events_df, interaction_event, ranking_event

T0 = 1_700_000_000_000


def test_map_feature_upsert_and_strictness(spark):
    rows = [
        interaction_event("p1", "click", T0 + 1, 1, user="u1",
                          str_fields={"cat": ["shoes"]}, num_fields={"amount": 10.0}),
        interaction_event("p1", "click", T0 + 2, 2, user="u1",
                          str_fields={"cat": ["shoes"]}, num_fields={"amount": 30.0}),
        interaction_event("p1", "click", T0 + 3, 3, user="u1",
                          str_fields={"cat": ["hats"]}, num_fields={"amount": 7.0}),
        ranking_event("r1", ["p1"], T0 + 100, 4, user="u1", session="s1"),
        # same-ts write after the ranking must NOT leak
        interaction_event("p1", "click", T0 + 100, 5, user="u1",
                          str_fields={"cat": ["shoes"]}, num_fields={"amount": 99.0}),
        ranking_event("r2", ["p1"], T0 + 200, 6, user="u1", session="s1"),
    ]
    eng = FeatureEngine([MapFeature("spend", "cat", "amount", scope="user")])
    out = {r["ranking_id"]: r["spend"] for r in eng.ranking_values(events_df(spark, rows)).collect()}
    assert out["r1"] == {"shoes": 30.0, "hats": 7.0}  # upsert: latest per key
    assert out["r2"] == {"shoes": 99.0, "hats": 7.0}


def test_map_feature_missing_is_null(spark):
    rows = [ranking_event("r1", ["p1"], T0, 1, user="u1", session="s1")]
    eng = FeatureEngine([MapFeature("spend", "cat", "amount", scope="user")])
    out = eng.ranking_values(events_df(spark, rows)).collect()
    assert out[0]["spend"] is None
