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


def test_map_feature_item_scope_reads_per_candidate(spark):
    """Item-scoped MapFeature: each candidate item reads ITS OWN latest
    value per map key strictly before the ranking (was an
    AnalysisException: rankings carry no item_id column)."""
    rows = [
        interaction_event("p1", "click", T0 + 1, 1, user="u1",
                          str_fields={"cat": ["shoes"]}, num_fields={"amount": 10.0}),
        interaction_event("p2", "click", T0 + 2, 2, user="u1",
                          str_fields={"cat": ["shoes"]}, num_fields={"amount": 5.0}),
        interaction_event("p1", "click", T0 + 3, 3, user="u2",
                          str_fields={"cat": ["hats"]}, num_fields={"amount": 7.0}),
        ranking_event("r1", ["p1", "p2", "p3"], T0 + 100, 4, user="u1", session="s1"),
    ]
    eng = FeatureEngine([MapFeature("spend", "cat", "amount", scope="item")])
    out = {r["item_id"]: r["spend"]
           for r in eng.ranking_values(events_df(spark, rows)).collect()}
    assert out["p1"] == {"shoes": 10.0, "hats": 7.0}  # both users' writes, per item
    assert out["p2"] == {"shoes": 5.0}
    assert out["p3"] is None


def test_map_feature_global_scope(spark):
    rows = [
        interaction_event("p1", "click", T0 + 1, 1, user="u1",
                          str_fields={"cat": ["shoes"]}, num_fields={"amount": 10.0}),
        interaction_event("p2", "click", T0 + 2, 2, user="u2",
                          str_fields={"cat": ["shoes"]}, num_fields={"amount": 4.0}),
        ranking_event("r1", ["p9"], T0 + 100, 3, user="u3", session="s3"),
    ]
    eng = FeatureEngine([MapFeature("spend", "cat", "amount", scope="global")])
    out = eng.ranking_values(events_df(spark, rows)).collect()
    assert out[0]["spend"] == {"shoes": 4.0}  # latest write wins globally


def test_position_training_vs_inference_mode(spark):
    """PositionFeatureTest parity: item index at OfflineTraining, the
    configured constant at OnlineInference (PositionFeature.scala:30-35)."""
    from metarank_spark.engine import Position

    rows = [ranking_event("r1", ["p1", "p2", "p3"], T0, 1, user="u1", session="s1")]
    eng = FeatureEngine([Position("pos", position=5)])
    train = {r["item_id"]: r["pos"]
             for r in eng.ranking_values(events_df(spark, rows)).collect()}
    assert train == {"p1": 0.0, "p2": 1.0, "p3": 2.0}
    infer = {r["item_id"]: r["pos"]
             for r in eng.ranking_values(events_df(spark, rows), mode="inference").collect()}
    assert infer == {"p1": 5.0, "p2": 5.0, "p3": 5.0}


def test_position_yaml_config_round_trip(spark):
    from metarank_spark.config import load_config

    cfg = load_config("features:\n  - name: pos\n    type: position\n    position: 7\n")
    assert cfg.features[0].position == 7
