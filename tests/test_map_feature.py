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


def test_local_time_field_sourced_iso_parsing(spark):
    """LocalDateTimeFeature field branch (LocalDateTimeFeature.scala:41-53):
    an ISO datetime STRING in a ranking field is parsed as ZonedDateTime
    and the mappers read ITS local calendar — independent of the Spark
    session timezone. No offset → parse failure → missing."""
    import math

    from metarank_spark.engine import LocalTime

    rows = [
        ranking_event(
            "r1", ["p1"], T0, 1, user="u1", session="s1",
            str_fields={"dt": ["2024-03-05T12:30:45+02:00"]},
        ),
        ranking_event(
            "r2", ["p1"], T0 + 1, 2, user="u1", session="s1",
            str_fields={"dt": ["2024-03-05T12:30:45"]},  # no offset → missing
        ),
    ]
    eng = FeatureEngine([
        LocalTime("tod", part="time_of_day", source="dt"),
        LocalTime("dow", part="day_of_week", source="dt"),
        LocalTime("moy", part="month_of_year", source="dt"),
        LocalTime("yr", part="year", source="dt"),
        LocalTime("sec", part="second", source="dt"),
    ])
    got = {r["ranking_id"]: r.asDict()
           for r in eng.ranking_values(events_df(spark, rows)).collect()}
    r1 = got["r1"]
    assert abs(r1["tod"] - (12 * 3600 + 30 * 60 + 45) / 3600.0) < 1e-9
    assert r1["dow"] == 2.0   # 2024-03-05 is a Tuesday (ISO 2)
    assert r1["moy"] == 3.0 and r1["yr"] == 2024.0
    # epoch second: 2024-03-05T12:30:45+02:00 == 10:30:45 UTC
    import datetime
    exp = datetime.datetime(2024, 3, 5, 10, 30, 45,
                            tzinfo=datetime.timezone.utc).timestamp()
    assert r1["sec"] == exp
    assert all(math.isnan(got["r2"][c]) for c in ("tod", "dow", "moy", "yr", "sec"))


def test_local_time_yaml_source_parse(spark):
    from metarank_spark.config import load_config

    cfg = load_config(
        "features:\n"
        "  - name: hour\n"
        "    type: local_time\n"
        "    source: ranking.dt\n"
        "    parse: time_of_day\n"
    )
    f = cfg.features[0]
    assert f.part == "time_of_day" and f.source == "dt"
    import pytest
    with pytest.raises(ValueError):
        load_config(
            "features:\n  - {name: h, type: local_time,"
            " source: item.dt, parse: year}"
        )
