"""YAML config ingestion (metarank_spark/config.py) — parse a
reference-style config (ranklens/config.yml shapes) and run the engine
from it end-to-end."""

from __future__ import annotations

import pytest

from metarank_spark.config import LoadedConfig, load_config, parse_duration_ms
from metarank_spark.engine import (
    FeatureEngine,
    InteractionCount,
    Number,
    Rate,
    StringEncode,
    WindowCount,
)

YAML = """
features:
  - name: popularity
    type: number
    scope: item
    source: metadata.popularity
    ttl: 60d
    refresh: 1h
  - name: genre
    type: string
    scope: item
    source: item.genres
    encode: index
    values: [drama, comedy, thriller]
  - name: ctr
    type: rate
    top: click
    bottom: impression
    bucket: 24h
    periods: [7, 30]
    normalize:
      weight: 10
  - name: global_item_click_count
    type: interaction_count
    interaction: click
    scope: item
  - name: day_item_click_count
    type: window_count
    interaction: click
    scope: item
    bucket: 24h
    periods: [7, 30]
models:
  xgboost:
    type: lambdamart
    features: [popularity, genre, ctr]
"""


def test_parse_reference_style_yaml():
    cfg = load_config(YAML)
    assert isinstance(cfg, LoadedConfig)
    by_name = {f.name: f for f in cfg.features}
    assert by_name["popularity"] == Number(
        "popularity", "popularity", source="item", ttl_ms=60 * 86_400_000
    )
    assert by_name["genre"] == StringEncode(
        "genre", "genres", ("drama", "comedy", "thriller"), encode="index", source="item"
    )
    ctr = by_name["ctr"]
    assert isinstance(ctr, Rate) and ctr.periods == (7, 30) and ctr.normalize_weight == 10
    assert isinstance(by_name["global_item_click_count"], InteractionCount)
    wc = by_name["day_item_click_count"]
    assert isinstance(wc, WindowCount) and wc.bucket_ms == 86_400_000
    assert cfg.refresh_ms == {"popularity": 3_600_000}
    assert cfg.ttl_ms == {"popularity": 60 * 86_400_000}
    assert "xgboost" in cfg.models


def test_durations_and_errors():
    assert parse_duration_ms("90d") == 90 * 86_400_000
    assert parse_duration_ms("250ms") == 250
    assert parse_duration_ms(42) == 42
    with pytest.raises(ValueError):
        parse_duration_ms("yesterday")
    # ua now parses (requires source + field); ONNX encoders stay out
    cfg = load_config(
        "features:\n  - {name: x, type: ua, source: ranking.ua, field: browser}"
    )
    assert cfg.features[0].mapper == "browser"
    with pytest.raises(NotImplementedError):
        load_config("features:\n  - {name: x, type: field_match_bi_encoder}")
    # field scopes are supported on rate (ScopedRateFeatureTest parity) —
    # but only with item./ranking. heads, and only on the counter types
    cfg = load_config(
        "features:\n  - {name: x, type: rate, top: a, bottom: b,"
        " periods: [7], scope: item.tag}"
    )
    assert cfg.features[0].scope == "item.tag"
    with pytest.raises(NotImplementedError):
        load_config(
            "features:\n  - {name: x, type: rate, top: a, bottom: b,"
            " periods: [7], scope: session.tag}"
        )


def test_engine_runs_from_yaml(spark):
    from metarank_spark.events import (
        events_df,
        interaction_event,
        item_event,
        ranking_event,
    )

    cfg = load_config(YAML)
    eng = FeatureEngine(cfg.features)
    t0 = 1_700_000_000_000
    rows = [
        item_event("p1", t0, 1, str_fields={"genres": ["comedy"]},
                   num_fields={"popularity": 7.5}),
        interaction_event("p1", "impression", t0 + 10, 2, user="u1", session="s1"),
        interaction_event("p1", "click", t0 + 20, 3, user="u1", session="s1"),
        ranking_event("r1", ["p1"], t0 + 1000, 4, user="u1", session="s1"),
    ]
    out = {(r["ranking_id"], r["position"]): r.asDict()
           for r in eng.ranking_values(events_df(spark, rows)).collect()}
    row = out[("r1", 0)]
    assert row["popularity"] == 7.5
    assert row["genre"] == 2.0  # comedy → index 1 → 2 (0 = missing)
    assert row["global_item_click_count"] == 1.0


def test_autofeature_yaml_roundtrip(spark):
    """AutoFeature → YAML → load_config → FeatureEngine runs end-to-end
    (the reference's AutoFeature emits a YAML config users feed back in)."""
    from metarank_spark.autofeature import suggest_yaml
    from metarank_spark.events import (
        events_df,
        interaction_event,
        item_event,
        ranking_event,
    )

    t0 = 1_700_000_000_000
    rows = [
        item_event("p1", t0, 1, str_fields={"color": ["red"]},
                   num_fields={"price": 9.0}),
        ranking_event("r1", ["p1"], t0 + 50, 2, user="u1", session="s1"),
        interaction_event("p1", "impression", t0 + 100, 3, user="u1",
                          session="s1", ranking="r1"),
        interaction_event("p1", "click", t0 + 200, 4, user="u1",
                          session="s1", ranking="r1"),
        ranking_event("r2", ["p1"], t0 + 1000, 5, user="u1", session="s1"),
    ]
    ev = events_df(spark, rows)
    text = suggest_yaml(ev)
    cfg = load_config(text)
    names = {f.name for f in cfg.features}
    assert {"item_age", "click_count", "num_price", "str_color"} <= names
    # observed values flow into the string encoder
    enc = next(f for f in cfg.features if f.name == "str_color")
    assert enc.values == ("red",)
    out = FeatureEngine(cfg.features).ranking_values(ev)
    rows_out = {(r["ranking_id"], r["position"]): r.asDict() for r in out.collect()}
    assert rows_out[("r2", 0)]["click_count"] == 1.0
    assert rows_out[("r2", 0)]["str_color"] == 1.0  # red → index 0 → 1


def test_engine_section_hot_config(spark):
    """The engine: section threads hot-entity salting into FeatureEngine
    — a pure-YAML user can enable it without code."""
    from metarank_spark.config import load_config
    from metarank_spark.engine import FeatureEngine

    cfg = load_config("""
features:
  - { type: interaction_count, name: clicks, interaction: click }
engine:
  hot_chunk: 1d
  hot_entities: [u_hot, p9]
""")
    assert cfg.hot_chunk_ms == 86_400_000
    assert cfg.hot_entities == ["u_hot", "p9"]
    eng = FeatureEngine(cfg.features, **cfg.engine_kwargs())
    assert eng.hot_chunk_ms == 86_400_000 and eng.hot_entities == ["u_hot", "p9"]
    # absent section → plain engine
    plain = load_config("features:\n  - { type: interaction_count, name: c, interaction: click }\n")
    assert plain.engine_kwargs() == {"hot_chunk_ms": None, "hot_entities": None}
