"""AutoFeature (main/command/AutoFeature.scala:33-60): single-pass event
profiling that proposes a feature config. One aggregation job over the
event table; the output is a list of feature-config dicts compatible with
jobs/backfill.py --features."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ONEHOT_CARD = 16


def profile_events(events: DataFrame) -> dict:
    """Summary stats driving the proposals."""
    itypes = [
        r["interaction_type"]
        for r in events.filter(F.col("event_type") == "interaction")
        .select("interaction_type").distinct().collect()
        if r["interaction_type"]
    ]
    num_fields = [
        r["k"]
        for r in events.select(F.explode_outer(F.map_keys("num_fields")).alias("k"))
        .filter(F.col("k").isNotNull()).distinct().collect()
    ]
    str_stats = {
        r["k"]: (r["card"], sorted(r["vals"]))
        for r in events.select(F.explode_outer("str_fields").alias("k", "v"))
        .filter(F.col("k").isNotNull())
        .select("k", F.explode("v").alias("val"))
        .groupBy("k")
        .agg(
            F.countDistinct("val").alias("card"),
            # observed value set, only materialized for low-card fields
            # (collect_set bounded by the cardinality filter below)
            F.when(
                F.countDistinct("val") <= MAX_ONEHOT_CARD, F.collect_set("val")
            ).otherwise(F.array().cast("array<string>")).alias("vals"),
        )
        .collect()
    }
    return {
        "interaction_types": sorted(itypes),
        "num_fields": sorted(num_fields),
        "str_cards": {k: c for k, (c, _) in str_stats.items()},
        "str_values": {k: v for k, (_, v) in str_stats.items()},
    }


def suggest_features(events: DataFrame) -> list[dict]:
    """Mirrors the reference's rules: count+window per interaction type, a
    rate for the two most frequent types, number per numeric field,
    string-onehot for low-cardinality string fields, item_age always."""
    p = profile_events(events)
    out: list[dict] = [{"type": "item_age", "name": "item_age"}]
    for t in p["interaction_types"]:
        out.append({"type": "interaction_count", "name": f"{t}_count", "interaction": t})
        out.append({"type": "window_count", "name": f"{t}_wcnt",
                    "interaction": t, "periods": [7, 30]})
    if len(p["interaction_types"]) >= 2:
        top, bottom = p["interaction_types"][0], p["interaction_types"][1]
        out.append({"type": "rate", "name": f"{top}_{bottom}_rate",
                    "top": top, "bottom": bottom, "periods": [7, 30]})
    for fld in p["num_fields"]:
        out.append({"type": "number", "name": f"num_{fld}", "field": fld})
    for fld, card in sorted(p["str_cards"].items()):
        if card <= MAX_ONEHOT_CARD:
            out.append({"type": "string", "name": f"str_{fld}", "field": fld,
                        "values": p["str_values"].get(fld, []), "encode": "index"})
    return out


def suggest_yaml(events: DataFrame) -> str:
    """Render the proposals as a reference-style YAML config (the same
    shape AutoFeature.scala emits), round-trippable through
    config.load_config → FeatureEngine."""
    import yaml

    entries = []
    for f in suggest_features(events):
        e = dict(f)
        t = e["type"]
        if t in ("number", "string", "word_count"):
            e["source"] = f"item.{e.pop('field')}"
            e["scope"] = "item"
        if t in ("rate", "window_count"):
            e["bucket"] = "24h"
        entries.append(e)
    return yaml.safe_dump({"features": entries}, sort_keys=False)
