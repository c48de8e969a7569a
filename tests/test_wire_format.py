"""Metarank-native JSON wire format + Snowplow envelopes → canonical
events (sources/wire.py), decoded per the reference's circe codecs
(model/Event.scala:60-127, source/format/SnowplowFormat.scala:10-59)."""

from __future__ import annotations

import json

from metarank_spark.sources.wire import (
    SNOWPLOW_SCHEMAS,
    read_snowplow_json,
    read_snowplow_tsv,
    read_wire_events,
)

WIRE = [
    {"event": "item", "id": "e1", "timestamp": "1636993838000", "item": "p1",
     "fields": [
         {"name": "title", "value": "hello"},
         {"name": "price", "value": 69.0},
         {"name": "genres", "value": ["a", "b"]},
         {"name": "vec", "value": [1.0, 2.5]},
         {"name": "active", "value": True},
     ]},
    # 'metadata' is the legacy alias for item (Event.scala:121)
    {"event": "metadata", "id": "e2", "timestamp": 1636993839000, "item": "p2",
     "fields": [{"name": "price", "value": 10}]},
    # ISO zoned timestamp (EventCodecs.timestampCodec)
    {"event": "user", "id": "e3", "timestamp": "2021-11-15T17:10:40.000Z",
     "user": "u1", "fields": []},
    {"event": "ranking", "id": "r1", "timestamp": "1636993841000", "user": "u1",
     "session": "s1", "items": [
         {"id": "p1", "relevancy": 2.0, "label": 3,
          "fields": [{"name": "color", "value": "blue"}]},
         {"id": "p2"},
     ]},
    {"event": "interaction", "id": "i1", "timestamp": "1636993842000",
     "ranking": "r1", "user": "u1", "session": "s1", "item": "p1",
     "type": "click"},
]


def _write(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_wire_jsonl_decodes_all_event_types(spark, tmp_path):
    src = _write(tmp_path, "ev.jsonl", [json.dumps(e) for e in WIRE])
    rows = {r["event_id"]: r for r in read_wire_events(spark, src).collect()}
    assert len(rows) == 5
    e1 = rows["e1"]
    assert e1["event_type"] == "item" and e1["ts_ms"] == 1636993838000
    assert e1["str_fields"]["title"] == ["hello"]
    assert e1["str_fields"]["genres"] == ["a", "b"]
    assert e1["str_fields"]["active"] == ["true"]
    assert e1["num_fields"]["price"] == 69.0
    assert e1["numlist_fields"]["vec"] == [1.0, 2.5]
    assert rows["e2"]["event_type"] == "item"  # metadata alias
    assert rows["e2"]["num_fields"]["price"] == 10.0
    assert rows["e3"]["ts_ms"] == 1636996240000  # ISO zoned parse
    r1 = rows["r1"]
    assert [(i["id"], i["relevancy"]) for i in r1["items"]] == [("p1", 2.0), ("p2", 1.0)]
    assert r1["items"][0]["label"] == 3                       # explicit judgment
    assert r1["items"][0]["str_fields"]["color"] == ["blue"]  # per-item override
    assert r1["items"][1]["label"] is None
    i1 = rows["i1"]
    assert (i1["ranking_id"], i1["interaction_type"]) == ("r1", "click")
    # file-order seq is a valid (ts, seq) total order tie-break
    assert rows["e1"]["seq"] < rows["e2"]["seq"] < rows["e3"]["seq"]


def test_wire_events_drive_the_engine(spark, tmp_path):
    from metarank_spark.engine import FeatureEngine, InteractionCount, Number

    src = _write(tmp_path, "ev2.jsonl", [json.dumps(e) for e in WIRE])
    ev = read_wire_events(spark, src)
    eng = FeatureEngine([
        Number("price", "price"),
        InteractionCount("clicks", "click", scope="user"),
    ])
    out = {(r["ranking_id"], r["position"]): r.asDict()
           for r in eng.ranking_values(ev).collect()}
    assert out[("r1", 0)]["price"] == 69.0   # p1's item field, as-of
    assert out[("r1", 1)]["price"] == 10.0   # p2 via metadata alias
    assert out[("r1", 0)]["clicks"] == 0.0   # click happens after r1


def _snowplow_unstruct(ev, schema="iglu:ai.metarank/item/jsonschema/1-0-0"):
    return json.dumps({
        "schema": "iglu:com.snowplowanalytics.snowplow/unstruct_event/jsonschema/1-0-0",
        "data": {"schema": schema, "data": ev},
    })


def test_snowplow_tsv_field59_and_schema_filter(spark, tmp_path):
    ok = _snowplow_unstruct(WIRE[0])
    bad = _snowplow_unstruct(WIRE[1], schema="iglu:other/thing/jsonschema/1-0-0")
    lines = ["\t".join([""] * 58 + [ok]), "\t".join([""] * 58 + [bad])]
    src = _write(tmp_path, "sp.tsv", lines)
    rows = read_snowplow_tsv(spark, src).collect()
    assert len(rows) == 1  # unsupported schema dropped (Stream.empty)
    assert rows[0]["event_id"] == "e1"
    assert rows[0]["num_fields"]["price"] == 69.0


def test_snowplow_json_unstruct_event(spark, tmp_path):
    line = json.dumps({
        "app_id": "x",
        "unstruct_event": {
            "schema": "iglu:com.snowplowanalytics.snowplow/unstruct_event/jsonschema/1-0-0",
            "data": {"schema": SNOWPLOW_SCHEMAS[3], "data": WIRE[3]},
        },
    })
    src = _write(tmp_path, "sp.json", [line])
    rows = read_snowplow_json(spark, src).collect()
    assert len(rows) == 1 and rows[0]["event_id"] == "r1"
    assert [i["id"] for i in rows[0]["items"]] == ["p1", "p2"]
