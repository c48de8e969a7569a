"""Streaming incremental features match the batch engine; multimodal
mapInPandas plumbing produces stable, deterministic features."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from metarank_spark.events import events_df, interaction_event
from metarank_spark.functions.multimodal import (
    FEATURE_DIM,
    extract_features,
    synthetic_media,
)
from metarank_spark.streaming.pipeline import (
    run_stream_to_parquet,
    stream_events,
    streaming_interaction_count,
)

T0 = 1_700_000_000_000


def test_streaming_counter_matches_batch(spark, tmp_path):
    rows = []
    seq = 0
    for u in range(4):
        for k in range(5):
            seq += 1
            rows.append(
                interaction_event("p1", "click", T0 + k * 1000 + u, seq, user=f"u{u}")
            )
    ev = events_df(spark, rows)
    src = str(tmp_path / "events_in")
    ev.write.parquet(src)

    stream = stream_events(spark, src)
    result = streaming_interaction_count(stream, "click", entity="user_id")
    out_path, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = run_stream_to_parquet(result, out_path, ckpt)
    q.awaitTermination(120)

    got = {
        (r["entity"], r["seq"]): r["value"]
        for r in spark.read.parquet(out_path).collect()
    }
    # batch oracle: running count per user over (ts, seq)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id").orderBy("ts_ms", "seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = {
        (r["user_id"], r["seq"]): r["v"]
        for r in ev.select("user_id", "seq", F.count(F.lit(1)).over(w).alias("v")).collect()
    }
    assert got == exp


def test_streaming_resume_from_checkpoint(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    ev1 = events_df(spark, [interaction_event("p1", "click", T0 + i, i, user="u1") for i in range(1, 4)])
    ev1.write.mode("append").parquet(src)
    out_path, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    stream = stream_events(spark, src)
    res = streaming_interaction_count(stream, "click", entity="user_id")
    run_stream_to_parquet(res, out_path, ckpt).awaitTermination(120)

    # new data lands; a NEW query with the same checkpoint continues the state
    ev2 = events_df(spark, [interaction_event("p1", "click", T0 + 10 + i, 10 + i, user="u1") for i in range(1, 3)])
    ev2.write.mode("append").parquet(src)
    stream2 = stream_events(spark, src)
    res2 = streaming_interaction_count(stream2, "click", entity="user_id")
    run_stream_to_parquet(res2, out_path, ckpt).awaitTermination(120)

    vals = sorted(r["value"] for r in spark.read.parquet(out_path).collect())
    assert vals == [1, 2, 3, 4, 5]  # state carried across restart


def test_streaming_window_count_matches_batch_series(spark, tmp_path):
    """The streaming periodic counter's per-write emissions equal the batch
    engine's write-time series (operators/merge semantics), incl. the
    anchor-at-last-bucket behavior across day gaps."""
    from metarank_spark.streaming.pipeline import streaming_window_count
    from tests.test_property_parity import gen_events

    rows = [r for r in gen_events(11) if r["event_type"] == "interaction"
            and r["interaction_type"] == "click"]
    for i, r in enumerate(rows):
        r["seq"] = i
    ev = events_df(spark, rows)
    src = str(tmp_path / "wc_in")
    ev.write.parquet(src)

    stream = stream_events(spark, src)
    out_path, ckpt = str(tmp_path / "wc_out"), str(tmp_path / "wc_ckpt")
    q = (
        streaming_window_count(stream, "click", periods=(7,))
        .writeStream.format("parquet")
        .option("path", out_path).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["entity"], r["seq"]): list(r["wcnt"])
        for r in spark.read.parquet(out_path).collect()
    }

    # batch oracle: python fold (independent of both implementations)
    from collections import defaultdict
    m = defaultdict(dict)
    exp = {}
    DAY_MS = 86_400_000
    for r in sorted(rows, key=lambda x: (x["ts_ms"], x["seq"])):
        b = r["ts_ms"] // DAY_MS
        d = m[r["item_id"]]
        d[b] = d.get(b, 0) + 1
        last = max(d)
        exp[(r["item_id"], r["seq"])] = [
            float(sum(v for bb, v in d.items() if last - 7 <= bb <= last))
        ]
    assert got == exp


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    from metarank_spark.plans.sessionize import session_bounds, sessionize
    from metarank_spark.streaming.pipeline import streaming_sessionize

    rows, seq = [], 0
    for u in range(3):
        for s in range(2):  # two sessions per user, 45-min apart
            base = T0 + u * 7_200_000 + s * 2_700_000
            for k in range(3):
                seq += 1
                rows.append(interaction_event("p1", "click", base + k * 60_000, seq, user=f"u{u}"))
    ev = events_df(spark, rows)
    src = str(tmp_path / "sess_in")
    ev.write.parquet(src)

    stream = stream_events(spark, src)
    out_path, ckpt = str(tmp_path / "sess_out"), str(tmp_path / "sess_ckpt")
    q = (
        streaming_sessionize(stream, gap_ms=30 * 60 * 1000)
        .writeStream.format("parquet")
        .option("path", out_path).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start_ms"]): (r["n_events"], r["session_dur_ms"])
        for r in spark.read.parquet(out_path).collect()
    }
    batch = session_bounds(sessionize(ev))
    exp = {
        (r["user_id"], r["session_start_ms"]): (r["n_events"], r["session_dur_ms"])
        for r in batch.collect()
    }
    # append mode emits only watermark-closed sessions; every emitted
    # session must match the batch computation exactly
    assert got
    assert all(got[k] == exp[k] for k in got)


def test_multimodal_features_deterministic(spark):
    media = synthetic_media(spark, n=32)
    out = extract_features(media, fake=True)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 32
    assert all(len(r["features"]) == FEATURE_DIM for r in rows.values())
    assert all(0.0 <= x < 1.0 for r in rows.values() for x in r["features"])
    # deterministic: same input → same features
    rows2 = {r["media_id"]: r for r in extract_features(media, fake=True).collect()}
    assert all(rows[k]["features"] == rows2[k]["features"] for k in rows)
    assert rows["m3"]["n_bytes"] == len(b"payload-3" * 4)


def test_multimodal_real_codec_is_explicit_stub(spark):
    import pytest

    from metarank_spark.functions.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media("image", b"\x89PNG...", fake=False)


def _mixed_events(spark):
    import random

    rnd = random.Random(3)
    rows, seq = [], 0
    for u in range(4):
        for k in range(12):
            seq += 1
            typ = rnd.choice(["click", "view", "purchase"])
            e = interaction_event("p1", typ, T0 + k * 40_000 + u, seq, user=f"u{u}")
            e["num_fields"] = {"price": float((seq * 7) % 23)}
            rows.append(e)
    return events_df(spark, rows)


def _drive(spark, tmp_path, tag, result):
    out_path, ckpt = str(tmp_path / f"out_{tag}"), str(tmp_path / f"ckpt_{tag}")
    q = run_stream_to_parquet(result, out_path, ckpt)
    q.awaitTermination(120)
    return spark.read.parquet(out_path)


def test_streaming_last_scalar_matches_batch(spark, tmp_path):
    from metarank_spark import operators as ops
    from metarank_spark.streaming.pipeline import streaming_last_scalar

    ev = _mixed_events(spark)
    src = str(tmp_path / "ev_scalar")
    ev.write.parquet(src)
    value = F.when(
        F.col("interaction_type") == "purchase", F.col("num_fields").getItem("price")
    )
    got_df = _drive(spark, tmp_path, "scalar", streaming_last_scalar(
        stream_events(spark, src), value))
    got = {(r["entity"], r["seq"]): r["value"] for r in got_df.collect()}
    exp_df = ops.last_scalar(
        ev.withColumn("event_id", F.col("seq")), value, out="value")
    exp = {(r["user_id"], r["seq"]): r["value"] for r in exp_df.collect()}

    import math

    def eq(a, b):
        if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
            return (a is None or (isinstance(a, float) and math.isnan(a))) and (
                b is None or (isinstance(b, float) and math.isnan(b)))
        return abs(a - b) < 1e-12

    assert got.keys() == exp.keys()
    assert all(eq(got[k], exp[k]) for k in exp)


def test_streaming_bounded_list_matches_batch(spark, tmp_path):
    from metarank_spark import operators as ops
    from metarank_spark.streaming.pipeline import streaming_bounded_list

    ev = _mixed_events(spark)
    src = str(tmp_path / "ev_blist")
    ev.write.parquet(src)
    got_df = _drive(spark, tmp_path, "blist", streaming_bounded_list(
        stream_events(spark, src), F.col("interaction_type"),
        count=3, duration_ms=100_000))
    got = {(r["entity"], r["seq"]): r["recent"] for r in got_df.collect()}
    exp_df = ops.bounded_list_string(
        ev.withColumn("event_id", F.col("seq")), F.col("interaction_type"),
        count=3, duration_ms=100_000, out="recent")
    exp = {(r["user_id"], r["seq"]): r["recent"] for r in exp_df.collect()}
    assert got == exp


def test_streaming_stats_pool_matches_batch(spark, tmp_path):
    from metarank_spark import operators as ops
    from metarank_spark.streaming.pipeline import streaming_stats_pool

    ev = _mixed_events(spark)
    src = str(tmp_path / "ev_stats")
    ev.write.parquet(src)
    got_df = _drive(spark, tmp_path, "stats", streaming_stats_pool(
        stream_events(spark, src), F.col("num_fields").getItem("price"), pool=5))
    got = {
        (r["entity"], r["seq"]): (r["stat_min"], r["stat_max"], r["stat_avg"], r["stat_n"])
        for r in got_df.collect()
    }
    exp_df = ops.stats_window(
        ev.withColumn("event_id", F.col("seq"))
        .withColumn("value", F.col("num_fields").getItem("price")),
        "value", pool=5)
    exp = {
        (r["user_id"], r["seq"]): (r["stat_min"], r["stat_max"], r["stat_avg"], r["stat_n"])
        for r in exp_df.collect()
    }
    assert got == exp


def test_streaming_freq_share_matches_batch(spark, tmp_path):
    from metarank_spark import operators as ops
    from metarank_spark.streaming.pipeline import streaming_freq_share

    ev = _mixed_events(spark)
    src = str(tmp_path / "ev_freq")
    ev.write.parquet(src)
    got_df = _drive(spark, tmp_path, "freq", streaming_freq_share(
        stream_events(spark, src), F.col("interaction_type"), "click", pool=5))
    got = {(r["entity"], r["seq"]): r["freq_share"] for r in got_df.collect()}
    exp_df = ops.freq_share(
        ev.withColumn("event_id", F.col("seq"))
        .withColumn("event_type", F.col("interaction_type")),
        "click", pool=5)
    exp = {(r["user_id"], r["seq"]): r["freq_share"] for r in exp_df.collect()}
    assert got.keys() == exp.keys()
    assert all(abs(got[k] - exp[k]) < 1e-12 for k in exp)


def test_streaming_map_feature_matches_batch_final_state(spark, tmp_path):
    from metarank_spark import operators as ops
    from metarank_spark.streaming.pipeline import streaming_map_feature

    ev = _mixed_events(spark)
    src = str(tmp_path / "ev_map")
    ev.write.parquet(src)
    got_df = _drive(spark, tmp_path, "map", streaming_map_feature(
        stream_events(spark, src), F.col("interaction_type"),
        F.col("num_fields").getItem("price")))
    # last emission per entity = final map state
    rows = sorted(got_df.collect(), key=lambda r: (r["ts_ms"], r["seq"]))
    final = {}
    for r in rows:
        final[r["entity"]] = r["map_state"]
    exp_df = ops.map_feature_last(
        ev.withColumn("event_id", F.col("seq"))
        .withColumn("event_type", F.col("interaction_type"))
        .withColumn("value", F.col("num_fields").getItem("price")))
    exp = {}
    for r in exp_df.collect():
        exp.setdefault(r["user_id"], {})[r["map_key"]] = r["last_value"]
    exp_str = {
        u: ",".join(f"{k}={m[k]}" for k in sorted(m)) for u, m in exp.items()
    }
    assert final == exp_str


def test_streaming_clickthrough_commit_at_expiry(spark, tmp_path):
    """The streaming TrainBuffer twin implements TRUE commit-at-expiry
    (TrainBuffer.scala:160-167 expireAfterWrite on the event ticker):
    injected impressions carry the ranking's ts but commit at
    last_interaction + maxSessionLength, and rankings without
    interactions never flush — the faithful counterpart of the batch
    path's documented commit-at-completion deviation."""
    from metarank_spark.events import events_df, ranking_event
    from metarank_spark.streaming.pipeline import streaming_clickthrough_expiry

    gap = 30 * 60 * 1000
    rows = [
        ranking_event("r1", ["p1", "p2", "p3"], T0, 1, user="u1", session="s1"),
        interaction_event("p2", "click", T0 + 60_000, 2, user="u1",
                          session="s1", ranking="r1"),
        interaction_event("p1", "click", T0 + 120_000, 3, user="u1",
                          session="s1", ranking="r1"),
        # a ranking with NO interactions: must never flush
        ranking_event("r2", ["p4"], T0 + 10_000, 4, user="u2", session="s2"),
        # sentinel far in the future: advances the watermark past expiry
        ranking_event("r9", ["p9"], T0 + 10 * gap, 5, user="u9", session="s9"),
    ]
    ev = events_df(spark, rows)
    src = str(tmp_path / "ev_ct")
    ev.write.parquet(src)
    out = _drive(spark, tmp_path, "ct",
                 streaming_clickthrough_expiry(stream_events(spark, src),
                                               max_session_ms=gap))
    got = sorted((r["ranking_id"], r["item_id"], r["ts_ms"], r["commit_ms"],
                  r["n_interactions"]) for r in out.collect())
    # r1: max interacted position = 2 (p2) → inject p1, p2; ranking ts
    # payload; commit at last interaction (T0+120s) + 30 min
    assert got == [
        ("r1", "p1", T0, T0 + 120_000 + gap, 2),
        ("r1", "p2", T0, T0 + 120_000 + gap, 2),
    ]


def test_multimodal_resize_plumbing(spark):
    from metarank_spark.functions.multimodal import resize_images, synthetic_media

    media = synthetic_media(spark, n=12)
    out = resize_images(media, width=8, height=4, fake=True)
    rows = out.collect()
    assert len(rows) == 4  # every 3rd synthetic row is an image
    assert all(len(r["frame"] if "frame" in r else r["content"]) == 32 for r in rows)
    assert all((r["width"], r["height"]) == (8, 4) for r in rows)
    # deterministic: same input → same bytes
    again = {r["media_id"]: bytes(r["content"]) for r in out.collect()}
    assert {r["media_id"]: bytes(r["content"]) for r in rows} == again


def test_multimodal_frame_sampling_plumbing(spark):
    import pytest

    from metarank_spark.functions.multimodal import sample_frames, synthetic_media

    media = synthetic_media(spark, n=12).withColumn(
        "meta", F.create_map(F.lit("duration_ms"), F.lit("3500"))
    )
    out = sample_frames(media, every_ms=1000, fake=True).collect()
    per = {}
    for r in out:
        per.setdefault(r["media_id"], []).append((r["frame_idx"], r["frame_ts_ms"]))
    # 3500ms at 1000ms stride → 3 frames per video row
    assert all(sorted(v) == [(0, 0), (1, 1000), (2, 2000)] for v in per.values())
    assert all(len(r["frame"]) == 32 for r in out)  # sha256 stub frame
    # the real-codec branch is an explicit stub
    with pytest.raises(Exception, match="video codec"):
        sample_frames(media, fake=False).collect()


def test_broker_format_wire_decode_smoke(spark):
    """Connector-path smoke (KafkaSource.scala:26 analog): drive the
    broker-style ingest through a NON-file streaming format — Spark's
    built-in `rate` source stands in for a broker, each tick mapped to a
    wire-format JSON message — and assert the stream decodes through the
    same parse_wire_json path the batch reader uses, into the canonical
    schema, with ticks as the commit sequence (kafka: offset)."""
    import time

    from pyspark.sql import functions as F

    from metarank_spark.events import EVENT_SCHEMA
    from metarank_spark.streaming.pipeline import (
        decode_wire_stream,
        stream_source,
    )

    raw = stream_source(spark, "rate", {"rowsPerSecond": 200})
    payload = F.format_string(
        '{"event":"interaction","id":"e%s","timestamp":"%s",'
        '"type":"click","item":"p%s","user":"u%s","session":"s1",'
        '"fields":[{"name":"k","value":"v%s"}]}',
        F.col("value"),
        (F.lit(1_700_000_000_000) + F.col("value")).cast("string"),
        F.pmod(F.col("value"), F.lit(5)),
        F.pmod(F.col("value"), F.lit(3)),
        F.pmod(F.col("value"), F.lit(2)),
    )
    ev = decode_wire_stream(raw, payload, F.col("value"))
    assert [f.name for f in ev.schema.fields] == [f.name for f in EVENT_SCHEMA.fields]
    q = (
        ev.writeStream.format("memory")
        .queryName("wire_smoke")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 90
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM wire_smoke").collect()[0]["c"]
            if n >= 20:
                break
            time.sleep(0.5)
        assert n >= 20, f"rate-source stream produced only {n} rows"
        rows = {
            r["seq"]: r
            for r in spark.sql("SELECT * FROM wire_smoke").collect()
        }
    finally:
        q.stop()
    r7 = rows[7]
    assert r7["event_id"] == "e7"
    assert r7["event_type"] == "interaction"
    assert r7["interaction_type"] == "click"
    assert r7["ts_ms"] == 1_700_000_000_007
    assert r7["item_id"] == "p2" and r7["user_id"] == "u1"
    assert r7["str_fields"]["k"] == ["v1"]


def test_streaming_resume_from_batch_snapshot(spark, tmp_path):
    """Batch-snapshot → streaming-resume handoff (streaming/handoff.py):
    seed the streaming counter and scalar state from an
    IncrementalSnapshot built over batch history, stream only the delta,
    and get outputs equal to a fold over FULL history restricted to the
    delta. Also proves a checkpointed restart does NOT re-apply the seed
    (live state wins over first-sight init)."""
    from pyspark.sql import Window

    from metarank_spark import operators as ops
    from metarank_spark.engine import FeatureEngine, InteractionCount
    from metarank_spark.operators.incremental import snapshot
    from metarank_spark.streaming.handoff import (
        broadcast_seed,
        counter_seed_frame,
        scalar_seed_frame,
    )
    from metarank_spark.streaming.pipeline import streaming_last_scalar

    DAY = 86_400_000
    rows, seq = [], 0
    # history: per user, clicks spread over 30 days — far beyond the
    # counter-only horizon, so the snapshot tail DROPS older clicks and
    # the handoff genuinely needs the offsets (asserted below)
    for u in range(4):
        for k in range(u + 2):
            seq += 1
            rows.append(interaction_event(
                "p1", "click", T0 + k * 3 * DAY + u, seq, user=f"u{u}",
                num_fields={"price": float(10 * u + k)}))
    t_cut = T0 + 29 * DAY
    delta_rows = []
    for u in range(5):  # u4 is snapshot-unseen: streams from zero
        for k in range(2):
            seq += 1
            delta_rows.append(interaction_event(
                "p1", "click", t_cut + (k + 1) * 1000 + u, seq,
                user=f"u{u}", num_fields={"price": float(100 + 10 * u + k)}))
    hist = events_df(spark, rows)
    full = events_df(spark, rows + delta_rows)

    eng = FeatureEngine([InteractionCount("uclicks", "click", scope="user")])
    snap = snapshot(hist, t_cut, eng)
    # the handoff is only meaningful if the tail really dropped history
    assert snap.offsets["uclicks"].count() > 0

    cnt_init = broadcast_seed(
        spark, counter_seed_frame(snap, eng, "uclicks"), "total")
    price = F.col("num_fields").getItem("price")
    sc_init = broadcast_seed(
        spark, scalar_seed_frame(snap, price, "user_id"), "last")

    src = str(tmp_path / "delta_in")
    os.makedirs(src)
    events_df(spark, delta_rows[: len(delta_rows) // 2]).write.mode(
        "append").parquet(src)

    def run(tag):
        got_c = _drive(spark, tmp_path, tag + "_c", streaming_interaction_count(
            stream_events(spark, src), "click", entity="user_id",
            init=cnt_init))
        got_s = _drive(spark, tmp_path, tag + "_s", streaming_last_scalar(
            stream_events(spark, src), price, entity="user_id",
            init=sc_init))
        return (
            {(r["entity"], r["seq"]): r["value"] for r in got_c.collect()},
            {(r["entity"], r["seq"]): r["value"] for r in got_s.collect()},
        )

    got_c, got_s = run("resume")
    # restart with the same checkpoint after more delta lands: keys
    # already in the store must continue from live state, not re-seed
    events_df(spark, delta_rows[len(delta_rows) // 2:]).write.mode(
        "append").parquet(src)
    got_c, got_s = run("resume")

    w = (
        Window.partitionBy("user_id").orderBy("ts_ms", "seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    clicks = full.filter(F.col("interaction_type") == "click")
    exp_c = {
        (r["user_id"], r["seq"]): r["v"]
        for r in clicks.select(
            "user_id", "seq", "ts_ms", F.count(F.lit(1)).over(w).alias("v")
        ).filter(F.col("ts_ms") > t_cut).collect()
    }
    assert got_c == exp_c
    # the DISTRIBUTED seed path (stream-static join, no driver collect)
    # produces the same resume
    got_c3 = {
        (r["entity"], r["seq"]): r["value"]
        for r in _drive(spark, tmp_path, "sj_c", streaming_interaction_count(
            stream_events(spark, src), "click", entity="user_id",
            seed=counter_seed_frame(snap, eng, "uclicks"))).collect()
    }
    assert got_c3 == exp_c
    got_s3 = {
        (r["entity"], r["seq"]): r["value"]
        for r in _drive(spark, tmp_path, "sj_s", streaming_last_scalar(
            stream_events(spark, src), price, entity="user_id",
            seed=scalar_seed_frame(snap, price, "user_id"))).collect()
    }
    assert got_s3 == got_s

    exp_s = {
        (r["user_id"], r["seq"]): r["value"]
        for r in ops.last_scalar(
            clicks.withColumn("event_id", F.col("seq")), price, out="value"
        ).filter(F.col("ts_ms") > t_cut).collect()
    }
    assert got_s.keys() == exp_s.keys()
    assert all(abs(got_s[k] - exp_s[k]) < 1e-12 for k in exp_s)


def test_streaming_wcount_resume_from_batch_snapshot(spark, tmp_path):
    """window_count handoff: the snapshot's window-context retention IS
    the streaming op's bucket-map state — seed it and stream only the
    delta; outputs equal a from-scratch stream over full history
    restricted to the delta rows."""
    from metarank_spark.engine import FeatureEngine, WindowCount
    from metarank_spark.operators.incremental import snapshot
    from metarank_spark.streaming.handoff import (
        broadcast_seed,
        wcount_seed_frame,
    )
    from metarank_spark.streaming.pipeline import streaming_window_count

    DAY = 86_400_000
    rows, seq = [], 0
    # per item: clicks on many days, far beyond the (1,3)-day windows
    for i in range(3):
        for d in range(10):
            for k in range(i + 1):
                seq += 1
                rows.append(interaction_event(
                    f"p{i}", "click", T0 + d * 3 * DAY + k * 1000 + i,
                    seq, user="u0"))
    t_cut = T0 + 28 * DAY
    delta_rows = []
    for i in range(4):  # p3 unseen by the snapshot
        for k in range(2):
            seq += 1
            delta_rows.append(interaction_event(
                f"p{i}", "click", t_cut + DAY + k * 1000 + i, seq,
                user="u0"))
    hist = events_df(spark, rows)
    full = events_df(spark, rows + delta_rows)

    eng = FeatureEngine([WindowCount("wc", "click", (1, 3), scope="item")])
    snap = snapshot(hist, t_cut, eng)
    seed = wcount_seed_frame(snap, eng, "wc")
    assert seed.count() == 3 and seed.filter(F.size("counts") > 0).count() == 3
    init = broadcast_seed(spark, seed, ["buckets", "counts"])

    src_delta = str(tmp_path / "wc_delta")
    events_df(spark, delta_rows).write.parquet(src_delta)
    src_full = str(tmp_path / "wc_full")
    full.write.parquet(src_full)

    got = {
        (r["entity"], r["seq"]): r["wcnt"]
        for r in _drive(spark, tmp_path, "wc_res", streaming_window_count(
            stream_events(spark, src_delta), "click", (1, 3),
            entity="item_id", init=init)).collect()
    }
    exp_all = {
        (r["entity"], r["seq"]): r["wcnt"]
        for r in _drive(spark, tmp_path, "wc_ful", streaming_window_count(
            stream_events(spark, src_full), "click", (1, 3),
            entity="item_id")).collect()
    }
    delta_seqs = {r["seq"] for r in delta_rows}
    exp = {k: v for k, v in exp_all.items() if k[1] in delta_seqs}
    assert got == exp
    # seed-join path (distributed, no driver collect) resumes identically
    got_sj = {
        (r["entity"], r["seq"]): r["wcnt"]
        for r in _drive(spark, tmp_path, "wc_sj", streaming_window_count(
            stream_events(spark, src_delta), "click", (1, 3),
            entity="item_id", seed=seed)).collect()
    }
    assert got_sj == exp


def test_streaming_pool_resume_from_batch_snapshot(spark, tmp_path):
    """Pool-primitive handoff (stats / freq / recent-items / map): the
    snapshot's last-K retention IS the streaming deque state — seed each
    twin from a batch snapshot and stream only the delta; outputs equal a
    from-scratch stream over full history restricted to the delta rows.
    With this, all 7 stateful primitives have a batch→streaming seed."""
    from metarank_spark.engine import (
        FeatureEngine,
        Freq,
        MapFeature,
        RecentItems,
        Stats,
    )
    from metarank_spark.operators.incremental import snapshot
    from metarank_spark.streaming.handoff import (
        blist_seed_frame,
        broadcast_seed,
        freq_seed_frame,
        map_seed_frame,
        stats_seed_frame,
    )
    from metarank_spark.streaming.pipeline import (
        streaming_bounded_list,
        streaming_freq_share,
        streaming_map_feature,
        streaming_stats_pool,
    )

    DAY = 86_400_000
    rows, seq = [], 0
    # u0 writes daily (count-eviction binds), u2 every 3 days
    # (time-eviction binds) — both deque modes exercised by the seed
    for u in range(3):
        for d in range(12):
            seq += 1
            rows.append(interaction_event(
                f"p{seq % 4}", "click", T0 + d * (u + 1) * DAY + u, seq,
                user=f"u{u}", str_fields={"cat": [f"c{seq % 3}"]},
                num_fields={"price": float((seq * 7) % 23)}))
    t_cut = T0 + 40 * DAY
    delta_rows = []
    for u in range(4):  # u3 unseen by the snapshot: streams from zero
        for k in range(2):
            seq += 1
            delta_rows.append(interaction_event(
                f"p{seq % 4}", "click", t_cut + DAY + k * 1000 + u, seq,
                user=f"u{u}", str_fields={"cat": [f"c{seq % 3}"]},
                num_fields={"price": float((seq * 7) % 23)}))
    hist = events_df(spark, rows)
    full = events_df(spark, rows + delta_rows)

    eng = FeatureEngine([
        Stats("st", "price", pool=5, percentiles=(50,), scope="user"),
        Freq("fq", "cat", pool=5, scope="user"),
        RecentItems("ri", "click", count=3, duration_ms=5 * DAY,
                    scope="user"),
        MapFeature("mp", key_field="cat", value_field="price",
                   scope="user"),
    ])
    snap = snapshot(hist, t_cut, eng)

    st_seed = stats_seed_frame(snap, eng, "st")
    # history (12 writes) genuinely exceeds the pool: seeds are truncated
    assert {r["entity"]: len(r["pool"]) for r in st_seed.collect()} == {
        "u0": 5, "u1": 5, "u2": 5}
    bl_seed = blist_seed_frame(snap, eng, "ri")
    # u0: 5 in-window writes → count-truncated to 3; u2: only 2 of the
    # last 3 writes are within duration → time-evicted to 2
    assert {r["entity"]: len(r["vals"]) for r in bl_seed.collect()} == {
        "u0": 3, "u1": 3, "u2": 2}

    st_init = broadcast_seed(spark, st_seed, "pool")
    fq_init = broadcast_seed(spark, freq_seed_frame(snap, eng, "fq"), "pool")
    bl_init = broadcast_seed(spark, bl_seed, ["ts", "vals"])
    mp_init = broadcast_seed(
        spark, map_seed_frame(snap, eng, "mp"), ["keys", "vals"])

    src_delta = str(tmp_path / "pool_delta")
    events_df(spark, delta_rows).write.parquet(src_delta)
    src_full = str(tmp_path / "pool_full")
    full.write.parquet(src_full)

    price = F.col("num_fields").getItem("price")
    cat = F.col("str_fields").getItem("cat").getItem(0)

    def run(src, tag, st_i, fq_i, bl_i, mp_i):
        ev = stream_events(spark, src)
        return (
            _drive(spark, tmp_path, tag + "_st", streaming_stats_pool(
                ev, price, pool=5, entity="user_id", init=st_i)),
            _drive(spark, tmp_path, tag + "_fq", streaming_freq_share(
                ev, cat, "c0", pool=5, entity="user_id", init=fq_i)),
            _drive(spark, tmp_path, tag + "_bl", streaming_bounded_list(
                ev.filter(F.col("interaction_type") == "click"),
                F.col("item_id"), count=3, duration_ms=5 * DAY,
                entity="user_id", init=bl_i)),
            _drive(spark, tmp_path, tag + "_mp", streaming_map_feature(
                ev, cat, price, entity="user_id", init=mp_i)),
        )

    res = run(src_delta, "pres", st_init, fq_init, bl_init, mp_init)
    ful = run(src_full, "pful", None, None, None, None)
    # one pool twin through the distributed seed-join path: identical
    sj = _drive(spark, tmp_path, "psj_st", streaming_stats_pool(
        stream_events(spark, src_delta), price, pool=5, entity="user_id",
        seed=st_seed))
    assert sorted(map(tuple, sj.collect())) == sorted(
        map(tuple, res[0].collect()))
    delta_seqs = {r["seq"] for r in delta_rows}
    for got_df, exp_df, cols in zip(res, ful, [
        ("stat_min", "stat_max", "stat_avg", "stat_n"),
        ("freq_share",), ("recent",), ("map_state",),
    ]):
        got = {(r["entity"], r["seq"]): tuple(r[c] for c in cols)
               for r in got_df.collect()}
        exp = {(r["entity"], r["seq"]): tuple(r[c] for c in cols)
               for r in exp_df.collect() if r["seq"] in delta_seqs}
        assert got == exp


def test_streaming_dedup_exact_matches_batch(spark, tmp_path):
    """Curation streaming twin: first-sight exact dedup over a doc
    stream equals batch exact_dedup on an arrival-ordered corpus, and a
    SECOND availableNow run on the same checkpoint flags every replayed
    document as a duplicate — the state survives across runs."""
    from metarank_spark.functions import dedup as dd
    from metarank_spark.functions import text as tx
    from metarank_spark.streaming.pipeline import streaming_dedup_exact

    from conftest import SF_SMALL

    seq = tx.tokenized_sequences(spark, SF_SMALL).select("doc_id", "tokens")
    # plant an in-corpus exact duplicate that sorts AFTER its original
    clone = seq.orderBy("doc_id").limit(1).withColumn(
        "doc_id", F.concat(F.lit("zz"), F.col("doc_id")))
    corpus = seq.unionByName(clone)
    src = str(tmp_path / "docs_dd")
    corpus.orderBy("doc_id").coalesce(1).write.parquet(src)

    def stream():
        return (spark.readStream
                .schema("doc_id string, tokens array<int>")
                .option("maxFilesPerTrigger", 16).parquet(src))

    got = {r["doc_id"]: r["is_dup"]
           for r in _drive(spark, tmp_path, "dd",
                           streaming_dedup_exact(stream())).collect()}
    exp = {r["doc_id"]: r["is_dup"]
           for r in dd.exact_dedup(corpus, F.col("tokens"))
           .select("doc_id", "is_dup").collect()}
    assert got == exp
    assert got[next(k for k in got if k.startswith("zz"))] is True

    # replay 5 docs under fresh ids in a new file: resumed state marks
    # every one a dup
    replay = seq.orderBy("doc_id").limit(5).withColumn(
        "doc_id", F.concat(F.lit("replay"), F.col("doc_id")))
    replay.coalesce(1).write.mode("append").parquet(src)
    got2 = {r["doc_id"]: r["is_dup"]
            for r in _drive(spark, tmp_path, "dd",
                            streaming_dedup_exact(stream())).collect()}
    news = {k: v for k, v in got2.items() if k.startswith("replay")}
    assert len(news) == 5 and all(news.values())


def test_streaming_dedup_near_matches_batch(spark, tmp_path):
    """Streaming NEAR-dedup (foreachBatch over the frozen-history delta
    operators): three availableNow runs over a growing file source = three
    micro-batches; the union of per-batch survivors must equal the batch
    tokenize→exact→near dedup of the whole corpus (straddle-free slices,
    same fixture discipline as test_curate_delta_chain...), and the state
    tables must gain one partition per batch."""
    import os

    from conftest import SF_SMALL
    from metarank_spark.functions import dedup as dd
    from metarank_spark.functions import text as tx
    from metarank_spark.operators.curate import (
        CurateParams,
        _stage_dedup_exact,
        _stage_dedup_near,
        _stage_tokenize,
    )
    from metarank_spark.streaming.pipeline import streaming_dedup_near

    p = CurateParams(near_threshold=0.5)
    docs = spark.read.parquet(os.path.join(SF_SMALL, "documents.parquet"))
    cuts = [
        docs.agg(F.expr(f"percentile(doc_id, {q})")).collect()[0][0]
        for q in (0.33, 0.66)
    ]
    part = lambda d: sum(int(d) > c for c in cuts)  # noqa: E731
    seqs = tx.tokenized_sequences(spark, SF_SMALL)
    strad = [
        max(int(r["id_a"]), int(r["id_b"]))
        for r in dd.minhash_lsh_pairs(seqs, threshold=p.near_threshold).collect()
        if part(r["id_a"]) != part(r["id_b"])
    ]
    docs = docs.filter(~F.col("doc_id").isin(strad))

    exp = {
        r["doc_id"]
        for r in _stage_dedup_near(
            _stage_dedup_exact(_stage_tokenize(docs, p), p), p
        ).select("doc_id").collect()
    }

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for i in range(3):
        sl = docs.filter(
            F.udf(lambda d, i=i: part(d) == i, "boolean")("doc_id"))
        sl.coalesce(1).write.mode("append").parquet(src)
        stream = (spark.readStream
                  .schema("doc_id long, text string, source string")
                  .parquet(src))
        q = (streaming_dedup_near(stream, out, p)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    batches = sorted(os.listdir(os.path.join(out, "stream")))
    assert len(batches) == 3, batches
    got = set()
    for b in batches:
        got |= {r["doc_id"] for r in spark.read.parquet(
            os.path.join(out, "stream", b, "survivors"))
            .select("doc_id").collect()}
    assert got == exp and len(got) > 0

    # one state partition per batch + the typed bootstrap
    parts = sorted(os.listdir(os.path.join(out, "_state", "near_docs")))
    assert parts == ["delta=b0", "delta=b1", "delta=b2", "delta=bootstrap"]


def test_ingest_job_cli_drains_and_resumes(spark, tmp_path):
    """jobs/ingest.py: one availableNow drain curates what's there; a
    second invocation after new files arrive processes ONLY the new batch
    (checkpoint resume), deduping against the first batch's state."""
    import os

    import jobs.ingest as ji

    src = str(tmp_path / "in")
    out = str(tmp_path / "cur")
    docs1 = spark.createDataFrame(
        [(1, "alpha bravo charlie delta echo", "s"),
         (2, "alpha bravo charlie delta echo", "s")],  # exact dup of 1
        "doc_id long, text string, source string")
    docs1.coalesce(1).write.mode("append").parquet(src)
    assert ji.main(["--source", src, "--output", out,
                    "--near-threshold", "0.5"]) == 0
    b0 = spark.read.parquet(os.path.join(out, "stream", "batch=0", "survivors"))
    assert {r["doc_id"] for r in b0.select("doc_id").collect()} == {"1"}

    docs2 = spark.createDataFrame(
        [(3, "alpha bravo charlie delta echo", "s"),   # exact dup of history
         (4, "alpha bravo charlie delta foxtrot", "s")],  # near-dup of 1
        "doc_id long, text string, source string")
    docs2.coalesce(1).write.mode("append").parquet(src)
    assert ji.main(["--source", src, "--output", out,
                    "--near-threshold", "0.5"]) == 0
    b1 = spark.read.parquet(os.path.join(out, "stream", "batch=1", "survivors"))
    assert {r["doc_id"] for r in b1.select("doc_id").collect()} == set()
    # batch 0 untouched by the second run
    assert sorted(os.listdir(os.path.join(out, "stream"))) == [
        "batch=0", "batch=1"]


def test_ingest_job_cli_compact_after(spark, tmp_path):
    """jobs/ingest.py --compact-after: after the drain's checkpoint
    commits, the accumulated _state delta partitions fold into one
    compacted partition (+ the kept-newest one); the next drain still
    dedups against the full history."""
    import os

    import jobs.ingest as ji

    src = str(tmp_path / "in")
    out = str(tmp_path / "cur")
    for i, text in enumerate(["alpha bravo charlie delta echo",
                              "golf hotel india juliet kilo"]):
        spark.createDataFrame([(i, text, "s")],
                              "doc_id long, text string, source string"
                              ).coalesce(1).write.mode("append").parquet(src)
        assert ji.main(["--source", src, "--output", out,
                        "--near-threshold", "0.5"]) == 0
    # bootstrap + b0 + b1 partitions → compact (keeps the newest)
    assert ji.main(["--source", src, "--output", out,
                    "--near-threshold", "0.5", "--compact-after"]) == 0
    tbl = os.path.join(out, "_state", "exact_hashes")
    parts = sorted(d for d in os.listdir(tbl) if d.startswith("delta="))
    assert len(parts) == 2 and parts[1].startswith("delta=c"), parts
    # history still dedups: an exact dup of batch-0 content is dropped
    spark.createDataFrame([(9, "alpha bravo charlie delta echo", "s")],
                          "doc_id long, text string, source string"
                          ).coalesce(1).write.mode("append").parquet(src)
    assert ji.main(["--source", src, "--output", out,
                    "--near-threshold", "0.5"]) == 0
    b2 = spark.read.parquet(os.path.join(out, "stream", "batch=2",
                                         "survivors"))
    assert {r["doc_id"] for r in b2.select("doc_id").collect()} == set()


def test_streaming_full_curate_equals_delta_chain(spark, tmp_path):
    """jobs/ingest.py --full: micro-batches through the stream produce
    byte-identical delta outputs (same directories, same packs with
    continued offsets) as driver-invoked curate_delta calls — the delta
    tag is the batch's CONTENT fingerprint, so streamed and direct runs
    converge on the same artifacts. Transitively (curate_delta's own
    equality test) this matches the batch union."""
    import os

    import jobs.ingest as ji
    from conftest import SF_SMALL
    from metarank_spark.operators.curate import (
        CurateParams, curate, curate_delta, publish_state)

    pr = CurateParams(min_tokens=3, near_threshold=0.5, mixture=False,
                      pack_budget=64)
    docs = spark.read.parquet(
        os.path.join(SF_SMALL, "documents.parquet"))
    mid = docs.agg(F.expr("percentile(doc_id, 0.34)")).collect()[0][0]
    mid2 = docs.agg(F.expr("percentile(doc_id, 0.67)")).collect()[0][0]
    from metarank_spark.functions import dedup as dd
    from metarank_spark.functions import text as tx
    part = lambda d: int(int(d) > mid) + int(int(d) > mid2)  # noqa: E731
    seqs = tx.tokenized_sequences(spark, SF_SMALL)
    strad = [max(int(r["id_a"]), int(r["id_b"]))
             for r in dd.minhash_lsh_pairs(seqs, threshold=0.5).collect()
             if part(r["id_a"]) != part(r["id_b"])]
    docs = docs.filter(~F.col("doc_id").isin(strad))
    base = docs.filter(F.col("doc_id") <= mid)
    d1 = docs.filter((F.col("doc_id") > mid) & (F.col("doc_id") <= mid2))
    d2 = docs.filter(F.col("doc_id") > mid2)

    def bootstrap(out):
        curate(spark, base, out, pr)
        publish_state(spark, out, pr)

    # direct chain
    out_d = str(tmp_path / "direct")
    bootstrap(out_d)
    for d in (d1, d2):
        curate_delta(spark, d, out_d, pr)

    # streamed chain: same deltas as two availableNow drains
    out_s = str(tmp_path / "stream")
    bootstrap(out_s)
    src = str(tmp_path / "in")
    for d in (d1, d2):
        d.coalesce(1).write.mode("append").parquet(src)
        assert ji.main([
            "--source", src, "--output", out_s, "--full",
            "--min-tokens", "3", "--near-threshold", "0.5",
            "--no-mixture", "--pack-budget", "64",
        ]) == 0

    # identical delta directory sets and identical pack contents
    tags_d = sorted(os.listdir(os.path.join(out_d, "deltas")))
    tags_s = sorted(os.listdir(os.path.join(out_s, "deltas")))
    assert tags_d == tags_s and len(tags_d) == 2
    cols = ("doc_id", "source", "n_tok", "seq_id", "seq_offset")
    for t in tags_d:
        a = sorted(tuple(r[c] for c in cols) for r in spark.read.parquet(
            os.path.join(out_d, "deltas", t, "pack")).select(*cols).collect())
        b = sorted(tuple(r[c] for c in cols) for r in spark.read.parquet(
            os.path.join(out_s, "deltas", t, "pack")).select(*cols).collect())
        assert a == b, t
    assert any(
        spark.read.parquet(os.path.join(out_d, "deltas", t, "pack")).count()
        for t in tags_d)
