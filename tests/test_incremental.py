"""Incremental backfill exactness: ``incremental_training_matrix`` over a
history snapshot + delta equals ``training_matrix`` over the full stream
restricted to post-cut rankings — bit-for-bit, across randomized streams
with stale entities (state older than the horizon), pool features,
FK'd clickthroughs straddling the cut, and injected impressions.

The generator respects the reference's session-expiry contract
(TrainBuffer.scala:160-167): consecutive interactions of a clickthrough
are ≤ maxSessionLength apart, and no interaction is attributed to a
ranking after its buffer expired — the one assumption the offset
consistency argument needs (operators/incremental.py module docstring).
"""

from __future__ import annotations

import math
import random

import pytest

from metarank_spark.engine import (
    FeatureEngine,
    Freq,
    InteractedWith,
    InteractionCount,
    ItemAge,
    MapFeature,
    Number,
    Rate,
    RecentItems,
    Stats,
    WindowCount,
)
from metarank_spark.events import events_df
from metarank_spark.operators.clickthrough import training_matrix
from metarank_spark.operators.incremental import (
    history_horizon_ms,
    incremental_training_matrix,
    load_snapshot,
    save_snapshot,
    snapshot,
)

T0 = 1_704_067_200_000
DAY = 86_400_000
MIN = 60_000


def gen_events(seed: int, n_users=6, n_items=8, n_events=220, days=40,
               stale_days=25):
    """Randomized stream: item metadata upserts, FK'd clickthroughs
    (1-3 clicks within 10 min of the ranking), free impressions and
    clicks. Entities p0/u0 go silent after ``stale_days`` — their state
    is older than any feature horizon at the cut, exercising the
    stale-anchor retention path."""
    rnd = random.Random(seed)
    rows = []
    seq = 0
    rid = 0
    item_pool = [f"p{i}" for i in range(n_items)]
    for _ in range(n_events):
        seq += 1
        ts = T0 + rnd.randrange(0, days * DAY, 30 * MIN)
        item = f"p{rnd.randrange(n_items)}"
        user = f"u{rnd.randrange(n_users)}"
        if (item == "p0" or user == "u0") and ts > T0 + stale_days * DAY:
            ts = T0 + rnd.randrange(0, stale_days * DAY, 30 * MIN)
        kind = rnd.random()
        if kind < 0.22:
            rid += 1
            # p0 never appears in rankings: its writes all come from free
            # interactions, which the stale clamp keeps ancient
            items = rnd.sample(item_pool[1:], k=4)
            rows.append(dict(
                event_id=f"r{rid}", event_type="ranking", ts_ms=ts, seq=seq,
                item_id=None, user_id=user, session_id=user, ranking_id=None,
                interaction_type=None,
                items=[{"id": i, "relevancy": 1.0} for i in items],
                str_fields={}, num_fields={}, numlist_fields={},
            ))
            # FK'd clicks: within 10 min of the ranking, ≤ 10 min apart
            t = ts
            for c in range(rnd.randrange(1, 4)):
                seq += 1
                t += rnd.randrange(1, 10) * MIN
                rows.append(dict(
                    event_id=f"fc{seq}", event_type="interaction", ts_ms=t,
                    seq=seq, item_id=rnd.choice(items), user_id=user,
                    session_id=user, ranking_id=f"r{rid}",
                    interaction_type="click", items=None,
                    str_fields={}, num_fields={}, numlist_fields={},
                ))
        elif kind < 0.48:
            rows.append(dict(
                event_id=f"c{seq}", event_type="interaction", ts_ms=ts,
                seq=seq, item_id=item, user_id=user, session_id=user,
                ranking_id=None, interaction_type="click", items=None,
                str_fields={}, num_fields={}, numlist_fields={},
            ))
        elif kind < 0.80:
            rows.append(dict(
                event_id=f"i{seq}", event_type="interaction", ts_ms=ts,
                seq=seq, item_id=item, user_id=user, session_id=user,
                ranking_id=None, interaction_type="impression", items=None,
                str_fields={}, num_fields={}, numlist_fields={},
            ))
        else:
            rows.append(dict(
                event_id=f"m{seq}", event_type="item", ts_ms=ts, seq=seq,
                item_id=item, user_id=None, session_id=None, ranking_id=None,
                interaction_type=None, items=None,
                str_fields={"kind": [["a", "b", "c"][seq % 3]]},
                num_fields={"price": round(rnd.uniform(1, 100), 2)},
                numlist_fields={},
            ))
    for r in rows:
        if r["event_type"] == "interaction":
            h = (r["seq"] * 2654435761) % 97
            r["num_fields"] = {"price": float(h)}
            r["str_fields"] = {"kind": [["a", "b", "c"][h % 3]]}
    rows.sort(key=lambda r: (r["ts_ms"], r["seq"]))
    for i, r in enumerate(rows):
        r["seq"] = i
    return rows


def engine():
    return FeatureEngine([
        InteractionCount("clicks", "click"),
        InteractionCount("uclicks", "click", scope="user"),
        # counts raw + injected impressions: exercises the injected
        # offset path (_counter_offsets needs_inject)
        InteractionCount("imps", "impression"),
        WindowCount("wc", "click", (1, 3)),
        Rate("ctr", "click", "impression", (2,)),
        Number("price", "price"),
        ItemAge("age"),
        Stats("st", "price", pool=4, percentiles=(50,)),
        Freq("fr", "kind", pool=4),
        RecentItems("rec", "click", count=3, scope="user"),
        MapFeature("mp", key_field="kind", value_field="price", scope="user"),
        InteractedWith("iw", "click", fields=("kind",), scope="user", count=5),
    ])


def close(a, b):
    if isinstance(a, list):
        return b is not None and len(a) == len(b) and all(
            close(x, y) for x, y in zip(a, b))
    if isinstance(a, dict):
        return isinstance(b, dict) and set(a) == set(b) and all(
            close(a[k], b[k]) for k in a)
    if a is None or b is None:
        return a is b
    if isinstance(a, float) and math.isnan(a):
        return isinstance(b, float) and math.isnan(b)
    if isinstance(a, (int, float)):
        return abs(a - b) <= 1e-9
    return a == b


def collect_matrix(df):
    feature_cols = [c for c in df.columns if c not in (
        "ranking_id", "ts_ms", "seq", "user_id", "session_id", "position",
        "item_id", "item_label", "label")]
    out = {}
    for r in df.collect():
        d = r.asDict(recursive=True)
        out[(d["ranking_id"], d["position"])] = {
            c: d[c] for c in feature_cols + ["item_id", "label"]}
    return out


def assert_matrices_equal(full, inc):
    assert set(full) == set(inc), (
        f"row keys differ: only-full={sorted(set(full) - set(inc))[:5]} "
        f"only-inc={sorted(set(inc) - set(full))[:5]}")
    for k in full:
        for c in full[k]:
            assert close(full[k][c], inc[k][c]), (
                f"{k} col {c}: full={full[k][c]!r} inc={inc[k][c]!r}")


@pytest.mark.parametrize("seed,cut_day", [(1, 30), (7, 30), (42, 20)])
def test_incremental_equals_full(spark, seed, cut_day):
    rows = gen_events(seed)
    df = events_df(spark, rows)
    eng = engine()
    t0 = T0 + cut_day * DAY

    full = training_matrix(df, eng).filter(f"ts_ms > {t0}")
    snap = snapshot(df, t0, eng)
    inc = incremental_training_matrix(
        snap, df.filter(f"ts_ms > {t0}"), eng)
    assert_matrices_equal(collect_matrix(full), collect_matrix(inc))


def test_snapshot_bounded_by_horizon_not_history(spark):
    """Doubling ancient history grows the snapshot by at most the
    retention constants (last-K pools), never proportionally — the
    O(delta + horizon) claim."""
    # the boundedness argument only needs the horizon/pool mechanics,
    # not the full 12-feature engine — keep this test light
    eng = FeatureEngine([
        InteractionCount("clicks", "click"),
        WindowCount("wc", "click", (1, 3)),
        Stats("st", "price", pool=4, percentiles=(50,)),
        RecentItems("rec", "click", count=3, scope="user"),
    ])
    t0 = T0 + 30 * DAY
    base = gen_events(3, n_events=200)
    # extra ancient-only traffic: everything in the first 10 days
    extra = [r for r in gen_events(99, n_events=200)
             if r["ts_ms"] < T0 + 10 * DAY]
    for i, r in enumerate(sorted(base + extra,
                                 key=lambda r: (r["ts_ms"], r["seq"]))):
        r["seq"] = i
    dense = base + extra

    small = snapshot(events_df(spark, base), t0, eng).tail.count()
    big = snapshot(events_df(spark, dense), t0, eng).tail.count()
    n_extra = len(extra)
    assert n_extra > 50
    # the dense history has n_extra more events; the snapshot may keep a
    # few more (pool slots that were previously unfilled) but nothing
    # proportional to the added volume
    assert big - small < n_extra * 0.5


def test_horizon_covers_widest_window(spark):
    eng = engine()
    h = history_horizon_ms(eng)
    assert h >= 4 * DAY  # wc periods (1,3) → (3+1) buckets of slack


def test_save_load_roundtrip(spark, tmp_path):
    rows = gen_events(11)
    df = events_df(spark, rows)
    # save/load mechanics don't depend on engine breadth — keep it light
    eng = FeatureEngine([
        InteractionCount("clicks", "click"),
        InteractionCount("imps", "impression"),
        WindowCount("wc", "click", (1, 3)),
        Rate("ctr", "click", "impression", (2,)),
        Freq("fr", "kind", pool=4),
    ])
    t0 = T0 + 30 * DAY
    snap = snapshot(df, t0, eng)
    save_snapshot(snap, str(tmp_path / "snap"))
    loaded = load_snapshot(spark, str(tmp_path / "snap"))
    assert loaded.t0_ms == snap.t0_ms
    assert loaded.commit_at_expiry == snap.commit_at_expiry
    assert loaded.tail.count() == snap.tail.count()
    inc_a = collect_matrix(incremental_training_matrix(
        snap, df.filter(f"ts_ms > {t0}"), eng))
    inc_b = collect_matrix(incremental_training_matrix(
        loaded, df.filter(f"ts_ms > {t0}"), eng))
    assert_matrices_equal(inc_a, inc_b)


UA_POOL = [
    "Mozilla/4.0 (compatible; MSIE 9.0; Windows NT 6.1)",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 16_0 like Mac OS X) AppleWebKit/605.1",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 Chrome/120.0",
]
REF_POOL = [
    "https://www.google.com/search?q=x",
    "https://t.co/abc",
    "https://example.com/internal",
]


def enrich(rows, seed=0):
    """Extend a gen_events stream with the fields the wide engine reads:
    metadata on item events (title/color/in_stock/emb), ua/ref/query on
    rankings."""
    rnd = random.Random(seed)
    for r in rows:
        if r["event_type"] == "item":
            r["str_fields"] = dict(r["str_fields"] or {})
            r["str_fields"]["title"] = [
                " ".join(rnd.sample(
                    ["red", "shoe", "fast", "cheap", "wool", "blue"],
                    k=rnd.randrange(1, 4)))]
            r["str_fields"]["color"] = [rnd.choice(["red", "green", "blue"])]
            r["str_fields"]["in_stock"] = [rnd.choice(["true", "false"])]
            r["numlist_fields"] = {
                "emb": [round(rnd.uniform(-1, 1), 3) for _ in range(4)]}
        elif r["event_type"] == "ranking":
            r["str_fields"] = {
                "ua": [rnd.choice(UA_POOL)],
                "ref": [rnd.choice(REF_POOL)],
                "query": [rnd.choice(["red shoe", "wool", "cheap blue"])],
            }
    return rows


def test_incremental_equals_full_wide_engine(spark):
    """The equivalence property over the REST of the extractor surface:
    TTL'd windows/rates, Boolean/StringEncode/WordCount/Vector scalars,
    UserAgent, Referer, FieldMatch, Diversity (which reads item state —
    the retention rule a 'ranking-local' misreading would miss), and a
    sampled Stats pool."""
    from metarank_spark.engine import (
        Boolean,
        Diversity,
        FieldMatch,
        Referer,
        StringEncode,
        UserAgent,
        Vector,
        WordCount,
    )

    rows = enrich(gen_events(77), seed=77)
    df = events_df(spark, rows)
    eng = FeatureEngine([
        WindowCount("wct", "click", (1, 3), ttl_ms=5 * DAY),
        Rate("ctrt", "click", "impression", (2,), ttl_ms=5 * DAY),
        Boolean("instock", "in_stock"),
        StringEncode("color", "color", values=("red", "green", "blue"),
                     encode="onehot"),
        WordCount("twc", "title"),
        Vector("embv", "emb", reducers=("min", "max", "avg")),
        UserAgent("uap", "ua", mapper="platform"),
        Referer("refm", "ref", scope="user"),
        FieldMatch("fm", "query", "title", method="term"),
        Diversity("div", "price", kind="numeric"),
        Stats("sts", "price", pool=3, percentiles=(50,), sample_rate=0.5),
    ])
    t0 = T0 + 30 * DAY
    full = training_matrix(df, eng).filter(f"ts_ms > {t0}")
    snap = snapshot(df, t0, eng)
    inc = incremental_training_matrix(snap, df.filter(f"ts_ms > {t0}"), eng)
    assert_matrices_equal(collect_matrix(full), collect_matrix(inc))


def test_roll_equals_fresh(spark):
    """Snapshot rolling: advancing day-20's snapshot to day-30 using only
    tail ∪ delta produces the same delta matrix as a from-scratch
    full-history replay — the no-full-rescan production loop."""
    from metarank_spark.operators.incremental import roll_snapshot

    rows = gen_events(13)
    df = events_df(spark, rows)
    eng = FeatureEngine([
        InteractionCount("clicks", "click"),
        InteractionCount("imps", "impression"),
        WindowCount("wc", "click", (1, 3)),
        Rate("ctr", "click", "impression", (2,)),
        Number("price", "price"),
        Freq("fr", "kind", pool=4),
    ])
    t0 = T0 + 20 * DAY
    t1 = T0 + 30 * DAY

    s0 = snapshot(df, t0, eng)
    rolled = roll_snapshot(s0, df.filter(f"ts_ms > {t0}"), t1, eng)
    assert rolled.t0_ms == t1

    full = training_matrix(df, eng).filter(f"ts_ms > {t1}")
    inc = incremental_training_matrix(
        rolled, df.filter(f"ts_ms > {t1}"), eng)
    assert_matrices_equal(collect_matrix(full), collect_matrix(inc))

    with pytest.raises(ValueError, match="must exceed"):
        roll_snapshot(rolled, df, t0, eng)


def test_backfill_job_snapshot_cli(spark, tmp_path):
    """jobs/backfill.py --snapshot-out / --from-snapshot: the spark-submit
    surface of the incremental path, end-to-end on a tiny stream."""
    import json as _json

    from jobs.backfill import main

    rows = gen_events(21, n_events=80)
    df = events_df(spark, rows)
    ev_path = str(tmp_path / "events.parquet")
    df.write.parquet(ev_path)
    t0 = T0 + 30 * DAY
    spec = [
        {"type": "interaction_count", "name": "clicks", "interaction": "click"},
        {"type": "window_count", "name": "wc", "interaction": "click",
         "periods": [1, 3]},
    ]
    spec_path = str(tmp_path / "features.json")
    with open(spec_path, "w") as fh:
        _json.dump(spec, fh)

    snap_path = str(tmp_path / "snap")
    assert main([
        "--events", ev_path, "--features", spec_path,
        "--output", str(tmp_path / "unused"),
        "--snapshot-out", snap_path, "--snapshot-t0", str(t0),
    ]) == 0
    assert (tmp_path / "snap" / "snapshot.json").exists()

    out_path = str(tmp_path / "delta_matrix")
    assert main([
        "--events", ev_path, "--features", spec_path,
        "--output", out_path, "--from-snapshot", snap_path,
    ]) == 0

    from metarank_spark.engine import FeatureEngine
    from jobs.backfill import parse_features

    eng = FeatureEngine(parse_features(spec))
    full = training_matrix(df, eng).filter(f"ts_ms > {t0}")
    inc = spark.read.parquet(out_path)
    assert_matrices_equal(collect_matrix(full), collect_matrix(inc))

    # --roll-to: advance the snapshot via the CLI, then fold on it
    t1 = T0 + 35 * DAY
    snap2 = str(tmp_path / "snap2")
    assert main([
        "--events", ev_path, "--features", spec_path,
        "--output", str(tmp_path / "unused2"),
        "--from-snapshot", snap_path, "--snapshot-out", snap2,
        "--roll-to", str(t1),
    ]) == 0
    out2 = str(tmp_path / "delta_matrix2")
    assert main([
        "--events", ev_path, "--features", spec_path,
        "--output", out2, "--from-snapshot", snap2,
    ]) == 0
    full2 = training_matrix(df, eng).filter(f"ts_ms > {t1}")
    inc2 = spark.read.parquet(out2)
    assert_matrices_equal(collect_matrix(full2), collect_matrix(inc2))


def event_builder():
    """Hand-built streams for targeted scenarios: rows must be appended in
    (ts, seq) order."""
    rows = []

    def add(**kw):
        base = dict(event_id=f"e{len(rows)}", ts_ms=T0, seq=len(rows),
                    item_id=None, user_id=None, session_id=None,
                    ranking_id=None, interaction_type=None, items=None,
                    str_fields={}, num_fields={}, numlist_fields={})
        base.update(kw)
        rows.append(base)
        return base["event_id"]

    return rows, add


def test_stale_anchor_raw_impressions_retained(spark):
    """Regression (round-4 latent gap, luck-masked by wide horizons): an
    entity read after the cut whose last RAW impression predates the
    horizon — a post-cut read carries that stale write's window vector,
    so its context must be retained even though no clickthrough pull and
    no recent-window row covers it."""
    rows, add = event_builder()

    # free impressions for pX on days 0..2 — its last-anchored window
    for d in range(3):
        for i in range(d + 1):
            add(event_type="interaction", ts_ms=T0 + d * DAY + i * MIN,
                item_id="pX", user_id="u1", session_id="u1",
                interaction_type="impression")
    add(event_type="interaction", ts_ms=T0 + 2 * DAY + 30 * MIN,
        item_id="pX", user_id="u1", session_id="u1",
        interaction_type="click")
    # unrelated recent traffic so the horizon window is non-empty
    add(event_type="interaction", ts_ms=T0 + 29 * DAY, item_id="pY",
        user_id="u2", session_id="u2", interaction_type="impression")
    # post-cut ranking reads pX: must carry the stale day-2 vector
    rid = add(event_type="ranking", ts_ms=T0 + 31 * DAY, user_id="u2",
              session_id="u2",
              items=[{"id": "pX", "relevancy": 1.0},
                     {"id": "pY", "relevancy": 1.0}])
    add(event_type="interaction", ts_ms=T0 + 31 * DAY + MIN, item_id="pX",
        user_id="u2", session_id="u2", ranking_id=rid,
        interaction_type="click")
    df = events_df(spark, rows)
    eng = FeatureEngine([
        WindowCount("wimp", "impression", (1, 3)),
        Rate("ctr", "click", "impression", (2,)),
    ])
    t0 = T0 + 30 * DAY
    full = collect_matrix(training_matrix(df, eng).filter(f"ts_ms > {t0}"))
    # the read really does carry a non-missing stale vector
    px = next(v for v in full.values() if v["item_id"] == "pX")
    assert not math.isnan(px["wimp"][0])
    snap = snapshot(df, t0, eng)
    inc = incremental_training_matrix(snap, df.filter(f"ts_ms > {t0}"), eng)
    assert_matrices_equal(full, collect_matrix(inc))


def test_interacted_with_field_change_straddling_cut(spark):
    """Adversarial two-phase-read check (FeatureValueLoader.scala:11-26):
    the visitor's bounded list straddles the cut while a visited item's
    field value CHANGES inside the horizon — stage 2 must read the
    post-change value as-of the ranking, from a tail that retains the
    pre-horizon baseline via last-1 carry and the in-horizon change via
    the recent window."""
    rows, add = event_builder()
    # pre-horizon item metadata (relies on last-1 carry)
    add(event_type="item", ts_ms=T0 + 5 * DAY, item_id="A",
        str_fields={"color": ["red"]})
    add(event_type="item", ts_ms=T0 + 5 * DAY + MIN, item_id="B",
        str_fields={"color": ["green"]})
    add(event_type="item", ts_ms=T0 + 5 * DAY + 2 * MIN, item_id="D",
        str_fields={"color": ["yellow"]})
    # the visitor's clicks: just before the cut (list straddles it)
    t_click = T0 + 29 * DAY + 21 * 60 * MIN  # day 29.875
    add(event_type="interaction", ts_ms=t_click, item_id="A",
        user_id="u", session_id="u", interaction_type="click")
    add(event_type="interaction", ts_ms=t_click + MIN, item_id="B",
        user_id="u", session_id="u", interaction_type="click")
    # A's color changes AFTER the visit, INSIDE the horizon, BEFORE cut
    add(event_type="item", ts_ms=T0 + 29 * DAY + 23 * 60 * MIN,
        item_id="A", str_fields={"color": ["blue"]})
    # D's color changes in the DELTA, before the ranking
    add(event_type="item", ts_ms=T0 + 30 * DAY + 60 * MIN, item_id="D",
        str_fields={"color": ["blue"]})
    # post-cut ranking by the same visitor: candidate D(blue) overlaps
    # A's POST-change color; E(green, set below) overlaps B
    add(event_type="item", ts_ms=T0 + 30 * DAY + 61 * MIN, item_id="E",
        str_fields={"color": ["green"]})
    rid = add(event_type="ranking", ts_ms=T0 + 30 * DAY + 120 * MIN,
              user_id="u", session_id="u",
              items=[{"id": "D", "relevancy": 1.0},
                     {"id": "E", "relevancy": 1.0}])
    add(event_type="interaction", ts_ms=T0 + 30 * DAY + 121 * MIN,
        item_id="D", user_id="u", session_id="u", ranking_id=rid,
        interaction_type="click")
    df = events_df(spark, rows)
    eng = FeatureEngine([
        InteractedWith("iw", "click", fields=("color",), scope="user",
                       count=5, duration_ms=2 * DAY),
    ])
    t0 = T0 + 30 * DAY
    full = collect_matrix(training_matrix(df, eng).filter(f"ts_ms > {t0}"))
    # pin the ordering contract itself, not just full==inc: D overlaps
    # A's post-change blue, E overlaps B's green
    by_item = {v["item_id"]: v["iw"] for v in full.values()}
    assert by_item["D"] == [1.0] and by_item["E"] == [1.0]
    snap = snapshot(df, t0, eng)
    inc = incremental_training_matrix(snap, df.filter(f"ts_ms > {t0}"), eng)
    assert_matrices_equal(full, collect_matrix(inc))


def test_fingerprint_guards_config_drift(spark):
    """Folding or rolling a snapshot with a feature config that differs
    from the one it was built under must raise, not silently emit a wrong
    matrix (the snapshot's retention rules are engine-specific)."""
    from metarank_spark.operators.incremental import (
        engine_fingerprint,
        roll_snapshot,
    )

    rows = gen_events(17, n_events=80)
    df = events_df(spark, rows)
    eng = FeatureEngine([
        InteractionCount("clicks", "click"),
        WindowCount("wc", "click", (1, 3)),
    ])
    t0 = T0 + 20 * DAY
    snap = snapshot(df, t0, eng)
    assert snap.fingerprint == engine_fingerprint(eng)

    drifted = FeatureEngine([
        InteractionCount("clicks", "click"),
        WindowCount("wc", "click", (1, 7)),  # wider window: tail too thin
    ])
    with pytest.raises(ValueError, match="fingerprint"):
        incremental_training_matrix(snap, df.filter(f"ts_ms > {t0}"), drifted)
    with pytest.raises(ValueError, match="fingerprint"):
        roll_snapshot(snap, df.filter(f"ts_ms > {t0}"), t0 + 5 * DAY, drifted)
    # a renamed counter is also caught by the offsets lookup even on
    # pre-fingerprint snapshots
    legacy = snapshot(df, t0, eng)
    legacy.fingerprint = None
    renamed = FeatureEngine([
        InteractionCount("clicks2", "click"),
        WindowCount("wc", "click", (1, 3)),
    ])
    with pytest.raises(ValueError, match="does not define"):
        incremental_training_matrix(
            legacy, df.filter(f"ts_ms > {t0}"), renamed)


def test_fold_tolerates_full_table_as_delta(spark):
    """A caller passing the FULL event table instead of the delta must get
    the same (correct) matrix — the ts > t0 entry guard, not a silent
    double-count of every tail row."""
    rows = gen_events(19, n_events=120)
    df = events_df(spark, rows)
    eng = FeatureEngine([
        InteractionCount("clicks", "click"),
        WindowCount("wc", "click", (1, 3)),
    ])
    t0 = T0 + 25 * DAY
    snap = snapshot(df, t0, eng)
    via_delta = collect_matrix(incremental_training_matrix(
        snap, df.filter(f"ts_ms > {t0}"), eng))
    via_full = collect_matrix(incremental_training_matrix(snap, df, eng))
    assert_matrices_equal(via_delta, via_full)


def test_save_load_file_uri(spark, tmp_path):
    """The descriptor goes through the Hadoop FS API: a file: URI path
    (any supported scheme) round-trips."""
    rows = gen_events(23, n_events=60)
    df = events_df(spark, rows)
    eng = FeatureEngine([InteractionCount("clicks", "click")])
    t0 = T0 + 20 * DAY
    snap = snapshot(df, t0, eng)
    uri = "file://" + str(tmp_path / "snap_uri")
    save_snapshot(snap, uri)
    loaded = load_snapshot(spark, uri)
    assert loaded.t0_ms == snap.t0_ms
    assert loaded.fingerprint == snap.fingerprint
    inc_a = collect_matrix(incremental_training_matrix(
        snap, df.filter(f"ts_ms > {t0}"), eng))
    inc_b = collect_matrix(incremental_training_matrix(
        loaded, df.filter(f"ts_ms > {t0}"), eng))
    assert_matrices_equal(inc_a, inc_b)


def test_incremental_equals_full_ttl_counters(spark):
    """TTL'd lifetime counters take the O(delta+horizon) path: the offset
    join is gated on replayed freshness (a stale key reads 0.0 in both
    runs), and the retained last write — raw OR injected impression —
    keeps replayed expiry decisions identical to the full stream's."""
    rows = gen_events(31)
    df = events_df(spark, rows)
    eng = FeatureEngine([
        InteractionCount("clicks", "click"),
        InteractionCount("clickst", "click", ttl_ms=2 * DAY),
        InteractionCount("uclickst", "click", scope="user", ttl_ms=3 * DAY),
        InteractionCount("impst", "impression", ttl_ms=2 * DAY),
        WindowCount("wc", "click", (1, 3), ttl_ms=5 * DAY),
    ])
    t0 = T0 + 30 * DAY
    full = collect_matrix(training_matrix(df, eng).filter(f"ts_ms > {t0}"))
    snap = snapshot(df, t0, eng)
    inc = incremental_training_matrix(snap, df.filter(f"ts_ms > {t0}"), eng)
    assert_matrices_equal(full, collect_matrix(inc))
    # the property is only meaningful if expiry actually fires: somewhere
    # a TTL'd counter reads 0 while its lifetime twin is positive, and
    # some entity carries pre-cut history beyond the retained tail
    assert any(v["clickst"] == 0.0 and v["clicks"] > 0 for v in full.values())
    assert snap.offsets["clickst"].count() > 0


def test_incremental_equals_full_field_scoped(spark):
    """Field-scoped counters take the O(delta+horizon) path: selection
    over derived entities + the as-of fix-up (every tail interaction's
    field event pulled) + derived-entity offsets. gen_events rotates each
    item's ``kind`` value over time, so historical re-keyings are real:
    the same item's clicks land under different field values, and the
    replay must re-derive each one identically."""
    rows = enrich(gen_events(57), seed=57)
    df = events_df(spark, rows)
    eng = FeatureEngine([
        InteractionCount("fkc", "click", scope="item.kind"),
        InteractionCount("fkct", "click", scope="item.kind",
                         ttl_ms=3 * DAY),
        WindowCount("fwc", "click", (1, 3), scope="item.kind"),
        # bottom=impression exercises the injected field-scoped leg
        Rate("fctr", "click", "impression", (2,), scope="item.kind"),
        Rate("rkr", "click", "impression", (2,), scope="ranking.query"),
        InteractionCount("clicks", "click"),
    ])
    t0 = T0 + 30 * DAY
    full = collect_matrix(training_matrix(df, eng).filter(f"ts_ms > {t0}"))
    snap = snapshot(df, t0, eng)
    inc = incremental_training_matrix(snap, df.filter(f"ts_ms > {t0}"), eng)
    assert_matrices_equal(full, collect_matrix(inc))
    # the offsets are keyed by DERIVED entities (field values), and some
    # pre-cut history actually lives beyond the tail
    fkc_ents = {r["entity"] for r in snap.offsets["fkc"].collect()}
    assert fkc_ents and fkc_ents <= {"a", "b", "c"}


def test_chained_daily_rolls(spark):
    """Production is N consecutive daily rolls, not one: starting from
    day 24, roll the snapshot forward one day at a time for 7 days. At
    every cut the incremental matrix for that day's delta is bit-identical
    to a from-scratch full replay; at the final cut the rolled snapshot's
    tail and offsets EQUAL a fresh snapshot's (same retained seqs, same
    entity-wise offsets) — so no growth or drift can accumulate across
    rolls. The engine includes a TTL'd and a field-scoped counter, so the
    round-5 lifted paths are exercised under rolling too."""
    from metarank_spark.operators.incremental import roll_snapshot

    rows = enrich(gen_events(23), seed=23)
    df = events_df(spark, rows)
    eng = FeatureEngine([
        InteractionCount("clicks", "click"),
        InteractionCount("uclickst", "click", scope="user", ttl_ms=3 * DAY),
        InteractionCount("fkc", "click", scope="item.kind"),
        WindowCount("wc", "click", (1, 3)),
        Rate("ctr", "click", "impression", (2,)),
        Number("price", "price"),
    ])
    t = T0 + 24 * DAY
    snap = snapshot(df, t, eng)
    tail_sizes = [snap.tail.count()]
    for _ in range(7):
        t += DAY
        # pass the FULL table: the ≤ t0 guard must drop already-folded
        # rows, snapshot() itself ignores rows past the new cut
        snap = roll_snapshot(snap, df, t, eng)
        tail_sizes.append(snap.tail.count())
        full = training_matrix(df, eng).filter(f"ts_ms > {t}")
        inc = incremental_training_matrix(snap, df.filter(f"ts_ms > {t}"), eng)
        assert_matrices_equal(collect_matrix(full), collect_matrix(inc))
    fresh = snapshot(df, t, eng)
    rolled_seqs = {r["seq"] for r in snap.tail.select("seq").collect()}
    fresh_seqs = {r["seq"] for r in fresh.tail.select("seq").collect()}
    assert rolled_seqs == fresh_seqs, (
        f"tail drift after 7 rolls: +{len(rolled_seqs - fresh_seqs)} "
        f"-{len(fresh_seqs - rolled_seqs)}")
    for name in fresh.offsets:
        r = {x["entity"]: x["offset"] for x in snap.offsets[name].collect()}
        f = {x["entity"]: x["offset"] for x in fresh.offsets[name].collect()}
        assert r == f, f"offset drift after 7 rolls for {name}"
    # bounded across the chain: uniform traffic, so no roll's tail may
    # outgrow the horizon-sized envelope the first cut established
    assert max(tail_sizes) <= 2 * min(tail_sizes), tail_sizes


def test_roll_save_in_place(spark, tmp_path):
    """The daily production loop saves the rolled snapshot OVER the path
    it was loaded from while the rolled offsets still lazily READ that
    path (roll_snapshot checkpoints only the tail) — save_snapshot must
    stage to a temp sibling and swap, not overwrite mid-scan
    (FAILED_READ_FILE regression, caught by the rolled-loop bench)."""
    from metarank_spark.operators.incremental import roll_snapshot

    rows = gen_events(11, n_events=120)
    df = events_df(spark, rows)
    eng = FeatureEngine([InteractionCount("clicks", "click")])
    sp = str(tmp_path / "snap")
    save_snapshot(snapshot(df, T0 + 20 * DAY, eng), sp)
    s = load_snapshot(spark, sp)
    t1 = T0 + 21 * DAY
    new = roll_snapshot(s, df.filter(f"ts_ms > {s.t0_ms}"), t1, eng)
    save_snapshot(new, sp)  # in-place: deleted the files it reads before
    s2 = load_snapshot(spark, sp)
    full = training_matrix(df, eng).filter(f"ts_ms > {t1}")
    inc = incremental_training_matrix(s2, df.filter(f"ts_ms > {t1}"), eng)
    assert_matrices_equal(collect_matrix(full), collect_matrix(inc))
