"""Property test: on randomized event streams the Spark engine's ranking
snapshots equal the brute-force Python oracle (tests/oracle.py) — the
zero-leakage / allclose parity contract over arbitrary interleavings,
including same-timestamp collisions and multi-day gaps (the
anchor-at-last-bucket edge)."""

from __future__ import annotations

import math
import random

import pytest

from metarank_spark.engine import (
    FeatureEngine,
    Freq,
    InteractionCount,
    Number,
    Rate,
    RecentItems,
    Stats,
    WindowCount,
)
from metarank_spark.events import events_df
from tests.oracle import fold

T0 = 1_704_067_200_000
DAY = 86_400_000


def gen_events(seed: int, n_users=6, n_items=8, n_events=160):
    """Randomized stream with hostile properties: same-ts collisions
    (ts granularity 1h), out-of-nothing items, gaps up to 20 days."""
    rnd = random.Random(seed)
    rows = []
    seq = 0
    rid = 0
    for _ in range(n_events):
        seq += 1
        ts = T0 + rnd.randrange(0, 20 * DAY, 3_600_000)  # coarse → collisions
        kind = rnd.random()
        item = f"p{rnd.randrange(n_items)}"
        user = f"u{rnd.randrange(n_users)}"
        if kind < 0.25:
            rid += 1
            items = rnd.sample([f"p{i}" for i in range(n_items)], k=3)
            rows.append(dict(
                event_id=f"r{rid}", event_type="ranking", ts_ms=ts, seq=seq,
                item_id=None, user_id=user, session_id=user, ranking_id=None,
                interaction_type=None,
                items=[{"id": i, "relevancy": 1.0} for i in items],
                str_fields={}, num_fields={}, numlist_fields={},
            ))
        elif kind < 0.55:
            rows.append(dict(
                event_id=f"c{seq}", event_type="interaction", ts_ms=ts, seq=seq,
                item_id=item, user_id=user, session_id=user, ranking_id=None,
                interaction_type="click", items=None,
                str_fields={}, num_fields={}, numlist_fields={},
            ))
        elif kind < 0.85:
            rows.append(dict(
                event_id=f"i{seq}", event_type="interaction", ts_ms=ts, seq=seq,
                item_id=item, user_id=user, session_id=user, ranking_id=None,
                interaction_type="impression", items=None,
                str_fields={}, num_fields={}, numlist_fields={},
            ))
        else:
            rows.append(dict(
                event_id=f"m{seq}", event_type="item", ts_ms=ts, seq=seq,
                item_id=item, user_id=None, session_id=None, ranking_id=None,
                interaction_type=None, items=None,
                str_fields={}, num_fields={"price": round(rnd.uniform(1, 100), 2)},
                numlist_fields={},
            ))
    # enrich interactions with pool-sample fields
    for r in rows:
        if r["event_type"] == "interaction":
            h = (r["seq"] * 2654435761) % 97
            r["num_fields"] = {"price": float(h)}
            r["str_fields"] = {"kind": [["a", "b", "c"][h % 3]]}
    # stream order: sort by (ts, seq), then reassign seq = stream position
    rows.sort(key=lambda r: (r["ts_ms"], r["seq"]))
    for i, r in enumerate(rows):
        r["seq"] = i
    return rows


def close(a, b):
    if isinstance(a, list):
        return len(a) == len(b) and all(close(x, y) for x, y in zip(a, b))
    if a is None or b is None:
        return a is b
    if math.isnan(a):
        return math.isnan(b)
    return abs(a - b) <= 1e-9


@pytest.mark.parametrize("seed", [1, 7, 42, 1337])
def test_engine_matches_bruteforce_oracle(spark, seed):
    rows = gen_events(seed)
    periods = (7,)
    eng = FeatureEngine([
        InteractionCount("clicks", "click"),
        WindowCount("wcnt", "click", periods),
        Rate("ctr", "click", "impression", periods),
        Number("price", "price"),
        Stats("st", "price", pool=5, percentiles=(50,)),
        Freq("fr", "kind", pool=5),
        RecentItems("rec", "click", count=3, scope="user"),
    ])
    got = {
        (r["ranking_id"], r["item_id"]): r.asDict()
        for r in eng.ranking_values(events_df(spark, rows)).collect()
    }
    exp = fold(rows, periods)
    assert set(got) == set(exp)
    mismatches = []
    for k, e in exp.items():
        g = got[k]
        for feat in ("clicks", "price"):
            if not close(g[feat], e[feat]):
                mismatches.append((k, feat, g[feat], e[feat]))
        for feat in ("wcnt", "ctr", "st"):
            if not close(list(g[feat]), e[feat]):
                mismatches.append((k, feat, g[feat], e[feat]))
        if (g["fr"] or None) != (e["fr"] or None) and not (
            g["fr"] and e["fr"] and set(g["fr"]) == set(e["fr"])
            and all(abs(g["fr"][x] - e["fr"][x]) < 1e-9 for x in g["fr"])
        ):
            mismatches.append((k, "fr", g["fr"], e["fr"]))
        if list(g["rec"] or []) != list(e["rec"]):
            mismatches.append((k, "rec", g["rec"], e["rec"]))
    assert not mismatches, f"{len(mismatches)} mismatches; first 5: {mismatches[:5]}"


def _py_accept(event_id: str, rate: float) -> bool:
    """Python mirror of engine.sample_accept_expr (independent fold)."""
    h = 0
    for ch in event_id:
        h = (h * 31 + ord(ch)) % 1_000_003
    return h < int(rate * 1_000_003)


@pytest.mark.parametrize("seed", [3, 99])
def test_sampled_pools_match_filtered_oracle(spark, seed):
    """sample_rate=0.5: the engine's sampled Stats/Freq pools must equal
    the brute-force fold over the stream with hash-rejected interaction
    writes removed (sampling only affects pool contents, Feature.scala:249
    applied at put time in Mem/File/Redis estimators)."""
    rows = gen_events(seed)
    rate = 0.5
    eng = FeatureEngine([
        Stats("st", "price", pool=5, percentiles=(50,), sample_rate=rate),
        Freq("fr", "kind", pool=5, sample_rate=rate),
    ])
    got = {
        (r["ranking_id"], r["item_id"]): r.asDict()
        for r in eng.ranking_values(events_df(spark, rows)).collect()
    }
    filtered = [
        r for r in rows
        if r["event_type"] != "interaction" or _py_accept(r["event_id"], rate)
    ]
    n_dropped = len(rows) - len(filtered)
    assert 0 < n_dropped < sum(r["event_type"] == "interaction" for r in rows)
    exp = fold(filtered, (7,))
    assert set(got) == set(exp)
    mismatches = []
    for k, e in exp.items():
        g = got[k]
        if not close(list(g["st"]), e["st"]):
            mismatches.append((k, "st", g["st"], e["st"]))
        if (g["fr"] or None) != (e["fr"] or None) and not (
            g["fr"] and e["fr"] and set(g["fr"]) == set(e["fr"])
            and all(abs(g["fr"][x] - e["fr"][x]) < 1e-9 for x in g["fr"])
        ):
            mismatches.append((k, "fr", g["fr"], e["fr"]))
    assert not mismatches, f"{len(mismatches)}; first: {mismatches[:5]}"


def test_two_phase_series_equals_direct(spark):
    """write_series + assemble (two-phase) must be bit-identical to the
    direct merged scan for every merged-path feature type — this is the
    query-row-insensitivity contract write_series relies on."""
    from metarank_spark.engine import Number as Num
    from metarank_spark.engine import StringEncode

    rows = gen_events(5)
    eng = FeatureEngine([
        InteractionCount("clicks", "click"),
        WindowCount("wcnt", "click", (7,)),
        Rate("ctr", "click", "impression", (7,)),
        Num("price", "price"),
        StringEncode("kind1", "kind", ("a", "b", "c"), encode="onehot"),
        Stats("st", "price", pool=5, percentiles=(50,)),
        Freq("fr", "kind", pool=5),
        RecentItems("rec", "click", count=3, scope="user"),
    ])
    ev = events_df(spark, rows)
    direct = {
        (r["ranking_id"], r["item_id"], r["position"]): r.asDict()
        for r in eng.ranking_values(ev).collect()
    }
    via = {
        (r["ranking_id"], r["item_id"], r["position"]): r.asDict()
        for r in eng.ranking_values(ev, series=eng.write_series(ev)).collect()
    }
    assert set(direct) == set(via)
    feats = ["clicks", "wcnt", "ctr", "price", "kind1", "st", "fr", "rec"]
    mism = []
    for k, d in direct.items():
        v = via[k]
        for f in feats:
            a, b = d[f], v[f]
            if isinstance(a, dict) or isinstance(b, dict):
                ok = (a or None) == (b or None) or (
                    a and b and set(a) == set(b)
                    and all(abs(a[x] - b[x]) < 1e-12 for x in a)
                )
            elif isinstance(a, list) and not all(isinstance(x, float) for x in a or []):
                ok = list(a or []) == list(b or [])
            else:
                ok = close(a if not isinstance(a, list) else list(a),
                           b if not isinstance(b, list) else list(b))
            if not ok:
                mism.append((k, f, a, b))
    assert not mism, f"{len(mism)} mismatches; first: {mism[:5]}"
