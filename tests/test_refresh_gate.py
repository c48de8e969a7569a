"""Batch refresh gate (operators/refresh.py) — goldens mirroring
FeatureValueFlowTest.scala:22-49 plus a randomized brute-force parity."""

from __future__ import annotations

import random

from metarank_spark.operators.refresh import refresh_gate


def _df(spark, rows):
    return spark.createDataFrame(rows, "entity string, ts_ms long, seq long, value double")


def test_emit_once_under_gating(spark):
    """FeatureValueFlowTest 'obey refresh rate': three writes at the same
    ts emit exactly one value (refresh=1h in TestFeatureMapping)."""
    rows = [("p1", 1000, i, 10.0) for i in range(3)]
    out = refresh_gate(_df(spark, rows), "entity", refresh_ms=3_600_000).collect()
    assert len(out) == 1
    assert out[0]["seq"] == 0  # the first write is the one emitted


def test_first_write_always_emits_and_zero_disables(spark):
    rows = [("p1", 1000, 0, 1.0), ("p1", 2000, 1, 2.0), ("p2", 5, 2, 3.0)]
    gated = refresh_gate(_df(spark, rows), "entity", refresh_ms=10_000).collect()
    assert sorted((r["entity"], r["seq"]) for r in gated) == [("p1", 0), ("p2", 2)]
    # refresh 0 = emit every write (the reference's default in tests)
    all_out = refresh_gate(_df(spark, rows), "entity", refresh_ms=0).collect()
    assert len(all_out) == 3


def test_gate_matches_bruteforce(spark):
    rnd = random.Random(11)
    rows = []
    for e in ("a", "b", "c"):
        t = 0
        for i in range(40):
            t += rnd.randrange(0, 2000)
            rows.append((e, t, i, float(i)))
    got = {
        (r["entity"], r["seq"])
        for r in refresh_gate(_df(spark, rows), "entity", refresh_ms=1500).collect()
    }
    exp = set()
    for e in ("a", "b", "c"):
        last = None
        for ent, ts, seq, _ in sorted(rows, key=lambda r: (r[1], r[2])):
            if ent != e:
                continue
            if last is None or ts - last >= 1500:
                exp.add((e, seq))
                last = ts
    assert got == exp
