"""Arrow kernel path: cross-validate against the JVM merged scan and test
a custom extractor the window algebra can't express."""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql import types as T

from metarank_spark.engine import FeatureEngine, WindowCount
from metarank_spark.events import events_df
from metarank_spark.operators.kernel import (
    decayed_count_kernel,
    run_kernel,
    window_count_kernel,
)
from tests.test_property_parity import gen_events

DAY = 86_400_000


def _frames(spark, rows):
    ev = events_df(spark, rows)
    writes = ev.filter(
        (F.col("event_type") == "interaction") & (F.col("interaction_type") == "click")
    ).select(F.col("item_id").alias("entity"), "ts_ms", "seq")
    rankings = ev.filter(F.col("event_type") == "ranking")
    queries = rankings.select(
        F.explode(F.transform("items", lambda x: x["id"])).alias("entity"),
        "ts_ms", "seq", F.col("event_id").alias("ranking_id"),
    ).withColumn("item_id", F.col("entity"))
    return ev, writes, queries


def test_kernel_window_count_equals_jvm_engine(spark):
    rows = gen_events(99)
    ev, writes, queries = _frames(spark, rows)

    k = run_kernel(
        queries, writes, "entity",
        window_count_kernel((7,)),
        out_fields=[T.StructField("wcnt", T.ArrayType(T.DoubleType()))],
        query_keys=["ranking_id", "item_id"],
    )
    kernel_out = {(r["ranking_id"], r["item_id"]): r["wcnt"] for r in k.collect()}

    eng = FeatureEngine([WindowCount("wcnt", "click", (7,))])
    jvm_out = {
        (r["ranking_id"], r["item_id"]): r["wcnt"]
        for r in eng.ranking_values(ev).collect()
    }
    assert set(kernel_out) == set(jvm_out)
    for key, kv in kernel_out.items():
        jv = jvm_out[key]
        for a, b in zip(kv, jv):
            assert (math.isnan(a) and math.isnan(b)) or abs(a - b) < 1e-9, (key, kv, jv)


def test_kernel_custom_decayed_count(spark):
    T0 = 1_704_067_200_000
    rows = [
        dict(event_id="c1", event_type="interaction", ts_ms=T0, seq=1,
             item_id="p1", user_id="u1", session_id="s1", ranking_id=None,
             interaction_type="click", items=None, str_fields={}, num_fields={},
             numlist_fields={}),
        dict(event_id="c2", event_type="interaction", ts_ms=T0 + DAY, seq=2,
             item_id="p1", user_id="u1", session_id="s1", ranking_id=None,
             interaction_type="click", items=None, str_fields={}, num_fields={},
             numlist_fields={}),
        dict(event_id="r1", event_type="ranking", ts_ms=T0 + 2 * DAY, seq=3,
             item_id=None, user_id="u1", session_id="s1", ranking_id=None,
             interaction_type=None, items=[{"id": "p1", "relevancy": 1.0}],
             str_fields={}, num_fields={}, numlist_fields={}),
    ]
    ev, writes, queries = _frames(spark, rows)
    out = run_kernel(
        queries, writes, "entity",
        decayed_count_kernel(half_life_ms=float(DAY)),
        out_fields=[T.StructField("decayed", T.DoubleType())],
        query_keys=["ranking_id", "item_id"],
    ).collect()
    # clicks 2 days and 1 day before, half-life 1 day → 0.25 + 0.5
    assert abs(out[0]["decayed"] - 0.75) < 1e-12


def test_strictly_before_index_large_seq():
    """seq >= 1e6 broke the old packed ts*1e6+seq key (key collisions /
    non-monotone order); the lexsort merge must match brute force."""
    import numpy as np
    import pandas as pd

    from metarank_spark.operators.kernel import strictly_before_index

    w = pd.DataFrame({"ts_ms": [1, 2, 2], "seq": [5_000_000, 10, 7_000_001]})
    q = pd.DataFrame({"ts_ms": [1, 2, 2, 3], "seq": [6_000_000, 10, 7_000_002, 0]})
    got = strictly_before_index(w, q)
    brute = [
        sum(
            (wt < qt) or (wt == qt and ws < qs)
            for wt, ws in zip(w["ts_ms"], w["seq"])
        )
        for qt, qs in zip(q["ts_ms"], q["seq"])
    ]
    assert list(got) == brute == [1, 1, 3, 3]

    rng = np.random.RandomState(7)
    wf = pd.DataFrame(
        {"ts_ms": np.sort(rng.randint(0, 50, 200)), "seq": rng.randint(0, 10**9, 200)}
    ).sort_values(["ts_ms", "seq"]).reset_index(drop=True)
    qf = pd.DataFrame(
        {"ts_ms": np.sort(rng.randint(0, 50, 80)), "seq": rng.randint(0, 10**9, 80)}
    ).sort_values(["ts_ms", "seq"]).reset_index(drop=True)
    got = strictly_before_index(wf, qf)
    brute = [
        int(((wf["ts_ms"] < t) | ((wf["ts_ms"] == t) & (wf["seq"] < s))).sum())
        for t, s in zip(qf["ts_ms"], qf["seq"])
    ]
    assert list(got) == brute
