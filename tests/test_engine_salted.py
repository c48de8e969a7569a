"""Hot-entity salting (FeatureEngine(hot_chunk_ms=...)) is a pure plan
transform: ranking_values / two-phase / field-scoped outputs are
bit-identical to the unsalted engine, while the event-scale windows
partition by (entity, time-chunk) instead of the bare entity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

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
from tests.test_property_parity import gen_events

DAY = 86_400_000

FEATURES = lambda: [  # noqa: E731 — fresh configs per engine
    InteractionCount("clicks", "click"),
    WindowCount("wcnt", "click", (3, 7)),
    Rate("ctr", "click", "impression", (7,)),
    Number("price", "price"),
    Stats("st", "price", pool=5, percentiles=(50,)),
    Freq("fr", "kind", pool=5),
    RecentItems("rec", "click", count=3, scope="user"),
]


def _canon(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(_canon(r[c]) for c in cols) for r in df.collect()),
        key=repr,
    )


def test_ranking_values_salted_identical(spark):
    rows = gen_events(11, n_events=220)
    ev = events_df(spark, rows)
    plain = FeatureEngine(FEATURES()).ranking_values(ev)
    salted_df = FeatureEngine(FEATURES(), hot_chunk_ms=3 * DAY).ranking_values(ev)
    assert _rows(plain) == _rows(salted_df)
    plan = salted_df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # the carry runs chunk-partitioned


def test_declared_hot_split_identical(spark):
    """hot_entities + hot_chunk_ms: only the declared keys run salted,
    cold entities keep the plain windows — output still bit-identical,
    and both carry shapes appear in the plan."""
    rows = gen_events(13, n_events=220)
    ev = events_df(spark, rows)
    plain = _rows(FeatureEngine(FEATURES()).ranking_values(ev))
    eng = FeatureEngine(
        FEATURES(), hot_chunk_ms=3 * DAY,
        hot_entities=["u0", "u1", "p2"],  # user + item scope keys mixed
    )
    salted_df = eng.ranking_values(ev)
    assert _rows(salted_df) == plain
    plan = salted_df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_two_phase_salted_identical(spark):
    rows = gen_events(23, n_events=200)
    ev = events_df(spark, rows)
    plain = FeatureEngine(FEATURES())
    expected = _rows(plain.ranking_values(ev))

    salted = FeatureEngine(FEATURES(), hot_chunk_ms=3 * DAY)
    series = salted.write_series(ev)
    got = salted.ranking_values(ev, series=series)
    assert _rows(got) == expected


def test_field_scoped_salted_identical(spark):
    """Field-scoped rate/counters run the attach-path folds
    (_counter_fold / _periodic_fold) — those must be salt-invariant too."""
    rows = gen_events(31, n_events=200)
    for r in rows:  # give item metadata a category for the field scope
        if r["event_type"] == "item":
            r["str_fields"] = {"kind": [["a", "b", "c"][r["seq"] % 3]]}
    ev = events_df(spark, rows)

    def engine(**kw):
        return FeatureEngine([
            Rate("kctr", "click", "impression", (7,), scope="item.kind"),
            InteractionCount("kclicks", "click", scope="item.kind"),
        ], **kw)

    plain = _rows(engine().ranking_values(ev))
    got = _rows(engine(hot_chunk_ms=3 * DAY).ranking_values(ev))
    assert got == plain


def test_salted_late_writes_identical(spark):
    """Streams carrying a vts_ms column (bounded-late writes) route the
    late types through the sequential anchored machinery, everything else
    through the salted folds — output still bit-identical."""
    rows = gen_events(47, n_events=200)
    ev = events_df(spark, rows).withColumn(
        "vts_ms",
        F.when(
            F.col("interaction_type") == "impression",
            F.col("ts_ms") - F.lit(600_000),
        ),
    )
    feats = lambda: [  # noqa: E731
        WindowCount("wimp", "impression", (3, 7)),
        Rate("ctr", "click", "impression", (7,)),
        InteractionCount("clicks", "click"),
    ]
    plain = _rows(FeatureEngine(feats()).ranking_values(ev))
    got = _rows(
        FeatureEngine(feats(), hot_chunk_ms=3 * DAY).ranking_values(ev)
    )
    assert got == plain
    # declared-hot split: the impression leg routes through the COMPOSED
    # decomposed-anchored series (engine._compose_hot_series) — still
    # bit-identical
    got_split = _rows(
        FeatureEngine(
            feats(), hot_chunk_ms=3 * DAY, hot_entities=["u0", "u1", "u2"]
        ).ranking_values(ev)
    )
    assert got_split == plain


def test_global_scope_pools_banded_exact(spark):
    """$global-scoped pool features always take the banded trailing-rows
    join (a constant partition key would single-task the whole stream);
    exactness is checked against a Python fold of the same ordered
    stream: at each ranking, the pool is the last K samples strictly
    before it, globally across entities."""
    rows = gen_events(17, n_events=220)
    ev = events_df(spark, rows)
    feats = [
        Freq("gfr", "kind", pool=5, scope="global"),
        Stats("gst", "price", pool=5, percentiles=(50,), scope="global"),
    ]
    out = FeatureEngine(feats).ranking_values(ev)
    got = {
        (r["ranking_id"], r["position"]): (r["gfr"], r["gst"])
        for r in out.collect()
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__w_rn" in plan  # banded join, not a bare window

    # python oracle over the (ts, seq)-ordered stream
    evs = sorted(rows, key=lambda r: (r["ts_ms"], r["seq"]))
    kinds, prices = [], []
    reads = {}
    for r in evs:
        if r["event_type"] == "ranking":
            reads[r["event_id"]] = (list(kinds[-5:]), list(prices[-5:]))
        if r["event_type"] == "interaction":
            k = (r.get("str_fields") or {}).get("kind")
            if k:
                kinds.append(k[0])
            p = (r.get("num_fields") or {}).get("price")
            if p is not None:
                prices.append(p)
    import statistics

    for (rid, _pos), (gfr, gst) in got.items():
        ks, ps = reads[rid]
        if not ks:
            assert gfr is None or gfr == {}
        else:
            exp = {v: ks.count(v) / len(ks) for v in set(ks)}
            assert gfr.keys() == exp.keys()
            assert all(abs(gfr[v] - exp[v]) < 1e-12 for v in exp)
        if not ps:
            assert all(math.isnan(x) for x in gst)
        else:
            med = statistics.median(sorted(ps)) if len(ps) % 2 else None
            lo, hi, p50 = min(ps), max(ps), _percentile50(ps)
            assert abs(gst[0] - lo) < 1e-9 and abs(gst[1] - hi) < 1e-9
            assert abs(gst[2] - p50) < 1e-9


def _percentile50(ps):
    """Spark percentile(0.5): linear interpolation between closest
    ranks."""
    s = sorted(ps)
    idx = 0.5 * (len(s) - 1)
    lo = int(idx)
    frac = idx - lo
    return s[lo] if frac == 0 else s[lo] + (s[lo + 1] - s[lo]) * frac
