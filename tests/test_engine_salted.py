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
