"""Bucketed+sorted event tables elide the write-fold exchange: the scan
itself reports hash partitioning on the entity, so the per-entity window
fold runs with ZERO shuffles — the claim in sources/tables.py, CI-pinned.
"""

from __future__ import annotations

import re

from metarank_spark.engine import FeatureEngine, InteractionCount, Rate, WindowCount
from metarank_spark.sources.tables import read_events_table, write_events_table


def _engine():
    return FeatureEngine([
        InteractionCount("clicks", "click"),
        WindowCount("cnt7", "click", (7,)),
        Rate("ctr", "click", "impression", (7, 14)),
    ])


def test_bucketed_table_elides_write_fold_exchange(spark, tmp_path):
    from metarank_spark.datagen import synthetic_ranklens

    ev = synthetic_ranklens(spark, users=300)
    spark.sql("DROP TABLE IF EXISTS test_ev_bucketed")
    write_events_table(
        ev, str(tmp_path), entity="item_id", buckets=8,
        table_name="test_ev_bucketed",
    )
    try:
        evb = read_events_table(spark, str(tmp_path), "test_ev_bucketed")
        series = _engine().write_series(evb)["item"]
        plan = series._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0, plan
        # and the zero-shuffle fold is the same fold: values equal the
        # plain-read series
        plain = _engine().write_series(ev)["item"]

        def canon(df):
            return sorted(
                (r["entity"], r["ts_ms"], r["seq"],
                 r["clicks__v"], tuple(r["cnt7__v"] or []),
                 tuple(r["ctr__t"] or []), tuple(r["ctr__b"] or []))
                for r in df.collect()
            )

        assert canon(series) == canon(plain)
    finally:
        spark.sql("DROP TABLE IF EXISTS test_ev_bucketed")
