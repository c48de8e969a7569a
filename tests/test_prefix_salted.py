"""Salted two-pass prefix aggregation (plans/prefix.py) equals the plain
entity window bit-for-bit, including hot-key fixtures and the
strictly-before variant, and its plan has no entity-only window."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from metarank_spark.plans.prefix import salted_cumulative_sum

DAY = 86_400_000
T0 = 1_700_000_000_000


def _events(spark, seed=9):
    rnd = random.Random(seed)
    rows = []
    eid = 0
    # u_hot carries 60% of all events (the skew case the salting exists for)
    for _ in range(600):
        eid += 1
        rows.append(("u_hot", T0 + rnd.randrange(0, 60 * DAY), eid,
                     float(rnd.randrange(0, 5))))
    for u in range(20):
        for _ in range(20):
            eid += 1
            rows.append((f"u{u}", T0 + rnd.randrange(0, 60 * DAY), eid,
                         float(rnd.randrange(0, 5))))
    return spark.createDataFrame(
        rows, "user_id string, ts_ms long, event_id long, value double"
    )


def _plain(df, strictly_before):
    end = -1 if strictly_before else Window.currentRow
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, end)
    )
    return df.withColumn("cum", F.coalesce(F.sum("value").over(w), F.lit(0.0)))


def test_salted_equals_plain_window(spark):
    df = _events(spark)
    for strict in (False, True):
        got = {
            (r["user_id"], r["event_id"]): r["cum"]
            for r in salted_cumulative_sum(
                df, F.col("value"), chunk_ms=7 * DAY, strictly_before=strict
            ).collect()
        }
        exp = {
            (r["user_id"], r["event_id"]): r["cum"]
            for r in _plain(df, strict).collect()
        }
        assert got == exp


def test_salted_ties_same_chunk(spark):
    """Same-(ts) collisions resolve by event_id inside one chunk exactly
    like the plain window (order is (ts, seq) within chunks)."""
    rows = [("u", T0, i, 1.0) for i in range(1, 8)]
    df = spark.createDataFrame(rows, "user_id string, ts_ms long, event_id long, value double")
    got = {
        r["event_id"]: r["cum"]
        for r in salted_cumulative_sum(df, F.col("value"), strictly_before=True).collect()
    }
    assert got == {i: float(i - 1) for i in range(1, 8)}


def test_salted_plan_partitions_by_chunk(spark):
    """The big window must partition by (entity, chunk) — a hot entity's
    timeline spreads across chunk tasks instead of one."""
    df = _events(spark)
    plan = salted_cumulative_sum(df, F.col("value"))._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # chunk key participates in the partitioning
