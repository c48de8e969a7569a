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


def _merged_like(spark, seed=17):
    """A merged-scan-shaped frame: (entity, ts_ms, seq, __side) with two
    write-value columns of different null patterns and types (double +
    array) — hot entity carries most rows."""
    rnd = random.Random(seed)
    rows, seq = [], 0
    def emit(ent, n):
        nonlocal seq
        for _ in range(n):
            seq += 1
            side = rnd.randrange(0, 2)
            val = float(rnd.randrange(0, 9)) if side == 1 and rnd.random() < 0.7 else None
            arr = [float(seq % 5), 1.0] if side == 1 and rnd.random() < 0.5 else None
            rows.append((ent, T0 + rnd.randrange(0, 60 * DAY), seq, side, val, arr))
    emit("hot", 500)
    for u in range(15):
        emit(f"u{u}", 25)
    return spark.createDataFrame(
        rows,
        "entity string, ts_ms long, seq long, __side int, v double, a array<double>",
    )


def test_salted_strict_carry_equals_window(spark):
    from metarank_spark.plans.prefix import salted_strict_last_carry

    df = _merged_like(spark)
    order = ("ts_ms", "seq", "__side")
    w = (
        Window.partitionBy("entity")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    exp = {
        (r["entity"], r["seq"]): (r["cv"], tuple(r["ca"]) if r["ca"] else None)
        for r in df.select(
            "entity", "seq",
            F.last("v", ignorenulls=True).over(w).alias("cv"),
            F.last("a", ignorenulls=True).over(w).alias("ca"),
        ).collect()
    }
    got_df = salted_strict_last_carry(df, ["v", "a"], "entity", order, chunk_ms=7 * DAY)
    got = {
        (r["entity"], r["seq"]): (
            r["__carr_v"], tuple(r["__carr_a"]) if r["__carr_a"] else None
        )
        for r in got_df.collect()
    }
    assert got == exp
    # and no event-scale window partitions by the bare entity
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_salted_running_count_equals_window(spark):
    from metarank_spark.plans.prefix import salted_running_count

    df = _merged_like(spark).drop("v", "a")
    order = ("ts_ms", "seq", "__side")
    w = (
        Window.partitionBy("entity")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = {
        (r["entity"], r["seq"]): r["cnt"]
        for r in df.select(
            "entity", "seq", F.count(F.lit(1)).over(w).alias("cnt")
        ).collect()
    }
    got = {
        (r["entity"], r["seq"]): r["cnt"]
        for r in salted_running_count(df, "entity", order, chunk_ms=7 * DAY).collect()
    }
    assert got == exp


def test_salted_period_counts_equal_range_formula(spark):
    from metarank_spark.engine import FeatureEngine
    from metarank_spark.plans.prefix import salted_monotone_period_counts

    df = _merged_like(spark).drop("v", "a").withColumn("__side", F.lit(1))
    periods = (3, 7, 30)
    bucket = F.floor(F.col("ts_ms") / F.lit(DAY))
    direct = df.withColumn(
        "vec", FeatureEngine._monotone_period_counts(F.lit(1), bucket, periods)
    )
    exp = {
        (r["entity"], r["seq"]): tuple(r["vec"]) for r in direct.collect()
    }
    got_df = salted_monotone_period_counts(
        df, "entity", ("ts_ms", "seq", "__side"), DAY, periods
    )
    got = {(r["entity"], r["seq"]): tuple(r["vec"]) for r in got_df.collect()}
    assert got == exp


def test_salted_plan_partitions_by_chunk(spark):
    """The big window must partition by (entity, chunk) — a hot entity's
    timeline spreads across chunk tasks instead of one."""
    df = _events(spark)
    plan = salted_cumulative_sum(df, F.col("value"))._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # chunk key participates in the partitioning


def test_detect_hot_entities(spark):
    """The sampled heavy-hitter scan finds the macroscopic key and only
    it — small keys never cross the share filter even at full sampling."""
    from metarank_spark.plans.prefix import detect_hot_entities

    df = _events(spark)  # u_hot holds 60% of rows
    got = detect_hot_entities(df, "user_id", min_share=0.2, sample_fraction=1.0)
    assert got == ["u_hot"]
    # 1% share threshold at a 50% sample still isolates the heavy key
    # far above the uniform background (20 users x 20 rows each)
    got = detect_hot_entities(df, "user_id", min_share=0.3, sample_fraction=0.5)
    assert got == ["u_hot"]
    assert detect_hot_entities(df.limit(0), "user_id") == []


def test_salted_anchored_equals_sequential(spark):
    """The decomposed anchored periodic vector equals the sequential
    running-max + carry formula bit-for-bit on a frame with bounded-late
    value timestamps (vts <= commit ts, lateness under one bucket)."""
    from metarank_spark.engine import FeatureEngine
    from metarank_spark.plans.prefix import salted_anchored_period_counts

    rnd = random.Random(5)
    rows, seq = [], 0
    def emit(ent, n):
        nonlocal seq
        for _ in range(n):
            seq += 1
            ts = T0 + rnd.randrange(0, 40 * DAY)
            late = rnd.random() < 0.4
            vts = ts - rnd.randrange(0, 12 * 3_600_000) if late else ts
            rows.append((ent, ts, seq, 1, vts))
    emit("hot", 400)
    for u in range(10):
        emit(f"u{u}", 30)
    df = spark.createDataFrame(
        rows, "entity string, ts_ms long, seq long, __side int, vts long"
    )
    periods = (3, 7)
    bucket = F.floor(F.col("vts") / F.lit(DAY))
    order = ("ts_ms", "seq", "__side")

    direct = df.withColumn(
        "vec",
        FeatureEngine._anchored_period_counts(
            F.lit(True), F.lit(1), bucket, periods, "entity"
        ),
    )
    exp = {(r["entity"], r["seq"]): tuple(r["vec"]) for r in direct.collect()}
    got_df = salted_anchored_period_counts(
        df, "entity", order, DAY, periods, 7 * DAY, bucket
    )
    got = {(r["entity"], r["seq"]): tuple(r["vec"]) for r in got_df.collect()}
    assert got == exp
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_salted_sessionize_equals_plain(spark):
    """Gap-based session indices from the chunk-decomposed sessionize
    equal the single-window form, including chunk-boundary gaps, empty
    chunks, and same-ts ties."""
    from metarank_spark.plans.sessionize import salted_sessionize, sessionize

    df = _events(spark)  # hot key + 20 uniform users over 60 days
    plain = {
        (r["user_id"], r["event_id"]): r["session_idx"]
        for r in sessionize(df, seq="event_id").collect()
    }
    got = {
        (r["user_id"], r["event_id"]): r["session_idx"]
        for r in salted_sessionize(df, chunk_ms=3 * DAY).collect()
    }
    assert got == plain
    # boundary case: events exactly at a chunk edge with an in-gap link
    rows = [
        ("u", 3 * DAY - 1, 1), ("u", 3 * DAY, 2),        # same session, crosses chunks
        ("u", 3 * DAY + 40 * 60_000, 3),                 # new session inside chunk
        ("u", 9 * DAY, 4),                               # empty chunk in between
    ]
    small = spark.createDataFrame(rows, "user_id string, ts_ms long, event_id long")
    got2 = {
        r["event_id"]: r["session_idx"]
        for r in salted_sessionize(small, chunk_ms=3 * DAY).collect()
    }
    assert got2 == {1: 0, 2: 0, 3: 1, 4: 2}


# ---------- hypothesis: arbitrary frames, salted == plain ----------

from hypothesis import given, settings, strategies as st


@st.composite
def _frames(draw):
    """Small adversarial frames: negative timestamps, tie storms, sparse
    values, chunk sizes from degenerate (1ms) to one-chunk-total."""
    n = draw(st.integers(1, 60))
    ents = draw(st.lists(st.sampled_from(["a", "b", "hot"]), min_size=n, max_size=n))
    rows = []
    for i, e in enumerate(ents):
        ts = draw(st.integers(-3 * DAY, 3 * DAY))
        val = draw(st.one_of(st.none(), st.floats(-5, 5, allow_nan=False)))
        rows.append((e, ts, i, draw(st.integers(0, 1)), val))
    chunk = draw(st.sampled_from([1, 3_600_000, DAY, 7 * DAY]))
    return rows, chunk


@settings(max_examples=12, deadline=None)
@given(_frames())
def test_salted_carry_hypothesis(spark, fc):
    from metarank_spark.plans.prefix import salted_strict_last_carry

    rows, chunk = fc
    df = spark.createDataFrame(
        rows, "entity string, ts_ms long, seq long, __side int, v double"
    )
    order = ("ts_ms", "seq", "__side")
    w = (
        Window.partitionBy("entity")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    exp = {
        (r["entity"], r["seq"]): r["c"]
        for r in df.select(
            "entity", "seq", F.last("v", ignorenulls=True).over(w).alias("c")
        ).collect()
    }
    got = {
        (r["entity"], r["seq"]): r["__carr_v"]
        for r in salted_strict_last_carry(
            df, ["v"], "entity", order, chunk
        ).collect()
    }
    assert got == exp


@settings(max_examples=10, deadline=None)
@given(_frames())
def test_salted_count_and_max_hypothesis(spark, fc):
    from metarank_spark.plans.prefix import salted_running_count, salted_running_max

    rows, chunk = fc
    df = spark.createDataFrame(
        rows, "entity string, ts_ms long, seq long, __side int, v double"
    )
    order = ("ts_ms", "seq", "__side")
    w = (
        Window.partitionBy("entity")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = {
        (r["entity"], r["seq"]): (r["cnt"], r["mx"])
        for r in df.select(
            "entity", "seq",
            F.count(F.lit(1)).over(w).alias("cnt"),
            F.max("ts_ms").over(w).alias("mx"),
        ).collect()
    }
    c = salted_running_count(df, "entity", order, chunk)
    m = salted_running_max(c, "ts_ms", "entity", order, chunk, out="mx")
    got = {
        (r["entity"], r["seq"]): (r["cnt"], r["mx"]) for r in m.collect()
    }
    assert got == exp


def test_salted_asof_join_equals_plain(spark):
    """asof_join(salt_chunk_ms=...) — both strictness modes, with and
    without a declared hot set — equals the plain union-merge carry."""
    from metarank_spark.plans.asof import asof_join

    rnd = random.Random(77)
    state, queries = [], []
    for i in range(400):
        e = "hot" if rnd.random() < 0.6 else f"u{rnd.randrange(8)}"
        state.append((e, T0 + rnd.randrange(0, 30 * DAY), i, float(i)))
    for i in range(300):
        e = "hot" if rnd.random() < 0.6 else f"u{rnd.randrange(8)}"
        queries.append((e, T0 + rnd.randrange(0, 30 * DAY), i))
    right = spark.createDataFrame(state, "k string, ts_ms long, seq long, val double")
    left = spark.createDataFrame(queries, "k string, ts_ms long, qseq long")

    for strict in (True, False):
        base = {
            (r["k"], r["qseq"]): r["val_asof"]
            for r in asof_join(
                left, right, "k", values=["val"],
                left_seq="qseq", right_seq="seq", strict=strict,
            ).collect()
        }
        for hot in (None, ["hot"]):
            got = {
                (r["k"], r["qseq"]): r["val_asof"]
                for r in asof_join(
                    left, right, "k", values=["val"],
                    left_seq="qseq", right_seq="seq", strict=strict,
                    salt_chunk_ms=3 * DAY, hot_entities=hot,
                ).collect()
            }
            assert got == base, (strict, hot)
