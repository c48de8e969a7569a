"""Resume-from-checkpoint: a killed backfill continues without recomputing
completed entity ranges, and the resumed output equals a single-shot run."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from metarank_spark.checkpoint import backfill, load_manifests
from metarank_spark.engine import FeatureEngine, InteractionCount
from metarank_spark.events import events_df, interaction_event, ranking_event

T0 = 1_700_000_000_000


def _events(spark):
    rows, seq = [], 0
    for u in range(16):
        for r in range(3):
            seq += 1
            rid = f"r{u}_{r}"
            ts = T0 + u * 60_000 + r * 5_000
            rows.append(
                ranking_event(rid, ["p1", "p2"], ts, seq, user=f"u{u}", session=f"s{u}")
            )
            seq += 1
            rows.append(
                interaction_event("p1", "click", ts + 1000, seq, user=f"u{u}",
                                  session=f"s{u}", ranking=rid)
            )
    return events_df(spark, rows)


def _collect_output(spark, path):
    df = spark.read.parquet(*[
        os.path.join(path, d) for d in os.listdir(path) if d.startswith("entity_range=")
    ])
    return sorted(
        (r["ranking_id"], r["item_id"], r["clicks"], r["label"]) for r in df.collect()
    )


def test_backfill_resume(spark, tmp_path):
    ev = _events(spark)
    eng = FeatureEngine([InteractionCount("clicks", "click")])

    single = str(tmp_path / "single")
    backfill(ev, eng, single, n_ranges=4)
    expected = _collect_output(spark, single)
    assert len(expected) == 16 * 3 * 2

    # killed run: completes 2 of 4 ranges then dies
    out = str(tmp_path / "resumable")
    with pytest.raises(RuntimeError, match="simulated driver kill"):
        backfill(ev, eng, out, n_ranges=4, fail_after=2)
    first = load_manifests(out)
    assert len(first) == 2

    # resume: only the remaining ranges run
    completed = backfill(ev, eng, out, n_ranges=4)
    assert sorted(m["range_id"] for m in completed) == sorted(
        set(range(4)) - set(first)
    )
    assert _collect_output(spark, out) == expected
    # manifests carry lineage + metrics
    all_m = load_manifests(out)
    assert len(all_m) == 4
    assert all("input_fingerprint" in m and m["rows_per_sec"] is not None for m in all_m.values())


def test_backfill_deleted_range_recomputes(spark, tmp_path):
    """A manifest is a receipt for the published files, not a substitute:
    if a range's data directory disappears (cleanup, partial sync), resume
    must recompute that range instead of trusting the stale manifest."""
    import shutil

    ev = _events(spark)
    eng = FeatureEngine([InteractionCount("clicks", "click")])
    out = str(tmp_path / "dropped")
    backfill(ev, eng, out, n_ranges=4)
    expected = _collect_output(spark, out)

    victim = load_manifests(out)[1]["output"]
    shutil.rmtree(victim)
    assert 1 not in load_manifests(out)  # receipt no longer counts

    completed = backfill(ev, eng, out, n_ranges=4)
    assert [m["range_id"] for m in completed] == [1]  # only the gap reruns
    assert _collect_output(spark, out) == expected


def test_backfill_materialized_input_same_result(spark, tmp_path):
    ev = _events(spark)
    eng = FeatureEngine([InteractionCount("clicks", "click")])
    a, b = str(tmp_path / "plain"), str(tmp_path / "staged")
    backfill(ev, eng, a, n_ranges=2)
    backfill(ev, eng, b, n_ranges=2, materialize_input=True)
    assert _collect_output(spark, a) == _collect_output(spark, b)
    assert os.path.isdir(os.path.join(b, "_input"))
    # resume with staged input reuses the stage (manifest -1 present)
    from metarank_spark.checkpoint import load_manifests
    assert -1 in load_manifests(b)


def test_backfill_input_change_invalidates(spark, tmp_path):
    ev = _events(spark)
    eng = FeatureEngine([InteractionCount("clicks", "click")])
    out = str(tmp_path / "inv")
    backfill(ev, eng, out, n_ranges=2)
    # different input → all ranges recompute
    ev2 = ev.filter(F.col("seq") <= 60)
    completed = backfill(ev2, eng, out, n_ranges=2)
    assert len(completed) == 2


def test_backfill_two_phase_same_result(spark, tmp_path):
    """materialize_series (phase A fold + per-range assembly) must be
    bit-identical to the one-phase run, and a rerun must reuse the stored
    series (its manifest matches the fingerprint)."""
    ev = _events(spark)
    from metarank_spark.engine import Rate, WindowCount

    eng = FeatureEngine([
        InteractionCount("clicks", "click"),
        WindowCount("cnt7", "click", (7,)),
        Rate("ctr", "click", "impression", (7,)),
    ])

    single = str(tmp_path / "one_phase")
    backfill(ev, eng, single, n_ranges=4)

    two = str(tmp_path / "two_phase")
    backfill(ev, eng, two, n_ranges=4, materialize_series=True)

    def canon(v):
        import math

        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        return v

    def collect(path):
        df = spark.read.parquet(*[
            os.path.join(path, d) for d in os.listdir(path)
            if d.startswith("entity_range=")
        ])
        return sorted(
            (r["ranking_id"], r["item_id"], r["clicks"],
             tuple(map(canon, r["cnt7"])), tuple(map(canon, r["ctr"])), r["label"])
            for r in df.collect()
        )

    assert collect(single) == collect(two)
    series_manifests = {
        k: m for k, m in load_manifests(two).items() if isinstance(k, str)
    }
    assert series_manifests, "series phase must write resume manifests"
    walls = {k: m["wall_sec"] for k, m in series_manifests.items()}
    # rerun: everything (ranges AND series) is up to date — no work
    again = backfill(ev, eng, two, n_ranges=4, materialize_series=True)
    assert again == []
    assert {
        k: m["wall_sec"]
        for k, m in load_manifests(two).items()
        if isinstance(k, str)
    } == walls  # series was not re-folded


def test_backfill_rejects_remote_output(spark):
    from metarank_spark.checkpoint import require_local_output

    ev = _events(spark)
    eng = FeatureEngine([InteractionCount("clicks", "click")])
    with pytest.raises(ValueError, match="driver-local"):
        backfill(ev, eng, "s3://bucket/features", n_ranges=2)
    require_local_output("/tmp/x")       # local ok
    require_local_output("file:///tmp/x")  # explicit file scheme ok
