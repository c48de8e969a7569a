"""Checkpointed, lineage-tracked backfill — job-level resume for the
feature engine.

Spark gives task-level retry; it does not give *job-level* resume after a
driver kill. This module adds it the way large backfills do in practice:

- the entity keyspace is split into ``n_ranges`` hash ranges
  (``pmod(xxhash64(entity), n)``) — deterministic, data-independent, so a
  resumed run computes identical ranges;
- each range runs as its own Spark job writing
  ``<output>/entity_range=K/`` and, on success, an atomic per-range
  manifest JSON under ``<output>/_manifests/`` recording lineage: range
  id, input fingerprint, row count, output rows/sec, wall seconds;
- on restart, ranges whose manifest matches the current input fingerprint
  are skipped — a killed run resumes without recomputing completed ranges
  (the north-rule contract).

The input fingerprint is cheap but discriminating: (#events, min/max seq,
sum of a 64-bit column hash sample). Within a range the full cluster
parallelism applies; the range loop only bounds the blast radius of a
failure (and the recompute cost on resume).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifests"


def entity_range(entity_col, n_ranges: int):
    return F.pmod(F.xxhash64(entity_col), F.lit(n_ranges))


def input_fingerprint(events: DataFrame) -> str:
    row = events.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("seq").alias("lo"),
        F.max("seq").alias("hi"),
        F.sum(F.xxhash64("event_id") % 1_000_003).alias("h"),
    ).collect()[0]
    return f"n={row['n']};lo={row['lo']};hi={row['hi']};h={row['h']}"


def require_local_output(output: str) -> None:
    """Manifests are read/written with driver-local file APIs while range
    outputs go through Spark writers — on s3://, hdfs://, dbfs:/ etc. the
    manifest phase would silently write to an unrelated driver-local dir
    and defeat resume. Fail fast instead; routing manifest IO through the
    Hadoop FileSystem API is the object-store upgrade path."""
    import re

    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*):(//)?", output)
    if m and m.group(1) != "file":
        raise ValueError(
            f"backfill output {output!r} uses scheme {m.group(1)!r}: the "
            "job-level resume manifests only support driver-local/NFS "
            "paths (see require_local_output)"
        )


def _manifest_path(output: str, rid) -> str:
    tag = f"{rid:05d}" if isinstance(rid, int) else str(rid).replace(":", "-")
    return os.path.join(output, MANIFEST_DIR, f"range-{tag}.json")


def load_manifests(output: str) -> dict[int, dict]:
    """A manifest only counts if its published output still exists: a
    lineage record whose data directory was deleted (cleanup, partial
    sync, operator error) must NOT mask a recompute — the manifest is a
    receipt for the files, not a substitute for them."""
    d = os.path.join(output, MANIFEST_DIR)
    if not os.path.isdir(d):
        return {}
    out = {}
    for f in os.listdir(d):
        if f.startswith("range-") and f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                m = json.load(fh)
            target = m.get("output")
            if target and not os.path.exists(target):
                continue  # data gone → treat as never completed
            out[m["range_id"]] = m
    return out


def write_manifest(output: str, manifest: dict) -> None:
    d = os.path.join(output, MANIFEST_DIR)
    os.makedirs(d, exist_ok=True)
    path = _manifest_path(output, manifest["range_id"])
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, path)  # atomic publish


def backfill(
    events: DataFrame,
    engine,
    output: str,
    n_ranges: int = 8,
    entity: str = "user_id",
    fail_after: int | None = None,
    materialize_input: bool = False,
    materialize_series: bool = False,
) -> list[dict]:
    """Run the engine's training snapshot per entity range with
    resume-from-manifest. Returns the manifests of THIS run's completed
    ranges. ``fail_after`` (tests only) kills the driver loop after K
    ranges to exercise resume.

    Rankings are routed to ranges by the ranking's entity; all events are
    visible to every range (feature state can be keyed by item/session/
    global while the output is partitioned by the ranking's user) — ranges
    partition the OUTPUT, not the state, so resume never truncates state
    history.

    ``materialize_series``: two-phase mode — the write-value series of
    every merged scope group is folded ONCE per input fingerprint and
    written under ``<output>/_series/`` (with its own resume manifest);
    each range then runs assembly-only against the stored series instead
    of re-folding all state n_ranges times.
    """
    from metarank_spark.operators.clickthrough import training_matrix

    require_local_output(output)
    fp = input_fingerprint(events)
    done = {
        rid: m for rid, m in load_manifests(output).items() if m["input_fingerprint"] == fp
    }
    if materialize_input:
        # stage the (possibly computed/synthetic) event stream once as a
        # bucketed+sorted table so per-range passes scan columnar input
        # instead of re-deriving it; resume-safe via a phase manifest
        from metarank_spark.sources.tables import write_events_table

        staged = os.path.join(output, "_input")
        stage_m = load_manifests(output).get(-1)
        if not (stage_m and stage_m["input_fingerprint"] == fp):
            t0 = time.perf_counter()
            write_events_table(events, staged, entity=entity)
            write_manifest(output, {
                "range_id": -1, "input_fingerprint": fp, "rows": None,
                "output": staged, "wall_sec": round(time.perf_counter() - t0, 3),
                "rows_per_sec": None, "entity": entity, "n_ranges": n_ranges,
            })
        events = events.sparkSession.read.parquet(staged).drop("entity_bucket")
        done.pop(-1, None)
    series = None
    if materialize_series:
        from metarank_spark.operators.clickthrough import inject_impressions

        # phase A: fold every merged group's write-value series once over
        # the SAME injected stream the per-range assembly will query
        stream = inject_impressions(events)
        manifests = load_manifests(output)
        series = {}
        for key, sdf in engine.write_series(stream).items():
            safe = key.replace("::", "__")
            rid = f"series:{safe}"
            spath = os.path.join(output, "_series", safe)
            m = manifests.get(rid)
            if not (m and m["input_fingerprint"] == fp):
                t0 = time.perf_counter()
                sdf.write.mode("overwrite").parquet(spath)
                write_manifest(output, {
                    "range_id": rid, "input_fingerprint": fp, "rows": None,
                    "output": spath, "wall_sec": round(time.perf_counter() - t0, 3),
                    "rows_per_sec": None, "entity": entity, "n_ranges": n_ranges,
                })
            series[key] = events.sparkSession.read.parquet(spath)
    completed = []
    for rid in range(n_ranges):
        if rid in done:
            continue
        if fail_after is not None and len(completed) >= fail_after:
            raise RuntimeError(f"simulated driver kill after {fail_after} ranges")
        t0 = time.perf_counter()
        # range filter is pushed to snapshot assembly: write-series state
        # still folds ALL events, only in-range rankings are assembled
        part = training_matrix(
            events, engine,
            ranking_pred=entity_range(F.col(entity), n_ranges) == rid,
            series=series,
        )
        path = os.path.join(output, f"entity_range={rid}")
        part.write.mode("overwrite").parquet(path)
        # row count from the written files (metadata scan), not a DAG re-run
        n = events.sparkSession.read.parquet(path).count()
        dt = time.perf_counter() - t0
        manifest = {
            "range_id": rid,
            "input_fingerprint": fp,
            "rows": n,
            "output": path,
            "wall_sec": round(dt, 3),
            "rows_per_sec": round(n / dt, 1) if dt > 0 else None,
            "entity": entity,
            "n_ranges": n_ranges,
        }
        write_manifest(output, manifest)
        completed.append(manifest)
    return completed
