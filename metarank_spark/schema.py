"""Canonical event schema + loaders for the driver testdata tables.

The engine's canonical event stream mirrors the reference's Event model
(model/Event.scala:14-62) flattened into one long table:

    entity_id   — the state-keying scope value (Key.scala:7-10); for the
                  driver's generic `events` table this is user_id
    ts_ms       — epoch millis long (model/Timestamp.scala:11-27); we keep
                  longs, never TimestampType, for bit-exact time math
    seq         — explicit total order for same-ts events (stream order;
                  the reference requires sorted input and preserves stream
                  order for ties — CheckOrderingPipe.scala:12-27)
    event_type  — discriminator (interaction type for interactions)
    value       — numeric payload

All loaders are plain parquet scans: column pruning + predicate pushdown
reach the file scan (verified via .explain in tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(
    spark: SparkSession, sf_dir: str, with_props: bool = False
) -> DataFrame:
    """Driver `events` table → canonical stream.

    event_id doubles as `seq`: the generator assigns ids in stream order,
    giving the explicit same-ts tie-break the reference gets from file
    order. ``with_props`` keeps the raw JSON props column (off by default
    so the parquet scan prunes it).
    """
    ev = load_table(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ in the parquet: convert with pure NTZ arithmetic
    # (timestampdiff has no timezone dependence) so ts_ms is identical under
    # any session timezone — it must match DuckDB's epoch_ms bit-for-bit.
    if ev.schema["ts"].dataType.typeName().startswith("timestamp_ntz"):
        ts_ms = F.floor(
            F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
            / F.lit(1000)
        ).cast("long")
    else:
        ts_ms = F.unix_millis(F.col("ts"))
    return ev.select(
        F.col("event_id").cast("long").alias("event_id"),
        ts_ms.alias("ts_ms"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type"),
        F.col("value").cast("double").alias("value"),
        *([F.col("props")] if with_props else []),
    )


def _fan_out_small_scan(df: DataFrame) -> DataFrame:
    """Downstream per-row HOF compute (tokenize/ngram/cosine) should run on
    every core even when the fixture parquet is one small file; at
    warehouse scale the scan is already wide and this is a no-op."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fan_out_small_scan(load_table(spark, sf_dir, "documents"))


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
