"""Table IO — Iceberg when the runtime is present, partitioned parquet
otherwise. Same API either way so jobs don't care.

The reference reads JSON/JSONL event files with gzip/zstd handling and
recursive listing (source/FileEventSource.scala:22-107); Spark's readers
do all of that natively, so `read_events_files` is a thin wrapper that
normalizes to the canonical schema.

At cluster scale the event table should be written bucketed by the entity
hash and sorted by (entity, ts_ms, seq) so the merge scan's exchange can
be elided; `write_events_table` applies that layout (Iceberg:
`write.distribution-mode` + sort order; parquet fallback: repartition +
sortWithinPartitions + bucket directory column)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metarank_spark.events import EVENT_SCHEMA


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[attr-defined]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_events_files(spark: SparkSession, path: str, fmt: str = "json") -> DataFrame:
    """JSON/JSONL (optionally .gz — handled natively) or parquet event
    files → canonical schema (missing columns null-filled)."""
    if fmt == "json":
        df = spark.read.schema(EVENT_SCHEMA).option("recursiveFileLookup", True).json(path)
    else:
        df = spark.read.option("recursiveFileLookup", True).parquet(path)
    missing = [f.name for f in EVENT_SCHEMA.fields if f.name not in df.columns]
    for name in missing:
        df = df.withColumn(name, F.lit(None).cast(EVENT_SCHEMA[name].dataType))
    return df.select([f.name for f in EVENT_SCHEMA.fields])


def write_events_table(
    events: DataFrame,
    target: str,
    entity: str = "user_id",
    buckets: int = 64,
    table_name: str | None = None,
) -> None:
    """Publish the event table in merge-scan-friendly layout.

    With a ``table_name``: Iceberg when the runtime is present, else a
    catalog-managed bucketed+sorted table (``bucketBy(entity)`` +
    ``sortBy(entity, ts_ms, seq)``). Reading that table back and running
    the write-series fold produces a plan with ZERO exchanges — the scan
    reports hash partitioning on the bucket column, so every per-entity
    window runs straight off the files (CI-pinned by
    tests/test_bucketed_layout.py). At 10^12 rows that is the single
    largest data movement in the pipeline, gone. Without a table name:
    plain parquet partitioned by entity-hash directory (layout only — a
    directory partition does NOT carry partitioning info into the plan)."""
    spark = events.sparkSession
    if table_name and iceberg_available(spark):
        (
            events.writeTo(table_name)
            .using("iceberg")
            .tableProperty("write.distribution-mode", "hash")
            .createOrReplace()
        )
        return
    if table_name:
        (
            events.write.mode("overwrite")
            .bucketBy(buckets, entity)
            .sortBy(entity, "ts_ms", "seq")
            .saveAsTable(table_name)
        )
        return
    bucket = F.pmod(F.xxhash64(entity), F.lit(buckets)).alias("entity_bucket")
    (
        events.withColumn("entity_bucket", bucket)
        .repartition(buckets, "entity_bucket")
        .sortWithinPartitions(entity, "ts_ms", "seq")
        .write.mode("overwrite")
        .partitionBy("entity_bucket")
        .parquet(target)
    )


def read_events_table(spark: SparkSession, target: str, table_name: str | None = None) -> DataFrame:
    if table_name:
        return spark.read.table(table_name)
    return spark.read.parquet(target).drop("entity_bucket")
