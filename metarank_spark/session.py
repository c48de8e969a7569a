"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for the 100 TB / multi-executor target even though tests
run on local[N]:

- AQE on (runtime coalesce + skew-join splitting),
- Arrow on (all pandas-UDF exchanges are columnar batches),
- UTC session timezone (all time math in this engine is pure epoch-millis
  arithmetic, mirroring the reference's ``Timestamp`` long-millis model,
  model/Timestamp.scala:11-27),
- shuffle partitions sized by caller (tests: cores; cluster: 2-3x cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "metarank-spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``parallelism`` sets local[N]; on a real cluster the master is taken
    from the environment / spark-submit and this arg is ignored.
    """
    cpus = parallelism or DEFAULT_CPUS
    # 4x cores: avoids task-wave quantization and per-key skew tails in the
    # window stages; AQE coalesces back down when partitions come out small
    shuffle = shuffle_partitions or max(cpus * 4, 16)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # InferFiltersFromGenerate synthesizes `size(e) > 0 AND
        # isnotnull(e)` below every explode. When e is a stored column
        # that prunes rows early; when e is a COMPUTED array (this
        # engine's tokenize/shingle/bigram folds feed every explode) the
        # synthesized filter re-evaluates the full fold per conjunct —
        # measured 2 extra per-character tokenize folds per row, pushed
        # below the fan-out repartition into a single pre-shuffle task.
        # Explode itself already skips null/empty arrays, so the rule is
        # purely an (anti-)optimization here. Scale-independent: the
        # cost is per evaluated row on any cluster size.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # parquet scans: keep splits big enough to amortize task overhead
        .config("spark.sql.files.maxPartitionBytes", "268435456")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
