"""Training-matrix export (main/command/Export.scala:28-77): LibSVM lines
for XGBoost, CSV for LightGBM. The LibSVM text is assembled with column
expressions (concat/transform) so the writer stays a plain text sink —
no Python in the row path."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _feature_vector(df: DataFrame, feature_cols: list[str]):
    """Flatten scalar + vector feature columns into one array<double> by
    fixed offsets (flow/ClickthroughQuery.scala:9-74 dense assembly)."""
    parts = []
    for c in feature_cols:
        dt = df.schema[c].dataType.simpleString()
        if dt.startswith("array"):
            parts.append(F.transform(F.col(c), lambda x: x.cast("double")))
        else:
            parts.append(F.array(F.col(c).cast("double")))
    return F.concat(*parts)


def to_libsvm(
    df: DataFrame,
    feature_cols: list[str],
    label: str = "label",
    group: str = "ranking_id",
) -> DataFrame:
    """One LibSVM text line per row: `<label> qid:<group> i:v ...`
    (NaN features are emitted as 0-skipped, matching sparse format)."""
    vec = _feature_vector(df, feature_cols)
    qid = F.abs(F.xxhash64(group) % F.lit(2**31))
    pairs = F.array_join(
        F.filter(
            F.transform(
                vec,
                lambda v, i: F.when(
                    ~F.isnan(v) & (v != 0.0),
                    F.concat((i + 1).cast("string"), F.lit(":"), v.cast("string")),
                ),
            ),
            lambda s: s.isNotNull(),
        ),
        " ",
    )
    line = F.concat_ws(" ", F.col(label).cast("string"),
                       F.concat(F.lit("qid:"), qid.cast("string")), pairs)
    return df.select(F.col(group), line.alias("value"))


def write_libsvm(df: DataFrame, feature_cols: list[str], path: str, **kw) -> None:
    # group rows of one qid into the same file partition (ranker contract)
    out = to_libsvm(df, feature_cols, **kw)
    out.repartition("ranking_id").select("value").write.mode("overwrite").text(path)


def feature_width(features) -> int:
    """Dense-vector width from the engine feature configs — the static
    equivalent of ClickthroughQuery's dataset offsets, so exporters never
    need a data probe."""
    from metarank_spark.engine import Rate, StringEncode, Vector, WindowCount

    width = 0
    for cfg in features:
        if isinstance(cfg, (WindowCount, Rate)):
            width += len(cfg.periods)
        elif isinstance(cfg, StringEncode):
            width += len(cfg.values) if cfg.encode == "onehot" else 1
        elif isinstance(cfg, Vector):
            width += len(cfg.reducers)
        else:
            width += 1
    return width


def to_csv_matrix(
    df: DataFrame,
    feature_cols: list[str],
    label: str = "label",
    width: int | None = None,
) -> DataFrame:
    """Wide CSV-ready frame: label + one column per feature slot. Pass
    ``width`` (feature_width(engine.features)) to keep the plan fully
    static; without it a one-row probe runs (tiny job, fixture use)."""
    vec = _feature_vector(df, feature_cols)
    out = df.select(F.col(label), vec.alias("__v"))
    if width is None:
        dim = out.select(F.size("__v").alias("d")).limit(1).collect()
        width = dim[0]["d"] if dim else 0
    cols = [F.get(F.col("__v"), i).alias(f"f{i}") for i in range(width)]
    return out.select(label, *cols)


def write_csv(df: DataFrame, feature_cols: list[str], path: str, **kw) -> None:
    to_csv_matrix(df, feature_cols, **kw).write.mode("overwrite").option(
        "header", True
    ).csv(path)
