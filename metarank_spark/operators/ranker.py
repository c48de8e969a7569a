"""Batch scoring / rerank — the offline analog of Ranker.rerank
(ml/Ranker.scala:27-110): assemble the feature vector, apply a model,
sort each ranking by descending score.

The model here is a linear scorer (weights per feature slot) — the
LambdaMART booster itself is out of engine scope (the parity boundary is
the feature matrix, SURVEY.md §3.2); on a real cluster you'd broadcast an
xgboost booster into a pandas UDF at exactly this point. Everything else
(vector assembly, per-ranking sort, rank emission) is the production
shape."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metarank_spark.operators.export import _feature_vector


def score_linear(df: DataFrame, feature_cols: list[str], weights: list[float]) -> DataFrame:
    """score = Σ w_i * f_i over the flattened feature vector; NaN features
    contribute 0 (missing = no evidence)."""
    vec = _feature_vector(df, feature_cols)
    w = F.array(*[F.lit(float(x)) for x in weights])
    score = F.aggregate(
        F.zip_with(vec, w, lambda v, wi: F.when(F.isnan(v), 0.0).otherwise(v) * wi),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.withColumn("score", score)


def rerank(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    ranking_col: str = "ranking_id",
) -> DataFrame:
    """Per-ranking order by descending score (ties: original position),
    emitting `new_position` (Ranker.scala:52-68 sort by -score).

    For live-serving parity, build ``df`` with
    ``engine.ranking_values(events, mode="inference")`` — the reference
    scores rerank requests in ValueMode.OnlineInference, where a
    configured `position` feature reads as its constant for every
    candidate instead of the training-time item index."""
    scored = score_linear(df, feature_cols, weights)
    w = Window.partitionBy(ranking_col).orderBy(F.col("score").desc(), F.col("position"))
    return scored.withColumn("new_position", F.row_number().over(w) - 1)
