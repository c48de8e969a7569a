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


def noop_rank(df: DataFrame, ranking_col: str = "ranking_id") -> DataFrame:
    """NoopRanker (ml/rank/NoopRanker.scala:23-28): every item scores
    0.0, so the reranked order is the request order."""
    w = Window.partitionBy(ranking_col).orderBy(F.col("position"))
    return df.withColumn("score", F.lit(0.0)).withColumn(
        "new_position", F.row_number().over(w) - 1)


def shuffle_rank(
    df: DataFrame,
    max_position_change: int,
    ranking_col: str = "ranking_id",
    seed: int = 0,
) -> DataFrame:
    """ShuffleRanker (ml/rank/ShuffleRanker.scala:24-37): score = request
    index + uniform noise in [-maxPositionChange, maxPositionChange), then
    sort by score. The reference draws ``Random.nextInt`` per item; here
    the draw is a per-(ranking, item) xxhash64 — same distribution, but a
    replay shuffles identically (the determinism rule every sampled path
    in this engine follows)."""
    span = 2 * max_position_change
    noise = (
        F.pmod(
            F.xxhash64(F.col(ranking_col), F.col("item_id"), F.lit(seed)),
            F.lit(span),
        )
        - F.lit(max_position_change)
    ).cast("double")
    scored = df.withColumn("score", F.col("position") + noise)
    # ascending: the reference's request index is the score base, so a
    # LOWER score means an earlier slot
    w = Window.partitionBy(ranking_col).orderBy(F.col("score"), F.col("position"))
    return scored.withColumn("new_position", F.row_number().over(w) - 1)


def kendall_krr(
    df: DataFrame,
    ranking_col: str = "ranking_id",
    orig_col: str = "position",
    new_col: str = "new_position",
    out: str = "krr",
) -> DataFrame:
    """Per-ranking Kendall rank correlation between the request order and
    the reranked order — the ``krr=`` response-quality metric the
    reference logs on every rerank (ml/Ranker.scala:71,
    util/KendallCorrelation.scala:8-15). Both orders are tie-free
    permutations, so tau-b reduces to 1 − 4·inversions/(n(n−1)).

    Inversions are counted inside one grouped aggregation with an O(n²)
    array expression — per-ranking bounded (n = ranking length), fully
    JVM-side, no second shuffle, no UDF. Rankings with n < 2 have an
    undefined tau and return null (commons-math yields NaN there)."""
    arr = F.transform(
        F.sort_array(F.collect_list(F.struct(orig_col, new_col))),
        lambda x: x[new_col],
    )
    per = df.groupBy(ranking_col).agg(arr.alias("__arr"))
    n = F.size(F.col("__arr"))
    inv = F.aggregate(
        F.transform(
            # greatest(…, 1): sequence(1, 0) would DESCEND for n=1 and
            # index element_at(arr, 0), which throws; n=1 taus are null
            # anyway, so clamp to a harmless [1]
            F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
            lambda i: F.size(
                F.filter(
                    F.slice(F.col("__arr"), i + 1, n),
                    lambda x: x < F.element_at(F.col("__arr"), i),
                )
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    tau = F.when(
        n >= 2,
        1.0 - 4.0 * inv.cast("double") / (n * (n - 1)).cast("double"),
    )
    return per.select(ranking_col, tau.alias(out))
