"""Deterministic, fully distributed synthetic event generator — the scale
analog of the reference's SyntheticRanklensDataset
(util/SyntheticRanklensDataset.scala:31-60: N users × items, rankings per
user, clicks per ranking, 30-day span).

No Python RNG, no driver-side loops: every pseudo-random choice is a pure
hash function of the row id (xxhash64), so the generator itself scales to
any size on any cluster and two runs (or two cluster sizes) produce
byte-identical data — required for the N vs 4N scaling benchmark to be a
fair comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metarank_spark.events import EVENT_SCHEMA, RANK_ITEM

T0 = 1_704_067_200_000  # 2024-01-01 UTC
DAY_MS = 86_400_000
COLORS = ("red", "green", "blue", "black", "white")


def _h(*cols) -> F.Column:
    return F.xxhash64(*cols)


def synthetic_ranklens(
    spark: SparkSession,
    users: int,
    items: int = 1000,
    rankings_per_user: int = 2,
    clicks_per_ranking: int = 2,
    items_per_ranking: int = 12,
    days: int = 30,
) -> DataFrame:
    """Events: item metadata upserts + rankings + FK'd clicks, in the
    canonical schema. Total ≈ items + users*rpu*(1 + cpr) rows."""
    # --- item metadata ---
    it = spark.range(items).select(
        F.concat(F.lit("p"), F.col("id")).alias("item_id"),
        F.lit(T0).alias("ts_ms"),
        F.col("id").alias("seq"),
        F.map_from_arrays(
            F.array(F.lit("color")),
            F.array(
                F.array(F.element_at(F.array(*[F.lit(c) for c in COLORS]),
                                     (F.pmod(_h("id"), len(COLORS)) + 1).cast("int")))
            ),
        ).alias("str_fields"),
    )
    item_events = it.select(
        F.concat(F.lit("ie"), F.col("seq")).alias("event_id"),
        F.lit("item").alias("event_type"),
        "ts_ms",
        "seq",
        "item_id",
        F.lit(None).cast("string").alias("user_id"),
        F.lit(None).cast("string").alias("session_id"),
        F.lit(None).cast("string").alias("ranking_id"),
        F.lit(None).cast("string").alias("interaction_type"),
        F.lit(None).cast(EVENT_SCHEMA["items"].dataType).alias("items"),
        "str_fields",
        F.lit(None).cast(EVENT_SCHEMA["num_fields"].dataType).alias("num_fields"),
        F.lit(None).cast(EVENT_SCHEMA["numlist_fields"].dataType).alias("numlist_fields"),
    )

    # --- rankings: one row per (user, ranking idx) ---
    n_rank = users * rankings_per_user
    rk = spark.range(n_rank).select(
        F.col("id"),
        F.floor(F.col("id") / rankings_per_user).alias("u"),
        F.concat(F.lit("r"), F.col("id")).alias("ranking_id"),
        (
            F.lit(T0 + DAY_MS)
            + F.pmod(_h("id", F.lit(1)), F.lit(days * DAY_MS))
        ).alias("ts_ms"),
    )
    rk = rk.withColumn(
        "items",
        F.transform(
            F.sequence(F.lit(0), F.lit(items_per_ranking - 1)),
            lambda i: F.struct(
                F.concat(F.lit("p"), F.pmod(_h("id", i), F.lit(items))).alias("id"),
                F.lit(1.0).alias("relevancy"),
                *[
                    F.lit(None).cast(RANK_ITEM[f].dataType).alias(f)
                    for f in ("label", "str_fields", "num_fields")
                ],
            ),
        ),
    )
    ranking_events = rk.select(
        F.col("ranking_id").alias("event_id"),
        F.lit("ranking").alias("event_type"),
        "ts_ms",
        (F.lit(items) + F.col("id") * (1 + clicks_per_ranking)).alias("seq"),
        F.lit(None).cast("string").alias("item_id"),
        F.concat(F.lit("u"), F.col("u")).alias("user_id"),
        F.concat(F.lit("s"), F.col("u")).alias("session_id"),
        F.lit(None).cast("string").alias("ranking_id"),
        F.lit(None).cast("string").alias("interaction_type"),
        "items",
        F.lit(None).cast(EVENT_SCHEMA["str_fields"].dataType).alias("str_fields"),
        F.lit(None).cast(EVENT_SCHEMA["num_fields"].dataType).alias("num_fields"),
        F.lit(None).cast(EVENT_SCHEMA["numlist_fields"].dataType).alias("numlist_fields"),
    )

    # --- clicks: cpr per ranking on pseudo-random shown positions ---
    ck = rk.select(
        "id", "ranking_id", "u", "items",
        F.col("ts_ms").alias("r_ts"),
        F.explode(F.sequence(F.lit(1), F.lit(clicks_per_ranking))).alias("c"),
    )
    pos = F.pmod(_h("id", "c"), F.lit(12))
    click_events = ck.select(
        F.concat(F.lit("c"), F.col("id"), F.lit("_"), F.col("c")).alias("event_id"),
        F.lit("interaction").alias("event_type"),
        (F.col("r_ts") + F.col("c") * 30_000).alias("ts_ms"),
        (F.lit(items) + F.col("id") * (1 + clicks_per_ranking) + F.col("c")).alias("seq"),
        F.get(F.col("items"), pos.cast("int"))["id"].alias("item_id"),
        F.concat(F.lit("u"), F.col("u")).alias("user_id"),
        F.concat(F.lit("s"), F.col("u")).alias("session_id"),
        F.col("ranking_id"),
        F.lit("click").alias("interaction_type"),
        F.lit(None).cast(EVENT_SCHEMA["items"].dataType).alias("items"),
        F.lit(None).cast(EVENT_SCHEMA["str_fields"].dataType).alias("str_fields"),
        F.lit(None).cast(EVENT_SCHEMA["num_fields"].dataType).alias("num_fields"),
        F.lit(None).cast(EVENT_SCHEMA["numlist_fields"].dataType).alias("numlist_fields"),
    )

    return item_events.unionByName(ranking_events).unionByName(click_events)
