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


GENRES = ("drama", "comedy", "thriller", "action", "adventure", "romance",
          "crime", "science fiction", "fantasy", "family", "horror")
TAGS = ("time travel", "dystopia", "space", "heist", "noir", "war",
        "sports", "music", "courtroom")


def synthetic_movielens(
    spark: SparkSession,
    users: int,
    items: int = 2000,
    rankings_per_user: int = 2,
    clicks_per_ranking: int = 2,
    items_per_ranking: int = 12,
    days: int = 30,
) -> DataFrame:
    """``synthetic_ranklens`` with movielens-shaped item metadata — every
    field the reference's shipped RankLens config reads
    (src/test/resources/ranklens/config.yml): numeric popularity/vote_avg/
    vote_cnt/budget/release_date/runtime, multi-valued genres/tags/actors,
    title/director, plus singular ``genre``/``tag`` heads so the config's
    ``item.genre``/``item.tag`` field scopes bind. Same deterministic
    hash-driven construction (cluster-size invariant)."""
    base = synthetic_ranklens(
        spark, users, items, rankings_per_user, clicks_per_ranking,
        items_per_ranking, days)

    def pick(pool, col, salt):
        return F.element_at(
            F.array(*[F.lit(x) for x in pool]),
            (F.pmod(_h(col, F.lit(salt)), len(pool)) + 1).cast("int"))

    iid = F.col("item_id")
    genre = pick(GENRES, iid, 1)
    tag = pick(TAGS, iid, 2)
    str_fields = F.map_from_arrays(
        F.array(*[F.lit(k) for k in
                  ("title", "genres", "genre", "tags", "tag", "actors",
                   "director")]),
        F.array(
            F.array(F.concat_ws(" ", pick(TAGS, iid, 3), genre,
                                pick(GENRES, iid, 4))),
            F.array_distinct(F.array(genre, pick(GENRES, iid, 5))),
            F.array(genre),
            F.array_distinct(F.array(tag, pick(TAGS, iid, 6))),
            F.array(tag),
            F.array(F.concat(F.lit("actor_"), F.pmod(_h(iid, F.lit(7)), F.lit(200))),
                    F.concat(F.lit("actor_"), F.pmod(_h(iid, F.lit(8)), F.lit(200)))),
            F.array(F.concat(F.lit("dir_"), F.pmod(_h(iid, F.lit(9)), F.lit(50)))),
        ),
    )
    num_fields = F.map_from_arrays(
        F.array(*[F.lit(k) for k in
                  ("popularity", "vote_avg", "vote_cnt", "budget",
                   "release_date", "runtime")]),
        F.array(
            F.pmod(_h(iid, F.lit(10)), F.lit(1000)).cast("double"),
            (F.pmod(_h(iid, F.lit(11)), F.lit(90)) / 10.0 + 1.0),
            F.pmod(_h(iid, F.lit(12)), F.lit(10_000)).cast("double"),
            (F.pmod(_h(iid, F.lit(13)), F.lit(200)) * 1e6).cast("double"),
            (F.lit(1950) + F.pmod(_h(iid, F.lit(14)), F.lit(75))).cast("double"),
            (F.lit(60) + F.pmod(_h(iid, F.lit(15)), F.lit(120))).cast("double"),
        ),
    )
    return base.withColumn(
        "str_fields",
        F.when(F.col("event_type") == "item", str_fields)
        .otherwise(F.col("str_fields")),
    ).withColumn(
        "num_fields",
        F.when(F.col("event_type") == "item", num_fields)
        .otherwise(F.col("num_fields")),
    )
