"""Train/test split strategies (main/command/train/SplitStrategy.scala:
22-95): random | time | hold_last | field. All deterministic — `random`
uses a hash of the ranking id, not an RNG, so reruns and resumes produce
the same split on any cluster size."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def split_random(df: DataFrame, ratio: float = 0.8, key: str = "ranking_id") -> DataFrame:
    """RandomSplit (:28-40), made deterministic via key hash."""
    bucket = F.pmod(F.xxhash64(key), F.lit(1000))
    return df.withColumn(
        "split", F.when(bucket < int(ratio * 1000), "train").otherwise("test")
    )


def split_time(df: DataFrame, ratio: float = 0.8, ts: str = "ts_ms",
               exact: bool = True) -> DataFrame:
    """TimeSplit (:42-60): sort by ts, first ratio → train. The cutoff is
    the ratio-quantile of ts (single tiny agg, broadcast back). ``exact``
    uses the exact interpolated percentile (deterministic, matches the
    DuckDB oracle); pass False for percentile_approx on huge inputs."""
    q = F.percentile(ts, F.lit(ratio)) if exact else F.percentile_approx(ts, ratio, 10_000)
    cutoff = df.agg(q.alias("cut"))
    return df.join(F.broadcast(cutoff)).withColumn(
        "split", F.when(F.col(ts) <= F.col("cut"), "train").otherwise("test")
    ).drop("cut")


def split_hold_last(df: DataFrame, user: str = "user_id", ts: str = "ts_ms",
                    seq: str = "seq") -> DataFrame:
    """HoldLastSplit (:62-80): each user's latest row is test."""
    w = Window.partitionBy(user).orderBy(F.col(ts).desc(), F.col(seq).desc())
    return df.withColumn(
        "split",
        F.when(F.row_number().over(w) == 1, "test").otherwise("train"),
    )


def split_hold_last_ranking(
    df: DataFrame, user: str = "user_id", ts: str = "ts_ms",
    seq: str = "seq", group: str = "ranking_id",
) -> DataFrame:
    """HoldLastSplit at RANKING granularity — the reference's actual
    HoldLastStrategy semantics (:62-80 holds whole clickthroughs per
    user): ALL rows of each user's latest ranking go to test together,
    so no qid group is ever split across train and test (split qid
    groups = label leakage + invalid LTR eval groups). Use this on the
    per-(ranking, position, item) training matrix; ``split_hold_last``
    is the row-granularity variant for flat event streams.

    The latest ranking is max (ts, seq, group) — group as tiebreaker
    makes ties deterministic. One unordered window over the user key
    (single shuffle, no join; high-cardinality key, no skew)."""
    w = Window.partitionBy(user)
    last = F.max(F.struct(F.col(ts), F.col(seq), F.col(group))).over(w)
    return df.withColumn(
        "split",
        F.when(F.col(group) == last.getField(group), "test")
        .otherwise("train"),
    )


def split_field(df: DataFrame, column: Column, value) -> DataFrame:
    """FieldSplit (:82-95): rows whose field matches → test."""
    return df.withColumn(
        "split", F.when(column == value, "test").otherwise("train")
    )
