"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the correctness baseline. Per-row JVM array
  math (zip_with/aggregate), one broadcast of the query vector, and a
  distributed top-k (sort+limit → TakeOrderedAndProject: per-partition
  heap + driver merge of k·P rows). Linear scan — fine up to ~10^8 rows
  per executor-hour, and the baseline every ANN variant is verified
  against.
- LSH (random hyperplane) bucketing: the scale path. Deterministic
  pseudo-random hyperplanes (hash-formula, no RNG state), signature =
  sign-bit string; candidates share the query's bucket, exact cosine only
  within the bucket. At 100 TB the bucket join is a broadcast of the
  query signature + a partition-pruned scan when the table is written
  bucketed/partitioned by signature.

Scores are rounded to 6dp before ranking so Spark and DuckDB (different
summation trees over float32 inputs) rank identically; ties break on id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LSH_PLANES = 8
LSH_MOD = 1_000_003


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / F.nullif(norm_expr(a) * norm_expr(b), F.lit(0.0))


def rank_topk(scored: DataFrame, k: int, id_col: str = "vec_id") -> DataFrame:
    """Attach rank 1..k to an (id, score) frame with NO global window.

    ``scored.orderBy(desc(score), id).limit(k)`` compiles to
    TakeOrderedAndProject — per-partition top-k, driver merges k·P rows —
    so no stage ever sees more than k rows per partition regardless of
    input size. Rank is then derived from the ≤k survivors by packing them
    into one sorted array and posexploding (rank = position + 1), which
    avoids the `WindowExec: No Partition Defined` single-partition stage a
    rank() window would introduce. Ties break on ascending id."""
    topk = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    packed = topk.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("score")).alias("ns"),
                    F.col(id_col).alias("i"),
                    F.col("score").alias("s"),
                )
            )
        ).alias("arr")
    )
    ex = packed.select(F.posexplode("arr").alias("pos", "r"))
    return ex.select(
        F.col("r.i").alias(id_col),
        F.col("r.s").alias("score"),
        (F.col("pos") + 1).cast("long").alias("rank"),
    )


def cosine_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 5,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force top-k by cosine vs a single-row query DataFrame
    (column ``q``). Returns (vec_id, score, rank). Distributed top-k:
    scoring is per-row JVM math, selection is TakeOrderedAndProject
    (see rank_topk) — no global-window single-partition stage."""
    joined = df.join(F.broadcast(query))
    score = F.round(cosine_expr(F.col(vec), F.col("q")), 6)
    return rank_topk(joined.select(F.col(id_col), score.alias("score")), k, id_col)


def hyperplane_expr(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane j: component i =
    ((j*2654435761 + i*40503) mod P)/P - 0.5 — same closed form in SQL."""
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    return F.transform(
        idx,
        lambda i: ((F.lit(plane) * 2654435761 + i.cast("long") * 40503) % LSH_MOD)
        / F.lit(float(LSH_MOD))
        - 0.5,
    )


def lsh_signature(vec: Column, dim: int) -> Column:
    """Sign-bit signature over LSH_PLANES hyperplanes, as a long."""
    bits = []
    for j in range(LSH_PLANES):
        d = dot_expr(vec, hyperplane_expr(j, dim))
        bits.append((d > 0).cast("long") * (2**j))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out
