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

from pyspark.sql import Column, DataFrame, Window
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


def _hyperplane_values(plane: int, dim: int) -> list[float]:
    """Component i of deterministic pseudo-random hyperplane ``plane``:
    ((j*2654435761 + i*40503) mod P)/P - 0.5. Evaluated driver-side —
    Python's exact integers + one IEEE double division produce the very
    doubles the closed-form SQL expression yields, so both spellings are
    bit-identical."""
    return [
        ((plane * 2654435761 + i * 40503) % LSH_MOD) / float(LSH_MOD) - 0.5
        for i in range(dim)
    ]


def hyperplane_expr(plane: int, dim: int) -> Column:
    """Hyperplane ``plane`` as a constant array literal (r6): the former
    ``transform(sequence(...))`` spelling is a higher-order function,
    which Catalyst cannot constant-fold — every ROW re-generated every
    plane's 64 components. A literal array folds once at plan time."""
    return F.array(*[F.lit(v) for v in _hyperplane_values(plane, dim)])


def lsh_signature(vec: Column, dim: int) -> Column:
    """Sign-bit signature over LSH_PLANES hyperplanes, as a long.

    r6: each plane is a constant literal array, so only the
    ``zip_with``+``aggregate`` dot product runs per row — the old
    per-row hyperplane regeneration (a transform of dim modular terms
    per plane per row) is gone. Measured on the sf1.0 signature pass:
    2.47 s → 0.79 s. (A fully unrolled ``vec[i] * literal`` chain ran
    the projection marginally faster still, but its ~512-node tree cost
    seconds of analyzer/optimizer time per action once duplicated under
    the join branches — planner cost is part of the query wall.) The
    fold adds the identical terms in the identical order starting from
    0.0, so every partial double — and hence every sign bit — is
    bit-equal to the previous spelling's."""
    bits = []
    for j in range(LSH_PLANES):
        d = dot_expr(vec, hyperplane_expr(j, dim))
        bits.append((d > 0).cast("long") * (2**j))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


# banded signature defaults for the near-dup PAIR path. 24 planes in 3
# bands of 8 bits — multi-probe (a pair is a candidate if ANY band
# matches) with per-band buckets small enough that the mega-bucket cap
# below rarely fires at test scale. At corpus scale, band_bits must grow
# with the table: pick band_bits ≈ log2(n_rows / target_bucket_size) so
# the expected bucket stays O(10); the cap is the hard guarantee against
# skew (many near-identical vectors), not a substitute for enough bits.
EMB_PLANES = 24
EMB_BAND_BITS = 8


def lsh_band_keys(
    vec: Column, dim: int, planes: int = EMB_PLANES, band_bits: int = EMB_BAND_BITS
) -> Column:
    """Array of banded sign-bit bucket keys ('<band>_<bits-value>').

    Same deterministic hyperplane family as :func:`hyperplane_expr`
    (global plane index j = band*band_bits + r). r6: planes are constant
    literal arrays (driver-side closed form, bit-identical doubles) so
    per row only the dot-product folds run — the old nested-HOF spelling
    regenerated every plane's modular components per row. The per-plane
    dot and the bit accumulation add the identical values in the
    identical order as before, so every bucket key is unchanged."""
    n_bands = planes // band_bits

    keys = []
    for bi in range(n_bands):
        val = F.lit(0).cast("long")
        for r in range(band_bits):
            d = dot_expr(vec, hyperplane_expr(bi * band_bits + r, dim))
            val = val + F.when(d > 0, F.lit(2 ** r).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        keys.append(F.concat_ws("_", F.lit(bi), val.cast("string")))
    return F.array(*keys)


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    vec: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.15,
    planes: int = EMB_PLANES,
    band_bits: int = EMB_BAND_BITS,
    max_bucket: int = 20,
) -> DataFrame:
    """Embedding near-duplicate pairs via banded hyperplane LSH + exact
    cosine verify — the same candidate-generation skeleton as
    dedup.minhash_lsh_pairs (signature → explode bands → drop
    non-discriminative mega-buckets → bucket self-join → verify), so no
    stage is ever quadratic in anything but the capped bucket size."""
    # repartition BEFORE the signature projection (small-scan fan-out),
    # then a hard materialization barrier: the banded signature is
    # referenced by the cap window and both self-join sides — without it
    # Catalyst's CollapseProject re-inlines the hyperplane fold into each
    # reference. localCheckpoint stores MEMORY_AND_DISK like persist, but
    # the blocks are GC-released when the frame goes out of scope, so
    # repeated calls leave no cached partitions behind.
    sig_df = (
        df.repartition(df.sparkSession.sparkContext.defaultParallelism)
        .select(
            F.col(id_col).alias("id"),
            F.col(vec).alias("e"),
            lsh_band_keys(F.col(vec), dim, planes, band_bits).alias("bands"),
        )
        .localCheckpoint(eager=False)
    )
    base = sig_df.select("id", "e", F.explode("bands").alias("band"))
    bucket_n = Window.partitionBy("band")
    base = (
        base.withColumn("__bn", F.count(F.lit(1)).over(bucket_n))
        .filter(F.col("__bn") <= max_bucket)
        .drop("__bn")
    )
    left = base.select(F.col("id").alias("id_a"), F.col("e").alias("ea"), "band")
    right = base.select(F.col("id").alias("id_b"), F.col("e").alias("eb"), "band")
    cand = (
        left.join(right, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ea", "eb")
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = F.round(cosine_expr(F.col("ea"), F.col("eb")), 6)
    return (
        cand.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def quantize_expr(vec: Column) -> Column:
    """Symmetric per-vector int8 scalar quantization: q_i =
    floor(x_i * 127 / max|x|) in [-127, 127] — the memory-bandwidth play
    for warehouse-scale ANN (4x smaller vectors, integer dot products).
    All arithmetic is double-precision IEEE with a floor, so Spark and a
    SQL engine produce byte-identical codes from the same float32 input;
    the all-zero vector quantizes to all zeros."""
    mx = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    scale = F.coalesce(F.lit(127.0) / F.nullif(mx, F.lit(0.0)), F.lit(0.0))
    return F.transform(vec, lambda x: F.floor(x.cast("double") * scale).cast("long"))


def quantized_dot_expr(a: Column, b: Column) -> Column:
    """Integer dot product of two quantized vectors — exact int64."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_topk(
    df: DataFrame,
    k: int = 5,
    vec: str = "embedding",
    id_col: str = "vec_id",
    query_id: int = 0,
) -> DataFrame:
    """Top-k by int8-quantized dot product vs one stored vector: quantize
    per row (no shuffle), broadcast the query codes, rank the exact
    integer scores via TakeOrderedAndProject. The integer score makes the
    ordering bit-stable across engines — no float summation-order issues."""
    qz = df.select(id_col, quantize_expr(F.col(vec)).alias("qv"))
    query = qz.filter(F.col(id_col) == query_id).select(F.col("qv").alias("qq"))
    joined = qz.join(F.broadcast(query))
    score = quantized_dot_expr(F.col("qv"), F.col("qq"))
    return rank_topk(joined.select(F.col(id_col), score.alias("score")), k, id_col)
