"""The vectorized Arrow kernel — `applyInPandas` over time-sorted entity
partitions.

The JVM window algebra (operators/merge.py) covers every built-in feature
and is the fast path. This module is the *extensibility* surface — the
analog of the reference's compiled-in extractor API
(feature/BaseFeature.scala:12-41, registry model/FeatureSchema.scala:44-75,
SURVEY.md §2.4): a user writes one numpy function over a single entity's
time-sorted frame (writes + queries merged, zero-leakage masking already
done), and the engine distributes it.

Contract given to the kernel fn, per entity:
    pdf: pandas frame sorted by (ts_ms, seq, side), side 0=query 1=write,
         all write payload columns present (NaN/None on query rows).
    returns: one value-array per OUTPUT column, aligned to the query rows
         *in order* (the helper slices query rows for you).

Scale shape: one hash shuffle on the entity key, Arrow batches per group,
numpy inside — the same plan as the JVM path, with the Python worker as
the only added cost (~2-5x slower than codegen; still >10x the
reference's scalar fold)."""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def run_kernel(
    queries: DataFrame,
    writes: DataFrame,
    entity: str,
    fn: Callable[[pd.DataFrame, pd.DataFrame], dict[str, "np.ndarray"]],
    out_fields: list[T.StructField],
    query_keys: list[str],
) -> DataFrame:
    """Union writes+queries per entity, sort, and run ``fn(writes_pdf,
    queries_pdf) -> {col: values aligned to queries}`` inside
    applyInPandas. Strictly-before masking is the kernel author's choice —
    use `searchsorted` on the merged order key (helpers below)."""
    payload = [c for c in writes.columns if c not in (entity, "ts_ms", "seq")]
    q = queries.select(
        F.col(entity).alias("__e"), "ts_ms", "seq", F.lit(0).alias("__side"),
        *[F.col(k) for k in query_keys],
        *[F.lit(None).cast(writes.schema[p].dataType).alias(p) for p in payload],
    )
    w = writes.select(
        F.col(entity).alias("__e"), "ts_ms", "seq", F.lit(1).alias("__side"),
        *[F.lit(None).cast(queries.schema[k].dataType).alias(k) for k in query_keys],
        *[F.col(p) for p in payload],
    )
    merged = q.unionByName(w)
    schema = T.StructType(
        [queries.schema[k] for k in query_keys] + out_fields
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_ms", "seq", "__side"], kind="mergesort")
        is_q = pdf["__side"].values == 0
        qrows = pdf[is_q]
        wrows = pdf[~is_q]
        out = pd.DataFrame({k: qrows[k].values for k in query_keys})
        for col, vals in fn(wrows, qrows).items():
            out[col] = list(vals) if isinstance(vals, np.ndarray) and vals.ndim > 1 else vals
        return out

    out = merged.groupBy("__e").applyInPandas(run, schema=schema)
    # Arrow serializes np.nan inside list columns as null; restore the
    # engine's missing-value convention (NaN, model/MValue.scala:38,56-61)
    nan = F.lit(float("nan"))
    for f in out_fields:
        if isinstance(f.dataType, T.ArrayType) and isinstance(
            f.dataType.elementType, T.DoubleType
        ):
            out = out.withColumn(
                f.name, F.transform(F.col(f.name), lambda x: F.coalesce(x, nan))
            )
        elif isinstance(f.dataType, T.DoubleType):
            out = out.withColumn(f.name, F.coalesce(F.col(f.name), nan))
    return out


def strictly_before_index(wrows: pd.DataFrame, qrows: pd.DataFrame) -> np.ndarray:
    """For each query row: number of write rows strictly before it in the
    (ts_ms, seq) order — the zero-leakage cut point (use as exclusive end
    index into cumulative arrays over wrows).

    Implemented as one lexsort-merge over the concatenated (ts, seq, side)
    keys — NOT a packed scalar key like ts*K+seq, which silently overflows
    or reorders once seq >= K (backfill/bench seq values reach tens of
    millions, and inject_impressions doubles them)."""
    n_w = len(wrows)
    ts = np.concatenate(
        [wrows["ts_ms"].values.astype(np.int64), qrows["ts_ms"].values.astype(np.int64)]
    )
    seq = np.concatenate(
        [wrows["seq"].values.astype(np.int64), qrows["seq"].values.astype(np.int64)]
    )
    # side: queries (0) sort before writes (1) on an exact (ts, seq) tie,
    # so a tied write is excluded — strictly-before semantics.
    side = np.concatenate(
        [np.ones(n_w, dtype=np.int8), np.zeros(len(qrows), dtype=np.int8)]
    )
    order = np.lexsort((side, seq, ts))
    is_w = order < n_w
    cum_w = np.cumsum(is_w)  # inclusive; query positions contribute 0
    out = np.empty(len(qrows), dtype=np.int64)
    qpos = np.nonzero(~is_w)[0]
    out[order[qpos] - n_w] = cum_w[qpos]
    return out


# ---------------- example / reference kernels ----------------

def decayed_count_kernel(half_life_ms: float):
    """Custom extractor the window algebra can't express compactly:
    exponentially time-decayed event count at each query timestamp:
        Σ_writes<q  0.5 ** ((q.ts - w.ts) / half_life)."""

    def fn(wrows: pd.DataFrame, qrows: pd.DataFrame) -> dict:
        cut = strictly_before_index(wrows, qrows)
        wts = wrows["ts_ms"].values.astype(np.float64)
        qts = qrows["ts_ms"].values.astype(np.float64)
        out = np.zeros(len(qrows))
        for i, (c, t) in enumerate(zip(cut, qts)):  # queries per entity: few
            if c:
                out[i] = np.sum(0.5 ** ((t - wts[:c]) / half_life_ms))
        return {"decayed": out}

    return fn


def window_count_kernel(periods: tuple[int, ...], bucket_ms: int = 86_400_000):
    """window_count re-implemented in numpy — used to cross-validate the
    kernel path against the JVM merged scan (they must agree exactly)."""

    def fn(wrows: pd.DataFrame, qrows: pd.DataFrame) -> dict:
        cut = strictly_before_index(wrows, qrows)
        buckets = (wrows["ts_ms"].values // bucket_ms).astype(np.int64)
        out = np.full((len(qrows), len(periods)), np.nan)
        for i, c in enumerate(cut):
            if c == 0:
                continue
            b = buckets[:c]
            last = b.max()
            for j, p in enumerate(periods):
                out[i, j] = float(((b >= last - p) & (b <= last)).sum())
        return {"wcnt": out}

    return fn
