"""The sorted-partition as-of merge — one shuffle per entity scope for ALL
features of that scope.

Instead of one union+sort+join per feature (a chain of dependent stages),
all write events and all query (ranking) rows of one scope are unioned
into a single stream, hash-partitioned by the entity key and sorted once
by (ts_ms, seq, side). Every feature then becomes window expressions over
that one sorted frame:

- write-row values (counter totals, periodic vectors, scalars) are
  computed with running / bucket-range frames, masked to write rows;
- query rows pick up the latest strictly-earlier write value with
  last(..., ignorenulls) over an unbounded→-1 frame — the zero-leakage
  snapshot (ordering contract of flow/MetarankFlow.scala:31-55).

Catalyst compiles all same-(partition, order) windows into ONE Window
operator over ONE exchange; the bucket-ordered RANGE frames add a cheap
in-partition re-sort (bucket is monotone in ts), no extra shuffle. At
10^12 rows this is the difference between ~4 shuffles per feature and
~2 per *scope*.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SIDE_QUERY = 0
SIDE_WRITE = 1
ORDER = ("ts_ms", "seq", "__side")


@dataclass
class MergedFeature:
    """One feature compiled against the merged frame.

    write_cols: intermediate columns evaluated on the merged frame (must be
      null on rows that are not this feature's writes — the mask).
    finish: carried-value columns (name → strictly-before carried Column)
      are handed back to build the feature's output expression.
    salt_specs: per write-col decomposition recipe for hot-entity salting —
      name → ("count", itype) | ("periodic", itype, periods, bucket_ms) |
      ("anchored", itype, periods, bucket_ms). Columns absent from the map
      are window-free on the merged frame (masks over payloads) and need
      no decomposition. Filled by the engine's compiler; None disables the
      composed hot series (generic write_series runs instead).
    """
    name: str
    write_cols: dict[str, Column]
    finish: "callable"
    salt_specs: dict | None = None


def run_merged(
    queries: DataFrame,
    writes: DataFrame,
    entity: str,
    features: list[MergedFeature],
    query_keys: list[str],
    salt_chunk_ms: int | None = None,
    hot_entities: "list | None" = None,
) -> DataFrame:
    """queries: (entity, ts_ms, seq, *query_keys); writes: (entity, ts_ms,
    seq, *payload). Returns query rows + one column per feature."""
    if salt_chunk_ms and hot_entities:
        # Hot keys run the two-phase shape inline: the write-side window
        # fold over their WRITES-ONLY frame (legal by the write_series
        # query-row-insensitivity contract — interactions are orders of
        # magnitude sparser than the merged frame), then the chunk-salted
        # as-of carry over their event-scale frame. Cold keys keep the
        # untouched single-pass merged scan; filters push to the scans,
        # so neither branch re-evaluates the other's window work.
        hot = F.coalesce(F.col(entity).isin(list(hot_entities)), F.lit(False))
        cold_out = run_merged(
            queries.filter(~hot), writes.filter(~hot), entity, features,
            query_keys,
        )
        hot_series = write_series(writes.filter(hot), entity, features)
        hot_out = assemble_from_series(
            queries.filter(hot), hot_series, entity, features, query_keys,
            salt_chunk_ms=salt_chunk_ms, hot_entities=hot_entities,
        )
        return cold_out.unionByName(hot_out)

    payload = [c for c in writes.columns if c not in (entity, "ts_ms", "seq")]

    q = queries.select(
        F.col(entity),
        F.col("ts_ms"),
        F.col("seq"),
        F.lit(SIDE_QUERY).alias("__side"),
        *[F.col(k) for k in query_keys],
        *[F.lit(None).cast(writes.schema[p].dataType).alias(p) for p in payload],
    )
    w = writes.select(
        F.col(entity),
        F.col("ts_ms"),
        F.col("seq"),
        F.lit(SIDE_WRITE).alias("__side"),
        *[F.lit(None).cast(queries.schema[k].dataType).alias(k) for k in query_keys],
        *[F.col(p) for p in payload],
    )
    merged = q.unionByName(w)

    # write-row intermediates (masked), all over the single sorted frame
    inter = merged.select("*", *[
        expr.alias(n) for f in features for n, expr in f.write_cols.items()
    ])
    return _carry_and_finish(inter, entity, features, query_keys,
                             salt_chunk_ms, hot_entities)


def _carry_and_finish(
    inter: DataFrame,
    entity: str,
    features: list[MergedFeature],
    query_keys: list[str],
    salt_chunk_ms: int | None = None,
    hot_entities: "list | None" = None,
) -> DataFrame:
    """Shared tail of the merged scan: carry the latest strictly-before
    write value to each query row and apply each feature's finish expr.

    ``salt_chunk_ms`` + ``hot_entities``: rows of the declared hot keys
    run the carry with (entity, time-chunk) window partitions and exact
    cross-chunk reassembly (plans/prefix.salted_strict_last_carry, offsets
    broadcast), every other entity keeps the plain single-window carry —
    the north star's "range-partitioned and salted by entity key" applied
    only where the skew is, so cold data pays nothing. With
    ``salt_chunk_ms`` alone every entity is salted (useful when the whole
    key space is coarse). Output is bit-identical in all three modes."""
    all_write_names = [n for f in features for n in f.write_cols]

    def plain(df: DataFrame) -> DataFrame:
        strict = (
            Window.partitionBy(entity)
            .orderBy(*ORDER)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return df.select(
            "*",
            *[
                F.last(F.col(n), ignorenulls=True).over(strict).alias(f"__carr_{n}")
                for n in all_write_names
            ],
        )

    def salted(df: DataFrame, broadcast: bool) -> DataFrame:
        from metarank_spark.plans.prefix import salted_strict_last_carry

        return salted_strict_last_carry(
            df, all_write_names, entity, ORDER, salt_chunk_ms,
            broadcast_offsets=broadcast,
        )

    if salt_chunk_ms and hot_entities:
        is_hot = F.coalesce(
            F.col(entity).isin(list(hot_entities)), F.lit(False)
        )
        carried = plain(inter.filter(~is_hot)).unionByName(
            salted(inter.filter(is_hot), broadcast=True)
        )
    elif salt_chunk_ms:
        carried = salted(inter, broadcast=False)
    else:
        carried = plain(inter)
    out = carried.filter(F.col("__side") == SIDE_QUERY)
    feature_cols = [
        f.finish({n: F.col(f"__carr_{n}") for n in f.write_cols}).alias(f.name)
        for f in features
    ]
    return out.select(*query_keys, "ts_ms", "seq", *feature_cols)


def write_series(
    writes: DataFrame,
    entity: str,
    features: list[MergedFeature],
) -> DataFrame:
    """Phase A of the two-phase backfill: the write-value series — each
    feature's write_cols evaluated over the writes-only stream, one row
    per write with its (masked) carried values.

    Legal because every write-side expression is query-row-insensitive by
    construction: query rows enter the merged frame with null payloads, so
    sums/last/collect skip them and when()-flags contribute 0 — evaluating
    over writes alone yields bit-identical values at the write rows. This
    is what lets a checkpointed backfill materialize the series ONCE per
    input fingerprint and re-run only the (cheap) as-of assembly per
    entity range, instead of re-folding all state n_ranges times."""
    # write-side window specs order by (ts_ms, seq, __side); supply the
    # side marker as a constant (all rows are writes here)
    w = writes.withColumn("__side", F.lit(SIDE_WRITE))
    return w.select(
        F.col(entity),
        F.col("ts_ms"),
        F.col("seq"),
        *[expr.alias(n) for f in features for n, expr in f.write_cols.items()],
    )


def assemble_from_series(
    queries: DataFrame,
    series: DataFrame,
    entity: str,
    features: list[MergedFeature],
    query_keys: list[str],
    salt_chunk_ms: int | None = None,
    hot_entities: "list | None" = None,
) -> DataFrame:
    """Phase B: attach features to query rows from a pre-computed
    write-value series (write_series output — typically read back from
    parquet). Same output as run_merged, but the per-range cost is one
    union+sort of (series + in-range queries) with a plain last-value
    carry — no window re-aggregation."""
    all_write_names = [n for f in features for n in f.write_cols]
    q = queries.select(
        F.col(entity),
        F.col("ts_ms"),
        F.col("seq"),
        F.lit(SIDE_QUERY).alias("__side"),
        *[F.col(k) for k in query_keys],
        *[
            F.lit(None).cast(series.schema[n].dataType).alias(n)
            for n in all_write_names
        ],
    )
    w = series.select(
        F.col(entity),
        F.col("ts_ms"),
        F.col("seq"),
        F.lit(SIDE_WRITE).alias("__side"),
        *[
            F.lit(None).cast(queries.schema[k].dataType).alias(k)
            for k in query_keys
        ],
        *[F.col(n) for n in all_write_names],
    )
    merged = q.unionByName(w)
    return _carry_and_finish(merged, entity, features, query_keys,
                             salt_chunk_ms, hot_entities)


# ---------- frame helpers usable inside write_cols ----------

def entity_rows_window(entity: str, end: int | None = None) -> Window:
    end = Window.currentRow if end is None else end
    return (
        Window.partitionBy(entity)
        .orderBy(*ORDER)
        .rowsBetween(Window.unboundedPreceding, end)
    )


def bucket_range_window(entity: str, bucket: Column, periods: int) -> Window:
    return (
        Window.partitionBy(entity)
        .orderBy(bucket)
        .rangeBetween(Window.unboundedPreceding, -(periods + 1))
    )


def masked(flag: Column, value: Column) -> Column:
    return F.when(flag, value)
