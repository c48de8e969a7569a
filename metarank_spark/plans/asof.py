"""As-of (point-in-time) join — the core zero-leakage primitive.

Spark has no native as-of join. The scalable pattern used here is the
union-merge: stack the right-hand "state timeline" and the left-hand
"query" rows into one stream per entity, sort by (ts, side-marker, seq),
and carry the latest state forward with ``last(..., ignorenulls=True)``
over an unbounded-preceding frame. One shuffle on the entity key, a sorted
scan, no row explosion — this is the plan shape that survives 100x
scale-up (vs. the O(n*m) range-join a naive ``ON l.ts >= r.ts`` produces).

Strictness contract (SURVEY.md §3.1 / flow/MetarankFlow.scala:31-55):
``strict=True`` means a query at timestamp T sees only state written
*strictly before* (ts, seq) — a ranking's snapshot never includes writes
of the same or later events. ``strict=False`` gives at-or-before.

The marker makes tie-breaks explicit instead of relying on implementation
ordering: state rows sort before query rows at equal (ts, seq) when
strict=False, after them when strict=True.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_SEQ = "__asof_seq"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts_ms",
    right_ts: str = "ts_ms",
    values: list[str] | None = None,
    left_seq: str | None = None,
    right_seq: str | None = None,
    strict: bool = True,
    suffix: str = "_asof",
    salt_chunk_ms: int | None = None,
    hot_entities: "list | None" = None,
) -> DataFrame:
    """For each left row, attach the latest ``values`` from ``right`` with
    right.ts (strictly) before left.ts, matched on the entity key ``on``.

    Returns all left columns plus one ``{v}{suffix}`` column per value
    (null when no earlier state exists — Metarank's "missing" read,
    surfaced as NaN at the MValue layer, model/MValue.scala:38).

    ``salt_chunk_ms`` (+ optional ``hot_entities``, single-key joins):
    the carry runs with (entity, time-chunk) window partitions and exact
    reassembly (plans/prefix.salted_strict_last_carry) so a hot key's
    merged timeline spreads across tasks — with a declared hot set only
    those keys pay the reassembly, everyone else keeps the plain window.
    Bit-identical output either way (tests/test_prefix_salted.py).
    """
    keys = [on] if isinstance(on, str) else list(on)
    values = values or [c for c in right.columns if c not in keys + [right_ts, right_seq]]

    zero = F.lit(0).cast("long")
    l_seq = F.col(left_seq).cast("long") if left_seq else zero
    r_seq = F.col(right_seq).cast("long") if right_seq else zero

    # state rows get marker 0 (sort before queries) for at-or-before,
    # marker 1 (sort after) for strictly-before at equal (ts, seq)
    state_marker, query_marker = (1, 0) if strict else (0, 1)

    l_cols = [F.col(c) for c in left.columns]
    left_tagged = left.select(
        *l_cols,
        F.col(left_ts).cast("long").alias("__asof_ts"),
        l_seq.alias(_SEQ),
        F.lit(query_marker).alias(_SIDE),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__asof_v_{v}") for v in values],
    )
    right_tagged = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        F.col(right_ts).cast("long").alias("__asof_ts"),
        r_seq.alias(_SEQ),
        F.lit(state_marker).alias(_SIDE),
        *[F.col(v).alias(f"__asof_v_{v}") for v in values],
    )
    merged = left_tagged.select(right_tagged.columns).unionByName(right_tagged)

    w = (
        Window.partitionBy(*keys)
        .orderBy("__asof_ts", _SEQ, _SIDE)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    # with strict=True the frame ends one row back, but same-(ts,seq) state
    # rows sort AFTER the query row (marker 1) so they are excluded even
    # when multiple rows tie; with strict=False state sorts first and the
    # frame includes the current row, so same-(ts,seq) state is visible.
    def plain(df: DataFrame) -> DataFrame:
        return df.select(
            *df.columns,
            *[
                F.last(f"__asof_v_{v}", ignorenulls=True).over(w).alias(f"{v}{suffix}")
                for v in values
            ],
        )

    def salted(df: DataFrame, broadcast: bool) -> DataFrame:
        from metarank_spark.plans.prefix import salted_strict_last_carry

        c = salted_strict_last_carry(
            df, [f"__asof_v_{v}" for v in values], keys[0],
            ("__asof_ts", _SEQ, _SIDE), salt_chunk_ms,
            broadcast_offsets=broadcast,
        )
        # strict frame ends at -1; the at-or-before frame includes the
        # current row, i.e. coalesce(own value, strict carry)
        def col(v):
            strict_c = F.col(f"__carr___asof_v_{v}")
            return strict_c if strict else F.coalesce(
                F.col(f"__asof_v_{v}"), strict_c
            )
        return c.select(
            *merged.columns,
            *[col(v).alias(f"{v}{suffix}") for v in values],
        )

    if salt_chunk_ms and len(keys) == 1 and hot_entities:
        is_hot = F.coalesce(F.col(keys[0]).isin(list(hot_entities)), F.lit(False))
        carried = plain(merged.filter(~is_hot)).unionByName(
            salted(merged.filter(is_hot), broadcast=True)
        )
    elif salt_chunk_ms and len(keys) == 1:
        carried = salted(merged, broadcast=False)
    else:
        carried = plain(merged)
    out = carried.filter(F.col(_SIDE) == query_marker)
    drop = ["__asof_ts", _SEQ, _SIDE] + [f"__asof_v_{v}" for v in values]
    return out.drop(*drop)


def asof_lookup(
    queries: DataFrame,
    series: DataFrame,
    on: str | list[str],
    value: str,
    query_ts: str = "ts_ms",
    series_ts: str = "ts_ms",
    strict: bool = True,
    default: Column | None = None,
    alias: str | None = None,
) -> DataFrame:
    """Single-value convenience wrapper over :func:`asof_join`."""
    out = asof_join(
        queries, series, on, query_ts, series_ts, [value], strict=strict, suffix="_asof"
    )
    col = F.col(f"{value}_asof")
    if default is not None:
        col = F.coalesce(col, default)
    name = alias or f"{value}_asof"
    out = out.withColumn(name, col)
    if name != f"{value}_asof":
        out = out.drop(f"{value}_asof")
    return out
