"""The reference's native JSON wire format → canonical event table.

Decodes Metarank's event JSON exactly as model/Event.scala's circe codecs
do (discriminator ``event`` with the ``metadata``→item alias,
Event.scala:108-127; timestamps as epoch-ms long, numeric string, or ISO
zoned datetime, EventCodecs.timestampCodec :71-81; ``fields`` as a list of
{name, value} where value is string | number | boolean | string[] |
number[], model/Field.scala), plus the Snowplow envelopes
(source/format/SnowplowFormat.scala:10-59: TSV field 58 / JSON
``unstruct_event``, schema-filtered to the four iglu:ai.metarank types).

Implementation is Spark-native semi-structured parsing: one
``parse_json`` → VARIANT per line, then ``try_variant_get`` projections —
heterogeneous ``value`` types dispatch on ``schema_of_variant`` into
str/num/numlist field maps. No per-row Python, no UDFs; the whole decode
is one whole-stage-codegen projection over the text scan.

``seq``: the wire format has no sequence column; the reference relies on
file order for equal timestamps (CheckOrderingPipe). We materialize that
as ``monotonically_increasing_id()`` — file-order-preserving within and
across ordered input splits — so the total order (ts_ms, seq) is explicit
downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from metarank_spark.events import EVENT_SCHEMA

SNOWPLOW_SCHEMAS = (
    "iglu:ai.metarank/item/jsonschema/1-0-0",
    "iglu:ai.metarank/user/jsonschema/1-0-0",
    "iglu:ai.metarank/interaction/jsonschema/1-0-0",
    "iglu:ai.metarank/ranking/jsonschema/1-0-0",
)


def _ts_ms(v: Column) -> Column:
    """timestampCodec: long | numeric string | ISO zoned datetime."""
    s = F.try_variant_get(v, "$.timestamp", "string")
    return (
        F.when(s.rlike("^[0-9]+$"), s.cast("long"))
        .otherwise(F.unix_millis(F.to_timestamp(s)))
    )


def _field_maps(v: Column, path: str):
    """fields: [{name, value}] → (str_fields, num_fields, numlist_fields)
    maps, dispatching on the variant type of each value."""
    fs = F.try_variant_get(v, path, "array<variant>")
    name = lambda f: F.try_variant_get(f, "$.name", "string")  # noqa: E731
    val = lambda f: F.try_variant_get(f, "$.value", "variant")  # noqa: E731
    typ = lambda f: F.schema_of_variant(val(f))  # noqa: E731

    is_num = lambda f: typ(f).isin("BIGINT", "INT", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT") | typ(f).startswith("DECIMAL")  # noqa: E731
    is_str = lambda f: typ(f) == "STRING"  # noqa: E731
    is_bool = lambda f: typ(f) == "BOOLEAN"  # noqa: E731
    is_strlist = lambda f: typ(f) == "ARRAY<STRING>"  # noqa: E731
    is_numlist = lambda f: (  # noqa: E731
        typ(f).startswith("ARRAY<") & ~is_strlist(f) & (typ(f) != "ARRAY<VARIANT>")
    )

    str_entries = F.map_from_entries(
        F.filter(
            F.transform(
                fs,
                lambda f: F.when(
                    is_str(f),
                    F.struct(
                        name(f).alias("key"),
                        F.array(F.try_variant_get(val(f), "$", "string")).alias("value"),
                    ),
                )
                .when(
                    is_bool(f),
                    F.struct(
                        name(f).alias("key"),
                        F.array(F.try_variant_get(val(f), "$", "boolean").cast("string")).alias("value"),
                    ),
                )
                .when(
                    is_strlist(f),
                    F.struct(
                        name(f).alias("key"),
                        F.try_variant_get(val(f), "$", "array<string>").alias("value"),
                    ),
                ),
            ),
            lambda e: e.isNotNull(),
        )
    )
    num_entries = F.map_from_entries(
        F.filter(
            F.transform(
                fs,
                lambda f: F.when(
                    is_num(f),
                    F.struct(
                        name(f).alias("key"),
                        F.try_variant_get(val(f), "$", "double").alias("value"),
                    ),
                ),
            ),
            lambda e: e.isNotNull(),
        )
    )
    numlist_entries = F.map_from_entries(
        F.filter(
            F.transform(
                fs,
                lambda f: F.when(
                    is_numlist(f),
                    F.struct(
                        name(f).alias("key"),
                        F.try_variant_get(val(f), "$", "array<double>").alias("value"),
                    ),
                ),
            ),
            lambda e: e.isNotNull(),
        )
    )
    return str_entries, num_entries, numlist_entries


def parse_wire_json(json_col: Column) -> list[Column]:
    """One wire-format JSON event string → the canonical EVENT_SCHEMA
    columns (minus seq, which callers assign from input order)."""
    v = F.parse_json(json_col)
    get = lambda p: F.try_variant_get(v, p, "string")  # noqa: E731
    etype = get("$.event")
    etype = F.when(etype == "metadata", "item").otherwise(etype)
    def _rank_item(it):
        # RankItem: id, relevancy, optional explicit label, optional
        # per-item field overrides (Event.scala relevancyDecoder :85-95)
        str_f, num_f, _ = _field_maps(it, "$.fields")
        return F.struct(
            F.try_variant_get(it, "$.id", "string").alias("id"),
            F.coalesce(
                F.try_variant_get(it, "$.relevancy", "double"), F.lit(1.0)
            ).alias("relevancy"),
            F.try_variant_get(it, "$.label", "int").alias("label"),
            str_f.alias("str_fields"),
            num_f.alias("num_fields"),
        )

    items = F.transform(
        F.try_variant_get(v, "$.items", "array<variant>"), _rank_item
    ).cast(EVENT_SCHEMA["items"].dataType)
    str_f, num_f, numlist_f = _field_maps(v, "$.fields")
    return [
        get("$.id").alias("event_id"),
        etype.alias("event_type"),
        _ts_ms(v).alias("ts_ms"),
        get("$.item").alias("item_id"),
        get("$.user").alias("user_id"),
        get("$.session").alias("session_id"),
        get("$.ranking").alias("ranking_id"),
        get("$.type").alias("interaction_type"),
        items.alias("items"),
        str_f.alias("str_fields"),
        num_f.alias("num_fields"),
        numlist_f.alias("numlist_fields"),
    ]


def _finish(df: DataFrame, json_col: str) -> DataFrame:
    out = df.select(
        *parse_wire_json(F.col(json_col)),
        F.monotonically_increasing_id().alias("seq"),
    )
    return out.select([f.name for f in EVENT_SCHEMA.fields])


def read_wire_events(spark: SparkSession, path: str) -> DataFrame:
    """Metarank-native JSONL event files (gzip handled by the text source)
    → canonical event table."""
    lines = spark.read.option("recursiveFileLookup", True).text(path)
    return _finish(lines.filter(F.trim("value") != ""), "value")


def read_snowplow_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Snowplow enriched-event TSV (SnowplowTSVFormat): the metarank event
    rides in tab field 58 as {schema, data:{schema, data}}; rows with
    unsupported iglu schemas are dropped (decodeEvent's Stream.empty)."""
    lines = spark.read.option("recursiveFileLookup", True).text(path)
    unstruct = F.element_at(F.split(F.col("value"), "\t"), 59)
    staged = (
        lines.select(F.parse_json(unstruct).alias("u"))
        .select(
            F.try_variant_get(F.col("u"), "$.data.schema", "string").alias("schema"),
            F.to_json(F.try_variant_get(F.col("u"), "$.data.data", "variant")).alias("ev"),
        )
        .filter(F.col("schema").isin(*SNOWPLOW_SCHEMAS))
    )
    return _finish(staged, "ev")


def read_snowplow_json(spark: SparkSession, path: str) -> DataFrame:
    """Snowplow enriched-event JSON (SnowplowJSONFormat): the event lives
    at unstruct_event.data.data."""
    lines = spark.read.option("recursiveFileLookup", True).text(path)
    staged = (
        lines.select(F.parse_json(F.col("value")).alias("u"))
        .select(
            F.try_variant_get(
                F.col("u"), "$.unstruct_event.data.schema", "string"
            ).alias("schema"),
            F.to_json(
                F.try_variant_get(F.col("u"), "$.unstruct_event.data.data", "variant")
            ).alias("ev"),
        )
        .filter(F.col("schema").isin(*SNOWPLOW_SCHEMAS))
    )
    return _finish(staged, "ev")
