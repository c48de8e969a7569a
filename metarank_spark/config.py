"""YAML config ingestion — load reference-style Metarank configs into
engine feature dataclasses.

Mirrors the feature registry of model/FeatureSchema.scala:41-80 (the
``type:`` dispatch) and the field conventions of the reference's shipped
configs (doc/configuration/sample-config.yml, src/test/resources/ranklens/
config.yml): ``source: item.popularity`` style FieldName refs, ``24h``/
``60d`` FiniteDuration strings, ``periods: [7,30]`` lists, optional
``normalize: {weight: N}`` on rate, per-feature ``refresh``/``ttl``.

Out-of-scope types raise with an explicit message rather than silently
dropping (ua/referer parse dictionaries, ONNX bi/cross encoders, and
field_match live at the query layer here — see SURVEY.md §2 notes).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from metarank_spark.engine import (
    Boolean,
    Diversity,
    FieldMatch,
    InteractedWith,
    InteractionCount,
    ItemAge,
    LocalTime,
    Number,
    Position,
    RandomFeature,
    Rate,
    Referer,
    Relevancy,
    StringEncode,
    UserAgent,
    Vector,
    WindowCount,
    WordCount,
)

_DUR_RE = re.compile(r"^\s*(\d+)\s*(ms|s|m|h|d)\s*$")
_DUR_MS = {"ms": 1, "s": 1_000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}

UNSUPPORTED = {
    # ONNX runtimes are unavailable in this engine's environment; the
    # cosine path is covered by the ANN queries (SURVEY.md §2 notes)
    "field_match_bi_encoder": "ONNX bi-encoder inference is out of scope",
    "field_match_cross_encoder": "ONNX cross-encoder inference is out of scope",
}


def _load_term_freq(path: str) -> dict:
    """Read a BM25 TermFreq dictionary: our build_term_freq format
    ({n_docs, avgdl, df}) or the reference termfreq CLI artifact
    ({docs, avgdl, termfreqs} — BM25Matcher.TermFreqDic)."""
    import json

    with open(path) as fh:
        raw = json.load(fh)
    return {
        "n_docs": raw.get("n_docs", raw.get("docs")),
        "avgdl": raw["avgdl"],
        "df": raw.get("df", raw.get("termfreqs", {})),
    }


def parse_duration_ms(v: int | str) -> int:
    """'24h' / '90d' / '60s' → milliseconds (FiniteDuration strings as the
    reference's circe codecs accept them); bare ints are taken as ms."""
    if isinstance(v, (int, float)):
        return int(v)
    m = _DUR_RE.match(str(v))
    if not m:
        raise ValueError(f"cannot parse duration {v!r} (want e.g. 24h, 90d, 60s)")
    return int(m.group(1)) * _DUR_MS[m.group(2)]


def _split_source(src: str) -> tuple[str, str]:
    """'item.popularity' → (source_event, field). 'metadata' is the legacy
    alias for item events in the reference's shipped configs."""
    if "." not in src:
        raise ValueError(f"source {src!r} must be <event>.<field>")
    head, fld = src.split(".", 1)
    if head == "metadata":
        head = "item"
    if head not in ("item", "user", "interaction", "ranking"):
        raise ValueError(f"unknown source event type {head!r} in {src!r}")
    return head, fld


def _scope(entry: dict, default: str = "item", allow_field: bool = False) -> str:
    """Plain scopes everywhere; 'item.<field>' / 'ranking.<field>'
    (ScopeType.scala:38-44) where the feature supports them — rate in the
    reference (RateFeature.scala), extended here to interaction_count and
    window_count with the same entity derivation."""
    s = entry.get("scope", default)
    if "." in s:
        head = s.split(".", 1)[0]
        if not allow_field or head not in ("item", "ranking"):
            raise NotImplementedError(
                f"field scope {s!r} is not supported for this feature type; "
                "use item/user/session/global"
            )
    return s


@dataclass
class LoadedConfig:
    """Parsed config: engine feature dataclasses plus the knobs that live
    outside them (per-feature refresh gates for the FeatureValueSink path,
    the raw models section, ttl)."""

    features: list
    refresh_ms: dict[str, int] = dc_field(default_factory=dict)
    ttl_ms: dict[str, int] = dc_field(default_factory=dict)
    models: dict = dc_field(default_factory=dict)
    raw: dict = dc_field(default_factory=dict)
    # engine: section (this engine's own extension — the reference has no
    # cluster-execution knobs): hot-entity salting config, passed to
    # FeatureEngine(hot_chunk_ms=..., hot_entities=...)
    hot_chunk_ms: "int | None" = None
    hot_entities: "list | None" = None

    def engine_kwargs(self) -> dict:
        return {
            "hot_chunk_ms": self.hot_chunk_ms,
            "hot_entities": self.hot_entities,
        }

    def model_selectors(self) -> dict:
        """Per-model training-data selector trees (config/Selector.scala;
        SelectorYamlTest: a model with no ``selector`` key accepts every
        clickthrough). Compile with selectors.selector_predicate."""
        from metarank_spark.selectors import parse_selector

        return {
            name: parse_selector((m or {}).get("selector"))
            for name, m in self.models.items()
        }


def parse_feature(entry: dict):
    """One YAML feature entry → engine dataclass
    (FeatureSchema.scala:41-80 type dispatch)."""
    tpe = entry["type"]
    name = entry["name"]
    if tpe in UNSUPPORTED:
        raise NotImplementedError(f"feature type {tpe!r}: {UNSUPPORTED[tpe]}")
    # per-feature state expiry (model/Feature.scala:41-55); None = no
    # expiry here (the reference defaults to 90d in the live store)
    ttl = parse_duration_ms(entry["ttl"]) if "ttl" in entry else None
    if tpe == "number":
        src, fld = _split_source(entry["source"])
        return Number(name, fld, source=src, ttl_ms=ttl)
    if tpe == "boolean":
        src, fld = _split_source(entry["source"])
        return Boolean(name, fld, source=src, ttl_ms=ttl)
    if tpe == "string":
        src, fld = _split_source(entry["source"])
        return StringEncode(
            name, fld, tuple(entry["values"]),
            encode=entry.get("encode", "index"), source=src, ttl_ms=ttl,
        )
    if tpe == "word_count":
        src, fld = _split_source(entry["source"])
        return WordCount(name, fld, source=src, ttl_ms=ttl)
    if tpe == "rate":
        norm = entry.get("normalize") or {}
        return Rate(
            name, entry["top"], entry["bottom"], tuple(entry["periods"]),
            bucket_ms=parse_duration_ms(entry.get("bucket", "24h")),
            scope=_scope(entry, allow_field=True),
            normalize_weight=norm.get("weight"),
            ttl_ms=ttl,
        )
    if tpe == "interaction_count":
        return InteractionCount(
            name, entry["interaction"],
            scope=_scope(entry, allow_field=True), ttl_ms=ttl,
        )
    if tpe == "window_count":
        return WindowCount(
            name, entry["interaction"], tuple(entry["periods"]),
            bucket_ms=parse_duration_ms(entry.get("bucket", "24h")),
            scope=_scope(entry, allow_field=True),
            ttl_ms=ttl,
        )
    if tpe == "item_age":
        return ItemAge(name, ttl_ms=ttl)
    if tpe == "local_time":
        # reference schema: source: ranking.<field|timestamp>, parse:
        # <mapper> (LocalDateTimeFeature.LocalDateTimeSchema; decoder
        # requires a ranking-sourced field)
        part = entry.get(
            "parse", entry.get("field", entry.get("part", "time_of_day"))
        )
        lt_src = "timestamp"
        if "source" in entry:
            src_event, lt_src = _split_source(entry["source"])
            if src_event != "ranking":
                raise ValueError(
                    "local_time can only read ranking event fields "
                    "(LocalDateTimeFeature decoder .ensure)"
                )
        return LocalTime(name, part=part, source=lt_src)
    if tpe == "relevancy":
        return Relevancy(name)
    if tpe == "position":
        return Position(name, position=entry.get("position", 0))
    if tpe == "random":
        return RandomFeature(name, seed=entry.get("seed"))
    if tpe == "interacted_with":
        flds = entry["field"]
        flds = [flds] if isinstance(flds, str) else list(flds)
        return InteractedWith(
            name, entry["interaction"],
            tuple(_split_source(f)[1] for f in flds),
            scope=_scope(entry, "session"),
            count=entry.get("count", 100),
            duration_ms=parse_duration_ms(entry.get("duration", "24h")),
        )
    if tpe == "diversity":
        _, fld = _split_source(entry["source"])
        return Diversity(
            name, fld, kind=entry.get("kind", "numeric"),
            top_n=entry.get("top", 10),
        )
    if tpe == "vector":
        src, fld = _split_source(entry["source"])
        reducers = entry.get("reduce", ("min", "max", "size", "avg"))
        return Vector(name, fld, reducers=tuple(reducers), source=src, ttl_ms=ttl)
    if tpe == "ua":
        # UserAgentSchema (UserAgentFeature.scala:73-85): source +
        # field (platform|os|browser|bot); scope is always session
        _, fld = _split_source(entry["source"])
        return UserAgent(name, fld, mapper=entry["field"], ttl_ms=ttl)
    if tpe == "referer":
        # RefererSchema (RefererFeature.scala:119-126): source + scope
        src, fld = _split_source(entry["source"])
        scope = entry.get("scope", "user")
        if scope not in ("user", "session"):
            raise ValueError(
                f"referer scope must be user|session, got {scope!r} "
                "(RefererFeature value() reads only those scopes)"
            )
        return Referer(name, fld, scope=scope, source=src, ttl_ms=ttl)
    if tpe == "field_match":
        # FieldMatchSchema (FieldMatchFeature.scala:97-115): rankingField
        # vs itemField with a method block (term|ngram|bm25)
        rhead, rfld = _split_source(entry["rankingField"])
        ihead, ifld = _split_source(entry["itemField"])
        if rhead != "ranking" or ihead != "item":
            raise ValueError(
                "field_match needs rankingField: ranking.<f> and "
                f"itemField: item.<f>, got {entry['rankingField']!r} / "
                f"{entry['itemField']!r}"
            )
        m = entry.get("method") or {"type": "term"}
        mtype = m.get("type", "term")
        if mtype not in ("term", "ngram", "bm25"):
            raise ValueError(
                f"field matching method {mtype!r} is not supported "
                "(FieldMatcherType registry; bi/cross encoders need ONNX)"
            )
        tf = _load_term_freq(m["termFreq"]) if mtype == "bm25" else None
        return FieldMatch(
            name, rfld, ifld, method=mtype, n=int(m.get("n", 3)),
            term_freq=tf, ttl_ms=ttl,
        )
    raise ValueError(f"feature type {tpe!r} is not supported (FeatureSchema registry)")


def load_config(text_or_path: str) -> LoadedConfig:
    """Parse a reference-style YAML config (a path or the YAML text
    itself). Unknown top-level sections (state/train/api/...) are kept in
    ``raw`` untouched — they configure serving infrastructure this engine
    does not reimplement."""
    import os

    import yaml

    if os.path.exists(text_or_path):
        with open(text_or_path) as fh:
            doc = yaml.safe_load(fh)
    else:
        doc = yaml.safe_load(text_or_path)
    if not isinstance(doc, dict) or "features" not in doc:
        raise ValueError("config must be a mapping with a 'features' section")
    feats, refresh, ttl = [], {}, {}
    for entry in doc["features"]:
        feats.append(parse_feature(entry))
        if "refresh" in entry:
            refresh[entry["name"]] = parse_duration_ms(entry["refresh"])
        if "ttl" in entry:
            ttl[entry["name"]] = parse_duration_ms(entry["ttl"])
    eng = doc.get("engine") or {}
    hot_chunk = (
        parse_duration_ms(eng["hot_chunk"]) if "hot_chunk" in eng else None
    )
    return LoadedConfig(
        features=feats, refresh_ms=refresh, ttl_ms=ttl,
        models=doc.get("models") or {}, raw=doc,
        hot_chunk_ms=hot_chunk,
        hot_entities=list(eng["hot_entities"]) if eng.get("hot_entities") else None,
    )
