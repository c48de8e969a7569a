"""Model training-data selectors (config/Selector.scala:11-120).

The reference routes each clickthrough to a subset of models: every model
config carries a ``selector`` tree (accept / not / or / and / sample /
field / interaction-position / ranking-length) evaluated per clickthrough
at train-buffer flush. Here the tree COMPILES TO A CATALYST PREDICATE
over the clickthrough frame (operators/clickthrough.clickthroughs), so
selection is a plain ``filter`` — pushdown-friendly, no Python in the
row path, and one scan can feed every model's selection.

Divergences from the reference, both deliberate and documented:

- SampleSelector (Selector.scala:31-33) uses ``Random.nextDouble``, so
  two replays of the same stream select different rows. Ours is the
  deterministic hash-accept used everywhere else in this engine
  (engine.sample_accept_expr, the Feature.scala:249 analog) keyed on
  ranking_id: replays, backfills, and oracles agree bit-for-bit.
- InteractionPositionSelector with only ``max`` set: the reference
  defaults the missing min to ``Int.MaxValue`` (Selector.scala:50),
  which rejects every clickthrough whose interactions hit the ranking —
  an apparent defect (their own YAML test decodes a max-only selector
  that this default would make useless). We treat a missing bound as
  unbounded.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metarank_spark.engine import SAMPLE_MOD


@dataclass(frozen=True)
class Accept:
    """AcceptSelector (Selector.scala:65-67): constant verdict."""
    accept: bool = True


@dataclass(frozen=True)
class Not:
    inner: object


@dataclass(frozen=True)
class Or:
    items: tuple


@dataclass(frozen=True)
class And:
    items: tuple


@dataclass(frozen=True)
class Sample:
    """Deterministic analog of SampleSelector (see module docstring)."""
    ratio: float

    def __post_init__(self):
        if not 0.0 <= self.ratio <= 1.0:
            raise ValueError("ratio should be within 0.0..1.0 range")


@dataclass(frozen=True)
class FieldSelector:
    """Accept when the RANKING event carries ``ranking_field`` with
    ``value`` (string equality, or membership for list fields —
    Selector.scala:35-41; our map<string,array<string>> encoding covers
    both shapes with one array_contains)."""
    ranking_field: str
    value: str


@dataclass(frozen=True)
class InteractionPosition:
    """Accept when EVERY interaction that hits the ranking sits at a
    0-based position within [min_pos, max_pos] (Selector.scala:43-56;
    vacuous accept when none hit)."""
    min_pos: int | None = None
    max_pos: int | None = None

    def __post_init__(self):
        if self.min_pos is None and self.max_pos is None:
            raise ValueError("max or min position should be defined")


@dataclass(frozen=True)
class RankingLength:
    """Accept when the ranking's item count is within [min_items,
    max_items] (Selector.scala:58-63)."""
    min_items: int | None = None
    max_items: int | None = None

    def __post_init__(self):
        if self.min_items is None and self.max_items is None:
            raise ValueError("min or max items should be defined")


def parse_selector(doc) -> object:
    """YAML/dict → selector tree, following the reference's try-in-order
    decode chain (Selector.scala:99-113): ranking-length,
    interaction-position, field, sample, and, or, not, accept. A missing
    selector means accept-all (SelectorYamlTest 'fall back to all')."""
    if doc is None:
        return Accept()
    if not isinstance(doc, dict):
        raise ValueError(f"selector must be a mapping, got {doc!r}")
    if "minItems" in doc or "maxItems" in doc:
        return RankingLength(doc.get("minItems"), doc.get("maxItems"))
    if "minInteractionPosition" in doc or "maxInteractionPosition" in doc:
        return InteractionPosition(
            doc.get("minInteractionPosition"),
            doc.get("maxInteractionPosition"),
        )
    if "rankingField" in doc:
        return FieldSelector(doc["rankingField"], doc["value"])
    if "ratio" in doc:
        return Sample(float(doc["ratio"]))
    if "and" in doc:
        return And(tuple(parse_selector(d) for d in doc["and"]))
    if "or" in doc:
        return Or(tuple(parse_selector(d) for d in doc["or"]))
    if "not" in doc:
        return Not(parse_selector(doc["not"]))
    if "accept" in doc:
        return Accept(bool(doc["accept"]))
    raise ValueError(f"unrecognized selector: {doc!r}")


def selector_predicate(
    sel,
    items_col: str = "items",
    interactions_col: str = "interactions",
    fields_col: str = "str_fields",
    id_col: str = "ranking_id",
) -> Column:
    """Compile a selector tree to one boolean Column over a clickthrough
    row (items: array<struct{id,..}>, interactions: array<struct{item,..}>,
    str_fields: the ranking event's fields). Pure expressions end to end:
    Catalyst folds constant Accept legs and pushes the predicate into the
    scan where lineage allows."""
    if isinstance(sel, Accept):
        return F.lit(bool(sel.accept))
    if isinstance(sel, Not):
        return ~selector_predicate(
            sel.inner, items_col, interactions_col, fields_col, id_col)
    if isinstance(sel, (Or, And)):
        legs = [
            selector_predicate(
                s, items_col, interactions_col, fields_col, id_col)
            for s in sel.items
        ]
        out = legs[0] if legs else F.lit(isinstance(sel, And))
        for leg in legs[1:]:
            out = (out | leg) if isinstance(sel, Or) else (out & leg)
        return out
    if isinstance(sel, Sample):
        # xxhash64 rather than the engine's char-fold (which is biased
        # low on short ids); pmod folds it to a uniform residue
        h = F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                   F.lit(SAMPLE_MOD))
        return h < F.lit(int(sel.ratio * SAMPLE_MOD))
    if isinstance(sel, FieldSelector):
        vals = F.col(fields_col).getItem(sel.ranking_field)
        return vals.isNotNull() & F.array_contains(vals, sel.value)
    if isinstance(sel, InteractionPosition):
        item_ids = F.transform(F.col(items_col), lambda x: x["id"])
        pos = F.filter(
            F.transform(
                F.col(interactions_col),
                lambda i: F.array_position(item_ids, i["item"]) - 1,
            ),
            lambda p: p >= 0,
        )
        lo = F.lit(sel.min_pos if sel.min_pos is not None else 0)
        hi = F.lit(sel.max_pos if sel.max_pos is not None else 1 << 62)
        return F.forall(pos, lambda p: (p >= lo) & (p <= hi))
    if isinstance(sel, RankingLength):
        n = F.size(F.col(items_col))
        lo = F.lit(sel.min_items if sel.min_items is not None else 0)
        hi = F.lit(sel.max_items if sel.max_items is not None else 1 << 62)
        return (n >= lo) & (n <= hi)
    raise TypeError(f"not a selector: {sel!r}")


def select_clickthroughs(cts: DataFrame, sel, **cols) -> DataFrame:
    """Filter a clickthrough frame to the rows a model with selector
    ``sel`` trains on — the TrainBuffer routing step as one filter."""
    return cts.filter(selector_predicate(sel, **cols))
