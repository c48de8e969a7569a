"""Model training-data selectors (config/SelectorTest.scala +
SelectorYamlTest.scala transcriptions) and the rerank extras: Kendall
response correlation (util/KendallCorrelationTest.scala), noop and
shuffle rankers (ml/rank/NoopRanker.scala, ShuffleRankerTest.scala)."""

from __future__ import annotations

import pytest
import yaml
from pyspark.sql import functions as F

from metarank_spark.events import events_df, interaction_event, ranking_event
from metarank_spark.operators.clickthrough import clickthroughs
from metarank_spark.operators.ranker import kendall_krr, noop_rank, shuffle_rank
from metarank_spark.selectors import (
    Accept,
    And,
    FieldSelector,
    InteractionPosition,
    Not,
    Or,
    RankingLength,
    Sample,
    parse_selector,
    select_clickthroughs,
)

T0 = 1_700_000_000_000


def _cts(spark, specs):
    """TestClickthrough analog: specs = [(items, clicks, str_fields)] →
    one clickthrough row each (ranking id = r<i>)."""
    rows, seq = [], 0
    for i, (items, clicks, sf) in enumerate(specs):
        seq += 1
        rows.append(ranking_event(
            f"r{i}", items, T0 + i * 10_000, seq, user="u1", session="s1",
            str_fields=sf))
        for c in clicks:
            seq += 1
            rows.append(interaction_event(
                c, "click", T0 + i * 10_000 + seq, seq, user="u1",
                ranking=f"r{i}"))
    return clickthroughs(events_df(spark, rows))


def _accepted(cts, sel):
    return {r["ranking_id"] for r in select_clickthroughs(cts, sel).collect()}


def test_ranking_length_selector(spark):
    # SelectorTest.scala:18-23
    cts = _cts(spark, [
        (["p1"], ["p1"], None),                  # r0
        (["p1", "p2", "p3"], ["p1"], None),      # r1
    ])
    assert _accepted(cts, RankingLength(2, None)) == {"r1"}


def test_interaction_position_selector(spark):
    # SelectorTest.scala:25-33: 0-based positions, ALL hits in [min, max]
    cts = _cts(spark, [
        (["p1"], ["p1"], None),                                  # pos 0
        (["p1", "p2", "p3", "p4", "p5"], ["p5"], None),          # pos 4
        (["p1", "p2", "p3", "p4", "p5"], ["p3"], None),          # pos 2
    ])
    assert _accepted(cts, InteractionPosition(1, 3)) == {"r2"}
    # missing bound = unbounded (documented divergence from the
    # reference's Int.MaxValue min default, Selector.scala:50)
    assert _accepted(cts, InteractionPosition(None, 3)) == {"r0", "r2"}
    # a click on an item absent from the ranking is vacuous accept
    cts2 = _cts(spark, [(["p1"], ["p9"], None)])
    assert _accepted(cts2, InteractionPosition(1, 3)) == {"r0"}


def test_field_selector(spark):
    # SelectorTest.scala:35-41
    cts = _cts(spark, [
        (["p1"], ["p1"], {"foo": ["bar"]}),
        (["p1", "p2", "p3"], ["p1"], None),
    ])
    assert _accepted(cts, FieldSelector("foo", "bar")) == {"r0"}


def test_and_or_not_selectors(spark):
    # SelectorTest.scala:43-61 (the two-same-name StringFields of the
    # reference's ct1 encode here as one two-element list value)
    cts = _cts(spark, [
        (["p1"], ["p1"], {"foo": ["bar", "baz"]}),   # r0
        (["p1"], ["p1"], {"foo": ["bar"]}),          # r1
        (["p1"], ["p1"], {"foo": ["qux"]}),          # r2
    ])
    a = And((FieldSelector("foo", "bar"), FieldSelector("foo", "baz")))
    assert _accepted(cts, a) == {"r0"}
    o = Or((FieldSelector("foo", "bar"), FieldSelector("foo", "baz")))
    assert _accepted(cts, o) == {"r0", "r1"}
    assert _accepted(cts, Not(o)) == {"r2"}
    assert _accepted(cts, Accept(False)) == set()


def test_sample_selector_deterministic(spark):
    cts = _cts(spark, [([f"p{i}"], [f"p{i}"], None) for i in range(40)])
    got1 = _accepted(cts, Sample(0.5))
    got2 = _accepted(cts, Sample(0.5))
    assert got1 == got2                      # replay-stable
    assert 0 < len(got1) < 40                # actually samples
    assert _accepted(cts, Sample(1.0)) == {f"r{i}" for i in range(40)}
    assert _accepted(cts, Sample(0.0)) == set()


def test_selector_yaml_decode():
    # SelectorYamlTest.scala:18-97, via the same try-in-order chain
    def sel(y):
        return parse_selector(yaml.safe_load(y))

    assert parse_selector(None) == Accept()   # no selector key = accept
    assert sel("rankingField: foo\nvalue: bar") == FieldSelector("foo", "bar")
    assert sel("accept: true") == Accept(True)
    assert sel("not:\n  accept: true") == Not(Accept(True))
    assert sel("ratio: 0.5") == Sample(0.5)
    assert sel(
        "and:\n  - ratio: 0.5\n  - rankingField: foo\n    value: bar"
    ) == And((Sample(0.5), FieldSelector("foo", "bar")))
    assert sel("maxInteractionPosition: 10") == InteractionPosition(None, 10)
    assert sel("minItems: 10") == RankingLength(10, None)
    with pytest.raises(ValueError):
        sel("ratio: 1.5")                     # Selector.scala:79-82 ensure
    with pytest.raises(ValueError):
        parse_selector({"minItemz": 1})


def test_model_selectors_from_config():
    from metarank_spark.config import load_config

    cfg = load_config(
        "features:\n"
        "  - name: cnt\n    type: interaction_count\n"
        "    interaction: click\n    scope: item\n"
        "models:\n"
        "  xgboost:\n"
        "    type: lambdamart\n"
        "    selector:\n"
        "      rankingField: source\n"
        "      value: search\n"
        "  control:\n"
        "    type: noop\n"
    )
    sels = cfg.model_selectors()
    assert sels["xgboost"] == FieldSelector("source", "search")
    assert sels["control"] == Accept()        # fall back to accept-all


def _perm_frame(spark, a, b):
    """Two orderings of the same items → (position, new_position) rows:
    position = index in a, new_position = index in b."""
    bi = {x: i for i, x in enumerate(b)}
    return spark.createDataFrame(
        [("r1", i, bi[x]) for i, x in enumerate(a)],
        "ranking_id string, position int, new_position int",
    )


def test_kendall_correlation(spark):
    # KendallCorrelationTest.scala:8-18
    def k(a, b):
        return kendall_krr(_perm_frame(spark, a, b)).collect()[0]["krr"]

    assert k(["a", "b", "c"], ["a", "b", "c"]) == 1.0
    assert abs(k(["a", "b", "c", "d"], ["a", "c", "b", "d"]) - 0.666) < 0.01
    assert k(["a", "b", "c"], ["c", "b", "a"]) == -1.0
    # n < 2: undefined (commons-math NaN) → null
    assert k(["a"], ["a"]) is None


def _rank_request(spark, n):
    return spark.createDataFrame(
        [("r1", f"p{i}", i) for i in range(n)],
        "ranking_id string, item_id string, position int",
    )


def test_noop_rank_preserves_order(spark):
    # NoopRanker.scala:23-28: all scores 0.0, request order kept
    got = noop_rank(_rank_request(spark, 10)).collect()
    assert all(r["score"] == 0.0 for r in got)
    assert {(r["position"], r["new_position"]) for r in got} == {
        (i, i) for i in range(10)}


def test_shuffle_rank(spark):
    # ShuffleRankerTest.scala:20-31: same item set, different order;
    # plus our determinism contract and the noise bound
    req = _rank_request(spark, 100)
    got = shuffle_rank(req, max_position_change=2).collect()
    assert {r["item_id"] for r in got} == {f"p{i}" for i in range(100)}
    assert sorted(r["new_position"] for r in got) == list(range(100))
    assert any(r["new_position"] != r["position"] for r in got)
    # score = position + noise, noise in [-mpc, mpc)
    assert all(-2 <= r["score"] - r["position"] < 2 for r in got)
    again = shuffle_rank(req, max_position_change=2).collect()
    assert {(r["item_id"], r["new_position"]) for r in again} == {
        (r["item_id"], r["new_position"]) for r in got}
    other = shuffle_rank(req, max_position_change=2, seed=7).collect()
    assert {(r["item_id"], r["new_position"]) for r in other} != {
        (r["item_id"], r["new_position"]) for r in got}


def test_rerank_krr_end_to_end(spark):
    """Compose rerank-style output with kendall_krr: a full reversal of
    one ranking scores −1, an untouched one scores 1 (the per-request
    krr the reference logs, Ranker.scala:68-75)."""
    rows = [("rev", i, 4 - i) for i in range(5)] + [
        ("keep", i, i) for i in range(5)]
    df = spark.createDataFrame(
        rows, "ranking_id string, position int, new_position int")
    got = {r["ranking_id"]: r["krr"] for r in kendall_krr(df).collect()}
    assert got == {"rev": -1.0, "keep": 1.0}
