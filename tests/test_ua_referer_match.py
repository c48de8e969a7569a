"""Goldens for the query-layer feature types newly wired into the YAML
engine — expectations transcribed from the reference's own unit tests:

- UserAgentFeatureTest.scala:31-48 → platform onehot [0,1,0] from stored
  session state AND from the first ranking's own field
- RefererFeatureTest.scala:35-46   → google referer → medium 'search',
  CategoryValue index 1
- FieldMatchFeatureTest.scala:47-66 → item 'foobar' vs query 'foo' with
  3-gram Jaccard = 0.25
"""

from __future__ import annotations

import math

import pytest

from metarank_spark.config import load_config
from metarank_spark.engine import FeatureEngine, FieldMatch, Referer, UserAgent
from metarank_spark.events import events_df, item_event, ranking_event

T0 = 1_700_000_000_000
MSIE = "Mozilla/4.0 (compatible; MSIE 9.0; Windows NT 6.1)"


def run(spark, rows, features):
    df = FeatureEngine(features).ranking_values(events_df(spark, rows))
    return {(r["ranking_id"], r["position"]): r.asDict() for r in df.collect()}


def test_ua_platform_from_state_and_fallback(spark):
    """UserAgentFeatureTest: a desktop UA one-hots to [0,1,0] over
    (mobile, desktop, tablet) — both when read back from session state
    written by an earlier ranking AND when the first ranking parses its
    own field (value() fallback, UserAgentFeature.scala:55-66)."""
    feats = [UserAgent("ua_platform", "ua", mapper="platform")]
    # stored-state path: the query ranking carries NO ua field
    rows = [
        ranking_event("r0", ["p1"], T0, 1, user="u1", session="s1",
                      str_fields={"ua": [MSIE]}),
        ranking_event("r1", ["p1"], T0 + 1000, 2, user="u1", session="s1"),
    ]
    out = run(spark, rows, feats)
    assert out[("r1", 0)]["ua_platform"] == [0.0, 1.0, 0.0]
    # first-ranking fallback: no state, parse the request's own field
    assert out[("r0", 0)]["ua_platform"] == [0.0, 1.0, 0.0]


def test_ua_unknown_is_all_zero(spark):
    """Unknown UA family → None → all-zero onehot (the reference's
    OneHotEncoder.fromValues of an empty list)."""
    rows = [
        ranking_event("r1", ["p1"], T0, 1, user="u1", session="s1",
                      str_fields={"ua": ["weird-unknown-agent/1.0"]}),
    ]
    out = run(spark, rows, [UserAgent("ua_platform", "ua")])
    assert out[("r1", 0)]["ua_platform"] == [0.0, 0.0, 0.0]


def test_referer_category_golden(spark):
    """RefererFeatureTest: a google.com referer stores medium 'search';
    a later ranking of the same user reads CategoryValue index 1; a
    ranking with no stored state reads unknown = 0 (:111 getOrElse)."""
    feats = [Referer("ref_medium", "ref", scope="user")]
    rows = [
        ranking_event("r0", ["p1"], T0, 1, user="u1", session="s1",
                      str_fields={"ref": ["http://www.google.com"]}),
        ranking_event("r1", ["p1"], T0 + 1000, 2, user="u1", session="s1"),
        ranking_event("r2", ["p1"], T0 + 1000, 3, user="u2", session="s2"),
    ]
    out = run(spark, rows, feats)
    assert out[("r1", 0)]["ref_medium"] == 1.0  # search
    # r0 itself: nothing strictly before, no fallback → unknown
    assert out[("r0", 0)]["ref_medium"] == 0.0
    assert out[("r2", 0)]["ref_medium"] == 0.0


def test_field_match_ngram_golden(spark):
    """FieldMatchFeatureTest 'compute match score': item title 'foobar'
    (grams bar,foo,oba,oob) vs ranking query 'foo' → 1/4 = 0.25."""
    feats = [FieldMatch("title_match", "query", "title", method="ngram", n=3)]
    rows = [
        item_event("p1", T0, 1, str_fields={"title": ["foobar"]}),
        ranking_event("r1", ["p1"], T0 + 1000, 2, user="u1", session="s1",
                      str_fields={"query": ["foo"]}),
    ]
    out = run(spark, rows, feats)
    assert out[("r1", 0)]["title_match"] == pytest.approx(0.25)


def test_field_match_term_and_missing(spark):
    """term matcher: distinct-word Jaccard; no stored item field or no
    ranking query → NaN (missing MValue)."""
    feats = [FieldMatch("tm", "query", "title", method="term")]
    rows = [
        item_event("p1", T0, 1, str_fields={"title": ["foo bar"]}),
        item_event("p3", T0, 2, str_fields={"other": ["x"]}),
        ranking_event("r1", ["p1", "p2"], T0 + 1000, 3, user="u1",
                      session="s1", str_fields={"query": ["foo baz"]}),
        ranking_event("r2", ["p1"], T0 + 2000, 4, user="u1", session="s1"),
    ]
    out = run(spark, rows, feats)
    assert out[("r1", 0)]["tm"] == pytest.approx(1.0 / 3.0, abs=1e-6)
    assert math.isnan(out[("r1", 1)]["tm"])   # p2 never wrote the field
    assert math.isnan(out[("r2", 0)]["tm"])   # ranking has no query field


def test_field_match_bm25_with_dict(spark):
    """bm25 against a prebuilt TermFreq dict (BM25Matcher.scala:26-40):
    idf = ln(1 + (N - df + .5)/(df + .5)), tf-normalized with k1=1.2,
    b=0.75 — compared against a plain-Python evaluation."""
    dic = {"n_docs": 10, "avgdl": 4.0, "df": {"foo": 3, "bar": 1}}
    feats = [FieldMatch("bm", "query", "title", method="bm25", term_freq=dic)]
    rows = [
        item_event("p1", T0, 1, str_fields={"title": ["foo bar foo baz"]}),
        ranking_event("r1", ["p1"], T0 + 1000, 2, user="u1", session="s1",
                      str_fields={"query": ["foo bar"]}),
    ]
    out = run(spark, rows, feats)

    def bm25(tfs, dl):
        s = 0.0
        for t, tf in tfs.items():
            dfc = dic["df"].get(t, 0)
            idf = math.log(1.0 + (dic["n_docs"] - dfc + 0.5) / (dfc + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 4.0))
        return s

    expect = bm25({"foo": 2, "bar": 1}, 4)
    assert out[("r1", 0)]["bm"] == pytest.approx(expect, abs=1e-6)


def test_yaml_config_loads_query_layer_types(spark, tmp_path):
    """A reference-style config using type: ua / referer / field_match
    (doc/configuration/features/{user-session,text}.md snippets) loads
    and runs end-to-end through the engine."""
    import json

    tf = tmp_path / "term-freq.json"
    # the reference termfreq CLI artifact spelling (docs, termfreqs)
    tf.write_text(json.dumps({"docs": 10, "avgdl": 4.0, "termfreqs": {"foo": 3}}))
    cfg = load_config(f"""
features:
  - name: platform_feature
    type: ua
    source: "ranking.ua"
    field: "platform"
  - name: ref_medium
    type: referer
    source: ranking.ref
    scope: user
  - name: title_ngram
    type: field_match
    rankingField: ranking.query
    itemField: item.title
    method:
      type: ngram
      language: en
      n: 3
  - name: title_bm25
    type: field_match
    rankingField: ranking.query
    itemField: item.title
    method:
      type: bm25
      language: english
      termFreq: "{tf}"
""")
    assert [type(f).__name__ for f in cfg.features] == [
        "UserAgent", "Referer", "FieldMatch", "FieldMatch"
    ]
    assert cfg.features[3].term_freq == {"n_docs": 10, "avgdl": 4.0, "df": {"foo": 3}}
    rows = [
        # 'foo foobar': same trigram SET as 'foobar' (bar,foo,oba,oob) so
        # the ngram golden stays 0.25, while bm25 sees a whole-word 'foo'
        item_event("p1", T0, 1, str_fields={"title": ["foo foobar"]}),
        ranking_event("r1", ["p1"], T0 + 1000, 2, user="u1", session="s1",
                      str_fields={"ua": [MSIE], "query": ["foo"],
                                  "ref": ["http://www.google.com"]}),
        ranking_event("r2", ["p1"], T0 + 2000, 3, user="u1", session="s1",
                      str_fields={"query": ["foo"]}),
    ]
    out = run(spark, rows, cfg.features)
    assert out[("r2", 0)]["platform_feature"] == [0.0, 1.0, 0.0]
    assert out[("r2", 0)]["ref_medium"] == 1.0
    assert out[("r2", 0)]["title_ngram"] == pytest.approx(0.25)
    assert out[("r2", 0)]["title_bm25"] > 0.0
