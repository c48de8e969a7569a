"""Tests for the coverage-widening operators: ua/referer classifiers,
validation checks, splits, export, table IO, autofeature."""

from __future__ import annotations

from pyspark.sql import functions as F

from metarank_spark.autofeature import suggest_features
from metarank_spark.engine import FeatureEngine, InteractionCount
from metarank_spark.events import events_df, interaction_event, item_event, ranking_event
from metarank_spark.functions.ua import (
    referer_medium,
    ua_browser,
    ua_is_bot,
    ua_os,
    ua_platform,
)
from metarank_spark.operators.clickthrough import training_matrix
from metarank_spark.operators.export import to_csv_matrix, to_libsvm
from metarank_spark.operators.splits import (
    split_field,
    split_hold_last,
    split_random,
    split_time,
)
from metarank_spark.sources.tables import (
    read_events_table,
    write_events_table,
)
from metarank_spark.validate import validate_events

T0 = 1_700_000_000_000

CHROME_WIN = "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0 Safari/537.36"
SAFARI_IPHONE = "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.0 Mobile/15E148 Safari/604.1"
GOOGLEBOT = "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)"


def test_ua_classifiers(spark):
    df = spark.createDataFrame(
        [(CHROME_WIN,), (SAFARI_IPHONE,), (GOOGLEBOT,)], ["ua"]
    ).select(
        ua_platform("ua").alias("p"), ua_os("ua").alias("o"),
        ua_browser("ua").alias("b"), ua_is_bot("ua").alias("bot"),
    )
    rows = df.collect()
    assert (rows[0]["p"], rows[0]["o"], rows[0]["b"], rows[0]["bot"]) == (
        "desktop", "windows", "chrome", False)
    assert (rows[1]["p"], rows[1]["o"], rows[1]["b"]) == ("mobile", "ios", "safari")
    assert rows[2]["bot"] is True


def test_referer_medium(spark):
    df = spark.createDataFrame(
        [("https://www.google.com/search?q=x",), ("https://t.co/abc",),
         ("https://myshop.com/page",), ("",)], ["r"]
    ).select(referer_medium("r", own_host="myshop.com").alias("m"))
    assert [r["m"] for r in df.collect()] == ["search", "social", "internal", "unknown"]


def _fixture_events(spark):
    rows = [
        item_event("p1", T0, 1, str_fields={"color": ["red"]}, num_fields={"price": 5.0}),
        ranking_event("r1", ["p1", "p2"], T0 + 100, 2, user="u1", session="s1"),
        interaction_event("p1", "click", T0 + 200, 3, user="u1", session="s1", ranking="r1"),
        ranking_event("r2", ["p1"], T0 + 300, 4, user="u2", session="s2"),
        interaction_event("p1", "click", T0 + 400, 5, user="u2", session="s2", ranking="r2"),
    ]
    return events_df(spark, rows)


def test_validate_all_green(spark):
    report = validate_events(_fixture_events(spark), interaction_types={"click"})
    assert all(r["ok"] for r in report), report


def test_validate_catches_orphans_and_disorder(spark):
    rows = [
        ranking_event("r1", ["p1"], T0 + 100, 2, user="u1"),
        interaction_event("p1", "click", T0, 3, user="u1", ranking="missing"),
    ]
    report = {r["check"]: r for r in validate_events(events_df(spark, rows))}
    assert not report["interaction_keys"]["ok"]
    assert not report["event_order"]["ok"]


def test_splits(spark):
    ev = _fixture_events(spark)
    tm = training_matrix(ev, FeatureEngine([InteractionCount("clicks", "click")]))
    r = split_random(tm, 0.8)
    assert set(x["split"] for x in r.collect()) <= {"train", "test"}
    t = split_time(tm, 0.5)
    assert t.filter("split = 'train'").count() >= 1
    h = split_hold_last(tm)
    per_user_test = h.filter("split = 'test'").groupBy("user_id").count().collect()
    assert all(x["count"] >= 1 for x in per_user_test)
    f = split_field(tm, F.col("item_id"), "p1")
    assert f.filter("split = 'test'").count() == tm.filter("item_id = 'p1'").count()


def test_export_libsvm_and_csv(spark):
    ev = _fixture_events(spark)
    tm = training_matrix(ev, FeatureEngine([InteractionCount("clicks", "click")]))
    lines = to_libsvm(tm, ["clicks"]).collect()
    assert all("qid:" in r["value"] for r in lines)
    # r2/p1 has 1 prior click → feature 1:1.0 present; label 1.0
    r2 = [r["value"] for r in lines if r["ranking_id"] == "r2"][0]
    assert r2.startswith("1.0 qid:") and "1:1.0" in r2
    csv = to_csv_matrix(tm, ["clicks"])
    assert csv.columns == ["label", "f0"]
    assert csv.count() == tm.count()


def test_table_roundtrip_layout(spark, tmp_path):
    ev = _fixture_events(spark)
    target = str(tmp_path / "events_tbl")
    write_events_table(ev, target, buckets=4)
    back = read_events_table(spark, target)
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)


def test_autofeature_suggests(spark):
    specs = suggest_features(_fixture_events(spark))
    types = {s["type"] for s in specs}
    assert {"interaction_count", "window_count", "number", "item_age"} <= types
    names = [s["name"] for s in specs]
    assert len(names) == len(set(names))


def test_ua_reference_taxonomy(spark):
    """Pins the uap-derived decision rules (ua/PlatformField.scala:44-64,
    OSField OSNames, BrowserField browsers map): Android-without-'Mobile'
    is a TABLET, Mac OS is 'osx', ChromeOS and IE are distinct values,
    unknown families read as null."""
    from metarank_spark.functions.ua import ua_browser, ua_os, ua_platform

    cases = [
        # (ua, platform, os, browser)
        ("Mozilla/5.0 (Linux; Android 12; SM-T870) AppleWebKit/537.36 "
         "(KHTML, like Gecko) Chrome/100.0 Safari/537.36",
         "tablet", "android", "chrome"),
        ("Mozilla/5.0 (Linux; Android 12; Pixel 6) AppleWebKit/537.36 "
         "(KHTML, like Gecko) Chrome/100.0 Mobile Safari/537.36",
         "mobile", "android", "chrome"),
        ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
         "(KHTML, like Gecko) Version/16.1 Safari/605.1.15",
         "desktop", "osx", "safari"),
        ("Mozilla/5.0 (X11; CrOS x86_64 14541.0.0) AppleWebKit/537.36 "
         "(KHTML, like Gecko) Chrome/110.0 Safari/537.36",
         "desktop", "chromeos", "chrome"),
        ("Mozilla/5.0 (Windows NT 10.0; Trident/7.0; rv:11.0) like Gecko",
         "desktop", "windows", "ie"),
        ("Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, like Gecko) "
         "Chrome/100.0 Safari/537.36 Edg/100.0",
         "desktop", "windows", "edge"),
        ("SomeUnknownClient/1.0", None, None, None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], ["ua"]).select(
        ua_platform("ua").alias("p"), ua_os("ua").alias("o"), ua_browser("ua").alias("b")
    )
    got = [(r["p"], r["o"], r["b"]) for r in df.collect()]
    assert got == [(p, o, b) for _, p, o, b in cases]


def test_feature_width_static():
    from metarank_spark.engine import (
        InteractionCount,
        Rate,
        StringEncode,
        Vector,
        WindowCount,
    )
    from metarank_spark.operators.export import feature_width

    feats = [
        InteractionCount("c", "click"),               # 1
        WindowCount("w", "click", (1, 7, 30)),        # 3
        Rate("r", "click", "view", (7, 14)),          # 2
        StringEncode("s", "f", ("a", "b", "c"), encode="onehot"),  # 3
        StringEncode("i", "f", ("a", "b"), encode="index"),        # 1
        Vector("v", "f", reducers=("min", "max")),    # 2
    ]
    assert feature_width(feats) == 12
