"""User-Agent and Referer classification — deterministic, vectorized
pattern classifiers (the Spark analog of feature/UserAgentFeature.scala:
40-66 + ua/* and RefererFeature.scala:32-71, which wrap uap-java and
snowplow referer-parser).

Pure `F.when` chains over lowercase substring tests: JVM-side, SQL-
expressible, no per-row Python. The taxonomies mirror the reference's
one-hot dimensions (ua/PlatformField etc.: mobile|desktop|tablet;
browser: chrome|firefox|safari|edge|opera; os: windows|macos|linux|
android|ios; referer medium: search|social|email|internal|unknown)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _has(c: Column, *subs: str) -> Column:
    out = F.lit(False)
    for s in subs:
        out = out | c.contains(s)
    return out


def ua_platform(ua: Column | str) -> Column:
    c = F.lower(F.col(ua) if isinstance(ua, str) else ua)
    return (
        F.when(_has(c, "ipad", "tablet"), "tablet")
        .when(_has(c, "mobile", "iphone", "android"), "mobile")
        .otherwise("desktop")
    )


def ua_os(ua: Column | str) -> Column:
    c = F.lower(F.col(ua) if isinstance(ua, str) else ua)
    return (
        F.when(_has(c, "android"), "android")
        .when(_has(c, "iphone", "ipad", "ios"), "ios")
        .when(_has(c, "windows"), "windows")
        .when(_has(c, "mac os", "macintosh"), "macos")
        .when(_has(c, "linux"), "linux")
        .otherwise("other")
    )


def ua_browser(ua: Column | str) -> Column:
    c = F.lower(F.col(ua) if isinstance(ua, str) else ua)
    return (
        F.when(_has(c, "edg/", "edge"), "edge")
        .when(_has(c, "opr/", "opera"), "opera")
        .when(_has(c, "firefox"), "firefox")
        .when(_has(c, "chrome"), "chrome")
        .when(_has(c, "safari"), "safari")
        .otherwise("other")
    )


def ua_is_bot(ua: Column | str) -> Column:
    c = F.lower(F.col(ua) if isinstance(ua, str) else ua)
    return _has(c, "bot", "crawler", "spider", "slurp")


SEARCH_HOSTS = ("google.", "bing.", "duckduckgo.", "yandex.", "baidu.")
SOCIAL_HOSTS = ("facebook.", "twitter.", "t.co", "linkedin.", "reddit.", "instagram.")


def referer_medium(referer: Column | str, own_host: str | None = None) -> Column:
    """Referer → medium category (RefererFeature.scala:32-37 index map:
    unknown|search|internal|social|email)."""
    c = F.lower(F.col(referer) if isinstance(referer, str) else referer)
    host = F.regexp_extract(c, r"^(?:[a-z]+://)?([^/:?#]+)", 1)
    med = (
        F.when(c.isNull() | (c == ""), "unknown")
        .when(_has(host, *SEARCH_HOSTS), "search")
        .when(_has(host, *SOCIAL_HOSTS), "social")
        .when(_has(host, "mail.", "outlook."), "email")
    )
    if own_host:
        med = med.when(host == own_host.lower(), "internal")
    return med.otherwise("unknown")
