"""User-Agent and Referer classification — deterministic, vectorized
pattern classifiers (the Spark analog of feature/UserAgentFeature.scala:
40-66 + ua/* and RefererFeature.scala:32-71, which wrap uap-java and
snowplow referer-parser).

Pure `F.when` chains over lowercase substring tests: JVM-side, SQL-
expressible, no per-row Python. Values and decision rules match the
reference's uap-derived taxonomies exactly — platform mobile|desktop|
tablet with the iOS-device / Android-'Mobile'-token split
(ua/PlatformField.scala:44-64); os ios|android|windows|osx|linux|chromeos
(OSField OSNames); browser safari|chrome|other|edge|firefox|opera|ie
(BrowserField browsers map); unknown families read as null (the
reference's None → all-zero onehot); referer medium
search|social|email|internal|unknown (RefererFeature.scala:32-37)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _has(c: Column, *subs: str) -> Column:
    out = F.lit(False)
    for s in subs:
        out = out | c.contains(s)
    return out


def _null() -> Column:
    return F.lit(None).cast("string")


# uap-derived desktop browser-family tokens (ua/PlatformField.scala
# desktop set, expressed as raw-UA substrings)
_DESKTOP_TOKENS = (
    "msie", "trident", "edg", "opr/", "opera", "firefox", "chrome",
    "chromium", "safari", "seamonkey", "yandex", "maxthon", "iron",
)


def ua_platform(ua: Column | str) -> Column:
    """ua/PlatformField.scala:44-64 decision order: iOS device family
    (iPad→tablet, iPhone→mobile), then Android split on the 'Mobile'
    UA token (present→mobile, absent→TABLET — real Android tablets),
    then the mobile/desktop browser-family sets; unknown → null
    (the reference returns None, encoded as the all-zero onehot)."""
    c = F.lower(F.col(ua) if isinstance(ua, str) else ua)
    return (
        F.when(c.contains("ipad"), "tablet")
        .when(_has(c, "iphone", "ipod"), "mobile")
        .when(c.contains("android") & c.contains("mobile"), "mobile")
        .when(c.contains("android"), "tablet")
        .when(
            _has(c, "opera mini", "opera mobi", "ucbrowser", "silk",
                 "blackberry", "iemobile", "windows phone"),
            "mobile",
        )
        .when(c.contains("tablet"), "tablet")
        .when(_has(c, *_DESKTOP_TOKENS), "desktop")
        .otherwise(_null())
    )


def ua_os(ua: Column | str) -> Column:
    """ua/OSField.scala OSNames map: ios|android|windows|osx|linux|chromeos;
    anything else (incl. Windows Phone, whose uap family is not in the
    map) reads as missing (null)."""
    c = F.lower(F.col(ua) if isinstance(ua, str) else ua)
    return (
        F.when(c.contains("android"), "android")
        .when(_has(c, "iphone", "ipad", "ipod"), "ios")
        .when(c.contains("cros"), "chromeos")
        .when(c.contains("windows phone"), _null())
        .when(c.contains("windows"), "windows")
        .when(_has(c, "mac os x", "macintosh"), "osx")
        .when(c.contains("linux"), "linux")
        .otherwise(_null())
    )


def ua_browser(ua: Column | str) -> Column:
    """ua/BrowserField.scala browsers map: safari|chrome|other|edge|
    firefox|opera|ie. In-app browsers (Instagram/Facebook/Samsung
    Internet) map to 'other' like the reference; unknown → null."""
    c = F.lower(F.col(ua) if isinstance(ua, str) else ua)
    return (
        F.when(_has(c, "edg/", "edga/", "edgios/", "edge"), "edge")
        .when(_has(c, "opr/", "opera"), "opera")
        .when(_has(c, "samsungbrowser", "instagram", "fbav", "fban"), "other")
        .when(_has(c, "msie", "trident"), "ie")
        .when(_has(c, "firefox", "fxios"), "firefox")
        .when(_has(c, "chrome", "crios", "chromium"), "chrome")
        .when(c.contains("safari"), "safari")
        .otherwise(_null())
    )


_KNOWN_BOTS = ("apache-httpclient", "googlebot", "adsbot-google", "ahrefsbot",
               "bingpreview", "slurp")


def ua_is_bot(ua: Column | str) -> Column:
    """ua/BotField.scala: family ends with bot/crawler/spider, or a known
    bot name (knownBots + the Crawler-Detect list the reference bundles —
    here the head of that public list as substrings)."""
    c = F.lower(F.col(ua) if isinstance(ua, str) else ua)
    return _has(c, "bot", "crawler", "spider", *_KNOWN_BOTS)


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


# One-hot taxonomies (the UAField possibleValues of each mapper). Note on
# 'os': the reference's OSField.possibleValues returns the uap FAMILY
# names ("iOS", "Mac OS X", ...) while its stored values are the mapped
# lowercase names — a mismatch that makes the reference's os one-hot
# unable to match its own writes; we encode over the stored (mapped)
# values instead (ua/OSField.scala:8-23).
UA_VALUES = {
    "platform": ("mobile", "desktop", "tablet"),   # PlatformField.scala:42
    "os": ("ios", "android", "windows", "osx", "linux", "chromeos"),
    "browser": ("safari", "chrome", "other", "edge", "firefox", "opera", "ie"),
    "bot": ("bot",),                               # BotField.scala:25
}

# RefererFeature.scala:50-57 possibleValues index map (CategoryValue)
REFERER_MEDIUM_INDEX = {
    "unknown": 0, "search": 1, "internal": 2, "social": 3, "email": 4,
    "paid": 5,
}


def ua_category(ua: Column | str, mapper: str) -> Column:
    """Dispatch a UA string to its ``mapper`` taxonomy category (the
    UAField.value call of UserAgentFeature.parse); unknown → null."""
    if mapper == "platform":
        return ua_platform(ua)
    if mapper == "os":
        return ua_os(ua)
    if mapper == "browser":
        return ua_browser(ua)
    if mapper == "bot":
        return F.when(ua_is_bot(ua), F.lit("bot")).otherwise(_null())
    raise ValueError(f"ua field must be platform|os|browser|bot, got {mapper!r}")


def referer_medium_index(medium: Column) -> Column:
    """Stored medium string → CategoryValue index
    (RefererFeature.value :96-111; missing state reads as unknown=0)."""
    out = F.lit(None).cast("double")
    expr = F.when(F.lit(False), out)
    for name, idx in REFERER_MEDIUM_INDEX.items():
        expr = expr.when(medium == name, float(idx))
    return F.coalesce(expr, F.lit(0.0))
