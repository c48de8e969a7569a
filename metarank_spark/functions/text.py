"""Text analysis for training-data pipelines — tokenization, language ID,
quality scoring, fingerprinting.

Everything here is pure Spark higher-order functions (JVM, no Python on the
data path) and is deliberately *SQL-expressible* so every operator has a
DuckDB oracle. Token ids come from a rolling polynomial hash — deterministic,
engine-independent, and cheap:

    id(word) = fold chars: (acc*31 + ascii(c)) mod 1_000_003

The tokenized-sequences table is the driver's input_hint shape:
(doc_id string, tokens array<int>, n_tok int, source string); tokens are a
passthrough payload column downstream (byte-equal in outputs).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

HASH_MOD = 1_000_003
FP_MULT = 131
STOPWORDS = ("the", "a", "of", "and", "to")


def words_expr(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda w: w != "")


def token_id_expr(word: Column) -> Column:
    """Rolling hash of one word (vectorized, JVM-side)."""
    return F.aggregate(
        F.split(word, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % HASH_MOD,
    )


def token_ids_expr(text: Column | str) -> Column:
    """text → array<int> token ids.

    The per-character fold inside makes this the most expensive
    expression in the repo — never reference it twice in one projection
    (e.g. ``toks`` and ``size(toks)``): stage it as a column in a lower
    select and derive from the column (an expensive alias referenced
    more than once blocks CollapseProject, so the fold runs once)."""
    return token_ids_from_words(words_expr(text))


def token_ids_from_words(words: Column) -> Column:
    """word-array column → array<int> token ids (see token_ids_expr)."""
    return F.transform(words, lambda w: token_id_expr(w).cast("int"))


def tokenized_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The input_hint table (doc_id, tokens:array<int32>, n_tok:int32,
    source), derived deterministically from the documents table.

    Small-scan fan-out: the tokenizer is per-row HOF compute, so if the
    parquet scan plans fewer partitions than cores (fixture-sized single
    files) the raw rows are spread BEFORE the projection — otherwise the
    whole tokenize chain runs in one task. At warehouse scale the scan is
    already wide (maxPartitionBytes) and this branch never fires, so no
    extra shuffle is added where it would hurt."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    # two-step projection: the word split is staged as a column, tokens
    # fold from it ONCE (expensive alias referenced twice blocks
    # CollapseProject), and n_tok = size of the WORD array (transform
    # preserves length) — so a caller's n_tok filter pushes down to the
    # cheap split, never inlining the per-character tokenize fold into
    # the predicate (which would evaluate it twice per scanned row).
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        words_expr("text").alias("__w"),
        F.col("source"),
    ).select(
        "doc_id",
        token_ids_from_words(F.col("__w")).alias("tokens"),
        F.size("__w").cast("int").alias("n_tok"),
        "source",
    )


def fingerprint_expr(tokens: Column) -> Column:
    """Rolling-hash document fingerprint over the token id sequence:
    fold: (acc*131 + t) mod 1_000_003 — order-sensitive, so it
    distinguishes permutations exact-dedup by set would merge."""
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * FP_MULT + t) % HASH_MOD,
    )


def stopword_ratio_expr(text: Column | str, words: Column | None = None) -> Column:
    w = words if words is not None else words_expr(text)
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    hits = F.size(F.filter(w, lambda x: F.array_contains(stops, x)))
    return hits / F.nullif(F.size(w).cast("double"), F.lit(0.0))


def quality_features(
    text: Column | str, words: Column | None = None
) -> dict[str, Column]:
    """Heuristic quality signals: length, mean word length, stopword ratio,
    type-token ratio; composite score = weighted sum (rounded 6dp so both
    engines agree bitwise). Pass a staged ``words`` column in hot paths so
    the split isn't re-evaluated per signal (see token_ids_expr note)."""
    c = F.col(text) if isinstance(text, str) else text
    w = words if words is not None else words_expr(c)
    n_words = F.size(w)
    n_chars = F.length(c)
    mean_wlen = F.round(
        F.aggregate(w, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
        / F.nullif(n_words.cast("double"), F.lit(0.0)),
        6,
    )
    ttr = F.round(
        F.size(F.array_distinct(w)) / F.nullif(n_words.cast("double"), F.lit(0.0)), 6
    )
    stop = F.round(stopword_ratio_expr(c, words=w), 6)
    score = F.round(
        F.least(n_words.cast("double") / 100.0, F.lit(1.0)) * 0.4
        + ttr * 0.4
        + (F.lit(1.0) - stop) * 0.2,
        6,
    )
    return {
        "n_words": n_words.cast("long"),
        "n_chars": n_chars.cast("long"),
        "mean_word_len": mean_wlen,
        "type_token_ratio": ttr,
        "stopword_ratio": stop,
        "quality_score": score,
    }


def term_df(docs: DataFrame, text: str = "text") -> DataFrame:
    """Per-term document frequency as a DataFrame (term, df) — one
    explode+groupBy pass. This is the scale-safe TermFreq artifact: at a
    100 TB corpus the vocabulary is 10^7-10^8 terms, so it stays a table
    (write it out / broadcast-join the query-term slice) rather than a
    driver-side dict."""
    w = words_expr(text)
    return (
        docs.select(F.explode(F.array_distinct(w)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def corpus_stats(docs: DataFrame, text: str = "text") -> DataFrame:
    """Single-row (n_docs, avgdl) corpus statistics for BM25."""
    w = words_expr(text)
    return docs.select(F.size(w).alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )


def build_term_freq(
    docs: DataFrame, text: str = "text", terms: list[str] | None = None
) -> dict:
    """TermFreqDic builder (matcher/BM25Matcher.scala:68-85 + the
    `termfreq` CLI): corpus document frequencies per term, doc count, and
    average doc length — the broadcastable BM25 dictionary.

    Pass ``terms`` (the query vocabulary) so only those rows are ever
    collected to the driver — the full-vocab collect is opt-in
    (terms=None) and only sane for fixture-scale corpora. The
    distributed artifact is term_df()/corpus_stats(); this dict is the
    final driver-side hand-off for a known, small term set."""
    stats = corpus_stats(docs, text).collect()[0]
    d = term_df(docs, text)
    if terms is not None:
        d = d.filter(F.col("term").isin(list(terms)))
    dfs = d.collect()
    return {
        "n_docs": stats["n_docs"],
        "avgdl": stats["avgdl"],
        "df": {r["term"]: r["df"] for r in dfs},
    }


def bm25_score_expr(text: Column | str, terms: list[str], dic: dict,
                    k1: float = 1.2, b: float = 0.75) -> Column:
    """BM25 against a prebuilt TermFreq dict (BM25Matcher.scala:26-40:
    IDF at :34, tf normalization at :35)."""
    w = words_expr(text)
    dl = F.size(w).cast("double")
    score = F.lit(0.0)
    import math as _math

    for t in terms:
        dfc = dic["df"].get(t, 0)
        idf = _math.log(1.0 + (dic["n_docs"] - dfc + 0.5) / (dfc + 0.5))
        tf = F.size(F.filter(w, lambda x: x == F.lit(t))).cast("double")
        score = score + F.lit(idf) * (
            tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / F.lit(float(dic["avgdl"]))))
        )
    return score


def char_ngrams_expr(text: Column | str, n: int = 3) -> Column:
    """Sorted distinct character n-grams of each whitespace word —
    field_match ngram tokenizer (matcher/NgramMatcher.scala:10-28:
    per-term sliding substrings of length n, then unique+sort; words
    shorter than n contribute nothing)."""
    words = words_expr(text)
    grams = F.flatten(
        F.transform(
            words,
            lambda w: F.when(
                F.length(w) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.length(w) - (n - 1)),
                    lambda i: w.substr(i, F.lit(n)),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
    )
    return F.array_sort(F.array_distinct(grams))


def ngram_match_expr(text: Column | str, query: str, n: int = 3) -> Column:
    """field_match/ngram score: Jaccard over the char-n-gram sets of the
    stored field and the query (FieldMatcher.score — |∩| / |∪|;
    FieldMatchFeature.scala:41-54 tokenizes both sides with the same
    matcher). Rounded 6dp so Spark and DuckDB agree bitwise."""
    qgrams = sorted(
        {w[j : j + n] for w in query.split() for j in range(len(w) - n + 1)}
    )
    d = char_ngrams_expr(text, n)
    qarr = F.array(*[F.lit(g) for g in qgrams])
    return F.round(
        F.size(F.array_intersect(d, qarr))
        / F.nullif(F.size(F.array_union(d, qarr)).cast("double"), F.lit(0.0)),
        6,
    )


# deterministic two-profile-or-more language ID (n-gram/stopword heuristic).
LANG_PROFILES = {
    "en": ("the", "a", "and"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
}


def langid_expr(text: Column | str, words: Column | None = None) -> Column:
    """argmax of distinct profile-word hits; ties break in en>es>de order
    (a deterministic classifier both engines compute identically)."""
    w = F.array_distinct(words if words is not None else words_expr(text))
    scores = {}
    for lang, prof in LANG_PROFILES.items():
        arr = F.array(*[F.lit(p) for p in prof])
        scores[lang] = F.size(F.array_intersect(w, arr))
    return (
        F.when(
            (scores["en"] >= scores["es"]) & (scores["en"] >= scores["de"]), F.lit("en")
        )
        .when(scores["es"] >= scores["de"], F.lit("es"))
        .otherwise(F.lit("de"))
    )


# ---- column-vs-column field_match scorers (engine path) ----
# The oracle queries above score against a FIXED query string (grams
# precomputed driver-side); the YAML engine's field_match scores the
# RANKING's own query field (a per-row column) against the item's stored
# field, so both sides tokenize in-expression with the same matcher
# (FieldMatchFeature.scala:41-54).

def term_match_cols(stored: Column, query: Column) -> Column:
    """matcher/TermMatcher: Jaccard over the distinct word sets."""
    a = F.array_distinct(words_expr(stored))
    b = F.array_distinct(words_expr(query))
    return F.round(
        F.size(F.array_intersect(a, b))
        / F.nullif(F.size(F.array_union(a, b)).cast("double"), F.lit(0.0)),
        6,
    )


def ngram_match_cols(stored: Column, query: Column, n: int = 3) -> Column:
    """matcher/NgramMatcher.scala:10-28: Jaccard over char-n-gram sets of
    both sides."""
    a = char_ngrams_expr(stored, n)
    b = char_ngrams_expr(query, n)
    return F.round(
        F.size(F.array_intersect(a, b))
        / F.nullif(F.size(F.array_union(a, b)).cast("double"), F.lit(0.0)),
        6,
    )


def bm25_score_cols(stored: Column, query: Column, dic: dict,
                    k1: float = 1.2, b: float = 0.75) -> Column:
    """BM25 of a per-row query column against the stored field, using a
    prebuilt TermFreq dict (BM25Matcher.scala:26-40; dict format =
    build_term_freq / the reference's termfreq CLI artifact). The df map
    becomes a map literal — fine for the bounded dictionaries the CLI
    emits; for an unbounded vocabulary join the term_df table instead."""
    items = [x for kv in dic["df"].items() for x in (F.lit(kv[0]), F.lit(int(kv[1])))]
    dmap = F.create_map(*items) if items else F.create_map().cast("map<string,int>")
    n_docs = float(dic["n_docs"])
    avgdl = float(dic["avgdl"])
    wq = F.array_distinct(words_expr(query))
    ws = words_expr(stored)
    dl = F.size(ws).cast("double")

    def one(acc, t):
        dfc = F.coalesce(F.element_at(dmap, t), F.lit(0)).cast("double")
        idf = F.log(F.lit(1.0) + (F.lit(n_docs) - dfc + 0.5) / (dfc + 0.5))
        tf = F.size(F.filter(ws, lambda x: x == t)).cast("double")
        return acc + idf * (
            tf * (k1 + 1)
            / (tf + k1 * (1 - b + b * dl / F.lit(avgdl)))
        )

    return F.round(F.aggregate(wq, F.lit(0.0), one), 6)
