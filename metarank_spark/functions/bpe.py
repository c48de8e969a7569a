"""Byte-pair-encoding vocabulary induction over a document corpus.

A training-data pipeline tokenizes with a LEARNED subword vocabulary;
this module trains one (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") and encodes with it —
Spark-shaped:

- ONE corpus scan builds the ``(word, count)`` vocabulary table; every
  merge iteration then works on the vocab table only, so training cost
  is independent of corpus size (a 100 TB corpus and its 10^7-row vocab
  train identically after the scan).
- Each iteration is: explode adjacent symbol pairs weighted by word
  count → one hash aggregate → top-1 pair to the driver (two longs) →
  apply the merge to the symbol arrays with a per-row HOF fold. The
  vocab frame is localCheckpointed per iteration: the convergence read
  doubles as the materialization barrier and truncates the iterative
  lineage (same discipline as functions/dedup.connected_components).
- Encoding joins documents to the encoded vocabulary (words are encoded
  ONCE each, not once per occurrence) — a broadcast join for any real
  vocab/corpus ratio.

Determinism: ties on pair frequency break on (left, right) symbol id
ascending, so the merge table is bit-stable across partitionings and
engines — pinned by an exact equality test against a pure-Python
reference implementation (tests/test_bpe.py).

Symbol ids: initial symbols are character code points; merge i creates
symbol ``MERGE_BASE + i``, so ids never collide with code points and the
merge table alone reconstructs the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metarank_spark.functions.text import words_expr

# 0x110000 = U+10FFFF + 1: strictly above EVERY code point. (The prior
# 1_000_000 sat below planes 15-16, so merge ids could collide with
# private-use code points and break the "merge table alone reconstructs
# the vocabulary" invariant — r5 ADVICE.)
MERGE_BASE = 0x110000


def word_counts(docs: DataFrame, text: str = "text") -> DataFrame:
    """The one corpus-scale pass: (word, count) vocabulary table."""
    return (
        docs.select(F.explode(words_expr(text)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _to_symbols(vocab: DataFrame) -> DataFrame:
    """word → initial symbol array (character code points)."""
    return vocab.select(
        "word",
        "cnt",
        F.transform(F.split("word", ""), lambda ch: F.ascii(ch).cast("long")).alias(
            "syms"
        ),
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    n = F.size("syms")
    pairs = F.zip_with(
        F.slice("syms", 1, n - 1),
        F.slice("syms", 2, n - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        syms.filter(n >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("freq"))
    )


def _merge_expr(syms, left: int, right: int, new_id: int):
    """Replace every non-overlapping (left,right) occurrence left-to-right
    with new_id — one aggregate fold per row, no Python."""
    emptied = F.array().cast("array<long>")
    step = lambda acc, s: F.when(  # noqa: E731
        (acc["prev"] == left) & (s == right),
        # consume the pair: drop the pending `prev`, emit merged symbol,
        # nothing pending (prevents overlapping re-merge aaa -> only one)
        F.struct(
            F.concat(acc["out"], F.array(F.lit(new_id).cast("long"))).alias("out"),
            F.lit(None).cast("long").alias("prev"),
        ),
    ).otherwise(
        F.struct(
            F.when(acc["prev"].isNull(), acc["out"])
            .otherwise(F.concat(acc["out"], F.array(acc["prev"])))
            .alias("out"),
            s.alias("prev"),
        )
    )
    fin = lambda acc: F.when(  # noqa: E731
        acc["prev"].isNull(), acc["out"]
    ).otherwise(F.concat(acc["out"], F.array(acc["prev"])))
    init = F.struct(
        emptied.alias("out"), F.lit(None).cast("long").alias("prev")
    )
    return F.aggregate(syms, init, step, fin)


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text: str = "text",
    min_freq: int = 2,
) -> list[tuple[int, int, int, int]]:
    """Learn ``n_merges`` BPE merges; returns
    ``[(rank, left, right, new_id), ...]`` (new_id = MERGE_BASE + rank).
    Stops early when no pair reaches ``min_freq``. Driver traffic per
    iteration is ONE row (the argmax pair); the corpus is scanned once,
    every iteration is vocab-table-sized."""
    spark = docs.sparkSession
    wc = word_counts(docs, text).localCheckpoint(eager=True)
    # size the iteration parallelism to the VOCAB, not the corpus: the
    # merge loop runs dozens of tiny jobs over the vocab table, and at
    # corpus-derived partition counts (shuffle.partitions) scheduling
    # overhead dominates — measured 1.7x SLOWER at 32 threads than 8 on
    # a 431-word vocab. ~8k words per partition keeps small vocabs on
    # few tasks while a 10^7-row vocab still spreads over every core.
    n_vocab = wc.count()
    par = min(
        spark.sparkContext.defaultParallelism, max(1, n_vocab // 8192 + 1)
    )
    syms = _to_symbols(wc.repartition(par)).localCheckpoint(eager=True)
    merges: list[tuple[int, int, int, int]] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(syms)
            .orderBy(F.col("freq").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["freq"] < min_freq:
            break
        left, right = int(top[0]["l"]), int(top[0]["r"])
        new_id = MERGE_BASE + rank
        merges.append((rank, left, right, new_id))
        syms = syms.select(
            "word", "cnt", _merge_expr(F.col("syms"), left, right, new_id).alias("syms")
        ).localCheckpoint(eager=True)
    return merges


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[int, int, int, int]],
    text: str = "text",
    id_col: str = "doc_id",
    broadcast: bool = True,
) -> DataFrame:
    """Encode documents with a trained merge table:
    ``(doc_id, pieces array<long>, n_pieces)``.

    Each DISTINCT word is encoded once (apply merges in rank order over
    its code points — a chain of n_merges HOF folds over short arrays),
    then documents join their word sequence to the encoded vocabulary.
    The encoded-vocab side is broadcast by default: it is the corpus
    vocabulary, orders of magnitude smaller than the corpus. When the
    encoded vocab does NOT comfortably fit the driver/executors (10^8+
    distinct words, or long piece arrays), pass ``broadcast=False``: the
    hint is dropped and the join keys on ``word`` like any other
    shuffled join (AQE still converts it back to a broadcast at runtime
    when the built side measures small — fallback equality is pinned in
    test_bpe.py under autoBroadcastJoinThreshold=-1)."""
    words = docs.select(
        F.col(id_col),
        F.posexplode(words_expr(text)).alias("pos", "word"),
    )
    enc = words.select("word").distinct().select(
        "word",
        F.transform(F.split("word", ""), lambda ch: F.ascii(ch).cast("long")).alias(
            "syms"
        ),
    )
    for _, left, right, new_id in merges:
        enc = enc.select(
            "word", _merge_expr(F.col("syms"), left, right, new_id).alias("syms")
        )
        # n_merges chained folds over short arrays stay one codegen-free
        # Project chain; checkpoint every few steps to bound plan depth
        if (new_id - MERGE_BASE) % 16 == 15:
            enc = enc.localCheckpoint(eager=False)
    return (
        words.join(F.broadcast(enc) if broadcast else enc, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "syms"))
                    ),
                    lambda s: s["syms"],
                )
            ).alias("pieces")
        )
        .select(
            id_col,
            "pieces",
            F.size("pieces").cast("long").alias("n_pieces"),
        )
    )
