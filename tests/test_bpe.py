"""BPE vocabulary induction (functions/bpe.py): the distributed trainer
and encoder must match a pure-Python reference implementation of classic
BPE (Sennrich 2016 get_stats/merge loop) exactly — merge table and
per-document piece sequences — on real corpus data and on tie-heavy
synthetic fixtures."""

from __future__ import annotations

import os
from collections import Counter

from pyspark.sql import functions as F

from conftest import SF_SMALL
from metarank_spark.functions import bpe


def ref_train(word_counts: dict[str, int], n_merges: int, min_freq: int = 2):
    vocab = {w: [ord(c) for c in w] for w in word_counts}
    merges = []
    for rank in range(n_merges):
        freq: Counter = Counter()
        for w, syms in vocab.items():
            c = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                freq[(a, b)] += c
        if not freq:
            break
        (a, b), f = min(
            freq.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if f < min_freq:
            break
        new = bpe.MERGE_BASE + rank
        merges.append((rank, a, b, new))
        for w in vocab:
            s = vocab[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(new)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            vocab[w] = out
    return merges


def ref_encode_word(word: str, merges) -> list[int]:
    s = [ord(c) for c in word]
    for _, a, b, new in merges:
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(new)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


def _docs(spark, limit=150):
    return (
        spark.read.parquet(os.path.join(SF_SMALL, "documents.parquet"))
        .orderBy("doc_id")
        .limit(limit)
    )


def _ref_word_counts(rows):
    wc: Counter = Counter()
    for r in rows:
        for w in r["text"].split(" "):
            if w:
                wc[w] += 1
    return wc


def test_train_bpe_matches_reference(spark):
    docs = _docs(spark)
    got = bpe.train_bpe(docs, n_merges=30)
    exp = ref_train(_ref_word_counts(docs.collect()), 30)
    assert got == exp and len(got) == 30


def test_train_bpe_tie_break_and_early_stop(spark):
    # "ab" x3 vs "ba" x3: tie on freq 3 -> (a,b) wins on symbol order;
    # after two merges nothing reaches min_freq=2 except... verify vs ref
    rows = [(i, "ab ba ab ba ab ba", "s") for i in range(1)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = bpe.train_bpe(docs, n_merges=10)
    exp = ref_train(_ref_word_counts(docs.collect()), 10)
    assert got == exp
    assert len(got) < 10  # early stop: freq floor reached


def test_encode_bpe_matches_reference(spark):
    docs = _docs(spark, limit=60)
    merges = bpe.train_bpe(docs, n_merges=25)
    enc = {
        r["doc_id"]: (list(r["pieces"]), r["n_pieces"])
        for r in bpe.encode_bpe(docs, merges).collect()
    }
    for r in docs.collect():
        exp: list[int] = []
        for w in r["text"].split(" "):
            if w:
                exp.extend(ref_encode_word(w, merges))
        assert enc[r["doc_id"]] == (exp, len(exp)), r["doc_id"]
    # merged symbols actually appear in the encoding
    assert any(
        p >= bpe.MERGE_BASE for pieces, _ in enc.values() for p in pieces
    )


def test_encode_bpe_overlapping_runs(spark):
    # aaaa with merge (a,a): left-to-right non-overlapping -> [new, new]
    docs = spark.createDataFrame(
        [(1, "aaaa aaa", "s")], "doc_id long, text string, source string"
    )
    merges = bpe.train_bpe(docs, n_merges=1)
    a = ord("a")
    assert merges == [(0, a, a, bpe.MERGE_BASE)]
    (row,) = bpe.encode_bpe(docs, merges).collect()
    assert list(row["pieces"]) == [
        bpe.MERGE_BASE, bpe.MERGE_BASE, bpe.MERGE_BASE, a
    ]


def test_encode_vocab_join_is_broadcast(spark):
    docs = _docs(spark, limit=40)
    merges = bpe.train_bpe(docs, n_merges=5)
    plan = (
        bpe.encode_bpe(docs, merges)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_encode_bpe_no_broadcast_fallback(spark):
    """broadcast=False is the over-threshold-vocab escape hatch: the
    forced hint is gone, the plan survives autoBroadcastJoinThreshold=-1
    (no static broadcast possible at all), and the encoding is
    identical to the broadcast path."""
    docs = _docs(spark, limit=40)
    merges = bpe.train_bpe(docs, n_merges=5)
    want = {
        r["doc_id"]: list(r["pieces"])
        for r in bpe.encode_bpe(docs, merges).collect()
    }
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = bpe.encode_bpe(docs, merges, broadcast=False)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
        got = {r["doc_id"]: list(r["pieces"]) for r in q.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == want


# ---------- hypothesis: random corpora, distributed == reference ----------

from hypothesis import given, settings, strategies as st  # noqa: E402


@st.composite
def _corpora(draw):
    """Small adversarial corpora over a 3-letter alphabet: heavy ties,
    long runs (overlap handling), repeated words, single-char words."""
    n_docs = draw(st.integers(1, 6))
    word = st.text(alphabet="abc", min_size=1, max_size=6)
    docs = []
    for i in range(n_docs):
        words = draw(st.lists(word, min_size=1, max_size=8))
        docs.append((i, " ".join(words), "s"))
    n_merges = draw(st.integers(1, 8))
    return docs, n_merges


@settings(max_examples=10, deadline=None)
@given(_corpora())
def test_bpe_hypothesis_matches_reference(spark, case):
    rows, n_merges = case
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    got = bpe.train_bpe(docs, n_merges=n_merges)
    exp = ref_train(_ref_word_counts(docs.collect()), n_merges)
    assert got == exp
    enc = {
        r["doc_id"]: list(r["pieces"])
        for r in bpe.encode_bpe(docs, got).collect()
    }
    for i, text, _ in rows:
        expected = [p for w in text.split(" ") if w
                    for p in ref_encode_word(w, got)]
        assert enc[i] == expected, (i, text)


def test_bpe_unicode_codepoints(spark):
    """Spark's ascii() returns full unicode code points (not bytes), so
    non-ASCII corpora train and encode identically to the ord()-based
    reference — pinned here with accents + CJK."""
    docs = spark.createDataFrame(
        [(1, "éclair éclair über über 北京 北京", "s")],
        "doc_id long, text string, source string")
    merges = bpe.train_bpe(docs, n_merges=6)
    assert merges == ref_train(_ref_word_counts(docs.collect()), 6)
    (row,) = bpe.encode_bpe(docs, merges).collect()
    exp = [p for w in "éclair éclair über über 北京 北京".split(" ")
           for p in ref_encode_word(w, merges)]
    assert list(row["pieces"]) == exp


def test_train_vocab_job_cli_and_resume(spark, tmp_path):
    """jobs/train_vocab.py: trains + writes merges.parquet; a rerun
    resumes (no retraining); adding --encode reuses the stored merge
    table and writes the encoded corpus; encoded pieces match the
    reference."""
    import jobs.train_vocab as jv

    src = str(tmp_path / "docs.parquet")
    docs = _docs(spark, limit=40)
    docs.write.parquet(src)
    out = str(tmp_path / "vocab")
    assert jv.main(["--documents", src, "--output", out,
                    "--n-merges", "8"]) == 0
    merges = [
        (r["rank"], r["left"], r["right"], r["new_id"])
        for r in spark.read.parquet(
            os.path.join(out, "merges.parquet")).orderBy("rank").collect()
    ]
    assert merges == ref_train(_ref_word_counts(docs.collect()), 8)

    # rerun with --encode: merges resumed, corpus encoded
    assert jv.main(["--documents", src, "--output", out,
                    "--n-merges", "8", "--encode"]) == 0
    enc = {r["doc_id"]: list(r["pieces"]) for r in spark.read.parquet(
        os.path.join(out, "encoded.parquet")).collect()}
    for r in docs.collect():
        exp = [p for w in r["text"].split(" ") if w
               for p in ref_encode_word(w, merges)]
        assert enc[r["doc_id"]] == exp
