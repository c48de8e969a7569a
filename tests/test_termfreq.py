"""TermFreq dict builder + dict-based BM25 scorer equal the corpus-inline
bm25 query (two independent constructions)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as em
from metarank_spark.functions.text import bm25_score_expr, build_term_freq
from metarank_spark.schema import load_documents
from tests.conftest import SF_SMALL


def test_term_freq_dict_matches_inline_bm25(spark):
    docs = load_documents(spark, SF_SMALL)
    # query-term slice only — no full-vocab collect on the data path
    dic = build_term_freq(docs, terms=list(em.BM25_TERMS))
    assert dic["n_docs"] == docs.count()
    assert dic["df"]["spark"] > 0
    assert set(dic["df"]) <= set(em.BM25_TERMS)

    scored = docs.select(
        "doc_id", F.round(bm25_score_expr("text", list(em.BM25_TERMS), dic), 6).alias("bm25")
    )
    got = {r["doc_id"]: r["bm25"] for r in scored.collect()}
    exp = {r["doc_id"]: r["bm25"] for r in em.q_bm25(spark, SF_SMALL).collect()}
    assert got == exp
