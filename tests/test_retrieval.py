"""operators/retrieval.py: integer-exact bigram BM25 + RRF fusion.

Hand-computed on a 3-doc corpus so every integer in the score formula
(idf2, sat_e3, the summed contribution) is verified against arithmetic
done here in Python, independent of both engines.
"""

from __future__ import annotations

import pytest

from db_writer_redshift_spark.operators.retrieval import (
    bm25_bigram_topk,
    rrf_rerank_topk,
)


def _sat_e3(tf: int, dl: int, n: int, tl: int) -> int:
    return (22 * tf * tl * 1000) // (10 * tf * tl + 3 * tl + 9 * dl * n)


def _idf2(df: int, n: int) -> int:
    return ((n + 1) // (df + 1)).bit_length() - 1  # floor(log2) of an int


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "red fox jumps red fox"),   # bigrams: red fox, fox jumps, jumps red, red fox -> dl=4
            (2, "red fox sleeps"),          # red fox, fox sleeps -> dl=2
            (3, "blue bird sings loudly"),  # 3 bigrams -> dl=3
        ],
        "doc_id long, text string",
    )


def test_bm25_hand_computed(spark, corpus):
    got = {
        (r.query_id, r.doc_id): (r.bm25_e3, r.lex_rank)
        for r in bm25_bigram_topk(
            corpus, [(7, "red fox sleeps")], k=10, max_df_permille=1000
        ).collect()
    }
    n, tl = 3, 9
    # term 'red fox': df=2, idf2=floor(log2(4//3))=0 -> contributes 0.
    # term 'fox sleeps': df=1, idf2=floor(log2(4//2))=1; only doc 2 (tf=1, dl=2).
    expected_doc2 = _idf2(2, n) * _sat_e3(2, 4, n, tl) + _idf2(1, n) * _sat_e3(
        1, 2, n, tl
    )
    assert _idf2(2, n) == 0  # 'red fox' contributes nothing
    assert got[(7, 2)] == (expected_doc2, 1)
    # doc 1 matches only 'red fox' (idf2=0) -> score 0, but still ranked.
    assert got[(7, 1)] == (0, 2)
    assert (7, 3) not in got  # no matching bigram at all


def test_bm25_deterministic_tiebreak(spark, corpus):
    # Both docs score 0 on a query whose only bigrams have idf2=0 ('red
    # fox' df=2) -> tie broken by doc_id ascending.
    rows = bm25_bigram_topk(
        corpus, [(1, "red fox")], k=10, max_df_permille=1000
    ).collect()
    assert [(r.doc_id, r.lex_rank) for r in rows] == [(1, 1), (2, 2)]


def test_bm25_multiple_queries_independent(spark, corpus):
    rows = bm25_bigram_topk(
        corpus, [(1, "red fox"), (2, "bird sings")], k=1, max_df_permille=1000
    ).collect()
    by_q = {r.query_id: r.doc_id for r in rows}
    assert by_q == {1: 1, 2: 3}


def test_rrf_fusion_hand_computed(spark):
    cand = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)],
        "query_id long, doc_id long, lex_rank int",
    )
    prior = spark.createDataFrame(
        [(10, 100), (20, 300), (30, 200)], "doc_id long, prior_e6 long"
    )
    rows = rrf_rerank_topk(cand, prior, k=3, rrf_k=60).collect()
    got = {r.doc_id: (r.prior_rank, r.rrf_e6, r.fused_rank) for r in rows}
    # prior ranks: 20 -> 1, 30 -> 2, 10 -> 3
    assert got[20] == (1, 1000000 // 62 + 1000000 // 61, 1)
    assert got[10] == (3, 1000000 // 61 + 1000000 // 63, 2)
    assert got[30] == (2, 1000000 // 63 + 1000000 // 62, 3)


def test_short_docs_have_no_bigrams(spark):
    docs = spark.createDataFrame(
        [(1, "word"), (2, "")], "doc_id long, text string"
    )
    assert bm25_bigram_topk(docs, [(1, "word word")], k=5).count() == 0


def test_bm25_default_df_cap_drops_stopword_bigram(spark, corpus):
    """Default-on df-cap (max_df_permille=500): 'red fox' matches 2 of 3
    docs (667 permille > 500), so it is dropped before scoring — a
    stopword-like bigram can no longer make every document a candidate.
    'fox sleeps' (df=1, 333 permille) survives and still scores doc 2."""
    rows = bm25_bigram_topk(corpus, [(7, "red fox sleeps")], k=10).collect()
    assert [(r.query_id, r.doc_id) for r in rows] == [(7, 2)]
    n, tl = 3, 9
    assert rows[0].bm25_e3 == _idf2(1, n) * _sat_e3(1, 2, n, tl)


def test_bm25_df_cap_all_terms_capped_yields_empty(spark, corpus):
    # Every bigram of the query exceeds the cap -> no candidates at all
    # (bounded work), not a corpus-wide zero-scored ranking.
    assert bm25_bigram_topk(corpus, [(1, "red fox")], k=10).count() == 0
