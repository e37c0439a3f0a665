"""Unit tests for text column expressions (shingles, tokens, rolling hash)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_writer_redshift_spark.functions.text import (
    rolling_hash_expr,
    shingles,
    token_count_expr,
)


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], "t string").select(expr(F.col("t")).alias("v")).collect()[0].v


def test_shingles_window_and_dedup(spark):
    got = _one(spark, "a b c d a b c", lambda c: shingles(c, 3))
    assert got == ["a b c", "b c d", "c d a", "d a b"]  # distinct, order kept


def test_shingles_short_text_empty(spark):
    assert _one(spark, "a b", lambda c: shingles(c, 3)) == []


def test_token_count_bpe_ish(spark):
    # letter runs, digit runs, and single marks each count once
    assert _one(spark, "Hello world42, ok!", token_count_expr) == 6
    # hello | world | 42 | , | ok | !


def test_rolling_hash_order_sensitive(spark):
    h_ab = _one(spark, "alpha beta", rolling_hash_expr)
    h_ba = _one(spark, "beta alpha", rolling_hash_expr)
    assert h_ab != h_ba  # permutation changes the fingerprint
    assert 0 <= h_ab < (1 << 31)


def test_rolling_hash_stable_and_case_insensitive(spark):
    a = _one(spark, "The Quick Fox", rolling_hash_expr)
    b = _one(spark, "the quick fox", rolling_hash_expr)
    assert a == b


@pytest.mark.parametrize("text", ["solo", "a b c d e f g h i j"])
def test_rolling_hash_deterministic(spark, text):
    assert _one(spark, text, rolling_hash_expr) == _one(spark, text, rolling_hash_expr)


def test_ngrams_keeps_repeats_in_order(spark):
    from db_writer_redshift_spark.functions.text import ngrams

    got = _one(spark, "a b a b", lambda c: ngrams(c, 2))
    assert got == ["a b", "b a", "a b"]
    assert _one(spark, "a", lambda c: ngrams(c, 2)) == []


def test_repetition_features_hand_computed(spark):
    from db_writer_redshift_spark.operators.text import repetition_features

    # "a a a b": 1-grams 4 total / 2 distinct -> 0.5
    #            2-grams [a a, a a, a b] 3 total / 2 distinct -> 1/3
    #            3-grams [a a a, a a b] 2 total / 2 distinct -> 0.0
    df = spark.createDataFrame([(1, "a a a b"), (2, "x y z w")], "id long, t string")
    rows = {r.doc_id: r for r in repetition_features(df, "id", "t").collect()}
    assert rows[1].dup_1gram_frac == 0.5
    assert rows[1].dup_2gram_frac == round(1 / 3, 6)
    assert rows[1].dup_3gram_frac == 0.0
    assert rows[1].is_repetitive  # dup_2gram 0.333 > 0.10
    assert rows[2].dup_1gram_frac == 0.0 and not rows[2].is_repetitive


def test_repetition_short_doc_no_div_by_zero(spark):
    from db_writer_redshift_spark.operators.text import repetition_features

    df = spark.createDataFrame([(1, "solo")], "id long, t string")
    r = repetition_features(df, "id", "t").collect()[0]
    assert (r.dup_1gram_frac, r.dup_2gram_frac, r.dup_3gram_frac) == (0.0, 0.0, 0.0)
    assert not r.is_repetitive


def test_pack_sequences_hand_computed(spark):
    from db_writer_redshift_spark.operators.text import pack_sequences

    # One bin (n_bins=1). Token counts: each text is k words of 1 token.
    # Budget 10: cum_excl 0,4,8,14 -> packs 0,0,0,1 (doc 3 straddles at
    # offset 8 and still lands in pack 0; doc 4 starts at 14 -> pack 1).
    docs = [(i, " ".join(["tok"] * k)) for i, k in [(1, 4), (2, 4), (3, 6), (4, 5)]]
    df = spark.createDataFrame(docs, "id long, t string")
    rows = {r.pack_id: r for r in pack_sequences(df, "id", "t", seq_len=10, n_bins=1).collect()}
    assert rows[0].n_docs == 3 and rows[0].total_tokens == 14
    assert rows[0].fill_ratio == 1.4
    assert rows[1].n_docs == 1 and rows[1].total_tokens == 5


def test_pack_sequences_bin_determinism(spark):
    from db_writer_redshift_spark.operators.text import pack_sequences

    df = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(100)], "id long, t string"
    )
    a = sorted(map(tuple, pack_sequences(df, "id", "t", 16, 4).collect()))
    b = sorted(map(tuple, pack_sequences(df.repartition(13), "id", "t", 16, 4).collect()))
    assert a == b  # partitioning-independent assignment


def test_chunk_overlap_windows(spark):
    from db_writer_redshift_spark.operators.text import chunk_overlap

    toks = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame([(1, " ".join(toks)), (2, "only two")], "doc_id long, text string")
    rows = {
        (r.doc_id, r.chunk_id): r
        for r in chunk_overlap(df, "doc_id", "text", chunk_tokens=4, stride=3).collect()
    }
    # doc 1: 10 tokens, windows start at 0,3,6 — last window reaches the end,
    # no start-9 suffix window
    assert sorted(k for k in rows if k[0] == 1) == [(1, 0), (1, 1), (1, 2)]
    assert rows[(1, 0)].n_chunk_tokens == 4
    assert rows[(1, 2)].n_chunk_tokens == 4  # covers tokens 6..9
    # doc 2: under one window -> exactly one chunk
    assert sorted(k for k in rows if k[0] == 2) == [(2, 0)]
    assert rows[(2, 0)].n_chunk_tokens == 2
    # fingerprint matches content md5
    import hashlib

    assert rows[(1, 1)].chunk_md5 == hashlib.md5(" ".join(toks[3:7]).encode()).hexdigest()


def test_chunk_overlap_validates_params(spark):
    from db_writer_redshift_spark.operators.text import chunk_overlap

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_overlap(df, "doc_id", "text", chunk_tokens=4, stride=5)


def test_rolling_hash_portable_order_sensitive_and_stable(spark):
    from db_writer_redshift_spark.functions.text import rolling_hash_portable_expr

    h_ab = _one(spark, "alpha beta", rolling_hash_portable_expr)
    h_ba = _one(spark, "beta alpha", rolling_hash_portable_expr)
    assert h_ab != h_ba
    assert h_ab == _one(spark, "alpha beta", rolling_hash_portable_expr)
    # known-value pin: (h(alpha)*257 + h(beta)) mod p with md5-prefix hashes
    import hashlib

    p = (1 << 31) - 1
    ha = int(hashlib.md5(b"alpha").hexdigest()[:8], 16) % p
    hb = int(hashlib.md5(b"beta").hexdigest()[:8], 16) % p
    assert h_ab == (ha * 257 + hb) % p


def test_quality_percentile_gate_keeps_floor_half_per_group(spark):
    """n_kept == floor(n/2) per group (rn*keep_den <= n*keep_num integer
    rule), kept token budget <= group total, cutoff is a kept score."""
    from db_writer_redshift_spark.operators.text import quality_percentile_gate

    rows = [
        # group g1: 5 docs of varying quality
        (1, "the a of and to in spark fast", "g1"),
        (2, "zzzzzzzzzzzzzzzz yyyyyyyyyyyy", "g1"),
        (3, "the quick brown fox jumps over the lazy dog", "g1"),
        (4, "a a a a a a a a", "g1"),
        (5, "spark query hash vector batch the of", "g1"),
        # group g2: 2 docs
        (6, "the a of and", "g2"),
        (7, "qqqq wwww eeee rrrr", "g2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.source: r
        for r in quality_percentile_gate(
            df, "doc_id", "text", "source"
        ).collect()
    }
    assert out["g1"].n_docs == 5 and out["g1"].n_kept == 2
    assert out["g2"].n_docs == 2 and out["g2"].n_kept == 1
    assert 0 < out["g1"].kept_tokens
    assert out["g1"].cutoff_q_e6 is not None


def test_quality_percentile_gate_single_doc_group_drops_it(spark):
    """A 1-doc group keeps nothing at keep 1/2 (rn*2 <= 1 is false) —
    the integer rule is floor, not round."""
    from db_writer_redshift_spark.operators.text import quality_percentile_gate

    df = spark.createDataFrame(
        [(1, "only doc here", "solo")], "doc_id long, text string, source string"
    )
    row = quality_percentile_gate(df, "doc_id", "text", "source").collect()[0]
    assert row.n_docs == 1 and row.n_kept == 0 and row.cutoff_q_e6 is None


def test_bpe_train_merges_hand_computed_trajectory(spark):
    """Toy corpus with a hand-derived 3-round merge table: vocabulary
    {abab:2, aab:1}; round 1 picks (a,b) with weighted count 5
    (overlapping adjacencies count, Sennrich rule), round 2 merges
    (ab,ab) in the rewritten vocab, round 3 (a,ab)."""
    from db_writer_redshift_spark.operators.text import bpe_train_merges

    df = spark.createDataFrame(
        [("abab abab",), ("aab",)], "text string"
    )
    got = [
        (r.merge_round, r.left_sym, r.right_sym, r.n_occurrences)
        for r in bpe_train_merges(df, "text", rounds=3).collect()
    ]
    assert got == [(1, "a", "b", 5), (2, "ab", "ab", 2), (3, "a", "ab", 1)]


def test_bpe_merge_expr_binds_punctuation_symbols(spark):
    """Real corpora put apostrophes/periods/backslashes in the space-split
    vocabulary; a punctuation-bearing pair winning a merge round must bind
    into the fold expression instead of crashing training (ADVICE r2)."""
    from db_writer_redshift_spark.operators.text import _bpe_merge_expr

    row = spark.sql(
        "SELECT " + _bpe_merge_expr("\"d|o|n|'|t\"", "n", "'") + " AS s"
    ).collect()[0]
    assert row.s == "d|o|n'|t"
    row2 = spark.sql(
        "SELECT " + _bpe_merge_expr("\"a|\\\\|b\"", "a", "\\") + " AS s"
    ).collect()[0]
    assert row2.s == "a\\|b"


def test_bpe_train_merges_survives_punctuation_corpus(spark):
    """End-to-end: a corpus whose most frequent pair involves an
    apostrophe trains without error, and '|'-bearing words are excluded
    from the vocabulary (separator collision)."""
    from db_writer_redshift_spark.operators.text import bpe_train_merges

    df = spark.createDataFrame(
        [("don't don't don't",), ("a|b a|b it.",)], "text string"
    )
    got = [
        (r.merge_round, r.left_sym, r.right_sym, r.n_occurrences)
        for r in bpe_train_merges(df, "text", rounds=2).collect()
    ]
    # vocab: {don't:3, it.:1} — a|b excluded. Round 1 pairs of don't
    # weighted 3 each; (d,o) wins lexicographically among count-3 ties.
    assert got[0][3] == 3 and got[0][0] == 1
    assert all("|" not in l and "|" not in r for _, l, r, _n in got)


def test_bpe_train_merges_return_state_tokenizes_words(spark):
    """The final state maps each vocab word to its merged symbols WITH
    round 3's merge applied: (a,b) then (ab,ab) then (a,ab) collapse
    both 'abab' and 'aab' to single tokens."""
    from db_writer_redshift_spark.operators.text import bpe_train_merges

    df = spark.createDataFrame([("abab abab",), ("aab",)], "text string")
    _, state = bpe_train_merges(df, "text", rounds=3, return_state=True)
    got = {r.w: r.s for r in state.collect()}
    assert got == {"abab": "abab", "aab": "aab"}

    # one round fewer: 'aab' is still two symbols (a | ab)
    _, state2 = bpe_train_merges(df, "text", rounds=2, return_state=True)
    got2 = {r.w: r.s for r in state2.collect()}
    assert got2 == {"abab": "abab", "aab": "a|ab"}


def test_winnowing_guarantee_and_density(spark):
    """The MOSS guarantee: two documents sharing a run of >= w + k - 1
    words (here 5 + 4 - 1 = 8) must share at least one selected
    fingerprint. Density: each full window contributes one selection,
    so 1 <= n_fps <= n_windows, and a single-window doc selects exactly
    one fingerprint."""
    from db_writer_redshift_spark.operators.text import winnow_fingerprints

    shared = "q w e r t y u i"  # 8 shared words
    df = spark.createDataFrame(
        [
            (1, shared + " aa bb cc dd"),
            (2, "zz yy " + shared),
            (3, "k4 k5 k6 k7 k8"),  # 5 words -> 2 grams, no full window of 5
            (4, "m1 m2 m3 m4 m5 m6 m7 m8"),  # exactly one full window
        ],
        "doc_id long, text string",
    )
    sel = winnow_fingerprints(df, "doc_id", "text", k=4, w=5).collect()
    by_doc = {}
    for r in sel:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared 8-word run must share a fingerprint"
    assert 3 not in by_doc, "no full window -> no selections"
    assert len(by_doc[4]) == 1, "one full window -> exactly one fingerprint"
