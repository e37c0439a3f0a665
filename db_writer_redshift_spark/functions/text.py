"""Text-analysis column expressions: tokenization, shingling, quality
ratios, token counting. All built-in functions (split / transform /
regexp_*) — these run in whole-stage codegen, no Python in the hot path.

Each expression has a DuckDB-SQL equivalent used by the oracle queries in
plans/llm_ops.py; keep the two in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords present in the synthetic corpus vocabulary.
STOPWORDS = ("the", "a", "of", "and", "to", "in")

# BPE-ish token pattern: letter runs, digit runs, or single non-alnum marks.
TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

PUNCT_PATTERN = "[^.,!?;:]"  # regexp_replace keeps only punctuation


def words(text: Column) -> Column:
    """Whitespace word split (single-space corpus; mirrors string_split)."""
    return F.split(text, " ")


def ngrams(text: Column, n: int) -> Column:
    """ALL word n-grams in order (repeats kept) as an array<string>; empty
    when the document has fewer than n words.

    transform over an index sequence — stays JVM-side; no explode until the
    caller chooses to.

    The word array is LET-BOUND through a single-element transform so the
    split runs ONCE per row: higher-order-function lambdas are interpreted,
    and a plain captured expression is re-evaluated on every element
    reference — the previous formulation re-split the text n+1 times per
    gram (measured 2.0× on the sf0.1 gram explode; round-8 optimization).
    The lambda variable is a bound VALUE, so inner references are free.
    Output is identical — same strings, same order, same empty guard."""

    def body(w: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(w) - n)
        grams = F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.get(w, i + j) for j in range(n)])
        )
        return F.when(F.size(w) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )

    return F.get(F.transform(F.array(words(text)), body), 0)


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>."""
    return F.array_distinct(ngrams(text, n))


def token_count_expr(text: Column) -> Column:
    """Count of BPE-ish tokens (lowercased). Group index 0 = whole match
    (the pattern has no capture groups)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0))


def punct_ratio_expr(text: Column) -> Column:
    """punctuation chars / total chars, rounded (both engines compute the
    identical double division)."""
    n_punct = F.length(F.regexp_replace(text, PUNCT_PATTERN, ""))
    return F.round(n_punct.cast("double") / F.length(text), 6)


def stopword_ratio_expr(text: Column) -> Column:
    """stopword tokens / word tokens."""
    w = words(F.lower(text))
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    return F.round(n_stop.cast("double") / F.size(w), 6)


def avg_word_len_expr(text: Column) -> Column:
    """Mean word length = non-space chars / word count."""
    n_chars = F.length(F.regexp_replace(text, " ", ""))
    return F.round(n_chars.cast("double") / F.size(words(text)), 6)


# Rolling-hash parameters: base 257, 31-bit modulus (products stay < 2^62,
# safe under ANSI overflow checking).
_RH_BASE = 257
_RH_MOD = (1 << 31) - 1


def rolling_hash_portable_expr(text: Column) -> Column:
    """rolling_hash_expr with the engine-portable token hash (integer of
    the first 8 md5 hex chars, mod p) — every fingerprint reproduces in
    DuckDB SQL. Fold-seed nuance: Spark's aggregate seeds 0 and DuckDB's
    list_reduce seeds with the first element, but (0·base + h₀) = h₀, so
    the sequences coincide; the empty-token case is guarded to 0 on both
    sides."""
    tok_hashes = F.transform(
        words(F.lower(text)),
        lambda t: F.pmod(
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint"),
            F.lit(_RH_MOD),
        ),
    )
    return F.aggregate(
        tok_hashes,
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * F.lit(_RH_BASE) + h) % F.lit(_RH_MOD),
    )


def rolling_hash_expr(text: Column, seed: int = 42) -> Column:
    """Order-sensitive polynomial rolling hash over the token stream:
    ``h = Σ h_tok(i)·base^(n-i) mod p`` via a sequential fold — permuting
    words changes the fingerprint (unlike a bag-of-words hash), which is
    the property document fingerprinting needs. JVM-side, engine-internal
    (xxhash64 tokens), so no SQL oracle — unit-tested instead."""
    tok_hashes = F.transform(
        words(F.lower(text)),
        lambda t: F.pmod(F.xxhash64(t, F.lit(seed)), F.lit(_RH_MOD)),
    )
    return F.aggregate(
        tok_hashes,
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * F.lit(_RH_BASE) + h) % F.lit(_RH_MOD),
    )
