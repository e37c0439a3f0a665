"""Bloom-filter membership pre-filter as pure DataFrame algebra.

The exact n-gram decontamination check (operators/dedup.ngram_overlap)
joins training shingles against the DISTINCT eval-gram set. That is the
right tool when the eval side is benchmark-sized, but the join side grows
linearly with the held-out corpus: at a 100 TB training run with a large
eval/blocklist suite the broadcast side stops fitting. The classic fix —
used by every warehouse runtime's semi-join pushdown — is a Bloom
filter: compress the eval-gram SET into a fixed-size bitmap, broadcast
THAT (a few KiB–MiB regardless of eval cardinality), and drop every
training gram whose k probe bits aren't all set. False positives only —
a downstream exact check sees a small candidate stream instead of the
full corpus; false negatives never occur.

The reference (a Redshift COPY/merge control plane — SURVEY.md §2) has
no such surface; this extends the beyond-reference decontamination
suite (exact / fuzzy-MinHash / semantic-embedding) with the
scale-hardened *pre-filter* tier.

Engine-portable determinism (the house rule): probe positions come from
the md5-derived 32-bit integer hash used by the MinHash family
(operators/dedup.py) — ``int(md5(gram ⊕ '#i')[:8], 16) % m_bits`` for
i in 0..k-1 — and the bitmap is a table of (word_index, 62-bit word)
built with an integer ``bit_or`` aggregate. 62 bits per word keeps
``1 << bit`` strictly positive in both engines (DuckDB raises on
``1 << 63``). Every value is exact integer arithmetic, so the DuckDB
twin in plans/curation_extra.py is bit-identical and the driver can
full-value-hash the result.

Scale shape: the build side is one map-side-combined ``bit_or``
aggregate producing ``m_words`` rows (1024 here — a parameter); the
probe side joins grams to that table on word index, which Spark
broadcast-hash-joins. No data-sized state ever sits on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Usable bits per 64-bit word. 62 (not 64) so the mask ``1 << bit``
#: never touches the sign bit — DuckDB errors on ``1 << 63`` and a
#: negative mask would still be portable but needlessly subtle.
BITS_PER_WORD = 62


def _md5_int32(col: Column) -> Column:
    """First 8 md5 hex chars as a BIGINT in [0, 2^32) — the same
    portable base hash as operators/dedup's md5-affine MinHash."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _probe_positions(gram: Column, k: int, m_words: int) -> Column:
    """Array of the k probe bit-positions for one gram."""
    m_bits = m_words * BITS_PER_WORD
    return F.array(
        *[_md5_int32(F.concat(gram, F.lit(f"#{i}"))) % m_bits for i in range(k)]
    )


def bloom_build(
    grams: DataFrame, gram_col: str, m_words: int = 1024, k: int = 4
) -> DataFrame:
    """Build the Bloom bitmap table (widx BIGINT, bits BIGINT) from a
    gram set. Input need not be distinct — bit_or is idempotent."""
    pos = (
        grams.select(
            F.explode(_probe_positions(F.col(gram_col), k, m_words)).alias("pos")
        )
        .select(
            F.floor(F.col("pos") / BITS_PER_WORD).cast("long").alias("widx"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BITS_PER_WORD} AS INT))").alias(
                "mask"
            ),
        )
    )
    return pos.groupBy("widx").agg(F.bit_or("mask").alias("bits"))


def bloom_probe(
    grams: DataFrame,
    bloom: DataFrame,
    id_col: str,
    gram_col: str,
    m_words: int = 1024,
    k: int = 4,
) -> DataFrame:
    """Per-(id, gram) Bloom membership: n_bits_hit == k ⇒ maybe-member.

    Returns (id_col, gram_col, n_bits_hit). The bloom table (≤ m_words
    rows) broadcasts; a missing word index means no bit in that word was
    ever set, hence a miss (left join + coalesce 0).
    """
    pos = grams.select(
        id_col,
        gram_col,
        F.explode(_probe_positions(F.col(gram_col), k, m_words)).alias("pos"),
    ).select(
        id_col,
        gram_col,
        F.floor(F.col("pos") / BITS_PER_WORD).cast("long").alias("widx"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BITS_PER_WORD} AS INT))").alias(
            "mask"
        ),
    )
    hit = F.when(
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0, 1
    ).otherwise(0)
    return (
        pos.join(F.broadcast(bloom), "widx", "left")
        .select(id_col, gram_col, hit.alias("hit"))
        .groupBy(id_col, gram_col)
        .agg(F.sum("hit").cast("long").alias("n_bits_hit"))
    )


def bloom_prefilter_stats(
    train_grams: DataFrame,
    eval_grams: DataFrame,
    id_col: str,
    gram_col: str,
    m_words: int = 1024,
    k: int = 4,
) -> DataFrame:
    """Per-training-doc Bloom pre-filter rollup.

    Builds the bitmap from ``eval_grams[gram_col]``, probes every
    distinct (id, gram) of ``train_grams``, and returns one row per
    training id: (id, n_grams, n_maybe, maybe_ppm) where ``maybe_ppm``
    is ``(1e6 * n_maybe) div n_grams`` — exact integer arithmetic.
    Every training doc appears, flagged or not (the pre-filter's job is
    the full verdict stream, not just the positives).
    """
    bloom = bloom_build(eval_grams.select(gram_col), gram_col, m_words, k)
    probed = bloom_probe(
        train_grams.select(id_col, gram_col).distinct(),
        bloom,
        id_col,
        gram_col,
        m_words,
        k,
    )
    maybe = F.when(F.col("n_bits_hit") == k, 1).otherwise(0)
    return (
        probed.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(maybe).cast("long").alias("n_maybe"),
        )
        .withColumn(
            "maybe_ppm", F.expr("(1000000 * n_maybe) div n_grams").cast("long")
        )
    )
