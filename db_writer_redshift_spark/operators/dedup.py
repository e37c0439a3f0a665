"""Deduplication operators for large-scale corpus curation.

Five tiers, cheapest-first, the way a 100 TB pipeline stacks them:
  1. exact            — md5 fingerprint group-by (one shuffle on the hash)
  2. shingle-Jaccard  — inverted-index candidate join with a document-
                        frequency cap (the cap bounds bucket fan-out, which
                        is what keeps the self-join sub-quadratic at scale)
  3. MinHash + LSH    — fixed-size signatures, banded bucketing; candidate
                        pairs only within equal band buckets
  4. SimHash          — 64-bit near-dup fingerprint, hamming-distance pairs
  5. embedding cosine — semantic near-dup over the embeddings table
                        (delegates to operators/similarity.py)

Everything is DataFrame built-ins; the only "custom" math is hash mixing,
done with xxhash64 + integer arithmetic in column expressions (JVM codegen).
Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from db_writer_redshift_spark.functions.text import shingles

# Mersenne prime 2^31-1 for the universal-hash family (a*h + b) mod p.
# 31-bit domain keeps a*h + b < 2^62 — no int64 overflow under ANSI mode.
_MERSENNE_P = (1 << 31) - 1


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by content fingerprint. Returns one row per
    distinct content: (fingerprint, keep_id = min id, n_copies)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def shingle_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.05,
    max_doc_freq: int = 100,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard via an inverted index.

    Plan shape: explode distinct shingles → drop shingles appearing in more
    than ``max_doc_freq`` docs (stop-shingles; caps the quadratic bucket
    blow-up — at 1000 executors this cap is the difference between a join
    and a cross product) → self-join on shingle → count common shingles per
    pair → Jaccard over the *filtered* shingle sets.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ threshold.
    """
    sh = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(shingles(F.col(text_col), n)).alias("sh"))
    )
    # document frequency cap (computed once, reused for the join and counts)
    rare = sh.join(
        sh.groupBy("sh").agg(F.count("*").alias("df_count")).filter(F.col("df_count") <= max_doc_freq),
        "sh",
    ).select("doc_id", "sh")
    counts = rare.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = rare.alias("a")
    b = rare.alias("b")
    pairs = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        pairs.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def _minhash_signature(shingle_hashes, num_hashes: int, seed: int = 42):
    """num_hashes MinHash values as an array column: min over the shingle
    hashes of (a_i*h + b_i) mod p. Parameters derive deterministically from
    the seed via a splitmix-style mix — no RNG state, reproducible anywhere.
    """

    def mix(i: int) -> tuple[int, int]:
        x = (seed * 0x9E3779B97F4A7C15 + i * 0xBF58476D1CE4E5B9) & ((1 << 63) - 1)
        a = (x % (_MERSENNE_P - 1)) + 1  # in [1, p-1]
        b = ((x >> 17) + i * 0x632BE59B) % _MERSENNE_P
        return a, b

    sigs = []
    for i in range(num_hashes):
        a, b = mix(i)
        sigs.append(
            F.array_min(
                F.transform(
                    shingle_hashes,
                    lambda h: (F.lit(a) * F.pmod(h, F.lit(_MERSENNE_P)) + F.lit(b))
                    % F.lit(_MERSENNE_P),
                )
            )
        )
    return F.array(*sigs)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, signature: array<bigint>[num_hashes]) per document.

    Shingle hashing uses xxhash64 (JVM, seeded) — engine-internal, hence no
    SQL oracle; tests validate signature similarity against exact Jaccard.
    """
    sh = shingles(F.col(text_col), n)
    hashes = F.transform(sh, lambda s: F.xxhash64(s, F.lit(seed)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        _minhash_signature(hashes, num_hashes, seed).alias("signature"),
    ).filter(F.size("signature") > 0)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH candidate pairs with estimated Jaccard.

    num_hashes/bands rows-per-band tune the S-curve; candidates are pairs
    sharing ≥1 band bucket (equi-join on (band, band_hash) — shuffle keyed on
    the bucket, never all-pairs). Estimated Jaccard = fraction of agreeing
    signature positions; pairs below ``threshold`` are dropped.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes, seed)
    banded = sig.select(
        "doc_id",
        "signature",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("signature"), bi * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "signature", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)).cast(
            "double"
        )
        / F.lit(float(num_hashes))
    )
    return cand.select("doc_a", "doc_b", F.round(est, 4).alias("est_jaccard")).filter(
        F.col("est_jaccard") >= threshold
    )


def simhash(df: DataFrame, id_col: str, text_col: str, seed: int = 42) -> DataFrame:
    """64-bit SimHash per document: per-token xxhash64, sum ±1 per bit
    position weighted by token count, sign → bit.

    Implementation: explode tokens → one groupBy(doc) computing 64 bit-sums
    in a single shuffle (partial aggregation map-side), then assemble the
    fingerprint with shiftleft/bitwise-or. All JVM expressions.
    """
    tokens = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok", F.lit(seed)))
    bit_sums = tokens.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(64)
        ]
    )
    fp = F.lit(0).cast("bigint")
    for j in range(64):
        fp = fp.bitwiseOR(
            F.when(F.col(f"b{j}") > 0, F.shiftleft(F.lit(1).cast("bigint"), j)).otherwise(
                F.lit(0).cast("bigint")
            )
        )
    return bit_sums.select("doc_id", fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 12, seed: int = 42
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Candidate generation blocks on 16-bit chunks (pigeonhole: distance ≤ 12
    over 4 chunks guarantees ≥1 identical chunk) so the join is an equi-join
    on (chunk_idx, chunk_value), never all-pairs.
    """
    sh = simhash(df, id_col, text_col, seed)
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
