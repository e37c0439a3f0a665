"""Entity resolution: blocked fuzzy matching over name-like columns.

A data platform feeding an LLM pipeline ingests entity tables (vendors,
customers, parts) from many systems; the classic record-linkage task is
finding rows that denote the SAME real-world entity under slightly
different spellings. The textbook shape (Fellegi-Sunter blocking +
edit-distance comparison) is:

1. **Canonicalize**: collapse exact-duplicate names first. The pair
   space then scales with the NAME VOCABULARY, not the row count — on a
   100 TB entity table the distinct-name side is orders of magnitude
   smaller, and the expensive comparator never sees two rows of the
   same spelling.
2. **Block**: only compare names sharing a cheap key (here the last
   name token — the head noun). Blocking turns the O(V²) all-pairs
   space into Σ_b |b|²; the docstring contract is that block keys are
   low-skew (a mega-block would need a second key, e.g. first char of
   the remaining tokens — same salting idea as operators/skew.py).
3. **Length band**: |len(a) − len(b)| > d implies levenshtein(a,b) > d,
   so the band filter runs BEFORE the O(len²) dynamic program — the
   standard edit-distance join optimization (Gravano et al. 2001).
4. **Compare**: exact Levenshtein distance ≤ max_dist. Both engines
   implement textbook unit-cost Levenshtein, so the DuckDB twin in
   plans/curation_extra.py is value-identical and the driver can
   full-value-hash the result.

The reference (Redshift COPY/merge control plane — SURVEY.md §2) has no
matching surface; this is part of the beyond-reference curation track.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def blocked_name_matches(
    df: DataFrame, key_col: str, name_col: str, max_dist: int = 4
) -> DataFrame:
    """Candidate entity-match pairs among distinct names.

    Returns one row per unordered name pair (name_a < name_b) that
    shares a block (last name token), passes the length band, and has
    ``levenshtein ≤ max_dist`` — with each side's record count and
    canonical (minimum) key so a downstream merge can pick survivors.

    All columns are exact integers/strings; no floats anywhere.
    """
    names = (
        df.groupBy(F.col(name_col).alias("name"))
        .agg(
            F.count("*").cast("long").alias("n_records"),
            F.min(key_col).alias("canonical_key"),
        )
        .withColumn("block", F.element_at(F.split(F.col("name"), " "), -1))
    )
    a, b = names.alias("a"), names.alias("b")
    pairs = a.join(
        b,
        (F.col("a.block") == F.col("b.block"))
        & (F.col("a.name") < F.col("b.name"))
        & (
            F.abs(F.length(F.col("a.name")) - F.length(F.col("b.name")))
            <= max_dist
        ),
    )
    return (
        pairs.withColumn(
            "lev_dist", F.levenshtein(F.col("a.name"), F.col("b.name"))
        )
        .filter(F.col("lev_dist") <= max_dist)
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.col("lev_dist").cast("int").alias("lev_dist"),
            F.col("a.n_records").alias("n_records_a"),
            F.col("b.n_records").alias("n_records_b"),
            F.col("a.canonical_key").alias("canonical_a"),
            F.col("b.canonical_key").alias("canonical_b"),
        )
    )
