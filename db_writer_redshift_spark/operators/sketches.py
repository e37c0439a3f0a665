"""Count-Min sketch: fixed-size frequency summaries of unbounded streams.

The heavy-hitter module (operators/heavy_hitters.py) answers "which
tokens are frequent" with a two-pass Misra-Gries; Count-Min (Cormode &
Muthukrishnan 2005) answers the complementary point query — "about how
often does token t occur" — from a d×w counter grid that never grows
with the corpus. At 100 TB the full token-frequency table has billions
of rows; the sketch is d·w counters (4×1024 here) built by one
map-side-combined aggregate, cheap to persist per-partition-of-time and
to merge by cell-wise addition.

Estimate semantics: each row r hashes t to one of w cells; cells
accumulate counts of every colliding token; the estimate is the MIN
over the d cells — always ≥ the true count (one-sided error), within
ε·N with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Engine-portable determinism: cell indices come from the md5-derived
32-bit hash (``int(md5(tok ⊕ '@r')[:8], 16) % w``) and every counter is
an exact BIGINT COUNT — so unlike the HLL/GK sketches (engine-internal,
rows-only for the driver) this sketch family member is FULLY
value-hash-checkable against the DuckDB twin in
plans/curation_extra.py.

The reference (Redshift COPY/merge control plane, SURVEY.md §2) has no
sketch surface; this extends the beyond-reference approximate-query
family with its first oracle-exact member.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _md5_int32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _cell(col: Column, row: int, width: int) -> Column:
    """Row-r cell index for a token — md5-portable, in [0, width)."""
    return _md5_int32(F.concat(col, F.lit(f"@{row}"))) % width


def cms_build(
    tokens: DataFrame, token_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch from a token-occurrence stream (NOT distinct —
    counts are the payload). Returns (r, c, cnt): d·w rows max.

    One explode (d rows per occurrence) then one map-side-combined
    count aggregate — the only shuffle carries ≤ d·w groups.
    """
    cells = tokens.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cell(F.col(token_col), r, width).alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell")
    ).select("cell.r", "cell.c")
    return cells.groupBy("r", "c").agg(F.count("*").cast("long").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each distinct probe token.

    Returns (token_col, cms_est). The sketch (≤ d·w rows) broadcasts;
    an absent cell means zero collisions landed there (coalesce 0 —
    only possible when the probe token itself never occurred).
    """
    pc = probes.select(token_col).distinct().select(
        token_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cell(F.col(token_col), r, width).alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(token_col, "cell.r", "cell.c")
    return (
        pc.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_est"))
    )
