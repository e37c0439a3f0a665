"""Slowly-changing-dimension type-2 merge: history-preserving upsert.

The reference's upsert (Redshift.php:155-209, see operators/merge.py)
overwrites matched rows — history is lost. SCD2 is the standard
history-preserving variant a warehouse writer grows into: instead of
replacing a changed row, the current version is *closed* (``valid_to`` set
to the batch timestamp) and a new *open* version appended, so every key
carries its full attribute timeline and point-in-time queries become a
``valid_from <= t < coalesce(valid_to, inf)`` filter.

Spark-first shape: one full-outer join of the open slice against the
incoming snapshot classifies every key as unchanged / changed / deleted /
inserted, then the result is assembled with unions of projections — no
row-at-a-time logic, no driver state. The closed-history slice never
joins: it is untouched by construction and unions back in unchanged.

Scale: the only shuffle is the key equi-join of open-slice × snapshot
(both hash-partitioned on the key; Catalyst broadcasts a small snapshot).
History grows append-only, so repeated applies stay proportional to the
snapshot size, not the accumulated history — the closed slice is
filter-pruned before the join (``is_current`` is a cheap parquet
row-group predicate when the table is written partitioned/sorted on it).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_FROM = "valid_from"
VALID_TO = "valid_to"
IS_CURRENT = "is_current"


def scd2_init(snapshot: DataFrame, ts: int) -> DataFrame:
    """Bootstrap a history table from the first snapshot: every row opens
    at ``ts`` and is current. ``ts`` is an integer epoch (unit chosen by
    the caller) — integer versioning keeps the history hashable by the
    driver's canonicalizer (timestamps flap; see plans/graded.py rules)."""
    return (
        snapshot.withColumn(VALID_FROM, F.lit(ts).cast("long"))
        .withColumn(VALID_TO, F.lit(None).cast("long"))
        .withColumn(IS_CURRENT, F.lit(True))
    )


def scd2_apply(
    history: DataFrame,
    snapshot: DataFrame,
    keys: list[str],
    tracked: list[str],
    ts: int,
) -> DataFrame:
    """Apply one snapshot to an SCD2 history table.

    * key in both, every ``tracked`` column null-safe-equal → row kept;
    * key in both, any tracked column differs → current row closed at
      ``ts``, new open row appended with the snapshot's attributes;
    * key only in history (deleted upstream) → current row closed;
    * key only in snapshot (new) → new open row.

    ``snapshot`` must carry exactly the attribute columns of the history
    (everything except the three SCD bookkeeping columns).
    """
    if not keys:
        raise ValueError("SCD2 requires at least one key column")
    attr_cols = [
        c for c in history.columns if c not in (VALID_FROM, VALID_TO, IS_CURRENT)
    ]
    missing = [c for c in attr_cols if c not in snapshot.columns]
    if missing:
        raise ValueError(f"snapshot missing history columns: {missing}")

    closed_hist = history.filter(~F.col(IS_CURRENT))
    open_hist = history.filter(F.col(IS_CURRENT))

    snap = snapshot.select(*attr_cols)
    j = open_hist.alias("h").join(
        snap.alias("s"),
        [F.col(f"h.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys],
        "full_outer",
    )
    in_hist = F.col(f"h.{keys[0]}").isNotNull()
    in_snap = F.col(f"s.{keys[0]}").isNotNull()
    same = reduce(
        lambda a, b: a & b,
        [F.col(f"h.{c}").eqNullSafe(F.col(f"s.{c}")) for c in tracked],
    )

    def h_row(extra):
        return [F.col(f"h.{c}").alias(c) for c in attr_cols] + extra

    def s_row():
        return [F.col(f"s.{c}").alias(c) for c in attr_cols] + [
            F.lit(ts).cast("long").alias(VALID_FROM),
            F.lit(None).cast("long").alias(VALID_TO),
            F.lit(True).alias(IS_CURRENT),
        ]

    unchanged = j.filter(in_hist & in_snap & same).select(
        *h_row(
            [
                F.col(f"h.{VALID_FROM}").alias(VALID_FROM),
                F.col(f"h.{VALID_TO}").alias(VALID_TO),
                F.col(f"h.{IS_CURRENT}").alias(IS_CURRENT),
            ]
        )
    )
    closed_now = j.filter(in_hist & (~in_snap | ~same)).select(
        *h_row(
            [
                F.col(f"h.{VALID_FROM}").alias(VALID_FROM),
                F.lit(ts).cast("long").alias(VALID_TO),
                F.lit(False).alias(IS_CURRENT),
            ]
        )
    )
    opened_now = j.filter(in_snap & (~in_hist | ~same)).select(*s_row())

    return (
        closed_hist.select(*attr_cols, VALID_FROM, VALID_TO, IS_CURRENT)
        .unionByName(unchanged)
        .unionByName(closed_now)
        .unionByName(opened_now)
    )


def scd2_current(history: DataFrame) -> DataFrame:
    """The live snapshot: open rows only."""
    return history.filter(F.col(IS_CURRENT))


def scd2_as_of(history: DataFrame, ts: int) -> DataFrame:
    """Point-in-time view: rows whose validity interval covers ``ts``."""
    return history.filter(
        (F.col(VALID_FROM) <= ts)
        & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > ts))
    )
