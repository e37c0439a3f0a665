"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are implemented as compositions of existing DataFrame ops (the
SURVEY.md custom-operator rule: composition first, Pandas UDF only if
semantics demand it — they don't here).

* as-of join — the union trick: tag both sides, union on a common
  schema, ONE window pass per ``by`` partition carrying the most recent
  right-side values forward (last_value IGNORE NULLS), keep left rows.
  Cost: a single hash-partition shuffle on ``by`` + an in-partition sort.
  The naive alternative (inequality join + per-left-row max) is a
  near-cross-product at scale; this form is linear in rows and is how
  columnar engines implement ASOF internally.

* range join — day-bucket blocking: explode each right-side interval
  into the calendar days it covers, equi-join on the left row's day
  bucket, then refine with the exact BETWEEN predicate. Turns an
  inequality join (nested-loop in most engines) into an equi-join
  shuffle keyed on (day), with fan-out bounded by interval length in
  days. Catalyst alone would fall back to BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_cols: list[str],
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` (direction='backward'; 'forward' gives the
    next right row with ``right.on >= left.on``) within the same ``by``
    group. Left rows with no match keep NULLs — left-outer semantics,
    matching DuckDB's ``ASOF LEFT JOIN``.

    ``on`` must be mutually comparable (timestamp/numeric). Ties on the
    key: the right row at exactly left.on wins (<= / >=).

    ``tolerance`` (pandas ``merge_asof`` semantics): when set, a match
    further than ``tolerance`` from the left key (in ``on``'s own
    units — pass micros for the epoch-micros event timestamps) is
    nulled out, turning e.g. 'the next purchase ever' into 'the next
    purchase within an hour'. Requires a numeric ``on``; applied as a
    post-fill CASE, so the plan shape (one union + one window pass) is
    unchanged."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

    lcols = left.columns
    carry = list(right_cols)
    if tolerance is not None and on not in carry:
        carry.append(on)  # the match distance needs the right-side key
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in carry],
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in (on, *by) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in carry],
    )
    unioned = tagged_l.unionByName(tagged_r)

    if direction == "backward":
        # right rows sort before left rows at the same key so <= matches
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    filled = unioned.select(
        *lcols,
        "_is_left",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
            for c in carry
        ],
    )
    out = filled.filter(F.col("_is_left") == 1)
    if tolerance is not None:
        within = F.col(f"_r_{on}").isNotNull() & (
            F.abs(F.col(on) - F.col(f"_r_{on}")) <= F.lit(tolerance)
        )
        out = out.select(
            *lcols,
            "_is_left",
            *[
                F.when(within, F.col(f"_r_{c}")).alias(f"_r_{c}")
                for c in carry
            ],
        )
    return out.select(
        *lcols, *[F.col(f"_r_{c}").alias(c) for c in right_cols]
    )


def range_join_days(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    range_start: str,
    range_end: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Inner join of left rows onto right intervals with
    ``range_start <= left_ts <= range_end`` (inclusive both ends), plus
    optional equality ``keys``, blocked by calendar day so the physical
    plan is an equi-join on (keys…, day).

    Right intervals explode into one row per covered day
    (``sequence(to_date(start), to_date(end))``); fan-out = interval
    length in days — bound it upstream for open-ended intervals.
    """
    day = F.to_date(F.col(left_ts)).alias("_day")
    l_b = left.select("*", day)
    r_b = right.select(
        "*",
        F.explode(
            F.sequence(F.to_date(F.col(range_start)), F.to_date(F.col(range_end)))
        ).alias("_day"),
    )
    return (
        l_b.join(r_b, [*(keys or []), "_day"])
        .filter(
            (F.col(left_ts) >= F.col(range_start)) & (F.col(left_ts) <= F.col(range_end))
        )
        .drop("_day")
    )
