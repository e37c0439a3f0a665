"""Incremental aggregate maintenance: merge delta batches into a stored
summary without re-scanning history.

The materialized-view refresh pattern: a summary table keyed on group
columns holds *combinable* aggregate state (count / sum / min / max — the
algebraic aggregates whose partials merge associatively). A new batch is
partially aggregated to the same shape, then the two states merge with
one union + re-aggregate — cost proportional to |delta| + |summary|,
never to the accumulated history. AVG and variance derive from
(sum, count, sum-of-squares) state columns; non-combinable aggregates
(exact distinct, median) need their own keyed state (see
plans/relational.agg_distinct_two_stage for the distinct formulation).

Scale: both legs are map-side-combined hash aggregates; the merge shuffle
carries one row per group per side. At 100 TB the summary is the small
relation — the delta path never touches the fact history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "count": F.sum,  # counts combine by summing partials
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}
_INIT = {
    "count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}


def agg_state(rows: DataFrame, keys: list[str], state: dict[str, tuple[str, str]]) -> DataFrame:
    """Aggregate raw rows into combinable state.

    ``state`` maps output column → (input column, kind) with kind in
    count/sum/min/max. ``("*", "count")`` counts rows.
    """
    aggs = []
    for out, (col, kind) in state.items():
        if kind not in _INIT:
            raise ValueError(f"non-combinable aggregate kind: {kind!r}")
        aggs.append(_INIT[kind](F.lit(1) if col == "*" else F.col(col)).alias(out))
    return rows.groupBy(*keys).agg(*aggs)


def merge_agg_state(
    summary: DataFrame,
    delta_state: DataFrame,
    keys: list[str],
    state: dict[str, tuple[str, str]],
) -> DataFrame:
    """Merge two state relations of identical shape: union the partials
    and re-aggregate with each column's combine function. New groups
    appear, existing groups update — one pass, no outer-join case logic."""
    cols = list(keys) + list(state)
    merged = summary.select(*cols).unionByName(delta_state.select(*cols))
    aggs = [_MERGE[kind](F.col(out)).alias(out) for out, (_c, kind) in state.items()]
    return merged.groupBy(*keys).agg(*aggs)


def incremental_update(
    summary: DataFrame,
    new_rows: DataFrame,
    keys: list[str],
    state: dict[str, tuple[str, str]],
) -> DataFrame:
    """One refresh step: partially aggregate the batch, merge into the
    summary. Equivalent to re-aggregating history+batch from scratch
    (tests/test_incremental.py proves equality on random splits)."""
    return merge_agg_state(summary, agg_state(new_rows, keys, state), keys, state)
