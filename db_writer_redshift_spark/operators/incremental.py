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


# ---------------------------------------------------------------------------
# Incremental JOIN-view maintenance
# ---------------------------------------------------------------------------


def incremental_join_insert(
    mv: DataFrame,
    a_old: DataFrame,
    delta_a: DataFrame,
    b_new: DataFrame,
    delta_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """Refresh a materialized INNER-join view under insert-only deltas.

    The classic delta rule: with A_new = A_old ∪ ΔA and
    B_new = B_old ∪ ΔB,

        A_new ⋈ B_new = (A_old ⋈ B_old)  -- the stored view
                      ∪ (ΔA ⋈ B_new)     -- new left rows see ALL right
                      ∪ (A_old ⋈ ΔB)     -- old left rows see new right

    (ΔA ⋈ ΔB is inside the ΔA ⋈ B_new leg — no fourth term, no double
    count.) Cost is two delta-sized joins; the accumulated history A_old
    appears only opposite ΔB, and the stored view is never re-joined.
    At 100 TB the delta legs broadcast when the batch is small, and the
    A_old ⋈ ΔB leg prunes to ΔB's key range under partitioned storage.

    Column contract: ``mv`` has exactly the columns of
    ``a ⋈ b on keys`` (keys once, then both payloads); the output keeps
    that shape via unionByName.
    """
    leg_a = delta_a.join(b_new, on)
    leg_b = a_old.join(delta_b, on)
    return mv.unionByName(leg_a.select(*mv.columns)).unionByName(
        leg_b.select(*mv.columns)
    )


def incremental_join_upsert(
    mv: DataFrame,
    a_new: DataFrame,
    b_new: DataFrame,
    affected_keys: DataFrame,
    on: list[str],
) -> DataFrame:
    """Refresh a materialized INNER-join view under keyed UPSERT deltas
    (rows replaced in place, so old contributions must retract).

    Affected-key recompute: view rows whose join key appears in
    ``affected_keys`` are dropped (the retraction) and recomputed from
    the updated base relations, restricted to those keys. Exact under
    arbitrary N:M fanout — the whole key's output is rebuilt, never
    patched row-wise.

    Scale: cost ∝ affected keys. ``affected_keys`` (one column per join
    key, distinct) broadcasts into both the anti-join and the semi-join
    when the batch is small; the base-table semi joins prune to the
    affected key range under partitioned/bucketed storage.
    """
    keys_b = F.broadcast(affected_keys.select(*on).distinct())
    kept = mv.join(keys_b, on, "left_anti")
    recomputed = (
        a_new.join(keys_b, on, "left_semi")
        .join(b_new, on)
        .select(*mv.columns)
    )
    return kept.unionByName(recomputed)


# ---------------------------------------------------------------------------
# Retraction-capable aggregate maintenance (Z-set multiplicities)
# ---------------------------------------------------------------------------


def apply_retraction_delta(
    summary: DataFrame,
    delta: DataFrame,
    keys: list[str],
    mult_col: str,
    sums: dict[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Maintain a (count, sums...) aggregate view under a delta stream
    carrying INSERTS AND DELETES as signed multiplicities — the Z-set /
    DBSP convention (Budiu et al., "DBSP: automatic incremental view
    maintenance", VLDB 2023; differential dataflow's linear-operator
    rule): each delta row contributes ``mult`` (+1 insert, -1 delete,
    ±k batched) to its group's count and ``mult * value`` to each sum.
    Groups whose maintained count reaches zero DROP from the view, so
    a fully-retracted group leaves no tombstone.

    COUNT and SUM are group homomorphisms — retraction is exact
    subtraction (keep sums in DECIMAL so the incremental and
    from-scratch paths are bit-equal). MIN/MAX are NOT invertible: a
    delete can expose an unknown second-best, so views carrying them
    must rebuild affected groups from the base table (the standard IVM
    split; see incremental_join_upsert's affected-key rebuild for the
    pattern).

    ``sums`` maps output column -> delta value column. Plan: one
    map-side-combined aggregate over the delta keyed on ``keys``, one
    union + re-aggregate with the summary (merge_agg_state's shape) —
    refresh cost ∝ |delta| + |summary|, never the base."""
    aggs = [
        F.sum(F.col(mult_col)).cast("long").alias(count_col),
        *[
            F.sum(F.col(src) * F.col(mult_col)).alias(out)
            for out, src in sums.items()
        ],
    ]
    delta_state = delta.groupBy(*keys).agg(*aggs)
    cols = list(keys) + [count_col, *sums]
    merged = summary.select(*cols).unionByName(delta_state.select(*cols))
    out = merged.groupBy(*keys).agg(
        F.sum(count_col).cast("long").alias(count_col),
        *[F.sum(out_c).alias(out_c) for out_c in sums],
    )
    return out.filter(F.col(count_col) > 0)
