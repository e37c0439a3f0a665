"""Snapshot differencing: the CDC complement of the merge operator.

``merge.upsert_dataframes`` applies a change set; ``snapshot_diff``
RECOVERS one — given two versions of a table (yesterday's load and
today's, or two ``publish`` versions), emit the net row-level changes
(insert / delete / update) keyed on the primary key. This is what feeds
downstream incremental consumers when the upstream only delivers full
snapshots (the common Keboola-style extractor situation: full table
dumps, no change feed).

Scale: ONE full-outer equi-join on the PK (shuffle-free when both sides
are PK-bucketed — the same layout that makes repeated merges cheap),
then codegen'd null-safe column comparisons; unchanged rows are filtered
before anything downstream materializes, so the output is proportional
to the CHANGE volume, not the table. No window, no sort, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    pk_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Net changes new-vs-old: one row per inserted / deleted / updated
    key, with ``change_type`` first, the PK columns, and the NEW side's
    values (NULL for deletes). Duplicate PKs on either side are a caller
    error (diff semantics need keyed snapshots); unchanged rows never
    appear. Column comparison is null-safe (NULL -> NULL is unchanged;
    NULL -> value is an update).
    """
    if not pk_cols:
        raise ValueError("snapshot_diff needs a primary key")
    compare = compare_cols or [c for c in new.columns if c not in pk_cols]
    o = old.select(
        *[F.col(c).alias(f"__o_{c}") for c in pk_cols],
        *[F.col(c).alias(f"o_{c}") for c in compare],
    )
    n = new.select(
        *[F.col(c).alias(f"__n_{c}") for c in pk_cols],
        *[F.col(c).alias(f"n_{c}") for c in compare],
    )
    cond = None
    for c in pk_cols:
        eq = F.col(f"__o_{c}") == F.col(f"__n_{c}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")
    old_present = F.col(f"__o_{pk_cols[0]}").isNotNull()
    new_present = F.col(f"__n_{pk_cols[0]}").isNotNull()
    changed = None
    for c in compare:
        ne = ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}"))
        changed = ne if changed is None else (changed | ne)
    change_type = (
        F.when(~old_present, F.lit("insert"))
        .when(~new_present, F.lit("delete"))
        .when(changed if changed is not None else F.lit(False), F.lit("update"))
    )
    out_pk = [
        F.coalesce(F.col(f"__n_{c}"), F.col(f"__o_{c}")).alias(c) for c in pk_cols
    ]
    out_vals = [F.col(f"n_{c}").alias(c) for c in compare]
    return (
        j.select(change_type.alias("change_type"), *out_pk, *out_vals)
        .filter(F.col("change_type").isNotNull())
    )
