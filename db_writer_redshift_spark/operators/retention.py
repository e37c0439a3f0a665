"""Retention sweep: policy-driven expiry with referential cascade.

The reference writer only ever adds rows (full load / incremental upsert,
Redshift.php:155-209); a production warehouse also needs the inverse —
data-retention / right-to-erasure passes that expire rows AND their
dependents. Spark-first shape: the expired key set is computed once and
the cascade is an anti-join against it — the expired set is normally a
tiny fraction of the fact table, so Catalyst broadcasts it and neither
the fact nor the child table shuffles. Deletion is functional (the swept
relations are returned for an overwrite/partition-swap write), matching
the engine's pure-merge design.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def retention_sweep(
    fact: DataFrame,
    expire: Column,
    fact_key: str,
    children: list[tuple[DataFrame, str]] | None = None,
) -> tuple[DataFrame, list[DataFrame], DataFrame]:
    """Expire ``fact`` rows matching ``expire`` and cascade to children.

    ``expire`` is made total with ``coalesce(expire, false)`` — a NULL
    predicate result (e.g. a null date) means KEEP; a plain
    ``filter(~pred)`` would silently drop null-evaluating rows from both
    the kept AND expired sides.

    Returns ``(kept_fact, [kept_child, ...], audit)`` where audit has one
    row per relation: (rel, rows_before, rows_deleted, rows_kept) —
    computed with distributed aggregates, nothing collected.
    """
    children = children or []
    is_expired = F.coalesce(expire, F.lit(False))
    marked = fact.withColumn("__expired", is_expired)
    kept_fact = marked.filter(~F.col("__expired")).drop("__expired")
    expired_keys = (
        marked.filter(F.col("__expired")).select(fact_key).distinct()
    )

    audits = [
        marked.agg(
            F.lit("fact").alias("rel"),
            F.count("*").alias("rows_before"),
            F.count(F.when(F.col("__expired"), 1)).alias("rows_deleted"),
            F.count(F.when(~F.col("__expired"), 1)).alias("rows_kept"),
        )
    ]
    kept_children = []
    for idx, (child, fk) in enumerate(children):
        doomed = child.join(
            expired_keys, on=child[fk] == expired_keys[fact_key], how="left_semi"
        )
        kept = child.join(
            expired_keys, on=child[fk] == expired_keys[fact_key], how="left_anti"
        )
        kept_children.append(kept)
        n_child = child.agg(F.count("*").alias("n"))
        n_doomed = doomed.agg(F.count("*").alias("n"))
        audits.append(
            n_child.crossJoin(n_doomed.withColumnRenamed("n", "nd")).select(
                F.lit(f"child_{idx}").alias("rel"),
                F.col("n").alias("rows_before"),
                F.col("nd").alias("rows_deleted"),
                (F.col("n") - F.col("nd")).alias("rows_kept"),
            )
        )
    audit = audits[0]
    for a in audits[1:]:
        audit = audit.unionByName(a)
    return kept_fact, kept_children, audit
