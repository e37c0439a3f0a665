"""Partitioned lake export — directory-partitioned parquet.

No counterpart in the reference (its single sink is Redshift over PDO,
`src/Keboola/DbWriter/Writer/Redshift.php:44-77`); on a parquet lake,
Hive-style directory partitioning is the COARSE pruning layer: a filter
on the partition column never opens non-matching files at all (Catalyst
resolves it against the file index — `PartitionFilters` in the plan),
which composes with Z-order's footer-stats pruning (operators/zorder.py)
for within-partition columns.

Scale guidance encoded here: partition columns must be LOW cardinality
(dates, categories — not ids); at 100 TB a per-key directory layout with
millions of tiny partitions destroys the file index and the small-file
budget, so the writer refuses obviously-wrong layouts instead of
producing them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def export_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_partitions: int = 10_000,
) -> None:
    """Write ``df`` as Hive-partitioned parquet under ``path``.

    Guard: estimates the distinct partition-tuple count with a
    fixed-size HyperLogLog sketch (``approx_count_distinct``, ±5%) and
    refuses layouts clearly above ``max_partitions`` — the
    too-many-directories failure mode is silent and expensive, better
    rejected at write time. The sketch pass reads only the partition
    columns (column-pruned scan, no shuffle — partials merge map-side
    into one k-byte state), unlike an exact ``distinct().count()`` whose
    full shuffle would roughly double the write's cost at 100 TB for a
    guard whose answer only needs one significant digit.
    """
    from pyspark.sql import functions as F

    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    n = df.select(
        F.approx_count_distinct(F.struct(*partition_cols), rsd=0.05).alias("n")
    ).first()["n"]
    # 1.1 headroom: approx_count_distinct's rsd makes counts just over the
    # limit ambiguous; only refuse when the estimate is decisively high.
    if n > max_partitions * 1.1:
        raise ValueError(
            f"~{n} distinct partition values for {partition_cols} exceeds "
            f"max_partitions={max_partitions}; pick lower-cardinality columns"
        )
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
