"""Write modes — full load and incremental upsert (L-9, L-11, L-12).

Reference lifecycle (RedshiftApplication.php:109-139):

* ``loadFull``: drop → create → COPY. Destructive replace.
* ``loadIncremental``: COPY into a fresh ``_temp_`` staging table → create
  target if missing → 3-statement upsert → drop staging. Non-atomic in the
  reference; here the merged relation is computed functionally
  (operators/merge.upsert_dataframes) and swapped in with one overwrite —
  a crash mid-merge leaves the old target intact (documented improvement,
  SURVEY.md §7 Phase 3).

Scale: the overwrite writes through a checkpointed temp location because a
Spark overwrite of a table being read would otherwise race with its own
scan. At 100 TB the incremental path's cost is one PK-partitioned anti
join (broadcast when staging is small) + a rewrite of the target —
same order as Redshift's UPDATE+INSERT which also rewrites touched blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from db_writer_redshift_spark.config.schema import TableConfig
from db_writer_redshift_spark.operators import catalog
from db_writer_redshift_spark.operators.merge import upsert_dataframes


def _write(
    df: DataFrame,
    name: str,
    table: TableConfig,
    buckets: int | None,
    zorder_by: list[str] | None = None,
    zorder_files: int | None = None,
) -> None:
    if buckets and zorder_by:
        raise ValueError("buckets and zorder_by are mutually exclusive layouts")
    if zorder_by:
        # Morton-curve clustering (operators/zorder.py): range-partition +
        # sort on the interleaved code so parquet footer stats prune on
        # ANY clustered column. Same single shuffle as a sorted write.
        # The partition count must be EXPLICIT — an unnumbered
        # repartitionByRange is AQE-coalescible, which would collapse the
        # layout into one file and erase the pruning benefit.
        from db_writer_redshift_spark.operators.zorder import with_zorder

        n = zorder_files or int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        df = (
            with_zorder(df, zorder_by)
            .repartitionByRange(n, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    # Clear both the catalog entry AND the managed location first: the
    # target may be an adopted location-based table (whose drop keeps
    # files) or a bare orphan dir from a previous process — either makes
    # saveAsTable fail with LOCATION_ALREADY_EXISTS.
    catalog.drop_table(df.sparkSession, name)
    w = df.write.mode("overwrite")
    if buckets and table.primary_key:
        # Hash-bucket + sort on the PK (the Spark analog of a Redshift
        # DISTKEY/SORTKEY, which the reference never set): the next
        # incremental merge's anti join reads co-located, pre-sorted
        # buckets and skips the target-side shuffle entirely.
        w = w.bucketBy(buckets, *table.primary_key).sortBy(*table.primary_key)
    w.saveAsTable(name)


def load_full(
    spark: SparkSession,
    table: TableConfig,
    df: DataFrame,
    buckets: int | None = None,
    zorder_by: list[str] | None = None,
    zorder_files: int | None = None,
) -> None:
    """L-11: drop → create → write (overwrite semantics in one shot; the
    drop happens inside _write, which also clears orphan locations)."""
    _write(df, table.db_name, table, buckets, zorder_by, zorder_files)


def load_incremental(
    spark: SparkSession, table: TableConfig, staging: DataFrame, buckets: int | None = None
) -> None:
    """L-12: merge ``staging`` into the target by primary key.

    Missing target → behaves like full load (reference creates the target
    then upserts into the empty table, same result). PK-less → append
    (Redshift.php:169-200 guard via upsert_dataframes).
    """
    if not catalog.table_exists(spark, table.db_name):
        _write(staging, table.db_name, table, buckets)
        return
    target = spark.table(table.db_name)
    merged = upsert_dataframes(target, staging, list(table.primary_key))
    # Materialize before overwriting the table the plan reads from: stage
    # into a _temp_ table (the reference's staging-table scheme, L-10),
    # then swap. Two sequential jobs, no self-overwrite race.
    tmp = catalog.generate_tmp_name(table.db_name)
    merged.write.mode("overwrite").saveAsTable(tmp)
    try:
        _write(spark.table(tmp), table.db_name, table, buckets)
    finally:
        catalog.drop_table(spark, tmp)


def load_table(
    spark: SparkSession,
    table: TableConfig,
    df: DataFrame,
    buckets: int | None = None,
) -> None:
    """Dispatch on the config's ``incremental`` flag (RedshiftApplication.php:93-96)."""
    if table.incremental:
        load_incremental(spark, table, df, buckets)
    else:
        load_full(spark, table, df, buckets)
