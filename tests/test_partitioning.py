"""ensure_parallelism: repartition under-split inputs, leave healthy ones."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_writer_redshift_spark.operators.partitioning import ensure_parallelism


def test_underpartitioned_input_lifted_to_default_parallelism(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).coalesce(1)
    out = ensure_parallelism(df)
    assert out.rdd.getNumPartitions() == target


def test_healthy_input_untouched(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 4)
    out = ensure_parallelism(df)
    # No extra exchange inserted: same DataFrame object comes back.
    assert out is df


def test_rows_preserved_exactly(spark):
    df = spark.range(500).coalesce(1).select(F.col("id"))
    out = ensure_parallelism(df)
    assert sorted(r.id for r in out.collect()) == list(range(500))


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's runtime skew-join handling — the first line of defense the
    SCALE.md join notes claim before operators/skew.salted_join: a join
    whose left side puts ~95% of rows on one key gets its hot shuffle
    partition SPLIT at runtime (SortMergeJoin(skew=true) reading an
    'AQEShuffleRead skewed' child), with results identical to the
    unskewed logical answer. Thresholds are lowered so the 300k-row
    fixture crosses the size bar the way a hot key crosses it at TB
    scale."""
    from pyspark.sql import functions as F

    keep = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.shuffle.partitions", "8")

        big = spark.range(0, 300_000).select(
            F.when(F.col("id") % 20 != 0, 7)
            .otherwise(F.col("id") % 97)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
        )
        right = spark.range(0, 97).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
        )
        j = big.join(right, "k")
        rows = j.collect()  # executes; the SAME DataFrame's plan is final
        assert len(rows) == 300_000  # one dim row per key: no fan-out

        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan, plan[:1500]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in keep.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
