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
