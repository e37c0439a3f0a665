"""Partitioned lake export: directory layout, Catalyst partition pruning,
cardinality guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from db_writer_redshift_spark.sinks.lake import export_partitioned


def test_export_partitions_and_prunes(spark, tmp_path):
    path = str(tmp_path / "events_lake")
    events = spark.createDataFrame(
        [(i, ["click", "view", "purchase"][i % 3], i * 1.5) for i in range(300)],
        "event_id long, event_type string, value double",
    )
    export_partitioned(events, path, ["event_type"])

    # Hive directory layout
    assert sorted(
        d for d in os.listdir(path) if d.startswith("event_type=")
    ) == ["event_type=click", "event_type=purchase", "event_type=view"]

    back = spark.read.parquet(path)
    clicks = back.where(F.col("event_type") == "click")
    plan = clicks._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan
    assert len(clicks.collect()) == 100
    # pruning is real: the executed scan selected ONE Hive partition and
    # read only its files (inputFiles() reflects the unpruned index, so
    # check the scan metrics; collect() above populated them)
    scan = clicks._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    assert scan.metrics().apply("numPartitions").value() == 1
    n_files_read = scan.metrics().apply("numFiles").value()
    click_files = [
        f
        for f in os.listdir(os.path.join(path, "event_type=click"))
        if f.endswith(".parquet")
    ]
    all_files = sum(
        1
        for d in os.listdir(path)
        if d.startswith("event_type=")
        for f in os.listdir(os.path.join(path, d))
        if f.endswith(".parquet")
    )
    assert n_files_read == len(click_files) < all_files


def test_export_refuses_high_cardinality(spark, tmp_path):
    df = spark.range(0, 500).select(F.col("id"), (F.col("id") % 7).alias("k"))
    with pytest.raises(ValueError, match="exceeds max_partitions"):
        export_partitioned(df, str(tmp_path / "bad"), ["id"], max_partitions=100)
    with pytest.raises(ValueError, match="non-empty"):
        export_partitioned(df, str(tmp_path / "bad2"), [])
