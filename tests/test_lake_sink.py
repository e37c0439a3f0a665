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


@pytest.mark.slow
def test_dynamic_partition_pruning_through_lake(spark, tmp_path):
    """Dynamic partition pruning end-to-end through the lake sink: a fact
    table Hive-partitioned on the JOIN key joined against a dimension
    with a selective NON-partition filter. Catalyst cannot prune the fact
    scan statically (the filter is on the dim), so it injects a runtime
    `dynamicpruning` subquery that evaluates the dim side first and feeds
    the surviving join keys to the fact scan's partition filter — the
    mechanism that makes star-schema joins over a date-partitioned 100 TB
    lake read only the qualifying partitions. Asserted on both the plan
    (the dynamicpruning expression) and the executed scan metrics (only
    the matching partitions were read)."""
    path = str(tmp_path / "fact_lake")
    fact = spark.createDataFrame(
        [(i, i % 12, i * 2.0) for i in range(1200)],
        "row_id long, month int, amount double",
    )
    export_partitioned(fact, path, ["month"])
    dim = spark.createDataFrame(
        [(m, "Q1" if m < 3 else "rest") for m in range(12)],
        "month int, quarter string",
    )

    back = spark.read.parquet(path)
    j = back.join(F.broadcast(dim), "month").where(F.col("quarter") == "Q1")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    rows = j.collect()
    assert len(rows) == 300  # months 0,1,2 of 12
    # AQE wraps the plan and treats query stages as leaves, so descend
    # through AdaptiveSparkPlan/QueryStage wrappers to the file scan.
    def _file_scans(node, out):
        name = node.getClass().getSimpleName()
        if "AdaptiveSparkPlan" in name:
            return _file_scans(node.executedPlan(), out)
        if "QueryStage" in name:
            return _file_scans(node.plan(), out)
        if "FileSourceScan" in name:
            out.append(node)
        ch = node.children()
        for i in range(ch.size()):
            _file_scans(ch.apply(i), out)
        return out

    scans = _file_scans(j._jdf.queryExecution().executedPlan(), [])
    (scan,) = scans  # the partitioned fact is the only file source
    assert "dynamicpruning" in scan.toString().lower()
    assert scan.metrics().apply("numPartitions").value() == 3  # of 12
