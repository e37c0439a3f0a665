"""Small-file compaction: file count shrinks, content is unchanged,
no-op guard refuses useless rewrites."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_writer_redshift_spark.operators.maintenance import (
    compact_table,
    table_file_stats,
)


def _fragmented_table(spark, name, n_parts=24):
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    df = spark.range(0, 3000).withColumn("v", F.col("id") * 2)
    df.repartition(n_parts).write.saveAsTable(name)
    return df


def test_compact_reduces_files_preserves_content(spark):
    df = _fragmented_table(spark, "t_compact", 24)
    before_files, total = table_file_stats(spark, "t_compact")
    assert before_files >= 20

    report = compact_table(spark, "t_compact", target_file_bytes=max(total, 1))
    assert report["compacted"] is True
    assert report["files_after"] < report["files_before"]
    assert report["files_after"] <= 2

    got = sorted((r.id, r.v) for r in spark.table("t_compact").collect())
    want = sorted((r.id, r.v) for r in df.collect())
    assert got == want
    spark.sql("DROP TABLE t_compact")


def test_compact_noop_when_already_compact(spark):
    _fragmented_table(spark, "t_compact2", 1)
    report = compact_table(spark, "t_compact2")
    assert report["compacted"] is False
    assert report["files_after"] == report["files_before"]
    spark.sql("DROP TABLE t_compact2")


def test_analyze_table_persists_stats(spark):
    from db_writer_redshift_spark.operators.catalog import analyze_table

    spark.sql("DROP TABLE IF EXISTS t_stats")
    spark.range(0, 1234).withColumn("v", F.col("id") % 5).write.saveAsTable("t_stats")
    report = analyze_table(spark, "t_stats", columns=["id", "v"])
    assert report.get("row_count") == 1234
    assert report.get("size_bytes", 0) > 0
    # column-level stats visible to the optimizer
    desc = {
        r.info_name: r.info_value
        for r in spark.sql("DESCRIBE TABLE EXTENDED t_stats v").collect()
    }
    assert desc.get("distinct_count") == "5"
    assert desc.get("num_nulls") == "0"
    spark.sql("DROP TABLE t_stats")
