"""Z-order clustered writes: Morton-code correctness and measured
file-pruning benefit on the secondary column vs a linear sort."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_writer_redshift_spark.operators.zorder import (
    file_minmax,
    morton_interleave,
    with_zorder,
    write_zordered,
)


def test_morton_interleave_known_codes(spark):
    # 2-bit 2D Morton: (x,y) -> interleave x into even bits, y into odd
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 3), (2, 1)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", morton_interleave([F.col("x"), F.col("y")], 2).alias("z")
        ).collect()
    }
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (3, 3): 15, (2, 1): 6}


def test_morton_width_validation():
    with pytest.raises(ValueError):
        morton_interleave([F.lit(1), F.lit(2)], 32)  # 64 bits > 63


def test_with_zorder_handles_null_and_constant(spark):
    df = spark.createDataFrame(
        [(1, None, 7), (2, 5, 7), (3, 9, 7)], "a long, b long, c long"
    )
    rows = with_zorder(df, ["b", "c"], bits=4).collect()
    # constant column c and NULL b quantize to 0 without error
    assert all(r["__z"] >= 0 for r in rows)
    assert {r.a for r in rows} == {1, 2, 3}


def _grid_df(spark, n=64 * 64):
    # two independent uniform keys via a deterministic permutation grid
    return spark.range(n).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
        F.col("id").alias("payload"),
    )


def test_zorder_prunes_secondary_column(spark, tmp_path):
    df = _grid_df(spark)
    n_files = 16
    linear = str(tmp_path / "linear")
    zordered = str(tmp_path / "zorder")
    # linear baseline: range-sorted by a only
    (
        df.repartitionByRange(n_files, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(linear)
    )
    write_zordered(df, zordered, ["a", "b"], num_files=n_files, bits=6)

    # point predicate on the SECONDARY column b = 17
    def files_hit(path):
        stats = file_minmax(path, "b")
        assert stats, "parquet footer stats missing"
        return sum(1 for lo, hi in stats if lo <= 17 <= hi)

    hit_linear = files_hit(linear)
    hit_z = files_hit(zordered)
    # every linear file spans all of b; z-order confines b to stripes
    assert hit_linear == n_files
    assert hit_z <= n_files // 2
    # and the data round-trips unchanged
    got = sorted(r.payload for r in spark.read.parquet(zordered).collect())
    assert got == list(range(64 * 64))


def test_zorder_still_prunes_primary_column(spark, tmp_path):
    df = _grid_df(spark)
    path = str(tmp_path / "zorder2")
    write_zordered(df, path, ["a", "b"], num_files=16, bits=6)
    stats = file_minmax(path, "a")
    assert stats
    hit = sum(1 for lo, hi in stats if lo <= 5 <= hi)
    assert hit <= 8  # primary column keeps (weaker) pruning too


def test_load_full_zorder_layout(spark):
    import os

    from db_writer_redshift_spark.config.schema import ColumnItem, TableConfig
    from db_writer_redshift_spark.operators.writer import load_full

    cfg = TableConfig(
        table_id="grid",
        db_name="grid_z",
        items=(
            ColumnItem("a", "a", "bigint"),
            ColumnItem("b", "b", "bigint"),
            ColumnItem("payload", "payload", "bigint"),
        ),
    )
    load_full(spark, cfg, _grid_df(spark), zorder_by=["a", "b"], zorder_files=16)
    files = spark.table("grid_z").inputFiles()
    assert len(files) > 1
    path = os.path.dirname(files[0].replace("file:", ""))
    stats = file_minmax(path, "b")
    assert stats
    hit = sum(1 for lo, hi in stats if lo <= 17 <= hi)
    assert hit < len(stats)  # secondary column prunes inside the managed table
    assert spark.table("grid_z").count() == 64 * 64
    spark.sql("DROP TABLE grid_z")


def test_zorder_and_buckets_mutually_exclusive(spark):
    from db_writer_redshift_spark.config.schema import ColumnItem, TableConfig
    from db_writer_redshift_spark.operators.writer import load_full

    cfg = TableConfig(
        table_id="grid",
        db_name="grid_zb",
        items=(ColumnItem("a", "a", "bigint"),),
        primary_key=("a",),
    )
    with pytest.raises(ValueError):
        load_full(spark, cfg, _grid_df(spark), buckets=4, zorder_by=["a", "b"])


def test_morton_full_grid_bijection(spark):
    # every (x,y) in the 6-bit grid gets a distinct code equal to the
    # reference Python interleave
    df = _grid_df(spark).select("a", "b")
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", morton_interleave([F.col("a"), F.col("b")], 6).alias("z")
        ).collect()
    }

    def ref(x, y):
        z = 0
        for bit in range(6):
            z |= ((x >> bit) & 1) << (2 * bit)
            z |= ((y >> bit) & 1) << (2 * bit + 1)
        return z

    assert len(set(got.values())) == 64 * 64
    assert all(z == ref(x, y) for (x, y), z in got.items())


def test_with_zorder_rejects_non_numeric_column(spark):
    """A string clustering column would quantize to all-NULL and silently
    collapse the layout (ADVICE round 1) — it must fail loudly instead."""
    df = spark.createDataFrame([(1, "x"), (2, "y")], "a long, s string")
    with pytest.raises(ValueError, match="numeric/temporal"):
        with_zorder(df, ["a", "s"], bits=4)


def test_with_zorder_date_and_timestamp_columns(spark):
    """DATE goes through unix_date (no double cast in Spark 4); TIMESTAMP
    casts to epoch seconds — both quantize without error."""
    df = spark.createDataFrame(
        [(1, "2024-01-01", "2024-01-01 00:00:00"),
         (2, "2024-06-01", "2024-06-01 12:00:00"),
         (3, "2024-12-31", "2024-12-31 23:59:59")],
        "a long, d string, ts string",
    ).select(
        "a", F.col("d").cast("date"), F.col("ts").cast("timestamp").alias("ts")
    )
    rows = with_zorder(df, ["d", "ts"], bits=4).collect()
    zs = {r.a: r["__z"] for r in rows}
    assert len(set(zs.values())) == 3  # distinct dates land in distinct buckets
    assert all(z is not None and z >= 0 for z in zs.values())


def test_with_zorder_all_null_column_degrades_to_zero_bucket(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "a long, b double")
    rows = with_zorder(df, ["a", "b"], bits=4).collect()
    assert all(r["__z"] is not None for r in rows)


def test_write_sorted_gives_disjoint_file_ranges(spark, tmp_path):
    from db_writer_redshift_spark.operators.zorder import (
        file_minmax,
        files_overlap,
        write_sorted,
    )

    df = spark.range(0, 20000).selectExpr(
        "cast(id * 2654435761 % 100000 as long) as k", "id as payload"
    )
    out = str(tmp_path / "sorted_lake")
    write_sorted(df, out, ["k"], num_files=8)
    ranges = file_minmax(out, "k")
    assert len(ranges) == 8
    assert files_overlap(ranges) == 0  # total order: zero overlapping files
    # a point predicate could prune to exactly one file
    got = spark.read.parquet(out).count()
    assert got == 20000
