"""Exact distributed selection (operators/selection.py)."""

from __future__ import annotations

import math
import random

import pytest

from db_writer_redshift_spark.operators.selection import kth_smallest, quantile_disc


def _df(spark, vals, parts=8):
    return spark.createDataFrame([(v,) for v in vals], "x long").repartition(parts)


def test_kth_matches_sorted_reference(spark):
    rng = random.Random(11)
    vals = [rng.randint(-10**9, 10**9) for _ in range(5000)]
    df = _df(spark, vals)
    ref = sorted(vals)
    for k in (1, 2, 17, 2500, 4999, 5000):
        assert kth_smallest(df, "x", k) == ref[k - 1]


def test_heavy_duplicates_and_tiny_range(spark):
    vals = [5] * 100 + [7] * 50 + [6] * 3
    df = _df(spark, vals, parts=4)
    ref = sorted(vals)
    for k in (1, 100, 101, 103, 104, 153):
        assert kth_smallest(df, "x", k) == ref[k - 1]


def test_quantile_disc_matches_duckdb(spark):
    import duckdb

    rng = random.Random(5)
    vals = [rng.randint(0, 10**6) for _ in range(3001)]
    df = _df(spark, vals)
    con = duckdb.connect()
    for q in (0.1, 0.5, 0.9, 0.999, 1.0):
        ref = con.execute(
            "SELECT quantile_disc(x, ?) FROM (SELECT unnest(?) AS x)", [q, vals]
        ).fetchone()[0]
        assert quantile_disc(df, "x", q) == ref, q


def test_nulls_are_ignored_and_bounds_checked(spark):
    df = spark.createDataFrame([(1,), (None,), (3,)], "x long")
    assert kth_smallest(df, "x", 2) == 3
    with pytest.raises(ValueError, match="out of range"):
        kth_smallest(df, "x", 3)
    with pytest.raises(ValueError, match="q must be"):
        quantile_disc(df, "x", 0.0)
