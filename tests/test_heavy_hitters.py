"""Two-pass Misra–Gries heavy hitters (operators/heavy_hitters.py)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from db_writer_redshift_spark.operators.heavy_hitters import heavy_hitters


def _items(spark, data, parts):
    return spark.createDataFrame([(x,) for x in data], "item string").repartition(parts)


def _truth(data, denom):
    n = len(data)
    return {k: c for k, c in Counter(data).items() if c * denom > n}


def test_matches_exact_counts(spark):
    data = ["a"] * 50 + ["b"] * 30 + ["c"] * 15 + [f"x{i}" for i in range(25)]
    got = {r.item: r.cnt for r in heavy_hitters(_items(spark, data, 4), "item", 8).collect()}
    assert got == _truth(data, 8)


def test_result_invariant_under_partitioning(spark):
    import random

    rng = random.Random(3)
    data = [rng.choice(["hh1"] * 6 + ["hh2"] * 4 + [f"t{i}" for i in range(40)]) for _ in range(2000)]
    outs = []
    for parts in (1, 7, 32):
        rows = heavy_hitters(_items(spark, data, parts), "item", 20).collect()
        outs.append(sorted((r.item, r.cnt, r.n_total) for r in rows))
    assert outs[0] == outs[1] == outs[2]
    assert {i for i, _, _ in outs[0]} == set(_truth(data, 20))


def test_no_heavy_hitters_yields_empty(spark):
    data = [f"u{i}" for i in range(100)]  # all unique: max freq 1 <= n/50
    assert heavy_hitters(_items(spark, data, 4), "item", 50).count() == 0


def test_capacity_floor_still_superset(spark):
    # capacity == threshold_denom (minimum that preserves the guarantee)
    data = ["a"] * 40 + [f"x{i}" for i in range(60)]
    got = {r.item: r.cnt for r in heavy_hitters(_items(spark, data, 5), "item", 4, capacity=4).collect()}
    assert got == _truth(data, 4)
