"""Incremental aggregate maintenance (operators/incremental.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_writer_redshift_spark.operators.incremental import (
    agg_state,
    incremental_update,
    merge_agg_state,
)

STATE = {
    "n": ("*", "count"),
    "total": ("v", "sum"),
    "lo": ("v", "min"),
    "hi": ("v", "max"),
}


def _rows(spark, data):
    return spark.createDataFrame(data, "g string, v int")


def _canon(df):
    return {r.g: (r.n, r.total, r.lo, r.hi) for r in df.collect()}


def test_incremental_equals_full_recompute(spark):
    import random

    rng = random.Random(7)
    data = [(rng.choice("abcd"), rng.randint(-50, 50)) for _ in range(300)]
    cut = 180
    full = agg_state(_rows(spark, data), ["g"], STATE)
    summary = agg_state(_rows(spark, data[:cut]), ["g"], STATE)
    refreshed = incremental_update(summary, _rows(spark, data[cut:]), ["g"], STATE)
    assert _canon(refreshed) == _canon(full)


def test_new_groups_appear_and_existing_update(spark):
    s = agg_state(_rows(spark, [("a", 1), ("a", 3)]), ["g"], STATE)
    out = incremental_update(s, _rows(spark, [("a", 5), ("z", 9)]), ["g"], STATE)
    assert _canon(out) == {"a": (3, 9, 1, 5), "z": (1, 9, 9, 9)}


def test_merge_is_associative_across_batches(spark):
    b = [_rows(spark, [(g, v)]) for g, v in [("a", 1), ("a", 2), ("b", 3)]]
    states = [agg_state(x, ["g"], STATE) for x in b]
    left = merge_agg_state(merge_agg_state(states[0], states[1], ["g"], STATE), states[2], ["g"], STATE)
    right = merge_agg_state(states[0], merge_agg_state(states[1], states[2], ["g"], STATE), ["g"], STATE)
    assert _canon(left) == _canon(right)


def test_rejects_non_combinable_kind(spark):
    with pytest.raises(ValueError, match="non-combinable"):
        agg_state(_rows(spark, [("a", 1)]), ["g"], {"m": ("v", "median")})


def test_count_star_counts_rows_with_nulls(spark):
    df = spark.createDataFrame([("a", None), ("a", 2)], "g string, v int")
    got = _canon(agg_state(df, ["g"], STATE))
    assert got == {"a": (2, 2, 2, 2)}  # count(*)=2, sum/min/max ignore NULL
