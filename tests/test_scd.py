"""SCD2 history-preserving merge (operators/scd.py)."""

from __future__ import annotations

import pytest

from db_writer_redshift_spark.operators import scd

COLS = "k int, seg string"


def _snap(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _by_key(df):
    return {
        (r.k, r.valid_from): (r.seg, r.valid_to, r.is_current)
        for r in df.collect()
    }


def test_init_opens_every_row(spark):
    h = scd.scd2_init(_snap(spark, [(1, "A"), (2, "B")]), ts=100)
    got = _by_key(h)
    assert got == {(1, 100): ("A", None, True), (2, 100): ("B", None, True)}


def test_apply_classifies_all_four_cases(spark):
    h0 = scd.scd2_init(_snap(spark, [(1, "A"), (2, "B"), (3, "C")]), ts=100)
    # 1 unchanged, 2 changed, 3 deleted, 4 inserted
    snap = _snap(spark, [(1, "A"), (2, "B2"), (4, "D")])
    h1 = scd.scd2_apply(h0, snap, keys=["k"], tracked=["seg"], ts=200)
    got = _by_key(h1)
    assert got == {
        (1, 100): ("A", None, True),
        (2, 100): ("B", 200, False),
        (2, 200): ("B2", None, True),
        (3, 100): ("C", 200, False),
        (4, 200): ("D", None, True),
    }


def test_apply_is_idempotent_for_identical_snapshot(spark):
    h0 = scd.scd2_init(_snap(spark, [(1, "A"), (2, "B")]), ts=100)
    snap = _snap(spark, [(1, "A"), (2, "B")])
    h1 = scd.scd2_apply(h0, snap, keys=["k"], tracked=["seg"], ts=200)
    assert _by_key(h1) == _by_key(h0)


def test_closed_history_is_never_reopened(spark):
    h0 = scd.scd2_init(_snap(spark, [(1, "A")]), ts=100)
    h1 = scd.scd2_apply(h0, _snap(spark, [(1, "B")]), ["k"], ["seg"], ts=200)
    # key 1 flips back to its original value: old closed rows stay closed
    h2 = scd.scd2_apply(h1, _snap(spark, [(1, "A")]), ["k"], ["seg"], ts=300)
    got = _by_key(h2)
    assert got == {
        (1, 100): ("A", 200, False),
        (1, 200): ("B", 300, False),
        (1, 300): ("A", None, True),
    }


def test_as_of_and_current_views(spark):
    h0 = scd.scd2_init(_snap(spark, [(1, "A"), (2, "B")]), ts=100)
    h1 = scd.scd2_apply(h0, _snap(spark, [(1, "A2")]), ["k"], ["seg"], ts=200)
    as_of_150 = {r.k: r.seg for r in scd.scd2_as_of(h1, 150).collect()}
    assert as_of_150 == {1: "A", 2: "B"}
    current = {r.k: r.seg for r in scd.scd2_current(h1).collect()}
    assert current == {1: "A2"}  # key 2 deleted at 200


def test_null_tracked_values_compare_null_safely(spark):
    h0 = scd.scd2_init(_snap(spark, [(1, None)]), ts=100)
    h1 = scd.scd2_apply(h0, _snap(spark, [(1, None)]), ["k"], ["seg"], ts=200)
    assert _by_key(h1) == {(1, 100): (None, None, True)}
    h2 = scd.scd2_apply(h1, _snap(spark, [(1, "X")]), ["k"], ["seg"], ts=300)
    assert _by_key(h2) == {
        (1, 100): (None, 300, False),
        (1, 300): ("X", None, True),
    }


def test_rejects_empty_keys_and_missing_columns(spark):
    h0 = scd.scd2_init(_snap(spark, [(1, "A")]), ts=100)
    with pytest.raises(ValueError, match="at least one key"):
        scd.scd2_apply(h0, _snap(spark, [(1, "A")]), [], ["seg"], ts=200)
    bad = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="missing history columns"):
        scd.scd2_apply(h0, bad, ["k"], ["seg"], ts=200)
