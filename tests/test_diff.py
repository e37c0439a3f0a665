"""snapshot_diff unit contract: classification, null-safety, unchanged
rows excluded, composite keys."""

from __future__ import annotations

import pytest

from db_writer_redshift_spark.operators.diff import snapshot_diff


def _collect(df):
    return {
        tuple(r[k] for k in df.columns if k != "change_type"): r["change_type"]
        for r in df.collect()
    }


def test_insert_delete_update_unchanged(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, s string, v double"
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", 40.0)], "k int, s string, v double"
    )
    out = snapshot_diff(old, new, ["k"])
    got = {r["k"]: r["change_type"] for r in out.collect()}
    assert got == {2: "update", 3: "delete", 4: "insert"}  # 1 unchanged -> absent
    vals = {r["k"]: (r["s"], r["v"]) for r in out.collect()}
    assert vals[2] == ("B", 20.0)  # new side's values
    assert vals[3] == (None, None)  # delete carries NULL values


def test_null_safe_compare(spark):
    old = spark.createDataFrame([(1, None), (2, "x"), (3, None)], "k int, s string")
    new = spark.createDataFrame([(1, None), (2, None), (3, "y")], "k int, s string")
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    # NULL->NULL unchanged; value->NULL and NULL->value are updates
    assert got == {2: "update", 3: "update"}


def test_composite_pk(spark):
    old = spark.createDataFrame([(1, 1, "a"), (1, 2, "b")], "k1 int, k2 int, s string")
    new = spark.createDataFrame([(1, 1, "a"), (2, 1, "c")], "k1 int, k2 int, s string")
    got = {
        (r["k1"], r["k2"]): r["change_type"]
        for r in snapshot_diff(old, new, ["k1", "k2"]).collect()
    }
    assert got == {(1, 2): "delete", (2, 1): "insert"}


def test_empty_pk_rejected(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError):
        snapshot_diff(df, df, [])
