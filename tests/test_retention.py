"""Retention sweep with referential cascade (operators/retention.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_writer_redshift_spark.operators.retention import retention_sweep


def _fact(spark):
    return spark.createDataFrame(
        [(1, 10), (2, 20), (3, None), (4, 40)], "k int, age int"
    )


def _child(spark):
    return spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (4, "d"), (9, "orphan")], "fk int, v string"
    )


def test_sweep_cascades_and_audits(spark):
    kept, (kept_child,), audit = retention_sweep(
        _fact(spark), F.col("age") >= 30, "k", children=[(_child(spark), "fk")]
    )
    assert sorted(r.k for r in kept.collect()) == [1, 2, 3]
    assert sorted((r.fk, r.v) for r in kept_child.collect()) == [
        (1, "a"),
        (1, "b"),
        (2, "c"),
        (9, "orphan"),
    ]
    got = {r.rel: (r.rows_before, r.rows_deleted, r.rows_kept) for r in audit.collect()}
    assert got == {"fact": (4, 1, 3), "child_0": (5, 1, 4)}


def test_null_predicate_means_keep(spark):
    # k=3 has age NULL: the predicate evaluates NULL -> row is KEPT
    kept, _, audit = retention_sweep(_fact(spark), F.col("age") > 0, "k")
    assert sorted(r.k for r in kept.collect()) == [3]
    (row,) = audit.collect()
    assert (row.rows_before, row.rows_deleted, row.rows_kept) == (4, 3, 1)


def test_no_children_returns_empty_list(spark):
    kept, children, audit = retention_sweep(_fact(spark), F.lit(False), "k")
    assert children == []
    assert kept.count() == 4
    assert audit.collect()[0].rows_deleted == 0
