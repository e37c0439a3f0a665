"""Degenerate-input behavior of the round-2 operators: empty relations
must produce empty (or well-defined) results, never crash mid-plan."""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_heavy_hitters_empty_corpus(spark):
    from db_writer_redshift_spark.operators.heavy_hitters import heavy_hitters

    out = heavy_hitters(_empty(spark, "item string"), "item", 10)
    assert out.count() == 0


def test_scd2_apply_empty_snapshot_closes_nothing_by_delta_rule(spark):
    from db_writer_redshift_spark.operators import scd

    h = scd.scd2_init(spark.createDataFrame([(1, "A")], "k int, seg string"), ts=1)
    out = scd.scd2_apply(h, _empty(spark, "k int, seg string"), ["k"], ["seg"], ts=2)
    # full-snapshot semantics: absent key = deleted -> closed
    got = {(r.k, r.valid_from): r.is_current for r in out.collect()}
    assert got == {(1, 1): False}


def test_scd2_init_empty(spark):
    from db_writer_redshift_spark.operators import scd

    assert scd.scd2_init(_empty(spark, "k int, seg string"), ts=1).count() == 0


def test_retention_sweep_empty_fact(spark):
    from db_writer_redshift_spark.operators.retention import retention_sweep

    kept, _, audit = retention_sweep(
        _empty(spark, "k int, age int"), F.col("age") > 0, "k"
    )
    assert kept.count() == 0
    (row,) = audit.collect()
    assert (row.rows_before, row.rows_deleted, row.rows_kept) == (0, 0, 0)


def test_incremental_update_empty_delta_is_identity(spark):
    from db_writer_redshift_spark.operators.incremental import agg_state, incremental_update

    state = {"n": ("*", "count"), "s": ("v", "sum")}
    summary = agg_state(
        spark.createDataFrame([("a", 1), ("a", 2)], "g string, v int"), ["g"], state
    )
    out = incremental_update(summary, _empty(spark, "g string, v int"), ["g"], state)
    assert {(r.g, r.n, r.s) for r in out.collect()} == {("a", 2, 3)}


def test_pagerank_empty_edges(spark):
    from db_writer_redshift_spark.operators.pagerank import pagerank_int

    out = pagerank_int(_empty(spark, "s long, d long"), "s", "d", 2)
    assert out.count() == 0


def test_gram_summary_empty_embeddings(spark):
    from db_writer_redshift_spark.operators import linalg

    out = linalg.gram_summary(
        _empty(spark, "embedding array<float>"), "embedding", 4
    )
    assert out.count() == 0


def test_connected_components_empty_edges(spark):
    from db_writer_redshift_spark.operators.dedup import connected_components

    out = connected_components(_empty(spark, "doc_a bigint, doc_b bigint"))
    assert out.count() == 0


def test_rolling_active_users_empty_events(spark):
    """The fan-out/semi-join rolling-distinct shape on zero events yields
    an empty result, not a crash (sequence/explode over no rows)."""
    from pyspark.sql import functions as F

    du = _empty(spark, "d bigint, user_id bigint")
    spine = du.select("d").distinct()
    fan = du.select(
        F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("anchor_d"),
        "user_id",
    )
    w = fan.join(spine.withColumnRenamed("d", "anchor_d"), "anchor_d", "left_semi")
    assert w.groupBy("anchor_d").count().count() == 0


def test_copurchase_pairs_single_item_orders(spark):
    """Orders with one distinct part generate zero pairs (slice past the
    array end must return empty, not raise — ANSI mode)."""
    from pyspark.sql import functions as F

    op = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (3, 31)], "l_orderkey bigint, l_partkey bigint"
    )
    arr = op.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = arr.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> "
                "transform(slice(ps, i + 2, size(ps)), "
                "y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("pr")
    )
    got = {(r["pr"]["part_a"], r["pr"]["part_b"]) for r in pairs.collect()}
    assert got == {(30, 31)}


def test_quality_percentile_gate_empty_corpus(spark):
    from db_writer_redshift_spark.operators.text import quality_percentile_gate

    out = quality_percentile_gate(
        _empty(spark, "doc_id long, text string, source string"),
        "doc_id",
        "text",
        "source",
    )
    assert out.count() == 0


def test_minhash_cross_contamination_empty_eval(spark):
    from db_writer_redshift_spark.operators import dedup

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id int, text string"
    )
    out = dedup.minhash_cross_contamination(
        train, _empty(spark, "doc_id int, text string"), "doc_id", "text"
    )
    assert out.count() == 0


def test_minhash_cross_contamination_empty_train(spark):
    from db_writer_redshift_spark.operators import dedup

    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id int, text string"
    )
    out = dedup.minhash_cross_contamination(
        _empty(spark, "doc_id int, text string"), ev, "doc_id", "text"
    )
    assert out.count() == 0


def test_shingle_containment_empty_corpus(spark):
    from db_writer_redshift_spark.operators import dedup

    out = dedup.shingle_containment_pairs(
        _empty(spark, "doc_id long, text string"), "doc_id", "text"
    )
    assert out.count() == 0


def test_retraction_delta_empty_delta_is_identity(spark):
    from decimal import Decimal

    from pyspark.sql import functions as F

    from db_writer_redshift_spark.operators.incremental import (
        apply_retraction_delta,
    )

    base = spark.createDataFrame(
        [("a", Decimal("1.50"))], "g string, v decimal(18,4)"
    )
    summary = base.groupBy("g").agg(
        F.count("*").cast("long").alias("n_rows"), F.sum("v").alias("sv")
    )
    out = apply_retraction_delta(
        summary,
        _empty(spark, "g string, v decimal(18,4), mult long"),
        keys=["g"],
        mult_col="mult",
        sums={"sv": "v"},
    )
    assert [(r.g, r.n_rows, r.sv) for r in out.collect()] == [
        ("a", 1, Decimal("1.5000"))
    ]


def test_asof_tolerance_empty_right_keeps_left_outer(spark):
    from db_writer_redshift_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 1, 10)], "lid long, k long, ts long")
    out = asof_join(
        left,
        _empty(spark, "rid long, k long, ts long"),
        on="ts",
        by=["k"],
        right_cols=["rid"],
        direction="forward",
        tolerance=5,
    ).collect()
    assert [(r.lid, r.rid) for r in out] == [(1, None)]
