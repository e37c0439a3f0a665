"""Method-invariant tests for the lake-engineering audits
(plans/lake_ops.py) — the properties the DuckDB oracles can't express:
the Morton SQL/DataFrame bit-placement agreement, the min/max pruning
superset guarantee (skipped files can never contain matching rows), the
Z-order both-dims advantage, run-count algebra replayed in pure Python,
and g3's exact optimality on a constructed relation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from db_writer_redshift_spark.plans import QUERIES
from db_writer_redshift_spark.plans.lake_ops import (
    _CUST_HI,
    _CUST_LO,
    _DATE_HI,
    _DATE_LO,
    _ZBITS,
    _zorder_morton_sql,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata missing: {SF_DIR}"
)


def _run(spark, name):
    return QUERIES[name].fn(spark, SF_DIR)


# ---------------------------------------------------------------------------
# Z-order pruning audit
# ---------------------------------------------------------------------------


def _py_morton(qx: int, qd: int, bits: int = _ZBITS) -> int:
    code = 0
    for b in range(bits):
        code |= ((qx >> b) & 1) << (2 * b)
        code |= ((qd >> b) & 1) << (2 * b + 1)
    return code


def test_morton_sql_matches_python_reference():
    """The oracle's interleave expression, evaluated as Python arithmetic,
    must place bit b of x at 2b and of y at 2b+1 — the same contract
    operators/zorder.morton_interleave documents."""
    expr = _zorder_morton_sql("qx", "qd")
    for qx, qd in [(0, 0), (255, 0), (0, 255), (170, 85), (1, 2), (200, 13)]:
        got = eval(expr, {}, {"qx": qx, "qd": qd})  # noqa: S307 - test-local
        assert got == _py_morton(qx, qd), (qx, qd)


def test_zorder_pruning_superset_and_advantage(spark):
    """File-level min/max pruning may only ever OVER-approximate: rows in
    hit files >= rows actually matching the probe, identically for every
    layout. And the audit's reason to exist: the z-order layout prunes
    BOTH probes, while each linear layout leaves the other probe at full
    file count."""
    out = {r["layout"]: r for r in _run(spark, "layout_zorder_pruning").collect()}
    assert set(out) == {"zorder", "linear_custkey", "linear_date"}

    n_total = out["zorder"]["total_rows"]
    for r in out.values():
        assert r["total_rows"] == n_total
        assert 0 < r["n_files"] <= 64
        assert r["files_hit_cust"] <= r["n_files"]
        assert r["files_hit_date"] <= r["n_files"]
        assert r["rows_hit_cust"] <= n_total
        assert r["rows_hit_date"] <= n_total

    # Superset guarantee against the true matching-row counts.
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    top = (1 << _ZBITS) - 1
    ext = orders.agg(
        F.min("o_custkey").alias("kmin"),
        F.max("o_custkey").alias("kmax"),
        F.min(F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))).alias(
            "dmin"
        ),
        F.max(F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))).alias(
            "dmax"
        ),
    )
    q = orders.crossJoin(F.broadcast(ext)).select(
        F.expr(f"((o_custkey - kmin) * {top}) div (kmax - kmin)").alias("qx"),
        F.expr(
            "((datediff(to_date(o_orderdate), to_date('1970-01-01')) - dmin)"
            f" * {top}) div (dmax - dmin)"
        ).alias("qd"),
    )
    true_cust = q.filter(
        (F.col("qx") >= _CUST_LO) & (F.col("qx") <= _CUST_HI)
    ).count()
    true_date = q.filter(
        (F.col("qd") >= _DATE_LO) & (F.col("qd") <= _DATE_HI)
    ).count()
    for r in out.values():
        assert r["rows_hit_cust"] >= true_cust, r["layout"]
        assert r["rows_hit_date"] >= true_date, r["layout"]

    # Each linear layout is blind on the other dimension (every file
    # spans the full other-dim range), z-order prunes both.
    lc, ld, z = out["linear_custkey"], out["linear_date"], out["zorder"]
    assert lc["files_hit_date"] == lc["n_files"]
    assert ld["files_hit_cust"] == ld["n_files"]
    assert z["files_hit_cust"] < lc["files_hit_date"]
    assert z["files_hit_date"] < ld["files_hit_cust"]


# ---------------------------------------------------------------------------
# RLE / dictionary encoding advisor
# ---------------------------------------------------------------------------


def test_rle_stats_algebra_and_python_replay(spark):
    rows = {r["col"]: r for r in _run(spark, "storage_rle_dict_stats").collect()}
    assert set(rows) == {"l_returnflag", "l_linestatus", "l_shipday", "l_partkey"}
    for r in rows.values():
        # every distinct value starts at least one run; a run needs a row
        assert r["n_distinct"] <= r["n_runs"] <= r["n_rows"]
        assert 0 < r["top_share_ppm"] <= 1_000_000
        assert 0 < r["run_ratio_ppm"] <= 1_000_000
        assert r["dict_bits"] == max(r["n_distinct"] - 1, 0).bit_length()

    # Pure-Python replay of the run count for l_returnflag under the
    # query's deterministic order.
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_linestatus",
            F.expr(
                "CAST(datediff(to_date(l_shipdate), to_date('1970-01-01'))"
                " AS STRING)"
            ).alias("shipday"),
            F.col("l_partkey").cast("string").alias("partkey"),
        )
        .collect()
    )
    li.sort(
        key=lambda r: (
            r["l_orderkey"],
            r["l_linenumber"],
            r["partkey"],
            r["shipday"],
            r["l_returnflag"],
            r["l_linestatus"],
        )
    )
    runs = 0
    prev_key = None
    prev_v = None
    for r in li:
        if r["l_orderkey"] != prev_key or r["l_returnflag"] != prev_v:
            runs += 1
        prev_key, prev_v = r["l_orderkey"], r["l_returnflag"]
    assert rows["l_returnflag"]["n_runs"] == runs


# ---------------------------------------------------------------------------
# Functional-dependency discovery
# ---------------------------------------------------------------------------


def test_fd_key_has_zero_g3_and_violations_consistent(spark):
    rows = {
        (r["tbl"], r["determinant"], r["dependent"]): r
        for r in _run(spark, "dq_functional_dependencies").collect()
    }
    key = rows[("orders", "o_orderkey", "o_orderstatus")]
    assert key["n_violating_groups"] == 0
    assert key["g3_delete_rows"] == 0
    assert key["max_distinct_dep"] == 1
    for r in rows.values():
        assert r["n_groups"] <= r["n_rows"]
        assert 0 <= r["g3_delete_rows"] < r["n_rows"]
        assert (r["n_violating_groups"] == 0) == (r["g3_delete_rows"] == 0)
        assert 0 <= r["violation_ppm"] <= 1_000_000
        assert 0 <= r["g3_ppm"] <= 1_000_000


def test_fd_g3_is_exact_minimum_on_constructed_relation(spark):
    """g3 = sum over groups of (size - heaviest class) is the exact
    minimum row-deletion repair; verify against brute force on a tiny
    constructed relation with a known answer."""
    data = [
        ("a", "x"),
        ("a", "x"),
        ("a", "y"),  # group a: keep 2, delete 1
        ("b", "z"),
        ("b", "z"),  # group b: clean
        ("c", "p"),
        ("c", "q"),
        ("c", "q"),
        ("c", "q"),
        ("c", "r"),  # group c: keep 3, delete 2
    ]
    from collections import Counter

    expected = 0
    by_det: dict[str, Counter] = {}
    for det, dep in data:
        by_det.setdefault(det, Counter())[dep] += 1
    for c in by_det.values():
        expected += sum(c.values()) - max(c.values())
    assert expected == 3

    df = spark.createDataFrame(data, ["det_v", "dep_v"])
    cell = df.groupBy("det_v", "dep_v").agg(F.count("*").alias("c"))
    grp = cell.groupBy("det_v").agg(
        F.sum("c").alias("n"), F.max("c").alias("keep")
    )
    g3 = grp.agg(F.sum(F.col("n") - F.col("keep"))).collect()[0][0]
    assert g3 == expected
