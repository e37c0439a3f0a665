"""Exact distributed selection (operators/selection.py)."""

from __future__ import annotations

import math
import random

import pytest

from db_writer_redshift_spark.operators.selection import kth_smallest, quantile_disc


def _df(spark, vals, parts=8):
    return spark.createDataFrame([(v,) for v in vals], "x long").repartition(parts)


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_pareto_frontier_dominance_and_ties(spark):
    """Skyline contract: (1) dominated points never appear; (2) a point
    tying the frontier max_y at lower x is dominated (strict > rule);
    (3) co-located rows collapse into n_docs; (4) frontier_rank orders
    by x descending; (5) groups are independent."""
    from db_writer_redshift_spark.operators.selection import pareto_frontier

    rows = [
        # group a: frontier = (9,1), (5,7), (2,9)
        ("a", 9, 1), ("a", 5, 7), ("a", 2, 9),
        ("a", 4, 7),   # y ties a higher-x frontier point -> dominated
        ("a", 3, 5),   # strictly dominated
        ("a", 5, 7),   # duplicate of a frontier point -> n_docs=2
        ("a", 5, 2),   # same x, lower y -> dominated
        # group b: single point
        ("b", 1, 1),
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {
        (r.g, r.x): r for r in pareto_frontier(df, "g", "x", "y").collect()
    }
    assert set(out) == {("a", 9), ("a", 5), ("a", 2), ("b", 1)}
    assert out[("a", 5)].max_y == 7 and out[("a", 5)].n_docs == 2
    assert out[("a", 9)].n_docs == 1
    ranks = {k: v.frontier_rank for k, v in out.items()}
    assert ranks[("a", 9)] == 1 and ranks[("a", 5)] == 2 and ranks[("a", 2)] == 3
    assert ranks[("b", 1)] == 1


@pytest.mark.slow
def test_quantiles_disc_multi_matches_single_probes(spark):
    """The shared-round multi-quantile quickselect is bit-equal to the
    one-at-a-time quantile_disc for every target, including duplicate
    and extreme quantiles."""
    from db_writer_redshift_spark.operators.selection import (
        quantile_disc,
        quantiles_disc_multi,
    )

    df = spark.createDataFrame(
        [(v,) for v in [5, 1, 9, 9, 3, 7, 2, 8, 1000000, -4, 0, 9]], "v long"
    )
    qs = [0.1, 0.25, 0.5, 0.5, 0.75, 0.9, 1.0]
    assert quantiles_disc_multi(df, "v", qs) == [
        quantile_disc(df, "v", q) for q in qs
    ]


def test_quantiles_disc_multi_validates_inputs(spark):
    import pytest

    from db_writer_redshift_spark.operators.selection import quantiles_disc_multi

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError):
        quantiles_disc_multi(df, "v", [0.0])
    empty = spark.createDataFrame([], "v long")
    with pytest.raises(ValueError):
        quantiles_disc_multi(empty, "v", [0.5])


@pytest.mark.slow
def test_kths_smallest_multi_adjacent_ranks(spark):
    """Adjacent order statistics (the percentile_cont anchors) resolve
    correctly in one shared pass, including duplicate ranks and the
    max rank."""
    from db_writer_redshift_spark.operators.selection import (
        kth_smallest,
        kths_smallest_multi,
    )

    vals = [5, 1, 9, 9, 3, 7, 2, 8, 0, 4]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    ks = [1, 2, 5, 6, 6, 10]
    assert kths_smallest_multi(df, "v", ks) == [
        kth_smallest(df, "v", k) for k in ks
    ]


def test_quantiles_cont_interpolation_identity(spark):
    """interp_cents_e2 == 100*v_lo + rem*(v_hi - v_lo) with rem from the
    percentile position, and v_lo <= interp/100 <= v_hi; p50 of an even
    count sits strictly between distinct middle values."""
    import os

    import __spark_entry__ as entry_mod

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = entry_mod.queries()["quantiles_cont_order_price"](spark, sf).collect()
    n = spark.read.parquet(f"{sf}/orders.parquet").count()
    assert {r.pct for r in rows} == {50, 90, 99}
    for r in rows:
        rem = (r.pct * (n - 1)) % 100
        assert r.interp_cents_e2 == 100 * r.v_lo_cents + rem * (
            r.v_hi_cents - r.v_lo_cents
        )
        assert 100 * r.v_lo_cents <= r.interp_cents_e2 <= 100 * r.v_hi_cents


@pytest.mark.slow
def test_weighted_kth_matches_expanded_multiset(spark):
    """Weighted k-th smallest == unweighted k-th over the weight-expanded
    multiset, for every k in range."""
    from db_writer_redshift_spark.operators.selection import (
        kth_smallest,
        kth_weighted_smallest,
    )

    rows = [(10, 3), (20, 1), (5, 2), (40, 4)]
    df = spark.createDataFrame(rows, "v long, w long")
    expanded = sorted(v for v, w in rows for _ in range(w))
    flat = spark.createDataFrame([(v,) for v in expanded], "v long")
    for k in (1, 2, 3, 5, 6, 10):
        assert (
            kth_weighted_smallest(df, "v", "w", k)
            == kth_smallest(flat, "v", k)
            == expanded[k - 1]
        )


def test_weighted_quantile_validates(spark):
    import pytest

    from db_writer_redshift_spark.operators.selection import (
        weighted_quantile_disc,
    )

    df = spark.createDataFrame([(1, 1)], "v long, w long")
    with pytest.raises(ValueError):
        weighted_quantile_disc(df, "v", "w", 0.0)


def test_weighted_multi_matches_single_probes(spark):
    from db_writer_redshift_spark.operators.selection import (
        kth_weighted_smallest,
        weighted_quantiles_disc_multi,
    )
    import math

    rows = [(10, 3), (20, 1), (5, 2), (40, 4)]
    df = spark.createDataFrame(rows, "v long, w long")
    total = sum(w for _, w in rows)
    qs = [0.1, 0.5, 0.5, 0.9, 1.0]
    got = weighted_quantiles_disc_multi(df, "v", "w", qs)
    want = [
        kth_weighted_smallest(df, "v", "w", max(1, math.ceil(q * total - 1e-9)))
        for q in qs
    ]
    assert got == want
