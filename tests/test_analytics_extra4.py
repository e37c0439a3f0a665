"""Invariant tests for the round-8 analytics batch — properties the
DuckDB oracle equality (tests/test_queries_oracle.py) cannot express:
bounds, monotonicity, convergence, and cross-column consistency."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod
from db_writer_redshift_spark.plans.analytics_extra4 import _holt_fold

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata missing: {SF_DIR}"
)


def _rows(spark, name):
    return entry_mod.queries()[name](spark, SF_DIR).collect()


def test_holt_constant_series_converges():
    # constant series: trend decays to 0 and the forecast locks to
    # 1000*c (exact, because the halving consumes the even residual)
    out = _holt_fold([(i, 7) for i in range(40)])
    assert out[-1][2] == 7000 and out[-1][3] == 7000
    # trend implied by successive levels is 0 at the tail
    assert out[-1][3] - out[-2][3] == 0


def test_holt_linear_ramp_tracks():
    # y = 10 + 3t: after burn-in the one-step-ahead forecast stays
    # within one unit (1000 e3) of the true next value
    series = [(t, 10 + 3 * t) for t in range(50)]
    out = _holt_fold(series)
    for (t, y, fc, _lvl) in out[20:]:
        assert abs(fc - 1000 * y) <= 1000, (t, y, fc)


def test_holt_short_series_empty():
    assert _holt_fold([(0, 1), (1, 2)]) == []


def test_kappa_bounds_and_consistency(spark):
    (r,) = _rows(spark, "stats_cohens_kappa_value_weekend")
    assert r.n == r.n11 + r.n10 + r.n01 + r.n00
    assert -1_000_000 <= r.kappa_ppm <= 1_000_000
    assert 0 <= r.po_ppm <= 1_000_000 and 0 <= r.pe_ppm <= 1_000_000
    # kappa reproduces from the contingency (same floor arithmetic)
    num = 1_000_000 * (r.n * (r.n11 + r.n00)
                       - ((r.n11 + r.n10) * (r.n11 + r.n01)
                          + (r.n01 + r.n00) * (r.n10 + r.n00)))
    den = r.n * r.n - ((r.n11 + r.n10) * (r.n11 + r.n01)
                       + (r.n01 + r.n00) * (r.n10 + r.n00))
    # both engines' integer division truncates toward zero
    tdiv = lambda a, b: abs(a) // abs(b) * (1 if (a >= 0) == (b >= 0) else -1)  # noqa: E731
    assert den != 0 and r.kappa_ppm == tdiv(num, den)


def test_kmv_error_within_sketch_bound(spark):
    (r,) = _rows(spark, "sketch_kmv_distinct_portable")
    assert r.k_used <= r.k and r.est_distinct > 0
    # Beyer et al. 2007: relative error concentrates around 1/sqrt(k-2)
    # (~6.3% for k=256); 5 sigma gives a deterministic-fixture margin
    assert abs(r.err_ppm) < 320_000, r
    # the k-th hash is a real hash value inside the domain
    assert 0 < r.kth_hash < (1 << 31) - 1


def test_gini_split_bounds_and_partition(spark):
    rows = _rows(spark, "stats_gini_impurity_split")
    assert len(rows) == 4
    n = rows[0].n_left + rows[0].n_right
    for r in rows:
        assert r.n_left + r.n_right == n
        # 3 classes: weighted Gini in [0, 2/3]
        assert 0 <= r.gini_weighted_e6 <= 666_667
    # left size grows with the quantile threshold
    by_q = sorted(rows, key=lambda r: r.quantile_pct)
    assert all(a.n_left < b.n_left for a, b in zip(by_q, by_q[1:]))
    assert all(a.threshold_cents <= b.threshold_cents
               for a, b in zip(by_q, by_q[1:]))


def test_prefix_energy_monotone_and_total(spark):
    rows = _rows(spark, "embedding_prefix_norm_curve")
    from collections import defaultdict

    by_label = defaultdict(dict)
    for r in rows:
        by_label[r.label][r.k] = r
    for label, ks in by_label.items():
        assert sorted(ks) == [4, 8, 16, 32, 64]
        fracs = [ks[k].energy_frac_ppm for k in (4, 8, 16, 32, 64)]
        assert all(a <= b for a, b in zip(fracs, fracs[1:])), (label, fracs)
        assert fracs[-1] == 1_000_000  # full prefix is all the energy
        assert ks[64].energy_prefix_e6 == ks[64].energy_total_e6


def test_levenshtein_pairs_well_formed(spark):
    rows = _rows(spark, "er_levenshtein_verify")
    assert rows, "blocked candidates expected on the part fixture"
    for r in rows:
        assert r.key_a < r.key_b
        assert 1 <= r.dist <= 3
        assert 0 < r.sim_ppm < 1_000_000
        assert r.sim_ppm == (1_000_000 * (r.maxlen - r.dist)) // r.maxlen


def test_ols_r2_bounds_and_sign(spark):
    (r,) = _rows(spark, "stats_ols_discount_quantity")
    assert 0 <= r.r2_ppm <= 1_000_000
    cov_n = r.n * r.sxy - r.sx * r.sy
    assert (r.slope_ppm >= 0) == (cov_n >= 0)
    # moments are internally consistent Cauchy-Schwarz: cov^2 <= varx*vary
    varx = r.n * r.sxx - r.sx * r.sx
    vary = r.n * r.syy - r.sy * r.sy
    assert cov_n * cov_n <= varx * vary


def test_entropy_terms_nonneg_and_bounded(spark):
    import math

    rows = _rows(spark, "privacy_entropy_l_diversity")
    from collections import defaultdict

    per_group = defaultdict(list)
    for r in rows:
        assert r.h_term_e9 >= 0
        assert 1 <= r.n_svals <= 5
        per_group[(r.seg, r.nat)].append(r)
    for (seg, nat), cells in per_group.items():
        n = cells[0].n
        assert sum(c.c for c in cells) == n
        h = sum(c.h_term_e9 for c in cells)
        # entropy can't exceed ln(#distinct svals) (+ rounding slack)
        assert h <= 1_000_000_000 * math.log(cells[0].n_svals) + len(cells)


def test_fano_positive(spark):
    rows = _rows(spark, "events_fano_factor_daily")
    assert rows
    for r in rows:
        assert r.fano_e6 >= 0 and r.n_days >= 2 and r.n_events > 0


def test_mode_and_disc_median_are_group_values(spark):
    rows = _rows(spark, "agg_mode_percentile_disc")
    spark_df = entry_mod.queries()["agg_mode_percentile_disc"]
    from pyspark.sql import functions as F

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    cents = orders.select(
        F.col("o_orderpriority").alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderstatus",
    )
    for r in rows:
        grp = cents.filter(F.col("g") == r.o_orderpriority)
        # the DISC median is an actual value of the group
        assert grp.filter(F.col("cents") == r.median_cents).count() > 0
        # the mode really is an argmax status (ties broken by min value)
        counts = {
            row["o_orderstatus"]: row["cnt"]
            for row in grp.groupBy("o_orderstatus")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        best = max(counts.values())
        assert counts[r.mode_status] == best
        assert r.mode_status == min(s for s, c in counts.items() if c == best)


def test_pipe_syntax_equals_ansi_sql(spark):
    # engine-internal cross-dialect check: the |> chain and the ANSI
    # statement must return identical rows (the oracle proves it against
    # DuckDB; this proves it within Spark itself)
    rows_pipe = {
        tuple(r) for r in _rows(spark, "pipe_syntax_orders_rollup")
    }
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    orders.createOrReplaceTempView("pipe_test_orders")
    rows_ansi = {
        tuple(r)
        for r in spark.sql(
            "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,"
            " CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
            " AS total_cents,"
            " CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers"
            " FROM pipe_test_orders WHERE o_orderstatus <> 'F'"
            " GROUP BY o_orderpriority"
        ).collect()
    }
    assert rows_pipe == rows_ansi


@pytest.mark.slow
def test_ingest_roundtrips_exercise_both_date_branches(spark):
    # the date-format alternation is key parity; both parities must be
    # present in each slice or the lenient-parse branch is untested
    for name, mod in (("ingest_xml_orders_roundtrip", 97),
                      ("ingest_jsonl_orders_roundtrip", 89)):
        rows = _rows(spark, name)
        assert rows
        parities = {r.okey % 2 for r in rows}
        assert parities == {0, 1}, f"{name}: only one date branch exercised"
        assert all(r.odate_day is not None for r in rows)  # every format parsed


def test_range_interval_frame_week_bounded(spark):
    rows = _rows(spark, "window_range_interval_trailing7d")
    assert rows
    from collections import defaultdict

    daily = defaultdict(dict)
    for r in rows:
        assert 1 <= r.trail7_days <= 7
        assert r.trail7_cents >= r.daily_cents  # values are positive
        daily[r.event_type][r.day_idx] = r
    # recompute one type's trailing sum from its own daily rows — the
    # RANGE frame must equal the brute per-day 7-day sum (day keys are
    # epoch-day BIGINTs per the graded-window envelope)
    t, days = next(iter(daily.items()))
    for d, r in days.items():
        expect = sum(
            days[e].daily_cents
            for e in days
            if 0 <= d - e <= 6
        )
        assert r.trail7_cents == expect, (t, d)


def test_filter_clause_consistent_with_unfiltered(spark):
    rows = _rows(spark, "agg_filter_clause_rollup")
    assert rows
    for r in rows:
        assert r.n_f + r.n_o <= r.n_all
        assert r.cents_f >= 0 and r.custs_o <= r.n_o


def test_simpson_bounds(spark):
    rows = _rows(spark, "text_simpson_diversity")
    assert rows
    for r in rows:
        assert 0 <= r.simpson_e9 <= 1_000_000_000
        assert r.simpson_e9 + r.gini_simpson_e9 == 1_000_000_000
        assert r.n_types <= r.n_tokens


def test_ntile_deciles_partition_and_order(spark):
    rows = sorted(_rows(spark, "window_ntile_decile_stats"),
                  key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    sizes = [r.n for r in rows]
    n = sum(sizes)
    # NTILE: first n mod 10 buckets are one larger
    big, small = -(-n // 10), n // 10
    assert all(s in (big, small) for s in sizes)
    assert sizes == sorted(sizes, reverse=True)
    # value ranges are ordered (ties may straddle a boundary, so <=)
    for a, b in zip(rows, rows[1:]):
        assert a.max_cents <= b.min_cents
        assert a.min_cents <= a.max_cents


def test_welch_nonneg(spark):
    (r,) = _rows(spark, "stats_welch_t_weekend")
    assert r.t2_e6 >= 0 and r.a1 >= 0 and r.a2 >= 0
    assert r.n_weekend > 0 and r.n_weekday > 0


def test_transition_entropy_rows_consistent(spark):
    import math

    rows = _rows(spark, "events_transition_entropy")
    assert rows
    from collections import defaultdict

    per_from = defaultdict(list)
    for r in rows:
        assert r.h_term_e9 >= 0
        per_from[r.from_type].append(r)
    for ft, cells in per_from.items():
        n = cells[0].n_from
        assert sum(c.c for c in cells) == n
        h = sum(c.h_term_e9 for c in cells)
        assert h <= 1_000_000_000 * math.log(len(cells)) + len(cells) if len(cells) > 1 else h == 0


def test_ntile_quickselect_equals_window_form(spark):
    # the scalable boundary-comparison assignment must be bit-equal to
    # the literal NTILE window on the same total order
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    v = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = W.orderBy("cents", "o_orderkey")
    ref = {
        (r.decile, r.n, r.min_cents, r.max_cents, r.sum_cents)
        for r in v.select("cents", F.ntile(10).over(w).alias("dec"))
        .groupBy("dec")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .select(
            F.col("dec").cast("long").alias("decile"),
            "n",
            "min_cents",
            "max_cents",
            "sum_cents",
        )
        .collect()
    }
    got = {tuple(r) for r in _rows(spark, "window_ntile_decile_stats")}
    assert got == ref


@pytest.mark.slow
def test_ntile_forced_quickselect_path_equals_window(spark):
    # the scale path must stay bit-equal even when the sort cutoff would
    # normally choose the window form
    from pyspark.sql import functions as F
    from db_writer_redshift_spark.plans.analytics_extra4 import (
        _ntile_decile_stats,
    )

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    v = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    a = {tuple(r) for r in _ntile_decile_stats(v).collect()}
    b = {tuple(r) for r in _ntile_decile_stats(v, force_quickselect=True).collect()}
    assert a == b


@pytest.mark.slow
def test_kappa_forced_quickselect_path_equals_window(spark):
    # the scale path (kths_smallest_multi median) must stay bit-equal to
    # the cume_dist window form below the cutoff
    from pyspark.sql import functions as F
    from db_writer_redshift_spark.plans.analytics_extra4 import (
        _kappa_from_events,
    )

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).select(
        F.round(F.col("value") * 1_000_000).cast("long").alias("v"),
        F.col("ts"),
    )
    a = {tuple(r) for r in _kappa_from_events(ev).collect()}
    b = {tuple(r) for r in _kappa_from_events(ev, force_quickselect=True).collect()}
    assert a == b


@pytest.mark.slow
def test_gini_forced_quickselect_path_equals_window(spark):
    # all four quintile thresholds from one shared quickselect pass must
    # reproduce the window path exactly
    from pyspark.sql import functions as F
    from db_writer_redshift_spark.plans.analytics_extra4 import _gini_split

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    v = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderstatus").alias("cls"),
    )
    a = {tuple(r) for r in _gini_split(v).collect()}
    b = {tuple(r) for r in _gini_split(v, force_quickselect=True).collect()}
    assert a == b
