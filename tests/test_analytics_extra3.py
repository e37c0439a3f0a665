"""Method-invariant tests for the round-7 analytics batch
(plans/analytics_extra3.py) — properties the DuckDB oracles can't
express: the Kaplan-Meier estimator's monotonicity and a pure-Python
replay on a hand-built cohort, Newman's assortativity bounds and its
exact-rational identity, the Mann-Kendall pair decomposition, FKGL's
floor-composition identity, and the Tukey-fence sidedness guarantees."""

from __future__ import annotations

import os

import pytest

from db_writer_redshift_spark.plans import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata missing: {SF_DIR}"
)


def _run(spark, name):
    return QUERIES[name].fn(spark, SF_DIR)


# ---------------------------------------------------------------------------
# Kaplan-Meier
# ---------------------------------------------------------------------------


def test_km_survival_monotone_and_bounded(spark):
    rows = sorted(
        _run(spark, "survival_km_curve").collect(), key=lambda r: r.t_min
    )
    assert rows, "no death times at this SF — operator is vacuous"
    prev = 1_000_000
    for r in rows:
        assert 0 <= r.survival_ppm <= prev  # non-increasing, in [0, 1e6]
        assert r.n_deaths >= 1 and r.n_risk >= r.n_deaths
        prev = r.survival_ppm
    # risk sets shrink along time
    risks = [r.n_risk for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_km_python_replay_hand_cohort():
    """The exact floor-fold on a textbook cohort: 5 subjects, deaths at
    t=1 (1), t=3 (2), censored at t=2 (1) and t=4 (1)."""
    # (t, d, c) histogram of the cohort above
    hist = [(1, 1, 0), (2, 0, 1), (3, 2, 0), (4, 0, 1)]
    n_risk = 5
    surv = 1_000_000
    out = {}
    for t, d, c in hist:
        if d:
            surv = (surv * (n_risk - d)) // n_risk
            out[t] = (n_risk, surv)
        n_risk -= d + c
    # S(1) = 4/5; S(3) = 4/5 * (3-2)/3 = 4/15 (floored at each step)
    assert out[1] == (5, 800_000)
    assert out[3] == (3, (800_000 * 1) // 3)


# ---------------------------------------------------------------------------
# Degree assortativity
# ---------------------------------------------------------------------------


def test_assortativity_bounds_and_identity(spark):
    (row,) = _run(spark, "graph_degree_assortativity").collect()
    assert row.n_points == 2 * row.n_edges
    assert row.num == row.n_points * row.sxy - row.sx * row.sx
    assert row.den == row.n_points * row.sxx - row.sx * row.sx
    assert row.den >= 0  # variance form
    assert -1_000_000 <= row.r_ppm <= 1_000_000
    if row.den:
        sign = 1 if row.num >= 0 else -1
        assert row.r_ppm == sign * ((1_000_000 * abs(row.num)) // row.den)


# ---------------------------------------------------------------------------
# Mann-Kendall
# ---------------------------------------------------------------------------


def test_mann_kendall_decomposition(spark):
    rows = _run(spark, "stats_mann_kendall_daily").collect()
    assert rows
    for r in rows:
        assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
        assert r.n_concordant + r.n_discordant + r.n_tied == r.n_pairs
        assert r.s_stat == r.n_concordant - r.n_discordant
        # tie correction can only shrink the no-tie variance
        assert 0 <= r.var_s_x18 <= r.n_days * (r.n_days - 1) * (2 * r.n_days + 5)


# ---------------------------------------------------------------------------
# FKGL
# ---------------------------------------------------------------------------


def test_fkgl_floor_composition(spark):
    rows = _run(spark, "text_readability_fkgl").collect()
    assert rows
    for r in rows:
        assert r.sum_words >= r.n_docs  # >=1 word/doc (split never empty)
        assert r.sum_sentences >= r.n_docs  # floored at 1 per doc
        assert r.fkgl_e3 == (
            (390 * r.sum_words) // r.sum_sentences
            + (11800 * r.sum_syllables) // r.sum_words
            - 15590
        )


# ---------------------------------------------------------------------------
# Tukey fences
# ---------------------------------------------------------------------------


def test_iqr_fences_sidedness(spark):
    rows = _run(spark, "dq_outlier_iqr_prices").collect()
    assert rows
    for r in rows:
        assert r.q1_cents <= r.q3_cents
        assert r.iqr_cents == r.q3_cents - r.q1_cents
        assert r.lo_fence_cents == r.q1_cents - (3 * r.iqr_cents) // 2
        assert r.hi_fence_cents == r.q3_cents + (3 * r.iqr_cents) // 2
        # fences are outside the quartile box, so outliers are a minority
        assert r.n_low_outliers + r.n_high_outliers <= r.n_orders // 2


# ---------------------------------------------------------------------------
# C4 rules
# ---------------------------------------------------------------------------


def test_c4_rule_counts_consistent(spark):
    rows = _run(spark, "c4_rules_audit").collect()
    assert rows
    for r in rows:
        for col in (
            "n_lt3_sentences",
            "n_no_terminal_end",
            "n_lorem_ipsum",
            "n_curly_brace",
            "n_kept",
        ):
            assert 0 <= getattr(r, col) <= r.n_docs
        # a kept doc violates no rule, so kept + max(single-rule drop) <= n
        assert r.n_kept + r.n_lt3_sentences <= r.n_docs
        assert r.n_kept + r.n_no_terminal_end <= r.n_docs


# ---------------------------------------------------------------------------
# Activity islands
# ---------------------------------------------------------------------------


def test_activity_islands_conservation(spark):
    rows = _run(spark, "events_activity_islands").collect()
    assert rows
    # Σ islands·len == Σ total_active_days == distinct (user, day) count
    total_days = sum(r.total_active_days for r in rows)
    assert total_days == sum(r.island_len * r.n_islands for r in rows)
    from db_writer_redshift_spark.plans.registry import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, SF_DIR, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    assert total_days == e.distinct().count()
    for r in rows:
        assert r.n_users <= r.n_islands  # a user can hold several islands


# ---------------------------------------------------------------------------
# New vs returning
# ---------------------------------------------------------------------------


def test_new_vs_returning_decomposition(spark):
    rows = sorted(
        _run(spark, "orders_new_vs_returning_monthly").collect(),
        key=lambda r: r.ym,
    )
    assert rows
    for r in rows:
        assert r.n_new_orders + r.n_returning_orders == r.n_orders
        assert r.n_new_customers <= r.n_active_customers
    # every customer is new exactly once: Σ new customers == |customers|
    from db_writer_redshift_spark.plans.registry import load_table

    n_cust = (
        load_table(spark, SF_DIR, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_new_customers for r in rows) == n_cust
    # the first month has no returning orders
    assert rows[0].n_returning_orders == 0


# ---------------------------------------------------------------------------
# Cramér's V
# ---------------------------------------------------------------------------


def test_cramers_v_bounds(spark):
    (row,) = _run(spark, "stats_cramers_v_type_dow").collect()
    assert row.n > 0 and row.n_types >= 2 and row.n_dows >= 2
    assert 0 <= row.v2_ppm <= 1_000_000  # V^2 in [0, 1]
    assert row.chi2_e6 >= 0
    # V^2 consistent with chi2 up to the per-cell floors
    approx = row.chi2_e6 // (row.n * (min(row.n_types, row.n_dows) - 1))
    assert abs(row.v2_ppm - approx) <= 1


# ---------------------------------------------------------------------------
# DP clipping audit
# ---------------------------------------------------------------------------


def test_dp_clipping_consistency(spark):
    rows = _run(spark, "privacy_dp_clipping_audit").collect()
    assert rows
    for r in rows:
        assert 1 <= r.clip_at <= r.max_contrib
        assert r.clipped_total <= r.raw_total
        assert r.clipped_mass == r.raw_total - r.clipped_total
        # p95 bound: at most 5% of users above the clip (ceiling rank)
        assert r.n_clipped_users <= (5 * r.n_users + 99) // 100 + 1
        if r.clip_at == r.max_contrib:
            assert r.n_clipped_users == 0 and r.clipped_mass == 0


# ---------------------------------------------------------------------------
# Runs test
# ---------------------------------------------------------------------------


def test_runs_test_moments_and_bounds(spark):
    rows = _run(spark, "stats_runs_test_daily").collect()
    assert rows
    for r in rows:
        assert r.n == r.n_up + r.n_down
        # runs count the sign CHANGES + the opening run, expressed as
        # changes here; bounded by n-1 changes; at least 0
        assert 0 <= r.n_runs <= max(r.n - 1, 0)
        if r.n_up and r.n_down:
            assert r.expected_runs_e6 == 1_000_000 + (
                2_000_000 * r.n_up * r.n_down
            ) // r.n
            assert r.var_runs_e6 >= 0


# ---------------------------------------------------------------------------
# Rich club
# ---------------------------------------------------------------------------


def test_rich_club_monotone_membership(spark):
    rows = sorted(_run(spark, "graph_rich_club_coefficient").collect(),
                  key=lambda r: r.k)
    assert rows
    prev_n = None
    for r in rows:
        # club density is a valid simple-graph density
        assert 0 <= r.phi_ppm <= 1_000_000
        assert r.e_club <= r.n_club * (r.n_club - 1) // 2
        if prev_n is not None:
            assert r.n_club <= prev_n  # higher cutoff, smaller club
        prev_n = r.n_club


# ---------------------------------------------------------------------------
# Cohort LTV
# ---------------------------------------------------------------------------


def test_cohort_ltv_monotone_and_conserves_revenue(spark):
    rows = _run(spark, "orders_cohort_ltv_curve").collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_month_idx, []).append(r)
    total = 0
    for m0, cells in by_cohort.items():
        cells.sort(key=lambda r: r.offset_m)
        assert cells[0].offset_m == 0  # the acquisition month always exists
        cum = 0
        for c in cells:
            cum += c.revenue_cents
            assert c.cum_revenue_cents == cum  # running sum is exact
            assert c.ltv_per_customer_cents == cum // c.cohort_size
        total += cum
    # conservation: every order's cents land in exactly one cohort cell
    from db_writer_redshift_spark.plans.registry import load_table
    from pyspark.sql import functions as F

    expect = (
        load_table(spark, SF_DIR, "orders")
        .agg(F.expr("SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))").alias("s"))
        .first()["s"]
    )
    assert total == expect
