"""Invariant tests for the round-8 wave-3 analytics batch — properties
the DuckDB oracle equality (tests/test_queries_oracle.py) cannot
express: conservation laws, bounds, monotonicity under the sharpening
exponent, and exact cross-query consistency."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata missing: {SF_DIR}"
)


def _rows(spark, name):
    return entry_mod.queries()[name](spark, SF_DIR).collect()


def _tdiv(a: int, b: int) -> int:
    # both engines' integer division truncates toward zero
    return abs(a) // abs(b) * (1 if (a >= 0) == (b >= 0) else -1)


def test_modularity_conservation_and_reproduction(spark):
    rows = _rows(spark, "graph_modularity_copurchase")
    assert rows, "co-purchase graph empty at test SF"
    m = rows[0].n_edges
    assert all(r.n_edges == m for r in rows)
    # handshake: community degree sums partition 2m exactly
    assert sum(r.d_sum for r in rows) == 2 * m
    # intra-community edges can never exceed the edge count
    assert sum(r.e_in for r in rows) <= m
    for r in rows:
        assert 0 <= r.e_in <= m and r.n_nodes >= 1 and r.d_sum >= r.n_nodes
        # a community's modularity contribution is bounded by (-1, 1)
        assert -1_000_000 < r.contrib_ppm < 1_000_000
        # contribution reproduces from the exact integers under the
        # same sign-corrected floor arithmetic
        num = 4 * m * r.e_in - r.d_sum * r.d_sum
        assert r.contrib_ppm == _tdiv(1_000_000 * num, 4 * m * m)


def test_listagg_string_is_the_bounded_topk(spark):
    rows = _rows(spark, "agg_listagg_topk_ordered")
    assert rows
    for r in rows:
        names = r.top5_names.split(",")
        assert len(names) == r.n_in_list <= 5
        assert all(n.startswith("Customer#") for n in names)
        assert r.top5_bal_cents == int(r.top5_bal_cents)


def test_trimmed_winsorized_bounds(spark):
    rows = _rows(spark, "stats_trimmed_winsorized_prices")
    assert rows
    for r in rows:
        assert r.p10_cents <= r.p90_cents
        # two-sided 10% trim keeps at least ~80% of the group
        assert r.n_kept >= (7 * r.n) // 10
        # both robust means live inside the [P10, P90] clamp window
        assert 1_000_000 * r.p10_cents <= r.trimmed_mean_e6 <= 1_000_000 * r.p90_cents
        assert 1_000_000 * r.p10_cents <= r.winsor_mean_e6 <= 1_000_000 * r.p90_cents
        # winsorizing replaces tail values by the boundaries: its sum can
        # never fall below keeping the kept mass plus lo-clamped tails
        assert r.winsor_sum_cents >= r.trimmed_sum_cents


@pytest.mark.slow
def test_trimmed_winsorized_quickselect_path_bit_equal(spark):
    # the scale path (kths_smallest_multi boundaries) must reproduce the
    # window path exactly, row for row
    from pyspark.sql import functions as F

    from db_writer_redshift_spark.plans.analytics_extra5 import (
        _trimmed_winsorized,
    )
    from db_writer_redshift_spark.plans.registry import load_table

    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    a = {r.flag: r for r in _trimmed_winsorized(li).collect()}
    b = {r.flag: r for r in _trimmed_winsorized(li, force_quickselect=True).collect()}
    assert set(a) == set(b)
    for flag in a:
        assert a[flag] == b[flag]


def test_disc_rank_matches_float_predicate():
    from db_writer_redshift_spark.plans.analytics_extra5 import _disc_rank

    for n in (1, 2, 7, 10, 600572, 999_983):
        for p in (0.1, 0.9):
            k = _disc_rank(n, p)
            assert k / n >= p
            assert k == 1 or (k - 1) / n < p


def test_mcnemar_cells_and_statistic(spark):
    (r,) = _rows(spark, "stats_mcnemar_urgent_weekend")
    assert r.n_discordant == r.n10 + r.n01
    assert r.n11 >= 0 and r.n00 >= 0
    if r.n_discordant == 0 or abs(r.n10 - r.n01) <= 1:
        assert r.chi2_cc_e6 == 0
    else:
        d = abs(r.n10 - r.n01) - 1
        assert r.chi2_cc_e6 == (1_000_000 * d * d) // r.n_discordant


def test_temperature_sweep_sharpens(spark):
    rows = _rows(spark, "mix_temperature_sweep")
    assert rows
    for col in ("t1_ppm", "t2_ppm", "t3_ppm"):
        total = sum(getattr(r, col) for r in rows)
        # floor-ppm shares under-count by at most one ulp per language
        assert 1_000_000 - len(rows) <= total <= 1_000_000
    head = max(rows, key=lambda r: r.p_ppm)
    tail = min(rows, key=lambda r: r.p_ppm)
    # sharpening (alpha up) concentrates mass on the head language and
    # drains the tail, monotonically
    assert head.t1_ppm <= head.t2_ppm <= head.t3_ppm
    assert tail.t1_ppm >= tail.t2_ppm >= tail.t3_ppm


def test_unpivot_profile_is_consistent(spark):
    rows = _rows(spark, "dq_null_profile_unpivot")
    assert {r.column_name for r in rows} == {"lang", "source", "text"}
    n = rows[0].n_rows
    for r in rows:
        assert r.n_rows == n  # same source row count for every column
        assert 0 <= r.n_null <= n
        assert 1 <= r.n_distinct <= n
        assert r.min_len <= r.max_len
        assert r.total_len >= r.max_len


def test_trailing_distinct_bounds(spark):
    rows = _rows(spark, "window_trailing_distinct_customers")
    assert rows
    for r in rows:
        # a distinct count never exceeds the (day, customer) pair count
        # it deduplicates, and every calendar day contributes itself
        assert 1 <= r.n_cust_7d <= r.n_pairs_7d
        # <= 7 days of pairs per window
        assert r.n_pairs_7d <= 7 * r.n_cust_7d


def test_recursive_hierarchy_partitions_the_part_table(spark):
    rows = _rows(spark, "recursive_cte_part_hierarchy")
    from db_writer_redshift_spark.plans.registry import load_table
    from pyspark.sql import functions as F

    part = load_table(spark, SF_DIR, "part")
    n_parts = part.count()
    total_cents = part.agg(
        F.sum(F.round(F.col("p_retailprice") * 100).cast("long"))
    ).collect()[0][0]
    # the decimal-prefix forest partitions the whole part table: every
    # part reaches exactly one root, and the cents roll up exactly
    assert sum(r.n_parts for r in rows) == n_parts
    assert sum(r.subtree_cents for r in rows) == total_cents
    for r in rows:
        assert 0 <= r.root < 10
        assert r.max_depth >= 0 and r.n_parts >= 1


def test_locf_fill_counts_consistent(spark):
    rows = _rows(spark, "window_locf_gap_fill")
    assert rows
    for r in rows:
        # every observed row is also filled; fills never exceed events
        assert r.n_observed <= r.n_filled <= r.n_events
        if r.n_observed == 0:
            assert r.n_filled == 0 and r.sum_filled_cents is None


def test_cochran_q_reproduces_and_bounds(spark):
    (r,) = _rows(spark, "stats_cochran_q_order_flags")
    assert r.t == r.g1 + r.g2 + r.g3
    # per-block L in {0..3} so L^2 <= 3L, hence ΣL² <= 3T
    assert r.t <= r.suml2 <= 3 * r.t
    den = 3 * r.t - r.suml2
    if den:
        num = 2 * (3 * (r.g1**2 + r.g2**2 + r.g3**2) - r.t**2)
        assert r.q_e6 == (1_000_000 * num) // den
        assert r.q_e6 >= 0


def test_group_by_all_matches_explicit_grouping(spark):
    rows = _rows(spark, "agg_group_by_all_revenue")
    from pyspark.sql import functions as F

    from db_writer_redshift_spark.plans.registry import load_table

    explicit = (
        load_table(spark, SF_DIR, "orders")
        .groupBy(
            "o_orderstatus", "o_orderpriority", F.year("o_orderdate").alias("yr")
        )
        .agg(F.count("*").cast("long").alias("n_orders"))
        .collect()
    )
    got = {(r.o_orderstatus, r.o_orderpriority, r.yr): r.n_orders for r in rows}
    assert got == {
        (r.o_orderstatus, r.o_orderpriority, r.yr): r.n_orders for r in explicit
    }


def test_kruskal_wallis_rank_identities(spark):
    rows = _rows(spark, "stats_kruskal_wallis_priority")
    assert len(rows) == 5
    n = rows[0].n
    assert sum(r.n_i for r in rows) == n
    # doubled ranks sum to 2 * N(N+1)/2 = N(N+1) across all groups
    assert sum(r.s2 for r in rows) == n * (n + 1)
    for r in rows:
        assert r.h_contrib_e6 >= 0
        dev = r.s2 - r.n_i * (n + 1)
        assert r.h_contrib_e6 == (3_000_000 * dev * dev) // (
            r.n_i * n * (n + 1)
        )
        assert 0 <= r.tie_num < r.tie_den


def test_kmv_intersection_estimates_within_kmv_error(spark):
    (r,) = _rows(spark, "sketch_kmv_intersection_portable")
    assert r.ku <= r.k and 0 <= r.n_int <= r.ku
    assert r.true_a + r.true_b == r.true_union + r.true_int  # inclusion-exclusion
    # KMV relative error ~ 1/sqrt(k) ≈ 6%; allow a generous 4x margin
    assert abs(r.est_union - r.true_union) <= max(10, r.true_union // 4)
    assert abs(r.est_intersection - r.true_int) <= max(10, r.true_int // 2)
    # estimator reproduces from its own integers
    assert r.est_union == ((r.ku - 1) * ((1 << 31) - 1)) // r.theta
    assert r.est_intersection == (r.n_int * r.est_union) // r.ku


def test_hits_roles_and_normalization(spark):
    rows = _rows(spark, "graph_hits_part_supplier")
    hubs = [r for r in rows if r.role == "hub"]
    auths = [r for r in rows if r.role == "auth"]
    assert hubs and auths
    for side in (hubs, auths):
        # rank positions are 1..n and scores non-increasing along them
        ordered = sorted(side, key=lambda r: r.rank_pos)
        assert [r.rank_pos for r in ordered] == list(range(1, len(side) + 1))
        assert all(
            a.score_ppm >= b.score_ppm
            for a, b in zip(ordered, ordered[1:])
        )
        # ppm scores: each at most the whole mass
        assert all(0 <= r.score_ppm <= 1_000_000 for r in side)


def test_hits_rejects_zero_iterations(spark):
    import pytest as _pytest

    from db_writer_redshift_spark.operators.pagerank import hits_int

    e = spark.createDataFrame([(1, 2)], "s long, d long")
    with _pytest.raises(ValueError, match="iterations"):
        hits_int(e, "s", "d", iterations=0)


def test_segment_migration_mass_conservation(spark):
    rows = _rows(spark, "customer_segment_migration")
    assert rows
    years = sorted({r.year_from for r in rows})
    # every (year, seg_from) out-mass equals that segment's population,
    # and total mass per transition year equals the customer count
    from collections import defaultdict

    out_mass = defaultdict(int)
    for r in rows:
        assert r.seg_from in {"heavy", "regular", "light", "none"}
        assert r.seg_to in {"heavy", "regular", "light", "none"}
        out_mass[r.year_from] += r.n_customers
    totals = set(out_mass.values())
    assert len(totals) == 1  # same customer universe every year pair
    # churn and acquisition are present as first-class cells
    assert any(r.seg_from != "none" and r.seg_to == "none" for r in rows)
    assert any(r.seg_from == "none" and r.seg_to != "none" for r in rows)
    assert years == list(range(years[0], years[-1] + 1))


def test_wilcoxon_rank_conservation(spark):
    (r,) = _rows(spark, "stats_wilcoxon_signed_rank")
    # doubled ranks over the n nonzero pairs sum to n(n+1)
    assert r.w2_plus + r.w2_minus == r.n_pairs * (r.n_pairs + 1)
    assert r.z2_e6 >= 0 and r.t3 >= 0
    den = 2 * r.n_pairs * (r.n_pairs + 1) * (2 * r.n_pairs + 1) - r.t3
    if den:
        num = (2 * r.w2_plus - r.n_pairs * (r.n_pairs + 1)) ** 2
        assert r.z2_e6 == (3_000_000 * num) // den
