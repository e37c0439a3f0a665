"""Method-invariant tests for the round-6 analytics operators
(plans/analytics_extra.py) — the properties the DuckDB oracles can't
express: k-core degree invariants, Theil-Sen's breakdown point vs OLS,
PQ argmin optimality vs a numpy reference, HLL mergeability and error
bounds, t-closeness boundary cases, and a Fraction-exact chi-square
reference for the A/B test."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from db_writer_redshift_spark.plans import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata missing: {SF_DIR}"
)


def _run(spark, name):
    return QUERIES[name].fn(spark, SF_DIR)


# ---------------------------------------------------------------------------
# k-core
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_kcore_peel_is_monotone_and_degree_valid(spark):
    rows = {r["round"]: (r["n_nodes"], r["n_edges"]) for r in
            _run(spark, "graph_kcore_copurchase").collect()}
    rounds = sorted(rows)
    assert rounds[0] == 0
    for a, b in zip(rounds, rounds[1:]):
        assert rows[b][0] <= rows[a][0], "peel grew the node set"
        assert rows[b][1] <= rows[a][1], "peel grew the edge set"
    # converged at the tested SFs: last two rounds identical
    assert rows[rounds[-1]] == rows[rounds[-2]]


def test_kcore_final_round_satisfies_degree_bound(spark):
    """Replay the peel independently in pure Python on the sf0.001 edge
    set and check the final round's graph has min degree >= k."""
    from db_writer_redshift_spark.plans.analytics_extra import (
        _KCORE_K,
        _KCORE_ROUNDS,
    )
    from db_writer_redshift_spark.plans.registry import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct().collect()
    from collections import Counter, defaultdict

    by_order = defaultdict(set)
    for r in op:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    w = Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                w[(ps[i], ps[j])] += 1
    edges = {e for e, c in w.items() if c >= 2}
    for _ in range(_KCORE_ROUNDS):
        deg = Counter()
        for u, v in edges:
            deg[u] += 1
            deg[v] += 1
        keep = {n for n, d in deg.items() if d >= _KCORE_K}
        edges = {(u, v) for u, v in edges if u in keep and v in keep}
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    if deg:
        assert min(deg.values()) >= _KCORE_K
    got = {r["round"]: (r["n_nodes"], r["n_edges"]) for r in
           _run(spark, "graph_kcore_copurchase").collect()}
    want = (len(deg), len(edges))
    assert got.get(_KCORE_ROUNDS, (0, 0)) == want


# ---------------------------------------------------------------------------
# Theil-Sen
# ---------------------------------------------------------------------------


def test_theil_sen_exact_on_clean_linear_data(spark):
    """Synthetic y = 7x + noiseless daily counts: the median pairwise
    slope is exactly 7e6; one corrupted day leaves it unchanged while
    OLS moves."""
    days = [(f"2024-02-{d:02d}", 100 + 7 * d) for d in range(1, 21)]
    rows = [("t", d, c) for d, c in days]
    df = spark.createDataFrame(rows, "event_type string, d string, c long").select(
        "event_type", F.col("d").cast("date").alias("d"), "c"
    )
    from db_writer_redshift_spark.plans.analytics_extra import _theil_sen_from_daily

    out = {r["event_type"]: r for r in _theil_sen_from_daily(df).collect()}
    assert out["t"]["median_slope_e6"] == 7_000_000
    # corrupt one day by 10000: median unchanged (robustness), extremes move
    rows_bad = [("t", d, c + (10_000 if d == "2024-02-10" else 0)) for d, c in days]
    df_bad = spark.createDataFrame(
        rows_bad, "event_type string, d string, c long"
    ).select("event_type", F.col("d").cast("date").alias("d"), "c")
    out_bad = {r["event_type"]: r for r in _theil_sen_from_daily(df_bad).collect()}
    assert out_bad["t"]["median_slope_e6"] == 7_000_000
    assert out_bad["t"]["max_slope_e6"] > 7_000_000


def test_theil_sen_truncation_matches_python(spark):
    """Driver-graded query vs a pure-Python replay with int() truncation
    (both engines truncate toward zero, including negative slopes)."""
    from collections import defaultdict

    from db_writer_redshift_spark.plans.registry import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", F.to_date("ts").alias("d")
    )
    counts = defaultdict(lambda: defaultdict(int))
    for r in ev.collect():
        counts[r["event_type"]][r["d"]] += 1
    want = {}
    for et, daily in counts.items():
        ds = sorted(daily)
        slopes = []
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                num = (daily[ds[j]] - daily[ds[i]]) * 1_000_000
                den = (ds[j] - ds[i]).days
                # exact truncation toward zero, matching both engines' div
                q = abs(num) // den * (1 if num >= 0 else -1)
                slopes.append(q)
        slopes.sort()
        want[et] = slopes[(len(slopes) + 1) // 2 - 1]
    got = {r["event_type"]: r["median_slope_e6"] for r in
           _run(spark, "events_theil_sen_trend").collect()}
    assert got == want


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------


def test_pq_assignment_is_argmin_vs_numpy(spark):
    import numpy as np

    from db_writer_redshift_spark.plans.analytics_extra import (
        _PQ_K,
        _PQ_SCALE,
        _PQ_SUBDIM,
        _PQ_SUBSPACES,
    )
    from db_writer_redshift_spark.plans.registry import load_table

    emb = load_table(spark, SF_DIR, "embeddings").orderBy("vec_id").collect()
    V = np.round(
        np.array([r["embedding"] for r in emb], dtype=np.float64) * _PQ_SCALE
    ).astype(np.int64)
    anchors = V[:_PQ_K]
    want = {}
    for s in range(_PQ_SUBSPACES):
        sub = V[:, s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM]
        asub = anchors[:, s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM]
        d = ((sub[:, None, :] - asub[None, :, :]) ** 2).sum(axis=2)
        codes = d.argmin(axis=1)  # numpy ties -> first (lowest code), same rule
        for c in range(_PQ_K):
            mask = codes == c
            if mask.any():
                want[(s, c)] = (int(mask.sum()), int(d[mask, c].sum()))
    got = {
        (r["subspace"], r["code"]): (r["n_assigned"], r["sse"])
        for r in _run(spark, "embedding_pq_quantization").collect()
    }
    assert got == want


def test_pq_adc_recall_bounds(spark):
    rows = _run(spark, "ann_pq_adc_recall").collect()
    assert rows, "no query sample"
    for r in rows:
        assert r["n_exact"] == 5
        assert 0 <= r["n_hit"] <= 5
        assert (r["n_hit"] == 0) == (r["first_hit_rank"] == 0)


# ---------------------------------------------------------------------------
# HyperLogLog registers
# ---------------------------------------------------------------------------


def test_hll_estimate_within_standard_error(spark):
    """alpha*m^2/Z on m=64 registers has ~1.04/sqrt(64) = 13% standard
    error; assert a generous 3-sigma band vs the true count the relation
    itself carries."""
    for r in _run(spark, "sketch_hll_registers_portable").collect():
        true, est = r["true_distinct"], r["est_distinct"]
        assert est > 0
        assert abs(est - true) <= max(0.4 * true, 25), (true, est)


def test_hll_registers_merge_by_max(spark):
    """Mergeability — the property that makes HLL shuffle-free: registers
    of the UNION of two groups are the elementwise MAX of the groups'
    registers. Verified in pure Python on the same md5 fold."""
    import hashlib

    from db_writer_redshift_spark.plans.analytics_extra import (
        _HLL_M,
        _HLL_REST_BITS,
    )
    from db_writer_redshift_spark.plans.registry import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    pairs = {
        (r["l_returnflag"], r["l_partkey"])
        for r in li.select("l_returnflag", "l_partkey").distinct().collect()
    }

    def regs(keys):
        out = {}
        for k in keys:
            h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
            reg, rest = h % _HLL_M, h // _HLL_M
            rho = (
                _HLL_REST_BITS + 1
                if rest == 0
                else _HLL_REST_BITS + 1 - rest.bit_length()
            )
            out[reg] = max(out.get(reg, 0), rho)
        return out

    groups = sorted({g for g, _ in pairs})
    assert len(groups) >= 2
    a = {k for g, k in pairs if g == groups[0]}
    b = {k for g, k in pairs if g == groups[1]}
    ra, rb, ru = regs(a), regs(b | a), regs(a | b)
    merged = {j: max(ra.get(j, 0), regs(b).get(j, 0)) for j in set(ra) | set(regs(b))}
    assert merged == ru


# ---------------------------------------------------------------------------
# t-closeness + A/B chi-square references
# ---------------------------------------------------------------------------


def test_t_closeness_bounds_and_zero_case(spark):
    for r in _run(spark, "privacy_t_closeness_customer").collect():
        assert 0 <= r["avg_tv_ppm"] <= r["max_tv_ppm"] <= 1_000_000


def test_two_proportion_matches_fraction_reference(spark):
    from fractions import Fraction

    for r in _run(spark, "stats_two_proportion_ab").collect():
        n_a, c_a, n_b, c_b = r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]
        num = (n_a + n_b) * (c_a * n_b - c_b * n_a) ** 2
        den = n_a * n_b * (c_a + c_b) * (n_a + n_b - c_a - c_b)
        assert r["chi2_num"] == num and r["chi2_den"] == den
        if den:
            chi2 = Fraction(num, den)
            assert r["significant_95"] == (1 if chi2 >= Fraction(3841459, 1000000) else 0) or (
                # the engines compare in double; only a literal boundary tie
                # could differ from the Fraction rule, and then both engines
                # still agree with each other
                abs(float(chi2) - 3.841459) < 1e-12
            )
        else:
            assert r["significant_95"] == 0
