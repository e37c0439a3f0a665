"""Method-invariant tests for the second round-6 analytics batch
(plans/analytics_extra2.py) — properties the DuckDB oracles can't
express: the bootstrap's Poisson marginals and a full Python replay of
one replicate, the Apriori anti-monotonicity of sequence supports, the
k-truss triangle-support guarantee replayed in pure Python, and a
math.log replay of the keyness statistic."""

from __future__ import annotations

import math
import os
from collections import defaultdict

import pytest

from db_writer_redshift_spark.plans import QUERIES
from db_writer_redshift_spark.plans.analytics_extra2 import (
    _BOOT_A,
    _BOOT_A2,
    _BOOT_B,
    _BOOT_REPS,
    _BOOT_RING,
    _BOOT_THRESH,
    _KEY_MIN_COUNT,
    _TRUSS_K,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata missing: {SF_DIR}"
)


def _run(spark, name):
    return QUERIES[name].fn(spark, SF_DIR)


# ---------------------------------------------------------------------------
# Poisson bootstrap
# ---------------------------------------------------------------------------


def _py_weight(orderkey: int, r: int) -> int:
    h1 = (orderkey * _BOOT_A + (r + 1) * _BOOT_B + 1) % _BOOT_RING
    h2 = (h1 * _BOOT_A2) % _BOOT_RING
    for k, t in enumerate(_BOOT_THRESH):
        if h2 < t:
            return k
    return 7


def test_bootstrap_replicate_zero_replays_in_python(spark):
    import duckdb

    rows = {r["replicate"]: r for r in _run(spark, "stats_bootstrap_ci_revenue").collect()}
    assert set(rows) == set(range(_BOOT_REPS))
    con = duckdb.connect()
    base = con.execute(
        "SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT)"
        f" FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()
    n_eff = sum_cents = 0
    for key, cents in base:
        w = _py_weight(key, 0)
        n_eff += w
        sum_cents += w * cents
    got = rows[0]
    assert got["n_eff"] == n_eff
    assert got["sum_cents"] == sum_cents
    assert got["mean_cents_e6"] == (1_000_000 * sum_cents) // n_eff


def test_bootstrap_poisson_marginals_and_rank_permutation(spark):
    rows = _run(spark, "stats_bootstrap_ci_revenue").collect()
    n = None
    import duckdb

    n = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchone()[0]
    # Poisson(1) sums: each replicate's n_eff ~ Poisson(n): mean n, sd sqrt(n)
    for r in rows:
        assert abs(r["n_eff"] - n) < 6 * math.sqrt(n) + 10, r
    ranks = sorted(r["ci_rank"] for r in rows)
    assert ranks == list(range(1, _BOOT_REPS + 1))
    # the bootstrap distribution must actually spread (weights not constant)
    means = {r["mean_cents_e6"] for r in rows}
    assert len(means) > _BOOT_REPS // 2


# ---------------------------------------------------------------------------
# Frequent sequences: Apriori anti-monotonicity
# ---------------------------------------------------------------------------


def test_sequence_supports_are_apriori_consistent(spark):
    rows = _run(spark, "events_frequent_sequences").collect()
    sup = {r["seq"]: r["n_sessions"] for r in rows}
    assert rows, "no sequences at test SF"
    for r in rows:
        parts = r["seq"].split(">")
        assert len(parts) == r["seq_len"]
        assert 0 < r["support_ppm"] <= 1_000_000
        if r["seq_len"] == 3:
            a, b, c = parts
            # every sub-subsequence is at least as frequent
            for sub in (f"{a}>{b}", f"{b}>{c}", f"{a}>{c}"):
                assert sub in sup, f"{sub} missing though {r['seq']} present"
                assert sup[sub] >= r["n_sessions"], (r["seq"], sub)


# ---------------------------------------------------------------------------
# k-truss: final round replayed in pure Python
# ---------------------------------------------------------------------------


def test_ktruss_trajectory_monotone_and_final_support_valid(spark):
    rows = {r["round"]: (r["n_nodes"], r["n_edges"]) for r in
            _run(spark, "graph_ktruss_copurchase").collect()}
    rounds = sorted(rows)
    assert rounds[0] == 0
    for a, b in zip(rounds, rounds[1:]):
        assert rows[b][0] <= rows[a][0]
        assert rows[b][1] <= rows[a][1]

    # Python replay: peel on the same weight>=2 edge set.
    import duckdb

    edges = set(
        duckdb.connect().execute(
            f"""
            WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM read_parquet('{SF_DIR}/lineitem.parquet'))
            SELECT a.l_partkey, b.l_partkey
            FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
            """
        ).fetchall()
    )

    def peel(es: set) -> set:
        adj = defaultdict(set)
        for u, v in es:
            adj[u].add(v)
            adj[v].add(u)
        keep = set()
        for u, v in es:
            if len(adj[u] & adj[v]) >= _TRUSS_K - 2:
                keep.add((u, v))
        return keep

    e = set(edges)
    expected = {}
    nodes0 = {x for uv in e for x in uv}
    if e:
        expected[0] = (len(nodes0), len(e))
    for r in range(1, max(rounds) + 1 if rounds else 1):
        e = peel(e)
        if e:
            ns = {x for uv in e for x in uv}
            expected[r] = (len(ns), len(e))
    assert rows == expected


# ---------------------------------------------------------------------------
# Keyness: math.log replay and gate checks
# ---------------------------------------------------------------------------


def test_keyness_rows_replay_with_math_log(spark):
    rows = _run(spark, "vocab_keyness_llr").collect()
    assert rows, "keyness empty at test SF — lower _KEY_MIN_COUNT"
    for r in rows:
        a, b = r["n_source"], r["n_rest"]
        n1, n2 = r["src_tokens"], r["rest_tokens"]
        n, ct = n1 + n2, a + b
        assert a >= _KEY_MIN_COUNT
        assert a * n > ct * n1, "over-representation gate violated"
        ll = a * math.log(a * n / (ct * n1))
        if b:
            ll += b * math.log(b * n / (ct * n2))
        assert abs(round(2_000_000.0 * ll) - r["llr_e6"]) <= 1, r


# ---------------------------------------------------------------------------
# Rolling median: Python replay for the heaviest customer
# ---------------------------------------------------------------------------


def test_rolling_median_replays_in_python(spark):
    rows = _run(spark, "window_rolling_median_orders").collect()
    assert all(1 <= r["n_in_window"] <= 7 for r in rows)
    by_cust = defaultdict(list)
    import duckdb

    for key, okey, od, cents in duckdb.connect().execute(
        "SELECT o_custkey, o_orderkey, o_orderdate,"
        " CAST(ROUND(o_totalprice * 100) AS BIGINT)"
        f" FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall():
        by_cust[key].append((od, okey, cents))
    got = {(r["o_custkey"], r["o_orderkey"]): r["med_x2_cents"] for r in rows}
    checked = 0
    for cust, orders in by_cust.items():
        orders.sort()
        for i in range(len(orders)):
            frame = sorted(c for _, _, c in orders[max(0, i - 6) : i + 1])
            n = len(frame)
            if n % 2:
                exp = 2 * frame[n // 2]
            else:
                exp = frame[n // 2 - 1] + frame[n // 2]
            assert got[(cust, orders[i][1])] == exp, (cust, orders[i][1])
            checked += 1
    assert checked == len(rows)


# ---------------------------------------------------------------------------
# PMI cells: marginal identities and math.log replay
# ---------------------------------------------------------------------------


def test_pmi_cells_marginals_and_log_replay(spark):
    rows = _run(spark, "stats_pmi_cells").collect()
    assert rows
    for pair in {r["pair"] for r in rows}:
        cells = [r for r in rows if r["pair"] == pair]
        n = sum(r["n_ab"] for r in cells)
        for a in {r["a"] for r in cells}:
            grp = [r for r in cells if r["a"] == a]
            assert all(r["n_a"] == sum(g["n_ab"] for g in grp) for r in grp)
        for r in cells:
            exp = round(1_000_000.0 * math.log(r["n_ab"] * n / (r["n_a"] * r["n_b"])))
            assert abs(exp - r["pmi_e6"]) <= 1, r


# ---------------------------------------------------------------------------
# CE audit: algebraic identities and a bucket replay
# ---------------------------------------------------------------------------


def test_ce_audit_identities_and_bucket_replay(spark):
    rows = {r["b"]: r for r in _run(spark, "ce_histogram_join_audit").collect()}
    assert len(rows) > 0
    for r in rows.values():
        # sum c^2 >= (sum c)^2 / d  (Cauchy-Schwarz): truth >= estimate
        assert r["true_rows"] >= r["est_rows"]
        assert r["true_rows"] >= r["n_rows"]  # c^2 >= c
        assert r["qerr_ppm"] >= 1_000_000
    import duckdb

    per_key = duckdb.connect().execute(
        "SELECT l_partkey, COUNT(*) FROM"
        f" read_parquet('{SF_DIR}/lineitem.parquet') GROUP BY 1"
    ).fetchall()
    from collections import Counter

    nr, nk, tr = Counter(), Counter(), Counter()
    for k, c in per_key:
        b = k % 64
        nr[b] += c
        nk[b] += 1
        tr[b] += c * c
    for b, r in rows.items():
        assert (r["n_rows"], r["n_keys"], r["true_rows"]) == (nr[b], nk[b], tr[b])
        assert r["est_rows"] == (nr[b] * nr[b]) // nk[b]


# ---------------------------------------------------------------------------
# PSI buckets: math.log replay and gating
# ---------------------------------------------------------------------------


def test_psi_rows_replay_with_math_log(spark):
    rows = _run(spark, "drift_psi_doclen").collect()
    assert rows
    for r in rows:
        assert r["n_src"] > 0 and r["n_rest"] > 0, "zero-cell gate violated"
        p = r["n_src"] / r["src_tot"]
        q = r["n_rest"] / r["rest_tot"]
        exp = round(1e9 * (p - q) * math.log((r["n_src"] * r["rest_tot"]) /
                                             (r["n_rest"] * r["src_tot"])))
        assert abs(exp - r["psi_e9"]) <= 1, r
        # each contribution is non-negative: (p-q) and ln(p/q) share sign
        assert r["psi_e9"] >= 0


# ---------------------------------------------------------------------------
# Recursive (c,l)-diversity: Python replay over the QI cells
# ---------------------------------------------------------------------------


def test_recursive_cl_diversity_replays_in_python(spark):
    import duckdb
    from collections import Counter

    rows = {r["nation"]: r for r in
            _run(spark, "privacy_recursive_cl_diversity").collect()}
    cells = defaultdict(Counter)
    for nat, bb, seg in duckdb.connect().execute(
        "SELECT c_nationkey, CAST(FLOOR(c_acctbal / 100) AS BIGINT),"
        f" c_mktsegment FROM read_parquet('{SF_DIR}/customer.parquet')"
    ).fetchall():
        cells[(nat, bb)][seg] += 1
    per_nation = defaultdict(lambda: [0, 0, 0, 0, 0, 99])
    for (nat, _bb), cnt in cells.items():
        counts = sorted(cnt.values(), reverse=True)
        r1, tail = counts[0], sum(counts[1:])
        agg = per_nation[nat]
        agg[0] += 1
        agg[1] += sum(counts)
        agg[2] += 1 if r1 < 2 * tail else 0
        agg[3] += 1 if r1 < 3 * tail else 0
        agg[4] += 0 if r1 < 2 * tail else sum(counts)
        agg[5] = min(agg[5], len(counts))
    for nat, r in rows.items():
        exp = per_nation[nat]
        assert (r["n_cells"], r["n_rows"], r["cells_pass_c2l2"],
                r["cells_pass_c3l2"], r["rows_at_risk"], r["min_l"]) == tuple(exp)


# ---------------------------------------------------------------------------
# Referential integrity: generated data is clean, identities hold
# ---------------------------------------------------------------------------


def test_referential_integrity_clean_and_consistent(spark):
    rows = {r["fk_edge"]: r for r in
            _run(spark, "dq_referential_integrity").collect()}
    assert len(rows) == 6
    for r in rows.values():
        assert r["child_keys"] <= r["child_rows"]
        assert r["orphan_keys"] <= r["child_keys"]
        assert r["orphan_rows"] == 0 and r["orphan_keys"] == 0, (
            "generated star schema should be referentially clean", r)
    # replay one edge exactly
    import duckdb

    con = duckdb.connect()
    li = con.execute(
        f"SELECT l_orderkey, COUNT(*) FROM read_parquet('{SF_DIR}/lineitem.parquet') GROUP BY 1"
    ).fetchall()
    okeys = {k for (k,) in con.execute(
        f"SELECT DISTINCT o_orderkey FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()}
    r = rows["lineitem.l_orderkey->orders"]
    assert r["child_rows"] == sum(c for _, c in li)
    assert r["child_keys"] == len(li)
    assert r["orphan_rows"] == sum(c for k, c in li if k not in okeys)


# ---------------------------------------------------------------------------
# Inter-arrival CV: full Python replay
# ---------------------------------------------------------------------------


def test_interarrival_cv_replays_in_python(spark):
    import duckdb

    rows = {r["event_type"]: r for r in
            _run(spark, "events_interarrival_cv").collect()}
    per_stream = defaultdict(list)
    for et, uid, us, eid in duckdb.connect().execute(
        "SELECT event_type, user_id, epoch_us(ts), event_id"
        f" FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall():
        per_stream[(et, uid)].append((us, eid))
    mom = defaultdict(lambda: [0, 0, 0])
    for (et, _uid), evs in per_stream.items():
        evs.sort()
        for (a, _), (b, _) in zip(evs, evs[1:]):
            g = (b - a) // 60_000_000
            m = mom[et]
            m[0] += 1
            m[1] += g
            m[2] += g * g
    for et, r in rows.items():
        n, s1, s2 = mom[et]
        assert (r["n_gaps"], r["sum_m"], r["sum_m2"]) == (n, s1, s2)
        ratio = ((n * s2 - s1 * s1) * 10**12) // (s1 * s1)
        assert r["var_ratio_e12"] == ratio
        assert r["cv_e6"] == round(math.sqrt(ratio))
        # arrivals are bursty-or-Poisson, never metronomic at corpus level
        assert r["cv_e6"] > 300_000


# ---------------------------------------------------------------------------
# Isotropy: numpy replay
# ---------------------------------------------------------------------------


def test_isotropy_replays_with_numpy(spark):
    import duckdb
    import numpy as np

    rows = {r["label"]: r for r in
            _run(spark, "embedding_isotropy_by_label").collect()}
    data = duckdb.connect().execute(
        f"SELECT label, embedding FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchall()
    by_label = defaultdict(list)
    for lab, emb in data:
        by_label[lab].append(np.round(np.array(emb, dtype=np.float64) * 1000))
    for lab, vecs in by_label.items():
        q = np.array(vecs, dtype=object)  # exact integer arithmetic
        qi = [[int(x) for x in v] for v in vecs]
        dims = len(qi[0])
        s = [sum(v[d] for v in qi) for d in range(dims)]
        num = sum(x * x for x in s)
        energy = sum(x * x for v in qi for x in v)
        r = rows[lab]
        assert r["n_vecs"] == len(qi) and r["dims"] == dims
        assert r["mean_sq_num"] == num
        assert r["energy"] == energy
        assert r["anisotropy_ppm"] == (1_000_000 * num) // (len(qi) * energy)
        assert 0 <= r["anisotropy_ppm"] < 1_000_000


# ---------------------------------------------------------------------------
# Weekly autocorrelation: moment replay, |r| <= 1
# ---------------------------------------------------------------------------


def test_autocorr_weekly_moment_replay(spark):
    import duckdb

    rows = {r["event_type"]: r for r in
            _run(spark, "events_autocorr_weekly").collect()}
    daily = defaultdict(dict)
    for et, d, c in duckdb.connect().execute(
        "SELECT event_type, ts::DATE, COUNT(*) FROM"
        f" read_parquet('{SF_DIR}/events.parquet') GROUP BY 1, 2"
    ).fetchall():
        daily[et][d] = c
    import datetime

    for et, r in rows.items():
        pairs = [
            (c, daily[et][d + datetime.timedelta(days=7)])
            for d, c in daily[et].items()
            if d + datetime.timedelta(days=7) in daily[et]
        ]
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        assert (r["n_pairs"], r["s_x"], r["s_y"], r["s_xx"], r["s_yy"],
                r["s_xy"]) == (n, sx, sy, sxx, syy, sxy)
        exp = round(1e6 * (n * sxy - sx * sy) /
                    math.sqrt(float(n * sxx - sx * sx) * float(n * syy - sy * sy)))
        assert r["corr7_e6"] == exp
        assert abs(r["corr7_e6"]) <= 1_000_000


# ---------------------------------------------------------------------------
# Coverage sweep: monotone, Counter replay
# ---------------------------------------------------------------------------


def test_coverage_sweep_monotone_and_counter_replay(spark):
    import duckdb
    from collections import Counter

    rows = sorted(
        _run(spark, "vocab_trigram_coverage_sweep").collect(),
        key=lambda r: r["vocab_budget"],
    )
    assert [r["vocab_budget"] for r in rows] == [500, 1000, 2000, 4000, 8000]
    cov = [r["coverage_ppm"] for r in rows]
    assert cov == sorted(cov), "coverage must be monotone in budget"
    texts = duckdb.connect().execute(
        f"SELECT lower(text) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    tf = Counter()
    for (t,) in texts:
        ws = t.split(" ")
        for i in range(len(ws) - 2):
            tf[" ".join(ws[i : i + 3])] += 1
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(tf.values())
    for r in rows:
        covered = sum(c for _, c in ranked[: r["vocab_budget"]])
        assert r["vocab_total"] == len(tf)
        assert r["corpus_grams"] == total
        assert r["covered_grams"] == covered
        assert r["coverage_ppm"] == (1_000_000 * covered) // total


# ---------------------------------------------------------------------------
# Trigram cosine ER: brute-force replay over the name vocabulary
# ---------------------------------------------------------------------------


def test_trigram_cosine_pairs_match_bruteforce(spark):
    import duckdb
    from collections import Counter

    rows = {(r["nm_a"], r["nm_b"]): r for r in
            _run(spark, "er_trigram_cosine_pairs").collect()}
    assert rows, "no similar name pairs at test SF"
    names = [n for (n,) in duckdb.connect().execute(
        f"SELECT DISTINCT lower(p_name) FROM read_parquet('{SF_DIR}/part.parquet')"
    ).fetchall()]
    vecs = {n: Counter(n[i:i + 3] for i in range(len(n) - 2)) for n in names}
    dfc = Counter(g for v in vecs.values() for g in v)
    expected = {}
    for i, a in enumerate(sorted(names)):
        for b in sorted(names)[i + 1:]:
            va = {g: c for g, c in vecs[a].items() if dfc[g] <= 50}
            vb = {g: c for g, c in vecs[b].items() if dfc[g] <= 50}
            dot = sum(c * vb[g] for g, c in va.items() if g in vb)
            if dot == 0:
                continue
            n2a = sum(c * c for c in vecs[a].values())
            n2b = sum(c * c for c in vecs[b].values())
            if 100 * dot * dot >= 64 * n2a * n2b:
                expected[(a, b)] = (dot, n2a, n2b)
    assert set(rows) == set(expected)
    for k, (dot, n2a, n2b) in expected.items():
        r = rows[k]
        assert (r["dot"], r["n2_a"], r["n2_b"]) == (dot, n2a, n2b)


# ---------------------------------------------------------------------------
# Bloom FPP audit: theory envelope and hash replay
# ---------------------------------------------------------------------------


def _bloom_pos(key: int, i: int) -> int:
    h1 = (key * (2654435761 + 2 * i) + i * 2246822519 + 1) % 4294967296
    return ((h1 * 1540483477) % 4294967296) >> 18


def test_bloom_fpp_tracks_theory(spark):
    rows = {r["k"]: r for r in _run(spark, "sketch_bloom_fpp_audit").collect()}
    assert set(rows) == {2, 4, 6}
    m = 16384
    for k, r in rows.items():
        n = r["n_members"]
        assert r["m_bits"] == m
        # fill factor within 10% of m(1 - e^{-kn/m})
        exp_bits = m * (1 - math.exp(-k * n / m))
        assert abs(r["bits_set"] - exp_bits) < 0.1 * exp_bits + 20, (k, r)
        assert r["bits_set"] <= min(k * n, m)
        # measured FPP within a loose Poisson envelope of theory
        theory = (1 - math.exp(-k * n / m)) ** k
        expected_fp = theory * r["n_probes"]
        assert r["false_positives"] <= 5 * expected_fp + 10, (k, r)
        assert r["fpp_ppm"] == (1_000_000 * r["false_positives"]) // r["n_probes"]
    # more hashes at this fill level means fewer false positives
    assert rows[6]["false_positives"] <= rows[2]["false_positives"]


def test_bloom_positions_replay_in_python(spark):
    import duckdb

    rows = {r["k"]: r for r in _run(spark, "sketch_bloom_fpp_audit").collect()}
    keys = [k for (k,) in duckdb.connect().execute(
        f"SELECT c_custkey FROM read_parquet('{SF_DIR}/customer.parquet')"
    ).fetchall()]
    for kv in (2, 4, 6):
        bits = {_bloom_pos(key, i) for key in keys for i in range(kv)}
        fp = 0
        probes = 0
        for off in (10_000_000, 20_000_000, 30_000_000):
            for key in keys:
                probes += 1
                if all(_bloom_pos(key + off, i) in bits for i in range(kv)):
                    fp += 1
        r = rows[kv]
        assert r["bits_set"] == len(bits)
        assert (r["n_probes"], r["false_positives"]) == (probes, fp)


# ---------------------------------------------------------------------------
# Binary segmentation: brute-force SSE replay
# ---------------------------------------------------------------------------


def test_binary_segmentation_matches_bruteforce_sse(spark):
    import duckdb
    from fractions import Fraction

    rows = {r["event_type"]: r for r in
            _run(spark, "events_binary_segmentation").collect()}
    daily = defaultdict(list)
    for et, d, c in duckdb.connect().execute(
        "SELECT event_type, ts::DATE, COUNT(*) FROM"
        f" read_parquet('{SF_DIR}/events.parquet') GROUP BY 1, 2"
    ).fetchall():
        daily[et].append((d, c))
    import datetime

    for et, series in daily.items():
        series.sort()
        cs = [c for _, c in series]
        n, s = len(cs), sum(cs)
        best = None
        for i in range(1, n):  # split after position i-1 (left size i)
            sl = sum(cs[:i])
            gain = Fraction((sl * n - s * i) ** 2, i * (n - i) * n)
            key = (gain, -i)  # max gain, earliest day wins
            if best is None or key > best[0]:
                best = (key, i, sl)
        _, i, sl = best
        r = rows[et]
        assert r["n_left"] == i and r["sum_left"] == sl, (et, r)
        exp_day = (series[i - 1][0] - datetime.date(1970, 1, 1)).days
        assert r["split_epoch_day"] == exp_day
        gain_e6 = ((sl * n - s * i) ** 2 * 10**6) // (i * (n - i) * n)
        assert r["gain_e6"] == gain_e6
        # split means actually differ (a real change point at test data)
        assert r["mean_left_e6"] != r["mean_right_e6"]


# ---------------------------------------------------------------------------
# Kendall tau: scipy-free brute-force replay, bounds
# ---------------------------------------------------------------------------


def test_kendall_tau_matches_bruteforce(spark):
    import duckdb

    r = _run(spark, "stats_kendall_tau_daily").collect()[0]
    daily = duckdb.connect().execute(
        "SELECT ts::DATE AS d,"
        " SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END),"
        " SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
        f" FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1"
    ).fetchall()
    conc = disc = tx = ty = txy = 0
    for i in range(len(daily)):
        for j in range(i + 1, len(daily)):
            dx = daily[i][1] - daily[j][1]
            dy = daily[i][2] - daily[j][2]
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
            elif dx == 0 and dy == 0:
                txy += 1
            elif dx == 0:
                tx += 1
            else:
                ty += 1
    n_pairs = len(daily) * (len(daily) - 1) // 2
    assert (r["n_conc"], r["n_disc"], r["ties_x"], r["ties_y"],
            r["ties_both"], r["n_pairs"]) == (conc, disc, tx, ty, txy, n_pairs)
    exp = round(1e6 * (conc - disc) /
                math.sqrt(float(n_pairs - tx - txy) * float(n_pairs - ty - txy)))
    assert r["tau_b_e6"] == exp
    assert abs(r["tau_b_e6"]) <= 1_000_000


# ---------------------------------------------------------------------------
# Patch grid: tile identities and a direct codec round-trip
# ---------------------------------------------------------------------------


def test_patch_grid_tiles_sum_to_image_and_roundtrip(spark):
    import duckdb

    rows = _run(spark, "multimodal_patch_grid").collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    texts = dict(duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall())
    assert set(by_doc) == set(texts)
    for doc_id, tiles in by_doc.items():
        assert len(tiles) == 4
        w = 4 + doc_id % 5
        h = 3 + doc_id % 3
        text = texts[doc_id]
        px = [ord(text[k % len(text)]) % 256 if text else 0 for k in range(w * h)]
        assert sum(t["n_px"] for t in tiles) == w * h
        assert sum(t["gray_sum"] for t in tiles) == sum(px)
        # replay one specific tile: top-left = rows [0, h//2), cols [0, w//2)
        tl = next(t for t in tiles if t["patch_row"] == 0 and t["patch_col"] == 0)
        exp = sum(px[y * w + x] for y in range(h // 2) for x in range(w // 2))
        assert tl["gray_sum"] == exp and tl["n_px"] == (h // 2) * (w // 2)


def test_decode_gray_matrix_orientation():
    """A vertically-asymmetric image must come back top-down from the
    bottom-up BMP storage — the orientation bug class patch stats catch
    and whole-image sums cannot."""
    import numpy as np

    from db_writer_redshift_spark.operators.multimodal import (
        decode_gray_matrix,
        encode_bmp,
        encode_ppm,
    )

    px = [0, 1, 2, 10, 11, 12]  # 3x2 top-down
    m = decode_gray_matrix(encode_bmp(px, 3, 2))
    assert m.tolist() == [[0, 1, 2], [10, 11, 12]]
    m2 = decode_gray_matrix(encode_ppm(px, 3, 2))
    assert m2.tolist() == [[0, 1, 2], [10, 11, 12]]
    assert np.issubdtype(m.dtype, np.unsignedinteger) or np.issubdtype(
        m.dtype, np.integer
    )


# ---------------------------------------------------------------------------
# Link prediction: brute-force replay on the sf graph
# ---------------------------------------------------------------------------


def test_link_prediction_jaccard_matches_bruteforce(spark):
    import duckdb

    rows = {(r["node_a"], r["node_b"]): r for r in
            _run(spark, "graph_link_prediction_jaccard").collect()}
    edges = set(duckdb.connect().execute(
        f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM read_parquet('{SF_DIR}/lineitem.parquet'))
        SELECT a.l_partkey, b.l_partkey
        FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
        """
    ).fetchall())
    nbr = defaultdict(set)
    for u, v in edges:
        nbr[u].add(v)
        nbr[v].add(u)
    expected = {}
    nodes = sorted(nbr)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if (x, y) in edges:
                continue
            common = len(nbr[x] & nbr[y])
            if common >= 2:
                union = len(nbr[x] | nbr[y])
                expected[(x, y)] = (common, union)
    assert set(rows) == set(expected)
    for k, (common, union) in expected.items():
        r = rows[k]
        assert r["common"] == common
        assert r["n_union"] == union
        assert r["jaccard_ppm"] == (1_000_000 * common) // union
        # predicted links are never existing edges
        assert k not in edges


# ---------------------------------------------------------------------------
# MAD anomaly: Python replay and breakdown property
# ---------------------------------------------------------------------------


def test_mad_anomaly_replays_in_python(spark):
    import duckdb

    rows = {r["event_type"]: r for r in
            _run(spark, "events_robust_anomaly_mad").collect()}
    daily = defaultdict(list)
    for et, d, c in duckdb.connect().execute(
        "SELECT event_type, ts::DATE, COUNT(*) FROM"
        f" read_parquet('{SF_DIR}/events.parquet') GROUP BY 1, 2"
    ).fetchall():
        daily[et].append(c)
    for et, cs in daily.items():
        cs.sort()
        n = len(cs)
        med = cs[(n + 1) // 2 - 1]
        ads = sorted(abs(c - med) for c in cs)
        mad = ads[(n + 1) // 2 - 1]
        anomalies = [a for a in (abs(c - med) for c in cs) if 1000 * a > 2965 * mad]
        r = rows[et]
        assert (r["n_days"], r["median_daily"], r["mad"]) == (n, med, mad)
        assert r["n_anomalies"] == len(anomalies)
        assert r["worst_abs_dev"] == (max(anomalies) if anomalies else 0)


def test_mad_resists_single_outlier_where_zscore_would_not():
    """Breakdown property on a constructed series: one huge spike leaves
    the median/MAD gate intact (spike flagged, normal days clean), while
    the same spike inflates mean/std enough to mask itself at 2 sigma."""
    import statistics

    series = list(range(90, 110)) + [10_000]  # noisy baseline + one spike
    # (an all-constant baseline would give MAD = 0 and flag every jitter)
    med = sorted(series)[(len(series) + 1) // 2 - 1]
    mad = sorted(abs(c - med) for c in series)[(len(series) + 1) // 2 - 1]
    flagged = [c for c in series if 1000 * abs(c - med) > 2965 * mad]
    assert flagged == [10_000]
    mu = statistics.mean(series)
    sd = statistics.pstdev(series)
    assert abs(10_000 - mu) / sd < 5.0  # the spike drags sigma with it


# ---------------------------------------------------------------------------
# Median CI: coverage semantics and rank replay
# ---------------------------------------------------------------------------


def test_median_ci_brackets_median_and_replays(spark):
    import duckdb

    r = _run(spark, "stats_median_ci_orderstat").collect()[0]
    cents = sorted(c for (c,) in duckdb.connect().execute(
        "SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) FROM"
        f" read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall())
    n = len(cents)
    assert r["n"] == n
    half = math.ceil(1.959963984540054 * math.sqrt(n) / 2)
    assert r["rank_lo"] == (n + 1) // 2 - half
    assert r["rank_hi"] == (n + 1) // 2 + half
    assert r["ci_lo_cents"] == cents[r["rank_lo"] - 1]
    assert r["median_cents"] == cents[(n + 1) // 2 - 1]
    assert r["ci_hi_cents"] == cents[r["rank_hi"] - 1]
    assert r["ci_lo_cents"] <= r["median_cents"] <= r["ci_hi_cents"]


# ---------------------------------------------------------------------------
# Lorenz deciles: curve properties and replay
# ---------------------------------------------------------------------------


def test_lorenz_deciles_convex_and_replay(spark):
    import duckdb

    rows = sorted(_run(spark, "inequality_lorenz_deciles").collect(),
                  key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(10))
    shares = [r["share_ppm"] for r in rows]
    # Lorenz deciles are sorted ascending by construction -> convex curve
    assert shares == sorted(shares)
    assert rows[-1]["cum_share_ppm"] == 1_000_000
    cums = [r["cum_share_ppm"] for r in rows]
    assert cums == sorted(cums)
    spend = dict(duckdb.connect().execute(
        "SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
        f" FROM read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1"
    ).fetchall())
    vals = sorted((c, k) for k, c in spend.items())
    n, tot = len(vals), sum(c for c, _ in vals)
    per = defaultdict(lambda: [0, 0])
    for i, (c, _) in enumerate(vals):
        dec = min(i * 10 // n, 9)
        per[dec][0] += 1
        per[dec][1] += c
    assert sum(r["n_customers"] for r in rows) == n
    for r in rows:
        assert (r["n_customers"], r["spend_cents"]) == tuple(per[r["decile"]])
        assert r["share_ppm"] == (1_000_000 * r["spend_cents"]) // tot


# ---------------------------------------------------------------------------
# Markov stationary: mass conservation, convergence, eigen replay
# ---------------------------------------------------------------------------


def test_markov_stationary_converges_to_eigvector(spark):
    import numpy as np

    rows = _run(spark, "events_markov_stationary").collect()
    by_round = defaultdict(dict)
    for r in rows:
        by_round[r["round"]][r["state"]] = r["mass_e9"]
    rounds = sorted(by_round)
    assert rounds[0] == 0 and len(by_round[0]) == 5
    for rnd in rounds:
        total = sum(by_round[rnd].values())
        # floor division leaks at most |states| units of mass per state/round
        assert 10**9 - 5 * 5 * (rnd + 1) <= total <= 10**9
    # trailing rounds agree within floor-leak tolerance
    last, prev = by_round[rounds[-1]], by_round[rounds[-2]]
    for s in last:
        assert abs(last[s] - prev[s]) <= 50, (s, last[s], prev[s])
    # against the true left eigenvector of the empirical chain
    import duckdb

    trans = duckdb.connect().execute(
        f"""
        WITH s AS (
          SELECT user_id, event_type,
                 LEAD(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS nxt
          FROM read_parquet('{SF_DIR}/events.parquet')
        )
        SELECT event_type, nxt, COUNT(*) FROM s WHERE nxt IS NOT NULL
        GROUP BY 1, 2
        """
    ).fetchall()
    states = sorted({t[0] for t in trans})
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((5, 5))
    for a, b, cnt in trans:
        P[idx[a], idx[b]] = cnt
    P = P / P.sum(axis=1, keepdims=True)
    w, vl = np.linalg.eig(P.T)
    pi = np.real(vl[:, np.argmax(np.real(w))])
    pi = pi / pi.sum()
    for s in states:
        assert abs(last[s] / 1e9 - pi[idx[s]]) < 2e-3, (s, last[s], pi[idx[s]])


# ---------------------------------------------------------------------------
# Pinball loss: identities and Python replay
# ---------------------------------------------------------------------------


def test_pinball_baselines_replay_and_identities(spark):
    import duckdb

    rows = {(r["event_type"], r["model"]): r for r in
            _run(spark, "forecast_pinball_baselines").collect()}
    daily = defaultdict(list)
    for et, d, c in duckdb.connect().execute(
        "SELECT event_type, ts::DATE, COUNT(*) FROM"
        f" read_parquet('{SF_DIR}/events.parquet') GROUP BY 1, 2"
    ).fetchall():
        daily[et].append((d, c))
    for et, series in daily.items():
        series.sort()
        cs = [c for _, c in series]
        med = sorted(cs)[(len(cs) + 1) // 2 - 1]
        models = {
            "median_const": [(c, med) for c in cs],
            "seasonal_naive": [(cs[i], cs[i - 7]) for i in range(7, len(cs))],
        }
        for model, pairs in models.items():
            p50 = sum(5 * (c - f) if c >= f else 5 * (f - c) for c, f in pairs)
            p90 = sum(9 * (c - f) if c >= f else (f - c) for c, f in pairs)
            mae = sum(abs(c - f) for c, f in pairs)
            r = rows[(et, model)]
            assert (r["n_days"], r["pinball50_x10"], r["pinball90_x10"],
                    r["abs_err"]) == (len(pairs), p50, p90, mae)
            # q=0.5 pinball is exactly half the (x10) absolute error
            assert r["pinball50_x10"] == 5 * r["abs_err"]
