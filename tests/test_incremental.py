"""Incremental aggregate maintenance (operators/incremental.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_writer_redshift_spark.operators.incremental import (
    agg_state,
    incremental_update,
    merge_agg_state,
)

STATE = {
    "n": ("*", "count"),
    "total": ("v", "sum"),
    "lo": ("v", "min"),
    "hi": ("v", "max"),
}


def _rows(spark, data):
    return spark.createDataFrame(data, "g string, v int")


def _canon(df):
    return {r.g: (r.n, r.total, r.lo, r.hi) for r in df.collect()}


def test_incremental_equals_full_recompute(spark):
    import random

    rng = random.Random(7)
    data = [(rng.choice("abcd"), rng.randint(-50, 50)) for _ in range(300)]
    cut = 180
    full = agg_state(_rows(spark, data), ["g"], STATE)
    summary = agg_state(_rows(spark, data[:cut]), ["g"], STATE)
    refreshed = incremental_update(summary, _rows(spark, data[cut:]), ["g"], STATE)
    assert _canon(refreshed) == _canon(full)


def test_new_groups_appear_and_existing_update(spark):
    s = agg_state(_rows(spark, [("a", 1), ("a", 3)]), ["g"], STATE)
    out = incremental_update(s, _rows(spark, [("a", 5), ("z", 9)]), ["g"], STATE)
    assert _canon(out) == {"a": (3, 9, 1, 5), "z": (1, 9, 9, 9)}


def test_merge_is_associative_across_batches(spark):
    b = [_rows(spark, [(g, v)]) for g, v in [("a", 1), ("a", 2), ("b", 3)]]
    states = [agg_state(x, ["g"], STATE) for x in b]
    left = merge_agg_state(merge_agg_state(states[0], states[1], ["g"], STATE), states[2], ["g"], STATE)
    right = merge_agg_state(states[0], merge_agg_state(states[1], states[2], ["g"], STATE), ["g"], STATE)
    assert _canon(left) == _canon(right)


def test_rejects_non_combinable_kind(spark):
    with pytest.raises(ValueError, match="non-combinable"):
        agg_state(_rows(spark, [("a", 1)]), ["g"], {"m": ("v", "median")})


def test_count_star_counts_rows_with_nulls(spark):
    df = spark.createDataFrame([("a", None), ("a", 2)], "g string, v int")
    got = _canon(agg_state(df, ["g"], STATE))
    assert got == {"a": (2, 2, 2, 2)}  # count(*)=2, sum/min/max ignore NULL


# ---------------------------------------------------------------------------
# Join-view maintenance
# ---------------------------------------------------------------------------


def _join_canon(df):
    return sorted((r.k, r.av, r.bv) for r in df.collect())


def test_join_insert_delta_rule_equals_full_join(spark):
    """Insert-only delta rule on an N:M join with random splits of both
    sides must equal the from-scratch join (no dropped or doubled
    ΔA⋈ΔB pairs)."""
    import random

    rng = random.Random(11)
    a = [(rng.randint(1, 6), i) for i in range(80)]
    b = [(rng.randint(1, 6), 100 + i) for i in range(40)]
    cut_a, cut_b = 50, 25
    mk_a = lambda rows: spark.createDataFrame(rows, "k int, av int")
    mk_b = lambda rows: spark.createDataFrame(rows, "k int, bv int")
    from db_writer_redshift_spark.operators.incremental import (
        incremental_join_insert,
    )

    a_old, da = mk_a(a[:cut_a]), mk_a(a[cut_a:])
    b_old, db = mk_b(b[:cut_b]), mk_b(b[cut_b:])
    b_new = b_old.unionByName(db)
    mv = a_old.join(b_old, "k").select("k", "av", "bv")
    refreshed = incremental_join_insert(mv, a_old, da, b_new, db, ["k"])
    full = mk_a(a).join(mk_b(b), "k").select("k", "av", "bv")
    assert _join_canon(refreshed) == _join_canon(full)


def test_join_upsert_retracts_and_rebuilds_fanout_keys(spark):
    """An upserted A-row on a key with N:M fanout must retract every old
    view row of that key and rebuild them all from the new bases."""
    from db_writer_redshift_spark.operators.incremental import (
        incremental_join_upsert,
    )

    a0 = spark.createDataFrame([(1, 10), (1, 11), (2, 20)], "k int, av int")
    b = spark.createDataFrame([(1, 100), (1, 101), (2, 200)], "k int, bv int")
    mv = a0.join(b, "k").select("k", "av", "bv")
    # upsert: key 1's av=10 row becomes av=99 (replacement, same k)
    a_new = spark.createDataFrame([(1, 99), (1, 11), (2, 20)], "k int, av int")
    affected = spark.createDataFrame([(1,)], "k int")
    refreshed = incremental_join_upsert(mv, a_new, b, affected, ["k"])
    full = a_new.join(b, "k").select("k", "av", "bv")
    assert _join_canon(refreshed) == _join_canon(full)
    # untouched key 2 must come from the stored view leg, not a rebuild:
    # dropping key 2 from a_new must not change its output row
    a_missing2 = spark.createDataFrame([(1, 99), (1, 11)], "k int, av int")
    still = incremental_join_upsert(mv, a_missing2, b, affected, ["k"])
    assert (2, 20, 200) in _join_canon(still)


def test_join_upsert_handles_deleted_keys(spark):
    """A key present in affected_keys but absent from the new base
    relation simply disappears from the view (delete semantics)."""
    from db_writer_redshift_spark.operators.incremental import (
        incremental_join_upsert,
    )

    a0 = spark.createDataFrame([(1, 10), (2, 20)], "k int, av int")
    b = spark.createDataFrame([(1, 100), (2, 200)], "k int, bv int")
    mv = a0.join(b, "k").select("k", "av", "bv")
    a_new = spark.createDataFrame([(2, 20)], "k int, av int")  # key 1 deleted
    affected = spark.createDataFrame([(1,)], "k int")
    refreshed = incremental_join_upsert(mv, a_new, b, affected, ["k"])
    assert _join_canon(refreshed) == [(2, 20, 200)]


def test_retraction_delta_equals_from_scratch_and_drops_empty_groups(spark):
    """Z-set maintenance: random inserts and deletes applied as signed
    multiplicities must equal the from-scratch aggregate over the final
    logical set, and a fully-retracted group disappears (no tombstone,
    no zero-count row)."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from db_writer_redshift_spark.operators.incremental import (
        apply_retraction_delta,
    )

    base = spark.createDataFrame(
        [("a", Decimal("1.50")), ("a", Decimal("2.25")), ("b", Decimal("10.00"))],
        "g string, v decimal(18,4)",
    )
    summary = base.groupBy("g").agg(
        F.count("*").cast("long").alias("n_rows"), F.sum("v").alias("sv")
    )
    delta = spark.createDataFrame(
        [
            ("a", Decimal("4.00"), 1),   # insert
            ("a", Decimal("1.50"), -1),  # delete one of a's rows
            ("b", Decimal("10.00"), -1),  # fully retract group b
            ("c", Decimal("7.00"), 1),   # brand-new group
        ],
        "g string, v decimal(18,4), mult long",
    )
    got = {
        r.g: (r.n_rows, r.sv)
        for r in apply_retraction_delta(
            summary, delta, keys=["g"], mult_col="mult", sums={"sv": "v"}
        ).collect()
    }
    assert got == {
        "a": (2, Decimal("6.2500")),
        "c": (1, Decimal("7.0000")),
    }
    assert "b" not in got  # fully-retracted group leaves no tombstone
