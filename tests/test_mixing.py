"""operators/mixing.py: water-filling token-budget allocation."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_writer_redshift_spark.operators.mixing import waterfill_allocation


def _run(spark, counts, budget_tokens):
    per_src = spark.createDataFrame(
        [(s, n) for s, n in counts.items()], "source string, n_tokens long"
    )
    out = waterfill_allocation(per_src, F.lit(budget_tokens).cast("long"))
    return {r.source: (r.alloc_tokens, r.is_capped) for r in out.collect()}


def test_skewed_sources_cap_only_the_large_one(spark):
    """tokens [10, 100, 1000], budget 666: level lands at 556 — the tiny
    and mid sources keep everything, the huge one caps, sum == budget."""
    got = _run(spark, {"tiny": 10, "mid": 100, "huge": 1000}, 666)
    assert got == {"tiny": (10, 0), "mid": (100, 0), "huge": (556, 1)}
    assert sum(a for a, _ in got.values()) == 666


def test_remainder_distributes_one_token_each(spark):
    """Equal sources with a budget not divisible by the count: the floor
    level is budget//n and the first (budget mod n) sources in sort
    order get one extra token."""
    got = _run(spark, {"a": 100, "b": 100, "c": 100}, 200)
    # level = 200//3 = 66, remainder 2 -> a,b get 67, c gets 66
    assert got == {"a": (67, 1), "b": (67, 1), "c": (66, 1)}
    assert sum(a for a, _ in got.values()) == 200


def test_budget_at_total_keeps_everything(spark):
    got = _run(spark, {"a": 50, "b": 70}, 120)
    assert got == {"a": (50, 0), "b": (70, 0)}


def test_allocation_never_exceeds_source_tokens(spark):
    got = _run(spark, {"a": 5, "b": 6, "c": 1000}, 900)
    assert got["a"][0] <= 5 and got["b"][0] <= 6
    assert sum(a for a, _ in got.values()) == 900


def test_single_source(spark):
    got = _run(spark, {"only": 500}, 300)
    assert got == {"only": (300, 1)}


def test_two_phase_anneal_budget_identity(spark):
    """The anneal allocation must sum EXACTLY to 10% of corpus tokens
    (waterfill's defining identity), never exceed a source's eligible
    pool, and cap flags must mark exactly the sources allocated less
    than their pool."""
    import os

    import __spark_entry__ as entry_mod

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf):
        import pytest

        pytest.skip(f"testdata missing: {sf}")
    rows = entry_mod.queries()["mix_two_phase_anneal"](spark, sf).collect()
    assert rows
    total = sum(r.total_tokens for r in rows)
    assert sum(r.anneal_tokens for r in rows) == total // 10
    for r in rows:
        assert 0 <= r.anneal_tokens <= r.elig_tokens <= r.total_tokens
        assert r.elig_docs * 4 <= r.n_docs  # top-quarter rank rule
        if r.anneal_capped:
            assert r.anneal_tokens < r.elig_tokens


def test_cluster_balance_budget_identity(spark):
    """Σ cluster_budget_ppb == 1e9 exactly (floor split + remainder on
    the lowest centroid id), every cluster's document weight uses floor
    division of its own budget, and total mass lost to flooring is
    bounded by one ulp per assigned doc."""
    import os

    import __spark_entry__ as entry_mod

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = entry_mod.queries()["mix_cluster_balance_weights"](spark, sf).collect()
    assert sum(r.cluster_budget_ppb for r in rows) == 10**9
    for r in rows:
        assert r.doc_weight_ppb == r.cluster_budget_ppb // r.n_assigned
        assert 0 <= r.cluster_budget_ppb - r.doc_weight_ppb * r.n_assigned < r.n_assigned
