"""Integer-exact PageRank (operators/pagerank.py)."""

from __future__ import annotations

import pytest

from db_writer_redshift_spark.operators.pagerank import pagerank_int


def _edges(spark, pairs, parts=4):
    return spark.createDataFrame(pairs, "s long, d long").repartition(parts)


def _ranks(spark, pairs, iterations, parts=4):
    out = pagerank_int(_edges(spark, pairs, parts), "s", "d", iterations)
    return {r.node: r.rank_micro for r in out.collect()}


def test_two_cycle_is_fixed_point(spark):
    # symmetric 2-cycle: every iteration reproduces 1_000_000 exactly
    assert _ranks(spark, [(1, 2), (2, 1)], 3) == {1: 1_000_000, 2: 1_000_000}


def test_chain_hand_computed(spark):
    # a -> b, b dangling: r1(a)=150000, r1(b)=1000000; r2(b)=277500; fixed after
    assert _ranks(spark, [(1, 2)], 1) == {1: 150_000, 2: 1_000_000}
    assert _ranks(spark, [(1, 2)], 2) == {1: 150_000, 2: 277_500}
    assert _ranks(spark, [(1, 2)], 3) == {1: 150_000, 2: 277_500}


def test_partition_invariance(spark):
    import random

    rng = random.Random(9)
    pairs = [(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(400)]
    a = _ranks(spark, pairs, 3, parts=1)
    b = _ranks(spark, pairs, 3, parts=17)
    assert a == b


def test_multi_edges_count_in_degree(spark):
    # two parallel edges a->b halve each contribution via deg=2
    got = _ranks(spark, [(1, 2), (1, 2)], 1)
    # contrib per edge = 1_000_000 // 2; two edges sum back to 1_000_000
    assert got == {1: 150_000, 2: 1_000_000}


def test_rejects_zero_iterations(spark):
    with pytest.raises(ValueError, match="iterations"):
        pagerank_int(_edges(spark, [(1, 2)]), "s", "d", 0)
