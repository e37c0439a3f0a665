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


class TestLabelPropagation:
    """Method invariants of graph_label_propagation (Raghavan et al.
    2007, deterministic min-label variant); value-exact oracle parity is
    covered by tests/test_queries_oracle.py."""

    def test_communities_are_node_labels_and_sizes_positive(self, spark):
        import os

        import __spark_entry__ as entry_mod

        sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
        if not os.path.isdir(sf):
            import pytest

            pytest.skip(f"testdata missing: {sf}")
        rows = sorted(
            entry_mod.queries()["graph_label_propagation"](spark, sf).collect(),
            key=lambda r: r.size_rank,
        )
        assert rows, "co-purchase graph must be non-empty"
        sizes = [r.n_members for r in rows]
        assert sizes == sorted(sizes, reverse=True)
        assert all(s >= 1 for s in sizes)
        # a community's label is a propagated node id, and the smallest
        # member can never exceed the label's own id only if the label
        # left its community — but the label id must exist as a node
        assert len({r.community for r in rows}) == len(rows)
        assert all(r.min_member >= 0 for r in rows)
