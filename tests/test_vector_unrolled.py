"""Bit-identity contract of the unrolled fixed-width vector arithmetic.

``dot_double_fixed`` / ``norm_double_fixed`` are the codegen'd fast path
for the per-pair refine work in the k-NN / LSH joins (OPTIMIZATION_r08.md).
They are only legal because they produce BIT-IDENTICAL doubles to the
sequential ``F.aggregate`` folds the DuckDB oracles mirror — this suite is
the guard: any reordering (e.g. someone "simplifying" the chain into a
tree sum) flips a bit somewhere in these cases and fails.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from db_writer_redshift_spark.functions.vector import (
    dot_double,
    dot_double_fixed,
    norm_double,
    norm_double_fixed,
)


@pytest.fixture(scope="module")
def vec_pairs(spark):
    # Adversarial widths/magnitudes: catastrophic cancellation, subnormals,
    # alternating signs — cases where summation ORDER changes the result.
    rows = [
        (1, [1.0, 1e16, 1.0, -1e16], [1.0, 1.0, 1.0, 1.0]),
        (2, [0.1, 0.2, 0.3, 0.4], [4e-3, -3e-3, 2e-3, -1e-3]),
        (3, [1e-308, 1e308, -1e308, 1e-308], [1.0, 1.0, 1.0, 1.0]),
        (4, [-0.0, 0.0, -0.0, 0.0], [1.0, -1.0, 1.0, -1.0]),
        (5, [3.141592653589793, -2.718281828459045, 1.4142135623730951, -1.7320508075688772],
            [1.618033988749895, -2.23606797749979, 2.6457513110645907, -3.3166247903554]),
    ]
    return spark.createDataFrame(rows, "id int, a array<double>, b array<double>")


def test_dot_bit_identical(vec_pairs):
    bad = vec_pairs.select(
        (dot_double(F.col("a"), F.col("b")) != dot_double_fixed("a", "b", 4)).alias("x")
    ).filter("x")
    assert bad.count() == 0


def test_norm_bit_identical(vec_pairs):
    bad = vec_pairs.select(
        (norm_double(F.col("a")) != norm_double_fixed("a", 4)).alias("x")
    ).filter("x")
    assert bad.count() == 0


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason=f"testdata missing: {SF_DIR}")
def test_fixture_embeddings_bit_identical(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert (
        emb.select(
            (norm_double(F.col("embedding")) != norm_double_fixed("embedding", 64)).alias("x")
        )
        .filter("x")
        .count()
        == 0
    )
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("ia") < F.col("ib"))
    assert (
        pairs.select(
            (dot_double(F.col("va"), F.col("vb"))
             != dot_double_fixed("va", "vb", 64)).alias("x")
        )
        .filter("x")
        .count()
        == 0
    )
