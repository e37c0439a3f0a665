"""The dtype-faithfulness gate in tools/oracle_check.py.

Round-2 lesson (VERDICT.md r2): DuckDB ``SUM(integer)`` returns HUGEINT,
which ``fetchdf()`` lands as pandas float64 while Spark's bigint lands as
int64 — the driver's canonicalize-and-hash layer is dtype-sensitive, so
the row hash-fails even though every value matches (3 == 3.0 locally).
The old replica compared Python values and certified four queries that
then failed the real driver. ``dtype_mismatches`` closes that blind spot:
it must flag an un-cast integer SUM and stay silent once the oracle casts
it, registry-wide via test_queries_oracle (compare_query calls it).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from oracle_check import dtype_mismatches, duck_connection  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata missing: {SF_DIR}"
)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


def test_uncast_integer_sum_is_flagged(spark, duck):
    sdf = spark.sql("SELECT CAST(1 AS BIGINT) AS total")
    bad = dtype_mismatches(
        sdf, duck, "SELECT SUM(r_regionkey) AS total FROM region"
    )
    assert bad and "HUGEINT" in bad[0]


def test_cast_integer_sum_passes(spark, duck):
    sdf = spark.sql("SELECT CAST(1 AS BIGINT) AS total")
    assert not dtype_mismatches(
        sdf, duck, "SELECT CAST(SUM(r_regionkey) AS BIGINT) AS total FROM region"
    )


def test_float_vs_int_both_directions(spark, duck):
    # Spark double vs Duck BIGINT is the mirror failure: also flagged.
    sdf = spark.sql("SELECT CAST(1.5 AS DOUBLE) AS v")
    bad = dtype_mismatches(sdf, duck, "SELECT CAST(1 AS BIGINT) AS v")
    assert bad
    # matching float kinds are fine (DOUBLE vs double)
    assert not dtype_mismatches(sdf, duck, "SELECT CAST(1.5 AS DOUBLE) AS v")


def test_string_and_unknown_types_are_skipped(spark, duck):
    sdf = spark.sql("SELECT 'x' AS s, CAST(1 AS BIGINT) AS n")
    assert not dtype_mismatches(
        sdf, duck, "SELECT 'x' AS s, CAST(1 AS BIGINT) AS n"
    )
