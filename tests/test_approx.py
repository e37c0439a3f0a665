"""Accuracy contract for sketch-based aggregates (the rows-only driver
checks): estimates must land within the documented error of exact."""

from __future__ import annotations

import os

import pytest

from db_writer_redshift_spark.plans.registry import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata missing: {SF_DIR}"
)


def test_approx_percentiles_within_1pct(spark):
    from pyspark.sql import functions as F

    l = load_table(spark, SF_DIR, "lineitem")
    exact = {
        r["l_returnflag"]: r["p"]
        for r in l.groupBy("l_returnflag")
        .agg(F.percentile("l_extendedprice", F.lit([0.5, 0.9, 0.99])).alias("p"))
        .collect()
    }
    import __spark_entry__ as m

    approx = m.queries()["agg_approx_percentiles"](spark, SF_DIR).collect()
    assert approx
    for row in approx:
        ests = [row["approx_p50"], row["approx_p90"], row["approx_p99"]]
        for est, ex in zip(ests, exact[row["l_returnflag"]]):
            assert abs(est - ex) <= 0.01 * ex, (row["l_returnflag"], est, ex)


def test_approx_distinct_within_5pct(spark):
    from pyspark.sql import functions as F

    l = load_table(spark, SF_DIR, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in l.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    import __spark_entry__ as m

    approx = m.queries()["agg_approx_distinct"](spark, SF_DIR).collect()
    assert approx
    for row in approx:
        ex = exact[row["l_returnflag"]]
        assert abs(row["approx_orders"] - ex) <= 0.05 * ex
