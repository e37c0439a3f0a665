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


def test_hll_rollup_within_5pct_and_merge_consistent(spark):
    """Each per-priority HLL estimate lands within 5% of exact distinct,
    and the merged-partials global estimate equals sketching the raw
    column directly (mergeability: union of states == state of union)."""
    from pyspark.sql import functions as F

    from db_writer_redshift_spark.plans import QUERIES

    out = {
        r["o_orderpriority"]: r
        for r in QUERIES["hll_partial_union_rollup"].fn(spark, SF_DIR).collect()
    }
    o = load_table(spark, SF_DIR, "orders")
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    exact["ALL"] = o.select("o_custkey").distinct().count()
    for key, row in out.items():
        assert abs(row["est_distinct_custs"] - exact[key]) <= 0.05 * exact[key], (
            key,
            row["est_distinct_custs"],
            exact[key],
        )
    direct = (
        o.agg(F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("e"))
        .first()["e"]
    )
    assert out["ALL"]["est_distinct_custs"] == direct


def test_pii_redaction_complete(spark):
    """Every constructed ticket has >=1 email and >=1 phone span, and the
    redacted text retains NO residual match of either pattern."""
    from pyspark.sql import functions as F

    from db_writer_redshift_spark.plans import QUERIES

    df = QUERIES["text_pii_redaction"].fn(spark, SF_DIR)
    stats = df.agg(
        F.min("n_emails").alias("me"),
        F.min("n_phones").alias("mp"),
        F.count("*").alias("n"),
    ).first()
    assert stats["n"] > 0 and stats["me"] >= 1 and stats["mp"] >= 1
    # Re-scan the redacted reconstruction for residual PII: rebuild the
    # redacted text the same way the query does and assert zero matches.
    email_pat = "[a-z0-9.]+@[a-z0-9.]+[a-z]"
    phone_pat = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
    c = load_table(spark, SF_DIR, "customer")
    k = F.col("c_custkey")
    txt = F.concat(
        F.col("c_name"),
        F.lit(" <cust"),
        k.cast("string"),
        F.lit("@example.com> phone "),
        F.lpad((k * 7 % 100).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad((k * 13 % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((k * 17 % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((k * 19 % 10000).cast("string"), 4, "0"),
        F.lit(" segment "),
        F.col("c_mktsegment"),
    )
    red = F.regexp_replace(
        F.regexp_replace(txt, email_pat, "<EMAIL>"), phone_pat, "<PHONE>"
    )
    residual = c.select(
        (
            F.size(F.regexp_extract_all(red, F.lit(email_pat), F.lit(0)))
            + F.size(F.regexp_extract_all(red, F.lit(phone_pat), F.lit(0)))
        ).alias("r")
    ).agg(F.sum("r").alias("s")).first()["s"]
    assert residual == 0
