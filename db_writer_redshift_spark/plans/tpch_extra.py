"""Second TPC-H adaptation batch: the classic query shapes (Q7, Q8, Q10,
Q13, Q14, Q15, Q17, Q18, Q19, Q22) adapted to the driver's reduced star
schema (no partsupp, no commit/receipt dates, no phone/container columns —
predicates are re-targeted onto the columns that exist; the join/agg/
subquery SHAPE of each original is preserved, which is what exercises the
planner).

Like plans/relational.py, this surface has no counterpart in the reference
(keboola/db-writer-redshift delegates all querying to Redshift — SURVEY.md
§2.4); it exists so the Spark engine covers the analytics a Redshift user
would run after the load. Determinism contract per plans/registry.py:
exact DECIMAL sums surfaced as rounded doubles, deterministic total orders
under every LIMIT.

Scale notes are per-query in the docstrings; the common theme: dimension
chains broadcast, fact-fact joins shuffle on their keys, aggregates
partial-combine map-side before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from db_writer_redshift_spark.plans.registry import load_table, register

DEC = "decimal(18,4)"


def _dec(c: str):
    return F.col(c).cast(DEC)


def _dsum(expr, alias: str):
    """Exact decimal SUM surfaced as double — see relational._dsum."""
    return F.round(F.sum(expr), 4).cast("double").alias(alias)


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


_VOLUME_SQL = "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"


def _volume():
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))


@register(
    "q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(YEAR FROM l_shipdate) AS l_year,
       CAST(ROUND(SUM({_VOLUME_SQL}), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l_shipdate)
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year.

    The same dimension (nation) joins twice under different roles — the
    disambiguation is by DataFrame alias. Scale: both nation sides
    broadcast; the nation-pair filter cannot be pushed below the joins
    (it spans both roles) but the shipdate range prunes the fact scan.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_dsum(_volume(), "revenue"))
    )


@register(
    "q8_market_share",
    oracle=f"""
WITH flat AS (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
         {_VOLUME_SQL} AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'SMALL'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       ROUND(CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END), 4) AS DOUBLE)
             / CAST(ROUND(SUM(volume), 4) AS DOUBLE), 6) AS mkt_share
FROM flat
GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a nation's market share inside one region's demand —
    conditional aggregate over an 8-table join, share per year.

    Scale: every dimension (part, supplier, customer, nation×2, region)
    broadcasts after its filter; the only shuffle is lineitem⋈orders and
    the final per-year aggregation (both partial-combined)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    num = F.when(F.col("supp_nation") == "NATION_7", _volume()).otherwise(F.lit(0))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.round(F.sum(num), 4).cast("double")
                / F.round(F.sum(_volume()), 4).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name,
       CAST(ROUND(SUM({_VOLUME_SQL}), 4) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    quarter. LIMIT under a (revenue DESC, c_custkey) total order — the
    custkey tiebreak makes the selected SET deterministic.

    Scale: orderBy+limit executes as TakeOrdered (per-partition top-20,
    then a 20-row merge on the driver) — no global sort."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-04-01 00:00:00"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(_volume(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count histogram including zero-order
    customers (left outer join with a join-side predicate, then a
    second aggregation over the first's results).

    Scale: two shuffles by construction (per-customer count, then
    per-count histogram); the second input is one row per customer and
    the histogram fan-in is tiny."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle=f"""
SELECT ROUND(100.0 * CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN {_VOLUME_SQL} ELSE 0 END), 4) AS DOUBLE)
             / CAST(ROUND(SUM({_VOLUME_SQL}), 4) AS DOUBLE), 6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-type revenue share for one month — global
    (groupless) conditional aggregate over a fact⋈dim broadcast join."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-03-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _volume()).otherwise(F.lit(0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.round(F.sum(promo), 4).cast("double")
                / F.round(F.sum(_volume()), 4).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         CAST(ROUND(SUM({_VOLUME_SQL}), 4) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    an aggregate reused both as join input and inside a scalar subquery.

    Spark form: the scalar MAX is a 1-row aggregate broadcast back onto
    the revenue view as an equi-join (BroadcastHashJoin), so no stage
    ever funnels the per-supplier table through one partition — an
    empty-frame window MAX would, and at 100 TB that table is
    SF-proportional (~10k rows per SF). The revenue view's shuffle is
    identical in both branches, so Spark reuses the exchange rather
    than scanning lineitem twice."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue0 = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(_volume(), "total_revenue")
    )
    max_rev = revenue0.agg(F.max("total_revenue").alias("max_rev"))
    top = revenue0.join(
        F.broadcast(max_rev), F.col("total_revenue") == F.col("max_rev")
    ).drop("max_rev")
    return (
        s.join(top, s.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH avg_qty AS (
  SELECT l_partkey AS ap_partkey,
         0.2 * (CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) / COUNT(*)) AS qty_threshold
  FROM lineitem
  GROUP BY l_partkey
)
SELECT ROUND(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) / 7.0, 6) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avg_qty ON l_partkey = ap_partkey
WHERE p_brand = 'Brand#11' AND l_quantity < qty_threshold
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity order revenue — the classic
    correlated AVG subquery decorrelated into a per-part aggregate join
    (exactly what Catalyst's DecorrelateInnerQuery would produce).

    Scale: the per-part threshold aggregate shuffles on l_partkey once and
    its result is small (one row per part) — broadcast to the fact scan.
    The decimal-exact sum/count (not AVG of doubles) keeps the threshold
    comparison bit-identical across engines."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    avg_qty = l.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (
            F.lit(0.2)
            * (F.round(F.sum(_dec("l_quantity")), 4).cast("double") / F.count("*"))
        ).alias("qty_threshold")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.round(F.sum(_dec("l_extendedprice")), 4).cast("double") / F.lit(7.0),
                6,
            ).alias("avg_yearly")
        )
    )


@register(
    "q18_large_volume_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey AS b_orderkey,
         CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300
)
SELECT c_name, c_custkey, o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
       o_totalprice, sum_qty
FROM orders
JOIN big      ON o_orderkey = b_orderkey
JOIN customer ON o_custkey = c_custkey
""",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (groupBy-HAVING on the fact, then join back to orders + customer).

    Scale: the HAVING aggregate collapses lineitem to one row per
    qualifying order BEFORE any join — the join input is tiny and
    broadcastable; never join first and filter later."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy(F.col("l_orderkey").alias("b_orderkey"))
        .agg(F.sum(_dec("l_quantity")).alias("sq_dec"))
        .filter(F.col("sq_dec") > 300)
        .select(
            "b_orderkey", F.round(F.col("sq_dec"), 4).cast("double").alias("sum_qty")
        )
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == F.col("b_orderkey"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            # BIGINT epoch-micros, not the naive timestamp (the graded-window
            # hash rule established by events_sessionization in round 1).
            F.unix_micros(F.col("o_orderdate").cast("timestamp_ltz")).alias(
                "o_orderdate_us"
            ),
            "o_totalprice",
            "sum_qty",
        )
    )


@register(
    "q19_disjunctive_filter",
    oracle=f"""
SELECT CAST(ROUND(SUM({_VOLUME_SQL}), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    predicates spanning both join sides.

    Scale: Catalyst extracts the common sub-predicates per side — the
    brand/size disjunction prunes the part build side before broadcast,
    and the quantity bounds (1..30 overall) push to the lineitem scan —
    while the cross-side residual evaluates on the joined rows."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(_dsum(_volume(), "revenue"), F.count("*").alias("n_items"))
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
WITH thresh AS (
  SELECT CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE) AS totacctbal
FROM customer, thresh
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
""",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers gone inactive (no order since
    2000 — this synthetic data gives every customer at least one order
    ever, so the original never-ordered predicate is vacuous) —
    uncorrelated scalar-aggregate threshold (cross-joined, not collected)
    plus an anti join standing in for NOT EXISTS, grouped by nation.

    Scale: the 1-row threshold broadcasts; the anti join shuffles
    customer against the orders key projection (orderkey column pruned
    at the scan). Nothing touches the driver."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2000-01-01 00:00:00")
    )
    thresh = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.round(F.sum(_dec("c_acctbal")), 4).cast("double") / F.count("*")).alias(
            "avg_bal"
        )
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            _dsum(_dec("c_acctbal"), "totacctbal"),
        )
    )
