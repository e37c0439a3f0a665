"""Round-8 wave-3 analytics batch: community structure, Spark-4 SQL
surface (ordered LISTAGG, recursive CTEs), robust means, paired tests,
temperature-scaled mixing, UNPIVOT profiling, and trailing-distinct
windows.

* ``graph_modularity_copurchase`` — Newman-Girvan modularity (Newman &
  Girvan 2004) of the weight>=2 part co-purchase graph under the
  p_brand partition: per-community contribution as an exact 128-bit
  rational (4·m·e_c − d_c²) / 4m², sign-corrected floor-ppm — the
  community-QUALITY scalar beside the registry's k-core / k-truss /
  assortativity views of the same graph.
* ``agg_listagg_topk_ordered`` — the Spark 4 ``LISTAGG(expr, sep)
  WITHIN GROUP (ORDER BY …)`` ordered-set aggregate over the top-5
  customers per nation (row_number gate first, so the aggregated string
  is bounded), against DuckDB's ``STRING_AGG(… ORDER BY …)`` — same
  total order, byte-identical strings.
* ``stats_trimmed_winsorized_prices`` — 10% two-sided trimmed mean and
  winsorized mean (Tukey & McLaughlin 1963) of line-item price cents
  per returnflag: P10/P90 boundaries via the hash-safe
  MIN-where-CUME_DIST>=p quantile (a value FROM the data), then exact
  integer sums for both robust means.
* ``stats_mcnemar_urgent_weekend`` — McNemar's paired test (McNemar
  1947, Edwards 1948 continuity correction) on two per-customer binary
  flags (ever-urgent vs ever-weekend ordering): discordant cells b/c
  exact, χ²_cc = (|b−c|−1)²/(b+c) in floor-e6.
* ``mix_temperature_sweep`` — temperature-scaled source mixing
  (multilingual-LM data balancing à la Conneau & Lample 2019: sample
  ∝ p^α): per-language char-mass shares at sharpening exponents
  α ∈ {1,2,3}, integer-exact because p is quantized to ppm FIRST and
  p_ppm^3 ≤ 10^18 stays in BIGINT, re-normalized in 128-bit.
* ``dq_null_profile_unpivot`` — wide-to-long column profiling through
  the native UNPIVOT operator (null count, distinct count, min/max/total
  length per column), the data-quality intake report every pipeline
  runs before schema contracts are written.
* ``window_trailing_distinct_customers`` — trailing-7-day COUNT
  (DISTINCT) per order day: the windowed-distinct that RANGE frames
  cannot express (no DISTINCT in window aggregates in either engine) —
  re-expressed scale-correctly as a bounded 7-row explode + one
  hash aggregate, while the oracle states the same relation as a
  calendar range join.
* ``recursive_cte_part_hierarchy`` — Spark 4 ``WITH RECURSIVE``
  surface: the decimal-prefix forest over partkeys (parent = pk div
  10) rolled up from the 9 roots — subtree sizes, depths, and exact
  retail-price subtree sums; the BOM-explosion shape (variable-depth
  transitive closure) that genuinely needs recursion, stated with the
  IDENTICAL recursive SQL text on both engines (modulo div spelling).

Reference anchor: the reference (keboola/db-writer-redshift) delegates
all analytics to Redshift (SURVEY.md §4); these queries are this
engine's own surface, cited to public papers in each docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from db_writer_redshift_spark.plans.registry import load_table, register





_FLAGS_CTE = """
  SELECT o_custkey,
         MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
           AS urgent,
         MAX(CASE WHEN isodow(o_orderdate::DATE) >= 6 THEN 1 ELSE 0 END)
           AS weekend,
         MAX(CASE WHEN o_totalprice >= 150000 THEN 1 ELSE 0 END) AS highval
  FROM orders GROUP BY o_custkey"""


def _customer_order_flags(orders: DataFrame) -> DataFrame:
    """Per-customer binary treatment flags shared by the paired-design
    family (McNemar, Cochran's Q) and the KMV cohort sketches: ever
    placed a 1-URGENT order, ever ordered on a weekend (isodow >= 6 ==
    Spark weekday+1, the house dow convention), ever placed a
    high-value order (pinned literal, no quantile pass). One map-side
    MAX aggregate; the oracle twin is the module-level _FLAGS_CTE so
    the convention lives in exactly two strings, one per engine."""
    return orders.groupBy("o_custkey").agg(
        F.max(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("urgent"),
        F.max(
            F.when(F.weekday(F.col("o_orderdate")) + 1 >= 6, 1).otherwise(0)
        ).alias("weekend"),
        F.max(
            F.when(F.col("o_totalprice") >= 150000, 1).otherwise(0)
        ).alias("highval"),
    )


# ---------------------------------------------------------------------------
# Newman-Girvan modularity of the co-purchase graph under the brand partition
# ---------------------------------------------------------------------------


@register(
    "graph_modularity_copurchase",
    oracle="""
WITH eraw AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (SELECT u, v FROM eraw GROUP BY u, v HAVING COUNT(*) >= 2),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM edges),
lab AS (SELECT p_partkey, p_brand FROM part),
eb AS (
  SELECT lu.p_brand AS bu, lv.p_brand AS bv
  FROM edges e JOIN lab lu ON e.u = lu.p_partkey
               JOIN lab lv ON e.v = lv.p_partkey
),
ein AS (
  SELECT bu AS brand, CAST(COUNT(*) AS BIGINT) AS e_in
  FROM eb WHERE bu = bv GROUP BY bu
),
sym AS (SELECT u FROM edges UNION ALL SELECT v AS u FROM edges),
deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS k FROM sym GROUP BY u),
dsum AS (
  SELECT lab.p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(deg.k) AS BIGINT) AS d_sum
  FROM deg JOIN lab ON deg.node = lab.p_partkey
  GROUP BY lab.p_brand
)
SELECT d.brand, d.n_nodes, d.d_sum,
       CAST(COALESCE(e.e_in, 0) AS BIGINT) AS e_in,
       mm.m AS n_edges,
       CAST(CASE WHEN mm.m = 0 THEN 0 ELSE
         CASE WHEN 4::HUGEINT * mm.m * COALESCE(e.e_in, 0)
                   - d.d_sum::HUGEINT * d.d_sum >= 0 THEN 1 ELSE -1 END
         * ((1000000::HUGEINT
             * ABS(4::HUGEINT * mm.m * COALESCE(e.e_in, 0)
                   - d.d_sum::HUGEINT * d.d_sum))
            // (4::HUGEINT * mm.m * mm.m)) END AS BIGINT) AS contrib_ppm
FROM dsum d LEFT JOIN ein e ON d.brand = e.brand CROSS JOIN mm
""",
)
def graph_modularity_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman-Girvan modularity (Newman & Girvan, Phys. Rev. E 2004) of
    the weight>=2 part co-purchase graph under the p_brand partition:
    Q = Σ_c [e_c/m − (d_c/2m)²], emitted per community as the exact
    integer triple (e_c, d_c, m) plus the contribution
    (4·m·e_c − d_c²)/4m² as a sign-corrected floor-ppm — does the brand
    partition explain co-purchase structure better than chance? The
    community-quality scalar beside the registry's k-core / k-truss /
    label-propagation / assortativity views of the same graph.

    Exactness: every product promotes to 128-bit (DECIMAL(38)/HUGEINT)
    BEFORE multiplying (the ADVICE-r7 overflow discipline); the
    contribution can be negative, so the floor-div applies to the ABS
    value with the sign reapplied, keeping Spark's truncating ``div``
    and DuckDB's ``//`` identical.

    Scale: one orderkey-shuffle edge build shared with the graph
    family, materialized ONCE via localCheckpoint (the kcore
    discipline) because four consumers read it — m, intra-community
    counts, and both endpoints of the degree roll-up — and without the
    checkpoint each consumer would re-run the corpus-sized self-join
    (the ×10 probe read 3.5x before, 1.5x after). Degrees and community
    sums are map-side aggregates over the edge list; the brand relation
    (25 rows) broadcasts; per-community output is bounded by |brands|."""
    from db_writer_redshift_spark.plans.tpch_extra2 import (
        _copurchase_edges,  # the ONE graph-family edge definition
    )

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("brand")
    )
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    m_df = edges.agg(F.count("*").cast("long").alias("m"))
    lab_u = part.select(F.col("node").alias("u"), F.col("brand").alias("bu"))
    lab_v = part.select(F.col("node").alias("v"), F.col("brand").alias("bv"))
    ein = (
        edges.join(F.broadcast(lab_u), "u")
        .join(F.broadcast(lab_v), "v")
        .filter(F.col("bu") == F.col("bv"))
        .groupBy(F.col("bu").alias("brand"))
        .agg(F.count("*").cast("long").alias("e_in"))
    )
    sym = edges.select("u").unionByName(edges.select(F.col("v").alias("u")))
    deg = sym.groupBy("u").agg(F.count("*").cast("long").alias("k"))
    dsum = (
        deg.join(F.broadcast(part.withColumnRenamed("node", "u")), "u")
        .groupBy("brand")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.sum("k").cast("long").alias("d_sum"),
        )
    )
    joined = (
        dsum.join(ein, "brand", "left")
        .withColumn("e_in", F.coalesce(F.col("e_in"), F.lit(0)).cast("long"))
        .crossJoin(F.broadcast(m_df))
    )
    return joined.select(
        "brand",
        "n_nodes",
        "d_sum",
        "e_in",
        F.col("m").alias("n_edges"),
        F.expr(
            "CASE WHEN m = 0 THEN CAST(0 AS BIGINT) ELSE CAST("
            " CASE WHEN CAST(4 AS DECIMAL(38,0)) * m * e_in"
            "           - CAST(d_sum AS DECIMAL(38,0)) * d_sum >= 0"
            "      THEN 1 ELSE -1 END"
            " * ((CAST(1000000 AS DECIMAL(38,0))"
            "     * ABS(CAST(4 AS DECIMAL(38,0)) * m * e_in"
            "           - CAST(d_sum AS DECIMAL(38,0)) * d_sum))"
            "    div (CAST(4 AS DECIMAL(38,0)) * m * m)) AS BIGINT) END"
        ).alias("contrib_ppm"),
    )


# ---------------------------------------------------------------------------
# Spark 4 ordered-set LISTAGG over a bounded top-k per group
# ---------------------------------------------------------------------------


@register(
    "agg_listagg_topk_ordered",
    oracle="""
WITH ranked AS (
  SELECT n.n_name, c.c_name, c.c_acctbal, c.c_custkey,
         ROW_NUMBER() OVER (PARTITION BY n.n_name
                            ORDER BY c.c_acctbal DESC, c.c_custkey) AS rn
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT n_name,
       STRING_AGG(c_name, ',' ORDER BY c_acctbal DESC, c_custkey)
         AS top5_names,
       CAST(COUNT(*) AS BIGINT) AS n_in_list,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS top5_bal_cents
FROM ranked WHERE rn <= 5
GROUP BY n_name
""",
)
def agg_listagg_topk_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 ordered-set string aggregate — ``LISTAGG(expr, sep)
    WITHIN GROUP (ORDER BY …)`` (SQL:2016 T625) — against DuckDB's
    ``STRING_AGG(… ORDER BY …)``: the top-5 customers per nation by
    account balance concatenated under an explicit TOTAL order
    (c_acctbal DESC, c_custkey), so the strings are byte-identical
    cross-engine. The row_number gate runs FIRST, bounding the
    aggregated string at 5 names — the discipline that keeps an
    order-sensitive string aggregate safe at scale (an unbounded
    LISTAGG over a fact table is a driver-killer by construction).

    Scale: rank-then-aggregate is one hash partition per nation key
    (25); with heavier group counts the WindowGroupLimit pushdown keeps
    only 5 rows per group ahead of the sort."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    ranked = (
        cust.join(F.broadcast(nat), "c_nationkey")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("n_name").orderBy(
                    F.col("c_acctbal").desc(), F.col("c_custkey")
                )
            ),
        )
        .filter(F.col("rn") <= 5)
    )
    return ranked.groupBy("n_name").agg(
        F.expr(
            "listagg(c_name, ',') WITHIN GROUP"
            " (ORDER BY c_acctbal DESC, c_custkey)"
        ).alias("top5_names"),
        F.count("*").cast("long").alias("n_in_list"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
        .cast("long")
        .alias("top5_bal_cents"),
    )


# ---------------------------------------------------------------------------
# Trimmed and winsorized means per returnflag (robust location estimators)
# ---------------------------------------------------------------------------


@register(
    "stats_trimmed_winsorized_prices",
    oracle="""
WITH c AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
),
cd AS (
  SELECT flag, cents,
         CUME_DIST() OVER (PARTITION BY flag ORDER BY cents) AS cd
  FROM c
),
b AS (
  SELECT flag,
         MIN(CASE WHEN cd >= 0.1 THEN cents END) AS lo,
         MIN(CASE WHEN cd >= 0.9 THEN cents END) AS hi
  FROM cd GROUP BY flag
)
SELECT c.flag,
       CAST(COUNT(*) AS BIGINT) AS n,
       b.lo AS p10_cents, b.hi AS p90_cents,
       CAST(SUM(CASE WHEN c.cents BETWEEN b.lo AND b.hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN c.cents BETWEEN b.lo AND b.hi THEN c.cents
                     ELSE 0 END) AS BIGINT) AS trimmed_sum_cents,
       CAST((1000000::HUGEINT
             * SUM(CASE WHEN c.cents BETWEEN b.lo AND b.hi THEN c.cents
                        ELSE 0 END))
            // SUM(CASE WHEN c.cents BETWEEN b.lo AND b.hi THEN 1 ELSE 0 END)
            AS BIGINT) AS trimmed_mean_e6,
       CAST(SUM(LEAST(GREATEST(c.cents, b.lo), b.hi)) AS BIGINT)
         AS winsor_sum_cents,
       CAST((1000000::HUGEINT * SUM(LEAST(GREATEST(c.cents, b.lo), b.hi)))
            // COUNT(*) AS BIGINT) AS winsor_mean_e6
FROM c JOIN b USING (flag)
GROUP BY c.flag, b.lo, b.hi
""",
)
def stats_trimmed_winsorized_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% two-sided trimmed mean and winsorized mean (Tukey &
    McLaughlin 1963) of line-item extended price per returnflag — the
    robust location estimators every data-quality dashboard wants next
    to the raw mean. The P10/P90 boundaries use the hash-safe
    PERCENTILE_DISC spelling (MIN value with CUME_DIST >= p — a value
    FROM the data, no interpolation); trimming keeps [lo, hi]
    inclusive, winsorizing clamps to it; every output is an exact
    integer or a 128-bit-promoted floor-e6 ratio.

    Scale: this is the quickselect-boundary DUAL-PATH form (the
    window_ntile_decile_stats discipline): below the per-group sort
    cutoff the CUME_DIST window runs (3 returnflag partitions, cheap in
    wall-clock, sorted partition bounded by the cutoff); above it the
    P10/P90 boundaries come from selection.kths_smallest_multi's shared
    scan+agg rounds per flag — scan-proportional, no corpus-sized sort
    (the ×10 probe read 3.5x on the window form). The boundary rank
    replicates the window's IEEE predicate exactly (min k with k/n >=
    p evaluated in doubles driver-side), so both paths are bit-equal
    (forced-path pytest). Everything after the boundaries is one
    map-side-combinable aggregate against a 3-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    return _trimmed_winsorized(li)


_TRIM_SORT_CUTOFF = 10_000_000


def _disc_rank(n: int, p: float) -> int:
    """Shared with the other PERCENTILE_DISC dual paths — see
    operators/selection.disc_rank (moved there in round 9)."""
    from db_writer_redshift_spark.operators.selection import disc_rank

    return disc_rank(n, p)


def _trimmed_winsorized(li: DataFrame, force_quickselect: bool = False) -> DataFrame:
    from db_writer_redshift_spark.operators.selection import kths_smallest_multi

    spark = li.sparkSession
    counts = {r.flag: r.n for r in li.groupBy("flag").agg(
        F.count("*").cast("long").alias("n")).collect()}
    if not force_quickselect and max(counts.values()) < _TRIM_SORT_CUTOFF:
        cd = li.withColumn(
            "cd",
            F.cume_dist().over(Window.partitionBy("flag").orderBy("cents")),
        )
        bounds = cd.groupBy("flag").agg(
            F.min(F.when(F.col("cd") >= 0.1, F.col("cents"))).alias("lo"),
            F.min(F.when(F.col("cd") >= 0.9, F.col("cents"))).alias("hi"),
        )
    else:
        # driver state bounded by |flags| (3): per flag, both order
        # statistics come from ONE shared set of quickselect rounds
        rows = []
        for flag in sorted(counts):
            n = counts[flag]
            ks = sorted({_disc_rank(n, 0.1), _disc_rank(n, 0.9)})
            vals = kths_smallest_multi(
                li.filter(F.col("flag") == flag), "cents", ks
            )
            by_rank = dict(zip(ks, vals))
            rows.append(
                (flag, by_rank[_disc_rank(n, 0.1)], by_rank[_disc_rank(n, 0.9)])
            )
        bounds = spark.createDataFrame(rows, "flag string, lo long, hi long")
    j = li.join(F.broadcast(bounds), "flag")
    kept = F.when(
        (F.col("cents") >= F.col("lo")) & (F.col("cents") <= F.col("hi")), 1
    ).otherwise(0)
    wins = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    agg = j.groupBy("flag", "lo", "hi").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(kept).cast("long").alias("n_kept"),
        F.sum(F.col("cents") * kept).cast("long").alias("trimmed_sum_cents"),
        F.sum(wins).cast("long").alias("winsor_sum_cents"),
    )
    return agg.select(
        "flag",
        "n",
        F.col("lo").alias("p10_cents"),
        F.col("hi").alias("p90_cents"),
        "n_kept",
        "trimmed_sum_cents",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * trimmed_sum_cents)"
            " div n_kept AS BIGINT)"
        ).alias("trimmed_mean_e6"),
        "winsor_sum_cents",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * winsor_sum_cents)"
            " div n AS BIGINT)"
        ).alias("winsor_mean_e6"),
    )


# ---------------------------------------------------------------------------
# McNemar's paired test on per-customer binary flags
# ---------------------------------------------------------------------------


@register(
    "stats_mcnemar_urgent_weekend",
    oracle=f"""
WITH per AS ({_FLAGS_CTE}
),
ct AS (
  SELECT CAST(SUM(CASE WHEN urgent = 1 AND weekend = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n11,
         CAST(SUM(CASE WHEN urgent = 1 AND weekend = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n10,
         CAST(SUM(CASE WHEN urgent = 0 AND weekend = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n01,
         CAST(SUM(CASE WHEN urgent = 0 AND weekend = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n00
  FROM per
)
SELECT n11, n10, n01, n00,
       CAST(n10 + n01 AS BIGINT) AS n_discordant,
       CAST(CASE WHEN n10 + n01 = 0 OR ABS(n10 - n01) <= 1 THEN 0
            ELSE (1000000::HUGEINT * (ABS(n10 - n01) - 1)
                  * (ABS(n10 - n01) - 1)) // (n10 + n01)
       END AS BIGINT) AS chi2_cc_e6
FROM ct
""",
)
def stats_mcnemar_urgent_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test for paired binary outcomes (McNemar 1947, with the
    Edwards 1948 continuity correction): per customer, flag A = has
    ever placed a 1-URGENT order, flag B = has ever ordered on a
    weekend (isodow >= 6 == Spark weekday+1, the house dow convention).
    Only the DISCORDANT cells matter: χ²_cc = (|b−c|−1)²/(b+c), shipped
    as exact cell counts plus a floor-e6 statistic (clamped to 0 when
    |b−c| <= 1, where the corrected statistic is non-positive by
    definition). The marginal-homogeneity test beside the registry's
    unpaired two-proportion z² — paired designs need the paired test.

    Scale: one map-side-combinable MAX aggregate per customer, then a
    4-cell contingency roll-up to a single row; 128-bit promotion
    before the e6 scaling."""
    per = _customer_order_flags(load_table(spark, sf_dir, "orders"))
    u, w = F.col("urgent"), F.col("weekend")
    ct = per.agg(
        F.sum(F.when((u == 1) & (w == 1), 1).otherwise(0))
        .cast("long")
        .alias("n11"),
        F.sum(F.when((u == 1) & (w == 0), 1).otherwise(0))
        .cast("long")
        .alias("n10"),
        F.sum(F.when((u == 0) & (w == 1), 1).otherwise(0))
        .cast("long")
        .alias("n01"),
        F.sum(F.when((u == 0) & (w == 0), 1).otherwise(0))
        .cast("long")
        .alias("n00"),
    )
    return ct.select(
        "n11",
        "n10",
        "n01",
        "n00",
        (F.col("n10") + F.col("n01")).cast("long").alias("n_discordant"),
        F.expr(
            "CAST(CASE WHEN n10 + n01 = 0 OR ABS(n10 - n01) <= 1 THEN 0"
            " ELSE (CAST(1000000 AS DECIMAL(38,0)) * (ABS(n10 - n01) - 1)"
            "       * (ABS(n10 - n01) - 1)) div (n10 + n01)"
            " END AS BIGINT)"
        ).alias("chi2_cc_e6"),
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixing sweep over language char-mass shares
# ---------------------------------------------------------------------------


@register(
    "mix_temperature_sweep",
    oracle="""
WITH per AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY lang
),
tot AS (SELECT CAST(SUM(chars) AS BIGINT) AS t FROM per),
p AS (
  SELECT lang, n_docs, chars,
         CAST((1000000::HUGEINT * chars) // t AS BIGINT) AS p_ppm
  FROM per CROSS JOIN tot
),
s AS (
  SELECT CAST(SUM(p_ppm) AS BIGINT) AS s1,
         CAST(SUM(p_ppm * p_ppm) AS BIGINT) AS s2,
         CAST(SUM(p_ppm * p_ppm * p_ppm) AS BIGINT) AS s3
  FROM p
)
SELECT p.lang, p.n_docs, p.chars, p.p_ppm,
       CAST((1000000::HUGEINT * p_ppm) // s1 AS BIGINT) AS t1_ppm,
       CAST((1000000::HUGEINT * p_ppm * p_ppm) // s2 AS BIGINT) AS t2_ppm,
       CAST((1000000::HUGEINT * p_ppm * p_ppm * p_ppm) // s3 AS BIGINT)
         AS t3_ppm
FROM p CROSS JOIN s
""",
)
def mix_temperature_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights for multilingual corpus
    mixing (the p^α re-balancing of Conneau & Lample, NeurIPS 2019 —
    α > 1 sharpens toward head languages, α < 1 flattens toward the
    tail): per-language char-mass shares re-normalized at sharpening
    exponents α ∈ {1, 2, 3}. Integer-exact by construction: the raw
    share is quantized to ppm FIRST (128-bit promoted), so p_ppm^3 ≤
    10^18 stays inside BIGINT and each re-normalization is one more
    128-bit floor-division — no pow(), no doubles, no cross-engine
    rounding surface anywhere.

    Scale: one map-side aggregate to |langs| rows, then driver-free
    broadcast arithmetic on the bounded per-language relation — the
    mixing-family discipline (DoReMi / Neyman / water-fill twins)."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    tot = per.agg(F.sum("chars").cast("long").alias("t"))
    p = per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "chars",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * chars) div t AS BIGINT)"
        ).alias("p_ppm"),
    )
    s = p.agg(
        F.sum("p_ppm").cast("long").alias("s1"),
        F.sum(F.col("p_ppm") * F.col("p_ppm")).cast("long").alias("s2"),
        F.sum(F.col("p_ppm") * F.col("p_ppm") * F.col("p_ppm"))
        .cast("long")
        .alias("s3"),
    )
    return p.crossJoin(F.broadcast(s)).select(
        "lang",
        "n_docs",
        "chars",
        "p_ppm",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * p_ppm) div s1 AS BIGINT)"
        ).alias("t1_ppm"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * p_ppm * p_ppm) div s2"
            " AS BIGINT)"
        ).alias("t2_ppm"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * p_ppm * p_ppm * p_ppm)"
            " div s3 AS BIGINT)"
        ).alias("t3_ppm"),
    )


# ---------------------------------------------------------------------------
# UNPIVOT column profiling
# ---------------------------------------------------------------------------


@register(
    "dq_null_profile_unpivot",
    oracle="""
WITH src AS (SELECT lang, source, text FROM documents),
u AS (
  SELECT 'lang' AS column_name, lang AS v FROM src
  UNION ALL SELECT 'source' AS column_name, source AS v FROM src
  UNION ALL SELECT 'text' AS column_name, text AS v FROM src
)
SELECT column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
       CAST(MIN(LENGTH(v)) AS BIGINT) AS min_len,
       CAST(MAX(LENGTH(v)) AS BIGINT) AS max_len,
       CAST(SUM(COALESCE(LENGTH(v), 0)) AS BIGINT) AS total_len
FROM u GROUP BY column_name
""",
)
def dq_null_profile_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long column profiling through the NATIVE UNPIVOT
    operator (``DataFrame.unpivot`` / ANSI ``UNPIVOT``): one pass over
    the documents table produces the per-column intake report — row
    count, null count, distinct count, min/max/total length — the
    profile every ingestion pipeline computes before schema contracts
    and NOT NULL constraints are written. The oracle states the same
    relation as the portable UNION-ALL longhand, proving the unpivot
    rewrite is exactly the stacked per-column scan.

    Scale: UNPIVOT is a zero-shuffle row-local Expand (3× row
    multiplier here, bounded by the profiled column count, never by
    data width); the profile aggregate is map-side-combinable except
    the per-column COUNT(DISTINCT), which plans the standard two-stage
    Expand distinct — at 100 TB swap in the registry's HLL sketch for
    the distinct column if ±2% suffices."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "source", "text")
    up = docs.unpivot([], ["lang", "source", "text"], "column_name", "v")
    return up.groupBy("column_name").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null"),
        F.countDistinct("v").cast("long").alias("n_distinct"),
        F.min(F.length("v")).cast("long").alias("min_len"),
        F.max(F.length("v")).cast("long").alias("max_len"),
        F.sum(F.coalesce(F.length("v"), F.lit(0))).cast("long").alias("total_len"),
    )


# ---------------------------------------------------------------------------
# Trailing-7-day COUNT(DISTINCT) per order day
# ---------------------------------------------------------------------------


@register(
    "window_trailing_distinct_customers",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT o_orderdate::DATE AS d, o_custkey AS c FROM orders
),
cal AS (SELECT DISTINCT o_orderdate::DATE AS d FROM orders),
w AS (
  SELECT cal.d,
         CAST(COUNT(DISTINCT p.c) AS BIGINT) AS n_cust_7d,
         CAST(COUNT(*) AS BIGINT) AS n_pairs_7d
  FROM cal JOIN pairs p ON p.d BETWEEN cal.d - 6 AND cal.d
  GROUP BY cal.d
)
SELECT CAST(date_diff('day', DATE '1992-01-01', d) AS BIGINT) AS day_idx,
       n_cust_7d, n_pairs_7d
FROM w
""",
)
def window_trailing_distinct_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trailing-7-day COUNT(DISTINCT customer) per order day — the
    windowed DISTINCT that RANGE frames cannot express (neither engine
    allows DISTINCT inside a window aggregate), and the natural "weekly
    active users, daily grain" metric. The scale-correct Spark shape is
    NOT a range join: each distinct (day, customer) pair explodes into
    the <= 7 trailing days it contributes to, then ONE hash aggregate
    counts distinct customers per day — shuffle volume is 7× the
    deduplicated pair count, independent of the window's row density.
    The oracle states the identical relation as a calendar range join.
    Day keys ship as epoch-day offsets (BIGINT) per the graded-window
    envelope (no temporal columns).

    Scale: pair dedup is one shuffle; the explode is row-local with a
    constant 7× multiplier; the final aggregate combines map-side.
    Compare window_range_interval_trailing7d, which covers the
    SUM/COUNT frame the engine CAN express natively."""
    orders = load_table(spark, sf_dir, "orders")
    pairs = orders.select(
        F.to_date("o_orderdate").alias("d"), F.col("o_custkey").alias("c")
    ).distinct()
    cal = orders.select(F.to_date("o_orderdate").alias("d")).distinct()
    contrib = pairs.select(
        F.explode(F.expr("sequence(d, date_add(d, 6))")).alias("td"), "c"
    )
    agg = contrib.groupBy("td").agg(
        F.countDistinct("c").cast("long").alias("n_cust_7d"),
        F.count("*").cast("long").alias("n_pairs_7d"),
    )
    return cal.join(agg, cal.d == agg.td).select(
        F.datediff(F.col("d"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("day_idx"),
        "n_cust_7d",
        "n_pairs_7d",
    )


# ---------------------------------------------------------------------------
# Spark 4 WITH RECURSIVE: decimal-prefix part hierarchy roll-up
# ---------------------------------------------------------------------------


@register(
    "recursive_cte_part_hierarchy",
    oracle="""
WITH RECURSIVE walk(root, pk, depth) AS (
  SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey < 10
  UNION ALL
  SELECT w.root, p.p_partkey, w.depth + 1
  FROM walk w JOIN part p
    ON p.p_partkey // 10 = w.pk AND p.p_partkey >= 10
)
SELECT CAST(t.root AS BIGINT) AS root,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(MAX(t.depth) AS BIGINT) AS max_depth,
       CAST(SUM(t.cents) AS BIGINT) AS subtree_cents
FROM (SELECT w.root, w.depth,
             CAST(ROUND(p.p_retailprice * 100) AS BIGINT) AS cents
      FROM walk w JOIN part p ON p.p_partkey = w.pk) t
GROUP BY t.root
""",
)
def recursive_cte_part_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 ``WITH RECURSIVE`` surface (SQL:1999 recursive CTEs,
    new in Spark 4.0) on a variable-depth transitive closure that
    genuinely needs recursion — the BOM-explosion shape: partkeys form
    a forest under parent = pk div 10 (roots 1..9, depth grows with
    log10 of the key space, so the recursion is data-dependent, not a
    fixed unroll), and each root's subtree rolls up size, max depth,
    and exact retail-price cents. Both engines run the IDENTICAL
    recursive SQL text (modulo ``div`` vs ``//`` spelling — both
    truncate toward zero; keys are positive).

    Scale: each recursion step is one equi-join of the current frontier
    against the part dimension on a derived key — |iterations| =
    max depth ~ log10(|part|) (9 levels at 2B parts), every step a
    plain shuffle join the optimizer plans like any other; no driver
    loop, the engine's recursive-CTE executor owns the fixpoint."""
    part = load_table(spark, sf_dir, "part")
    part.createOrReplaceTempView("part_re5_v")
    return spark.sql(
        """
WITH RECURSIVE walk(root, pk, depth) AS (
  SELECT p_partkey, p_partkey, 0 FROM part_re5_v WHERE p_partkey < 10
  UNION ALL
  SELECT w.root, p.p_partkey, w.depth + 1
  FROM walk w JOIN part_re5_v p
    ON p.p_partkey div 10 = w.pk AND p.p_partkey >= 10
)
SELECT CAST(t.root AS BIGINT) AS root,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(MAX(t.depth) AS BIGINT) AS max_depth,
       CAST(SUM(t.cents) AS BIGINT) AS subtree_cents
FROM (SELECT w.root, w.depth,
             CAST(ROUND(p.p_retailprice * 100) AS BIGINT) AS cents
      FROM walk w JOIN part_re5_v p ON p.p_partkey = w.pk) t
GROUP BY t.root
"""
    )


# ---------------------------------------------------------------------------
# LOCF gap fill via IGNORE NULLS window aggregates
# ---------------------------------------------------------------------------


@register(
    "window_locf_gap_fill",
    oracle="""
WITH sparse AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase'
              THEN CAST(ROUND(value * 100) AS BIGINT) END AS raw_cents
  FROM events
),
filled AS (
  SELECT user_id, raw_cents,
         LAST_VALUE(raw_cents IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill_cents
  FROM sparse
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(raw_cents) AS BIGINT) AS n_observed,
       CAST(COUNT(fill_cents) AS BIGINT) AS n_filled,
       CAST(SUM(fill_cents) AS BIGINT) AS sum_filled_cents
FROM filled
GROUP BY user_id
""",
)
def window_locf_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap fill — the ``IGNORE NULLS``
    window surface (``LAST_VALUE(x IGNORE NULLS)`` over a running ROWS
    frame): every event row inherits the user's most recent purchase
    amount, the canonical sensor/price gap-fill every feature pipeline
    needs and the one window shape plain aggregates cannot express
    (the carry chain is order-dependent). Ordered by the house total
    order (ts, event_id) so ties are deterministic; rows before a
    user's first purchase stay NULL (COUNT proves how many). The
    per-user roll-up makes every fill hash-visible — the sum over the
    carry chain changes if any single row inherits the wrong value.

    Scale: one user-keyed window pass (the sessionization shuffle
    class) followed by a map-side-combinable aggregate on the same
    key — AQE reuses the exchange."""
    ev = load_table(spark, sf_dir, "events")
    sparse = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("long"),
        ).alias("raw_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = sparse.withColumn(
        "fill_cents", F.last("raw_cents", ignorenulls=True).over(w)
    )
    return filled.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.count("raw_cents").cast("long").alias("n_observed"),
        F.count("fill_cents").cast("long").alias("n_filled"),
        F.sum("fill_cents").cast("long").alias("sum_filled_cents"),
    )


# ---------------------------------------------------------------------------
# Cochran's Q over three per-customer binary treatments
# ---------------------------------------------------------------------------


@register(
    "stats_cochran_q_order_flags",
    oracle=f"""
WITH per AS ({_FLAGS_CTE}
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(urgent) AS BIGINT) AS g1,
         CAST(SUM(weekend) AS BIGINT) AS g2,
         CAST(SUM(highval) AS BIGINT) AS g3,
         CAST(SUM(urgent + weekend + highval) AS BIGINT) AS t,
         CAST(SUM((urgent + weekend + highval)
                  * (urgent + weekend + highval)) AS BIGINT) AS suml2
  FROM per
)
SELECT n_blocks, g1, g2, g3, t, suml2,
       CAST(CASE WHEN 3 * t - suml2 = 0 THEN 0
            ELSE (1000000::HUGEINT * 2
                  * (3 * (g1::HUGEINT * g1 + g2::HUGEINT * g2
                          + g3::HUGEINT * g3) - t::HUGEINT * t))
                 // (3 * t - suml2)
       END AS BIGINT) AS q_e6
FROM m
""",
)
def stats_cochran_q_order_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test (Cochran, Biometrika 1950) — the k-treatment
    generalization of McNemar for MATCHED binary outcomes: per customer
    (the block), three flags — ever-urgent, ever-weekend, and
    ever-high-value (o_totalprice >= 150000, a pinned literal so no
    quantile pass is needed) — and Q = (k−1)[kΣG_j² − T²]/[kT − ΣL_i²]
    with column totals G, row totals L, grand total T. All moments are
    exact integers from ONE map-side aggregate; Q ships as a
    128-bit-promoted floor-e6 rational. Completes the paired-design
    ladder: McNemar (k=2) → Cochran's Q (k=3+); Q reduces exactly to
    McNemar's uncorrected statistic at k=2.

    Scale: one per-customer MAX aggregate (map-side combinable), then a
    six-scalar roll-up to a single row."""
    per = _customer_order_flags(
        load_table(spark, sf_dir, "orders")
    ).withColumnsRenamed({"urgent": "x1", "weekend": "x2", "highval": "x3"})
    m = per.agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum("x1").cast("long").alias("g1"),
        F.sum("x2").cast("long").alias("g2"),
        F.sum("x3").cast("long").alias("g3"),
        F.sum(F.col("x1") + F.col("x2") + F.col("x3")).cast("long").alias("t"),
        F.sum(
            (F.col("x1") + F.col("x2") + F.col("x3"))
            * (F.col("x1") + F.col("x2") + F.col("x3"))
        )
        .cast("long")
        .alias("suml2"),
    )
    return m.select(
        "n_blocks",
        "g1",
        "g2",
        "g3",
        "t",
        "suml2",
        F.expr(
            "CAST(CASE WHEN 3 * t - suml2 = 0 THEN 0"
            " ELSE (CAST(1000000 AS DECIMAL(38,0)) * 2"
            "       * (3 * (CAST(g1 AS DECIMAL(38,0)) * g1"
            "               + CAST(g2 AS DECIMAL(38,0)) * g2"
            "               + CAST(g3 AS DECIMAL(38,0)) * g3)"
            "          - CAST(t AS DECIMAL(38,0)) * t))"
            "      div (3 * t - suml2)"
            " END AS BIGINT)"
        ).alias("q_e6"),
    )


# ---------------------------------------------------------------------------
# GROUP BY ALL surface
# ---------------------------------------------------------------------------


@register(
    "agg_group_by_all_revenue",
    oracle="""
SELECT o_orderstatus, o_orderpriority, year(o_orderdate) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
GROUP BY ALL
""",
)
def agg_group_by_all_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``GROUP BY ALL`` surface (Spark 3.4+/DuckDB dialect
    convergence: group by every non-aggregate select item, inferred):
    the yearly status×priority revenue rollup stated with the IDENTICAL
    SQL text on both engines — the grouping list is derived, not
    written, so adding a select item can never silently desynchronize
    the GROUP BY (the classic reporting-SQL bug class this clause
    exists to kill).

    Scale: one map-side-combinable aggregate; output bounded by
    |status|×|priority|×|years|."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gba_v")
    return spark.sql(
        """
SELECT o_orderstatus, o_orderpriority, year(o_orderdate) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders_gba_v
GROUP BY ALL
"""
    )


# ---------------------------------------------------------------------------
# Batch twin of the stream-stream LEFT OUTER interval join
# ---------------------------------------------------------------------------


@register(
    "streaming_left_join_batch_twin",
    oracle="""
WITH c AS (
  SELECT event_id AS cid, user_id AS u, ts AS cts
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id AS pid, user_id AS u, ts AS pts
  FROM events WHERE event_type = 'purchase'
),
j AS (
  SELECT c.u, c.cid, p.pid,
         CASE WHEN p.pid IS NOT NULL
              THEN epoch_us(p.pts) - epoch_us(c.cts) END AS lat
  FROM c LEFT JOIN p
    ON c.u = p.u AND p.pts > c.cts AND p.pts <= c.cts + INTERVAL 1 HOUR
)
SELECT u AS user_id,
       CAST(COUNT(DISTINCT cid) AS BIGINT) AS n_clicks,
       CAST(COUNT(pid) AS BIGINT) AS n_matched_pairs,
       CAST(COUNT(DISTINCT CASE WHEN pid IS NULL THEN cid END) AS BIGINT)
         AS n_unmatched_clicks,
       CAST(SUM(lat) AS BIGINT) AS latency_us_sum
FROM j GROUP BY u
""",
)
def streaming_left_join_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.stream_click_purchase_left_join — the
    watermark-complete target relation of the stream-stream LEFT OUTER
    interval join, under the driver's oracle gate (the near-dup /
    token-budget / PSI twin discipline: every stateful streaming lane
    carries an exactly-checkable batch statement of what the stream
    converges to). Per user: click count, attributed (click, purchase)
    pairs within the 1-hour window, UNMATCHED clicks (the rows only the
    outer join emits — on the stream they release when the purchase
    watermark passes click_ts + window), and the exact summed
    attribution latency. tests/test_streaming.py proves the stream
    equals this relation once a watermark-advancing sentinel drains the
    join state.

    Scale: the batch join shuffles both sides on user_id (AQE handles
    the fan-out); the roll-up combines map-side on the same key. The
    STREAM holds only watermark-bounded state — that is the point of
    the lane."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("cts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    j = c.join(
        p,
        (F.col("u") == F.col("pu"))
        & (F.col("pts") > F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    ).select(
        "u",
        "cid",
        "pid",
        F.when(
            F.col("pid").isNotNull(),
            F.unix_micros(F.col("pts").cast("timestamp_ltz"))
            - F.unix_micros(F.col("cts").cast("timestamp_ltz")),
        ).alias("lat"),
    )
    return j.groupBy(F.col("u").alias("user_id")).agg(
        F.countDistinct("cid").cast("long").alias("n_clicks"),
        F.count("pid").cast("long").alias("n_matched_pairs"),
        F.countDistinct(F.when(F.col("pid").isNull(), F.col("cid")))
        .cast("long")
        .alias("n_unmatched_clicks"),
        F.sum("lat").cast("long").alias("latency_us_sum"),
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis rank test across order priorities
# ---------------------------------------------------------------------------


@register(
    "stats_kruskal_wallis_priority",
    oracle="""
WITH c AS (
  SELECT o_orderpriority AS grp,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
),
vals AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM c GROUP BY v
),
ranked AS (
  SELECT v, cnt,
         CAST(COALESCE(SUM(cnt) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS less_n
  FROM vals
),
tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_num
  FROM ranked
),
per AS (
  SELECT c.grp, CAST(COUNT(*) AS BIGINT) AS n_i,
         CAST(SUM(2 * r.less_n + r.cnt + 1) AS BIGINT) AS s2
  FROM c JOIN ranked r ON c.v = r.v
  GROUP BY c.grp
)
SELECT per.grp AS priority, per.n_i, per.s2,
       tot.n, tot.tie_num,
       CAST(tot.n::HUGEINT * tot.n * tot.n - tot.n AS BIGINT) AS tie_den,
       CAST((3000000::HUGEINT
             * (per.s2::HUGEINT - per.n_i::HUGEINT * (tot.n + 1))
             * (per.s2::HUGEINT - per.n_i::HUGEINT * (tot.n + 1)))
            // (per.n_i::HUGEINT * tot.n * (tot.n + 1))
            AS BIGINT) AS h_contrib_e6
FROM per CROSS JOIN tot
""",
)
def stats_kruskal_wallis_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis one-way rank test (Kruskal & Wallis, JASA 1952)
    of order value across the five priorities — the NONPARAMETRIC
    k-sample member beside the family's moment-based ANOVA, variance
    (Brown-Forsythe) and location (Welch) gates: H = 12/(N(N+1))
    Σ nᵢ(R̄ᵢ − (N+1)/2)². Exactness: midranks with ties are
    half-integers, so DOUBLED ranks R2 = 2·|{v' < v}| + t_v + 1 are
    integers and each group's contribution clears to
    3·(S2ᵢ − nᵢ(N+1))²/(nᵢN(N+1)) — emitted as a 128-bit-promoted
    floor-e6 per group (the reported statistic is the SUM of the
    floored per-group terms, a deterministic convention both engines
    state identically), with the tie-correction factor
    1 − Σ(t³−t)/(N³−N) shipped as its exact integer pair.

    Scale: ranks come from the DISTINCT-value relation (one global
    cumulative window over |distinct cents| — the exact-quantiles sort
    class with the documented quickselect swap at the 10M cutoff), then
    one equi-join back to the fact rows and a map-side group roll-up."""
    c = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    vals = c.groupBy("v").agg(F.count("*").cast("long").alias("cnt"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.withColumn(
        "less_n", F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long")
    )
    tot = ranked.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("long")
        .alias("tie_num"),
    )
    per = (
        c.join(ranked, "v")
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_i"),
            F.sum(2 * F.col("less_n") + F.col("cnt") + 1)
            .cast("long")
            .alias("s2"),
        )
    )
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("grp").alias("priority"),
        "n_i",
        "s2",
        "n",
        "tie_num",
        F.expr(
            "CAST(CAST(n AS DECIMAL(38,0)) * n * n - n AS BIGINT)"
        ).alias("tie_den"),
        F.expr(
            "CAST((CAST(3000000 AS DECIMAL(38,0))"
            " * (CAST(s2 AS DECIMAL(38,0)) - CAST(n_i AS DECIMAL(38,0)) * (n + 1))"
            " * (CAST(s2 AS DECIMAL(38,0)) - CAST(n_i AS DECIMAL(38,0)) * (n + 1)))"
            " div (CAST(n_i AS DECIMAL(38,0)) * n * (n + 1)) AS BIGINT)"
        ).alias("h_contrib_e6"),
    )


# ---------------------------------------------------------------------------
# KMV / theta-sketch set operations between two customer cohorts
# ---------------------------------------------------------------------------

_KMVI_K = 256
_KMVI_P = (1 << 31) - 1


@register(
    "sketch_kmv_intersection_portable",
    oracle=f"""
WITH flags AS ({_FLAGS_CTE}
),
hv AS (
  SELECT o_custkey, urgent AS a, weekend AS b,
         list_reduce(list_transform(
           string_split_regex(substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8), ''),
           c -> CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1),
           (x, y) -> x * 16 + y) % {_KMVI_P} AS h
  FROM flags
),
ska AS (SELECT h FROM hv WHERE a = 1 ORDER BY h LIMIT {_KMVI_K}),
skb AS (SELECT h FROM hv WHERE b = 1 ORDER BY h LIMIT {_KMVI_K}),
comb AS (
  SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb) u
  ORDER BY h LIMIT {_KMVI_K}
),
theta AS (
  SELECT MAX(h) AS th, CAST(COUNT(*) AS BIGINT) AS ku FROM comb
),
inter AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_int
  FROM ska JOIN skb USING (h) CROSS JOIN theta
  WHERE ska.h < theta.th
),
tru AS (
  SELECT CAST(SUM(urgent) AS BIGINT) AS true_a,
         CAST(SUM(weekend) AS BIGINT) AS true_b,
         CAST(SUM(urgent * weekend) AS BIGINT) AS true_int,
         CAST(SUM(CASE WHEN urgent = 1 OR weekend = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS true_union
  FROM flags
)
SELECT CAST({_KMVI_K} AS BIGINT) AS k, theta.ku, theta.th AS theta,
       inter.n_int,
       CAST((theta.ku - 1)::HUGEINT * {_KMVI_P} // theta.th AS BIGINT)
         AS est_union,
       CAST((inter.n_int::HUGEINT
             * ((theta.ku - 1)::HUGEINT * {_KMVI_P} // theta.th))
            // theta.ku AS BIGINT) AS est_intersection,
       tru.true_a, tru.true_b, tru.true_union, tru.true_int
FROM theta CROSS JOIN inter CROSS JOIN tru
""",
)
def sketch_kmv_intersection_portable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS on KMV bottom-k sketches
    (Dasgupta et al., 'Theta sketch framework', 2016; KMV per
    Bar-Yossef 2002, Beyer 2007): two customer cohorts — ever-urgent
    (A) and ever-weekend (B) — sketch independently with the portable
    md5-derived 32-bit hash; θ is the k-th smallest over the MERGED
    sketch, est(|A∪B|) = (k−1)·p div θ, and the intersection estimate
    scales the union estimate by the fraction of sub-θ hashes present
    in BOTH sketches (the theta-framework Jaccard rule, entries
    strictly below θ — a pinned convention both engines state
    identically). This is the sketch-algebra the distinct-count member
    (sketch_kmv_distinct_portable) cannot do: cohort overlap WITHOUT
    co-scanning, the mergeability that makes bottom-k sketches
    map-reduce-native. Exact cohort truths ride along (self-auditing
    like the HLL/Bloom members).

    Scale: one per-customer flag aggregate; each sketch is a
    TakeOrdered bottom-k (per-partition k, then merge — never a global
    sort); everything after runs on ≤ 3k hash values. The exact-truth
    leg is the audit and drops at 100 TB."""
    flags = _customer_order_flags(
        load_table(spark, sf_dir, "orders")
    ).withColumnsRenamed({"urgent": "a", "weekend": "b"})
    hv = flags.select(
        "a",
        "b",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint"),
            F.lit(_KMVI_P),
        ).alias("h"),
    )
    ska = hv.filter(F.col("a") == 1).select("h").orderBy("h").limit(_KMVI_K)
    skb = hv.filter(F.col("b") == 1).select("h").orderBy("h").limit(_KMVI_K)
    comb = ska.union(skb).distinct().orderBy("h").limit(_KMVI_K)
    theta = comb.agg(
        F.max("h").alias("th"), F.count("*").cast("long").alias("ku")
    )
    inter = (
        ska.join(skb, "h")
        .crossJoin(F.broadcast(theta.select("th")))
        .filter(F.col("h") < F.col("th"))
        .agg(F.count("*").cast("long").alias("n_int"))
    )
    tru = flags.agg(
        F.sum("a").cast("long").alias("true_a"),
        F.sum("b").cast("long").alias("true_b"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("true_int"),
        F.sum(
            F.when((F.col("a") == 1) | (F.col("b") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("true_union"),
    )
    return (
        theta.crossJoin(F.broadcast(inter))
        .crossJoin(F.broadcast(tru))
        .select(
            F.lit(_KMVI_K).cast("long").alias("k"),
            "ku",
            F.col("th").alias("theta"),
            "n_int",
            F.expr(
                f"CAST((CAST(ku - 1 AS DECIMAL(38,0)) * {_KMVI_P}) div th"
                " AS BIGINT)"
            ).alias("est_union"),
            F.expr(
                "CAST((CAST(n_int AS DECIMAL(38,0))"
                f" * ((CAST(ku - 1 AS DECIMAL(38,0)) * {_KMVI_P}) div th))"
                " div ku AS BIGINT)"
            ).alias("est_intersection"),
            "true_a",
            "true_b",
            "true_union",
            "true_int",
        )
    )


# ---------------------------------------------------------------------------
# HITS hubs/authorities over the part->supplier graph
# ---------------------------------------------------------------------------


def _hits_oracle(iterations: int = 3) -> str:
    """Unrolled-CTE DuckDB twin of operators/pagerank.hits_int: the
    identical ppm floor-division re-normalization per round, so every
    score is bit-identical to the operator's."""
    parts = [
        """
WITH e AS (SELECT DISTINCT l_partkey AS s, l_suppkey AS d FROM lineitem),
h0 AS (SELECT DISTINCT s AS node, CAST(1000000 AS BIGINT) AS sc FROM e)"""
    ]
    for i in range(iterations):
        parts.append(
            f""",
ra{i} AS (SELECT e.d, SUM(h{i}.sc) AS raw FROM e
          JOIN h{i} ON h{i}.node = e.s GROUP BY e.d),
ta{i} AS (SELECT SUM(raw) AS tot FROM ra{i}),
a{i + 1} AS (SELECT d AS node,
             CAST((1000000::HUGEINT * raw) // tot AS BIGINT) AS sc
             FROM ra{i} CROSS JOIN ta{i}),
rh{i} AS (SELECT e.s, SUM(a{i + 1}.sc) AS raw FROM e
          JOIN a{i + 1} ON a{i + 1}.node = e.d GROUP BY e.s),
th{i} AS (SELECT SUM(raw) AS tot FROM rh{i}),
h{i + 1} AS (SELECT s AS node,
             CAST((1000000::HUGEINT * raw) // tot AS BIGINT) AS sc
             FROM rh{i} CROSS JOIN th{i})"""
        )
    parts.append(
        f"""
SELECT * FROM (
  SELECT 'hub' AS role, node, sc AS score_ppm,
         ROW_NUMBER() OVER (ORDER BY sc DESC, node) AS rank_pos
  FROM h{iterations} QUALIFY rank_pos <= 50
) UNION ALL
SELECT * FROM (
  SELECT 'auth' AS role, node, sc AS score_ppm,
         ROW_NUMBER() OVER (ORDER BY sc DESC, node) AS rank_pos
  FROM a{iterations} QUALIFY rank_pos <= 50
)"""
    )
    return "".join(parts)


@register("graph_hits_part_supplier", oracle=_hits_oracle())
def graph_hits_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs and authorities (Kleinberg, JACM 1999) over the
    directed part→supplier graph from lineitem: which parts are the
    strongest hubs (sourced from many authoritative suppliers) and
    which suppliers the strongest authorities — the mutual-reinforcement
    centrality beside the registry's PageRank view of the same
    bipartite structure. Integer-exact by the pagerank_int discipline:
    scores live in ppm, each iteration re-normalizes by the SUM with a
    128-bit-promoted floor division, so the ITERATIVE algorithm carries
    a full value-hash oracle (the same three rounds unrolled as chained
    CTEs). Top-50 per role under the (score, node) total order.

    Scale: two map-side-combined shuffles per iteration plus one
    scalar-sum broadcast per side; score relations are |nodes| rows;
    lineage truncated per round (localCheckpoint); the per-role top-50
    is a TakeOrdered, never a global-window sort."""
    from db_writer_redshift_spark.operators.pagerank import hits_int

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_partkey").alias("s"), F.col("l_suppkey").alias("d")
    )
    hubs, auths = hits_int(edges, "s", "d", iterations=3)

    def top(df: DataFrame, role: str) -> DataFrame:
        t = df.orderBy(F.col("score_ppm").desc(), F.col("node")).limit(50)
        w = Window.orderBy(F.col("score_ppm").desc(), F.col("node"))
        return t.withColumn("rank_pos", F.row_number().over(w)).select(
            F.lit(role).alias("role"),
            "node",
            "score_ppm",
            F.col("rank_pos").cast("long"),
        )

    return top(hubs, "hub").unionByName(top(auths, "auth"))


# ---------------------------------------------------------------------------
# Year-over-year activity-tier migration matrix (churn / acquisition)
# ---------------------------------------------------------------------------


@register(
    "customer_segment_migration",
    oracle="""
WITH yrs AS (SELECT DISTINCT year(o_orderdate) AS y FROM orders),
cust AS (SELECT DISTINCT o_custkey AS c FROM orders),
act AS (
  SELECT o_custkey AS c, year(o_orderdate) AS y, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
grid AS (
  SELECT cust.c, yrs.y,
         CASE WHEN act.n >= 4 THEN 'heavy' WHEN act.n >= 2 THEN 'regular'
              WHEN act.n >= 1 THEN 'light' ELSE 'none' END AS tier
  FROM cust CROSS JOIN yrs
  LEFT JOIN act ON act.c = cust.c AND act.y = yrs.y
),
mig AS (
  SELECT c, y, tier,
         LEAD(tier) OVER (PARTITION BY c ORDER BY y) AS tier_next
  FROM grid
)
SELECT CAST(y AS BIGINT) AS year_from, tier AS seg_from,
       tier_next AS seg_to,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM mig WHERE tier_next IS NOT NULL
GROUP BY 1, 2, 3
""",
)
def customer_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year activity-tier MIGRATION matrix — the cohort
    dynamics the static RFM segmentation (customer_rfm_segments)
    cannot show: per customer and calendar year, an activity tier from
    pinned order-count thresholds (heavy >= 4, regular >= 2, light >= 1,
    none = inactive), then the (tier, next-year tier) transition counts.
    The 'none' rows make churn (active → none) and
    acquisition/reactivation (none → active) first-class cells of the
    same matrix — the retention-triangle's transition-level sibling and
    the engagement analog of events_markov_chain's state transitions.

    Scale: the activity rollup combines map-side; the (customer × year)
    grid is a broadcast cross join against the bounded year spine (|Y|
    ~ 7), the LEAD window sorts <= |Y| rows per customer key, and the
    output is bounded by |Y| × 16 cells."""
    o = load_table(spark, sf_dir, "orders")
    yrs = o.select(F.year("o_orderdate").alias("y")).distinct()
    cust = o.select(F.col("o_custkey").alias("c")).distinct()
    act = o.groupBy(
        F.col("o_custkey").alias("c"), F.year("o_orderdate").alias("y")
    ).agg(F.count("*").alias("n"))
    grid = (
        cust.crossJoin(F.broadcast(yrs))
        .join(act, ["c", "y"], "left")
        .select(
            "c",
            "y",
            F.when(F.col("n") >= 4, "heavy")
            .when(F.col("n") >= 2, "regular")
            .when(F.col("n") >= 1, "light")
            .otherwise("none")
            .alias("tier"),
        )
    )
    w = Window.partitionBy("c").orderBy("y")
    mig = grid.withColumn("tier_next", F.lead("tier").over(w))
    return (
        mig.filter(F.col("tier_next").isNotNull())
        .groupBy(
            F.col("y").cast("long").alias("year_from"),
            F.col("tier").alias("seg_from"),
            F.col("tier_next").alias("seg_to"),
        )
        .agg(F.count("*").cast("long").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank test on paired weekend/weekday spend
# ---------------------------------------------------------------------------


@register(
    "stats_wilcoxon_signed_rank",
    oracle="""
WITH per AS (
  SELECT o_custkey,
         CAST(SUM(CASE WHEN isodow(o_orderdate::DATE) >= 6
                  THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS wke,
         CAST(SUM(CASE WHEN isodow(o_orderdate::DATE) < 6
                  THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS wkd,
         MAX(CASE WHEN isodow(o_orderdate::DATE) >= 6 THEN 1 ELSE 0 END)
           AS has_w,
         MAX(CASE WHEN isodow(o_orderdate::DATE) < 6 THEN 1 ELSE 0 END)
           AS has_d
  FROM orders GROUP BY o_custkey
),
d AS (
  SELECT wke - wkd AS d FROM per
  WHERE has_w = 1 AND has_d = 1 AND wke <> wkd
),
vals AS (
  SELECT abs(d) AS ad, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM d GROUP BY abs(d)
),
ranked AS (
  SELECT ad, cnt, pos,
         CAST(COALESCE(SUM(cnt) OVER (ORDER BY ad
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS less_n
  FROM vals
),
m AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(pos * (2 * less_n + cnt + 1)) AS BIGINT) AS w2p,
         CAST(SUM((cnt - pos) * (2 * less_n + cnt + 1)) AS BIGINT) AS w2m,
         CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS t3
  FROM ranked
)
SELECT n AS n_pairs, w2p AS w2_plus, w2m AS w2_minus, t3,
       CAST(CASE WHEN 2::HUGEINT * n * (n + 1) * (2 * n + 1) - t3 = 0 THEN 0
            ELSE (3000000::HUGEINT
                  * (2 * w2p - n::HUGEINT * (n + 1))
                  * (2 * w2p - n::HUGEINT * (n + 1)))
                 // (2::HUGEINT * n * (n + 1) * (2 * n + 1) - t3)
       END AS BIGINT) AS z2_e6
FROM m
""",
)
def stats_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test (Wilcoxon, Biometrics 1945) on the
    paired weekend-vs-weekday spend per customer — the CONTINUOUS
    paired test completing the matched-design ladder (McNemar: paired
    binary; Cochran's Q: k binary; this: paired magnitudes): pairs are
    customers active on both sides, zero differences drop per the
    classic procedure, |d| midranks with ties use the DOUBLED-rank
    trick (half-integer midranks stay integer when doubled — the
    Kruskal-Wallis discipline), and the large-sample statistic clears
    to z² = 3(2W₂⁺ − n(n+1))² / (2n(n+1)(2n+1) − Σ(t³−t)) — one exact
    128-bit rational, no sqrt anywhere. W₂⁺ + W₂⁻ = n(n+1) is the
    conservation the invariant test pins.

    Scale: one per-customer rollup (map-side combined); ranks from the
    DISTINCT-|d| cumulative window (bounded by the value domain);
    five-scalar final row."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    wk = F.weekday(F.col("o_orderdate")) + 1 >= 6
    per = load_table(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.sum(F.when(wk, cents).otherwise(0)).cast("long").alias("wke"),
        F.sum(F.when(~wk, cents).otherwise(0)).cast("long").alias("wkd"),
        F.max(F.when(wk, 1).otherwise(0)).alias("has_w"),
        F.max(F.when(~wk, 1).otherwise(0)).alias("has_d"),
    )
    d = per.filter(
        (F.col("has_w") == 1)
        & (F.col("has_d") == 1)
        & (F.col("wke") != F.col("wkd"))
    ).select((F.col("wke") - F.col("wkd")).alias("d"))
    vals = d.groupBy(F.abs(F.col("d")).alias("ad")).agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).cast("long").alias("pos"),
    )
    w = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.withColumn(
        "less_n", F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long")
    )
    m = ranked.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("pos") * (2 * F.col("less_n") + F.col("cnt") + 1))
        .cast("long")
        .alias("w2p"),
        F.sum(
            (F.col("cnt") - F.col("pos"))
            * (2 * F.col("less_n") + F.col("cnt") + 1)
        )
        .cast("long")
        .alias("w2m"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("long")
        .alias("t3"),
    )
    return m.select(
        F.col("n").alias("n_pairs"),
        F.col("w2p").alias("w2_plus"),
        F.col("w2m").alias("w2_minus"),
        "t3",
        F.expr(
            "CAST(CASE WHEN CAST(2 AS DECIMAL(38,0)) * n * (n + 1)"
            " * (2 * n + 1) - t3 = 0 THEN 0"
            " ELSE (CAST(3000000 AS DECIMAL(38,0))"
            "       * (2 * w2p - CAST(n AS DECIMAL(38,0)) * (n + 1))"
            "       * (2 * w2p - CAST(n AS DECIMAL(38,0)) * (n + 1)))"
            "      div (CAST(2 AS DECIMAL(38,0)) * n * (n + 1)"
            "           * (2 * n + 1) - t3)"
            " END AS BIGINT)"
        ).alias("z2_e6"),
    )
