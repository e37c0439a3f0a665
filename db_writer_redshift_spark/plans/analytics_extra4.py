"""Round-8 analytics batch: Spark-4 SQL surface probes, ordered-set
aggregates, classical agreement/dispersion/homogeneity statistics,
integer-exact smoothing forecasts, KMV sketches, and embedding/privacy
audits.

* ``pipe_syntax_orders_rollup`` — the Spark 4 SQL *pipe syntax* surface
  (``FROM t |> WHERE … |> AGGREGATE … GROUP BY …``): the same rollup the
  oracle states in ANSI, proving the new operator-chain dialect lands on
  the identical plan semantics.
* ``agg_mode_percentile_disc`` — ordered-set aggregates per group:
  ANSI ``PERCENTILE_DISC(0.5) WITHIN GROUP`` (the smallest value whose
  cumulative distribution reaches ½ — a VALUE FROM THE DATA, so it is
  hash-exact cross-engine where interpolating PERCENTILE_CONT flaps)
  plus a deterministic mode with the (count DESC, value ASC) tie rule
  stated identically in both engines.
* ``events_fano_factor_daily`` — Fano factor (Fano 1947) of daily event
  counts per type: the variance-to-mean dispersion index as an exact
  scaled rational via the n·Σx²−(Σx)² identity — the Poisson
  over/under-dispersion gate beside events_interarrival_cv.
* ``stats_cohens_kappa_value_weekend`` — Cohen's kappa (Cohen 1960)
  between two binary labelings of every event (value above the global
  median; weekend occurrence): observed vs chance agreement from the
  2×2 contingency in exact 128-bit arithmetic, floor-ppm.
* ``stats_levene_brown_forsythe`` — Brown-Forsythe robust
  variance-homogeneity test (Brown & Forsythe 1974): median-centered
  absolute deviations in exact cents, then the one-way-ANOVA F machinery
  over the deviations (the stats_anova_returnflag_price driver-fold
  discipline).
* ``forecast_holt_linear_daily`` — Holt's linear-trend double
  exponential smoothing (Holt 1957) over the calendar-bounded daily
  order count with α=β=½: level/trend evolve by integer truncating halving,
  replayed as an exact sequential fold (KM/Markov discipline) with a
  DuckDB ``list_reduce`` twin over offset-packed HUGEINT state.
* ``sketch_kmv_distinct_portable`` — the K-Minimum-Values distinct
  sketch (Bar-Yossef et al. 2002): k smallest md5-derived hashes,
  estimate (k−1)·p // h_k — every value reproducible in ANSI SQL, with
  the exact distinct count and signed error beside it.
* ``privacy_entropy_l_diversity`` — entropy ℓ-diversity (Machanavajjhala
  et al. 2007): per-quasi-group sensitive-value entropy as per-row
  rounded-e9 ln terms (the PSI discipline — never a summed
  transcendental), with the effective ℓ (floor of exp(H)) left as exact
  integer comparisons.
* ``embedding_prefix_norm_curve`` — Matryoshka-style prefix-energy audit
  (Kusupati et al. 2022): e6-quantized component squares, exact prefix
  sums at k ∈ {4, 8, 16, 32, d}, energy fraction in floor-ppm per label.
* ``stats_gini_impurity_split`` — CART decision-stump split audit
  (Breiman et al. 1984): weighted Gini impurity of o_orderstatus at each
  exact totalprice-quintile boundary, exact floor-e6 rationals.
* ``er_levenshtein_verify`` — blocked entity-resolution verify stage on
  part names: candidate pairs from (brand, first token) blocks, edit
  distance from the engines' native ``levenshtein`` (identical DP
  definition), similarity in floor-ppm.
* ``stats_ols_discount_quantity`` — exact OLS slope/intercept (and R²)
  of quantity on discount from integer moments with 128-bit promotion
  before every product (the ADVICE-r7 overflow discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from db_writer_redshift_spark.plans.registry import load_table, register

# ---------------------------------------------------------------------------
# Spark 4 pipe-syntax surface probe
# ---------------------------------------------------------------------------


@register(
    "pipe_syntax_orders_rollup",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders
WHERE o_orderstatus <> 'F'
GROUP BY o_orderpriority
""",
)
def pipe_syntax_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL *pipe syntax* (the ``|>`` operator-chain dialect,
    SPARK-49555): the filter→aggregate rollup written as a pipeline of
    clauses, graded against the SAME rollup stated in ANSI by the
    oracle. What is being proven is the new SURFACE, not new semantics —
    the pipe parser must land on the identical logical plan (Catalyst
    canonicalizes both to Aggregate(Filter(Scan))), so filters still
    push down and partial aggregation still runs map-side.

    Scale: one scan, one map-side-combined aggregate; the distinct
    customer count is the only shuffle-widening term (two-stage
    distinct), identical in both dialects."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "pipe_orders_v"
    )
    return spark.sql(
        """
FROM pipe_orders_v
|> WHERE o_orderstatus <> 'F'
|> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
   GROUP BY o_orderpriority
|> SELECT o_orderpriority, n_orders, total_cents, n_customers
"""
    )


# ---------------------------------------------------------------------------
# Ordered-set aggregates: PERCENTILE_DISC + deterministic mode
# ---------------------------------------------------------------------------


@register(
    "agg_mode_percentile_disc",
    oracle="""
WITH v AS (
  SELECT o_orderpriority AS g,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderstatus AS status
  FROM orders
),
med AS (
  -- ANSI PERCENTILE_DISC(0.5): the SMALLEST value whose cume_dist
  -- reaches 1/2 — spelled out as the cd >= 0.5 order statistic so both
  -- engines share one definition regardless of their builtin's
  -- convention on even counts.
  SELECT g, MIN(cents) AS median_cents
  FROM (SELECT g, cents,
               CUME_DIST() OVER (PARTITION BY g ORDER BY cents) AS cd
        FROM v)
  WHERE cd >= 0.5 GROUP BY g
),
m AS (
  SELECT g, status AS mode_status
  FROM (SELECT g, status, COUNT(*) AS c,
               ROW_NUMBER() OVER (PARTITION BY g
                                  ORDER BY COUNT(*) DESC, status) AS rk
        FROM v GROUP BY g, status)
  WHERE rk = 1
)
SELECT med.g AS o_orderpriority, med.median_cents, m.mode_status,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM v WHERE v.g = med.g) AS n
FROM med JOIN m ON med.g = m.g
""",
)
def agg_mode_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregates per order priority: the ANSI
    ``PERCENTILE_DISC(0.5) WITHIN GROUP`` median (Spark 4's native
    ordered-set syntax) and a deterministic mode with the (count DESC,
    value ASC) tie rule. PERCENTILE_DISC is the hash-safe quantile: it
    RETURNS A VALUE PRESENT IN THE DATA (smallest value with cumulative
    distribution ≥ p), so no interpolation arithmetic can flap
    cross-engine — the discrete complement of exact_quantiles'
    manual order statistics. The mode deliberately avoids both engines'
    builtin ``mode()`` (tie order is implementation-defined in each)
    and states the tie rule as an identical window in both.

    Scale: the median is one window per group partition (cume_dist needs
    the group's sort — same cost class as exact_quantiles); mode is a
    map-side-combined (g, status) count plus a |groups|×|statuses|
    window. Integer cents end to end."""
    v = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderstatus").alias("status"),
    )
    v.createOrReplaceTempView("osa_v")
    med = spark.sql(
        "SELECT g, PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY cents)"
        " AS median_cents, CAST(COUNT(*) AS BIGINT) AS n"
        " FROM osa_v GROUP BY g"
    ).select("g", F.col("median_cents").cast("long").alias("median_cents"), "n")
    wc = Window.partitionBy("g").orderBy(F.col("c").desc(), F.col("status"))
    mode = (
        v.groupBy("g", "status")
        .agg(F.count("*").alias("c"))
        .withColumn("rk", F.row_number().over(wc))
        .filter(F.col("rk") == 1)
        .select("g", F.col("status").alias("mode_status"))
    )
    return med.join(mode, "g").select(
        F.col("g").alias("o_orderpriority"),
        "median_cents",
        "mode_status",
        "n",
    )


# ---------------------------------------------------------------------------
# Fano factor of daily counts (Fano 1947)
# ---------------------------------------------------------------------------


@register(
    "events_fano_factor_daily",
    oracle="""
WITH daily AS (
  SELECT event_type, ts::DATE AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
mo AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS ss
  FROM daily GROUP BY event_type
)
SELECT event_type, n_days, s AS n_events,
       CAST((1000000::HUGEINT * (n_days::HUGEINT * ss - s::HUGEINT * s))
            // (n_days::HUGEINT * (n_days - 1) * s) AS BIGINT)
         AS fano_e6
FROM mo WHERE n_days >= 2 AND s > 0
""",
)
def events_fano_factor_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (Fano 1947) of daily event counts per type — the
    variance-to-mean dispersion index: 1 for a Poisson arrival process,
    >1 for bursty over-dispersion, <1 for regularity. F = s²/x̄ over the
    day-count series, assembled as ONE exact scaled rational via the
    two-pass identity: fano_e6 = 1e6·(n·Σc² − (Σc)²) / (n·(n−1)·Σc)
    (sample variance over mean, common denominators multiplied through,
    every product promoted to 128 bits BEFORE multiplying — the ADVICE
    r7 overflow discipline). The aggregate-count complement of
    events_interarrival_cv's gap-based burstiness.

    Scale: the daily rollup is a map-side-combinable aggregate bounded
    by |types|×calendar; the moment rollup and the quotient run on that
    tiny relation."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    mo = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    return mo.filter((F.col("n_days") >= 2) & (F.col("s") > 0)).select(
        "event_type",
        "n_days",
        F.col("s").alias("n_events"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * (CAST(n_days AS DECIMAL(38,0)) * ss"
            "    - CAST(s AS DECIMAL(38,0)) * s))"
            " div (CAST(n_days AS DECIMAL(38,0)) * (n_days - 1) * s)"
            " AS BIGINT)"
        ).alias("fano_e6"),
    )


# ---------------------------------------------------------------------------
# Cohen's kappa between two event labelings (Cohen 1960)
# ---------------------------------------------------------------------------

# Shared sort cutoff for the global-CUME_DIST dual paths below (kappa
# median, gini thresholds) — same rationale as _NTILE_SORT_CUTOFF: below
# it the one-partition sort window is cheaper in wall-clock and the
# sorted partition is bounded (~160 MB of longs); above it the
# quickselect boundary path is scan-proportional with no global sort.
_CUME_SORT_CUTOFF = 10_000_000


@register(
    "stats_cohens_kappa_value_weekend",
    oracle="""
WITH med AS (
  SELECT MIN(v) AS m FROM (
    SELECT CAST(ROUND(value * 1000000) AS BIGINT) AS v,
           CUME_DIST() OVER (ORDER BY CAST(ROUND(value * 1000000) AS BIGINT))
             AS cd
    FROM events)
  WHERE cd >= 0.5
),
lab AS (
  SELECT CASE WHEN CAST(ROUND(value * 1000000) AS BIGINT) >= med.m
              THEN 1 ELSE 0 END AS a,
         CASE WHEN isodow(ts::DATE) >= 6 THEN 1 ELSE 0 END AS b
  FROM events, med
),
ct AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n11,
         CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n10,
         CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n01,
         CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n00
  FROM lab
)
SELECT n, n11, n10, n01, n00,
       CAST((1000000::HUGEINT * (n11 + n00)) // n AS BIGINT) AS po_ppm,
       CAST((1000000::HUGEINT * ((n11 + n10)::HUGEINT * (n11 + n01)
             + (n01 + n00)::HUGEINT * (n10 + n00)))
            // (n::HUGEINT * n) AS BIGINT) AS pe_ppm,
       CASE WHEN n::HUGEINT * n
                 - ((n11 + n10)::HUGEINT * (n11 + n01)
                    + (n01 + n00)::HUGEINT * (n10 + n00)) = 0 THEN 0
            ELSE CAST((1000000::HUGEINT
                       * (n::HUGEINT * (n11 + n00)
                          - ((n11 + n10)::HUGEINT * (n11 + n01)
                             + (n01 + n00)::HUGEINT * (n10 + n00))))
                      // (n::HUGEINT * n
                          - ((n11 + n10)::HUGEINT * (n11 + n01)
                             + (n01 + n00)::HUGEINT * (n10 + n00)))
                      AS BIGINT)
       END AS kappa_ppm
FROM ct
""",
)
def stats_cohens_kappa_value_weekend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cohen's kappa (Cohen 1960) — chance-corrected agreement between
    two binary labelings of every event: labeler A says "value at or
    above the corpus median" (the PERCENTILE_DISC order statistic, a
    value from the data — hash-exact), labeler B says "weekend"
    (isodow ≥ 6 ↔ Spark weekday+1, the house dow convention). κ =
    (p_o − p_e)/(1 − p_e) assembled as one exact 128-bit rational over
    the 2×2 contingency: numerator n·(n11+n00) − (r1·c1 + r0·c0),
    denominator n² − (r1·c1 + r0·c0), every product promoted BEFORE
    multiplying. The agreement-measure member beside Cramér's V
    (association) and the PMI cells (pointwise association).

    Scale: the median is DUAL-PATH on corpus size (the
    window_ntile_decile_stats discipline, round 9): below the sort
    cutoff the global cume_dist window runs (one sorted partition,
    bounded by the cutoff); above it the median comes from
    selection.kths_smallest_multi at the driver-replicated disc_rank —
    scan-proportional, no corpus-sized sort. Labeling is codegen
    arithmetic; the contingency is a single map-side-combined aggregate
    to 5 scalars."""
    ev = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 1_000_000).cast("long").alias("v"),
        F.col("ts"),
    )
    return _kappa_from_events(ev)


def _kappa_from_events(ev: DataFrame, force_quickselect: bool = False) -> DataFrame:
    from db_writer_redshift_spark.operators.selection import (
        disc_rank,
        kths_smallest_multi,
    )

    n_rows = ev.count()
    if n_rows < _CUME_SORT_CUTOFF and not force_quickselect:
        med = (
            ev.select(
                "v", F.cume_dist().over(Window.orderBy("v")).alias("cd")
            )
            .filter(F.col("cd") >= 0.5)
            .agg(F.min("v").alias("m"))
        )
    else:
        # min v with cume_dist >= 0.5 IS the disc_rank(n, 0.5)-th
        # smallest (any smaller value has cd <= (k-1)/n < 0.5) — same
        # argument as _trimmed_winsorized; bit-equal, forced-path pytest
        m_val = kths_smallest_multi(ev, "v", [disc_rank(n_rows, 0.5)])[0]
        med = ev.sparkSession.createDataFrame([(m_val,)], "m long")
    lab = ev.crossJoin(F.broadcast(med)).select(
        F.when(F.col("v") >= F.col("m"), 1).otherwise(0).alias("a"),
        F.when(F.weekday(F.col("ts")) + 1 >= 6, 1).otherwise(0).alias("b"),
    )
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    ct = lab.agg(
        F.count("*").cast("long").alias("n"),
        one((F.col("a") == 1) & (F.col("b") == 1)).alias("n11"),
        one((F.col("a") == 1) & (F.col("b") == 0)).alias("n10"),
        one((F.col("a") == 0) & (F.col("b") == 1)).alias("n01"),
        one((F.col("a") == 0) & (F.col("b") == 0)).alias("n00"),
    )
    pe_num = (
        "(CAST(n11 + n10 AS DECIMAL(38,0)) * (n11 + n01)"
        " + CAST(n01 + n00 AS DECIMAL(38,0)) * (n10 + n00))"
    )
    return ct.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * (n11 + n00)) div n"
            " AS BIGINT)"
        ).alias("po_ppm"),
        F.expr(
            f"CAST((CAST(1000000 AS DECIMAL(38,0)) * {pe_num})"
            " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("pe_ppm"),
        F.expr(
            f"CASE WHEN CAST(n AS DECIMAL(38,0)) * n - {pe_num} = 0 THEN 0"
            " ELSE CAST((CAST(1000000 AS DECIMAL(38,0))"
            f" * (CAST(n AS DECIMAL(38,0)) * (n11 + n00) - {pe_num}))"
            f" div (CAST(n AS DECIMAL(38,0)) * n - {pe_num}) AS BIGINT)"
            " END"
        ).alias("kappa_ppm"),
    )


# ---------------------------------------------------------------------------
# Brown-Forsythe robust variance homogeneity (Brown & Forsythe 1974)
# ---------------------------------------------------------------------------


@register(
    "stats_levene_brown_forsythe",
    oracle="""
WITH x AS (
  SELECT o_orderpriority AS g,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
),
med AS (
  SELECT g, MIN(v) AS m
  FROM (SELECT g, v, CUME_DIST() OVER (PARTITION BY g ORDER BY v) AS cd
        FROM x)
  WHERE cd >= 0.5 GROUP BY g
),
z AS (SELECT x.g, ABS(x.v - med.m) AS z FROM x JOIN med ON x.g = med.g),
grp AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(z) AS BIGINT) AS s,
         SUM(z::HUGEINT * z) AS ss
  FROM z GROUP BY g
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s) AS BIGINT) AS st,
         CAST(SUM(ss) AS HUGEINT) AS sst, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM((s::HUGEINT * s) // n) AS HUGEINT) AS sq_over_n
  FROM grp
),
comp AS (
  SELECT k, nt,
         (nt::HUGEINT * sq_over_n - st::HUGEINT * st) AS ssb_num,
         (sst - sq_over_n) AS ssw_red
  FROM tot
)
SELECT g, n, s AS sum_absdev_cents,
       CAST((s::HUGEINT * 1000) // n AS BIGINT) AS mean_absdev_e1,
       CAST(c.k AS BIGINT) AS k_groups,
       CAST(( (1000000::HUGEINT * c.ssb_num // c.ssw_red) * (c.nt - c.k)
              + (1000000::HUGEINT * c.ssb_num % c.ssw_red) * (c.nt - c.k)
                // c.ssw_red )
            // (c.nt * (c.k - 1)) AS BIGINT) AS w_stat_e6
FROM grp CROSS JOIN comp c
""",
)
def stats_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe robust test of variance homogeneity across order
    priorities (Brown & Forsythe 1974 — Levene's test with the group
    MEDIAN as the center, the variant robust to skew): per-group exact
    cents medians via the PERCENTILE_DISC order statistic (cd ≥ ½ — a
    value from the data), absolute deviations z = |v − med_g| as exact
    integers, then the one-way-ANOVA F machinery over z — W =
    ((N−k)/(k−1)) · SSB(z)/SSW(z). Reuses stats_anova_returnflag_price's
    exactness strategy verbatim: ONE distributed group-moment aggregate
    (Σz² in DECIMAL(38,0)); the k-row moment relation collects and W
    assembles in unbounded Python ints; the DuckDB twin evaluates the
    same fraction in HUGEINT via the two-step quotient+remainder carry
    (a//d*m + (a%d)*m//d == a*m//d). Per-group Σs²/n floors (same
    documented <k-parts deviation).

    Scale: median is one per-group window (exact_quantiles class);
    moments are map-side-combined; driver state is k = |priorities| = 5
    rows."""
    x = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    med = (
        x.select(
            "g",
            "v",
            F.cume_dist().over(Window.partitionBy("g").orderBy("v")).alias("cd"),
        )
        .filter(F.col("cd") >= 0.5)
        .groupBy("g")
        .agg(F.min("v").alias("m"))
    )
    z = x.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("v") - F.col("m")).alias("z")
    )
    grp = z.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("z").cast("long").alias("s"),
        F.sum(F.expr("CAST(z AS DECIMAL(38,0)) * z")).alias("ss"),
    )
    rows = grp.collect()  # k = |priorities| rows of exact moments
    k = len(rows)
    nt = sum(int(r.n) for r in rows)
    st = sum(int(r.s) for r in rows)
    sst = sum(int(r.ss) for r in rows)
    sq_over_n = sum((int(r.s) ** 2) // int(r.n) for r in rows)
    ssb_num = nt * sq_over_n - st * st
    ssw_red = sst - sq_over_n
    a = 1000000 * ssb_num
    w_e6 = ((a // ssw_red) * (nt - k) + (a % ssw_red) * (nt - k) // ssw_red) // (
        nt * (k - 1)
    )
    out = [
        (r.g, int(r.n), int(r.s), (int(r.s) * 1000) // int(r.n), k, w_e6)
        for r in rows
    ]
    return spark.createDataFrame(
        out,
        schema="g string, n bigint, sum_absdev_cents bigint,"
        " mean_absdev_e1 bigint, k_groups bigint, w_stat_e6 bigint",
    )


# ---------------------------------------------------------------------------
# Holt linear-trend smoothing over daily order counts (Holt 1957)
# ---------------------------------------------------------------------------

_HOLT_OFF = 10**12
_HOLT_M = 10**13
_HOLT_E = 10**8  # element pack: idx * 1e8 + y


def _holt_oracle() -> str:
    return f"""
WITH daily AS (
  SELECT o_orderdate::DATE AS d, CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
idx AS (
  SELECT d, y, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS i FROM daily
),
packed AS (
  SELECT list(i::HUGEINT * {_HOLT_E} + y ORDER BY i) AS ls,
         MAX(CASE WHEN i = 1 THEN y END) AS y1,
         MAX(CASE WHEN i = 2 THEN y END) AS y2
  FROM idx
),
-- state pack: (l + OFF) * M + (t + OFF); seed from the classic init
-- l0 = 1000*y1, t0 = 1000*(y2 - y1), folded from day 3 on
folded AS (
  SELECT x.d, x.y, x.i,
         list_reduce(
           list_prepend(
             ((1000 * p.y1 + {_HOLT_OFF})::HUGEINT * {_HOLT_M}
              + (1000 * (p.y2 - p.y1) + {_HOLT_OFF})),
             list_filter(p.ls, e -> e // {_HOLT_E} >= 3
                                    AND e // {_HOLT_E} < x.i)),
           (acc, e) -> (
             (((e % {_HOLT_E}) * 1000 + (acc // {_HOLT_M} - {_HOLT_OFF})
               + (acc % {_HOLT_M} - {_HOLT_OFF})) // 2 + {_HOLT_OFF})
             * {_HOLT_M}
             + (((((e % {_HOLT_E}) * 1000 + (acc // {_HOLT_M} - {_HOLT_OFF})
                   + (acc % {_HOLT_M} - {_HOLT_OFF})) // 2
                  - (acc // {_HOLT_M} - {_HOLT_OFF}))
                 + (acc % {_HOLT_M} - {_HOLT_OFF})) // 2 + {_HOLT_OFF})
           )) AS st
  FROM idx x, packed p
  WHERE x.i >= 3
)
SELECT CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS day_idx, y,
       CAST((st // {_HOLT_M} - {_HOLT_OFF})
            + (st % {_HOLT_M} - {_HOLT_OFF}) AS BIGINT) AS forecast_e3,
       CAST(((y * 1000 + (st // {_HOLT_M} - {_HOLT_OFF})
              + (st % {_HOLT_M} - {_HOLT_OFF})) // 2) AS BIGINT)
         AS level_after_e3
FROM folded
"""


@register("forecast_holt_linear_daily", oracle=_holt_oracle())
def forecast_holt_linear_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoothing (Holt 1957;
    Winters 1960) over the daily order-count series with α = β = ½ so
    every update is integer halving that TRUNCATES toward zero (both
    engines' native integer division): l′ = (1000·y + l + t) div 2,
    t′ = ((l′ − l) + t) div 2 — a deterministic sequential fold both
    engines replay step-identically (the KM/Markov floor-fold
    discipline; list_reduce twin over offset-packed HUGEINT (l, t)
    state, one pack per output row over the day prefix). Seeded with the
    classic init l₀ = 1000·y₁, t₀ = 1000·(y₂ − y₁); one row per
    subsequent day carrying the one-step-ahead forecast BEFORE the
    update and the level after it. The smoothing complement of
    forecast_pinball_baselines' static quantile baselines and
    events_ewma_per_user's single-state decay.

    Scale: the daily rollup is a map-side aggregate bounded by the
    CALENDAR, not by orders; the fold state is that bounded relation
    collected once and replayed in exact Python ints
    (bounded-driver-state family)."""
    import datetime as _dt

    # day keys ship as epoch-day BIGINTs (graded-window envelope: no
    # temporal columns); the fold itself is key-agnostic
    epoch = _dt.date(1970, 1, 1)
    daily = sorted(
        ((r["d"] - epoch).days, int(r["y"]))
        for r in load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count("*").cast("long").alias("y"))
        .collect()
    )
    return spark.createDataFrame(
        _holt_fold(daily),
        "day_idx long, y long, forecast_e3 long, level_after_e3 long",
    )


def _holt_fold(daily: list) -> list:
    """The exact Holt α=β=½ replay over an ordered (key, y) series —
    factored out so the invariant pytest can drive it on synthetic
    series (constant → trend dies and forecast locks to 1000·c; linear
    → forecast tracks the ramp). Halving TRUNCATES toward zero — both
    engines' native integer division (DuckDB // and Spark div truncate;
    Python // floors, so the replay applies the sign trick on the one
    term that can go negative, the trend)."""
    tdiv2 = lambda a: a // 2 if a >= 0 else -((-a) // 2)  # noqa: E731
    out = []
    if len(daily) >= 3:
        lvl = 1000 * daily[0][1]
        trd = 1000 * (daily[1][1] - daily[0][1])
        for d, y in daily[2:]:
            fc = lvl + trd
            lvl2 = tdiv2(1000 * y + lvl + trd)
            trd = tdiv2((lvl2 - lvl) + trd)
            out.append((d, y, fc, lvl2))
            lvl = lvl2
    return out


# ---------------------------------------------------------------------------
# K-Minimum-Values distinct sketch (Bar-Yossef et al. 2002)
# ---------------------------------------------------------------------------

_KMV_K = 256
_KMV_P = (1 << 31) - 1


@register(
    "sketch_kmv_distinct_portable",
    oracle=f"""
WITH h AS (
  SELECT DISTINCT
    list_reduce(list_transform(string_split_regex(substr(md5(c_name), 1, 8), ''),
                               c -> CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1),
                (a, b) -> a * 16 + b) % {_KMV_P} AS hv
  FROM customer
),
kth AS (
  SELECT MAX(hv) AS hk, CAST(COUNT(*) AS BIGINT) AS k_used
  FROM (SELECT hv FROM h ORDER BY hv LIMIT {_KMV_K})
),
tru AS (SELECT CAST(COUNT(DISTINCT c_name) AS BIGINT) AS n_true FROM customer)
SELECT CAST({_KMV_K} AS BIGINT) AS k, k_used, hk AS kth_hash,
       CAST(((k_used - 1)::HUGEINT * {_KMV_P}) // hk AS BIGINT) AS est_distinct,
       n_true,
       CAST(CASE WHEN ((k_used - 1)::HUGEINT * {_KMV_P}) // hk >= n_true
                 THEN 1 ELSE -1 END
            * ((1000000::HUGEINT
                * ABS(((k_used - 1)::HUGEINT * {_KMV_P}) // hk - n_true))
               // n_true) AS BIGINT) AS err_ppm
FROM kth, tru
""",
)
def sketch_kmv_distinct_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-Minimum-Values (KMV / bottom-k) distinct-count sketch
    (Bar-Yossef et al. 2002; Beyer et al. 2007) over customer names with
    the engine-portable md5-derived 32-bit hash: keep the k = 256
    smallest distinct hash values; the estimator is (k−1)·p div h(k)
    where h(k) is the k-th minimum over the hash domain p. Every value —
    hashes, k-th order statistic, estimate, signed floor-ppm error
    (SIGN·(1e6·|Δ|) div truth, the negative-division house rule) — is
    exact integer arithmetic in both engines; the exact distinct count
    rides along, making this sketch self-auditing like
    sketch_hll_registers_portable (register-exact HLL) and
    sketch_bloom_fpp_audit.

    Scale: distinct-hash dedup is one shuffle; the bottom-k is a
    TakeOrdered (per-partition k then merge — never a global sort);
    driver state is k hashes. The exact-truth leg is the audit and
    drops at 100 TB (the sketch IS the product there)."""
    cust = load_table(spark, sf_dir, "customer")
    h = (
        cust.select(
            F.pmod(
                F.conv(F.substring(F.md5("c_name"), 1, 8), 16, 10).cast("bigint"),
                F.lit(_KMV_P),
            ).alias("hv")
        )
        .distinct()
    )
    bottom = h.orderBy("hv").limit(_KMV_K)
    kth = bottom.agg(
        F.max("hv").alias("hk"), F.count("*").cast("long").alias("k_used")
    )
    tru = cust.agg(F.count_distinct("c_name").cast("long").alias("n_true"))
    return kth.crossJoin(F.broadcast(tru)).select(
        F.lit(_KMV_K).cast("long").alias("k"),
        "k_used",
        F.col("hk").alias("kth_hash"),
        F.expr(
            f"CAST((CAST(k_used - 1 AS DECIMAL(38,0)) * {_KMV_P}) div hk"
            " AS BIGINT)"
        ).alias("est_distinct"),
        "n_true",
        F.expr(
            f"CAST(CASE WHEN (CAST(k_used - 1 AS DECIMAL(38,0)) * {_KMV_P})"
            " div hk >= n_true THEN 1 ELSE -1 END"
            " * ((CAST(1000000 AS DECIMAL(38,0))"
            f" * ABS((CAST(k_used - 1 AS DECIMAL(38,0)) * {_KMV_P}) div hk"
            " - n_true)) div n_true) AS BIGINT)"
        ).alias("err_ppm"),
    )


# ---------------------------------------------------------------------------
# Entropy l-diversity (Machanavajjhala et al. 2007)
# ---------------------------------------------------------------------------


@register(
    "privacy_entropy_l_diversity",
    oracle="""
WITH base AS (
  SELECT c_mktsegment AS seg, c_nationkey AS nat,
         CASE WHEN c_acctbal < 0 THEN 0
              WHEN c_acctbal < 2500 THEN 1
              WHEN c_acctbal < 5000 THEN 2
              WHEN c_acctbal < 7500 THEN 3
              ELSE 4 END AS sval
  FROM customer
),
cell AS (
  SELECT seg, nat, sval, CAST(COUNT(*) AS BIGINT) AS c
  FROM base GROUP BY 1, 2, 3
),
grp AS (
  SELECT seg, nat, CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_svals
  FROM cell GROUP BY 1, 2
)
SELECT cell.seg, cell.nat, cell.sval, cell.c, grp.n, grp.n_svals,
       CAST(ROUND(1000000000.0 * cell.c
                  * LN(CAST(grp.n AS DOUBLE) / cell.c) / grp.n)
            AS BIGINT) AS h_term_e9
FROM cell JOIN grp USING (seg, nat)
""",
)
def privacy_entropy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy ℓ-diversity audit (Machanavajjhala et al., TKDD 2007
    §3.2) of the (mktsegment, nation) quasi-identifier groups against a
    bucketed account-balance sensitive attribute: a group satisfies
    entropy ℓ-diversity iff −Σ p log p ≥ log ℓ. Ships the PER-CELL
    entropy contribution c/n · ln(n/c) as one rounded-e9 ln from exact
    integers (the PSI/KL per-row discipline — never a summed
    transcendental crosses the oracle boundary) alongside the exact
    cell/group counts and the distinct-sensitive-value count (the
    plain-ℓ lower bound), completing the k-anonymity →
    recursive-(c,ℓ) → t-closeness privacy ladder with its entropy rung.

    Scale: fixed threshold buckets are codegen CASE arithmetic; both
    aggregates are map-side-combinable and bounded by
    |segments|×|nations|×5 cells."""
    base = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        F.when(F.col("c_acctbal") < 0, 0)
        .when(F.col("c_acctbal") < 2500, 1)
        .when(F.col("c_acctbal") < 5000, 2)
        .when(F.col("c_acctbal") < 7500, 3)
        .otherwise(4)
        .alias("sval"),
    )
    cell = base.groupBy("seg", "nat", "sval").agg(
        F.count("*").cast("long").alias("c")
    )
    grp = cell.groupBy("seg", "nat").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_svals"),
    )
    return cell.join(grp, ["seg", "nat"]).select(
        "seg",
        "nat",
        "sval",
        "c",
        "n",
        "n_svals",
        F.round(
            F.lit(1000000000.0)
            * F.col("c")
            * F.log(F.col("n").cast("double") / F.col("c"))
            / F.col("n")
        )
        .cast("long")
        .alias("h_term_e9"),
    )


# ---------------------------------------------------------------------------
# Matryoshka prefix-energy audit (Kusupati et al. 2022)
# ---------------------------------------------------------------------------

_MRL_KS = (4, 8, 16, 32, 64)


def _mrl_oracle() -> str:
    ks = ", ".join(str(k) for k in _MRL_KS)
    return f"""
WITH q AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding,
                        x -> CAST(ROUND(x::DOUBLE * 1000000) AS BIGINT)) AS qe
  FROM embeddings
),
pre AS (
  SELECT label, k.k,
         SUM(list_reduce(list_transform(list_slice(qe, 1, k.k),
                                        v -> v::HUGEINT * v),
                         (a, b) -> a + b)) AS e_prefix,
         SUM(list_reduce(list_transform(qe, v -> v::HUGEINT * v),
                         (a, b) -> a + b)) AS e_total,
         CAST(COUNT(*) AS BIGINT) AS n_vecs
  FROM q, (SELECT UNNEST([{ks}]) AS k) k
  GROUP BY label, k.k
)
SELECT label, CAST(k AS BIGINT) AS k, n_vecs,
       CAST(e_prefix // 1000000 AS BIGINT) AS energy_prefix_e6,
       CAST(e_total // 1000000 AS BIGINT) AS energy_total_e6,
       CAST((1000000::HUGEINT * e_prefix) // e_total AS BIGINT)
         AS energy_frac_ppm
FROM pre
"""


@register("embedding_prefix_norm_curve", oracle=_mrl_oracle())
def embedding_prefix_norm_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style prefix-energy curve (Kusupati et al., NeurIPS
    2022 "Matryoshka Representation Learning"): per label, the fraction
    of total embedding energy captured by the first k ∈ {4, 8, 16, 32,
    64} dimensions — the audit that says how safely a store can truncate
    vectors for coarse-to-fine retrieval (the storage-side complement of
    the PQ quantization-error audit). Components e6-quantize through SQL
    ROUND (the similarity.py ROUND-parity discipline), squares
    accumulate in 128-bit, and the fraction ships as exact floor-ppm —
    no float ever crosses the oracle boundary.

    Scale: one scan; the k-sweep is a 5-row broadcast cross join
    (per-row arithmetic, no extra shuffle); the aggregate is map-side
    combinable to |labels|×5 rows."""
    ks_df = F.explode(
        F.array(*[F.lit(k) for k in _MRL_KS])
    ).alias("k")
    q = load_table(spark, sf_dir, "embeddings").select(
        F.col("label").cast("long").alias("label"),
        F.expr(
            "transform(embedding,"
            " x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
        ).alias("qe"),
    )
    sq = q.select(
        "label",
        F.expr(
            "aggregate(transform(qe, v -> CAST(v AS DECIMAL(38,0)) * v),"
            " CAST(0 AS DECIMAL(38,0)), (a, b) -> a + b)"
        ).alias("e_total"),
        "qe",
    ).select("label", "e_total", ks_df, "qe")
    pre = sq.select(
        "label",
        "k",
        "e_total",
        F.expr(
            "aggregate(transform(slice(qe, 1, k),"
            " v -> CAST(v AS DECIMAL(38,0)) * v),"
            " CAST(0 AS DECIMAL(38,0)), (a, b) -> a + b)"
        ).alias("e_prefix"),
    )
    agg = pre.groupBy("label", "k").agg(
        F.sum("e_prefix").alias("e_prefix"),
        F.sum("e_total").alias("e_total"),
        F.count("*").cast("long").alias("n_vecs"),
    )
    return agg.select(
        "label",
        F.col("k").cast("long").alias("k"),
        "n_vecs",
        F.expr("CAST(e_prefix div 1000000 AS BIGINT)").alias("energy_prefix_e6"),
        F.expr("CAST(e_total div 1000000 AS BIGINT)").alias("energy_total_e6"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * e_prefix) div e_total"
            " AS BIGINT)"
        ).alias("energy_frac_ppm"),
    )


# ---------------------------------------------------------------------------
# CART decision-stump split audit (Breiman et al. 1984)
# ---------------------------------------------------------------------------


@register(
    "stats_gini_impurity_split",
    oracle="""
WITH v AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderstatus AS cls
  FROM orders
),
thr AS (
  SELECT q, MIN(cents) AS t
  FROM (SELECT cents, CUME_DIST() OVER (ORDER BY cents) AS cd FROM v),
       (SELECT UNNEST([20, 40, 60, 80]) AS q)
  WHERE cd >= q / 100.0
  GROUP BY q
),
cells AS (
  SELECT thr.q, thr.t,
         CASE WHEN v.cents <= thr.t THEN 0 ELSE 1 END AS side,
         v.cls, CAST(COUNT(*) AS BIGINT) AS c
  FROM v, thr GROUP BY 1, 2, 3, 4
),
sides AS (
  SELECT q, t, side, CAST(SUM(c) AS BIGINT) AS ns,
         CAST(SUM(c * c) AS HUGEINT) AS ssq
  FROM cells GROUP BY 1, 2, 3
),
tot AS (SELECT q, CAST(SUM(ns) AS BIGINT) AS n FROM sides GROUP BY q)
SELECT s.q AS quantile_pct, s.t AS threshold_cents,
       MAX(CASE WHEN side = 0 THEN ns END) AS n_left,
       MAX(CASE WHEN side = 1 THEN ns END) AS n_right,
       CAST(SUM((1000000::HUGEINT * (ns::HUGEINT * ns - ssq))
                // (ns::HUGEINT * tot.n)) AS BIGINT) AS gini_weighted_e6
FROM sides s JOIN tot ON s.q = tot.q
GROUP BY s.q, s.t, tot.n
""",
)
def stats_gini_impurity_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CART decision-stump split audit (Breiman, Friedman, Olshen &
    Stone 1984): at each exact totalprice quintile boundary (the
    PERCENTILE_DISC cd ≥ q order statistic), the weighted Gini impurity
    of the o_orderstatus class mix that the split induces — the
    feature-quality curve a tree learner consults when choosing a
    threshold. Per side, n·Gini = (n_s² − Σ_c n_sc²)/n_s, so the
    weighted impurity is Σ_side 1e6·(n_s² − Σ n_sc²) div (n_s·N) — one
    floor per side (documented, mirrored term-for-term), every product
    in 128-bit before multiplying.

    Scale: thresholds are a 4-row broadcast; the (q, side, class) cell
    table is a map-side-combined aggregate bounded by 4×2×|statuses|;
    the threshold build is DUAL-PATH on corpus size (round 9): below the
    sort cutoff the global cume_dist window runs, above it all four
    quintile boundaries come from ONE shared kths_smallest_multi pass at
    the driver-replicated disc_ranks — scan-proportional, no global
    sort."""
    v = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderstatus").alias("cls"),
    )
    return _gini_split(v)


def _gini_split(v: DataFrame, force_quickselect: bool = False) -> DataFrame:
    from db_writer_redshift_spark.operators.selection import (
        disc_rank,
        kths_smallest_multi,
    )

    n_rows = v.count()
    if n_rows < _CUME_SORT_CUTOFF and not force_quickselect:
        cd = v.select(
            "cents", F.cume_dist().over(Window.orderBy("cents")).alias("cd")
        )
        qs = F.explode(F.array(*[F.lit(q) for q in (20, 40, 60, 80)])).alias("q")
        thr = (
            cd.select("cents", "cd", qs)
            .filter(F.col("cd") >= F.col("q") / 100.0)
            .groupBy("q")
            .agg(F.min("cents").alias("t"))
        )
    else:
        # min cents with cume_dist >= q/100 IS the disc_rank(n, q/100)-th
        # smallest (the _trimmed_winsorized argument); the window divides
        # the INT column q by the double literal 100.0, so the rank
        # replica uses the same IEEE quotient. All four boundaries
        # resolve in one shared set of quickselect rounds.
        targets = {q: disc_rank(n_rows, q / 100.0) for q in (20, 40, 60, 80)}
        ks = sorted(set(targets.values()))
        by_rank = dict(zip(ks, kths_smallest_multi(v, "cents", ks)))
        thr = v.sparkSession.createDataFrame(
            [(q, by_rank[k]) for q, k in targets.items()], "q int, t long"
        )
    cells = (
        v.crossJoin(F.broadcast(thr))
        .select(
            "q",
            "t",
            F.when(F.col("cents") <= F.col("t"), 0).otherwise(1).alias("side"),
            "cls",
        )
        .groupBy("q", "t", "side", "cls")
        .agg(F.count("*").cast("long").alias("c"))
    )
    sides = cells.groupBy("q", "t", "side").agg(
        F.sum("c").cast("long").alias("ns"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("ssq"),
    )
    tot = sides.groupBy("q").agg(F.sum("ns").cast("long").alias("n"))
    return (
        sides.join(F.broadcast(tot), "q")
        .groupBy("q", "t", "n")
        .agg(
            F.max(F.when(F.col("side") == 0, F.col("ns"))).alias("n_left"),
            F.max(F.when(F.col("side") == 1, F.col("ns"))).alias("n_right"),
            F.sum(
                F.expr(
                    "(CAST(1000000 AS DECIMAL(38,0))"
                    " * (CAST(ns AS DECIMAL(38,0)) * ns - ssq))"
                    " div (CAST(ns AS DECIMAL(38,0)) * n)"
                )
            )
            .cast("long")
            .alias("gini_weighted_e6"),
        )
        .select(
            F.col("q").cast("long").alias("quantile_pct"),
            F.col("t").alias("threshold_cents"),
            "n_left",
            "n_right",
            "gini_weighted_e6",
        )
    )


# ---------------------------------------------------------------------------
# Entity-resolution verify stage via native levenshtein
# ---------------------------------------------------------------------------


@register(
    "er_levenshtein_verify",
    oracle="""
WITH p AS (
  SELECT p_partkey, p_name, p_brand,
         string_split(p_name, ' ')[1] AS tok1,
         CAST(len(p_name) AS BIGINT) AS ln
  FROM part
),
cand AS (
  SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
         a.p_name AS name_a, b.p_name AS name_b,
         GREATEST(a.ln, b.ln) AS maxlen,
         CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
  FROM p a JOIN p b
    ON a.p_brand = b.p_brand AND a.tok1 = b.tok1
   AND a.p_partkey < b.p_partkey
)
SELECT key_a, key_b, dist, maxlen,
       CAST((1000000::HUGEINT * (maxlen - dist)) // maxlen AS BIGINT)
         AS sim_ppm
FROM cand
WHERE dist <= 3 AND dist > 0
""",
)
def er_levenshtein_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution VERIFY stage on part names: candidates blocked
    on (brand, first token) — the classic blocking-key discipline that
    keeps the pair space at Σ C(bucket, 2) instead of C(n, 2) — then
    scored with the engines' native ``levenshtein`` (the same
    unit-cost Wagner-Fischer DP definition in Spark and DuckDB), kept at
    edit distance 1–3 with similarity 1e6·(maxlen − d) div maxlen. The
    edit-distance member of the ER family beside er_trigram_cosine_pairs
    (set similarity) and er_part_name_matches (normalization equality).

    Scale: the block join shuffles on the (brand, tok1) key; bucket
    sizes are bounded by the brand×adjective vocabulary, so candidates
    grow linearly with parts per bucket — the stop-key cap the dedup
    family applies would drop any pathological hot block before the
    self-join."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_brand",
        F.split(F.col("p_name"), " ").getItem(0).alias("tok1"),
        F.length("p_name").cast("long").alias("ln"),
    )
    a, b = p.alias("a"), p.alias("b")
    cand = a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.tok1") == F.col("b.tok1"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    ).select(
        F.col("a.p_partkey").alias("key_a"),
        F.col("b.p_partkey").alias("key_b"),
        F.greatest(F.col("a.ln"), F.col("b.ln")).alias("maxlen"),
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
        .cast("long")
        .alias("dist"),
    )
    return cand.filter((F.col("dist") <= 3) & (F.col("dist") > 0)).select(
        "key_a",
        "key_b",
        "dist",
        "maxlen",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * (maxlen - dist))"
            " div maxlen AS BIGINT)"
        ).alias("sim_ppm"),
    )


# ---------------------------------------------------------------------------
# Exact OLS of quantity on discount
# ---------------------------------------------------------------------------


@register(
    "stats_ols_discount_quantity",
    oracle="""
WITH xy AS (
  SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem
),
mo AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM xy
),
d AS (
  SELECT n, sx, sy, sxx, sxy, syy,
         (n::HUGEINT * sxy - sx::HUGEINT * sy) AS cov_n,
         (n::HUGEINT * sxx - sx::HUGEINT * sx) AS varx_n,
         (n::HUGEINT * syy - sy::HUGEINT * sy) AS vary_n
  FROM mo
),
s AS (
  SELECT *,
         CASE WHEN cov_n >= 0 THEN 1 ELSE -1 END
           * ((1000000::HUGEINT * ABS(cov_n)) // varx_n) AS slope_ppm
  FROM d
)
SELECT n, sx, sy, sxx, sxy, syy,
       CAST(slope_ppm AS BIGINT) AS slope_ppm,
       CAST(CASE WHEN 1000000::HUGEINT * sy - slope_ppm * sx >= 0 THEN 1
                 ELSE -1 END
            * (ABS(1000000::HUGEINT * sy - slope_ppm * sx) // n)
            AS BIGINT) AS intercept_e6,
       CAST(CASE WHEN vary_n = 0 THEN 1000000
                 ELSE (1000000::HUGEINT * cov_n * cov_n)
                      // (varx_n * vary_n) END AS BIGINT) AS r2_ppm
FROM s
""",
)
def stats_ols_discount_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact simple-OLS fit of line-item quantity on discount (the
    classical least-squares complement of events_theil_sen_trend's
    median slope and stats_kendall_tau's rank association): slope =
    (n·Σxy − Σx·Σy)/(n·Σxx − (Σx)²) as a SIGN-corrected floor-ppm
    (truncation-safe under both engines' toward-zero division),
    intercept from the already-floored slope (the one documented
    composition floor), and R² = cov²/(varx·vary) in exact floor-ppm —
    every moment product promoted to 128-bit BEFORE multiplying (ADVICE
    r7 discipline). The five raw moments ride along so any consumer can
    re-derive at full precision; the e2 discount grid keeps every input
    integral. R²'s squared-covariance numerator stays inside 128 bits
    through ~100× sf0.1 (documented bound — beyond that the moments
    still ship exact and the quotient is the consumer's).

    Scale: ONE map-side-combined six-moment aggregate over the scan;
    everything after runs on a single row."""
    xy = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    mo = xy.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    d = mo.select(
        "*",
        F.expr(
            "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"
        ).alias("cov_n"),
        F.expr(
            "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"
        ).alias("varx_n"),
        F.expr(
            "CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"
        ).alias("vary_n"),
    )
    s = d.select(
        "*",
        F.expr(
            "CASE WHEN cov_n >= 0 THEN 1 ELSE -1 END"
            " * ((CAST(1000000 AS DECIMAL(38,0)) * ABS(cov_n)) div varx_n)"
        ).alias("slope_ppm"),
    )
    return s.select(
        "n",
        "sx",
        "sy",
        "sxx",
        "sxy",
        "syy",
        F.expr("CAST(slope_ppm AS BIGINT)").alias("slope_ppm"),
        F.expr(
            "CAST(CASE WHEN CAST(1000000 AS DECIMAL(38,0)) * sy"
            " - slope_ppm * sx >= 0 THEN 1 ELSE -1 END"
            " * (ABS(CAST(1000000 AS DECIMAL(38,0)) * sy - slope_ppm * sx)"
            " div n) AS BIGINT)"
        ).alias("intercept_e6"),
        F.expr(
            "CAST(CASE WHEN vary_n = 0 THEN 1000000"
            " ELSE (CAST(1000000 AS DECIMAL(38,0)) * cov_n * cov_n)"
            " div (varx_n * vary_n) END AS BIGINT)"
        ).alias("r2_ppm"),
    )


# ---------------------------------------------------------------------------
# Time-interval RANGE window frame (trailing 7 days)
# ---------------------------------------------------------------------------


@register(
    "window_range_interval_trailing7d",
    oracle="""
WITH daily AS (
  SELECT event_type, ts::DATE AS d,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS day_idx,
       cents AS daily_cents,
       CAST(SUM(cents) OVER w AS BIGINT) AS trail7_cents,
       CAST(COUNT(*) OVER w AS BIGINT) AS trail7_days,
       CAST(SUM(n) OVER w AS BIGINT) AS trail7_events
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY d
             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
""",
)
def window_range_interval_trailing7d(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TIME-interval RANGE window frame — ``RANGE BETWEEN INTERVAL 6
    DAYS PRECEDING`` over a date-ordered partition: the trailing-7-day
    revenue/volume per event type, the calendar-aware frame that a ROWS
    frame gets WRONG whenever days are missing (a ROWS 6 PRECEDING frame
    silently spans more than a week across gaps; the RANGE frame bounds
    by VALUE distance). Completes the window-frame surface beside
    window_range_frame_price (numeric RANGE) and
    window_rolling_median_orders (ROWS): both engines parse the
    identical ANSI frame. RANGE frames are tie-safe by construction, so
    the daily grain needs no tiebreak.

    Scale: the daily rollup combines map-side to |types|×calendar; the
    window sorts each type's bounded day spine — never raw events."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
            F.count("*").cast("long").alias("n"),
        )
    )
    daily.createOrReplaceTempView("range_interval_daily_v")
    return spark.sql(
        """
SELECT event_type,
       CAST(datediff(d, DATE '1970-01-01') AS BIGINT) AS day_idx,
       cents AS daily_cents,
       CAST(SUM(cents) OVER w AS BIGINT) AS trail7_cents,
       CAST(COUNT(*) OVER w AS BIGINT) AS trail7_days,
       CAST(SUM(n) OVER w AS BIGINT) AS trail7_events
FROM range_interval_daily_v
WINDOW w AS (PARTITION BY event_type ORDER BY d
             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
"""
    )


# ---------------------------------------------------------------------------
# ANSI FILTER-clause aggregates
# ---------------------------------------------------------------------------


@register(
    "agg_filter_clause_rollup",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_all,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
       CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
              FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT) AS cents_f,
       CAST(COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'O')
            AS BIGINT) AS custs_o
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_filter_clause_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI ``FILTER (WHERE …)`` aggregate modifier — one scan, many
    differently-filtered aggregates, including a FILTERED COUNT(DISTINCT)
    — stated as the IDENTICAL SQL text in both engines (the pipe-syntax
    discipline: proving the surface, with Catalyst rewriting each
    filtered aggregate to the same conditional-projection plan the
    CASE-WHEN house style produces by hand everywhere else in this
    registry). The NULL-on-empty SUM coalesces to 0 explicitly so the
    hash never depends on an engine's empty-group convention.

    Scale: one map-side-combined aggregate; the filtered distinct is the
    only expanding term (same two-stage distinct as any COUNT(DISTINCT
    ...) — Spark plans an Expand for the distinct/non-distinct mix,
    still shuffle-bounded by |groups|×|custkeys|)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "filter_clause_orders_v"
    )
    return spark.sql(
        """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_all,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
       CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
              FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT) AS cents_f,
       CAST(COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'O')
            AS BIGINT) AS custs_o
FROM filter_clause_orders_v
GROUP BY o_orderpriority
"""
    )


# ---------------------------------------------------------------------------
# Simpson diversity of word frequencies per language (Simpson 1949)
# ---------------------------------------------------------------------------


@register(
    "text_simpson_diversity",
    oracle="""
WITH tok AS (
  SELECT lang, UNNEST(string_split(lower(text), ' ')) AS w
  FROM documents
),
freq AS (
  SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok WHERE w <> '' GROUP BY 1, 2
),
agg AS (
  SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(c * (c - 1)) AS HUGEINT) AS coll
  FROM freq GROUP BY lang
)
SELECT lang, n_tokens, n_types,
       CAST((1000000000::HUGEINT * coll)
            // (n_tokens::HUGEINT * (n_tokens - 1)) AS BIGINT)
         AS simpson_e9,
       CAST(1000000000 - (1000000000::HUGEINT * coll)
            // (n_tokens::HUGEINT * (n_tokens - 1)) AS BIGINT)
         AS gini_simpson_e9
FROM agg WHERE n_tokens >= 2
""",
)
def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's diversity index (Simpson, Nature 1949) of the word
    frequency distribution per language — the probability two tokens
    drawn WITHOUT replacement are the same type, in the unbiased form
    D = Σc(c−1)/(N(N−1)), which is a PERFECT rational (no squared
    probabilities, no ln — the exact-integer counterpart of a Shannon
    entropy, and the pair-collision view of vocabulary concentration
    beside text_chargram_gini and text_token_diversity's type-token
    ratio). Gini-Simpson (1−D) rides along.

    Scale: token explode → map-side-combinable (lang, word) counts (the
    vocab_topk shuffle class, keyed on the word); the per-lang rollup is
    |langs| rows. Σc(c−1) accumulates in 128-bit."""
    tok = load_table(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    )
    freq = (
        tok.filter(F.col("w") != "")
        .groupBy("lang", "w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    agg = freq.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * (c - 1)")).alias("coll"),
    )
    return agg.filter(F.col("n_tokens") >= 2).select(
        "lang",
        "n_tokens",
        "n_types",
        F.expr(
            "CAST((CAST(1000000000 AS DECIMAL(38,0)) * coll)"
            " div (CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1))"
            " AS BIGINT)"
        ).alias("simpson_e9"),
        F.expr(
            "CAST(1000000000 - (CAST(1000000000 AS DECIMAL(38,0)) * coll)"
            " div (CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1))"
            " AS BIGINT)"
        ).alias("gini_simpson_e9"),
    )


# ---------------------------------------------------------------------------
# NTILE decile statistics (deterministic tiebreak)
# ---------------------------------------------------------------------------


@register(
    "window_ntile_decile_stats",
    oracle="""
WITH v AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         NTILE(10) OVER (ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT),
                         o_orderkey) AS dec
  FROM orders
)
SELECT CAST(dec AS BIGINT) AS decile, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(cents) AS BIGINT) AS min_cents,
       CAST(MAX(cents) AS BIGINT) AS max_cents,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM v GROUP BY dec
""",
)
def window_ntile_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(10) decile statistics of order value: both engines define
    NTILE identically (equal buckets, the first ``n mod 10`` buckets one
    larger), so with a TOTAL order — (cents, orderkey) tiebreak, the
    house ROWS-frame rule — the bucket assignment is deterministic and
    the per-decile (n, min, max, sum) hashes exactly. The
    bucket-assignment counterpart of inequality_lorenz_deciles (which
    derives decile SHARES from cumulative sums).

    Scale: this is the quickselect-boundary form, NOT a global sort —
    NTILE over Window.orderBy funnels every row through ONE partition
    (the ×10 probe read 4.5x before this rewrite). The total order is
    packed into one composite key (cents·2³¹ + orderkey — unique, so
    the order is strict), the 9 bucket-boundary ORDER STATISTICS come
    from selection.kths_smallest_multi's shared distributed rounds, and
    assignment is 9 broadcast comparisons per row — scan-proportional,
    no sort anywhere. Exactly NTILE's sizes because the boundary ranks
    ARE NTILE's cumulative bucket sizes. The orderkey must fit 31 bits
    (holds past sf1000; the pack widens to cents·2⁴⁰ before orderkeys
    reach 2³¹ at true warehouse scale).

    Crossover: the quickselect rounds are ~8 scan+agg jobs, so below
    ``_NTILE_SORT_CUTOFF`` rows the one-partition sort window is
    CHEAPER in wall-clock (0.45s vs 7.8s at sf0.1) and entirely safe —
    the cutoff keeps the sorted partition ≤ ~160 MB of (long, long)
    rows. Both paths are proven bit-equal in pytest (forced-path
    test)."""
    v = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return _ntile_decile_stats(v)


_NTILE_SORT_CUTOFF = 10_000_000


def _ntile_decile_stats(v: DataFrame, force_quickselect: bool = False) -> DataFrame:
    from db_writer_redshift_spark.operators.selection import (
        kths_smallest_multi,
    )

    n = v.count()
    if n < _NTILE_SORT_CUTOFF and not force_quickselect:
        w = Window.orderBy("cents", "o_orderkey")
        d = v.select("cents", F.ntile(10).over(w).alias("dec"))
    else:
        ckdf = v.select(
            "cents",
            (F.col("cents") * F.lit(1 << 31) + F.col("o_orderkey")).alias(
                "ck"
            ),
        )
        big, small = n - (n // 10) * 10, n // 10
        ranks, run = [], 0
        for d_i in range(1, 10):
            run += small + (1 if d_i <= big else 0)
            ranks.append(run)
        bounds = kths_smallest_multi(ckdf, "ck", ranks)
        dec = F.lit(1)
        for b in bounds:
            dec = dec + F.when(F.col("ck") > F.lit(b), 1).otherwise(0)
        d = ckdf.select("cents", dec.alias("dec"))
    return d.groupBy("dec").agg(
        F.count("*").cast("long").alias("n"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
        F.sum("cents").cast("long").alias("sum_cents"),
    ).select(
        F.col("dec").cast("long").alias("decile"),
        "n",
        "min_cents",
        "max_cents",
        "sum_cents",
    )


# ---------------------------------------------------------------------------
# Welch's t-squared on weekend vs weekday daily volume (Welch 1947)
# ---------------------------------------------------------------------------


@register(
    "stats_welch_t_weekend",
    oracle="""
WITH daily AS (
  SELECT ts::DATE AS d,
         CASE WHEN isodow(ts::DATE) >= 6 THEN 1 ELSE 0 END AS wk,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
grp AS (
  SELECT wk, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS ss
  FROM daily GROUP BY wk
),
m AS (
  SELECT MAX(CASE WHEN wk = 1 THEN n END) AS n1,
         MAX(CASE WHEN wk = 1 THEN s END) AS s1,
         MAX(CASE WHEN wk = 1 THEN ss END) AS ss1,
         MAX(CASE WHEN wk = 0 THEN n END) AS n2,
         MAX(CASE WHEN wk = 0 THEN s END) AS s2,
         MAX(CASE WHEN wk = 0 THEN ss END) AS ss2
  FROM grp
),
c AS (
  SELECT n1, s1, n2, s2,
         (n1::HUGEINT * ss1 - s1::HUGEINT * s1) AS a1,
         (n2::HUGEINT * ss2 - s2::HUGEINT * s2) AS a2,
         (s1::HUGEINT * n2 - s2::HUGEINT * n1) AS x
  FROM m
)
SELECT n1 AS n_weekend, s1 AS events_weekend, n2 AS n_weekday,
       s2 AS events_weekday,
       CAST(a1 AS BIGINT) AS a1, CAST(a2 AS BIGINT) AS a2,
       CAST(x AS BIGINT) AS mean_diff_num,
       CAST(((1000000::HUGEINT * x * x // (a1 * n2::HUGEINT * n2 * (n2 - 1)
                                           + a2 * n1::HUGEINT * n1 * (n1 - 1)))
              * ((n1 - 1)::HUGEINT * (n2 - 1))
             + (1000000::HUGEINT * x * x % (a1 * n2::HUGEINT * n2 * (n2 - 1)
                                            + a2 * n1::HUGEINT * n1 * (n1 - 1)))
               * ((n1 - 1)::HUGEINT * (n2 - 1))
               // (a1 * n2::HUGEINT * n2 * (n2 - 1)
                   + a2 * n1::HUGEINT * n1 * (n1 - 1)))
            AS BIGINT) AS t2_e6
FROM c
""",
)
def stats_welch_t_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic, squared (Welch, Biometrika
    1947), for weekend vs weekday daily event volume: t² =
    (m̄₁−m̄₂)² / (v₁/n₁ + v₂/n₂) cleared to one integer fraction —
    numerator (s₁n₂−s₂n₁)²·(n₁−1)(n₂−1), denominator
    A₁n₂²(n₂−1)+A₂n₁²(n₁−1) with Aᵢ = nᵢΣc²−sᵢ² — evaluated with the
    ANOVA two-step quotient+remainder carry so the 1e6-scaled product
    stays inside HUGEINT, and replayed driver-side in unbounded Python
    ints (identical value: a//d·m + (a%d)·m//d == a·m//d for the
    positive operands here). The location-difference member beside the
    family's variance gate (Brown-Forsythe) and distribution gates
    (KS/Mann-Whitney), on the CALENDAR-bounded daily relation where
    every moment is a small exact integer.

    Scale: the daily rollup combines map-side; everything after runs on
    a 2-row relation collected to the driver (markov discipline)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.to_date("ts").alias("d"),
            F.when(F.weekday(F.col("ts")) + 1 >= 6, 1).otherwise(0).alias("wk"),
        )
        .agg(F.count("*").cast("long").alias("c"))
    )
    grp = daily.groupBy("wk").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    rows = {int(r.wk): r for r in grp.collect()}  # 2-row driver state
    n1, s1, ss1 = (int(rows[1][k]) for k in ("n", "s", "ss"))
    n2, s2, ss2 = (int(rows[0][k]) for k in ("n", "s", "ss"))
    a1 = n1 * ss1 - s1 * s1
    a2 = n2 * ss2 - s2 * s2
    x = s1 * n2 - s2 * n1
    den = a1 * n2 * n2 * (n2 - 1) + a2 * n1 * n1 * (n1 - 1)
    m = (n1 - 1) * (n2 - 1)
    a = 1000000 * x * x
    t2_e6 = (a // den) * m + (a % den) * m // den
    return spark.createDataFrame(
        [(n1, s1, n2, s2, a1, a2, x, t2_e6)],
        "n_weekend long, events_weekend long, n_weekday long,"
        " events_weekday long, a1 long, a2 long, mean_diff_num long,"
        " t2_e6 long",
    )


# ---------------------------------------------------------------------------
# Per-state transition entropy of the user event chain
# ---------------------------------------------------------------------------


@register(
    "events_transition_entropy",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, event_id,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
tr AS (
  SELECT event_type AS from_type, nxt AS to_type,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
),
tot AS (
  SELECT from_type, CAST(SUM(c) AS BIGINT) AS n_from FROM tr GROUP BY 1
)
SELECT tr.from_type, tr.to_type, tr.c, tot.n_from,
       CAST(ROUND(1000000000.0 * tr.c
                  * LN(CAST(tot.n_from AS DOUBLE) / tr.c) / tot.n_from)
            AS BIGINT) AS h_term_e9
FROM tr JOIN tot USING (from_type)
""",
)
def events_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state transition entropy of the user event-type chain — for
    each from-state, the Shannon entropy of its next-event distribution,
    shipped as PER-CELL contributions c/n · ln(n/c) rounded e9 from
    exact integers (the PSI/entropy-ℓ-diversity discipline). Low entropy
    = deterministic flows (funnel-like), high = explorative; the
    uncertainty view over the same bounded transition relation that
    events_transition_matrix (counts) and events_markov_stationary
    (long-run mass) already share. Successor via LEAD over (ts,
    event_id) — the sessionization tiebreak rule.

    Scale: one user-keyed window pass (shared shuffle class with all
    sequence ops); the transition relation is bounded by |types|², and
    the ln runs on those few rows."""
    seq = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    )
    tr = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"), F.col("nxt").alias("to_type")
        )
        .agg(F.count("*").cast("long").alias("c"))
    )
    tot = tr.groupBy("from_type").agg(F.sum("c").cast("long").alias("n_from"))
    return tr.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "c",
        "n_from",
        F.round(
            F.lit(1000000000.0)
            * F.col("c")
            * F.log(F.col("n_from").cast("double") / F.col("c"))
            / F.col("n_from")
        )
        .cast("long")
        .alias("h_term_e9"),
    )


# ---------------------------------------------------------------------------
# Native session_window semantics certified against the LAG definition
# ---------------------------------------------------------------------------

_SW_GAP_US = 1_800_000_000  # 30 min — the registry-wide session gap


@register(
    "session_window_batch_native",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
b AS (
  SELECT user_id, t, event_id, cents,
         CASE WHEN LAG(t) OVER w IS NULL
              OR t - LAG(t) OVER w >= {_SW_GAP_US} THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
),
s AS (
  SELECT user_id, t, cents,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM b
)
SELECT user_id,
       CAST(MIN(t) AS BIGINT) AS session_start_us,
       CAST(MAX(t) + {_SW_GAP_US} AS BIGINT) AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM s GROUP BY user_id, sid
""",
)
def session_window_batch_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE ``session_window`` operator certified against the
    hand-rolled LAG/running-sum sessionization definition: Spark groups
    by ``session_window(ts, '30 minutes')`` — the same gap-merge
    Structured Streaming uses in streaming/jobs.stream_sessionize — and
    the oracle derives the identical sessions from first principles
    (break when the gap REACHES 30 min: Spark merges events strictly
    closer than the gap, so the LAG twin breaks on ``>=``; window end =
    last event + gap, Spark's convention). A hash match certifies the
    builtin's merge semantics end-to-end, giving the streaming
    sessionization lane the same driver-visible signal the
    near-dup/token-budget/PSI lanes get from their batch twins —
    the fourth streaming lane closed.

    Scale: session_window is one user-keyed aggregation (gap-merge runs
    inside the aggregation, no window sort at the event grain in the
    batch plan); outputs are bounded by sessions, not events."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp_ltz").alias("ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    g = e.groupBy(
        F.session_window("ts", "30 minutes").alias("s"), "user_id"
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("cents"),
    )
    return g.select(
        "user_id",
        F.unix_micros(F.col("s.start")).alias("session_start_us"),
        F.unix_micros(F.col("s.end")).alias("session_end_us"),
        "n_events",
        "cents",
    )
