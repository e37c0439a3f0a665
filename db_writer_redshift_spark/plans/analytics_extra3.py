"""Round-7 analytics batch: published-method corpus filtering, survival
analysis, graph mixing structure, distribution-free trend testing,
readability scoring, and robust outlier accounting.

* ``c4_rules_audit`` — the C4 cleaning heuristics (Raffel et al. 2020,
  "Exploring the Limits of Transfer Learning", §2.2) audited per source:
  sentence-count floor, terminal-punctuation rule, lorem-ipsum and
  curly-brace markers — the classic web-corpus page filters beside the
  registry's Gopher rules (Rae et al. 2021).
* ``survival_km_curve`` — the Kaplan-Meier product-limit estimator
  (Kaplan & Meier, JASA 1958) over session durations with the classic
  ongoing-at-observation-end censoring, made hash-exact by an integer
  floor-fold of the survival product — completing events_hazard_table,
  which deliberately stops at the hazard ingredients because a FLOAT
  product chain flaps cross-engine.
* ``graph_degree_assortativity`` — Newman 2002 degree-mixing
  coefficient of the co-purchase graph. Symmetrizing the edge list makes
  Pearson's denominator a PERFECT rational (sx == sy, sxx == syy), so
  the coefficient needs no sqrt at all — exact integer moments, exact
  ppm quotient.
* ``stats_mann_kendall_daily`` — the Mann-Kendall trend test statistic
  (Mann 1945; Kendall 1975) per event type over daily volume: S,
  concordant/discordant/tied pair counts, and the tie-corrected
  18·Var(S) — all exact integers, the distribution-free complement of
  events_theil_sen_trend's slope.
* ``text_readability_fkgl`` — Flesch-Kincaid grade level (Kincaid et
  al. 1975) per (lang, source) from exact integer word / sentence /
  vowel-group-syllable counts; the grade composes by floor arithmetic
  only, mirrored term-for-term in the oracle.
* ``dq_outlier_iqr_prices`` — Tukey fences (Tukey 1977 EDA) per order
  priority: exact order-statistic quartiles over integer cents, 1.5·IQR
  fences by integer halving, outlier counts per side.
* ``events_activity_islands`` — gaps-and-islands run-length histogram of
  consecutive active days per user (the engagement-streak feature).
* ``orders_new_vs_returning_monthly`` — monthly acquisition mix: orders
  and customers split by first-ever-order month.
* ``stats_cramers_v_type_dow`` — Cramér's V association between event
  type and ISO weekday via the all-integer (O·n − r·c)²/(r·c·n) chi²
  identity in 128-bit arithmetic.
* ``privacy_dp_clipping_audit`` — the DP contribution-bounding audit
  (Wilson et al., VLDB 2020): exact L∞ sensitivity, p95 clip bound, and
  the bias that clip costs, per event type.
* ``stats_runs_test_daily`` — Wald-Wolfowitz runs test of daily-volume
  direction randomness, null moments as exact floor-e6 rationals.
* ``graph_rich_club_coefficient`` — rich-club density sweep φ(k) of the
  co-purchase hubs (Zhou & Mondragón 2004), exact floor-ppm.
* ``streaming_psi_drift_batch_twin`` — the value-hash-oracled batch twin
  of streaming.stream_psi_drift (per-window PSI vs a baseline histogram).
* ``events_variant_extract`` — Spark 4 native VARIANT path probes
  (parse once, typed variant_get reads, NULL on absent paths).
* ``lateral_topk_per_segment`` — LATERAL correlated subquery top-k; the
  identical ANSI text runs on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from db_writer_redshift_spark.plans.registry import load_table, register

# ---------------------------------------------------------------------------
# C4 cleaning-rules audit (Raffel et al. 2020)
# ---------------------------------------------------------------------------


@register(
    "c4_rules_audit",
    oracle=r"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN s_cnt < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_lt3_sentences,
       CAST(SUM(CASE WHEN NOT ends_term THEN 1 ELSE 0 END) AS BIGINT) AS n_no_terminal_end,
       CAST(SUM(CASE WHEN has_lorem THEN 1 ELSE 0 END) AS BIGINT) AS n_lorem_ipsum,
       CAST(SUM(CASE WHEN has_curly THEN 1 ELSE 0 END) AS BIGINT) AS n_curly_brace,
       CAST(SUM(CASE WHEN s_cnt >= 3 AND ends_term
                      AND NOT has_lorem AND NOT has_curly
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM (
  SELECT source,
         LENGTH(regexp_replace(text, '[^.!?]', '', 'g')) AS s_cnt,
         regexp_matches(text, '[.!?]\s*$') AS ends_term,
         contains(LOWER(text), 'lorem ipsum') AS has_lorem,
         contains(text, '{') AS has_curly
  FROM documents
)
GROUP BY source
""",
)
def c4_rules_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 page-filter audit (Raffel et al. 2020 §2.2) per source: how many
    documents each cleaning heuristic would drop — fewer than 3 sentences
    (terminal-punctuation count), text not ending in terminal punctuation,
    the 'lorem ipsum' placeholder marker, and the curly-brace code marker
    — plus the count surviving all four. The registry's Gopher audit
    (gopher_rules_audit) covers the Rae et al. 2021 rule family; this is
    the Raffel et al. web-page family that preceded it, and together they
    bracket the published corpus-cleaning practice.

    Scale: pure codegen column expressions (regexp counts, contains)
    collapsing map-side to one row per source — no shuffle beyond the
    |sources|-row aggregate. All-integer output."""
    d = load_table(spark, sf_dir, "documents")
    s_cnt = F.length(F.regexp_replace(F.col("text"), r"[^.!?]", ""))
    ends_term = F.col("text").rlike(r"[.!?]\s*$")
    has_lorem = F.lower(F.col("text")).contains("lorem ipsum")
    has_curly = F.col("text").contains("{")
    flags = d.select(
        "source",
        s_cnt.alias("s_cnt"),
        ends_term.alias("ends_term"),
        has_lorem.alias("has_lorem"),
        has_curly.alias("has_curly"),
    )
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return flags.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        one(F.col("s_cnt") < 3).alias("n_lt3_sentences"),
        one(~F.col("ends_term")).alias("n_no_terminal_end"),
        one(F.col("has_lorem")).alias("n_lorem_ipsum"),
        one(F.col("has_curly")).alias("n_curly_brace"),
        one(
            (F.col("s_cnt") >= 3)
            & F.col("ends_term")
            & ~F.col("has_lorem")
            & ~F.col("has_curly")
        ).alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve over session durations
# ---------------------------------------------------------------------------

_KM_GAP_US = 1_800_000_000  # 30-min session gap — events_sessionization's rule
_KM_SCALE = 1_000_000


def _km_oracle() -> str:
    # The survival product is a SEQUENTIAL floor-fold, not a product of
    # independent terms (each step floors before the next multiply), so
    # the oracle folds a packed step list: HUGEINT pack
    # t*10^24 + n*10^12 + d, prefix-filtered per output row and seeded
    # with 10^6 via list_prepend (list_reduce seeds with the first
    # element, so the seed IS the initial survival).
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t FROM events
),
b AS (
  SELECT user_id, t, event_id,
         CASE WHEN LAG(t) OVER w IS NULL
              OR t - LAG(t) OVER w > {_KM_GAP_US} THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
),
s AS (
  -- (t, event_id) ordering on BOTH the lag and the running sum: with
  -- duplicate (user_id, t) rows at a session boundary a t-only ROWS
  -- frame is order-nondeterministic in both engines (ADVICE r7 #1) —
  -- the sessionization house rule (relational.py, temporal_queries.py).
  SELECT user_id, t,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM b
),
sess AS (
  SELECT user_id, sid, (MAX(t) - MIN(t)) // 60000000 AS dur_min,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY MAX(t) DESC) AS rk
  FROM s GROUP BY user_id, sid
),
durs AS (
  SELECT dur_min,
         CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM sess GROUP BY dur_min
),
risk AS (
  SELECT dur_min, d, c,
         CAST(SUM(d + c) OVER (ORDER BY dur_min DESC
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n
  FROM durs
),
steps AS (
  SELECT list(dur_min::HUGEINT * 1000000000000000000000000
              + n::HUGEINT * 1000000000000 + d ORDER BY dur_min) AS ls
  FROM risk WHERE d > 0
)
SELECT r.dur_min AS t_min, r.n AS n_risk, r.d AS n_deaths, r.c AS n_censored,
       CAST(list_reduce(
              list_prepend({_KM_SCALE}::HUGEINT,
                list_filter(st.ls,
                  x -> x // 1000000000000000000000000 <= r.dur_min)),
              (acc, x) -> (acc * ((x // 1000000000000 % 1000000000000)
                                  - (x % 1000000000000)))
                          // (x // 1000000000000 % 1000000000000))
            AS BIGINT) AS survival_ppm
FROM risk r, steps st
WHERE r.d > 0
"""


@register("survival_km_curve", oracle=_km_oracle())
def survival_km_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival curve (Kaplan & Meier 1958)
    over SESSION durations in whole minutes, with the classic censoring
    mechanism: each user's final session is ongoing at observation end
    (censored at its observed duration); every earlier session completed
    (death at its duration). events_hazard_table ships the per-time
    hazard ingredients and leaves the survival product to the consumer
    because a float product chain flaps cross-engine; this operator
    closes that gap with the EXACT integer formulation — survival starts
    at 1e6 ppm and at each death time floors to
    ``s*(n_t - d_t) div n_t``, a deterministic sequential fold both
    engines replay step-identically (the events_markov_stationary
    discipline). Censored sessions leave the risk set after deaths at
    the same time, the standard KM convention.

    One row per death time: (t_min, n_risk, n_deaths, n_censored,
    survival_ppm).

    Scale: sessionization is one user-keyed window pass (shared shuffle),
    the duration histogram is a map-side-combinable aggregate, and the
    fold state is the DISTINCT-duration relation — bounded by the
    observation window (≤ minutes in a session), NOT by users; the
    driver replay is exact Python ints over that bounded relation (the
    bounded-driver-state precedent: markov/anova/quickselect)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    b = e.select(
        "user_id",
        "t",
        "event_id",
        F.when(
            F.lag("t").over(w).isNull()
            | (F.col("t") - F.lag("t").over(w) > _KM_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    # event_id tiebreaker on the running sum too — a t-only ROWS frame is
    # order-nondeterministic under duplicate (user_id, t) at a session
    # boundary (ADVICE r7 #1; sessionization house rule).
    ws = Window.partitionBy("user_id").orderBy("t", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    s = b.select("user_id", "t", F.sum("brk").over(ws).alias("sid"))
    sess = s.groupBy("user_id", "sid").agg(
        ((F.max("t") - F.min("t")) / F.lit(60_000_000))
        .cast("long")
        .alias("dur_min"),
        F.max("t").alias("last_t"),
    )
    wl = Window.partitionBy("user_id").orderBy(F.col("last_t").desc())
    marked = sess.withColumn("rk", F.row_number().over(wl))
    durs = (
        marked.groupBy("dur_min")
        .agg(
            F.sum(F.when(F.col("rk") > 1, 1).otherwise(0))
            .cast("long")
            .alias("d"),
            F.sum(F.when(F.col("rk") == 1, 1).otherwise(0))
            .cast("long")
            .alias("c"),
        )
        .collect()
    )
    # exact driver replay over the bounded distinct-duration relation
    rows = sorted((int(r["dur_min"]), int(r["d"]), int(r["c"])) for r in durs)
    total = sum(d + c for _, d, c in rows)
    out = []
    n_risk = total
    surv = _KM_SCALE
    for t, d, c in rows:
        if d > 0:
            surv = (surv * (n_risk - d)) // n_risk
            out.append((t, n_risk, d, c, surv))
        n_risk -= d + c
    return spark.createDataFrame(
        out,
        "t_min long, n_risk long, n_deaths long, n_censored long,"
        " survival_ppm long",
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the co-purchase graph (Newman 2002)
# ---------------------------------------------------------------------------


@register(
    "graph_degree_assortativity",
    oracle="""
WITH eraw AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (SELECT u, v FROM eraw GROUP BY u, v HAVING COUNT(*) >= 2),
sym AS (
  SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
),
deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS k FROM sym GROUP BY u),
pts AS (
  SELECT du.k AS x, dv.k AS y
  FROM sym s JOIN deg du ON s.u = du.node JOIN deg dv ON s.v = dv.node
),
mo AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m2,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM pts
)
SELECT CAST(m2 // 2 AS BIGINT) AS n_edges, m2 AS n_points, sx, sxx, sxy,
       CAST(m2::HUGEINT * sxy - sx::HUGEINT * sx AS BIGINT) AS num,
       CAST(m2::HUGEINT * sxx - sx::HUGEINT * sx AS BIGINT) AS den,
       CASE WHEN m2::HUGEINT * sxx - sx::HUGEINT * sx = 0 THEN 0
            ELSE CAST(CASE WHEN m2::HUGEINT * sxy - sx::HUGEINT * sx >= 0
                           THEN 1 ELSE -1 END
                      * ((1000000::HUGEINT
                          * ABS(m2::HUGEINT * sxy - sx::HUGEINT * sx))
                         // (m2::HUGEINT * sxx - sx::HUGEINT * sx)) AS BIGINT)
       END AS r_ppm
FROM mo
""",
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity coefficient (Newman, PRL 2002) of the
    weight>=2 part co-purchase graph — do high-degree parts co-purchase
    with high-degree parts (assortative, r>0) or with accessories
    (disassortative, r<0)? The structural-mixing scalar beside the
    registry's clustering-coefficient, k-core, and k-truss views of the
    same graph.

    Exactness trick: over the SYMMETRIZED edge list the x- and y-moment
    sums coincide (sx=sy, sxx=syy), so Pearson's denominator
    sqrt((M·sxx−sx²)(M·syy−sy²)) collapses to the integer M·sxx−sx² and
    r = (M·sxy−sx²)/(M·sxx−sx²) is a PERFECT rational — no sqrt, no
    float anywhere; r ships as a sign-corrected floor-ppm plus the exact
    integer moments. (Floor-div of the ABS value with the sign reapplied
    keeps Spark's truncating `div` and DuckDB's flooring `//` identical
    on negative numerators.)

    Scale: the co-purchase edge build is the kcore/ktruss equi-join (one
    shuffle on orderkey, weight-2 floor applied before anything else);
    degrees are a map-side aggregate; the moment rollup is one row. Every
    moment product (m2·sxy, sx·sx, the 1e6 scaling) promotes to 128-bit
    DECIMAL(38)/HUGEINT BEFORE multiplying, so no intermediate can
    overflow int64 at any sf; the num/den output columns are BIGINT and
    exact wherever the final value itself fits int64."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
    )
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count("*").cast("long").alias("k")).select(
        F.col("u").alias("node"), "k"
    )
    pts = (
        sym.join(deg.withColumnRenamed("node", "u").withColumnRenamed("k", "x"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("k", "y"), "v")
        .select("x", "y")
    )
    mo = pts.agg(
        F.count("*").cast("long").alias("m2"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    # All m2·sxy / sx·sx products promote to 128-bit (DECIMAL(38) /
    # HUGEINT) BEFORE the multiply (ADVICE r7 #3): raw BIGINT products
    # overflow int64 at large sf — DuckDB errors, non-ANSI Spark wraps.
    # The num/den OUTPUT columns stay BIGINT-cast, exact wherever the
    # result itself fits int64.
    prom = mo.select(
        "m2",
        "sx",
        "sxx",
        "sxy",
        F.expr(
            "CAST(m2 AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sx"
        ).alias("numd"),
        F.expr(
            "CAST(m2 AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"
        ).alias("dend"),
    )
    return prom.select(
        F.expr("m2 div 2").alias("n_edges"),
        F.col("m2").alias("n_points"),
        "sx",
        "sxx",
        "sxy",
        F.expr("CAST(numd AS BIGINT)").alias("num"),
        F.expr("CAST(dend AS BIGINT)").alias("den"),
        F.expr(
            "CASE WHEN dend = 0 THEN 0"
            " ELSE CAST(CASE WHEN numd >= 0 THEN 1 ELSE -1 END"
            " * ((CAST(1000000 AS DECIMAL(38,0)) * ABS(numd))"
            "    div dend) AS BIGINT) END"
        ).alias("r_ppm"),
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test over daily volume (Mann 1945; Kendall 1975)
# ---------------------------------------------------------------------------


@register(
    "stats_mann_kendall_daily",
    oracle="""
WITH daily AS (
  SELECT event_type, ts::DATE AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END AS sgn
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_concordant,
         CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_discordant,
         CAST(SUM(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tied,
         CAST(SUM(sgn) AS BIGINT) AS s_stat
  FROM pairs GROUP BY event_type
),
nn AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM daily GROUP BY 1),
ties AS (
  SELECT event_type,
         CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
  FROM (SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS t
        FROM daily GROUP BY event_type, c)
  WHERE t > 1 GROUP BY event_type
)
SELECT s.event_type, nn.n AS n_days, s.n_pairs, s.n_concordant,
       s.n_discordant, s.n_tied, s.s_stat,
       nn.n * (nn.n - 1) * (2 * nn.n + 5)
         - COALESCE(t.tie_term, 0) AS var_s_x18
FROM s JOIN nn USING (event_type) LEFT JOIN ties t USING (event_type)
""",
)
def stats_mann_kendall_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per event type over daily volume: the
    pairwise sign statistic S = Σ_{i<j} sign(c_j − c_i), its
    concordant/discordant/tied decomposition, and the tie-corrected
    variance as the exact integer 18·Var(S) = n(n−1)(2n+5) −
    Σ_k t_k(t_k−1)(2t_k+5) — everything a consumer needs to finish the
    normal approximation, with zero floats shipped. The distribution-free
    TEST beside events_theil_sen_trend's distribution-free SLOPE (the two
    are the classic pairing in trend literature).

    Scale: the daily roll-up collapses events map-side; the O(d²)
    pairwise join runs on the bounded CALENDAR relation (days × types,
    never event rows) — the stats_kendall_tau_daily precedent; tie
    groups are a second tiny aggregate on the same relation."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("long").alias("c"))
    a, b = daily.alias("a"), daily.alias("b")
    sgn = (
        F.when(F.col("b.c") > F.col("a.c"), 1)
        .when(F.col("b.c") < F.col("a.c"), -1)
        .otherwise(0)
    )
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(F.col("a.event_type").alias("event_type"), sgn.alias("sgn"))
    s = pairs.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_concordant"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_discordant"),
        F.sum(F.when(F.col("sgn") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_tied"),
        F.sum("sgn").cast("long").alias("s_stat"),
    )
    nn = daily.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count("*").cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    return (
        s.join(nn, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            "n_pairs",
            "n_concordant",
            "n_discordant",
            "n_tied",
            "s_stat",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.coalesce(F.col("tie_term"), F.lit(0))
            )
            .cast("long")
            .alias("var_s_x18"),
        )
    )


# ---------------------------------------------------------------------------
# Flesch-Kincaid grade level per (lang, source) — Kincaid et al. 1975
# ---------------------------------------------------------------------------


@register(
    "text_readability_fkgl",
    oracle=r"""
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(w) AS BIGINT) AS sum_words,
       CAST(SUM(s) AS BIGINT) AS sum_sentences,
       CAST(SUM(syl) AS BIGINT) AS sum_syllables,
       CAST((390 * CAST(SUM(w) AS BIGINT)) // CAST(SUM(s) AS BIGINT)
            + (11800 * CAST(SUM(syl) AS BIGINT)) // CAST(SUM(w) AS BIGINT)
            - 15590 AS BIGINT) AS fkgl_e3
FROM (
  SELECT lang, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
         CAST(GREATEST(LENGTH(regexp_replace(text, '[^.!?]', '', 'g')), 1)
              AS BIGINT) AS s,
         CAST(len(regexp_extract_all(LOWER(text), '[aeiouy]+'))
              AS BIGINT) AS syl
  FROM documents
)
GROUP BY lang, source
""",
)
def text_readability_fkgl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade level (Kincaid et al. 1975) per (lang,
    source): FKGL = 0.39·(words/sentences) + 11.8·(syllables/words)
    − 15.59, computed at e3 scale by floor arithmetic over exact integer
    corpus totals — (390·W) div S + (11800·Syl) div W − 15590 — with the
    identical floor order in the oracle, so the composite hashes exactly
    (the repo rule: never ship a float ratio when an integer scaling of
    the same decision value exists). Syllables use the standard
    dependency-free proxy: maximal vowel-group ([aeiouy]+) runs;
    sentences floor at 1 per document so punctuation-free synthetic text
    stays well-defined. The readability lane beside quality_score
    (heuristic filter) and Gopher/C4 (rule audits) — FKGL is the
    curriculum-ordering key used by difficulty-staged training mixes.

    Scale: three regexp/split column expressions collapsing map-side to
    a |lang × source|-row aggregate; one shuffle of partial sums."""
    d = load_table(spark, sf_dir, "documents")
    w = F.size(F.split(F.col("text"), " ")).cast("long")
    s = F.greatest(
        F.length(F.regexp_replace(F.col("text"), r"[^.!?]", "")), F.lit(1)
    ).cast("long")
    syl = F.size(
        F.expr(r"regexp_extract_all(lower(text), '[aeiouy]+', 0)")
    ).cast("long")
    base = d.select("lang", "source", w.alias("w"), s.alias("s"), syl.alias("syl"))
    return base.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("sum_words"),
        F.sum("s").cast("long").alias("sum_sentences"),
        F.sum("syl").cast("long").alias("sum_syllables"),
        (
            F.expr("(390 * SUM(w)) div SUM(s)")
            + F.expr("(11800 * SUM(syl)) div SUM(w)")
            - F.lit(15590)
        )
        .cast("long")
        .alias("fkgl_e3"),
    )


# ---------------------------------------------------------------------------
# Tukey-fence outlier accounting per order priority (Tukey 1977)
# ---------------------------------------------------------------------------


@register(
    "dq_outlier_iqr_prices",
    oracle="""
WITH cents AS (
  SELECT o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey
  FROM orders
),
r AS (
  SELECT o_orderpriority, cents,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY cents, o_orderkey) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
  FROM cents
),
q AS (
  SELECT o_orderpriority, MIN(n) AS n,
         CAST(MAX(CASE WHEN rk = (n + 3) // 4 THEN cents END) AS BIGINT) AS q1,
         CAST(MAX(CASE WHEN rk = (3 * n + 3) // 4 THEN cents END)
              AS BIGINT) AS q3
  FROM r GROUP BY o_orderpriority
)
SELECT q.o_orderpriority, q.n AS n_orders, q.q1 AS q1_cents, q.q3 AS q3_cents,
       q.q3 - q.q1 AS iqr_cents,
       q.q1 - (3 * (q.q3 - q.q1)) // 2 AS lo_fence_cents,
       q.q3 + (3 * (q.q3 - q.q1)) // 2 AS hi_fence_cents,
       CAST(SUM(CASE WHEN c.cents < q.q1 - (3 * (q.q3 - q.q1)) // 2
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
       CAST(SUM(CASE WHEN c.cents > q.q3 + (3 * (q.q3 - q.q1)) // 2
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
FROM q JOIN cents c USING (o_orderpriority)
GROUP BY 1, 2, 3, 4, 5, 6, 7
""",
)
def dq_outlier_iqr_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier accounting (Tukey 1977 EDA) of order totals
    per priority class: exact order-statistic quartiles over integer
    cents (rank (n+3)//4 and (3n+3)//4 under the (cents, orderkey) total
    order — the ceiling-rank convention of stats_median_ci_orderstat),
    1.5·IQR fences by the integer (3·IQR) div 2, and per-side outlier
    counts. The data-quality screen every ingestion monitor runs before
    alerting on robust anomalies (events_robust_anomaly_mad is the
    time-series member; this is the cross-sectional one).

    Scale: the rank window partitions by priority (parallel across the 5
    groups); the fence recount is one broadcast join of the 5-row
    quartile relation back onto the cents projection — the documented
    quickselect swap applies when a single group outgrows a partition
    (hist_equidepth machinery)."""
    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        "o_orderpriority",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        "o_orderkey",
    )
    wp = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    r = cents.select(
        "o_orderpriority",
        "cents",
        F.row_number().over(wp).alias("rk"),
        F.count("*")
        .over(Window.partitionBy("o_orderpriority"))
        .cast("long")
        .alias("n"),
    )
    q = r.groupBy("o_orderpriority").agg(
        F.min("n").alias("n"),
        F.max(
            F.when(F.col("rk") == F.expr("(n + 3) div 4"), F.col("cents"))
        )
        .cast("long")
        .alias("q1"),
        F.max(
            F.when(F.col("rk") == F.expr("(3 * n + 3) div 4"), F.col("cents"))
        )
        .cast("long")
        .alias("q3"),
    )
    fenced = q.select(
        "o_orderpriority",
        F.col("n").alias("n_orders"),
        F.col("q1").alias("q1_cents"),
        F.col("q3").alias("q3_cents"),
        (F.col("q3") - F.col("q1")).alias("iqr_cents"),
        (F.col("q1") - F.expr("(3 * (q3 - q1)) div 2")).alias("lo_fence_cents"),
        (F.col("q3") + F.expr("(3 * (q3 - q1)) div 2")).alias("hi_fence_cents"),
    )
    return (
        cents.join(F.broadcast(fenced), "o_orderpriority")
        .groupBy(
            "o_orderpriority",
            "n_orders",
            "q1_cents",
            "q3_cents",
            "iqr_cents",
            "lo_fence_cents",
            "hi_fence_cents",
        )
        .agg(
            F.sum(
                F.when(F.col("cents") < F.col("lo_fence_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_low_outliers"),
            F.sum(
                F.when(F.col("cents") > F.col("hi_fence_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_high_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands over daily user activity
# ---------------------------------------------------------------------------


@register(
    "events_activity_islands",
    oracle="""
WITH e AS (
  SELECT DISTINCT user_id, ts::DATE AS d FROM events
),
r AS (
  SELECT user_id,
         CAST(d - DATE '1970-01-01' AS BIGINT)
           - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
  FROM e
),
i AS (
  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS island_len
  FROM r GROUP BY user_id, grp
)
SELECT island_len,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(island_len) AS BIGINT) AS total_active_days
FROM i GROUP BY island_len
""",
)
def events_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over DAILY user activity: maximal runs of
    consecutive active days per user via the classic day_number −
    row_number grouping key, rolled into a run-length histogram
    (island_len → islands, users, active days). The calendar-grained
    engagement-streak view beside 30-min sessionization
    (events_sessionization) and weekly cohort retention — streak length
    is the "habit" feature churn models consume.

    Scale: one distinct (user, day) projection (map-side), one user-keyed
    window (single shuffle shared with the island aggregate — same
    partitioning), and a histogram over the bounded island-length domain
    (≤ observation days). All integers; DATE arithmetic runs as
    epoch-day BIGINTs so no temporal column reaches the output."""
    e = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    r = e.select(
        "user_id",
        (
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).cast("long")
            - F.row_number().over(w)
        ).alias("grp"),
    )
    i = r.groupBy("user_id", "grp").agg(
        F.count("*").cast("long").alias("island_len")
    )
    return i.groupBy("island_len").agg(
        F.count("*").cast("long").alias("n_islands"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.sum("island_len").cast("long").alias("total_active_days"),
    )


# ---------------------------------------------------------------------------
# New-vs-returning customer mix per month
# ---------------------------------------------------------------------------


@register(
    "orders_new_vs_returning_monthly",
    oracle="""
WITH o AS (
  SELECT o_custkey,
         CAST(EXTRACT(year FROM o_orderdate) * 100
              + EXTRACT(month FROM o_orderdate) AS BIGINT) AS ym
  FROM orders
),
f AS (SELECT o_custkey, MIN(ym) AS first_ym FROM o GROUP BY o_custkey)
SELECT o.ym,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN o.ym = f.first_ym THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new_orders,
       CAST(SUM(CASE WHEN o.ym > f.first_ym THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returning_orders,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active_customers,
       CAST(COUNT(DISTINCT CASE WHEN o.ym = f.first_ym
                                THEN o.o_custkey END) AS BIGINT)
         AS n_new_customers
FROM o JOIN f USING (o_custkey)
GROUP BY o.ym
""",
)
def orders_new_vs_returning_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly acquisition mix: per calendar month, how many orders come
    from customers whose FIRST-ever order falls in that month (new) vs
    earlier (returning), plus distinct active/new customer counts — the
    growth-accounting decomposition every revenue dashboard leads with,
    and the orders-side complement of events_weekly_cohort_retention.

    Scale: first-order month is one customer-keyed MIN aggregate
    (map-side combined); the classifier join is keyed on custkey (the
    same hash partitioning both sides already carry), and the monthly
    rollup is a bounded |months| relation. Months ship as yyyymm BIGINTs
    — no temporal column in the output envelope."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym"),
    )
    f = o.groupBy("o_custkey").agg(F.min("ym").alias("first_ym"))
    j = o.join(f, "o_custkey")
    return j.groupBy("ym").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.when(F.col("ym") == F.col("first_ym"), 1).otherwise(0))
        .cast("long")
        .alias("n_new_orders"),
        F.sum(F.when(F.col("ym") > F.col("first_ym"), 1).otherwise(0))
        .cast("long")
        .alias("n_returning_orders"),
        F.count_distinct("o_custkey").cast("long").alias("n_active_customers"),
        F.count_distinct(
            F.when(F.col("ym") == F.col("first_ym"), F.col("o_custkey"))
        )
        .cast("long")
        .alias("n_new_customers"),
    )


# ---------------------------------------------------------------------------
# Cramér's V association between event type and ISO day-of-week
# ---------------------------------------------------------------------------


@register(
    "stats_cramers_v_type_dow",
    oracle="""
WITH cells AS (
  SELECT event_type, CAST(isodow(ts::DATE) AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
),
rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
ct AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nr,
               CAST(COUNT(DISTINCT dow) AS BIGINT) AS nc
        FROM cells),
chi AS (
  SELECT CAST(SUM(
           (1000000::HUGEINT
            * (cells.o::HUGEINT * tot.n - rt.r::HUGEINT * ct.c)
            * (cells.o::HUGEINT * tot.n - rt.r::HUGEINT * ct.c))
           // (rt.r::HUGEINT * ct.c * tot.n)
         ) AS HUGEINT) AS chi2n_e6
  FROM cells JOIN rt USING (event_type) JOIN ct USING (dow), tot
)
SELECT tot.n, tot.nr AS n_types, tot.nc AS n_dows,
       CAST(chi.chi2n_e6 // tot.n AS BIGINT) AS chi2_e6,
       CAST(chi.chi2n_e6 // (tot.n * tot.n
                             * (LEAST(tot.nr, tot.nc) - 1)) AS BIGINT)
         AS v2_ppm
FROM tot, chi
""",
)
def stats_cramers_v_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association strength (Cramér 1946) between event type
    and ISO day-of-week: chi-squared over the |types|×7 contingency table
    and V² = chi²/(n·(min(r,c)−1)), both as exact scaled integers. The
    per-cell term uses the all-integer identity (O·n − r·c)²/(r·c·n)
    = n·(O−E)²/E with E = r·c/n, accumulated at e6 scale in 128-bit
    integer arithmetic (DECIMAL(38) / HUGEINT) with ONE floor per cell —
    the floor order is part of the contract, mirrored term-for-term in
    the oracle (the registry's per-cell-floor discipline from
    drift_psi_doclen). The general-association member beside the
    two-sample drift tests (chisq vs a fixed split, PSI, KS, TV).

    Scale: the contingency table is a map-side-combinable aggregate
    bounded by |types|×7; everything after runs on that tiny relation.
    dow uses isodow ↔ Spark weekday+1 (the events_seasonal_dow_anomaly
    convention)."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.weekday(F.col("ts")) + 1).cast("long").alias("dow")
    ).agg(F.count("*").cast("long").alias("o"))
    rt = cells.groupBy("event_type").agg(F.sum("o").cast("long").alias("r"))
    ct = cells.groupBy("dow").agg(F.sum("o").cast("long").alias("c"))
    tot = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.count_distinct("event_type").cast("long").alias("nr"),
        F.count_distinct("dow").cast("long").alias("nc"),
    )
    chi = (
        cells.join(rt, "event_type")
        .join(ct, "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            # o·n and r·c promote to 128-bit BEFORE the multiply (ADVICE
            # r7 #3): raw BIGINT products overflow int64 at large sf —
            # DuckDB would error, non-ANSI Spark would wrap silently.
            F.expr(
                "(CAST(1000000 AS DECIMAL(38,0))"
                " * (CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)"
                " * (CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c))"
                " div (CAST(r AS DECIMAL(38,0)) * c * n)"
            ).alias("term")
        )
        .agg(F.sum("term").alias("chi2n_e6"))
    )
    return tot.crossJoin(F.broadcast(chi)).select(
        "n",
        F.col("nr").alias("n_types"),
        F.col("nc").alias("n_dows"),
        F.expr("CAST(chi2n_e6 div n AS BIGINT)").alias("chi2_e6"),
        F.expr(
            "CAST(chi2n_e6 div (CAST(n AS DECIMAL(38,0)) * n"
            " * (LEAST(nr, nc) - 1)) AS BIGINT)"
        ).alias("v2_ppm"),
    )


# ---------------------------------------------------------------------------
# Differential-privacy clipping/sensitivity audit
# ---------------------------------------------------------------------------


@register(
    "privacy_dp_clipping_audit",
    oracle="""
WITH u AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS k
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, user_id, k,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY k, user_id) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nu
  FROM u
),
q AS (
  SELECT event_type, MIN(nu) AS n_users,
         CAST(MAX(k) AS BIGINT) AS max_contrib,
         CAST(MAX(CASE WHEN rk = (95 * nu + 99) // 100 THEN k END)
              AS BIGINT) AS clip_at
  FROM r GROUP BY event_type
)
SELECT q.event_type, q.n_users, q.max_contrib, q.clip_at,
       CAST(SUM(CASE WHEN u.k > q.clip_at THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped_users,
       CAST(SUM(u.k) AS BIGINT) AS raw_total,
       CAST(SUM(LEAST(u.k, q.clip_at)) AS BIGINT) AS clipped_total,
       CAST(SUM(u.k) - SUM(LEAST(u.k, q.clip_at)) AS BIGINT) AS clipped_mass
FROM q JOIN u USING (event_type)
GROUP BY 1, 2, 3, 4
""",
)
def privacy_dp_clipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy contribution-bounding audit (the clipping
    step of DP-SQL / Wilson et al., VLDB 2020): per event type, the
    per-user contribution to the count query, its true L∞ sensitivity
    (max contribution), the p95 order-statistic clipping bound
    (ceiling-rank (95n+99)//100 under the (k, user_id) total order), and
    exactly what that clip costs — users clipped, raw vs clipped totals,
    clipped-away mass. A DP release calibrates noise to clip_at, so this
    relation is the sensitivity/bias trade a privacy engineer reads
    BEFORE noising; it completes the structural-privacy lane
    (k-anonymity / t-closeness / (c,l)-diversity) with the
    noise-calibration member — and stays deterministic because the noise
    itself is the one thing deliberately NOT computed.

    Scale: per-user contributions are a map-side-combinable aggregate;
    the rank window partitions by type over the per-user relation; the
    recount joins the |types|-row bound relation back broadcast-style.
    All integers."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("event_type", "user_id").agg(
        F.count("*").cast("long").alias("k")
    )
    wp = Window.partitionBy("event_type").orderBy("k", "user_id")
    r = u.select(
        "event_type",
        "k",
        F.row_number().over(wp).alias("rk"),
        F.count("*")
        .over(Window.partitionBy("event_type"))
        .cast("long")
        .alias("nu"),
    )
    q = r.groupBy("event_type").agg(
        F.min("nu").alias("n_users"),
        F.max("k").cast("long").alias("max_contrib"),
        F.max(
            F.when(F.col("rk") == F.expr("(95 * nu + 99) div 100"), F.col("k"))
        )
        .cast("long")
        .alias("clip_at"),
    )
    return (
        u.join(F.broadcast(q), "event_type")
        .groupBy("event_type", "n_users", "max_contrib", "clip_at")
        .agg(
            F.sum(F.when(F.col("k") > F.col("clip_at"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_users"),
            F.sum("k").cast("long").alias("raw_total"),
            F.sum(F.least(F.col("k"), F.col("clip_at")))
            .cast("long")
            .alias("clipped_total"),
            (
                F.sum("k") - F.sum(F.least(F.col("k"), F.col("clip_at")))
            )
            .cast("long")
            .alias("clipped_mass"),
        )
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test over daily volume deltas
# ---------------------------------------------------------------------------


@register(
    "stats_runs_test_daily",
    oracle="""
WITH daily AS (
  SELECT event_type, ts::DATE AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
dl AS (
  SELECT event_type, d,
         c - LAG(c) OVER (PARTITION BY event_type ORDER BY d) AS delta
  FROM daily
),
sg AS (
  SELECT event_type, d,
         CASE WHEN delta > 0 THEN 1 ELSE -1 END AS sgn
  FROM dl WHERE delta IS NOT NULL AND delta <> 0
),
ch AS (
  SELECT event_type, sgn,
         CASE WHEN LAG(sgn) OVER (PARTITION BY event_type ORDER BY d)
                   IS DISTINCT FROM sgn THEN 1 ELSE 0 END AS chg
  FROM sg
),
agg AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
         CAST(SUM(chg) AS BIGINT) AS n_runs
  FROM ch GROUP BY event_type
)
SELECT event_type, n_up, n_down, n_up + n_down AS n, n_runs,
       CAST(1000000 + (2000000 * n_up * n_down) // (n_up + n_down)
            AS BIGINT) AS expected_runs_e6,
       CAST(CASE WHEN n_up = 0 OR n_down = 0 OR n_up + n_down < 2 THEN 0
            ELSE (1000000 * 2 * n_up * n_down
                  * (2 * n_up * n_down - (n_up + n_down)))
                 // ((n_up + n_down) * (n_up + n_down)
                     * (n_up + n_down - 1)) END AS BIGINT) AS var_runs_e6
FROM agg
""",
)
def stats_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test (Wald & Wolfowitz 1940) for randomness of
    the daily-volume direction per event type: dichotomize day-over-day
    deltas into up/down signs (zeros excluded, the classic convention),
    count maximal same-sign runs, and ship the null moments as exact
    scaled integers — E[R] = 1 + 2·n₁n₂/n and Var[R] =
    2n₁n₂(2n₁n₂−n)/(n²(n−1)), both floor-e6 (nonnegative whenever both
    sign counts are ≥1, so floor == truncate cross-engine). Too FEW runs
    means momentum/trending, too MANY means oscillation — the
    serial-dependence screen beside the trend tests (Mann-Kendall,
    Theil-Sen) and the lag-7 autocorrelation.

    Scale: daily roll-up collapses events map-side; the delta/sign/
    run-change lags are three window passes over the bounded calendar
    relation per type (one shuffle, shared partitioning); the moment
    arithmetic runs on |types| rows. n_runs counts CHANGES (first run
    contributes the +1 in E[R]'s formula on the oracle side too) —
    identical convention both engines."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("long").alias("c"))
    wt = Window.partitionBy("event_type").orderBy("d")
    dl = daily.select(
        "event_type", "d", (F.col("c") - F.lag("c").over(wt)).alias("delta")
    )
    sg = dl.filter(F.col("delta").isNotNull() & (F.col("delta") != 0)).select(
        "event_type",
        "d",
        F.when(F.col("delta") > 0, 1).otherwise(-1).alias("sgn"),
    )
    ch = sg.select(
        "event_type",
        "sgn",
        F.when(
            ~F.lag("sgn").over(wt).eqNullSafe(F.col("sgn")), 1
        )
        .otherwise(0)
        .alias("chg"),
    )
    agg = ch.groupBy("event_type").agg(
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_up"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_down"),
        F.sum("chg").cast("long").alias("n_runs"),
    )
    return agg.select(
        "event_type",
        "n_up",
        "n_down",
        (F.col("n_up") + F.col("n_down")).alias("n"),
        "n_runs",
        F.expr(
            "CAST(1000000 + (2000000 * n_up * n_down) div (n_up + n_down)"
            " AS BIGINT)"
        ).alias("expected_runs_e6"),
        F.expr(
            "CAST(CASE WHEN n_up = 0 OR n_down = 0 OR n_up + n_down < 2"
            " THEN 0 ELSE (1000000 * 2 * n_up * n_down"
            " * (2 * n_up * n_down - (n_up + n_down)))"
            " div ((n_up + n_down) * (n_up + n_down) * (n_up + n_down - 1))"
            " END AS BIGINT)"
        ).alias("var_runs_e6"),
    )


# ---------------------------------------------------------------------------
# Rich-club coefficient sweep (Zhou & Mondragón 2004)
# ---------------------------------------------------------------------------

_RICH_KS = (2, 4, 8)


def _rich_club_oracle() -> str:
    per_k = "\nUNION ALL\n".join(
        f"""SELECT CAST({k} AS BIGINT) AS k,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM deg WHERE kdeg > {k}) AS n_club,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM edges e
        JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
        WHERE du.kdeg > {k} AND dv.kdeg > {k}) AS e_club"""
        for k in _RICH_KS
    )
    return f"""
WITH eraw AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (SELECT u, v FROM eraw GROUP BY u, v HAVING COUNT(*) >= 2),
sym AS (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS kdeg FROM sym GROUP BY u),
sweep AS ({per_k})
SELECT k, n_club, e_club,
       CAST((1000000 * 2 * e_club) // (n_club * (n_club - 1)) AS BIGINT)
         AS phi_ppm
FROM sweep WHERE n_club >= 2
"""


@register("graph_rich_club_coefficient", oracle=_rich_club_oracle())
def graph_rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient sweep (Zhou & Mondragón 2004) of the
    weight>=2 co-purchase graph: for each degree cutoff k, the density
    φ(k) = 2·E_k / (N_k·(N_k−1)) among nodes of degree > k — do the
    hubs preferentially interconnect? The cohesion-of-the-core view
    beside assortativity's global mixing scalar (a graph can be
    disassortative overall yet have a dense rich club); exact floor-ppm,
    clubs with fewer than 2 members emit no row in either engine.

    Scale: one shared edge build (the kcore/ktruss equi-join, persisted
    across the sweep and unpersisted after the single collecting action
    — ADVICE r7 #2's fix for the per-cutoff rebuild), one map-side
    degree aggregate; ALL cutoffs then come from ONE pass — edges join
    the broadcast degree relation once to pick up (ku, kv) and every
    n_club/e_club is a conditional count in a single-row aggregate, so
    the edge list shuffles once total and the sweep adds no further
    jobs. The collected state is that one aggregate row (bounded by the
    constant cutoff list, the markov/KM bounded-driver-state
    discipline)."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
        .persist()
    )
    try:
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        deg = sym.groupBy("u").agg(
            F.count("*").cast("long").alias("kdeg")
        ).select(F.col("u").alias("node"), "kdeg")
        ew = edges.join(
            F.broadcast(deg.select(F.col("node").alias("u"), F.col("kdeg").alias("ku"))),
            "u",
        ).join(
            F.broadcast(deg.select(F.col("node").alias("v"), F.col("kdeg").alias("kv"))),
            "v",
        )
        one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
        eagg = ew.agg(
            *[
                one((F.col("ku") > k) & (F.col("kv") > k)).alias(f"e_{k}")
                for k in _RICH_KS
            ]
        )
        nagg = deg.agg(
            *[one(F.col("kdeg") > k).alias(f"n_{k}") for k in _RICH_KS]
        )
        row = nagg.crossJoin(eagg).collect()[0]
    finally:
        edges.unpersist()
    sweep = spark.createDataFrame(
        [(k, int(row[f"n_{k}"]), int(row[f"e_{k}"])) for k in _RICH_KS],
        "k long, n_club long, e_club long",
    )
    return sweep.filter(F.col("n_club") >= 2).select(
        "k",
        "n_club",
        "e_club",
        F.expr(
            "CAST((1000000 * 2 * e_club) div (n_club * (n_club - 1))"
            " AS BIGINT)"
        ).alias("phi_ppm"),
    )


# ---------------------------------------------------------------------------
# Batch twin of the streaming PSI drift monitor
# ---------------------------------------------------------------------------

_PSI_TWIN_BUCKETS = 10


@register(
    "streaming_psi_drift_batch_twin",
    oracle=f"""
WITH ext AS (
  SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
),
b AS (
  SELECT time_bucket(INTERVAL 1 DAY, ts) AS w,
         GREATEST(LEAST(CAST(FLOOR(((value - lo) * {_PSI_TWIN_BUCKETS})
                                   / (hi - lo + 1e-12)) AS INT),
                        {_PSI_TWIN_BUCKETS - 1}), 0) AS bucket
  FROM events, ext
),
q AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS qc FROM b GROUP BY bucket),
qt AS (SELECT CAST(SUM(qc) AS BIGINT) AS q_tot FROM q),
wb AS (
  SELECT w, bucket, CAST(COUNT(*) AS BIGINT) AS n_win FROM b GROUP BY w, bucket
),
wt AS (SELECT w, CAST(SUM(n_win) AS BIGINT) AS win_tot FROM wb GROUP BY w)
SELECT epoch_us(wb.w) AS window_start_us,
       CAST(wb.bucket AS BIGINT) AS bucket,
       wb.n_win, wt.win_tot,
       CAST(ROUND(1000000000.0
            * (CAST(wb.n_win AS DOUBLE) / wt.win_tot
               - CAST(q.qc AS DOUBLE) / qt.q_tot)
            * LN((CAST(wb.n_win AS DOUBLE) * qt.q_tot)
                 / (CAST(q.qc AS DOUBLE) * wt.win_tot)))
            AS BIGINT) AS psi_term_e9
FROM wb JOIN wt USING (w) JOIN q USING (bucket), qt
WHERE wb.n_win > 0 AND q.qc > 0
""",
)
def streaming_psi_drift_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.stream_psi_drift — the SAME per-window,
    per-bucket PSI contributions (daily tumbling windows, 10 equi-width
    value buckets, baseline = the full-corpus histogram) computed as a
    batch relation, so the streaming drift monitor's arithmetic carries
    a full value-hash CORRECTNESS row (the streaming_near_dup /
    token_budget twin discipline: the driver grades batch, the pytest
    drives the actual stream and asserts row-level agreement with this
    twin's formula). Each PSI term is one per-row ln from four exact
    integers, rounded e9, per-bucket rows — never a summed
    transcendental.

    Scale: extents are one all-reduce broadcast; bucket assignment is
    codegen arithmetic; window and baseline histograms are map-side
    combinable aggregates over (day, bucket) — the joined relations are
    calendar × 10 rows."""
    ev = load_table(spark, sf_dir, "events")
    nb = _PSI_TWIN_BUCKETS
    ext = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    b = ev.crossJoin(F.broadcast(ext)).select(
        F.date_trunc("day", F.col("ts")).alias("w"),
        F.greatest(
            F.least(
                F.expr(
                    f"CAST(((value - lo) * {nb}) / (hi - lo + 1e-12) AS INT)"
                ),
                F.lit(nb - 1),
            ),
            F.lit(0),
        ).alias("bucket"),
    )
    q = b.groupBy("bucket").agg(F.count("*").cast("long").alias("qc"))
    qt = q.agg(F.sum("qc").cast("long").alias("q_tot"))
    wb = b.groupBy("w", "bucket").agg(F.count("*").cast("long").alias("n_win"))
    wt = wb.groupBy("w").agg(F.sum("n_win").cast("long").alias("win_tot"))
    return (
        wb.join(F.broadcast(wt), "w")
        .join(F.broadcast(q), "bucket")
        .crossJoin(F.broadcast(qt))
        .filter((F.col("n_win") > 0) & (F.col("qc") > 0))
        .select(
            F.unix_micros(F.col("w").cast("timestamp_ltz")).alias(
                "window_start_us"
            ),
            F.col("bucket").cast("long").alias("bucket"),
            "n_win",
            "win_tot",
            F.expr(
                "CAST(ROUND(1000000000.0"
                " * (CAST(n_win AS DOUBLE) / win_tot"
                "    - CAST(qc AS DOUBLE) / q_tot)"
                " * LN((CAST(n_win AS DOUBLE) * q_tot)"
                "      / (CAST(qc AS DOUBLE) * win_tot)))"
                " AS BIGINT)"
            ).alias("psi_term_e9"),
        )
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured extraction (Spark 4 native type)
# ---------------------------------------------------------------------------


@register(
    "events_variant_extract",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(MAX(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS k_max,
       CAST(SUM(CASE WHEN props::JSON ->> 'missing' IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_path
FROM events
GROUP BY event_type
""",
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's native VARIANT type:
    ``parse_json`` shreds the props payload ONCE into the binary variant
    encoding, then ``variant_get`` path reads are cheap typed probes —
    the engine path that replaces per-extraction string re-parsing
    (get_json_object re-tokenizes the string for every path; the
    registry's events_json_props_rollup shows that older pattern). The
    missing-path count proves variant null semantics: absent paths read
    as SQL NULL, not an error. DuckDB mirrors with its JSON type.

    Scale: parse_json runs scan-stage row-local (codegen, no UDF); the
    rollup is one map-side-combinable aggregate over |event_type| rows.
    At 100 TB VARIANT's columnar shredding (Parquet variant shredding)
    turns repeated path probes into column reads — the design reason to
    prefer it over string JSON at ingestion time."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json(F.col("props")).alias("vp")
    ).select(
        "event_type",
        F.expr("variant_get(vp, '$.k', 'bigint')").alias("k"),
        F.expr("variant_get(vp, '$.missing', 'string')").alias("m"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("k").cast("long").alias("k_sum"),
        F.max("k").cast("long").alias("k_max"),
        F.sum(F.when(F.col("m").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_missing_path"),
    )


# ---------------------------------------------------------------------------
# LATERAL correlated subquery (per-group top-k without a window)
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT s.c_mktsegment AS segment, l.c_custkey, l.bal_cents
FROM (SELECT DISTINCT c_mktsegment FROM customer) s,
LATERAL (
  SELECT c_custkey, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer c
  WHERE c.c_mktsegment = s.c_mktsegment
  ORDER BY bal_cents DESC, c_custkey
  LIMIT 3
) l
"""


@register("lateral_topk_per_segment", oracle=_LATERAL_SQL)
def lateral_topk_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment top-3 customers by account balance via a LATERAL
    correlated subquery — the SQL-standard formulation of top-k-per-group
    (the same ANSI text runs verbatim on both engines), completing the
    subquery family (scalar/correlated/EXISTS) with the lateral member.
    Catalyst decorrelates the lateral into a ranked window under the
    hood, so the physical plan matches the registry's
    window_rank_orders_per_customer shape rather than a per-group rescan
    — declare the intent, let the optimizer pick the join strategy.

    Scale: after decorrelation this is one customer-keyed window over
    segment partitions — a single shuffle on the grouping key; the
    5-row segment relation never drives row-at-a-time execution."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# Cohort lifetime-value curve
# ---------------------------------------------------------------------------


@register(
    "orders_cohort_ltv_curve",
    oracle="""
WITH o AS (
  SELECT o_custkey,
         CAST(EXTRACT(year FROM o_orderdate) * 12
              + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS m,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
f AS (SELECT o_custkey, MIN(m) AS m0 FROM o GROUP BY o_custkey),
cs AS (SELECT m0, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM f GROUP BY m0),
cell AS (
  SELECT f.m0, o.m - f.m0 AS offset_m,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(o.cents) AS BIGINT) AS revenue_cents
  FROM o JOIN f USING (o_custkey)
  GROUP BY f.m0, o.m - f.m0
)
SELECT cell.m0 AS cohort_month_idx, cell.offset_m, cs.cohort_size,
       cell.n_orders, cell.revenue_cents,
       CAST(SUM(cell.revenue_cents) OVER (PARTITION BY cell.m0
                                          ORDER BY cell.offset_m
                                          ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_revenue_cents,
       CAST(SUM(cell.revenue_cents) OVER (PARTITION BY cell.m0
                                          ORDER BY cell.offset_m
                                          ROWS UNBOUNDED PRECEDING)
            // cs.cohort_size AS BIGINT) AS ltv_per_customer_cents
FROM cell JOIN cs USING (m0)
""",
)
def orders_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers grouped by first-order
    month (linear month index year*12+month-1, so offsets subtract
    exactly), then per (cohort, months-since-first) the order count,
    exact-cents revenue, running cumulative revenue, and the
    per-customer LTV the growth model reads off the curve — the
    unit-economics view that prices acquisition spend, completing the
    behavioral-cohort lane (weekly retention = who comes back; this =
    what they are worth while they do).

    Scale: first-month MIN and the (cohort, offset) cells are map-side
    combinable aggregates keyed on custkey then on the bounded
    |months|² cell grid; the cumulative window partitions by cohort
    over that tiny relation. All integers (exact cents, floor
    per-customer division)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    f = o.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    cs = f.groupBy("m0").agg(F.count("*").cast("long").alias("cohort_size"))
    cell = (
        o.join(f, "o_custkey")
        .groupBy("m0", (F.col("m") - F.col("m0")).alias("offset_m"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )
    wc = (
        Window.partitionBy("m0")
        .orderBy("offset_m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cell.join(F.broadcast(cs), "m0")
        .select(
            F.col("m0").alias("cohort_month_idx"),
            "offset_m",
            "cohort_size",
            "n_orders",
            "revenue_cents",
            F.sum("revenue_cents").over(wc).cast("long").alias(
                "cum_revenue_cents"
            ),
            F.expr(
                "CAST(SUM(revenue_cents) OVER (PARTITION BY m0 ORDER BY offset_m"
                " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                " div cohort_size AS BIGINT)"
            ).alias("ltv_per_customer_cents"),
        )
    )
