"""Second round-6 analytics batch: resampling inference, sequential
pattern mining, cohesive-subgraph peeling, and corpus keyness.

* ``stats_bootstrap_ci_revenue`` — deterministic Poisson bootstrap
  (Chamandy et al., Google 2012 "Estimating uncertainty for massive
  data streams"): the one-pass bootstrap used at terabyte scale, made
  bit-reproducible with a two-round multiplicative hash instead of RNG
  state.
* ``events_frequent_sequences`` — GSP/PrefixSpan-style frequent ordered
  subsequences (Agrawal & Srikant 1996) of first event-type occurrences
  per session.
* ``graph_ktruss_copurchase`` — k-truss peel (Cohen 2008): the EDGE
  fixpoint beside the registry's vertex-set (k-core) and value
  (PageRank/label-prop) fixpoints.
* ``vocab_keyness_llr`` — Dunning 1993 log-likelihood keyness of terms
  per source vs the rest of the corpus — the corpus-linguistics
  "what is this slice about" signal beside collocation lift.
* ``window_rolling_median_orders`` — exact rolling median over integer
  cents, hash-portable because doubling a .0/.5 median is an exact
  BIGINT.
* ``stats_pmi_cells`` — pointwise mutual information per contingency
  cell for categorical column pairs (column-dependence profiling).
* ``ce_histogram_join_audit`` — histogram join-cardinality estimation
  vs exact Σc² truth with the q-error metric (Moerkotte et al. 2009);
  the audited join is never executed.
* ``drift_psi_doclen`` — Population Stability Index contributions per
  bin (the model-monitoring drift score), per-row ln only.
* ``privacy_recursive_cl_diversity`` — Machanavajjhala et al. 2006
  recursive (c,l)-diversity, the skew-aware member completing the
  k-anonymity / t-closeness structural-privacy trio.
* ``dq_referential_integrity`` — exact orphan accounting across all six
  FK edges of the star schema, keys-relation joins only.
* ``events_interarrival_cv`` — point-process burstiness (inter-arrival
  coefficient of variation) with an all-integer variance ratio and a
  correctly-rounded sqrt as the only float op.
* ``embedding_isotropy_by_label`` — Ethayarajh 2019 anisotropy score
  |Σv|²/(n·Σ|v|²) in exact ppm over quantized coordinates.
* ``events_autocorr_weekly`` — lag-7 Pearson autocorrelation of daily
  volume from exact BIGINT moments (sqrt-only float finish).
* ``vocab_trigram_coverage_sweep`` — exact vocabulary-budget coverage
  curve over word trigrams (windows over the vocabulary relation).
* ``er_trigram_cosine_pairs`` — pg_trgm-style trigram-cosine similarity
  join (integer cross-multiplied threshold, df-capped blocking).
* ``sketch_bloom_fpp_audit`` — portable Bloom false-positive audit with
  the filter state as a value-hash-oracled relation.
* ``events_binary_segmentation`` — offline change-point (AMOC split by
  exact SSE-reduction argmax from prefix sums).
* ``stats_kendall_tau_daily`` — Kendall tau-b from exact pair
  concordance counts, completing the correlation triple.
* ``multimodal_patch_grid`` — ViT-style tile statistics over REAL
  decoded BMPs (orientation-aware — construction-derived oracle).
* ``graph_link_prediction_jaccard`` — Liben-Nowell/Kleinberg neighbor
  Jaccard over non-adjacent pairs (missing-edge scoring).
* ``events_robust_anomaly_mad`` — Hampel median/MAD outlier gate (50%
  breakdown where the z-score masks itself).
* ``stats_median_ci_orderstat`` — distribution-free 95% median CI via
  binomial order-statistic ranks on shared quickselect rounds.
* ``inequality_lorenz_deciles`` — the Lorenz spend-concentration curve
  in exact floor-ppm decile shares.
* ``events_markov_stationary`` — e9-integer power iteration to the
  user-journey chain's stationary distribution (pagerank discipline).
* ``forecast_pinball_baselines`` — exact-integer pinball (quantile)
  loss of the median-constant and seasonal-naive forecast floors.

Reference scope note: the reference (keboola/db-writer-redshift)
delegates all analytics to the warehouse; these are the downstream
queries its users ran there, Spark-first. Portability discipline as
plans/registry.py: integer-exact where possible, per-ROW rounded
transcendentals only (never summed per-member terms).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from db_writer_redshift_spark.plans.registry import load_table, register

# ---------------------------------------------------------------------------
# Deterministic Poisson bootstrap over order revenue
# ---------------------------------------------------------------------------

_BOOT_REPS = 32
_BOOT_RING = 4294967296  # 2^32
_BOOT_A = 2654435761  # Knuth multiplicative (the repo's sampling ring)
_BOOT_B = 2246822519  # replicate offset (Murmur3 c2)
_BOOT_A2 = 1540483477  # second-round multiplier (Murmur2 M); chosen so
#                        h1 * A2 <= 2^32 * 1.55e9 < 2^63 never overflows
# Poisson(1) inverse-CDF thresholds on the 2^32 ring: P(X <= k) * 2^32
# for k = 0..6; the tail beyond 6 (~8e-5) maps to weight 7.
_BOOT_THRESH = []
_cum = 0.0
for _k in range(7):
    _cum += math.exp(-1) / math.factorial(_k)
    _BOOT_THRESH.append(int(_cum * _BOOT_RING))

_BOOT_CASE = (
    "CASE "
    + " ".join(f"WHEN h2 < {t} THEN {k}" for k, t in enumerate(_BOOT_THRESH))
    + " ELSE 7 END"
)

_BOOT_ORACLE = f"""
WITH reps AS (SELECT unnest(range({_BOOT_REPS})) AS r),
h AS (
  SELECT r,
         ((o_orderkey * {_BOOT_A} + (r + 1) * {_BOOT_B} + 1)
          % {_BOOT_RING}) AS h1,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders, reps
),
hh AS (SELECT r, (h1 * {_BOOT_A2}) % {_BOOT_RING} AS h2, cents FROM h),
w AS (SELECT r, {_BOOT_CASE} AS wgt, cents FROM hh),
rep AS (
  SELECT CAST(r AS BIGINT) AS replicate,
         CAST(SUM(wgt) AS BIGINT) AS n_eff,
         CAST(SUM(wgt * cents) AS BIGINT) AS sum_cents,
         CAST((1000000 * CAST(SUM(wgt * cents) AS HUGEINT))
              // CAST(SUM(wgt) AS HUGEINT) AS BIGINT) AS mean_cents_e6
  FROM w GROUP BY 1
)
SELECT replicate, n_eff, sum_cents, mean_cents_e6,
       CAST(ROW_NUMBER() OVER (ORDER BY mean_cents_e6, replicate) AS BIGINT)
         AS ci_rank
FROM rep
"""


@register("stats_bootstrap_ci_revenue", oracle=_BOOT_ORACLE)
def stats_bootstrap_ci_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap of mean order revenue (Chamandy
    et al. 2012 — the resampling scheme that works in one pass over a
    stream, because Poisson(1) weights need no global n): 32 replicates,
    each row's weight drawn by inverting the Poisson CDF on a two-round
    multiplicative hash of (o_orderkey, replicate). The relation IS the
    bootstrap distribution — exact integer per-replicate effective
    counts and cent sums, the e6 floor-scaled replicate mean, and the
    rank that turns sorted replicates into a percentile CI (ranks 2-31
    of 32 = the central 93.75%). At sf0.01 the replicate-mean spread
    reproduces the theoretical standard error within 2%.

    Two hash rounds matter: a single affine ring (k*A + c_r) shifts ALL
    rows by the same constant between replicates, so small key ranges
    never cross a threshold; the interleaved mod + second multiply
    breaks the shift (h1*A2 stays under 2^63 by construction; the first
    product needs o_orderkey < ~3.4e9 — beyond that, pre-fold the key
    with % 2^32 once, same discipline as the sampling ops).

    Scale: the 32-way replicate fan-out is a constant explode (the
    pack_padding_efficiency_sweep pattern); per-replicate sums are
    map-side-combinable aggregates with 32 groups; no joins, no RNG
    state, so any cluster size and any partitioning reproduce the same
    32 rows. The final rank windows over 32 rows."""
    orders = load_table(spark, sf_dir, "orders")
    reps = spark.range(_BOOT_REPS).select(F.col("id").alias("r"))
    h = orders.crossJoin(F.broadcast(reps)).select(
        "r",
        F.expr(
            f"(o_orderkey * {_BOOT_A} + (r + 1) * {_BOOT_B} + 1)"
            f" % {_BOOT_RING}"
        ).alias("h1"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    hh = h.select(
        "r",
        F.expr(f"(h1 * {_BOOT_A2}) % {_BOOT_RING}").alias("h2"),
        "cents",
    )
    w = hh.select("r", F.expr(_BOOT_CASE).alias("wgt"), "cents")
    rep = w.groupBy(F.col("r").cast("long").alias("replicate")).agg(
        F.sum("wgt").cast("long").alias("n_eff"),
        F.sum(F.col("wgt") * F.col("cents")).cast("long").alias("sum_cents"),
        # e6 scaling through DECIMAL(38,0): 1e6 * sum_cents passes 2^63
        # already at ~15M mean-priced orders; the wide lane keeps the
        # floor division exact at any corpus size (both engines: DuckDB
        # rides HUGEINT, positive operands make div == floor).
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * CAST(sum(wgt * cents) AS DECIMAL(38,0)))"
            " div CAST(sum(wgt) AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("mean_cents_e6"),
    )
    return rep.withColumn(
        "ci_rank",
        F.row_number()
        .over(Window.orderBy("mean_cents_e6", "replicate"))
        .cast("long"),
    )


# ---------------------------------------------------------------------------
# Frequent ordered event-type subsequences per session
# ---------------------------------------------------------------------------

_SEQ_GAP_US = 1_800_000_000  # 30-minute session gap — events_sessionization rule

_SEQ_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {_SEQ_GAP_US}
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_type, ts,
         CAST(SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM flagged
),
firsts AS (
  SELECT user_id, session_id, event_type, MIN(ts) AS fts
  FROM sessions GROUP BY 1, 2, 3
),
tot AS (SELECT CAST(COUNT(DISTINCT (user_id, session_id)) AS BIGINT)
          AS n_total FROM firsts),
p2 AS (
  SELECT f1.event_type || '>' || f2.event_type AS seq,
         CAST(2 AS BIGINT) AS seq_len,
         CAST(COUNT(*) AS BIGINT) AS n_sessions
  FROM firsts f1 JOIN firsts f2
    ON f1.user_id = f2.user_id AND f1.session_id = f2.session_id
   AND (f1.fts < f2.fts
        OR (f1.fts = f2.fts AND f1.event_type < f2.event_type))
  GROUP BY 1
),
p3 AS (
  SELECT f1.event_type || '>' || f2.event_type || '>' || f3.event_type AS seq,
         CAST(3 AS BIGINT) AS seq_len,
         CAST(COUNT(*) AS BIGINT) AS n_sessions
  FROM firsts f1
  JOIN firsts f2
    ON f1.user_id = f2.user_id AND f1.session_id = f2.session_id
   AND (f1.fts < f2.fts
        OR (f1.fts = f2.fts AND f1.event_type < f2.event_type))
  JOIN firsts f3
    ON f2.user_id = f3.user_id AND f2.session_id = f3.session_id
   AND (f2.fts < f3.fts
        OR (f2.fts = f3.fts AND f2.event_type < f3.event_type))
  GROUP BY 1
)
SELECT seq, seq_len, n_sessions,
       (1000000 * n_sessions) // n_total AS support_ppm
FROM (SELECT * FROM p2 UNION ALL SELECT * FROM p3), tot
"""


@register("events_frequent_sequences", oracle=_SEQ_ORACLE)
def events_frequent_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent ordered subsequences (GSP / PrefixSpan level 2 and 3 —
    Agrawal & Srikant 1996, Pei et al. 2001) over sessionized events:
    each session is reduced to the FIRST occurrence of each event type;
    a length-2/3 sequence is supported by a session when its types'
    first occurrences appear in that order (ties broken by type name —
    a total, engine-agnostic order). Unlike events_top_session_paths
    (contiguous full paths) this counts NON-CONTIGUOUS patterns — the
    signal funnel designers mine before committing to a funnel
    definition. Support is reported in exact ppm of all sessions.

    Scale: sessionization shares the established user_id-window rule;
    the firsts relation caps at |event types| (5) rows per session, so
    the within-session self-joins touch at most C(5,2)/C(5,3) pairs and
    triples per session and the output is bounded by |types|^3 = 125
    rows regardless of corpus size. One user_id shuffle feeds every
    stage; the session total broadcasts."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_ltz = F.col("ts").cast("timestamp_ltz")
    gap_us = F.unix_micros(ts_ltz) - F.unix_micros(F.lag(ts_ltz).over(w))
    sessions = e.select(
        "user_id",
        "event_type",
        "ts",
        F.sum(F.when(gap_us.isNull() | (gap_us > _SEQ_GAP_US), 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("session_id"),
    )
    firsts = sessions.groupBy("user_id", "session_id", "event_type").agg(
        F.min("ts").alias("fts")
    )
    n_total = firsts.select("user_id", "session_id").distinct().count()

    def _before(a: str, b: str):
        return (F.col(f"{a}.fts") < F.col(f"{b}.fts")) | (
            (F.col(f"{a}.fts") == F.col(f"{b}.fts"))
            & (F.col(f"{a}.event_type") < F.col(f"{b}.event_type"))
        )

    f1, f2, f3 = firsts.alias("f1"), firsts.alias("f2"), firsts.alias("f3")
    same12 = (F.col("f1.user_id") == F.col("f2.user_id")) & (
        F.col("f1.session_id") == F.col("f2.session_id")
    )
    same23 = (F.col("f2.user_id") == F.col("f3.user_id")) & (
        F.col("f2.session_id") == F.col("f3.session_id")
    )
    p2 = (
        f1.join(f2, same12 & _before("f1", "f2"))
        .groupBy(
            F.concat_ws(
                ">", F.col("f1.event_type"), F.col("f2.event_type")
            ).alias("seq")
        )
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .select("seq", F.lit(2).cast("long").alias("seq_len"), "n_sessions")
    )
    p3 = (
        f1.join(f2, same12 & _before("f1", "f2"))
        .join(f3, same23 & _before("f2", "f3"))
        .groupBy(
            F.concat_ws(
                ">",
                F.col("f1.event_type"),
                F.col("f2.event_type"),
                F.col("f3.event_type"),
            ).alias("seq")
        )
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .select("seq", F.lit(3).cast("long").alias("seq_len"), "n_sessions")
    )
    return p2.unionAll(p3).select(
        "seq",
        "seq_len",
        "n_sessions",
        F.expr(f"(1000000 * n_sessions) div {n_total}")
        .cast("long")
        .alias("support_ppm"),
    )


# ---------------------------------------------------------------------------
# k-truss peel over the co-purchase graph
# ---------------------------------------------------------------------------

_TRUSS_K = 3  # every surviving edge must close >= K-2 = 1 triangle
_TRUSS_ROUNDS = 4  # sf0.001-0.1 converge by round 2; trajectory shows it

_TRUSS_EDGES_SQL = """
eraw AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
e0 AS MATERIALIZED (SELECT u, v FROM eraw GROUP BY u, v HAVING COUNT(*) >= 2)"""


def _ktruss_oracle() -> str:
    ctes = [_TRUSS_EDGES_SQL]
    for r in range(1, _TRUSS_ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"""
tri{r} AS MATERIALIZED (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e{p} e1 JOIN e{p} e2 ON e1.u = e2.u AND e1.v < e2.v
  JOIN e{p} e3 ON e3.u = e1.v AND e3.v = e2.v
),
sup{r} AS MATERIALIZED (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS s FROM (
    SELECT a AS u, b AS v FROM tri{r}
    UNION ALL SELECT a, c FROM tri{r}
    UNION ALL SELECT b, c FROM tri{r}
  ) GROUP BY 1, 2
),
e{r} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{p} e JOIN sup{r} s ON e.u = s.u AND e.v = s.v
  WHERE s.s >= {_TRUSS_K - 2}
)"""
        )
    stats = "\nUNION ALL\n".join(
        f"""SELECT CAST({r} AS BIGINT) AS round,
       CAST(COUNT(DISTINCT node) AS BIGINT) AS n_nodes,
       COUNT(*) // 2 AS n_edges
FROM (SELECT u AS node FROM e{r} UNION ALL SELECT v FROM e{r})
HAVING COUNT(*) > 0"""
        for r in range(_TRUSS_ROUNDS + 1)
    )
    return f"WITH {','.join(ctes)}\n{stats}"


@register("graph_ktruss_copurchase", oracle=_ktruss_oracle())
def graph_ktruss_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-truss decomposition (Cohen 2008) of the weight>=2 co-purchase
    graph: iteratively delete edges supporting fewer than k-2 triangles
    until the k-truss remains, emitting the (round, n_nodes, n_edges)
    peel trajectory. The EDGE-fixpoint sibling of graph_kcore_copurchase
    (vertex peel) — trusses are strictly denser than cores (every
    3-truss edge is inside a triangle, so the 3-truss at sf0.01 keeps
    181 of 3445 edges where the 2-core keeps most of them) and are the
    community-core primitive behind cohesive-group mining.

    Scale: each round computes per-edge support with the edge-iterator
    algorithm (Schank & Wagner 2005) — |N(u) ∩ N(v)| by row-local
    intersection of sorted adjacency arrays — so the only shuffle per
    round is the |V|-row adjacency build; the wedge volume (measured
    41M rows at the 10x probe) stays on the CPU instead of crossing
    the shuffle. localCheckpoint per round truncates lineage; the edge
    set only SHRINKS, so round cost decreases monotonically and the
    driver loop is bounded by the constant R=4."""
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
        .localCheckpoint(eager=True)
    )

    def _round_stats(e: DataFrame, r: int) -> DataFrame:
        nodes = e.select(F.col("u").alias("node")).unionAll(
            e.select(F.col("v").alias("node"))
        )
        return nodes.agg(
            F.lit(r).cast("long").alias("round"),
            F.count_distinct("node").cast("long").alias("n_nodes"),
            F.expr("count(*) div 2").alias("n_edges"),
        ).filter(F.col("n_edges") > 0)

    out = [_round_stats(edges, 0)]
    e = edges
    for r in range(1, _TRUSS_ROUNDS + 1):
        # Edge-iterator support counting (Schank & Wagner 2005): per
        # edge, support = |N(u) ∩ N(v)| via row-local intersection of
        # the two adjacency arrays. The wedge-join alternative shuffles
        # EVERY wedge (measured 41M rows at the 10x probe — linear, but
        # all of it through the shuffle); here the only shuffle is the
        # |V|-row adjacency build, and the intersections are CPU-local
        # on arrays bounded by max degree. The adjacency relation is
        # node-count-sized (broadcastable here; at hub-heavy scale the
        # same plan runs as a sorted shuffle join and the weight gate
        # caps degrees before any array forms).
        nbrs = (
            e.select(F.col("u").alias("x"), F.col("v").alias("y"))
            .unionAll(e.select(F.col("v").alias("x"), F.col("u").alias("y")))
            .groupBy("x")
            .agg(F.sort_array(F.collect_list("y")).alias("nb"))
        )
        e = (
            e.join(
                F.broadcast(
                    nbrs.select(F.col("x").alias("u"), F.col("nb").alias("nbu"))
                ),
                "u",
            )
            .join(
                F.broadcast(
                    nbrs.select(F.col("x").alias("v"), F.col("nb").alias("nbv"))
                ),
                "v",
            )
            .filter(
                F.size(F.array_intersect("nbu", "nbv")) >= _TRUSS_K - 2
            )
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        out.append(_round_stats(e, r))
    from functools import reduce

    return reduce(DataFrame.unionAll, out)


# ---------------------------------------------------------------------------
# Log-likelihood keyness of terms per source (Dunning 1993)
# ---------------------------------------------------------------------------

_KEY_MIN_COUNT = 50

_KEYNESS_ORACLE = f"""
WITH tok AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS t FROM documents
),
tf AS (
  SELECT source, t AS term, CAST(COUNT(*) AS BIGINT) AS n_source
  FROM tok WHERE t <> '' GROUP BY 1, 2
),
tot AS (SELECT source, CAST(SUM(n_source) AS BIGINT) AS src_tokens
        FROM tf GROUP BY 1),
ct AS (SELECT term, CAST(SUM(n_source) AS BIGINT) AS n_corpus
       FROM tf GROUP BY 1),
nn AS (SELECT CAST(SUM(n_source) AS BIGINT) AS n FROM tf)
SELECT tf.source, tf.term, tf.n_source,
       (n_corpus - tf.n_source) AS n_rest,
       src_tokens, (n - src_tokens) AS rest_tokens,
       CAST(ROUND(2000000.0 * (
         tf.n_source * LN(CAST(tf.n_source AS DOUBLE) * n
                          / (CAST(n_corpus AS DOUBLE) * src_tokens))
         + CASE WHEN n_corpus - tf.n_source = 0 THEN 0
                ELSE (n_corpus - tf.n_source)
                     * LN(CAST(n_corpus - tf.n_source AS DOUBLE) * n
                          / (CAST(n_corpus AS DOUBLE) * (n - src_tokens)))
           END)) AS BIGINT) AS llr_e6
FROM tf JOIN tot USING (source) JOIN ct USING (term) CROSS JOIN nn
WHERE tf.n_source >= {_KEY_MIN_COUNT}
  AND tf.n_source * n > n_corpus * src_tokens
"""


@register("vocab_keyness_llr", oracle=_KEYNESS_ORACLE)
def vocab_keyness_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning (1993) log-likelihood keyness: for each (source, term)
    where the term is OVER-represented in the source vs the rest of the
    corpus, the G^2 statistic 2*(a*ln(a/E_a) + b*ln(b/E_b)) — the
    standard "what characterizes this slice" ranking in corpus
    linguistics, robust at low counts where plain ratios explode. The
    over-representation gate and the minimum count are exact integer
    cross-multiplications (a*N > ct*n1, a >= 50); only the final G^2 is
    floating point, computed PER ROW from four already-aggregated
    integers and rounded at e6 — the registry's tfidf/ccnet rule, never
    a summed per-member transcendental.

    Scale: one (source, term) count aggregate (map-side combinable)
    feeds everything; the per-term corpus totals are a second aggregate
    over the FREQUENCY relation (vocabulary-sized, not corpus-sized);
    source totals and the grand total broadcast. The integer gate
    prunes the output to the keyness shortlist before any float math."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split(F.lower(F.col("text")), " ")).alias("t")
    ).filter(F.col("t") != "")
    tf = tok.groupBy("source", F.col("t").alias("term")).agg(
        F.count("*").cast("long").alias("n_source")
    )
    tot = tf.groupBy("source").agg(
        F.sum("n_source").cast("long").alias("src_tokens")
    )
    ct = tf.groupBy("term").agg(
        F.sum("n_source").cast("long").alias("n_corpus")
    )
    nn = tf.agg(F.sum("n_source").cast("long").alias("n"))
    out = (
        tf.join(F.broadcast(tot), "source")
        .join(ct, "term")
        .crossJoin(F.broadcast(nn))
        .filter(
            (F.col("n_source") >= _KEY_MIN_COUNT)
            & (F.col("n_source") * F.col("n") > F.col("n_corpus") * F.col("src_tokens"))
        )
    )
    llr = F.expr(
        "CAST(ROUND(2000000.0 * ("
        " n_source * LN(CAST(n_source AS DOUBLE) * n"
        "              / (CAST(n_corpus AS DOUBLE) * src_tokens))"
        " + CASE WHEN n_corpus - n_source = 0 THEN 0"
        "        ELSE (n_corpus - n_source)"
        "             * LN(CAST(n_corpus - n_source AS DOUBLE) * n"
        "                  / (CAST(n_corpus AS DOUBLE) * (n - src_tokens)))"
        "   END)) AS BIGINT)"
    )
    return out.select(
        "source",
        "term",
        "n_source",
        (F.col("n_corpus") - F.col("n_source")).cast("long").alias("n_rest"),
        "src_tokens",
        (F.col("n") - F.col("src_tokens")).cast("long").alias("rest_tokens"),
        llr.alias("llr_e6"),
    )


# ---------------------------------------------------------------------------
# Exact rolling median of order value per customer
# ---------------------------------------------------------------------------

_MED_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT o_custkey, o_orderkey,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_in_window,
       CAST(2 * quantile_cont(cents, 0.5) OVER w AS BIGINT) AS med_x2_cents
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@register("window_rolling_median_orders", oracle=_MED_ORACLE)
def window_rolling_median_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling MEDIAN of order value over each customer's trailing
    7 orders — the outlier-resistant baseline behind per-entity spend
    monitoring, where the existing moving-AVERAGE window is poisoned by
    one big order. Exactness is hash-portable by construction: the
    median interpolates integer cents, so its only possible fractions
    are .0/.5 (exactly representable doubles on both engines, whatever
    interpolation formula each uses), and DOUBLING it makes the output
    an exact BIGINT.

    Scale: one customer-partitioned window (thousands of small
    independent partitions, no global sort); the sliding percentile
    recomputes a 7-element frame per row — constant work per row, and
    Spark's TypedImperativeAggregate window path never materializes
    more than the frame."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w).cast("long").alias("n_in_window"),
        (F.lit(2) * F.expr("percentile(cents, 0.5)").over(w))
        .cast("long")
        .alias("med_x2_cents"),
    )


# ---------------------------------------------------------------------------
# Pointwise mutual information between categorical column pairs
# ---------------------------------------------------------------------------

_PMI_PAIRS = [
    ("lineitem", "returnflag|linestatus", "l_returnflag", "l_linestatus"),
    ("orders", "orderpriority|orderstatus", "o_orderpriority", "o_orderstatus"),
]


def _pmi_oracle() -> str:
    branches = "\n  UNION ALL\n".join(
        f"SELECT '{label}' AS pair, {ca} AS a, {cb} AS b FROM {tbl}"
        for tbl, label, ca, cb in _PMI_PAIRS
    )
    return f"""
WITH cells AS (
  SELECT pair, a, b, CAST(COUNT(*) AS BIGINT) AS n_ab FROM (
  {branches}
  ) GROUP BY 1, 2, 3
),
ma AS (SELECT pair, a, CAST(SUM(n_ab) AS BIGINT) AS n_a FROM cells GROUP BY 1, 2),
mb AS (SELECT pair, b, CAST(SUM(n_ab) AS BIGINT) AS n_b FROM cells GROUP BY 1, 2),
nn AS (SELECT pair, CAST(SUM(n_ab) AS BIGINT) AS n FROM cells GROUP BY 1)
SELECT cells.pair, a, b, n_ab, n_a, n_b,
       CAST(ROUND(1000000.0 * LN(CAST(n_ab AS DOUBLE) * n
                                 / (CAST(n_a AS DOUBLE) * n_b))) AS BIGINT)
         AS pmi_e6
FROM cells JOIN ma USING (pair, a) JOIN mb USING (pair, b) JOIN nn USING (pair)
"""


@register("stats_pmi_cells", oracle=_pmi_oracle())
def stats_pmi_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information per contingency cell for candidate
    categorical column pairs (Church & Hanks 1990 applied to column
    dependence instead of collocations): ln(P(a,b)/(P(a)P(b))) in e6,
    with the exact joint and marginal counts beside it. Near-zero PMI
    everywhere = independent columns (safe to model separately);
    structured signs = dependence the optimizer/profiler should know
    about. The per-CELL relation is deliberately emitted instead of the
    summed mutual information: each ln is computed once per output row
    from four aggregated integers (the registry's tfidf/ccnet rule),
    while the MI sum would re-introduce the per-member-transcendental
    flap the registry bans.

    Scale: one map-side-combinable cell-count aggregate per pair;
    marginals aggregate the CELL relation (catalog-sized, |A|x|B|
    rows), never the raw table again."""
    from functools import reduce

    branches = []
    for tbl, label, ca, cb in _PMI_PAIRS:
        t = load_table(spark, sf_dir, tbl)
        branches.append(
            t.select(
                F.lit(label).alias("pair"),
                F.col(ca).alias("a"),
                F.col(cb).alias("b"),
            )
        )
    cells = (
        reduce(DataFrame.unionAll, branches)
        .groupBy("pair", "a", "b")
        .agg(F.count("*").cast("long").alias("n_ab"))
    )
    ma = cells.groupBy("pair", "a").agg(F.sum("n_ab").cast("long").alias("n_a"))
    mb = cells.groupBy("pair", "b").agg(F.sum("n_ab").cast("long").alias("n_b"))
    nn = cells.groupBy("pair").agg(F.sum("n_ab").cast("long").alias("n"))
    return (
        cells.join(F.broadcast(ma), ["pair", "a"])
        .join(F.broadcast(mb), ["pair", "b"])
        .join(F.broadcast(nn), "pair")
        .select(
            "pair",
            "a",
            "b",
            "n_ab",
            "n_a",
            "n_b",
            F.expr(
                "CAST(ROUND(1000000.0 * LN(CAST(n_ab AS DOUBLE) * n"
                " / (CAST(n_a AS DOUBLE) * n_b))) AS BIGINT)"
            ).alias("pmi_e6"),
        )
    )


# ---------------------------------------------------------------------------
# Histogram-based join cardinality estimation audit
# ---------------------------------------------------------------------------

_CE_BUCKETS = 64

_CE_ORACLE = f"""
WITH pk AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM lineitem GROUP BY 1
),
bk AS (
  SELECT l_partkey % {_CE_BUCKETS} AS b,
         CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) AS true_rows
  FROM pk GROUP BY 1
)
SELECT b, n_rows, n_keys,
       CAST((CAST(n_rows AS HUGEINT) * n_rows) // n_keys AS BIGINT) AS est_rows,
       true_rows,
       CAST((1000000 * CAST(GREATEST(
              (CAST(n_rows AS HUGEINT) * n_rows) // n_keys,
              true_rows) AS HUGEINT))
            // GREATEST(LEAST((CAST(n_rows AS HUGEINT) * n_rows) // n_keys,
                              true_rows), 1) AS BIGINT) AS qerr_ppm
FROM bk
"""


@register("ce_histogram_join_audit", oracle=_CE_ORACLE)
def ce_histogram_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join cardinality-estimation audit: per 64-bucket hash histogram
    of l_partkey, the optimizer's uniformity estimate of the lineitem
    SELF-join size (n²/d — the textbook formula every cost-based
    optimizer applies per histogram bucket) against the EXACT join size
    (Σ c_k² from the per-key counts — no join executed), plus the
    q-error in ppm (Moerkotte et al. VLDB 2009's metric: max/min of
    estimate vs truth). Key-FK joins estimate exactly; the many-to-many
    self-join errs wherever per-bucket frequencies deviate from
    uniform — precisely the signal that tells an engine when to trust
    histogram CE and when to sample. q-error here runs ~1.04: mild
    generator skew, visible per bucket.

    Scale: the per-key count is one map-side-combinable aggregate; the
    bucket roll-up aggregates the KEY relation (|keys| rows, not
    corpus); the true join size comes from Σc² on that same relation,
    so the audited join is never executed. n² rides DECIMAL(38,0)/
    HUGEINT so the estimate cannot overflow at any bucket size."""
    li = load_table(spark, sf_dir, "lineitem")
    pk = li.groupBy("l_partkey").agg(F.count("*").cast("long").alias("c"))
    bk = pk.groupBy((F.col("l_partkey") % _CE_BUCKETS).alias("b")).agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.expr("CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS BIGINT)").alias(
            "true_rows"
        ),
    )
    est = "(CAST(n_rows AS DECIMAL(38,0)) * n_rows) div n_keys"
    return bk.select(
        "b",
        "n_rows",
        "n_keys",
        F.expr(f"CAST({est} AS BIGINT)").alias("est_rows"),
        "true_rows",
        F.expr(
            f"CAST((1000000 * GREATEST({est}, CAST(true_rows AS DECIMAL(38,0))))"
            f" div GREATEST(LEAST({est}, CAST(true_rows AS DECIMAL(38,0))), 1)"
            " AS BIGINT)"
        ).alias("qerr_ppm"),
    )


# ---------------------------------------------------------------------------
# Population stability index (PSI) per source over doc-length buckets
# ---------------------------------------------------------------------------

_PSI_BUCKETS = 10

_PSI_ORACLE = f"""
WITH ext AS (SELECT MIN(n_chars) AS lo, MAX(n_chars) AS hi FROM documents),
b AS (
  SELECT source,
         LEAST(((n_chars - lo) * {_PSI_BUCKETS}) // (hi - lo + 1),
               {_PSI_BUCKETS - 1}) AS bucket
  FROM documents, ext
),
src AS (SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_src
        FROM b GROUP BY 1, 2),
tot AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_all FROM b GROUP BY 1),
st AS (SELECT source, CAST(SUM(n_src) AS BIGINT) AS src_tot
       FROM src GROUP BY 1),
gt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b)
SELECT src.source, src.bucket, n_src, (n_all - n_src) AS n_rest,
       src_tot, (n - src_tot) AS rest_tot,
       CAST(ROUND(1000000000.0
            * (CAST(n_src AS DOUBLE) / src_tot
               - CAST(n_all - n_src AS DOUBLE) / (n - src_tot))
            * LN((CAST(n_src AS DOUBLE) * (n - src_tot))
                 / (CAST(n_all - n_src AS DOUBLE) * src_tot)))
         AS BIGINT) AS psi_e9
FROM src JOIN tot USING (bucket) JOIN st USING (source) CROSS JOIN gt
WHERE n_all - n_src > 0 AND n_src > 0
"""


@register("drift_psi_doclen", oracle=_PSI_ORACLE)
def drift_psi_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index contributions per (source, doc-length
    bucket) — the model-monitoring industry's standard drift score
    ((p-q)·ln(p/q) summed over bins; >0.25 = act), emitted per BIN so
    each ln is one per-row computation from four aggregated integers
    (the registry's no-summed-transcendentals rule; the consumer adds
    the ≤10 contributions). Completes the drift suite: chi-square
    (composition), KS (shape), TV (exact mass), PSI (the score risk
    teams actually alert on). Buckets are integer equi-width cells of
    the GLOBAL length range, so every source is measured against the
    same grid; empty-on-either-side cells are gated out exactly as the
    zero-count epsilon rule.

    Scale: one extents all-reduce broadcast onto the scan, one
    (source, bucket) combinable aggregate; the per-bucket totals
    aggregate the CELL relation (|sources| x 10 rows). No joins touch
    raw rows."""
    d = load_table(spark, sf_dir, "documents")
    ext = d.agg(F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi"))
    b = d.crossJoin(F.broadcast(ext)).select(
        "source",
        F.least(
            F.expr(f"((n_chars - lo) * {_PSI_BUCKETS}) div (hi - lo + 1)"),
            F.lit(_PSI_BUCKETS - 1),
        ).alias("bucket"),
    )
    src = b.groupBy("source", "bucket").agg(
        F.count("*").cast("long").alias("n_src")
    )
    tot = src.groupBy("bucket").agg(F.sum("n_src").cast("long").alias("n_all"))
    st = src.groupBy("source").agg(F.sum("n_src").cast("long").alias("src_tot"))
    gt = src.agg(F.sum("n_src").cast("long").alias("n"))
    return (
        src.join(F.broadcast(tot), "bucket")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(gt))
        .filter((F.col("n_all") - F.col("n_src") > 0) & (F.col("n_src") > 0))
        .select(
            "source",
            "bucket",
            "n_src",
            (F.col("n_all") - F.col("n_src")).cast("long").alias("n_rest"),
            "src_tot",
            (F.col("n") - F.col("src_tot")).cast("long").alias("rest_tot"),
            F.expr(
                "CAST(ROUND(1000000000.0"
                " * (CAST(n_src AS DOUBLE) / src_tot"
                "    - CAST(n_all - n_src AS DOUBLE) / (n - src_tot))"
                " * LN((CAST(n_src AS DOUBLE) * (n - src_tot))"
                "      / (CAST(n_all - n_src AS DOUBLE) * src_tot)))"
                " AS BIGINT)"
            ).alias("psi_e9"),
        )
    )


# ---------------------------------------------------------------------------
# Recursive (c,l)-diversity over the k-anonymity QI cells
# ---------------------------------------------------------------------------

_CL_ORACLE = """
WITH sc AS (
  SELECT c_nationkey AS nation,
         CAST(FLOOR(c_acctbal / 100) AS BIGINT) AS bal_bucket,
         c_mktsegment AS s, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer GROUP BY 1, 2, 3
),
ranked AS (
  SELECT nation, bal_bucket, cnt,
         ROW_NUMBER() OVER (PARTITION BY nation, bal_bucket
                            ORDER BY cnt DESC, s) AS rk
  FROM sc
),
cell AS (
  SELECT nation, bal_bucket,
         CAST(SUM(cnt) AS BIGINT) AS k,
         CAST(COUNT(*) AS BIGINT) AS l_distinct,
         CAST(MAX(CASE WHEN rk = 1 THEN cnt END) AS BIGINT) AS r1,
         CAST(SUM(CASE WHEN rk >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS tail2
  FROM ranked GROUP BY 1, 2
)
SELECT nation,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(k) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN r1 < 2 * tail2 THEN 1 ELSE 0 END) AS BIGINT)
         AS cells_pass_c2l2,
       CAST(SUM(CASE WHEN r1 < 3 * tail2 THEN 1 ELSE 0 END) AS BIGINT)
         AS cells_pass_c3l2,
       CAST(SUM(CASE WHEN r1 < 2 * tail2 THEN 0 ELSE k END) AS BIGINT)
         AS rows_at_risk,
       MIN(l_distinct) AS min_l
FROM cell GROUP BY 1
"""


@register("privacy_recursive_cl_diversity", oracle=_CL_ORACLE)
def privacy_recursive_cl_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive (c,l)-diversity audit (Machanavajjhala et al. 2006,
    Def. 4.3) over the same QI cells as privacy_k_anonymity_customer:
    a cell passes (c,2)-diversity when its most common sensitive value
    is rarer than c times the rest combined (r1 < c·Σ tail) — the
    skew-aware criterion that catches cells where distinct-l looks
    healthy but one segment dominates, i.e. an attacker's best guess is
    nearly certain. Completes the structural-privacy trio: k-anonymity
    (cell size), t-closeness (distribution distance), recursive
    (c,l)-diversity (within-cell skew). Pure integer
    cross-multiplications at c=2 and c=3; rows_at_risk totals the
    population in failing cells per nation.

    Scale: two nested map-side-combinable aggregates ((QI, sensitive)
    cell counts, then per-QI rank/max/sum — the rank window partitions
    by QI cell, thousands of tiny partitions); the nation roll-up
    aggregates the cell relation."""
    c = load_table(spark, sf_dir, "customer")
    sc = c.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal") / 100).cast("long").alias("bal_bucket"),
        F.col("c_mktsegment").alias("s"),
    ).agg(F.count("*").cast("long").alias("cnt"))
    w = Window.partitionBy("nation", "bal_bucket").orderBy(
        F.col("cnt").desc(), "s"
    )
    ranked = sc.withColumn("rk", F.row_number().over(w))
    cell = ranked.groupBy("nation", "bal_bucket").agg(
        F.sum("cnt").cast("long").alias("k"),
        F.count("*").cast("long").alias("l_distinct"),
        F.max(F.when(F.col("rk") == 1, F.col("cnt"))).cast("long").alias("r1"),
        F.sum(F.when(F.col("rk") >= 2, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("tail2"),
    )
    return cell.groupBy("nation").agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum("k").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("r1") < 2 * F.col("tail2"), 1).otherwise(0))
        .cast("long")
        .alias("cells_pass_c2l2"),
        F.sum(F.when(F.col("r1") < 3 * F.col("tail2"), 1).otherwise(0))
        .cast("long")
        .alias("cells_pass_c3l2"),
        F.sum(F.when(F.col("r1") < 2 * F.col("tail2"), 0).otherwise(F.col("k")))
        .cast("long")
        .alias("rows_at_risk"),
        F.min("l_distinct").cast("long").alias("min_l"),
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit across the schema's FK edges
# ---------------------------------------------------------------------------

_RI_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _ri_oracle() -> str:
    branches = "\nUNION ALL\n".join(
        f"""SELECT '{label}' AS fk_edge,
       CAST(SUM(c) AS BIGINT) AS child_rows,
       CAST(COUNT(*) AS BIGINT) AS child_keys,
       CAST(SUM(CASE WHEN hit = 0 THEN c ELSE 0 END) AS BIGINT) AS orphan_rows,
       CAST(SUM(CASE WHEN hit = 0 THEN 1 ELSE 0 END) AS BIGINT) AS orphan_keys
FROM (
  SELECT k.{ck} AS key, k.c,
         CASE WHEN p.{pk} IS NULL THEN 0 ELSE 1 END AS hit
  FROM (SELECT {ck}, CAST(COUNT(*) AS BIGINT) AS c FROM {ct} GROUP BY 1) k
  LEFT JOIN (SELECT DISTINCT {pk} FROM {pt}) p ON k.{ck} = p.{pk}
)"""
        for label, ct, ck, pt, pk in _RI_EDGES
    )
    return branches


@register("dq_referential_integrity", oracle=_ri_oracle())
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over every FK edge in the star
    schema: per edge, the child row/key volume and the exact orphan
    counts (child keys with no parent) — the first data-quality gate a
    warehouse load runs, and the validation behind the repo's merge/
    retention cascade semantics (retention_sweep_orders deletes
    children BECAUSE these edges hold). Zero orphans everywhere is the
    expected PASS on the generated data; the relation proves it
    per-edge instead of assuming it.

    Scale: each edge first collapses the child side to its KEY relation
    (map-side-combinable count), then left-joins the parent's distinct
    keys — the join carries |keys| rows, never child rows, and parent
    key sets of dimension tables broadcast. Adding an edge adds one
    two-column scan."""
    from functools import reduce

    outs = []
    for label, ct, ck, pt, pk in _RI_EDGES:
        child = load_table(spark, sf_dir, ct)
        parent = load_table(spark, sf_dir, pt)
        k = child.groupBy(F.col(ck).alias("key")).agg(
            F.count("*").cast("long").alias("c")
        )
        p = parent.select(F.col(pk).alias("pkey")).distinct()
        j = k.join(p, k.key == p.pkey, "left").select(
            "c", F.when(F.col("pkey").isNull(), 0).otherwise(1).alias("hit")
        )
        outs.append(
            j.agg(
                F.lit(label).alias("fk_edge"),
                F.sum("c").cast("long").alias("child_rows"),
                F.count("*").cast("long").alias("child_keys"),
                F.sum(F.when(F.col("hit") == 0, F.col("c")).otherwise(0))
                .cast("long")
                .alias("orphan_rows"),
                F.sum(F.when(F.col("hit") == 0, 1).otherwise(0))
                .cast("long")
                .alias("orphan_keys"),
            )
        )
    return reduce(DataFrame.unionAll, outs)


# ---------------------------------------------------------------------------
# Inter-arrival coefficient of variation per event type (point-process
# burstiness)
# ---------------------------------------------------------------------------

_IA_ORACLE = """
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
            PARTITION BY event_type, user_id ORDER BY ts, event_id))
           // 60000000 AS gap_m
  FROM events
),
m AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(gap_m) AS BIGINT) AS sum_m,
         CAST(SUM(gap_m * gap_m) AS BIGINT) AS sum_m2
  FROM g WHERE gap_m IS NOT NULL GROUP BY 1
)
SELECT event_type, n_gaps, sum_m, sum_m2,
       CAST(((CAST(n_gaps AS HUGEINT) * sum_m2 - CAST(sum_m AS HUGEINT) * sum_m)
             * 1000000000000)
            // (CAST(sum_m AS HUGEINT) * sum_m) AS BIGINT) AS var_ratio_e12,
       CAST(ROUND(SQRT(CAST(
         ((CAST(n_gaps AS HUGEINT) * sum_m2 - CAST(sum_m AS HUGEINT) * sum_m)
          * 1000000000000)
         // (CAST(sum_m AS HUGEINT) * sum_m) AS BIGINT))) AS BIGINT) AS cv_e6
FROM m
"""


@register("events_interarrival_cv", oracle=_IA_ORACLE)
def events_interarrival_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival coefficient of variation per event type — the
    point-process burstiness test (CV = 1 for Poisson arrivals, > 1
    bursty, < 1 regular), the per-STREAM complement of the per-TERM
    variance-to-mean text_term_burstiness. Gaps are consecutive
    same-user deltas floor-divided to whole MINUTES so the squared sum
    stays in BIGINT (seconds² overflowed the sf0.1 certification);
    the variance RATIO (n·s2 − s1²)·1e12 / s1² is an exact integer
    through the DECIMAL(38,0)/HUGEINT lane, small enough (< 2^53) that
    its double conversion is exact — and cv_e6 = round(sqrt(ratio))
    uses only sqrt, which IEEE rounds correctly, so unlike ln this
    float path CANNOT flap cross-engine.

    Scale: one (event_type, user_id)-partitioned lag window (small
    independent partitions), then a combinable 3-moment aggregate to
    |event types| rows."""
    e = load_table(spark, sf_dir, "events")
    g = e.select(
        "event_type",
        F.expr(
            "(unix_micros(CAST(ts AS TIMESTAMP_LTZ)) - lag(unix_micros("
            "CAST(ts AS TIMESTAMP_LTZ))) OVER ("
            "PARTITION BY event_type, user_id ORDER BY ts, event_id))"
            " div 60000000"
        ).alias("gap_m"),
    )
    m = g.filter(F.col("gap_m").isNotNull()).groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.sum("gap_m").cast("long").alias("sum_m"),
        F.sum(F.col("gap_m") * F.col("gap_m")).cast("long").alias("sum_m2"),
    )
    ratio = (
        "((CAST(n_gaps AS DECIMAL(38,0)) * sum_m2"
        " - CAST(sum_m AS DECIMAL(38,0)) * sum_m)"
        " * CAST(1000000000000 AS DECIMAL(38,0)))"
        " div (CAST(sum_m AS DECIMAL(38,0)) * sum_m)"
    )
    return m.select(
        "event_type",
        "n_gaps",
        "sum_m",
        "sum_m2",
        F.expr(f"CAST({ratio} AS BIGINT)").alias("var_ratio_e12"),
        F.expr(
            f"CAST(ROUND(SQRT(CAST({ratio} AS BIGINT))) AS BIGINT)"
        ).alias("cv_e6"),
    )


# ---------------------------------------------------------------------------
# Embedding isotropy (anisotropy score) per label
# ---------------------------------------------------------------------------

_ISO_ORACLE = """
WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT label, t.i AS d, CAST(ROUND(e[t.i] * 1000) AS BIGINT) AS qv
      FROM v, UNNEST(generate_series(1, len(e))) AS t(i)),
sd AS (SELECT label, d, CAST(SUM(qv) AS BIGINT) AS s,
              CAST(SUM(qv * qv) AS BIGINT) AS t2
       FROM q GROUP BY 1, 2),
n AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
      FROM embeddings GROUP BY 1)
SELECT sd.label, MIN(n_vecs) AS n_vecs, CAST(COUNT(*) AS BIGINT) AS dims,
       CAST(SUM(CAST(s AS HUGEINT) * s) AS BIGINT) AS mean_sq_num,
       CAST(SUM(t2) AS BIGINT) AS energy,
       CAST((1000000 * SUM(CAST(s AS HUGEINT) * s))
            // (MIN(n_vecs) * CAST(SUM(t2) AS HUGEINT)) AS BIGINT)
         AS anisotropy_ppm
FROM sd JOIN n ON sd.label = n.label GROUP BY 1
"""


@register("embedding_isotropy_by_label", oracle=_ISO_ORACLE)
def embedding_isotropy_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy score per label: |Σv|² / (n·Σ|v|²) in exact ppm over
    1e3-quantized coordinates — the Ethayarajh (2019) "embeddings
    occupy a narrow cone" diagnostic (≈ the average pairwise cosine
    for unit vectors; 0 = perfectly isotropic). High anisotropy breaks
    cosine-based dedup/ANN thresholds, so this is the calibration
    check a pipeline runs before trusting the similarity lanes. The
    numerator Σ_d S_d² rides the DECIMAL(38,0)/HUGEINT lane.

    Scale: one coordinate explode into a (label, dim) combinable
    aggregate (|labels|×dims rows — catalog-sized); the per-label
    roll-up and count join touch only that relation. Same plan family
    as embedding_dim_stats / embedding_lang_centroids."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("d", "x"),
    ).select(
        "label", "d", F.expr("CAST(ROUND(x * 1000) AS BIGINT)").alias("qv")
    )
    sd = q.groupBy("label", "d").agg(
        F.sum("qv").cast("long").alias("s"),
        F.sum(F.col("qv") * F.col("qv")).cast("long").alias("t2"),
    )
    n = emb.groupBy("label").agg(F.count("*").cast("long").alias("n_vecs"))
    return (
        sd.join(F.broadcast(n), "label")
        .groupBy("label")
        .agg(
            F.min("n_vecs").alias("n_vecs"),
            F.count("*").cast("long").alias("dims"),
            F.expr(
                "CAST(SUM(CAST(s AS DECIMAL(38,0)) * s) AS BIGINT)"
            ).alias("mean_sq_num"),
            F.sum("t2").cast("long").alias("energy"),
            F.expr(
                "CAST((1000000 * SUM(CAST(s AS DECIMAL(38,0)) * s))"
                " div (MIN(n_vecs) * CAST(SUM(t2) AS DECIMAL(38,0)))"
                " AS BIGINT)"
            ).alias("anisotropy_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Weekly autocorrelation of daily event volume per type
# ---------------------------------------------------------------------------

_AC_ORACLE = """
WITH daily AS (
  SELECT event_type, ts::DATE AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
p AS (
  SELECT a.event_type, a.c AS x, b.c AS y
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND b.d = a.d + 7
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(x) AS BIGINT) AS s_x, CAST(SUM(y) AS BIGINT) AS s_y,
       CAST(SUM(x * x) AS BIGINT) AS s_xx, CAST(SUM(y * y) AS BIGINT) AS s_yy,
       CAST(SUM(x * y) AS BIGINT) AS s_xy,
       CAST(ROUND(1000000.0 * (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
            / SQRT(CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE)
                   * CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS DOUBLE)))
         AS BIGINT) AS corr7_e6
FROM p GROUP BY 1
"""


@register("events_autocorr_weekly", oracle=_AC_ORACLE)
def events_autocorr_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-7 autocorrelation of daily event volume per type — the
    periodicity detector that tells monitoring whether weekly
    seasonality exists BEFORE the seasonal-naive baseline
    (events_seasonal_dow_anomaly) is the right comparison. Pearson r
    from exact BIGINT moments of the (day, day+7) pair relation; the
    finish divides by sqrt of exact integers — IEEE-correctly-rounded
    conversions and sqrt, no libm-dependent ops, so corr7_e6 cannot
    flap cross-engine.

    Scale: the daily roll-up collapses events map-side to ≤|days| rows
    per type; the lag join and moment aggregate touch only that
    relation."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("long").alias("c"))
    a, b = daily.alias("a"), daily.alias("b")
    p = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.d") == F.date_add(F.col("a.d"), 7)),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.c").alias("x"),
        F.col("b.c").alias("y"),
    )
    return p.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("x").cast("long").alias("s_x"),
        F.sum("y").cast("long").alias("s_y"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s_xx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("s_yy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("s_xy"),
        F.expr(
            "CAST(ROUND(1000000.0 * (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))"
            " / SQRT(CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE)"
            "        * CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS DOUBLE)))"
            " AS BIGINT)"
        ).alias("corr7_e6"),
    )


# ---------------------------------------------------------------------------
# Vocabulary-budget coverage sweep over word trigrams
# ---------------------------------------------------------------------------

_COV_BUDGETS = [500, 1000, 2000, 4000, 8000]

_COV_ORACLE = f"""
WITH w AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
g AS (
  SELECT ws[t.i] || ' ' || ws[t.i + 1] || ' ' || ws[t.i + 2] AS gram
  FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
),
tf AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS c FROM g GROUP BY 1),
r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, gram) AS rk FROM tf),
cum AS (SELECT rk, CAST(SUM(c) OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cum_c FROM r),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v
        FROM tf)
SELECT k.k AS vocab_budget, MIN(v) AS vocab_total, MIN(n) AS corpus_grams,
       CAST(MAX(CASE WHEN rk <= k.k THEN cum_c ELSE 0 END) AS BIGINT)
         AS covered_grams,
       (1000000 * CAST(MAX(CASE WHEN rk <= k.k THEN cum_c ELSE 0 END)
                       AS BIGINT)) // MIN(n) AS coverage_ppm
FROM cum, tot, (SELECT unnest({_COV_BUDGETS}) AS k) k
GROUP BY 1
"""


@register("vocab_trigram_coverage_sweep", oracle=_COV_ORACLE)
def vocab_trigram_coverage_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-budget coverage curve over word trigrams: for each
    candidate budget K, the exact fraction of corpus trigram tokens
    covered by the K most frequent types (ties broken by gram — a
    total order, so the curve is engine-agnostic). This is the
    boilerplate-detection / cache-sizing complement of
    heaps_vocab_growth (how fast the vocabulary grows) and the
    budget-planning curve a phrase-table or n-gram-LM pruning step
    reads; word UNIGRAMS would be vacuous here (31 types saturate any
    budget), trigrams give a 16k-type distribution.

    Scale: the gram count is one map-side-combinable aggregate; the
    rank and cumulative windows run over the VOCABULARY relation
    (bounded by distinct trigrams, the quality_prune_sweep precedent),
    never over corpus rows; the 5-budget probe is a constant cross
    join against the cumulative relation."""
    from db_writer_redshift_spark.functions.text import ngrams

    d = load_table(spark, sf_dir, "documents")
    # ngrams() carries the short-doc guard (ADVICE r6 #1: Spark's
    # sequence(1, 0) is [1, 0], not empty) and let-binds the word split so
    # it runs once per row instead of 4× per gram — same grams, same
    # order (round-8 optimization; the previous inline SQL re-split the
    # lowered text on every element reference of the interpreted lambda).
    g = d.select(F.explode(ngrams(F.lower(F.col("text")), 3)).alias("gram"))
    tf = g.groupBy("gram").agg(F.count("*").cast("long").alias("c"))
    r = tf.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), "gram"))
        .alias("rk"),
    )
    cum = r.select(
        "rk",
        F.sum("c")
        .over(Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum_c"),
    )
    tot = tf.agg(
        F.sum("c").cast("long").alias("n"), F.count("*").cast("long").alias("v")
    )
    ks = spark.range(0).sparkSession.createDataFrame(
        [(k,) for k in _COV_BUDGETS], "k long"
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ks))
        .groupBy(F.col("k").alias("vocab_budget"))
        .agg(
            F.min("v").alias("vocab_total"),
            F.min("n").alias("corpus_grams"),
            F.max(F.when(F.col("rk") <= F.col("k"), F.col("cum_c")).otherwise(0))
            .cast("long")
            .alias("covered_grams"),
            F.expr(
                "(1000000 * MAX(CASE WHEN rk <= k THEN cum_c ELSE 0 END))"
                " div MIN(n)"
            )
            .cast("long")
            .alias("coverage_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Trigram-cosine similarity join over part names (pg_trgm-style ER)
# ---------------------------------------------------------------------------

_TRGM_DF_CAP = 50  # drop trigrams shared by more names than this (df-cap rule)
_TRGM_COS2_NUM, _TRGM_COS2_DEN = 64, 100  # cosine^2 >= 0.64  <=>  cos >= 0.8

_TRGM_ORACLE = f"""
WITH names AS (SELECT DISTINCT lower(p_name) AS nm FROM part),
tg AS (
  SELECT nm, substr(nm, t.i, 3) AS g, CAST(COUNT(*) AS BIGINT) AS c
  FROM names, UNNEST(generate_series(1, LENGTH(nm) - 2)) AS t(i)
  GROUP BY 1, 2
),
norm AS (SELECT nm, CAST(SUM(c * c) AS BIGINT) AS n2 FROM tg GROUP BY 1),
df AS (SELECT g, COUNT(*) AS d FROM tg GROUP BY 1),
tgf AS (SELECT tg.* FROM tg JOIN df USING (g) WHERE d <= {_TRGM_DF_CAP}),
cand AS (
  SELECT a.nm AS nm_a, b.nm AS nm_b, CAST(SUM(a.c * b.c) AS BIGINT) AS dot
  FROM tgf a JOIN tgf b ON a.g = b.g AND a.nm < b.nm
  GROUP BY 1, 2
)
SELECT nm_a, nm_b, dot, na.n2 AS n2_a, nb.n2 AS n2_b
FROM cand JOIN norm na ON na.nm = cand.nm_a JOIN norm nb ON nb.nm = cand.nm_b
WHERE {_TRGM_COS2_DEN} * dot * dot >= {_TRGM_COS2_NUM} * na.n2 * nb.n2
"""


@register("er_trigram_cosine_pairs", oracle=_TRGM_ORACLE)
def er_trigram_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pg_trgm-style similarity join over part names: character-trigram
    count vectors, cosine >= 0.8 tested as the integer cross-
    multiplication 100·dot² >= 64·|a|²·|b|² — no float division
    anywhere. The trigram family catches transposition/affix variants
    ("cold widget" ~ "old widget") that the head-noun-blocked
    Levenshtein matcher (er_part_name_matches) skips when the head
    itself differs, and the inverted-index blocking differs from the
    SymSpell deletion neighborhoods of chargram_neighbor_pairs.

    Scale: pair space scales with the name VOCABULARY (distinct
    aggregate first); the candidate join is an ids-carrying inverted-
    index self-join whose hot trigrams are dropped by the df <= 50 cap
    BEFORE the join (the repo's df-cap discipline) — never all-pairs."""
    p = load_table(spark, sf_dir, "part")
    names = p.select(F.lower(F.col("p_name")).alias("nm")).distinct()
    tg = (
        names.select(
            "nm",
            F.explode(
                # Same sequence(1, 0) == [1, 0] trap as the trigram-coverage
                # query: names shorter than 3 chars must yield NO grams
                # (ADVICE r6 #1).
                F.expr(
                    "CASE WHEN length(nm) >= 3 THEN"
                    " transform(sequence(1, length(nm) - 2),"
                    " i -> substring(nm, i, 3))"
                    " ELSE cast(array() as array<string>) END"
                )
            ).alias("g"),
        )
        .groupBy("nm", "g")
        .agg(F.count("*").cast("long").alias("c"))
    )
    norm = tg.groupBy("nm").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("n2")
    )
    df_ = tg.groupBy("g").agg(F.count("*").alias("d"))
    tgf = tg.join(df_.filter(F.col("d") <= _TRGM_DF_CAP).select("g"), "g")
    a, b = tgf.alias("a"), tgf.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g")) & (F.col("a.nm") < F.col("b.nm")),
        )
        .groupBy(
            F.col("a.nm").alias("nm_a"), F.col("b.nm").alias("nm_b")
        )
        .agg(F.sum(F.col("a.c") * F.col("b.c")).cast("long").alias("dot"))
    )
    na = norm.select(F.col("nm").alias("nm_a"), F.col("n2").alias("n2_a"))
    nb = norm.select(F.col("nm").alias("nm_b"), F.col("n2").alias("n2_b"))
    return (
        cand.join(F.broadcast(na), "nm_a")
        .join(F.broadcast(nb), "nm_b")
        .filter(
            F.lit(_TRGM_COS2_DEN) * F.col("dot") * F.col("dot")
            >= F.lit(_TRGM_COS2_NUM) * F.col("n2_a") * F.col("n2_b")
        )
        .select("nm_a", "nm_b", "dot", "n2_a", "n2_b")
    )


# ---------------------------------------------------------------------------
# Portable Bloom-filter false-positive-rate audit (k sweep)
# ---------------------------------------------------------------------------

_BLOOM_M_BITS = 16384  # 2^14 cells; positions are the TOP 14 bits of the
#                        second-round 32-bit product — a power-of-two MODULUS
#                        would keep the affine low-bit structure of the ring
#                        (measured: ZERO collisions and zero FP on consecutive
#                        keys) while the high bits mix under multiplication
_BLOOM_KS = [2, 4, 6]
_BLOOM_POS = (
    "((((key * (2654435761 + 2 * i) + i * 2246822519 + 1) % 4294967296)"
    " * 1540483477) % 4294967296) div 262144"
)  # >> 18: keep top 14 of 32 bits; per-hash multiplier A+2i decorrelates
#    the k hash functions (a shared multiplier makes them affine shifts)

_BLOOM_ORACLE = f"""
WITH ks AS (SELECT unnest({_BLOOM_KS}) AS kv),
hs AS (SELECT unnest(range({max(_BLOOM_KS)})) AS i),
mem AS (SELECT c_custkey AS key FROM customer),
mpos AS (SELECT i, {_BLOOM_POS.replace('div 262144', '// 262144')} AS pos
         FROM mem, hs),
bits AS (
  SELECT kv, pos FROM (SELECT DISTINCT i, pos FROM mpos), ks WHERE i < kv
  GROUP BY 1, 2
),
probes AS (
  SELECT key + off AS key FROM mem,
       (SELECT unnest([10000000, 20000000, 30000000]) AS off)
),
ppos AS (SELECT key AS pkey, i, {_BLOOM_POS.replace('div 262144', '// 262144')} AS pos
         FROM probes, hs),
hits AS (
  SELECT ks.kv, p.pkey,
         CAST(SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS nhit
  FROM ks JOIN ppos p ON p.i < ks.kv
  LEFT JOIN bits b ON b.kv = ks.kv AND b.pos = p.pos
  GROUP BY 1, 2
),
bc AS (SELECT kv, CAST(COUNT(*) AS BIGINT) AS bits_set FROM bits GROUP BY 1),
nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members FROM mem)
SELECT h.kv AS k, MIN(n_members) AS n_members,
       CAST({_BLOOM_M_BITS} AS BIGINT) AS m_bits,
       MIN(bits_set) AS bits_set,
       CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(CASE WHEN nhit = h.kv THEN 1 ELSE 0 END) AS BIGINT)
         AS false_positives,
       (1000000 * CAST(SUM(CASE WHEN nhit = h.kv THEN 1 ELSE 0 END) AS BIGINT))
         // COUNT(*) AS fpp_ppm
FROM hits h JOIN bc ON bc.kv = h.kv CROSS JOIN nm
GROUP BY 1
"""


@register("sketch_bloom_fpp_audit", oracle=_BLOOM_ORACLE)
def sketch_bloom_fpp_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom-filter false-positive audit: build the filter over
    customer keys at k ∈ {2,4,6} hash functions (m = 2^14 cells), probe
    with three disjoint non-member key ranges, and report the measured
    FPP beside the exact fill count — the calibration run that picks k
    before trusting bloom pre-filters (decontam_bloom_prefilter) at
    scale. The filter state is an ids-only RELATION of set positions,
    so the audit is fully value-hash-oracled (the sketch_hll_registers
    trick applied to Bloom). Measured fill tracks m(1-e^{{-kn/m}})
    within ~5%; the pytest asserts the theory envelope.

    Hash design notes (measured, not theoretical): positions take the
    TOP 14 bits of a two-round 32-bit product — a power-of-two modulus
    preserves the ring's affine low-bit structure (zero collisions AND
    zero false positives on consecutive keys — a uselessly 'perfect'
    filter that would lie about production FPP), and each of the k
    functions gets its own multiplier A+2i (a shared multiplier makes
    them constant shifts of each other, collapsing k-of-k to 1-of-1).

    Scale: member positions are a row-local map + one distinct
    aggregate bounded by m; probes join the m-bounded bits relation
    (broadcastable); the per-probe hit count is map-side combinable.
    No stage touches more than (rows × k) position tuples."""
    from functools import reduce

    c = load_table(spark, sf_dir, "customer")
    mem = c.select(F.col("c_custkey").alias("key"))
    hs = spark.range(max(_BLOOM_KS)).select(F.col("id").alias("i"))
    ks = spark.createDataFrame([(k,) for k in _BLOOM_KS], "kv long")
    mpos = mem.crossJoin(F.broadcast(hs)).select(
        "i", F.expr(_BLOOM_POS).alias("pos")
    )
    bits = (
        mpos.distinct()
        .crossJoin(F.broadcast(ks))
        .filter(F.col("i") < F.col("kv"))
        .select("kv", "pos")
        .distinct()
    )
    offs = spark.createDataFrame(
        [(10_000_000,), (20_000_000,), (30_000_000,)], "off long"
    )
    probes = mem.crossJoin(F.broadcast(offs)).select(
        (F.col("key") + F.col("off")).alias("key")
    )
    ppos = probes.crossJoin(F.broadcast(hs)).select(
        F.col("key").alias("pkey"), "i", F.expr(_BLOOM_POS).alias("pos")
    )
    # hit test: left join probe positions against the (kv, pos) bit set
    j = (
        ppos.crossJoin(F.broadcast(ks))
        .filter(F.col("i") < F.col("kv"))
        .join(
            bits.withColumnRenamed("pos", "bpos").withColumnRenamed(
                "kv", "bkv"
            ),
            (F.col("kv") == F.col("bkv")) & (F.col("pos") == F.col("bpos")),
            "left",
        )
        .groupBy("kv", "pkey")
        .agg(
            F.sum(F.when(F.col("bpos").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("nhit")
        )
    )
    bc = bits.groupBy("kv").agg(F.count("*").cast("long").alias("bits_set"))
    nm = mem.agg(F.count("*").cast("long").alias("n_members"))
    return (
        j.join(F.broadcast(bc), "kv")
        .crossJoin(F.broadcast(nm))
        .groupBy(F.col("kv").alias("k"))
        .agg(
            F.min("n_members").alias("n_members"),
            F.lit(_BLOOM_M_BITS).cast("long").alias("m_bits"),
            F.min("bits_set").alias("bits_set"),
            F.count("*").cast("long").alias("n_probes"),
            F.sum(F.when(F.col("nhit") == F.col("kv"), 1).otherwise(0))
            .cast("long")
            .alias("false_positives"),
            F.expr(
                "(1000000 * SUM(CASE WHEN nhit = kv THEN 1 ELSE 0 END))"
                " div COUNT(*)"
            )
            .cast("long")
            .alias("fpp_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Offline change-point detection: best single split per event type
# ---------------------------------------------------------------------------

_BSEG_ORACLE = """
WITH daily AS (
  SELECT event_type, ts::DATE AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
pre AS (
  SELECT event_type, d, c,
         CAST(SUM(c) OVER w AS BIGINT) AS sl,
         CAST(COUNT(*) OVER w AS BIGINT) AS nl,
         CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS s,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d ROWS UNBOUNDED PRECEDING)
),
gains AS (
  SELECT event_type, d, sl, nl, s, n,
         CAST(sl * n - s * nl AS HUGEINT) AS dev,
         nl * (n - nl) AS den_part
  FROM pre WHERE nl < n
),
best AS (
  SELECT event_type, d, nl, n, sl, s,
         CAST((dev * dev * 1000000) // (CAST(den_part AS HUGEINT) * n)
              AS BIGINT) AS gain_e6,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY (dev * dev * 1000000)
                                     // (CAST(den_part AS HUGEINT) * n) DESC,
                                     d) AS rk
  FROM gains
)
SELECT event_type,
       CAST(CAST(d AS DATE) - DATE '1970-01-01' AS BIGINT) AS split_epoch_day,
       nl AS n_left, (n - nl) AS n_right,
       sl AS sum_left, (s - sl) AS sum_right,
       CAST((1000000 * sl) // nl AS BIGINT) AS mean_left_e6,
       CAST((1000000 * (s - sl)) // (n - nl) AS BIGINT) AS mean_right_e6,
       gain_e6
FROM best WHERE rk = 1
"""


@register("events_binary_segmentation", oracle=_BSEG_ORACLE)
def events_binary_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline change-point detection by binary segmentation (Scott &
    Knott 1974; the AMOC step every multi-change-point segmenter
    recurses on): per event type, the single day split of the daily
    series maximizing the exact SSE reduction, via the identity
    gain = (S_L·n − S·n_L)² / (n·n_L·n_R) — pure prefix sums, no
    per-split re-aggregation, no means materialized. The OFFLINE
    complement of the registry's online CUSUM drift statistic: CUSUM
    asks "is it drifting now", this asks "where did the level shift".
    Deviation squares ride the DECIMAL(38,0)/HUGEINT lane (count² units
    overflow int64 at extreme daily volumes); ties break on the
    earlier day.

    Scale: the daily roll-up collapses events map-side to ≤|days| rows
    per type; the prefix window, the argmax window, and the gain
    arithmetic all run on that bounded relation."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").cast("long").alias("c")
    )
    wp = Window.partitionBy("event_type")
    wcum = wp.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "event_type",
        "d",
        F.sum("c").over(wcum).cast("long").alias("sl"),
        F.count("*").over(wcum).cast("long").alias("nl"),
        F.sum("c").over(wp).cast("long").alias("s"),
        F.count("*").over(wp).cast("long").alias("n"),
    ).filter(F.col("nl") < F.col("n"))
    gain = (
        "((CAST(sl AS DECIMAL(38,0)) * n - CAST(s AS DECIMAL(38,0)) * nl)"
        " * (CAST(sl AS DECIMAL(38,0)) * n - CAST(s AS DECIMAL(38,0)) * nl)"
        " * 1000000)"
        " div (CAST(nl AS DECIMAL(38,0)) * (n - nl) * n)"
    )
    best = pre.withColumn("gain_e6", F.expr(f"CAST({gain} AS BIGINT)")).withColumn(
        "rk",
        F.row_number().over(wp.orderBy(F.col("gain_e6").desc(), "d")),
    )
    return best.filter(F.col("rk") == 1).select(
        "event_type",
        F.datediff(F.col("d"), F.lit("1970-01-01")).cast("long").alias(
            "split_epoch_day"
        ),
        F.col("nl").alias("n_left"),
        (F.col("n") - F.col("nl")).alias("n_right"),
        F.col("sl").alias("sum_left"),
        (F.col("s") - F.col("sl")).alias("sum_right"),
        F.expr("CAST((1000000 * sl) div nl AS BIGINT)").alias("mean_left_e6"),
        F.expr("CAST((1000000 * (s - sl)) div (n - nl) AS BIGINT)").alias(
            "mean_right_e6"
        ),
        "gain_e6",
    )


# ---------------------------------------------------------------------------
# Kendall tau-b between daily click and purchase volume
# ---------------------------------------------------------------------------

_TAU_ORACLE = """
WITH daily AS (
  SELECT ts::DATE AS d,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY 1
),
pairs AS (
  SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS conc,
         CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS disc,
         CASE WHEN a.x = b.x AND a.y <> b.y THEN 1 ELSE 0 END AS tie_x,
         CASE WHEN a.y = b.y AND a.x <> b.x THEN 1 ELSE 0 END AS tie_y,
         CASE WHEN a.x = b.x AND a.y = b.y THEN 1 ELSE 0 END AS tie_xy
  FROM daily a JOIN daily b ON a.d < b.d
)
SELECT CAST(SUM(conc) AS BIGINT) AS n_conc,
       CAST(SUM(disc) AS BIGINT) AS n_disc,
       CAST(SUM(tie_x) AS BIGINT) AS ties_x,
       CAST(SUM(tie_y) AS BIGINT) AS ties_y,
       CAST(SUM(tie_xy) AS BIGINT) AS ties_both,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(ROUND(1000000.0 * (SUM(conc) - SUM(disc))
            / SQRT(CAST((COUNT(*) - SUM(tie_x) - SUM(tie_xy)) AS DOUBLE)
                   * CAST((COUNT(*) - SUM(tie_y) - SUM(tie_xy)) AS DOUBLE)))
         AS BIGINT) AS tau_b_e6
FROM pairs
"""


@register("stats_kendall_tau_daily", oracle=_TAU_ORACLE)
def stats_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between daily click and purchase volume — the
    concordance-based member completing the correlation triple (Pearson
    = events_autocorr_weekly's moments, Spearman =
    stats_spearman_quality_len's midranks, Kendall = exact pair
    concordance counts with the full tie-correction denominator).
    Tau's 0.77 breakdown-point robustness and direct probabilistic
    reading (P(concordant) − P(discordant)) make it the agreement
    metric for monotone-but-nonlinear relations. Only float op: one
    sqrt of exact integers (IEEE-correctly-rounded — cannot flap).

    Scale: the daily roll-up collapses events map-side to |days| rows;
    the C(|days|,2) pair join is calendar-bounded (4k pairs per
    quarter), never event-volume-bounded."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("a.d") < F.col("b.d")).select(
        (
            F.when(
                (F.col("a.x") - F.col("b.x")) * (F.col("a.y") - F.col("b.y"))
                > 0,
                1,
            ).otherwise(0)
        ).alias("conc"),
        (
            F.when(
                (F.col("a.x") - F.col("b.x")) * (F.col("a.y") - F.col("b.y"))
                < 0,
                1,
            ).otherwise(0)
        ).alias("disc"),
        F.when(
            (F.col("a.x") == F.col("b.x")) & (F.col("a.y") != F.col("b.y")), 1
        )
        .otherwise(0)
        .alias("tie_x"),
        F.when(
            (F.col("a.y") == F.col("b.y")) & (F.col("a.x") != F.col("b.x")), 1
        )
        .otherwise(0)
        .alias("tie_y"),
        F.when(
            (F.col("a.x") == F.col("b.x")) & (F.col("a.y") == F.col("b.y")), 1
        )
        .otherwise(0)
        .alias("tie_xy"),
    )
    return pairs.agg(
        F.sum("conc").cast("long").alias("n_conc"),
        F.sum("disc").cast("long").alias("n_disc"),
        F.sum("tie_x").cast("long").alias("ties_x"),
        F.sum("tie_y").cast("long").alias("ties_y"),
        F.sum("tie_xy").cast("long").alias("ties_both"),
        F.count("*").cast("long").alias("n_pairs"),
        F.expr(
            "CAST(ROUND(1000000.0 * (SUM(conc) - SUM(disc))"
            " / SQRT(CAST((COUNT(*) - SUM(tie_x) - SUM(tie_xy)) AS DOUBLE)"
            "        * CAST((COUNT(*) - SUM(tie_y) - SUM(tie_xy)) AS DOUBLE)))"
            " AS BIGINT)"
        ).alias("tau_b_e6"),
    )


# ---------------------------------------------------------------------------
# ViT-style patch-grid statistics over REAL decoded BMP images
# ---------------------------------------------------------------------------

_PATCH_ORACLE = """
WITH base AS (
  SELECT doc_id, text, 4 + doc_id % 5 AS w, 3 + doc_id % 3 AS h
  FROM documents
),
px AS (
  SELECT doc_id, w, h,
         CASE WHEN len(text) = 0 THEN 0
              ELSE (ord(text[(t.k % len(text)) + 1]) % 256) END AS v,
         (t.k // w) AS y, (t.k % w) AS x
  FROM base, UNNEST(range(0, w * h)) AS t(k)
)
SELECT doc_id,
       CAST(CASE WHEN y >= h // 2 THEN 1 ELSE 0 END AS BIGINT) AS patch_row,
       CAST(CASE WHEN x >= w // 2 THEN 1 ELSE 0 END AS BIGINT) AS patch_col,
       CAST(COUNT(*) AS BIGINT) AS n_px,
       CAST(SUM(v) AS BIGINT) AS gray_sum,
       CAST((1000000 * CAST(SUM(v) AS BIGINT)) // COUNT(*) AS BIGINT)
         AS gray_mean_e6
FROM px GROUP BY 1, 2, 3
"""


@register("multimodal_patch_grid", oracle=_PATCH_ORACLE)
def multimodal_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patch preprocessing end-to-end on REAL bytes: synthesize
    a well-formed 24-bit BMP per document, decode the actual pixel array
    back to image orientation (the BMP bottom-up flip the order-free
    channel sums never needed), cut a 2×2 tile grid with floor
    boundaries, and emit exact per-tile gray sums/means — the
    decode → orient → tile → reduce shape of patch-embedding pipelines,
    with the projection left to the model. The oracle computes every
    tile statistic from the construction alone, so a hash match proves
    the encoder, the decoder AND the orientation/tiling arithmetic agree
    byte-for-byte — a stricter contract than the whole-image sums,
    because a vertical flip or a transposed tile boundary changes tile
    sums while leaving image totals untouched.

    Scale: two iterator mapInPandas stages (batch-bounded, no shuffle);
    grid² = 4 scalar rows per image regardless of resolution."""
    from db_writer_redshift_spark.operators import multimodal as mm

    docs = load_table(spark, sf_dir, "documents")
    media = mm.synthesize_bmp_media(docs, "doc_id", "text")
    return mm.extract_patch_features(media, grid=2)


# ---------------------------------------------------------------------------
# Link prediction: neighbor-set Jaccard over the co-purchase graph
# ---------------------------------------------------------------------------

_LP_MIN_COMMON = 2

_LP_ORACLE = f"""
WITH eraw AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
e AS MATERIALIZED (SELECT u, v FROM eraw GROUP BY u, v HAVING COUNT(*) >= 2),
adj AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1),
wedge AS (
  SELECT w1.b AS x, w2.b AS y, CAST(COUNT(*) AS BIGINT) AS common
  FROM adj w1 JOIN adj w2 ON w1.a = w2.a AND w1.b < w2.b
  GROUP BY 1, 2
),
nonadj AS (
  SELECT w.x, w.y, w.common FROM wedge w
  LEFT JOIN e ON e.u = w.x AND e.v = w.y
  WHERE e.u IS NULL AND w.common >= {_LP_MIN_COMMON}
)
SELECT n.x AS node_a, n.y AS node_b, n.common,
       (dx.d + dy.d - n.common) AS n_union,
       CAST((1000000 * n.common) // (dx.d + dy.d - n.common) AS BIGINT)
         AS jaccard_ppm
FROM nonadj n JOIN deg dx ON dx.node = n.x JOIN deg dy ON dy.node = n.y
"""


@register("graph_link_prediction_jaccard", oracle=_LP_ORACLE)
def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood Jaccard (Liben-Nowell & Kleinberg
    2003): for NON-adjacent part pairs of the weight>=2 co-purchase
    graph sharing >= 2 common neighbors, the exact ppm Jaccard
    |N(a)∩N(b)| / |N(a)∪N(b)| — the "you two should be bundled"
    recommendation score, and the missing-edge complement of the
    registry's triangle/truss/core family (those score EXISTING
    structure; this ranks edges that don't exist yet).

    Common-neighbor counts come from the wedge aggregate (every pair
    with a common neighbor appears once per shared center), adjacency is
    removed by an anti-join against the edge list, and the union size is
    deg(a) + deg(b) − common — no neighbor sets ever materialize per
    pair.

    Scale: the wedge aggregate is the triangle-counting volume (one
    combinable shuffle over wedges); the >= 2 common-neighbor gate
    bounds the output; degrees broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("wt"))
        .filter(F.col("wt") >= 2)
        .select("u", "v")
        .localCheckpoint(eager=True)
    )
    adj = e.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        e.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    deg = adj.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("long").alias("d")
    )
    w1, w2 = adj.alias("w1"), adj.alias("w2")
    wedge = (
        w1.join(
            w2,
            (F.col("w1.a") == F.col("w2.a")) & (F.col("w1.b") < F.col("w2.b")),
        )
        .groupBy(F.col("w1.b").alias("x"), F.col("w2.b").alias("y"))
        .agg(F.count("*").cast("long").alias("common"))
        .filter(F.col("common") >= _LP_MIN_COMMON)
    )
    nonadj = wedge.join(
        e, (F.col("u") == F.col("x")) & (F.col("v") == F.col("y")), "anti"
    )
    dx = deg.select(F.col("node").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("node").alias("y"), F.col("d").alias("dy"))
    return (
        nonadj.join(F.broadcast(dx), "x")
        .join(F.broadcast(dy), "y")
        .select(
            F.col("x").alias("node_a"),
            F.col("y").alias("node_b"),
            "common",
            (F.col("dx") + F.col("dy") - F.col("common"))
            .cast("long")
            .alias("n_union"),
            F.expr("CAST((1000000 * common) div (dx + dy - common) AS BIGINT)").alias(
                "jaccard_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Robust (median/MAD) daily-volume anomaly audit per event type
# ---------------------------------------------------------------------------

_MAD_TH = 2965  # 1000 * 2 * 1.4826 — the 2-sigma-equivalent robust gate

_MAD_ORACLE = f"""
WITH daily AS (
  SELECT event_type, ts::DATE AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
r1 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c, d) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM daily
),
med AS (SELECT event_type, c AS med FROM r1 WHERE rk = (n + 1) // 2),
dev AS (
  SELECT d.event_type, d.d, d.c, m.med, ABS(d.c - m.med) AS ad
  FROM daily d JOIN med m USING (event_type)
),
r2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ad, d) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM dev
),
mad AS (SELECT event_type, ad AS mad FROM r2 WHERE rk = (n + 1) // 2)
SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       MIN(d.med) AS median_daily, MIN(mad.mad) AS mad,
       CAST(SUM(CASE WHEN 1000 * d.ad > {_MAD_TH} * mad.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
       CAST(MAX(CASE WHEN 1000 * d.ad > {_MAD_TH} * mad.mad
                     THEN d.ad ELSE 0 END) AS BIGINT) AS worst_abs_dev
FROM dev d JOIN mad USING (event_type)
GROUP BY 1
"""


@register("events_robust_anomaly_mad", oracle=_MAD_ORACLE)
def events_robust_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume anomaly audit: days whose deviation from
    their type's MEDIAN exceeds 2 robust sigmas (1000·|c−med| >
    2965·MAD, the integer form of 2·1.4826·MAD) — the Hampel/MAD
    outlier rule. The registry's z-score query breaks down exactly when
    it matters (an outlier inflates the mean AND the std it is judged
    against, masking itself); median and MAD have 50% breakdown, so the
    gate stays honest through bursts. Lower medians come from rank
    selection on the BOUNDED daily relation (value at rank ⌈n/2⌉ — ties
    in the order can permute rows but never change the selected value),
    keeping every statistic an exact BIGINT.

    Scale: the daily roll-up collapses events map-side to ≤|days| rows
    per type; both rank windows and the final rollup run on that
    relation (the per-type partitions are calendar-sized)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").cast("long").alias("c")
    )
    wp = Window.partitionBy("event_type")
    r1 = daily.select(
        "*",
        F.row_number().over(wp.orderBy("c", "d")).alias("rk"),
        F.count("*").over(wp).cast("long").alias("n"),
    )
    med = r1.filter(F.col("rk") == F.expr("(n + 1) div 2")).select(
        "event_type", F.col("c").alias("med")
    )
    dev = daily.join(med, "event_type").select(
        "event_type",
        "d",
        "c",
        "med",
        F.abs(F.col("c") - F.col("med")).alias("ad"),
    )
    r2 = dev.select(
        "*",
        F.row_number().over(wp.orderBy("ad", "d")).alias("rk"),
        F.count("*").over(wp).cast("long").alias("n"),
    )
    mad = r2.filter(F.col("rk") == F.expr("(n + 1) div 2")).select(
        "event_type", F.col("ad").alias("mad")
    )
    flag = F.lit(1000) * F.col("ad") > F.lit(_MAD_TH) * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.min("med").alias("median_daily"),
            F.min("mad").alias("mad"),
            F.sum(F.when(flag, 1).otherwise(0)).cast("long").alias("n_anomalies"),
            F.max(F.when(flag, F.col("ad")).otherwise(0))
            .cast("long")
            .alias("worst_abs_dev"),
        )
    )


# ---------------------------------------------------------------------------
# Distribution-free median confidence interval via order statistics
# ---------------------------------------------------------------------------

_Z95 = 1.959963984540054


def _median_ci_oracle() -> str:
    return f"""
WITH o AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM o),
ranks AS (
  SELECT n,
         (n + 1) // 2 AS rank_med,
         (n + 1) // 2 - CAST(CEIL({_Z95} * SQRT(n) / 2) AS BIGINT) AS rank_lo,
         (n + 1) // 2 + CAST(CEIL({_Z95} * SQRT(n) / 2) AS BIGINT) AS rank_hi
  FROM nn
),
r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rk FROM o)
SELECT ranks.n, ranks.rank_lo, ranks.rank_hi,
       MIN(CASE WHEN rk = rank_lo THEN cents END) AS ci_lo_cents,
       MIN(CASE WHEN rk = rank_med THEN cents END) AS median_cents,
       MIN(CASE WHEN rk = rank_hi THEN cents END) AS ci_hi_cents
FROM r, ranks
GROUP BY 1, 2, 3
"""


@register("stats_median_ci_orderstat", oracle=_median_ci_oracle())
def stats_median_ci_orderstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the median of order
    value via the binomial order-statistic bound (ranks (n+1)/2 ±
    ⌈z·√n/2⌉ — the nonparametric CI that needs no normality and no
    resampling; the rank arithmetic is IEEE-deterministic because √ is
    correctly rounded). The Spark side selects all three order
    statistics with the SHARED distributed-quickselect rounds
    (selection.kths_smallest_multi: one (range, bucket) aggregate per
    round advances every target — no global sort, ~5 jobs total); the
    oracle's ROW_NUMBER form is the test-scale twin, exactly like
    exact_quantiles_order_price.

    Scale: quickselect cost is a handful of map-side-combined histogram
    aggregates over the persisted integer column, independent of how
    many ranks are requested — the same operator the equi-depth
    histogram and robust-stats queries ride."""
    import math as _math

    from db_writer_redshift_spark.operators.selection import kths_smallest_multi

    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents")
    )
    n = o.count()
    half = _math.ceil(_Z95 * _math.sqrt(n) / 2)
    rank_med = (n + 1) // 2
    rank_lo, rank_hi = rank_med - half, rank_med + half
    lo, med, hi = kths_smallest_multi(o, "cents", [rank_lo, rank_med, rank_hi])
    return spark.createDataFrame(
        [(n, rank_lo, rank_hi, lo, med, hi)],
        "n long, rank_lo long, rank_hi long, ci_lo_cents long,"
        " median_cents long, ci_hi_cents long",
    )


# ---------------------------------------------------------------------------
# Lorenz curve / spend-concentration deciles over customers
# ---------------------------------------------------------------------------

_LORENZ_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
r AS (
  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rk,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(SUM(cents) OVER () AS BIGINT) AS tot
  FROM cust
),
d AS (SELECT LEAST(((rk - 1) * 10) // n, 9) AS decile, cents, n, tot FROM r)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS spend_cents,
       CAST((1000000 * CAST(SUM(cents) AS HUGEINT)) // MIN(tot) AS BIGINT)
         AS share_ppm,
       CAST((1000000 * SUM(CAST(SUM(cents) AS HUGEINT))
             OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)) // MIN(tot)
            AS BIGINT) AS cum_share_ppm
FROM d GROUP BY 1
"""


@register("inequality_lorenz_deciles", oracle=_LORENZ_ORACLE)
def inequality_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer spend concentration by decile — the
    whale-dependence profile (bottom decile ~4% of revenue, top ~17% at
    sf0.01) behind Gini/Pareto revenue-risk analysis; cum_share_ppm IS
    the Lorenz curve, and the consumer gets a trapezoid Gini from the
    10 exact points. Deciles come from a rank over the per-customer
    aggregate with (cents, custkey) total order — the ccnet_logprob_
    buckets NTILE precedent: the window runs over the CUSTOMER relation
    (already collapsed map-side from orders), and at 100 TB the same
    relation swaps to quickselect decile boundaries with partial-group
    arithmetic (the hist_equidepth machinery) without changing the
    output contract.

    All integer: spend sums in exact cents, shares floor-ppm, the
    cumulative window over 10 decile rows."""
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.expr("CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)")
        .alias("cents")
    )
    w = Window.orderBy("cents", "o_custkey")
    r = cust.select(
        "cents",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
        F.sum("cents").over(Window.partitionBy()).cast("long").alias("tot"),
    )
    d = r.select(
        F.least(F.expr("((rk - 1) * 10) div n"), F.lit(9)).alias("decile"),
        "cents",
        "tot",
    )
    agg = d.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("spend_cents"),
        F.min("tot").alias("__tot"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return agg.select(
        "decile",
        "n_customers",
        "spend_cents",
        F.expr(
            "CAST((1000000 * CAST(spend_cents AS DECIMAL(38,0))) div __tot"
            " AS BIGINT)"
        ).alias("share_ppm"),
        F.expr(
            "CAST((1000000 * CAST(SUM(spend_cents) OVER"
            " (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND"
            " CURRENT ROW) AS DECIMAL(38,0))) div __tot AS BIGINT)"
        ).alias("cum_share_ppm"),
    )


# ---------------------------------------------------------------------------
# Markov stationary distribution of the user-journey chain
# ---------------------------------------------------------------------------

_MK_ROUNDS = 8
_MK_SCALE = 10**9


def _markov_oracle() -> str:
    ctes = [
        """trans AS MATERIALIZED (
  SELECT prev, nxt, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(COUNT(*)) OVER (PARTITION BY prev) AS BIGINT) AS t
  FROM (
    SELECT event_type AS prev,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
    FROM events
  ) WHERE nxt IS NOT NULL GROUP BY prev, nxt
)""",
        f"""v0 AS (
  SELECT prev AS state, CAST({_MK_SCALE} // 5 AS BIGINT) AS m
  FROM trans GROUP BY prev
)""",
    ]
    for r in range(1, _MK_ROUNDS + 1):
        ctes.append(
            f"""v{r} AS MATERIALIZED (
  SELECT t.nxt AS state, CAST(SUM((v.m * t.c) // t.t) AS BIGINT) AS m
  FROM v{r - 1} v JOIN trans t ON t.prev = v.state
  GROUP BY t.nxt
)"""
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, state, m AS mass_e9 FROM v{r}"
        for r in range(_MK_ROUNDS + 1)
    )
    return f"WITH {','.join(ctes)}\n{sel}"


@register("events_markov_stationary", oracle=_markov_oracle())
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-journey Markov chain by
    power iteration: 8 rounds of v·P from the uniform start over the
    |event types|-state transition matrix (the long-run where-do-users-
    spend-time vector the transition MATRIX alone doesn't give), every
    multiply floor-scaled at e9 so the whole trajectory is exact
    integers — the pagerank_int discipline on the behavioral chain,
    convergence visible as near-equal trailing rounds.

    Scale: the transition counts are one lag-window + combinable
    aggregate (the events_transition_matrix plan); the chain itself is
    |states|² = 25 cells, so iteration state is driver-sized by
    construction (exact Python ints — the stats_anova driver-state
    precedent; the 100 TB cost is the count pass, not the
    fixed-point)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("prev"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("prev", "nxt")
        .agg(F.count("*").cast("long").alias("c"))
        .collect()
    )
    c = {(r["prev"], r["nxt"]): r["c"] for r in trans}
    t: dict[str, int] = {}
    for (p, _), n in c.items():
        t[p] = t.get(p, 0) + n
    # Row-set parity with the oracle on degenerate chains (ADVICE r6 #3):
    # round 0 carries exactly the states seen as `prev` (the oracle's v0);
    # round r carries exactly the states with an incoming edge from a
    # state PRESENT in round r-1 (the oracle's GROUP BY t.nxt over
    # v_{r-1} ⋈ trans). A state appearing only as `nxt` (absorbing sink)
    # therefore enters at round 1 and contributes nothing onward (no
    # outgoing edges), and a `prev` state never reached as `nxt` drops
    # out after round 0 — no zero-mass phantom rows on either side.
    v = {s: _MK_SCALE // 5 for s in sorted(t)}
    rows = [(0, s, m) for s, m in sorted(v.items())]
    for rnd in range(1, _MK_ROUNDS + 1):
        nv: dict[str, int] = {}
        for (i, j), cij in c.items():
            if i in v:
                nv[j] = nv.get(j, 0) + (v[i] * cij) // t[i]
        v = nv
        rows.extend((rnd, s, m) for s, m in sorted(v.items()))
    return spark.createDataFrame(
        rows, "round long, state string, mass_e9 long"
    )


# ---------------------------------------------------------------------------
# Forecast-baseline evaluation by exact pinball loss
# ---------------------------------------------------------------------------

_PINBALL_ORACLE = """
WITH daily AS (
  SELECT event_type, ts::DATE AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c, d) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM daily
),
med AS (SELECT event_type, c AS med FROM r WHERE rk = (n + 1) // 2),
fc AS (
  SELECT d.event_type, d.d, d.c,
         m.med AS f_median,
         LAG(d.c, 7) OVER (PARTITION BY d.event_type ORDER BY d.d) AS f_snaive
  FROM daily d JOIN med m USING (event_type)
),
sc AS (
  SELECT event_type, 'median_const' AS model, c, f_median AS f FROM fc
  UNION ALL
  SELECT event_type, 'seasonal_naive', c, f_snaive FROM fc
  WHERE f_snaive IS NOT NULL
)
SELECT event_type, model, CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(CASE WHEN c >= f THEN 5 * (c - f) ELSE 5 * (f - c) END)
            AS BIGINT) AS pinball50_x10,
       CAST(SUM(CASE WHEN c >= f THEN 9 * (c - f) ELSE 1 * (f - c) END)
            AS BIGINT) AS pinball90_x10,
       CAST(SUM(ABS(c - f)) AS BIGINT) AS abs_err
FROM sc GROUP BY 1, 2
"""


@register("forecast_pinball_baselines", oracle=_PINBALL_ORACLE)
def forecast_pinball_baselines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline evaluation by exact pinball (quantile) loss —
    the metric quantile forecasts are scored with (M5/M4 competitions):
    for each event type, the constant-median and seasonal-naive (lag-7)
    baselines scored at q=0.5 and q=0.9 over daily volume, loss kept in
    exact x10 integers (q·(y−f)⁺ + (1−q)·(f−y)⁺ scaled by 10). Before
    any model ships, a forecasting pipeline must beat BOTH of these
    floors; the relation is that gate. The q=0.9 column shows the
    asymmetry the symmetric MAE (also emitted) hides — under-forecasts
    cost 9x over-forecasts.

    Scale: daily roll-up collapses events map-side; the median comes
    from rank selection on the bounded relation (events_robust_anomaly_
    mad's rule); the lag-7 window and the loss rollup run per type on
    calendar-sized partitions."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").cast("long").alias("c")
    )
    wp = Window.partitionBy("event_type")
    r = daily.select(
        "*",
        F.row_number().over(wp.orderBy("c", "d")).alias("rk"),
        F.count("*").over(wp).cast("long").alias("n"),
    )
    med = r.filter(F.col("rk") == F.expr("(n + 1) div 2")).select(
        "event_type", F.col("c").alias("med")
    )
    fc = daily.join(F.broadcast(med), "event_type").select(
        "event_type",
        "d",
        "c",
        F.col("med").alias("f_median"),
        F.lag("c", 7).over(wp.orderBy("d")).alias("f_snaive"),
    )
    sc = fc.select(
        "event_type",
        F.lit("median_const").alias("model"),
        "c",
        F.col("f_median").alias("f"),
    ).unionAll(
        fc.filter(F.col("f_snaive").isNotNull()).select(
            "event_type",
            F.lit("seasonal_naive").alias("model"),
            "c",
            F.col("f_snaive").alias("f"),
        )
    )
    up, dn = F.col("c") >= F.col("f"), F.col("c") < F.col("f")
    return sc.groupBy("event_type", "model").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum(
            F.when(up, 5 * (F.col("c") - F.col("f"))).otherwise(
                5 * (F.col("f") - F.col("c"))
            )
        )
        .cast("long")
        .alias("pinball50_x10"),
        F.sum(
            F.when(up, 9 * (F.col("c") - F.col("f"))).otherwise(
                F.col("f") - F.col("c")
            )
        )
        .cast("long")
        .alias("pinball90_x10"),
        F.sum(F.abs(F.col("c") - F.col("f"))).cast("long").alias("abs_err"),
    )
