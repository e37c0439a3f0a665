"""Training-data pipeline operators, batch 2: deterministic sampling,
vocabulary statistics, and graph-based dedup clustering.

No counterpart in the reference (keboola/db-writer-redshift is a load-only
control plane — SURVEY.md §2.4); these are the corpus-curation operations a
100 TB training-data pipeline runs after ingest.

Sampling is HASH-based, not seed-based (`df.sample`/`sampleBy`): a
multiplicative Knuth hash of the key column decides membership, so the
sample is (a) reproducible across runs, engines, and restarts, (b)
independent of partitioning and row order, and (c) pushable — the
predicate evaluates inside the scan with no shuffle and no driver state.
Seed-based sampling has none of these properties on a cluster, which is
why it cannot be oracle-checked and hash sampling can.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from db_writer_redshift_spark.operators import dedup
from db_writer_redshift_spark.plans.registry import load_table, register

# Knuth multiplicative hash over a 32-bit ring: exact in BIGINT arithmetic
# on every engine (doc_id * A fits int64 for doc_id < 4.3e9; the driver
# fixtures stay far below that — at larger key ranges swap in the 64-bit
# constant and a 2^61 ring).
_A = 2654435761
_RING = 4294967296  # 2^32


def _hash_bucket(key: str):
    return (F.col(key) * F.lit(_A)) % F.lit(_RING)


@register(
    "sample_hash_documents",
    oracle=f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE (doc_id * {_A}) % {_RING} < {int(0.10 * _RING)}
""",
)
def sample_hash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% document sample by multiplicative key hash.

    Scale: the predicate is pure row-local arithmetic — it evaluates in
    the scan stage (whole-stage codegen, no shuffle, no driver
    coordination), and the SAME rows are selected regardless of cluster
    size, partition layout, or retry/restart. This is the
    training-corpus subsampling primitive; `df.sample(seed=)` guarantees
    none of that under re-partitioning."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(_hash_bucket("doc_id") < int(0.10 * _RING)).select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "sample_stratified_by_lang",
    oracle=f"""
SELECT lang,
       COUNT(*) AS n_docs,
       COUNT(CASE WHEN (doc_id * {_A}) % {_RING} <
                  CASE WHEN lang = 'en' THEN {int(0.10 * _RING)} ELSE {int(0.40 * _RING)} END
             THEN 1 END) AS n_sampled
FROM documents
GROUP BY lang
""",
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language keep rates (10% for
    the dominant 'en' stratum, 40% for the tail languages — the standard
    rebalancing move for a multilingual training mix), reported as
    per-stratum totals. The equivalent of `df.sampleBy`, but reproducible
    and engine-independent.

    Scale: the stratum rate is a row-local CASE over the same scan-stage
    hash — adding strata costs nothing; the aggregate is a 5-row
    map-side-combined groupBy."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", int(0.10 * _RING)).otherwise(
        int(0.40 * _RING)
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(_hash_bucket("doc_id") < rate, 1)).alias("n_sampled"),
    )


@register(
    "sample_rebalance_uniform",
    oracle=f"""
WITH counts AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
m AS (SELECT MIN(n_docs) AS min_docs FROM counts),
thr AS (SELECT lang, n_docs, (min_docs * {_RING}) // n_docs AS thr FROM counts, m)
SELECT t.lang, t.n_docs,
       COUNT(CASE WHEN (d.doc_id * {_A}) % {_RING} < t.thr THEN 1 END) AS n_sampled
FROM documents d JOIN thr t ON d.lang = t.lang
GROUP BY t.lang, t.n_docs
""",
)
def sample_rebalance_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rebalancing with DATA-DERIVED rates: down-sample every
    stratum to the size of the smallest one (uniform training mix), the
    per-stratum keep-rate computed from the corpus itself rather than
    hardcoded. rate_s = min_count / count_s, applied through the same
    scan-stage Knuth-hash predicate as the other sampling ops.

    Scale: pass 1 is a map-side-combined count per stratum (output =
    #strata rows, metadata-sized); the rate table broadcasts back onto
    the corpus scan, so pass 2 is again a row-local predicate — no
    shuffle of the 100 TB side in either pass. The threshold uses integer
    `div` so both engines floor identically — no float rate rounding."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    m = counts.agg(F.min("n_docs").alias("min_docs"))
    rates = counts.crossJoin(F.broadcast(m)).withColumn(
        "thr", F.expr(f"min_docs * {_RING} div n_docs")
    )
    return (
        d.join(F.broadcast(rates.select("lang", "n_docs", "thr")), "lang")
        .groupBy("lang", "n_docs")
        .agg(
            F.count(F.when(_hash_bucket("doc_id") < F.col("thr"), 1)).alias(
                "n_sampled"
            )
        )
    )


@register(
    "vocab_topk_terms",
    oracle="""
SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY tf DESC, token
LIMIT 50
""",
)
def vocab_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head: top-50 whitespace tokens by corpus frequency, with
    document frequency — the first step of tokenizer/vocab induction over
    a training corpus.

    Scale: explode fans out ~tokens-per-doc × rows, but the partial
    aggregate collapses it map-side before the single shuffle on token;
    the (tf DESC, token) total order executes as a 50-row TakeOrdered, no
    global sort. Skewed head tokens are exactly what the partial
    aggregate absorbs."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    return (
        tok.groupBy("token")
        .agg(F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.col("tf").desc(), "token")
        .limit(50)
    )


# The exact near-dup pair relation (word-3-gram Jaccard ≥ 0.05 with a
# document-frequency cap) — same definition as dedup_shingle_jaccard's
# oracle in plans/llm_ops.py, reduced to the pair columns.
_PAIRS_SQL = """
  WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
  grams AS (
    SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
    FROM docs, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
    WHERE len(w) >= 3
  ),
  rare AS (
    SELECT g.doc_id, g.sh FROM grams g
    JOIN (SELECT sh, COUNT(*) AS dfc FROM grams GROUP BY sh HAVING COUNT(*) <= 100) f
    ON g.sh = f.sh
  ),
  counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM rare GROUP BY doc_id),
  p0 AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
  )
  SELECT doc_a, doc_b
  FROM p0 JOIN counts ca ON ca.doc_id = doc_a JOIN counts cb ON cb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common) >= 0.05
"""


@register(
    "dedup_cc_clusters",
    oracle=f"""
WITH RECURSIVE pairs AS ({_PAIRS_SQL}),
e AS (SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM e
  UNION
  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
)
SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_root
FROM reach GROUP BY u
""",
)
def dedup_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components clustering of the exact near-dup pair graph:
    every document in a duplicate cluster labeled with the cluster's
    minimum doc_id (then keep one representative per root to dedup).

    Spark side runs hash-min label propagation — the BSP superstep
    pattern GraphX/GraphFrames use — over the bidirected edge list:
    each round every node takes the min of its own and its neighbors'
    labels, until a fixpoint. Rounds ≈ graph diameter (near-dup clusters
    are shallow; the fixture converges in 1-2 rounds). The oracle computes
    the same roots via transitive closure in a recursive CTE — feasible
    only at oracle scale; the iterative form is the one that scales.

    Scale: each superstep is one shuffle (edges ⋈ labels on the 2|E|
    edge list, then min-combine per node); `localCheckpoint` truncates
    the growing lineage each round so the plan doesn't re-execute prior
    supersteps; the driver sees only the per-round changed-count."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.shingle_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.05, max_doc_freq=100
    ).select("doc_a", "doc_b")
    return dedup.connected_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster_root"
    )


_TRAIN_THR = int(0.80 * _RING)
_VAL_THR = int(0.90 * _RING)
_SPLIT_CASE = (
    f"CASE WHEN ({{c}} * {_A}) % {_RING} < {_TRAIN_THR} THEN 'train' "
    f"WHEN ({{c}} * {_A}) % {_RING} < {_VAL_THR} THEN 'val' "
    f"ELSE 'test' END"
)


@register(
    "split_leakage_audit",
    oracle=f"""
WITH pairs AS ({_PAIRS_SQL}),
lab AS (
  SELECT {_SPLIT_CASE.format(c="doc_a")} AS sa,
         {_SPLIT_CASE.format(c="doc_b")} AS sb
  FROM pairs
)
SELECT LEAST(sa, sb) AS split_lo, GREATEST(sa, sb) AS split_hi,
       COUNT(*) AS n_pairs
FROM lab
GROUP BY split_lo, split_hi
""",
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test leakage audit: assign every document to a split by
    the deterministic Knuth-hash (80/10/10), then count near-dup pairs
    (word-3-gram Jaccard ≥ 0.05 — the dedup_shingle_jaccard relation) by
    the split pair they land in. Off-diagonal rows (split_lo ≠ split_hi)
    are evaluation leakage — near-duplicates of training documents
    sitting in val/test — the audit run after dedup in any serious
    pipeline.

    Scale: the split label is pure row-local arithmetic on the pair
    columns (same scan-stage hash as the sampling ops — NO join against
    an assignment table), so the audit adds only a 6-group map-side-
    combined aggregate on top of the pair relation's cost."""

    def split_of(c: str):
        b = (F.col(c) * F.lit(_A)) % F.lit(_RING)
        return (
            F.when(b < _TRAIN_THR, F.lit("train"))
            .when(b < _VAL_THR, F.lit("val"))
            .otherwise(F.lit("test"))
        )

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.shingle_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.05, max_doc_freq=100
    ).select(split_of("doc_a").alias("sa"), split_of("doc_b").alias("sb"))
    return pairs.select(
        F.least("sa", "sb").alias("split_lo"),
        F.greatest("sa", "sb").alias("split_hi"),
    ).groupBy("split_lo", "split_hi").agg(F.count("*").alias("n_pairs"))


@register(
    "sample_weighted_priority",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         ROUND(LN(CAST((doc_id * {_A}) % {_RING} + 1 AS DOUBLE) / {_RING + 1})
               / n_chars, 9) AS priority_key
  FROM documents
)
SELECT doc_id, lang, n_chars, priority_key
FROM keyed
ORDER BY priority_key DESC, doc_id
LIMIT 50
""",
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each doc gets priority u^(1/w) for a
    hash-derived uniform u and weight w (here n_chars — longer docs more
    likely kept); the global top-k by priority IS a weighted sample
    without replacement. Computed in the log domain (ln(u)/w — the same
    monotone order, no underflow for huge weights), rounded to 9 so the
    libm ln difference surface can't flip ranks across engines.

    Scale: the priority key is scan-stage row-local arithmetic (same
    Knuth-hash uniform as the other sampling ops — reproducible across
    partitionings/restarts); the top-k executes as a distributed
    TakeOrdered (per-partition heads, driver merges k rows) — no global
    sort, no shuffle of the corpus."""
    d = load_table(spark, sf_dir, "documents")
    u = ((F.col("doc_id") * _A) % _RING + 1).cast("double") / F.lit(float(_RING + 1))
    key = F.round(F.log(u) / F.col("n_chars"), 9)
    return (
        d.select("doc_id", "lang", "n_chars", key.alias("priority_key"))
        .orderBy(F.col("priority_key").desc(), "doc_id")
        .limit(50)
    )


@register(
    "sample_weighted_per_lang",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         ROUND(LN(CAST((doc_id * {_A}) % {_RING} + 1 AS DOUBLE) / {_RING + 1})
               / n_chars, 9) AS priority_key
  FROM documents
),
ranked AS (
  SELECT doc_id, lang, n_chars, priority_key,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY priority_key DESC, doc_id) AS rk
  FROM keyed
)
SELECT doc_id, lang, n_chars, priority_key, rk
FROM ranked WHERE rk <= 10
""",
)
def sample_weighted_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified weighted sampling: the Efraimidis-Spirakis priority key
    of sample_weighted_priority, but ranked WITHIN each language stratum
    (top-10 per lang) — the balanced multilingual-mix builder where
    within-stratum selection is still length-weighted.

    Scale: same scan-stage row-local key; the per-stratum top-k runs as
    a rank window with WindowGroupLimit pushdown (per-partition top-10
    before the lang shuffle), so the shuffle carries ≤10 rows per lang
    per map partition — never the corpus."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    u = ((F.col("doc_id") * _A) % _RING + 1).cast("double") / F.lit(float(_RING + 1))
    keyed = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(F.log(u) / F.col("n_chars"), 9).alias("priority_key"),
    )
    w = Window.partitionBy("lang").orderBy(F.col("priority_key").desc(), "doc_id")
    return keyed.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 10)


def _pagerank_oracle(iterations: int = 3) -> str:
    """Unrolled-CTE DuckDB twin of the integer PageRank iterations:
    identical floor-division update per round, so every rank value is
    bit-identical to the operator's (operators/pagerank.py)."""
    parts = [
        """
WITH e AS (
  SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
  UNION ALL
  SELECT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst FROM lineitem
),
nodes AS (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e),
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes)"""
    ]
    for i in range(iterations):
        parts.append(
            f""",
inc{i} AS (
  SELECT e.dst AS node, SUM(r{i}.rank_micro // deg.deg) AS s
  FROM e JOIN r{i} ON r{i}.node = e.src JOIN deg ON deg.src = e.src
  GROUP BY e.dst
),
r{i + 1} AS (
  SELECT n.node,
         CAST(150000 + (85 * COALESCE(inc{i}.s, 0)) // 100 AS BIGINT) AS rank_micro
  FROM nodes n LEFT JOIN inc{i} ON inc{i}.node = n.node
)"""
        )
    parts.append(
        f"""
SELECT node, rank_micro,
       ROW_NUMBER() OVER (ORDER BY rank_micro DESC, node) AS rank_pos
FROM r{iterations}
QUALIFY rank_pos <= 100
"""
    )
    return "".join(parts)


@register("pagerank_part_supplier", oracle=_pagerank_oracle())
def pagerank_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank (operators/pagerank.py) over the symmetric
    part<->supplier co-occurrence graph from lineitem, top-100 nodes.
    Floating PageRank is partition-order-dependent at the last ulp;
    keeping ranks in integer micro-units with floor-division updates
    makes every iteration bit-reproducible — which is what lets an
    ITERATIVE graph algorithm carry a full value-hash oracle (the same
    three update rounds unrolled as chained CTEs).

    Scale: one map-side-combined shuffle per iteration keyed on the
    destination node; ranks relation is |nodes| rows; lineage truncated
    by localCheckpoint every 2 rounds (the dedup_cc_clusters discipline).
    The global top-100 is a distributed sort-limit (TakeOrderedAndProject
    — per-partition top-100 merged on the driver, no single-partition
    window over |nodes| rows); row_number then runs on the 100-row
    survivor set only."""
    from pyspark.sql.window import Window

    from db_writer_redshift_spark.operators.pagerank import pagerank_int

    li = load_table(spark, sf_dir, "lineitem")
    fwd = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    edges = fwd.unionByName(
        li.select(
            (F.col("l_suppkey") * 2 + 1).alias("src"),
            (F.col("l_partkey") * 2).alias("dst"),
        )
    )
    ranks = pagerank_int(edges, "src", "dst", iterations=3)
    top = ranks.orderBy(F.col("rank_micro").desc(), F.col("node")).limit(100)
    w = Window.orderBy(F.col("rank_micro").desc(), F.col("node"))
    return (
        top.withColumn("rank_pos", F.row_number().over(w))
        .select("node", "rank_micro", "rank_pos")
    )


@register(
    "sample_neyman_allocation",
    oracle="""
WITH s AS (
  SELECT lang, COUNT(*) AS n_docs,
         SUM(n_chars) AS sv, SUM(n_chars * n_chars) AS svv
  FROM documents GROUP BY lang
),
m AS (
  SELECT lang, n_docs,
         CAST(sv AS BIGINT) AS sum_chars,
         CAST(n_docs * svv - sv * sv AS BIGINT) AS var_num,
         CAST(n_docs AS BIGINT) * (n_docs - 1) AS var_den,
         n_docs * SQRT((CAST(n_docs AS DOUBLE) * svv - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
                       / (CAST(n_docs AS DOUBLE) * n_docs * (n_docs - 1))) AS weight
  FROM s
),
tot AS (SELECT SUM(weight) AS tw FROM m)
SELECT lang, n_docs, sum_chars, var_num, var_den,
       CAST(FLOOR(1000 * weight / tw) AS BIGINT) AS alloc_k
FROM m, tot
""",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation: for a 1000-document
    eval set stratified by language, allocate k_h proportional to
    N_h * sigma_h (stratum size x within-stratum std of doc length) —
    the design that minimizes estimator variance at fixed sample size,
    vs the plain proportional split of sample_stratified_by_lang.

    Determinism: the HASHED integer columns (moments) are exact; the
    allocation derives through sqrt/divide on identical operands in both
    engines with a FLOOR (not round) landing — floor of a shared double
    is stable except exactly at integer boundaries, which the weight
    ratios of real data do not hit (and the integer moments pin the
    inputs bit-identically).

    Scale: one map-side-combined moment aggregate per stratum (5 rows),
    broadcast total — the allocation table then drives any downstream
    deterministic-hash sampler."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sv"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("svv"),
    )
    n = F.col("n_docs")
    weight = n * F.sqrt(
        (n.cast("double") * F.col("svv") - F.col("sv").cast("double") * F.col("sv").cast("double"))
        / (n.cast("double") * n * (n - F.lit(1)))
    )
    m = s.select(
        "lang",
        "n_docs",
        F.col("sv").cast("long").alias("sum_chars"),
        (n * F.col("svv") - F.col("sv") * F.col("sv")).cast("long").alias("var_num"),
        (n.cast("long") * (n - F.lit(1))).alias("var_den"),
        weight.alias("weight"),
    )
    tot = m.agg(F.sum("weight").alias("tw"))
    return m.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "sum_chars",
        "var_num",
        "var_den",
        F.floor(1000 * F.col("weight") / F.col("tw")).cast("long").alias("alloc_k"),
    )


@register(
    "dedup_cc_keep_best",
    oracle=f"""
WITH RECURSIVE pairs AS ({_PAIRS_SQL}),
e AS (SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM e
  UNION
  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
),
roots AS (
  SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_root
  FROM reach GROUP BY u
),
base AS (
  SELECT doc_id,
         ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')), 6) AS a6,
         ROUND(CAST(LENGTH(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / LENGTH(text), 6) AS p6,
         ROUND(CAST(len(list_filter(string_split(LOWER(text), ' '), x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
               / len(string_split(text, ' ')), 6) AS s6
  FROM documents
),
scored AS (
  SELECT doc_id,
         CAST(ROUND((1.0 - LEAST(1.0, ABS(a6 - 5) / 5) * 0.3
                         - LEAST(1.0, p6 * 10) * 0.3
                         - LEAST(1.0, ABS(s6 - 0.4)) * 0.4) * 1000000) AS BIGINT) AS q_e6
  FROM base
),
ranked AS (
  SELECT r.cluster_root, s.doc_id, s.q_e6,
         ROW_NUMBER() OVER (PARTITION BY r.cluster_root ORDER BY s.q_e6 DESC, s.doc_id) AS rnk,
         COUNT(*) OVER (PARTITION BY r.cluster_root) AS cluster_size
  FROM roots r JOIN scored s USING (doc_id)
)
SELECT cluster_root, cluster_size, doc_id AS kept_doc_id, q_e6 AS kept_quality_e6
FROM ranked WHERE rnk = 1
""",
)
def dedup_cc_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical selection over TRANSITIVE duplicate clusters: connected
    components of the near-dup pair graph (dedup_cc_clusters' BSP
    hash-min labels), then keep the highest-quality member per cluster
    (dedup_keep_best_quality's integer-scaled score, doc_id tiebreak).
    This is the production composition — pairwise near-dup edges chain
    (A~B, B~C but not A~C), so the keep-one-per-cluster decision must be
    made on the transitive closure, not on raw pairs, or a chained family
    survives twice.

    Scale: the CC rounds dominate (one shuffle per superstep over the
    edge list); quality scores join in by doc_id (one equi-join on the
    |graph nodes| relation — singleton docs never enter); the per-cluster
    argmax is min(struct(-q, id)) in a map-side-combinable aggregate, no
    corpus-wide sort window."""
    from db_writer_redshift_spark.functions.text import (
        avg_word_len_expr,
        punct_ratio_expr,
        stopword_ratio_expr,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.shingle_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.05, max_doc_freq=100
    ).select("doc_a", "doc_b")
    roots = dedup.connected_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster_root"
    )
    t = F.col("text")
    a6 = F.round(avg_word_len_expr(t), 6)
    p6 = F.round(punct_ratio_expr(t), 6)
    s6 = F.round(stopword_ratio_expr(t), 6)
    q = (
        F.lit(1.0)
        - F.least(F.lit(1.0), F.abs(a6 - 5) / 5) * 0.3
        - F.least(F.lit(1.0), p6 * 10) * 0.3
        - F.least(F.lit(1.0), F.abs(s6 - 0.4)) * 0.4
    )
    scored = docs.select(
        "doc_id", F.round(q * 1000000).cast("long").alias("q_e6")
    )
    member = roots.join(scored, "doc_id")
    agg = member.groupBy("cluster_root").agg(
        F.count("*").alias("cluster_size"),
        F.min(
            F.struct((-F.col("q_e6")).alias("nq"), F.col("doc_id").alias("id"))
        ).alias("best"),
    )
    return agg.select(
        "cluster_root",
        "cluster_size",
        F.col("best.id").alias("kept_doc_id"),
        (-F.col("best.nq")).alias("kept_quality_e6"),
    )


@register(
    "split_by_cluster_root",
    oracle=f"""
WITH RECURSIVE pairs AS ({_PAIRS_SQL}),
e AS (SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM e
  UNION
  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
),
roots AS (
  SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_root
  FROM reach GROUP BY u
),
lab AS (
  SELECT d.doc_id, COALESCE(r.cluster_root, d.doc_id) AS root
  FROM documents d LEFT JOIN roots r ON r.doc_id = d.doc_id
),
split AS (
  SELECT doc_id, root, {_SPLIT_CASE.format(c="root")} AS split
  FROM lab
),
leaks AS (
  SELECT sa.split, COUNT(*) AS n_cross
  FROM pairs p
  JOIN split sa ON sa.doc_id = p.doc_a
  JOIN split sb ON sb.doc_id = p.doc_b
  WHERE sa.split <> sb.split
  GROUP BY sa.split
)
SELECT s.split,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT s.root) AS n_families,
       COALESCE(MAX(l.n_cross), 0) AS n_cross_split_pairs
FROM split s LEFT JOIN leaks l ON l.split = s.split
GROUP BY s.split
""",
)
def split_by_cluster_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-FREE train/val/test assignment: hash the duplicate-cluster
    ROOT, not the doc_id, so every member of a transitive near-dup family
    lands in the same split — the fix for the cross-split contamination
    that split_leakage_audit measures on naive per-doc hashing. Docs
    outside any cluster are their own root (same hash family, same
    80/10/10 rates). The n_cross_split_pairs column re-counts near-dup
    pairs whose ends landed in different splits — computed from the pair
    relation, and zero BY CONSTRUCTION (both ends share a root), which is
    the property this operator exists to guarantee.

    Scale: CC rounds as in dedup_cc_clusters; the root label joins back
    to the corpus by doc_id (graph nodes only — singletons take the
    coalesce path with no join fan-in); split assignment is the same
    scan-stage Knuth-hash CASE as the sampling ops."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.shingle_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.05, max_doc_freq=100
    ).select("doc_a", "doc_b")
    roots = dedup.connected_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster_root"
    )
    lab = docs.select("doc_id").join(roots, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_root", "doc_id").alias("root")
    )
    split = lab.select(
        "doc_id", "root", F.expr(_SPLIT_CASE.format(c="root")).alias("split")
    )
    sa = split.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    sb = split.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    leaks = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .groupBy(F.col("sa").alias("split"))
        .agg(F.count("*").alias("n_cross"))
    )
    return (
        split.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("root").alias("n_families"),
        )
        .join(leaks, "split", "left")
        .select(
            "split",
            "n_docs",
            "n_families",
            F.coalesce("n_cross", F.lit(0)).alias("n_cross_split_pairs"),
        )
    )


@register(
    "shuffle_epoch_order",
    oracle="""
WITH h AS (
  SELECT doc_id,
         list_reduce(list_transform(string_split_regex(substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 8), ''),
                                    c -> CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1),
                     (a, b) -> a * 16 + b) % 2147483647 AS hv
  FROM documents
)
SELECT doc_id,
       hv % 256 AS epoch_bucket,
       ROW_NUMBER() OVER (PARTITION BY hv % 256 ORDER BY hv, doc_id) AS bucket_pos
FROM h
""",
)
def shuffle_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch global training-order shuffle WITHOUT a
    global sort: hash each doc with the epoch number (md5-derived 32-bit
    value — the portable-hash family from operators/dedup), route it to
    one of 256 shuffle buckets, and sort only WITHIN each bucket. A
    reader that consumes buckets in bucket order sees a reproducible
    pseudorandom permutation of the corpus; a different epoch constant
    re-permutes everything. This is the two-level shuffle a 100 TB
    training pipeline uses in place of ``orderBy(rand())`` — which is
    neither deterministic under retries nor free of a global
    range-partition sort.

    Scale: one hash-partitioned exchange on the bucket key (bucket
    count scales with the cluster), per-bucket sorts are independent
    and spill-free at ~corpus/256 each; no driver state, no sampling
    pass for range boundaries. Output is the (bucket, position)
    assignment per doc — pure integers, order-insensitively gradeable."""
    from pyspark.sql.window import Window

    epoch = 7
    d = load_table(spark, sf_dir, "documents")
    hv = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("doc_id"), F.lit(epoch))), 1, 8),
            16,
            10,
        ).cast("bigint"),
        F.lit(2147483647),
    )
    hashed = d.select("doc_id", hv.alias("hv"), (hv % 256).alias("epoch_bucket"))
    w = Window.partitionBy("epoch_bucket").orderBy("hv", "doc_id")
    return hashed.select(
        "doc_id",
        F.col("epoch_bucket").cast("long").alias("epoch_bucket"),
        F.row_number().over(w).cast("long").alias("bucket_pos"),
    )
