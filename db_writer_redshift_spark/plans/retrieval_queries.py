"""Lexical retrieval + hybrid-fusion queries (operators/retrieval.py).

The dense-retrieval family (ann_*) searches embeddings; these queries
search TEXT: integer-exact bigram BM25 and a retrieve-then-rerank
reciprocal-rank fusion against a document quality prior. Fixed query
phrases (the ann family's fixed-query-vector pattern) keep the workload
deterministic and the oracles value-hashable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from db_writer_redshift_spark.operators import retrieval
from db_writer_redshift_spark.operators.text import quality_score_e6
from db_writer_redshift_spark.plans.registry import load_table, register

# Fixed query phrases over the corpus vocabulary; bigram terms give a
# spread df distribution (unigram df is near-constant here, idf ~ 0).
PHRASES: list[tuple[int, str]] = [
    (1, "key agg row scan"),
    (2, "hash join merge batch"),
    (3, "window order data column"),
    (4, "slow filter value table"),
]


def _values_qterms() -> str:
    rows = ", ".join(
        f"({qid}, '{a} {b}')"
        for qid, phrase in PHRASES
        for a, b in zip(phrase.split(), phrase.split()[1:])
    )
    return f"qterms(query_id, term) AS (VALUES {rows})"


def _terms_in_list() -> str:
    terms = sorted(
        {
            f"'{a} {b}'"
            for _, phrase in PHRASES
            for a, b in zip(phrase.split(), phrase.split()[1:])
        }
    )
    return ", ".join(terms)


def _bm25_cte_prefix() -> str:
    """Shared oracle CTEs: bigram positions, corpus totals, query-term
    hits with tf, per-term df, and the integer-exact BM25 score (the
    operators/retrieval.py formula verbatim — floor-log2 idf on an
    integer-divided argument, fraction-cleared tf saturation, exact
    BIGINT sum)."""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
g2 AS (
  SELECT doc_id,
         len(w) - CASE WHEN len(w) >= 2 THEN 1 ELSE len(w) END AS dl,
         CASE WHEN len(w) >= 2
              THEN list_transform(generate_series(1, len(w) - 1),
                                  i -> w[i] || ' ' || w[i + 1])
              ELSE [] END AS g
  FROM toks
),
tot AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_dl FROM g2),
{_values_qterms()},
hits AS (
  SELECT doc_id, dl, term, COUNT(*) AS tf
  FROM (SELECT doc_id, dl, unnest(g) AS term FROM g2)
  WHERE term IN ({_terms_in_list()})
  GROUP BY doc_id, dl, term
),
dft0 AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY term),
dft AS (SELECT term, df FROM dft0 CROSS JOIN tot
        WHERE 1000 * df <= 500 * n_docs),
scored AS (
  SELECT q.query_id, h.doc_id,
         CAST(SUM(
           CAST(FLOOR(LOG2((n_docs + 1) // (df + 1))) AS BIGINT)
           * ((22 * tf * total_dl * 1000)
              // (10 * tf * total_dl + 3 * total_dl + 9 * dl * n_docs))
         ) AS BIGINT) AS bm25_e3
  FROM hits h JOIN qterms q USING (term) JOIN dft USING (term) CROSS JOIN tot
  GROUP BY q.query_id, h.doc_id
),
lexranked AS (
  SELECT query_id, doc_id, bm25_e3,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY bm25_e3 DESC, doc_id) AS lex_rank
  FROM scored
)"""


@register(
    "bm25_bigram_topk",
    oracle=_bm25_cte_prefix()
    + """
SELECT query_id, doc_id, bm25_e3, lex_rank FROM lexranked WHERE lex_rank <= 10
""",
)
def bm25_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval: top-10 documents per fixed query phrase by
    integer-exact bigram BM25 (operators/retrieval.py module docstring
    derives the formula and its overflow bound).

    Scale: query bigrams are a literal broadcast probe list, so the
    explode filters at the scan (inverted-list semantics, no corpus-wide
    term index); df/N/total-length are tiny broadcast aggregates; the
    wide ops are one (doc, term) tf groupBy and a per-query top-k
    window."""
    docs = load_table(spark, sf_dir, "documents")
    return retrieval.bm25_bigram_topk(docs, PHRASES, k=10)


@register(
    "retrieval_rrf_fusion",
    oracle=_bm25_cte_prefix()
    + """,
cand AS (SELECT query_id, doc_id, lex_rank FROM lexranked WHERE lex_rank <= 25),
qbase AS (
  SELECT doc_id,
         ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')), 6) AS a6,
         ROUND(CAST(LENGTH(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / LENGTH(text), 6) AS p6,
         ROUND(CAST(len(list_filter(string_split(LOWER(text), ' '), x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
               / len(string_split(text, ' ')), 6) AS s6
  FROM documents
),
prior AS (
  SELECT doc_id,
         CAST(ROUND((1.0 - LEAST(1.0, ABS(a6 - 5) / 5) * 0.3
                         - LEAST(1.0, p6 * 10) * 0.3
                         - LEAST(1.0, ABS(s6 - 0.4)) * 0.4) * 1000000) AS BIGINT) AS prior_e6
  FROM qbase
),
pr AS (
  SELECT c.query_id, c.doc_id, c.lex_rank,
         ROW_NUMBER() OVER (PARTITION BY c.query_id
                            ORDER BY p.prior_e6 DESC, c.doc_id) AS prior_rank
  FROM cand c JOIN prior p USING (doc_id)
),
fused AS (
  SELECT query_id, doc_id, lex_rank, prior_rank,
         (1000000 // (60 + lex_rank)) + (1000000 // (60 + prior_rank)) AS rrf_e6
  FROM pr
),
final AS (
  SELECT query_id, doc_id, lex_rank, prior_rank, rrf_e6,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rrf_e6 DESC, doc_id) AS fused_rank
  FROM fused
)
SELECT query_id, doc_id, lex_rank, prior_rank, rrf_e6, fused_rank
FROM final WHERE fused_rank <= 10
""",
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieve-then-rerank: BM25 top-25 candidates per query,
    reciprocal-rank-fused with the document quality prior
    (quality_score_e6 — the proven integer formulation), final top-10.

    The prior is ranked WITHIN each query's candidate set, so the
    rerank window is over ≤25 rows per query — never a corpus-wide
    global sort. rrf_e6 is pure integer division (floor), cross-engine
    exact."""
    docs = load_table(spark, sf_dir, "documents")
    cand = retrieval.bm25_bigram_topk(docs, PHRASES, k=25)
    prior = docs.select(
        "doc_id", quality_score_e6(F.col("text")).alias("prior_e6")
    )
    return retrieval.rrf_rerank_topk(cand, prior, k=10, rrf_k=60)

# Fixed nDCG@10 discount weights: round(1e6 / log2(rank+1)) for rank 1..10.
# Generated once and hardcoded as LITERALS in both engines, so the one
# transcendental (log2) never executes at query time on either side.
NDCG_W_E6: list[int] = [
    1000000, 630930, 500000, 430677, 386853,
    356207, 333333, 315465, 301030, 289065,
]


def _ndcg_oracle() -> str:
    wt_rows = ", ".join(f"({r + 1}, {w})" for r, w in enumerate(NDCG_W_E6))
    return (
        _bm25_cte_prefix()
        + f""",
wt(rk, w_e6) AS (VALUES {wt_rows}),
rel AS (
  SELECT q.query_id, h.doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM hits h JOIN qterms q USING (term)
  GROUP BY q.query_id, h.doc_id
),
topk AS (
  SELECT l.query_id, l.doc_id, l.lex_rank,
         POWER(2, r.n_terms)::BIGINT - 1 AS gain
  FROM lexranked l JOIN rel r
    ON r.query_id = l.query_id AND r.doc_id = l.doc_id
  WHERE l.lex_rank <= 10
),
ideal AS (
  SELECT query_id, gain,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY gain DESC, doc_id) AS ideal_rank
  FROM topk
),
dcg AS (
  SELECT t.query_id,
         CAST(SUM(t.gain * w.w_e6) AS BIGINT) AS dcg_e6
  FROM topk t JOIN wt w ON w.rk = t.lex_rank
  GROUP BY t.query_id
),
idcg AS (
  SELECT i.query_id,
         CAST(SUM(i.gain * w.w_e6) AS BIGINT) AS idcg_e6
  FROM ideal i JOIN wt w ON w.rk = i.ideal_rank
  GROUP BY i.query_id
)
SELECT d.query_id, d.dcg_e6, i.idcg_e6,
       CASE WHEN i.idcg_e6 > 0
            THEN (1000 * d.dcg_e6) // i.idcg_e6 ELSE 0 END AS ndcg_permille
FROM dcg d JOIN idcg i USING (query_id)
"""
    )


@register("retrieval_ndcg_audit", oracle=_ndcg_oracle())
def retrieval_ndcg_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality audit: nDCG@10 of the BM25 top-10 per query,
    against graded term-coverage relevance (gain = 2^n_matching_bigrams
    - 1 — the standard exponential gain over a 0..3 graded scale). The
    completion of the retrieval family's eval story: ann_recall_audit
    grades the dense tiers, this grades the lexical tier — BM25 ranks
    high-coverage docs first, so nDCG < 1000 exposes queries where
    df-capped or length-normalized scoring inverts the coverage order.

    Numerics: the per-rank discounts 1/log2(rank+1) are PRECOMPUTED
    integer-e6 literals (NDCG_W_E6) shared by both engines, so no
    transcendental executes at query time and every product/sum/floor-
    division is exact BIGINT — full value-hash despite nDCG's textbook
    definition being float.

    Scale: candidates are the existing top-10-per-query relation
    (bounded: 10 rows × #queries); relevance joins the same broadcast
    query-term hits used for scoring; ideal re-ranking windows over ≤10
    rows per query. Nothing corpus-wide beyond the BM25 scan itself."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    topk = retrieval.bm25_bigram_topk(docs, PHRASES, k=10)
    hits = retrieval.query_term_hits(docs, PHRASES)
    rel = hits.groupBy("query_id", "doc_id").agg(
        F.count("*").cast("long").alias("n_terms")
    )
    wts = F.array(*[F.lit(w) for w in NDCG_W_E6])
    scored = (
        topk.join(rel, ["query_id", "doc_id"])
        .withColumn("gain", F.expr("CAST(POWER(2, n_terms) AS BIGINT) - 1"))
        .withColumn("w_lex", F.element_at(wts, F.col("lex_rank").cast("int")))
    )
    iw = Window.partitionBy("query_id").orderBy(
        F.col("gain").desc(), F.col("doc_id")
    )
    ideal = scored.withColumn("ideal_rank", F.row_number().over(iw)).withColumn(
        "w_ideal", F.element_at(wts, F.col("ideal_rank").cast("int"))
    )
    per_q = ideal.groupBy("query_id").agg(
        F.sum(F.col("gain") * F.col("w_lex")).cast("long").alias("dcg_e6"),
        F.sum(F.col("gain") * F.col("w_ideal")).cast("long").alias("idcg_e6"),
    )
    return per_q.select(
        "query_id",
        "dcg_e6",
        "idcg_e6",
        F.expr(
            "CASE WHEN idcg_e6 > 0 THEN (1000 * dcg_e6) div idcg_e6"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("ndcg_permille"),
    )
