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
