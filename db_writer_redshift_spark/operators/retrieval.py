"""Lexical retrieval (BM25) and hybrid rank fusion (RRF) over documents.

The similarity module covers DENSE retrieval (cosine ANN over
embeddings); a training-data pipeline equally needs LEXICAL retrieval —
mining hard negatives for contrastive training, matching eval prompts
against the corpus beyond n-gram containment, and building the sparse
leg of a hybrid retriever. The reference (a Redshift COPY/merge
control-plane, see SURVEY.md §2) has no retrieval surface; this is part
of the beyond-reference LLM-pipeline track.

Terms are word BIGRAMS, not unigrams: the synthetic corpus (and any
low-entropy corpus) has near-constant unigram document frequency, which
collapses idf to zero; bigrams keep phrase information and a spread df
distribution. Query phrases decompose into their bigrams.

Scoring is the engine's integer-exact portable discipline (see
plans/graded.py round-2 notes): every per-term contribution is computed
with INTEGER arithmetic only, so the per-document sum is cross-engine
deterministic — no rounded-float-per-member sums (the class the verify
recipe bans):

    idf2     = floor(log2((N + 1) div (df + 1)))        -- integer arg
    sat_e3   = (22 * tf * TL * 1000) div
               (10 * tf * TL + 3 * TL + 9 * dl * N)     -- BM25 tf-saturation
    score    = sum(idf2 * sat_e3)                        -- exact BIGINT

``sat_e3`` is BM25's ``tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))`` with
k1=1.2, b=0.75, multiplied through by ``10*TL`` (TL = total corpus
length in bigram positions) to clear every fraction, then scaled to e3.
``idf2`` floors the inner division first so log2 sees an integer —
power-of-two-exact, and a small-denominator rational can't sit within
an ulp of 2^k otherwise, so the floor never flaps across engines.

Overflow bound: ``22 * tf * TL * 1000`` stays under 2^63 through
TL ≈ 4×10^14 (corpus of ~10^13 tokens); past that, widen the numerator
to DECIMAL(38,0) or fold ``avgdl`` down by a common factor — the engine
tier would switch to doubles, keeping only the oracle tier exact.

Scale shape: query terms are a broadcast literal list, so the token
explode filters to query-matching bigrams AT THE SCAN (an inverted-list
probe, never a corpus-wide term index); df/N/TL are one tiny aggregate
each; scoring joins are all broadcasts; the only wide operations are one
groupBy on (doc, term) for tf and one per-query top-k window. A
stopword-like term with corpus-scale df would blow the candidate set,
so a df-cap is applied BY DEFAULT (``max_df_permille=500``, the
shingle-Jaccard dedup's discipline): query terms matching more than
half the corpus are dropped before scoring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from db_writer_redshift_spark.functions.text import ngrams

K1_NUM = 22  # k1=1.2 -> (k1+1) * 10
SAT_SCALE = 1000


def _bigram_positions(text_col: Column) -> Column:
    return ngrams(F.lower(text_col), 2)


def bm25_bigram_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    max_df_permille: int = 500,
) -> DataFrame:
    """Top-``k`` documents per query phrase by integer-exact bigram BM25.

    Returns (query_id, doc_id, bm25_e3, lex_rank): rank by
    (score DESC, doc_id) — deterministic under ties.

    ``max_df_permille`` (default-on at 500): query terms whose document
    frequency exceeds ``max_df_permille/1000`` of the corpus are DROPPED
    before scoring — the df-cap the module docstring calls for, same as
    the shingle-Jaccard dedup's. Without it a stopword-like bigram in an
    uncontrolled query vocabulary makes the candidate set corpus-sized
    (every document matches), and the per-query top-k window degrades to
    a corpus-wide sort. The comparison ``1000*df <= cap*n_docs`` is pure
    integer arithmetic, cross-engine exact. Pass 1000 to disable.

    Materialization: the result is bounded driver state (≤ |queries|·k
    rows), so this operator collects it INSIDE and returns it as a fresh
    DataFrame — that gives the shared grams persist (which feeds both
    the corpus totals and the inverted-list probe) a deterministic
    unpersist instead of leaking the cached blocks to LRU eviction
    (VERDICT r7 'what's wrong' #2; the rich-club/KM bounded-driver-state
    discipline).
    """
    spark = docs.sparkSession
    pairs = [
        (qid, f"{a} {b}")
        for qid, phrase in queries
        for a, b in zip(phrase.lower().split(), phrase.lower().split()[1:])
    ]
    qterms = spark.createDataFrame(pairs, "query_id long, term string")
    term_set = sorted({t for _, t in pairs})  # tiny: literal probe list

    from db_writer_redshift_spark.operators.partitioning import (
    TEXT_KERNEL_BYTES_PER_TASK,
    ensure_parallelism,
)

    # grams feeds the corpus totals AND the inverted-list probe: persist
    # so the bigram explode runs once, and guard scan parallelism (the
    # kernel is row-local CPU-heavy; measured 10.8s -> 7.9s for the
    # nDCG audit at sf0.1, shared by every BM25-family query)
    grams = (
        ensure_parallelism(
            docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t")),
            bytes_per_task=TEXT_KERNEL_BYTES_PER_TASK,
        )
        .select("doc_id", _bigram_positions(F.col("__t")).alias("g"))
        .select("doc_id", F.size("g").alias("dl"), "g")
        .persist()
    )
    try:
        return _bm25_score_topk(
            spark, grams, qterms, term_set, k, max_df_permille
        )
    finally:
        grams.unpersist()


def _bm25_score_topk(spark, grams, qterms, term_set, k, max_df_permille):
    totals = grams.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_dl")
    )

    # Inverted-list probe: only query bigrams survive the explode.
    hits = (
        grams.select("doc_id", "dl", F.explode("g").alias("term"))
        .filter(F.col("term").isin(term_set))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df_tbl = (
        hits.groupBy("term")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
        .crossJoin(F.broadcast(totals.select("n_docs")))
        .filter(F.lit(1000) * F.col("df") <= F.lit(max_df_permille) * F.col("n_docs"))
        .select("term", "df")
    )

    scored = (
        hits.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(totals))
        .select(
            "query_id",
            "doc_id",
            F.expr(
                "floor(log2((n_docs + 1) div (df + 1))) * "
                f"(({K1_NUM} * tf * total_dl * {SAT_SCALE}) div "
                "(10 * tf * total_dl + 3 * total_dl + 9 * dl * n_docs))"
            ).cast("long").alias("contrib"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").cast("long").alias("bm25_e3"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25_e3").desc(), F.col("doc_id")
    )
    plan = (
        scored.withColumn("lex_rank", F.row_number().over(w))
        .filter(F.col("lex_rank") <= k)
        .select("query_id", "doc_id", "bm25_e3", "lex_rank")
    )
    # Collect the bounded top-k (≤ |queries|·k rows) so the caller's
    # frame carries no lineage over the persisted grams — the unpersist
    # in bm25_bigram_topk is then safe and deterministic.
    return spark.createDataFrame(plan.collect(), plan.schema)


def rrf_rerank_topk(
    candidates: DataFrame,
    prior: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank-fusion re-rank of retrieval candidates against a
    second signal — the retrieve-then-rerank hybrid pattern.

    ``candidates``: (query_id, doc_id, lex_rank) from a first-stage
    retriever (e.g. bm25_bigram_topk with a generous k).
    ``prior``: (doc_id, prior_e6) — a query-independent document score
    (quality, authority, freshness). The prior is ranked WITHIN each
    query's candidate set (bounded by first-stage k, so the window is
    over ≤k rows per query — never a corpus-wide global sort), then
    fused: ``rrf_e6 = 1e6 div (rrf_k + lex_rank) + 1e6 div
    (rrf_k + prior_rank)`` — integer-exact, cross-engine stable.

    Scale: the CANDIDATE side is the broadcast (#queries × first-stage
    k rows — bounded by construction); the prior is corpus-wide (one
    row per document) and streams map-side through the broadcast hash
    join with zero shuffle. Broadcasting the prior instead would be an
    sf-proportional broadcast — the q3/q5 bug class the plan lint
    guards against.

    Returns (query_id, doc_id, lex_rank, prior_rank, rrf_e6, fused_rank)
    cut to the final top-``k``.
    """
    joined = prior.join(F.broadcast(candidates), "doc_id")
    wq = Window.partitionBy("query_id").orderBy(
        F.col("prior_e6").desc(), F.col("doc_id")
    )
    ranked = joined.withColumn("prior_rank", F.row_number().over(wq))
    fused = ranked.select(
        "query_id",
        "doc_id",
        "lex_rank",
        "prior_rank",
        F.expr(
            f"(1000000 div ({rrf_k} + lex_rank))"
            f" + (1000000 div ({rrf_k} + prior_rank))"
        ).cast("long").alias("rrf_e6"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf_e6").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf))
        .filter(F.col("fused_rank") <= k)
    )


def query_term_hits(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, doc_id, term, tf): the inverted-list probe of query
    bigrams against the corpus, WITHOUT the df-cap — relevance judgments
    (e.g. the nDCG audit's term-coverage grades) must see every query
    term even when scoring drops corpus-hot ones. Same scan shape as
    bm25_bigram_topk's hits stage: the literal term list filters at the
    explode, qterms broadcasts."""
    spark = docs.sparkSession
    pairs = [
        (qid, f"{a} {b}")
        for qid, phrase in queries
        for a, b in zip(phrase.lower().split(), phrase.lower().split()[1:])
    ]
    qterms = spark.createDataFrame(pairs, "query_id long, term string")
    term_set = sorted({t for _, t in pairs})
    hits = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_bigram_positions(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term").isin(term_set))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    return hits.join(F.broadcast(qterms), "term").select(
        "query_id", "doc_id", "term", "tf"
    )
