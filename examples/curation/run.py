#!/usr/bin/env python
"""Runnable corpus-curation walkthrough: quality gate -> exact dedup ->
near-dup (MinHash-LSH) removal -> benchmark decontamination -> per-language
token budget -> curated parquet + stats.

    python examples/curation/run.py [sf_dir] [out_dir]

Defaults: sf_dir=/root/testdata/sf0.001, out_dir=/tmp/curated_corpus.
The same composition the registered `pipeline_*` queries prove against the
DuckDB oracle, here as the plain Python API a pipeline author would call.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from db_writer_redshift_spark.operators import dedup, text  # noqa: E402
from db_writer_redshift_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = get_spark(app_name="curation-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()

    # 1. Quality gate: composite score from length/punctuation/stopword
    #    shape (pure column expressions — map-only at any scale).
    scored = docs.join(
        text.quality_features(docs, "doc_id", "text").select(
            "doc_id", "quality_score", "n_tokens"
        ),
        "doc_id",
    )
    gated = scored.filter(
        (F.col("quality_score") >= 0.80) & (F.col("n_tokens") >= 20)
    )
    n1 = gated.count()

    # 2. Exact dedup: one shuffle on md5(text), keep min doc_id per family.
    keep_exact = dedup.exact_dedup(gated, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    gated = gated.join(keep_exact, "doc_id", "left_semi")
    n2 = gated.count()

    # 3. Near-dup removal: banded MinHash-LSH candidates, estimated
    #    Jaccard >= 0.5; drop the larger doc_id of each surviving pair.
    pairs = dedup.minhash_lsh_pairs(gated, "doc_id", "text", threshold=0.5)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    gated = gated.join(losers, "doc_id", "left_anti")
    n3 = gated.count()

    # 4. Benchmark decontamination: drop docs sharing >= 5 8-gram shingles
    #    with the "eval set" (here: the 5 longest docs stand in for it).
    evalset = docs.orderBy(F.col("n_chars").desc(), "doc_id").limit(5)
    overlap = dedup.ngram_overlap(gated, evalset, "doc_id", "text", n=8)
    contaminated = (
        overlap.filter(F.col("n_shared_grams") >= 5)
        .select(F.col("train_id").alias("doc_id"))
        .distinct()
    )
    gated = gated.join(contaminated, "doc_id", "left_anti")
    n4 = gated.count()

    # 4b. FUZZY decontamination: lightly-edited benchmark copies that the
    #     exact 8-gram check misses still collide in a MinHash band
    #     (eval side broadcasts; the training side is never self-joined).
    fuzzy = dedup.minhash_cross_contamination(
        gated, evalset, "doc_id", "text", threshold=0.5
    ).select(F.col("train_id").alias("doc_id"))
    gated = gated.join(fuzzy, "doc_id", "left_anti")
    n4b = gated.count()

    # (For per-source calibration instead of the global threshold in
    # step 1, see text.quality_percentile_gate — keeps the top fraction
    # WITHIN each source so no single source crowds out the mix.)

    # 5. Per-language token budget: admit docs (deterministic doc_id
    #    order) until each language reaches 20k tokens.
    w_running = F.sum("n_tokens").over(
        Window.partitionBy("lang").orderBy("doc_id")
    )
    final = gated.withColumn("running", w_running).filter(
        F.col("running") <= 20_000
    )

    final.select("doc_id", "lang", "source", "text").write.mode(
        "overwrite"
    ).parquet(out_dir)
    stats = (
        final.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
        .orderBy("lang")
    )
    print(f"docs: {n0} -> quality {n1} -> exact-dedup {n2} "
          f"-> near-dup {n3} -> decontam {n4} -> fuzzy-decontam {n4b} "
          f"-> budgeted {final.count()}")
    stats.show()
    print(f"curated corpus written to {out_dir}")

    # 6. Corpus health audits (published-method track, plans/lm_curation):
    #    Gopher rule-filter failure accounting per source, Zipf
    #    rank-frequency slope per language, and the SemDeDup semantic
    #    near-dup profile over the embedding table.
    from db_writer_redshift_spark.plans import QUERIES

    print("\nGopher rule audit (per-source failures):")
    QUERIES["gopher_rules_audit"].fn(spark, sf_dir).orderBy("source").show(5)
    print("Zipf rank-frequency slope per language (num/den fraction):")
    for r in QUERIES["zipf_slope_audit"].fn(spark, sf_dir).collect():
        print(f"  {r['lang']}: slope={r['slope_num'] / r['slope_den']:+.3f}"
              f" over top {r['n_terms']} terms")
    sem = QUERIES["semdedup_cluster_prune"].fn(spark, sf_dir)
    agg = sem.agg(
        F.sum("n_members").alias("m"), F.sum("n_pruned").alias("p")
    ).first()
    print(f"SemDeDup: {agg['p']}/{agg['m']} embeddings are within-cluster "
          f"semantic near-dups at cos>=0.35")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
