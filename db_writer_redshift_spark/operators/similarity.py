"""Approximate-nearest-neighbor search over an embedding column.

Two tiers:
  * brute_force_topk — exact cosine top-k: broadcast the (small) query set
    against the corpus, fold the dot product JVM-side, per-query top-k via
    window row_number. Linear scan — the correctness baseline and the
    oracle-checkable path.
  * lsh_topk — random-hyperplane LSH: H sign-bits per table × L tables;
    candidates share a bucket in ≥1 table, then exact cosine re-rank within
    candidates. At 100 TB the bucket equi-join replaces the corpus-×-query
    cross product; recall is tuned by (H, L) and validated in tests against
    the brute-force baseline.

Hyperplanes are generated from a fixed seed with numpy and shipped as
literal arrays (they are tiny: L×H×dim floats) — deterministic, no RNG at
execution time.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from db_writer_redshift_spark.functions.vector import cosine_sim, dot_double, norm_double
from db_writer_redshift_spark.operators.partitioning import ensure_parallelism


def _cosine_from_norms(q_vec, c_vec, q_norm, c_norm):
    """Cosine from precomputed side norms. Same arithmetic as cosine_sim
    (norm·norm denominator, sequential-fold dot) — but each side's norm is
    evaluated once per ROW in a projection below the join instead of once
    per PAIR above it, which removes 2/3 of the higher-order-function work
    in a k-NN join. Bit-identical results, so oracle hashes are unchanged."""
    denom = q_norm * c_norm
    return F.when(denom > 0, dot_double(q_vec, c_vec) / denom)


def brute_force_topk(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine_sim, nn_rank), self-matches
    excluded, rank ties broken by neighbor id (deterministic set).
    """
    from pyspark.sql.window import Window

    q = queries_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_double(F.col(vec_col)).alias("q_norm"),
    )
    # The corpus side carries the per-pair dot-product work; lift it to
    # cluster parallelism when the scan under-partitions (one-row-group
    # fixture) — no-op on a many-split corpus.
    c = ensure_parallelism(
        corpus_df.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            norm_double(F.col(vec_col)).alias("c_norm"),
        )
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cosine_from_norms(
                    F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
                ),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "nn_rank")
    )


def cosine_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, id_a < id_b.
    Exact all-pairs form (oracle-checkable); the LSH tier is the scale path.
    """
    # Left side drives output parallelism of the nested-loop pair scan.
    a = ensure_parallelism(
        df.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("va"),
            norm_double(F.col(vec_col)).alias("na"),
        )
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm_double(F.col(vec_col)).alias("nb"),
    )
    sim = F.round(
        _cosine_from_norms(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")), 6
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def ivf_topk(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_centroids: int = 8,
    num_probes: int = 4,
) -> DataFrame:
    """ANN top-k via an IVF (inverted-file) index: partition the corpus by
    nearest centroid, probe only the ``num_probes`` closest cells per query.

    Centroid selection is deterministic: an id-ordered stride sample of the
    corpus itself (no iterative k-means — at 100 TB you'd train centroids
    offline on a sample anyway; the cell-probe plan shape is identical).

    Plan shape: centroids are a tiny broadcast list → cell assignment is a
    shuffle-free projection on both sides → the candidate join is an
    equi-join on cell id (corpus side pre-partitioned by cell, queries
    fan out to num_probes rows each) → exact cosine re-rank within
    candidates. Corpus scanned once; per-query work ~ num_probes/num_centroids
    of brute force.

    Defaults (8 cells, 4 probes → recall@5 ≈ 0.76 on the fixture corpus)
    reflect that the fixture vectors are diffuse — IVF pays off in
    proportion to the corpus's cluster structure. On clustered production
    embeddings raise num_centroids (finer cells, ~N·probes/centroids
    candidates) and keep probes small.
    """
    from pyspark.sql.window import Window

    # Deterministic centroid sample WITHOUT a global sort: hash-stride
    # filter (xxhash64 of the id — seedless, reproducible) thins the
    # corpus to ~2×num_centroids candidates map-side, then an
    # orderBy+limit picks the final K as a distributed TakeOrdered.
    # (A row_number window here would funnel the whole corpus through
    # one reducer just to choose 8 vectors.)
    sample = corpus_df.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    n = sample.count()
    stride = max(1, n // (2 * num_centroids))
    centroids = [
        (i, [float(x) for x in r.cvec])
        for i, r in enumerate(
            sample.filter(F.pmod(F.xxhash64("cid"), F.lit(stride)) == 0)
            .orderBy("cid")
            .limit(num_centroids)
            .collect()
        )
    ]

    def cell_scores(vec) -> F.Column:
        """Array of (cell, cosine-to-centroid) structs, JVM expressions."""
        return F.array(
            *[
                F.struct(
                    F.lit(ci).alias("cell"),
                    cosine_sim(vec, F.array(*[F.lit(x) for x in cv])).alias("sim"),
                )
                for ci, cv in centroids
            ]
        )

    def top_cells(vec, m: int) -> F.Column:
        return F.slice(
            F.reverse(F.array_sort(cell_scores(vec), lambda a, b: F.when(a["sim"] < b["sim"], -1).when(a["sim"] > b["sim"], 1).otherwise(0))),
            1,
            m,
        )

    c_assigned = corpus_df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm_double(F.col(vec_col)).alias("c_norm"),
        F.element_at(top_cells(F.col(vec_col), 1), 1)["cell"].alias("cell"),
    )
    q_probed = queries_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_double(F.col(vec_col)).alias("q_norm"),
        F.explode(F.transform(top_cells(F.col(vec_col), num_probes), lambda s: s["cell"])).alias(
            "cell"
        ),
    )
    cand = (
        q_probed.join(c_assigned, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cosine_from_norms(
                    F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
                ),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "nn_rank")
    )


def _hyperplanes(dim: int, num_planes: int, num_tables: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(num_tables, num_planes, dim)).astype(float)


def _bucket_expr(vec_col, planes: np.ndarray):
    """Sign-bit bucket id for one table: packs sign(v·plane_j) bits into a
    long via fold — all column expressions, evaluated JVM-side."""
    bits = []
    for j, plane in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, lit, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.shiftleft(F.lit(1).cast("bigint"), j)).otherwise(F.lit(0).cast("bigint")))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    num_planes: int = 4,
    num_tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k via random-hyperplane LSH + exact re-rank of candidates.

    Same output schema as brute_force_topk; approximate (recall checked in
    tests). The bucket join keys on (table, bucket) — at scale the shuffle
    moves only bucket-collided pairs.

    Defaults (4 bits × 16 tables → recall@5 ≈ 0.9 on the fixture corpus,
    whose top-5 neighbors sit at modest cosine ~0.4) trade candidate-set
    size for recall. On a billion-vector corpus raise num_planes (finer
    buckets, ~N/2^planes candidates per table) and re-measure recall —
    the (planes, tables) pair IS the cost/recall dial.
    """
    from pyspark.sql.window import Window

    planes = _hyperplanes(dim, num_planes, num_tables, seed)

    def with_buckets(df: DataFrame, idname: str, vecname: str, normname: str) -> DataFrame:
        buckets = F.array(
            *[
                F.struct(F.lit(t).alias("t"), _bucket_expr(F.col(vecname), planes[t]).alias("bkt"))
                for t in range(num_tables)
            ]
        )
        return df.select(
            F.col(idname), F.col(vecname), F.col(normname), F.explode(buckets).alias("tb")
        ).select(idname, vecname, normname, F.col("tb.t").alias("t"), F.col("tb.bkt").alias("bkt"))

    q = with_buckets(
        queries_df.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            norm_double(F.col(vec_col)).alias("q_norm"),
        ),
        "query_id",
        "q_vec",
        "q_norm",
    )
    c = with_buckets(
        corpus_df.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            norm_double(F.col(vec_col)).alias("c_norm"),
        ),
        "neighbor_id",
        "c_vec",
        "c_norm",
    )
    cand = (
        q.join(c, ["t", "bkt"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cosine_from_norms(
                    F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
                ),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "nn_rank")
    )
