"""Lloyd's k-means: recovers separated clusters, converges, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_writer_redshift_spark.operators.clustering import kmeans_fit


def _blobs(spark):
    # 3 well-separated 4-d blobs, 30 points each, deterministic offsets
    rows = []
    for b, center in enumerate([0.0, 10.0, 20.0]):
        for i in range(30):
            jitter = ((i * 7) % 5) * 0.1  # 0.0 .. 0.4
            rows.append(
                (b * 30 + i, [center + jitter, center - jitter, center, center + 0.2])
            )
    return spark.createDataFrame(rows, "id long, embedding array<float>")


def test_kmeans_recovers_separated_blobs(spark):
    res = kmeans_fit(_blobs(spark), "id", "embedding", k=3, max_iters=10)
    assert res.converged
    got = res.assignments.collect()
    # every true blob maps to exactly one learned centroid
    by_blob = {}
    for r in got:
        by_blob.setdefault(r.id // 30, set()).add(r.centroid_id)
    assert all(len(cids) == 1 for cids in by_blob.values())
    assert len({next(iter(c)) for c in by_blob.values()}) == 3
    # centroids sit at the blob centers (within the jitter width)
    flat = sorted(c[2] for c in res.centroids)
    assert flat == pytest.approx([0.0, 10.0, 20.0], abs=0.5)


def test_kmeans_deterministic(spark):
    a = kmeans_fit(_blobs(spark), "id", "embedding", k=3)
    b = kmeans_fit(_blobs(spark), "id", "embedding", k=3)
    assert a.centroids == b.centroids
    assert a.iterations == b.iterations
    ra = sorted((r.id, r.centroid_id) for r in a.assignments.collect())
    rb = sorted((r.id, r.centroid_id) for r in b.assignments.collect())
    assert ra == rb


def test_kmeans_requires_k_rows(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0])], "id long, embedding array<float>")
    with pytest.raises(ValueError):
        kmeans_fit(df, "id", "embedding", k=3)


def test_kmeans_on_fixture_embeddings(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    res = kmeans_fit(emb, "vec_id", "embedding", k=4, max_iters=3)
    assert res.assignments.count() == emb.count()
    sizes = {
        r.centroid_id: r.n
        for r in res.assignments.groupBy("centroid_id").agg(F.count("*").alias("n")).collect()
    }
    assert sum(sizes.values()) == emb.count()
    assert res.iterations <= 3


def test_kmeans_fit_rejects_ragged_and_null_vectors(spark):
    from db_writer_redshift_spark.operators.clustering import kmeans_fit

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0]), (2, [5.0]), (3, [6.0, None])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ragged"):
        kmeans_fit(df, "vec_id", "embedding", k=2, max_iters=2)


def test_kmeans_fit_portable_matches_python_reference(spark):
    from db_writer_redshift_spark.operators.clustering import kmeans_fit_portable

    # two obvious clusters in 2-D; k=2, seeds = ids 0,1 (one per cluster)
    pts = [(0, [0.0, 0.1]), (1, [5.0, 5.1]), (2, [0.2, 0.0]), (3, [5.2, 5.0]), (4, [0.1, 0.2])]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    out = kmeans_fit_portable(df, "vec_id", "embedding", k=2, iters=2)
    got = {r.id: r.centroid_id for r in out.collect()}
    assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1}

    # python replica of the integer updates for centroid 0
    q = {i: [round(x * 1000) for x in v] for i, v in pts}
    members0 = [q[0], q[2], q[4]]
    c0 = [sum(m[d] for m in members0) // 3 for d in range(2)]
    d0 = sum((q[0][d] - c0[d]) ** 2 for d in range(2))
    r0 = {r.id: r.sqdist_int for r in out.collect()}
    assert r0[0] == d0


@pytest.mark.slow
def test_kmeans_fit_portable_partition_invariant(spark):
    from db_writer_redshift_spark.operators.clustering import kmeans_fit_portable

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {
        (r.id, r.centroid_id, r.sqdist_int)
        for r in kmeans_fit_portable(emb.repartition(1), "vec_id", "embedding").collect()
    }
    b = {
        (r.id, r.centroid_id, r.sqdist_int)
        for r in kmeans_fit_portable(emb.repartition(11), "vec_id", "embedding").collect()
    }
    assert a == b
