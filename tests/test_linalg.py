"""Distributed Gram/PCA operator (operators/linalg.py).

Ground truth is numpy on the collected vectors, quantized the same way —
the distributed path must match it exactly (integer Gram) and to 1e-9
(eigenvalues), and must be invariant under repartitioning.
"""

from __future__ import annotations

import numpy as np
import pytest

from db_writer_redshift_spark.operators import linalg

SF_DIR = "/root/testdata/sf0.001"
DIM = 64
SCALE = 1000


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def mat(emb):
    rows = emb.select("embedding").collect()
    return np.array([r.embedding for r in rows], dtype=np.float64)


def _numpy_summary(mat):
    q = np.rint(mat * SCALE)
    return q.T @ q, q.sum(axis=0), len(mat)


def test_gram_summary_matches_numpy_exactly(emb, mat):
    rows = linalg.gram_summary(emb, "embedding", DIM, SCALE).collect()
    gram = np.zeros((DIM, DIM))
    sums = np.zeros(DIM)
    n = 0
    for r in rows:
        if r.i == linalg.COUNT_ROW:
            n = r.s
        elif r.j == linalg.SUM_COL:
            sums[r.i] = r.s
        else:
            gram[r.i, r.j] = r.s
    g_ref, s_ref, n_ref = _numpy_summary(mat)
    assert n == n_ref
    assert np.array_equal(sums, s_ref)
    assert np.array_equal(gram, g_ref)


def test_pca_eigvals_match_numpy_cov(emb, mat):
    vals, vecs, n = linalg.pca_eigvals(emb, "embedding", DIM, SCALE)
    q = np.rint(mat * SCALE) / SCALE
    ref = np.linalg.eigvalsh(np.cov(q, rowvar=False))[::-1]
    assert n == len(mat)
    assert np.allclose(vals, ref, atol=1e-9)
    # vecs: orthonormal, one per dim, ordered with vals
    assert vecs.shape == (DIM, DIM)
    assert np.allclose(vecs.T @ vecs, np.eye(DIM), atol=1e-9)
    assert np.all(np.diff(vals) <= 1e-12)


def test_gram_summary_invariant_under_repartitioning(emb):
    a = {
        (r.i, r.j): r.s
        for r in linalg.gram_summary(
            emb.repartition(1), "embedding", DIM, SCALE
        ).collect()
    }
    b = {
        (r.i, r.j): r.s
        for r in linalg.gram_summary(
            emb.repartition(13), "embedding", DIM, SCALE
        ).collect()
    }
    assert a == b


def test_gram_summary_rejects_wrong_dim(emb):
    with pytest.raises(Exception, match="expected 32-dim"):
        linalg.gram_summary(emb, "embedding", 32, SCALE).collect()


def test_pca_needs_two_vectors(emb):
    one = emb.limit(1)
    with pytest.raises(ValueError, match="2 vectors"):
        linalg.pca_eigvals(one, "embedding", DIM, SCALE)


def test_ridge_fit_matches_numpy_and_cramer_probe(spark, emb, mat):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    joined = emb.join(docs, emb.vec_id == docs.doc_id)
    w, n = linalg.ridge_fit(joined, "embedding", "n_chars", DIM, scale=SCALE)
    # local ground truth on the same quantization
    ids = {r.doc_id: r.n_chars for r in docs.collect()}
    rows = emb.select("vec_id", "embedding").collect()
    q = np.rint(np.array([r.embedding for r in rows], dtype=np.float64) * SCALE)
    y = np.array([ids[r.vec_id] for r in rows], dtype=np.float64)
    ref = np.linalg.solve(q.T @ q + n * np.eye(DIM), q.T @ y)
    assert n == len(rows)
    assert np.allclose(w, ref, atol=1e-9)
    # the oracle-exact 3-feature Cramer probe is the SAME normal
    # equations restricted to dims 0..2: solve that subsystem locally
    # and compare against the registered query's floored e6 weights
    import __spark_entry__ as entry_mod

    row = entry_mod.queries()["quality_linear_probe"](spark, SF_DIR).collect()[0]
    q3 = q[:, :3]
    w3 = np.linalg.solve(q3.T @ q3 + n * np.eye(3), q3.T @ y)
    for i in range(3):
        assert row[f"w{i}_e6"] == int(np.floor(w3[i] * 1_000_000))
    assert row["n_rows"] == n


def test_ridge_fit_invariant_under_repartitioning(spark, emb):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    joined = emb.join(docs, emb.vec_id == docs.doc_id)
    w1, _ = linalg.ridge_fit(joined, "embedding", "n_chars", DIM, scale=SCALE)
    w2, _ = linalg.ridge_fit(
        joined.repartition(13), "embedding", "n_chars", DIM, scale=SCALE
    )
    assert np.array_equal(w1, w2)
