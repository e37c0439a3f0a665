"""Distributed linear algebra over embedding columns: exact-integer Gram
matrix accumulation and driver-side PCA.

The pattern mirrors classic distributed PCA (treeAggregate of outer
products): each Arrow batch computes a *partial* d×d Gram matrix with one
GEMM, the partials are summed with a map-side-combined aggregate, and only
the d² summary — never the data — reaches the driver, where numpy's
``eigh`` finishes the job. At 100 TB the per-executor state is d²
integers (d=64 → 32 KiB); the shuffle carries ``n_partitions × d²`` rows.

Determinism: float sums are partition-order-dependent, so the vectors are
quantized to integers (``round(x · scale)``) BEFORE accumulation. Integer
sums are exact and associative — the aggregated Gram matrix is
bit-identical regardless of partitioning, and the eigendecomposition of an
identical matrix is deterministic on a fixed BLAS. Overflow headroom: with
|x| ≤ 3 and scale=1000, q·q ≤ 1e7 per term, so int64 holds ~9e11 rows.

No analog in the reference (keboola/db-writer-redshift delegates all
compute to Redshift, which has no linear-algebra surface); this extends
SURVEY.md §2.4's embedding track.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Row-id sentinels in the (i, j, s) summary stream: COUNT_ROW carries the
# vector count, (i, SUM_COL) rows carry per-dimension quantized sums.
COUNT_ROW = -2
SUM_COL = -1

_SUMMARY_SCHEMA = "i int, j int, s long"


def gram_summary(df: DataFrame, vec_col: str, dim: int, scale: int = 1000) -> DataFrame:
    """One-pass (Gram, sums, count) summary of a vector column.

    Returns a DataFrame of ``(i, j, s)`` rows: the full quantized Gram
    matrix (``0 ≤ i, j < dim``), per-dimension sums (``j = SUM_COL``) and
    the row count (``i = j = COUNT_ROW``) — everything PCA needs to center
    on the driver, produced in a single scan.

    The per-batch GEMM runs in float64 (BLAS) and is exact because every
    partial sum stays below 2⁵³ (q·q ≤ scale²·|x|²_max, batches ≤ ~10⁵
    rows); results are rounded back to int64 before cross-batch summing.
    """

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = np.zeros((dim, dim), dtype=np.int64)
        sums = np.zeros(dim, dtype=np.int64)
        count = 0
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if mat.shape[1] != dim:
                raise ValueError(
                    f"expected {dim}-dim vectors, got {mat.shape[1]}"
                )
            q = np.rint(mat * scale)
            gram += np.rint(q.T @ q).astype(np.int64)
            sums += q.sum(axis=0).astype(np.int64)
            count += len(pdf)
        if count == 0:
            return
        ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
        out = pd.DataFrame(
            {"i": ii.ravel(), "j": jj.ravel(), "s": gram.ravel()}
        )
        extra = pd.DataFrame(
            {
                "i": np.concatenate([np.arange(dim), [COUNT_ROW]]),
                "j": np.concatenate(
                    [np.full(dim, SUM_COL), [COUNT_ROW]]
                ),
                "s": np.concatenate([sums, [count]]),
            }
        )
        yield pd.concat([out, extra], ignore_index=True)

    partials = df.select(F.col(vec_col).alias(vec_col)).mapInPandas(
        part, schema=_SUMMARY_SCHEMA
    )
    return partials.groupBy("i", "j").agg(F.sum("s").alias("s"))


def pca_eigvals(
    df: DataFrame, vec_col: str, dim: int, scale: int = 1000
) -> tuple[np.ndarray, np.ndarray, int]:
    """Principal-component eigenvalues/vectors of a vector column.

    Aggregates the exact-integer Gram summary (one distributed pass), then
    forms the mean-centered covariance and eigendecomposes on the driver:
    ``C = (G/s² − n·μμᵀ) / (n−1)`` with ``μ = sums / (n·s)``. Only d²+d+1
    summary integers cross the cluster→driver boundary.

    Returns ``(eigvals_desc, eigvecs, n)``; eigvecs columns are the
    components, ordered by descending eigenvalue.
    """
    rows = gram_summary(df, vec_col, dim, scale).collect()
    gram = np.zeros((dim, dim), dtype=np.float64)
    sums = np.zeros(dim, dtype=np.float64)
    n = 0
    for r in rows:
        if r.i == COUNT_ROW:
            n = int(r.s)
        elif r.j == SUM_COL:
            sums[r.i] = float(r.s)
        else:
            gram[r.i, r.j] = float(r.s)
    if n < 2:
        raise ValueError(f"PCA needs ≥2 vectors, got {n}")
    mu = sums / (n * scale)
    cov = (gram / (scale * scale) - n * np.outer(mu, mu)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    return vals[order], vecs[:, order], n


def ridge_fit(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    dim: int,
    lam: float | None = None,
    scale: int = 1000,
) -> tuple[np.ndarray, int]:
    """Closed-form ridge regression of an integer label on a vector
    column — the full-dimensional linear quality probe (FineWeb-Edu /
    DataComp-LM classifier-filter practice; the 3-feature oracle-exact
    Cramer variant is plans/lm_curation.quality_linear_probe).

    One distributed pass accumulates the exact-integer normal-equation
    moments per Arrow batch (GEMM for XtX, matvec for Xty — the
    gram_summary pattern extended with a label row); only d² + d + 1
    integers reach the driver, where numpy solves
    ``(XtX + lam·I) w = Xty``. ``lam`` defaults to n (unit ridge on
    averaged moments, invariant to corpus size). Weights are in
    quantized-feature units (features scaled by ``scale``); divide by
    ``scale`` for raw-unit weights.

    Exactness: per-batch float64 GEMM partials stay below 2⁵³
    (|q| ≤ scale·|x|_max, batch ≤ ~10⁵ rows) and are rounded back to
    int64 before cross-batch summing, so the aggregated moments are
    bit-identical regardless of partitioning; the solve of an identical
    system is deterministic on a fixed BLAS.
    """

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = np.zeros((dim, dim), dtype=np.int64)
        xty = np.zeros(dim, dtype=np.int64)
        count = 0
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if mat.shape[1] != dim:
                raise ValueError(f"expected {dim}-dim vectors, got {mat.shape[1]}")
            q = np.rint(mat * scale)
            y = pdf[label_col].to_numpy().astype(np.float64)
            gram += np.rint(q.T @ q).astype(np.int64)
            xty += np.rint(q.T @ y).astype(np.int64)
            count += len(pdf)
        if count == 0:
            return
        ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
        out = pd.DataFrame({"i": ii.ravel(), "j": jj.ravel(), "s": gram.ravel()})
        extra = pd.DataFrame(
            {
                "i": np.concatenate([np.arange(dim), [COUNT_ROW]]),
                "j": np.concatenate([np.full(dim, SUM_COL), [COUNT_ROW]]),
                "s": np.concatenate([xty, [count]]),
            }
        )
        yield pd.concat([out, extra], ignore_index=True)

    rows = (
        df.select(vec_col, label_col)
        .mapInPandas(part, schema=_SUMMARY_SCHEMA)
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    gram = np.zeros((dim, dim), dtype=np.float64)
    xty = np.zeros(dim, dtype=np.float64)
    n = 0
    for r in rows:
        if r.i == COUNT_ROW:
            n = int(r.s)
        elif r.j == SUM_COL:
            xty[r.i] = float(r.s)
        else:
            gram[r.i, r.j] = float(r.s)
    if n < 1:
        raise ValueError("ridge_fit needs >= 1 row")
    if lam is None:
        lam = float(n)
    w = np.linalg.solve(gram + lam * np.eye(dim), xty)
    return w, n
