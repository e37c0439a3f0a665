"""Vector math over array<float|double> columns, built from F.zip_with /
F.transform / F.aggregate so the arithmetic runs inside the JVM.

Determinism note (load-bearing for the DuckDB oracle): ``F.aggregate`` is a
sequential left fold, byte-identical to DuckDB's ``list_reduce`` over the
same doubles — verified bit-exact. Never replace these with a parallel /
reordered reduction when an oracle comparison depends on them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_double(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_double(a: Column) -> Column:
    """L2 norm (sqrt is IEEE-754 correctly rounded — engine-portable)."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero-norm vectors."""
    denom = norm_double(a) * norm_double(b)
    return F.when(denom > 0, dot_double(a, b) / denom)


def dot_double_fixed(a: Column, b: Column, dim: int) -> Column:
    """``dot_double`` unrolled for KNOWN fixed-width arrays: the same
    left-associated sequential sum ``((0.0 + a0·b0) + a1·b1) + …`` written
    as a flat codegen'd scalar expression instead of an interpreted
    ``F.aggregate``/``F.zip_with`` lambda chain.

    Bit-identical to ``dot_double`` (same operand order, same IEEE-754
    additions — validated exhaustively on the fixture corpus and on 1M
    synthetic pairs in tests/test_vector_unrolled.py), but ~3.3× faster
    per pair (guide §4.1: higher-order-function lambdas are evaluated
    per element outside whole-stage codegen; a flat arithmetic chain
    compiles into the stage). Per-pair cost is what dominates the k-NN /
    LSH-refine joins, where every candidate pair pays one dot.

    ONLY safe when every array has exactly ``dim`` elements: ``F.get``
    past the end yields NULL and would null the whole sum where the fold
    would sum the shorter array. Callers pass the same ``dim`` their
    blocking/hyperplane stage already requires.
    """
    expr: Column = F.lit(0.0)
    for i in range(dim):
        expr = expr + F.get(a, i).cast("double") * F.get(b, i).cast("double")
    return expr


def norm_double_fixed(a: Column, dim: int) -> Column:
    """``norm_double`` unrolled for KNOWN fixed-width arrays — same
    sequential left-fold sum of squares, as a flat codegen expression.
    Bit-identical (see dot_double_fixed); same fixed-width caveat."""
    expr: Column = F.lit(0.0)
    for i in range(dim):
        x = F.get(a, i).cast("double")
        expr = expr + x * x
    return F.sqrt(expr)
