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
