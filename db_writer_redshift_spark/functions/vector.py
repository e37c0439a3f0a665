"""Vector math over array<float|double> columns, built from F.zip_with /
F.transform / F.aggregate so the arithmetic runs inside the JVM.

Determinism note (load-bearing for the DuckDB oracle): ``F.aggregate`` is a
sequential left fold, byte-identical to DuckDB's ``list_reduce`` over the
same doubles — verified bit-exact. Never replace these with a parallel /
reordered reduction when an oracle comparison depends on them.

Round-8 negative result, recorded so it is not retried: unrolling these
folds into flat ``((0+t0)+t1)+…`` scalar chains for the known 64-wide
fixture arrays is bit-identical and won an isolated microbench 3×, but
measured SLOWER in every real query context (brute-force exec 0.73→1.12 s,
portable IVF 1.09→1.79 s, iterative k-means 8.9→54 s at sf0.1): 300+-op
generated methods fall out of whole-stage codegen / JIT compilation, and
per-invocation construction must be a single F.expr SQL string or ~6·dim
py4j round trips dominate the driver. Full numbers in OPTIMIZATION_r08.md.
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
