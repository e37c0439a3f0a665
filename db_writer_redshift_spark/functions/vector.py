"""Vector math over array<float|double> columns, built from F.zip_with /
F.transform / F.aggregate so the arithmetic runs inside the JVM.

Determinism note (load-bearing for the DuckDB oracle): ``F.aggregate`` is a
sequential left fold, byte-identical to DuckDB's ``list_reduce`` over the
same doubles — verified bit-exact. Never replace these with a parallel /
reordered reduction when an oracle comparison depends on them.

The ``*_fixed`` variants below are the round-8 fast path for KNOWN
fixed-width arrays: the same left-associated sequential sum written as one
flat scalar expression, so it compiles into whole-stage codegen instead of
being interpreted per element (guide §4.1). Two implementation rules,
both measured:

* the chain is built as ONE SQL string handed to ``F.expr`` — composing it
  from ~6·dim Column operator calls costs ~6·dim py4j round trips
  (measured 2.5 s of DRIVER time for dim=64, vs 8 ms for the string);
* it is only legal where every array has exactly ``dim`` elements
  (``get`` past the end yields NULL and nulls the whole sum where a fold
  would sum the shorter array), and only a clear win when the operand
  columns are plain stored/cached columns — referencing a heavy
  transform-derived alias ``dim`` times invites projection collapse to
  inline it per element (observed codegen OOM; keep the fold there).
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


def sql_ident(name: str) -> str:
    """Backtick-quote a (possibly alias-qualified) column name for use
    inside the generated chain expressions."""
    return ".".join(f"`{part}`" for part in name.split("."))


def dot_double_fixed(a: str, b: str, dim: int) -> Column:
    """``dot_double`` unrolled for KNOWN fixed-width arrays: the same
    left-associated sequential sum ``((0.0 + a0·b0) + a1·b1) + …`` as one
    flat codegen'd scalar expression (see the module docstring for why it
    is a single SQL string and when it is legal).

    Bit-identical to ``dot_double`` — same operand order, same IEEE-754
    additions; validated on adversarial cases and the full fixture
    all-pairs sweep in tests/test_vector_unrolled.py — and ~3.3× faster
    per pair, which is what dominates k-NN / LSH-refine joins.

    ``a``/``b`` are column NAMES (optionally alias-qualified).
    """
    qa, qb = sql_ident(a), sql_ident(b)
    terms = " + ".join(
        f"(CAST(get({qa}, {i}) AS DOUBLE) * CAST(get({qb}, {i}) AS DOUBLE))"
        for i in range(dim)
    )
    return F.expr(f"CAST(0.0 AS DOUBLE) + {terms}")


def dot_long_fixed(a: str, b: str, dim: int) -> Column:
    """Exact integer dot product of two KNOWN fixed-width BIGINT arrays as
    a flat codegen chain. Integer addition is order-independent, so this
    is IDENTICAL (not merely bit-identical) to any fold over the same
    products; same fixed-width caveat as dot_double_fixed."""
    qa, qb = sql_ident(a), sql_ident(b)
    terms = " + ".join(f"(get({qa}, {i}) * get({qb}, {i}))" for i in range(dim))
    return F.expr(f"CAST(0 AS BIGINT) + {terms}")


def sqdist_long_fixed(a: str, b: str, dim: int) -> Column:
    """Exact integer squared L2 distance of two KNOWN fixed-width BIGINT
    arrays — same contract as dot_long_fixed."""
    qa, qb = sql_ident(a), sql_ident(b)
    terms = " + ".join(
        f"((get({qa}, {i}) - get({qb}, {i})) * (get({qa}, {i}) - get({qb}, {i})))"
        for i in range(dim)
    )
    return F.expr(f"CAST(0 AS BIGINT) + {terms}")


def norm_double_fixed(a: str, dim: int) -> Column:
    """``norm_double`` unrolled for KNOWN fixed-width arrays — same
    sequential left-fold sum of squares, as a flat codegen expression.
    Bit-identical (see dot_double_fixed); same fixed-width caveat."""
    qa = sql_ident(a)
    terms = " + ".join(
        f"(CAST(get({qa}, {i}) AS DOUBLE) * CAST(get({qa}, {i}) AS DOUBLE))"
        for i in range(dim)
    )
    return F.expr(f"SQRT(CAST(0.0 AS DOUBLE) + {terms})")
