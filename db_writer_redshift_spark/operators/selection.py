"""Exact distributed selection: k-th smallest / discrete quantiles
without a global sort.

``percentile_approx`` trades exactness for one pass; a global sort is
exact but shuffles the entire column. The classic middle road is
iterative histogram selection (distributed quickselect): each round
partitions the current candidate range into B equi-width buckets with one
map-side-combined aggregate, locates the bucket containing the k-th
value, and recurses into it. For 64-bit integers the range shrinks ≥B×
per round, so ≤ log_B(range) rounds — each a single scan-and-agg whose
shuffle is B rows. No data is ever sorted or collected.

Determinism: inputs are integers (callers quantize decimals/doubles
first — the house rule for cross-engine exactness), counts are exact,
and the k-th smallest of a multiset is unique — so the result matches
DuckDB's ``quantile_disc`` bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 256


def disc_rank(n: int, p: float) -> int:
    """The exact 1-based rank the ``CUME_DIST() >= p`` window predicate
    selects: min k with k/n >= p under IEEE double division — replicated
    driver-side with the same double arithmetic so a quickselect path is
    bit-equal to the window path (and to the DuckDB oracle). Shared by
    every PERCENTILE_DISC-style dual-path query (trimmed/winsorized,
    kappa median, gini thresholds)."""
    import math

    k = max(1, min(n, math.ceil(p * n)))
    while k > 1 and (k - 1) / n >= p:
        k -= 1
    while k / n < p:
        k += 1
    return k


def kth_smallest(df: DataFrame, col: str, k: int) -> int:
    """Exact k-th smallest (1-based) of an integer column.

    Each round runs one aggregate job over the rows still in range; the
    driver keeps only the B-row histogram. Rows ≤ current lo are counted
    out exactly, so k shrinks as the range narrows.
    """
    n = df.filter(F.col(col).isNotNull())
    total = n.count()
    if not (1 <= k <= total):
        raise ValueError(f"k={k} out of range for {total} non-null rows")
    bounds = n.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    lo, hi = int(bounds.lo), int(bounds.hi)
    while lo < hi:
        span = hi - lo + 1
        width = max(1, -(-span // _BUCKETS))  # ceil div
        hist = (
            n.filter((F.col(col) >= lo) & (F.col(col) <= hi))
            .groupBy(((F.col(col) - lo) / width).cast("long").alias("b"))
            .agg(F.count("*").alias("c"))
            .collect()
        )
        counts = {int(r.b): int(r.c) for r in hist}
        running = 0
        for b in sorted(counts):
            if running + counts[b] >= k:
                k -= running
                lo, hi = lo + b * width, min(hi, lo + (b + 1) * width - 1)
                break
            running += counts[b]
        else:  # pragma: no cover — k validated above
            raise AssertionError("histogram lost the target rank")
        if hi - lo + 1 <= _BUCKETS:
            # final round: exact counts per value
            vals = (
                n.filter((F.col(col) >= lo) & (F.col(col) <= hi))
                .groupBy(F.col(col).alias("v"))
                .agg(F.count("*").alias("c"))
                .collect()
            )
            running = 0
            for r in sorted(vals, key=lambda r: int(r.v)):
                running += int(r.c)
                if running >= k:
                    return int(r.v)
    return lo


def quantile_disc(df: DataFrame, col: str, q: float) -> int:
    """Discrete quantile: smallest value whose cumulative frequency
    reaches ``q`` (DuckDB ``quantile_disc`` semantics — k = ceil(q·n))."""
    if not (0.0 < q <= 1.0):
        raise ValueError(f"q must be in (0, 1], got {q}")
    import math

    total = df.filter(F.col(col).isNotNull()).count()
    k = max(1, math.ceil(q * total - 1e-9))
    return kth_smallest(df, col, k)


def pareto_frontier(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Exact 2-D Pareto frontier (skyline, Börzsönyi et al. 2001) per
    group, maximizing both ``x_col`` and ``y_col``: the points no other
    point in the group weakly dominates (≥ on both axes, > on at least
    one).

    Two-dimensional skyline reduces to a prefix maximum: after
    collapsing to one row per (group, x) carrying ymax = MAX(y), a
    point survives iff its ymax strictly exceeds the running MAX(ymax)
    over all strictly-greater x — computed with one window over the
    pre-aggregated points. No pairwise dominance join, no quadratic
    blow-up.

    Returns (group, x, max_y, n_docs, frontier_rank): n_docs counts the
    rows sitting exactly at the frontier point (x, max_y);
    frontier_rank orders the frontier by x descending.

    Scale: the (group, x, y) pre-aggregation is map-side combinable and
    shrinks the window input to the distinct-(x) cardinality per group
    — bounded by the score domain, not the corpus; the windows then
    run over that reduced set. All arithmetic integer-exact.
    """
    from pyspark.sql.window import Window

    xy = df.groupBy(group_col, x_col, y_col).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    pts = xy.groupBy(group_col, x_col).agg(
        F.max(y_col).alias("max_y"),
        F.expr(f"max_by(n_docs, {y_col})").cast("long").alias("n_docs"),
    )
    prev = Window.partitionBy(group_col).orderBy(F.col(x_col).desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    rank_w = Window.partitionBy(group_col).orderBy(F.col(x_col).desc())
    return (
        pts.withColumn("__prev", F.max("max_y").over(prev))
        .filter(F.col("__prev").isNull() | (F.col("max_y") > F.col("__prev")))
        .select(
            group_col,
            x_col,
            "max_y",
            "n_docs",
            F.row_number().over(rank_w).cast("long").alias("frontier_rank"),
        )
    )


def quantiles_disc_multi(df: DataFrame, col: str, qs: list[float]) -> list[int]:
    """Exact discrete quantiles for MANY ``q`` values in shared passes.

    Running ``quantile_disc`` per quantile rescans the table ~3 times
    per target; for an equi-depth histogram's 9 boundaries that is ~27
    scan-and-agg jobs. This variant advances ALL targets per round with
    ONE aggregate: every unresolved quantile tracks its own candidate
    range, ranges are identical-or-disjoint by construction (each is a
    bucket path of the same initial partition), so one scan groups rows
    by (range_index, bucket) and the driver narrows every target from
    the same B×|ranges|-row histogram. Rounds ~ log_B(span) as before,
    total jobs ~ rounds + 2, independent of |qs|.

    Semantics per target are identical to ``quantile_disc`` (DuckDB
    ``quantile_disc``: k = ceil(q·n), unique k-th smallest of the
    integer multiset), so results are bit-equal to the one-at-a-time
    form — asserted in tests.
    """
    import math

    for q in qs:
        if not (0.0 < q <= 1.0):
            raise ValueError(f"q must be in (0, 1], got {q}")
    n = df.filter(F.col(col).isNotNull())
    total = n.count()
    if total == 0:
        raise ValueError("quantiles_disc_multi: no non-null rows")
    ks = [max(1, math.ceil(q * total - 1e-9)) for q in qs]
    return kths_smallest_multi(df, col, ks, _total=total)


def kths_smallest_multi(
    df: DataFrame,
    col: str,
    ks: list[int],
    _total: int | None = None,
    weight_col: str | None = None,
) -> list[int]:
    """Exact k-th smallest for MANY ranks in the same shared rounds as
    ``quantiles_disc_multi`` (which delegates here after mapping each
    quantile to its rank). Accepts arbitrary 1-based ranks — e.g. the
    adjacent order statistics an interpolated quantile needs.

    With ``weight_col``, ranks are WEIGHT ranks (1 <= k <= total
    weight) and every histogram aggregates SUM(weight) instead of
    COUNT — the shared-round form of ``kth_weighted_smallest``."""
    n = df.filter(F.col(col).isNotNull())
    if weight_col is not None:
        n = n.filter(F.col(weight_col) > 0)
        wexpr = F.sum(weight_col).cast("long")
    else:
        wexpr = F.count("*").cast("long")
    if _total is not None:
        total = _total
    elif weight_col is not None:
        total = int(n.agg(F.sum(weight_col).cast("long")).collect()[0][0] or 0)
    else:
        total = n.count()
    for k in ks:
        if not (1 <= k <= total):
            raise ValueError(f"k={k} out of range for total {total}")
    bounds = n.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    glo, ghi = int(bounds.lo), int(bounds.hi)
    # state per target: [lo, hi, k] with k relative to rows >= lo in range
    state = [[glo, ghi, k] for k in ks]

    while True:
        unresolved = [i for i, (lo, hi, _) in enumerate(state) if lo < hi]
        if not unresolved:
            break
        # identical-or-disjoint ranges — dedupe
        ranges = sorted({(state[i][0], state[i][1]) for i in unresolved})
        widths = {r: max(1, -(-(r[1] - r[0] + 1) // _BUCKETS)) for r in ranges}
        # one aggregate: (range_idx, bucket) -> count
        ridx = None
        for j, (lo, hi) in enumerate(ranges):
            cond = (F.col(col) >= lo) & (F.col(col) <= hi)
            ridx = F.when(cond, j) if ridx is None else ridx.when(cond, j)
        bexpr = None
        for j, r in enumerate(ranges):
            b = ((F.col(col) - r[0]) / widths[r]).cast("long")
            bexpr = F.when(ridx == j, b) if bexpr is None else bexpr.when(ridx == j, b)
        hist = (
            n.filter(ridx.isNotNull())
            .groupBy(ridx.alias("r"), bexpr.alias("b"))
            .agg(wexpr.alias("c"))
            .collect()
        )
        counts: dict[int, dict[int, int]] = {}
        for row in hist:
            counts.setdefault(int(row.r), {})[int(row.b)] = int(row.c)
        for i in unresolved:
            lo, hi, k = state[i]
            j = ranges.index((lo, hi))
            width = widths[(lo, hi)]
            running = 0
            for b in sorted(counts.get(j, {})):
                c = counts[j][b]
                if running + c >= k:
                    state[i] = [
                        lo + b * width,
                        min(hi, lo + (b + 1) * width - 1),
                        k - running,
                    ]
                    break
                running += c
            else:  # pragma: no cover — k validated against total
                raise AssertionError("histogram lost the target rank")
    return [lo for lo, _, _ in state]


def kth_weighted_smallest(df: DataFrame, col: str, weight_col: str, k: int) -> int:
    """Exact WEIGHTED k-th smallest: the smallest value v such that the
    total weight of rows with value <= v reaches ``k`` (1 <= k <= total
    weight, integer weights >= 1). Same iterative-histogram plan as
    ``kth_smallest`` with SUM(weight) per bucket instead of COUNT —
    per round one map-side-combined aggregate, a B-row exchange, no
    sort. The weighted quantile every size-aware percentile needs
    (docs weighted by tokens, files by bytes, orders by value)."""
    n = df.filter(F.col(col).isNotNull() & (F.col(weight_col) > 0))
    total = n.agg(F.sum(weight_col).cast("long")).collect()[0][0] or 0
    if not (1 <= k <= total):
        raise ValueError(f"k={k} out of range for total weight {total}")
    bounds = n.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    lo, hi = int(bounds.lo), int(bounds.hi)
    while lo < hi:
        span = hi - lo + 1
        width = max(1, -(-span // _BUCKETS))
        hist = (
            n.filter((F.col(col) >= lo) & (F.col(col) <= hi))
            .groupBy(((F.col(col) - lo) / width).cast("long").alias("b"))
            .agg(F.sum(weight_col).cast("long").alias("w"))
            .collect()
        )
        weights = {int(r.b): int(r.w) for r in hist}
        running = 0
        for b in sorted(weights):
            if running + weights[b] >= k:
                k -= running
                lo, hi = lo + b * width, min(hi, lo + (b + 1) * width - 1)
                break
            running += weights[b]
        else:  # pragma: no cover — k validated above
            raise AssertionError("weighted histogram lost the target rank")
    return lo


def weighted_quantile_disc(
    df: DataFrame, col: str, weight_col: str, q: float
) -> int:
    """Weighted discrete quantile: smallest value whose cumulative
    WEIGHT reaches q of the total (k = ceil(q * W))."""
    return weighted_quantiles_disc_multi(df, col, weight_col, [q])[0]


def weighted_quantiles_disc_multi(
    df: DataFrame, col: str, weight_col: str, qs: list[float]
) -> list[int]:
    """Weighted discrete quantiles for MANY ``q`` in SHARED rounds —
    the weighted twin of ``quantiles_disc_multi``: all targets advance
    from one SUM(weight) histogram per round."""
    import math

    for q in qs:
        if not (0.0 < q <= 1.0):
            raise ValueError(f"q must be in (0, 1], got {q}")
    total = (
        df.filter(F.col(col).isNotNull() & (F.col(weight_col) > 0))
        .agg(F.sum(weight_col).cast("long"))
        .collect()[0][0]
        or 0
    )
    if total == 0:
        raise ValueError("weighted_quantiles_disc_multi: zero total weight")
    ks = [max(1, math.ceil(q * total - 1e-9)) for q in qs]
    return kths_smallest_multi(
        df, col, ks, _total=total, weight_col=weight_col
    )
