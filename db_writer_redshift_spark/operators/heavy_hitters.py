"""Two-pass exact heavy hitters: Misra–Gries candidates + exact recount.

The scale problem: "which tokens appear in more than n/θ of the corpus"
naively needs a full groupBy over every token occurrence — at 100 TB the
shuffle carries billions of distinct keys to count a handful of winners.

The classic fix (Misra–Gries 1982): stream each partition through a
k-counter summary — any item with partition frequency > n_p/k survives.
If a token's GLOBAL frequency exceeds n/k it must exceed the local
threshold in at least one partition (pigeonhole over the average), so the
union of per-partition survivor sets is a SUPERSET of the true heavy
hitters regardless of partitioning. Pass 2 recounts exactly, but only
over the (tiny, broadcastable) candidate set — the big shuffle never
happens.

Determinism: the candidate set varies with partitioning, but the FINAL
output does not — every true heavy hitter is guaranteed a candidate, the
recount is exact, and the threshold filter discards the rest. Hence the
registered query carries a full DuckDB oracle (plain GROUP BY/HAVING)
even though pass 1 is an approximate sketch.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(capacity: int):
    """Per-partition Misra–Gries summary over an item column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for item in pdf["item"]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < capacity:
                    counters[item] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame({"item": list(counters.keys())})

    return run


def heavy_hitters(
    items: DataFrame, item_col: str, threshold_denom: int, capacity: int | None = None
) -> DataFrame:
    """Items occurring more than ``n / threshold_denom`` times, with exact
    counts: ``(item, cnt, n_total)`` — deterministic by construction.

    ``capacity`` defaults to ``2 * threshold_denom`` (any value ≥
    threshold_denom preserves the superset guarantee; headroom shrinks
    the recount set's false-candidate tail).
    """
    cap = capacity or 2 * threshold_denom
    src = items.select(F.col(item_col).cast("string").alias("item"))
    candidates = (
        src.mapInPandas(_mg_partition(cap), schema="item string").distinct()
    )
    total = src.agg(F.count("*").alias("n_total"))
    counted = (
        src.join(F.broadcast(candidates), "item")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * threshold_denom > F.col("n_total"))
        .select("item", "cnt", "n_total")
    )
