"""Data-mix allocation operators.

Water-filling (source capping): given per-source token counts and a
global budget, find the common integer level T so each source keeps
``min(tokens, T)`` (plus a deterministic remainder distribution) and
the allocations sum exactly to the budget — the standard source-cap
rule in LLM data mixing (small sources keep everything; oversized
sources are capped at a COMMON level rather than proportionally).

All arithmetic is BIGINT (sort, prefix sums, floor divisions), so the
DuckDB oracle in plans/llm_ops.mix_token_budget_waterfill computes the
identical allocation. The windows run over the per-source AGGREGATE —
one row per source, bounded by the source catalog, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def waterfill_allocation(per_src: DataFrame, budget: Column) -> DataFrame:
    """Allocate ``budget`` tokens across sources by water-filling.

    ``per_src``: (source, n_tokens) with BIGINT counts. ``budget``: an
    aggregate expression over per_src (e.g. 60% of the total). Returns
    (source, n_tokens, alloc_tokens, is_capped) with
    ``sum(alloc_tokens) == budget`` whenever budget ≤ total.

    Cut selection: sources sort ascending by (tokens, source); trial
    level at cut p is ``(B - prefix_{p-1}) div (n-p+1)``; the chosen cut
    is the LAST position whose trial level covers the previous source.
    The floor-division remainder goes one token each to the first capped
    sources in sort order.
    """
    tot = per_src.agg(
        F.count("*").alias("n_sources"), budget.alias("budget")
    )
    w = Window.orderBy("n_tokens", "source")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = (
        per_src.crossJoin(F.broadcast(tot))
        .withColumn("pos", F.row_number().over(w))
        .withColumn("prefix", F.sum("n_tokens").over(wsum).cast("long"))
        .withColumn("prev_tokens", F.lag("n_tokens", 1, 0).over(w))
    )
    level = F.expr("(budget - (prefix - n_tokens)) div (n_sources - pos + 1)")
    cand = ranked.select(
        "pos",
        (F.col("prefix") - F.col("n_tokens")).alias("pk"),
        level.alias("level"),
        (F.col("n_sources") - F.col("pos") + 1).alias("m"),
    ).filter(level >= F.col("prev_tokens"))
    lvl = (
        cand.orderBy(F.col("pos").desc())
        .limit(1)
        .select(
            F.col("pos").alias("cut_pos"),
            "level",
            (F.col("pk") + F.col("m") * F.col("level")).alias("consumed"),
        )
        .crossJoin(F.broadcast(tot.select("budget")))
        .select(
            "cut_pos",
            "level",
            (F.col("budget") - F.col("consumed")).alias("remainder"),
        )
    )
    out = ranked.crossJoin(F.broadcast(lvl))
    extra = F.when(
        F.col("pos") - F.col("cut_pos") + 1 <= F.col("remainder"), F.lit(1)
    ).otherwise(F.lit(0))
    return out.select(
        "source",
        "n_tokens",
        F.when(F.col("pos") < F.col("cut_pos"), F.col("n_tokens"))
        .otherwise(F.least(F.col("n_tokens"), F.col("level") + extra))
        .cast("long")
        .alias("alloc_tokens"),
        F.when(
            (F.col("pos") >= F.col("cut_pos"))
            & (F.col("n_tokens") > F.col("level")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_capped"),
    )


def token_budget_gate_fold(
    docs: DataFrame,
    id_col: str,
    source_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Batch twin of streaming.stream_token_budget_gate: per-source
    LIFETIME token-budget admission, replayed as one deterministic
    relation. Docs are scanned in ``id_col`` order within each source
    (the gate's own tie-break — it sorts each micro-batch by doc_id);
    a doc is ADMITTED iff the source's running total of ADMITTED tokens
    plus its own stays within ``budget``. Rejected docs do NOT consume
    budget, and scanning continues — a smaller later doc may still fit
    (the gate's exact skip semantics), which is why this is a
    conditional fold, not a windowed cumsum with a cutoff.

    Returns (doc_id, source, n_tokens, admitted, used_after) for every
    input doc; used_after is the post-decision running total, making the
    state trajectory itself value-hash-checkable.

    Scale: applyInPandas keyed by source — embarrassingly parallel
    ACROSS sources, sequential within one (inherent to the semantics:
    it IS the streaming gate's per-key state scan). Source groups are
    bounded by per-source corpus size; at the scale where one source's
    rows exceed executor memory, run the streaming gate (bounded
    ValueState) instead — the two are proven equivalent in
    tests/test_budget_gate_twin.py."""
    import pandas as pd

    src = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(source_col).alias("source"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )

    def gate(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        used = 0
        admitted, used_after = [], []
        for n in pdf["n_tokens"]:
            if used + int(n) <= budget:
                used += int(n)
                admitted.append(1)
            else:
                admitted.append(0)
            used_after.append(used)
        pdf["admitted"] = pd.array(admitted, dtype="int32")
        pdf["used_after"] = pd.array(used_after, dtype="int64")
        return pdf

    return src.groupBy("source").applyInPandas(
        gate,
        schema=(
            "doc_id long, source string, n_tokens long, "
            "admitted int, used_after long"
        ),
    )
