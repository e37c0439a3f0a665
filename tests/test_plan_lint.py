"""Plan lints over every registered query, one plan build per query.

1. No CartesianProduct — the one join strategy that cannot survive scale.
   (Intentional 1-row threshold cross joins plan as BroadcastNestedLoopJoin
   over a broadcast scalar, which is fine and specifically allowed.)

2. No explicit broadcast hint over an UNBOUNDED fact-table subtree
   (lineitem/orders/events/documents/embeddings). This is the guard the
   round-6 verdict asked for: q3 used to force-broadcast the
   orders⋈customer join result and q5 the full customer table — correct
   at sf0.1, a guaranteed driver OOM at 100× because the broadcast side
   grows linearly with data size. A hinted subtree that contains a fact
   scan is allowed only when something between the scan and the hint
   bounds its cardinality independently of sf:

   * a bounded reducer node — Aggregate (group count is bounded by the
     grouping domain), GlobalLimit, Deduplicate over a bounded key,
     Sample, or Window-over-aggregate top-k; or
   * the documented eval/query-sample pattern ``Filter (id % K == 0)``,
     which stands in for a constant-size eval/query table (decontam eval
     sets, ANN query legs, bitext seed side). In production those are
     fixed small tables; the modulo filter is how the synthetic harness
     derives one. Each such operator documents the broadcast-side bound
     in its docstring; or
   * the seed/centroid-selection pattern ``Filter (id < K)`` with an
     integer literal bound (kmeans/SemDeDup/D4 fixed-seed centroids,
     mix_cluster_balance_weights' lowest-8 centroids). The bound is a
     compile-time constant in the plan; where the Python code grows K
     with the corpus (SemDeDup's k = n/64), the operator's docstring
     documents the 100 TB swap to IVF/kmeans_fit centroids.

   Everything else fails: a raw or filter-only fact subtree under an
   explicit F.broadcast is exactly the q3/q5 bug class.
"""

from __future__ import annotations

import os
import re

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata missing: {SF_DIR}"
)

# Columns that only a fact-table scan can introduce (TESTDATA.md schema).
FACT_MARKERS = ("l_orderkey#", "o_orderkey#", "event_id#", "doc_id#", "vec_id#")

# Logical nodes that bound the subtree's cardinality independently of sf.
BOUNDED_NODES = ("Aggregate", "GlobalLimit", "Deduplicate", "Sample", "Window")

# The documented constant-size eval/query-sample filter:  (col % K) = 0,
# possibly through casts, e.g.  Filter ((vec_id#18L % cast(50 as bigint)) =
# cast(0 as bigint))  or  Filter ((label#271 % 2) = 0).
_MOD_SAMPLE = re.compile(r"Filter .*%[^)]*\)+\s*=\s*(?:cast\()?0")

# Seed/centroid selection: an id column upper-bounded by an integer
# literal, e.g.  Filter (vec_id#18L < 8)  or  < cast(32 as bigint).
_SEED_BOUND = re.compile(
    r"Filter .*(?:vec_id|doc_id|event_id|user_id)#\d+L?\)?\s*<\s*(?:cast\()?\d+"
)


# Plans whose trees take >5s just to BUILD (iterative trajectory plans
# with hundreds of operators) — slow-marked so the default gate keeps
# the no-CartesianProduct guard over the other ~350 queries cheaply.
_HEAVY_PLANS = {
    "selection_mmr_trajectory",
    "coreset_kcenter_trajectory",
    "kmeans_fit_clusters",
    "kmeans_fit_portable_stats",
}


def _names():
    import __spark_entry__ as entry_mod

    return [
        pytest.param(n, marks=pytest.mark.slow) if n in _HEAVY_PLANS else n
        for n in entry_mod.queries()
    ]


def _broadcast_hint_subtrees(plan_str: str) -> list[str]:
    """Extract each ResolvedHint(broadcast) node's subtree from the
    analyzed-plan string using the tree indentation."""
    lines = plan_str.splitlines()
    subtrees = []
    for i, line in enumerate(lines):
        if "ResolvedHint" in line and "broadcast" in line.lower():
            indent = len(line) - len(line.lstrip(" :+-"))
            block = [line]
            for nxt in lines[i + 1 :]:
                nxt_indent = len(nxt) - len(nxt.lstrip(" :+-"))
                if nxt.strip() and nxt_indent <= indent:
                    break
                block.append(nxt)
            subtrees.append("\n".join(block))
    return subtrees


@pytest.mark.parametrize("name", _names())
def test_plan_lint(spark, name):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()[name](spark, SF_DIR)
    qe = df._jdf.queryExecution()

    physical = qe.executedPlan().toString()
    assert "CartesianProduct" not in physical, f"{name} plans a CartesianProduct"

    analyzed = qe.analyzed().toString()
    for subtree in _broadcast_hint_subtrees(analyzed):
        if not any(marker in subtree for marker in FACT_MARKERS):
            continue  # dim-only broadcast: always fine
        if "Relation" not in subtree and (
            "LogicalRDD" in subtree or "LocalRelation" in subtree
        ):
            # Driver-local collected relation with NO table scan under
            # the hint: bounded by construction — it already lives on
            # the driver (e.g. bm25_bigram_topk's materialized
            # |queries|·k result, round 8). A scan-bearing subtree never
            # takes this branch.
            continue
        if any(node in subtree for node in BOUNDED_NODES):
            continue  # bounded reducer between scan and hint
        if _MOD_SAMPLE.search(subtree):
            continue  # documented constant-size eval/query sample
        if _SEED_BOUND.search(subtree):
            continue  # literal-bounded seed/centroid selection
        head = "\n".join(subtree.splitlines()[:4])
        raise AssertionError(
            f"{name} force-broadcasts an unbounded fact-table subtree "
            f"(sf-proportional broadcast = driver OOM at scale):\n{head}"
        )
