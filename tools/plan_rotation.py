"""Propose the next round's graded window from accumulated driver results.

Reads every CORRECTNESS_r*.json plus the live registry and prints a
50-name window that (a) keeps one representative per operator family
(the tests/test_graded_window.py prefix map), preferring an
already-green name so no slot re-proves old work, (b) fills the rest
with never-graded oracle-bearing queries in registry order, and (c)
never seats an oracle-less query (rows-only can't fully pass). Any
still-failing previously-graded name is seated FIRST — a fail must be
re-proven after its fix.

    python tools/plan_rotation.py            # print the proposed window
    python tools/plan_rotation.py --check    # exit 1 if the current
                                             # window wastes slots on
                                             # green-again names while
                                             # never-graded remain
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from correctness_union import classify, load_rounds  # noqa: E402

WINDOW = 50

# Mirror of tests/test_graded_window.py::test_window_covers_every_family.
FAMILIES: dict[str, list[str]] = {
    "relational-agg": ["q1_", "agg_"],
    "join": ["join_", "q3_", "q5_"],
    "merge": ["merge_"],
    "window-fn": ["window_"],
    "grouping": ["grouping_", "pivot_", "unpivot_"],
    "set-ops": ["set_"],
    "subquery": ["subquery_"],
    "scalar-fn": ["scalar_"],
    "events": ["events_"],
    "dedup": ["dedup_"],
    "ann": ["ann_"],
    "clustering": ["kmeans_"],
    "text": ["text_", "tfidf_"],
    "chunking": ["chunk_"],
    "decontam": ["decontam_"],
    "pipelines": ["pipeline_"],
    "udf-udtf": ["embedding_quantize", "udtf_"],
    "multimodal": ["multimodal_"],
    "temporal-join": ["asof_", "range_"],
    "sampling": ["sample_", "split_"],
    "tpch-extra": ["q2_", "q18_"],
}


def best_status(name: str, rounds: dict[int, dict]) -> str:
    st = "ungraded"
    rank = {"green": 3, "rows_only": 2, "fail": 1, "err": 0, "ungraded": -1}
    for r in rounds.values():
        if name in r:
            s = classify(r[name])
            if rank[s] > rank[st]:
                st = s
    return st


# Documented non-scale baselines (plans/graded.py policy): grade last,
# after every production-shape query has a row.
DEFER_LAST = {"ann_brute_force_topk", "dedup_embedding_cosine"}


def propose() -> tuple[list[str], dict[str, str]]:
    import __spark_entry__ as entry_mod

    registry = list(entry_mod.queries())
    oracles = entry_mod.oracle_sql()
    rounds = load_rounds()
    status = {n: best_status(n, rounds) for n in registry}
    eligible = [
        n for n in registry
        if oracles.get(n) is not None and n not in DEFER_LAST
    ]
    # seat the deferred baselines only once nothing else is ungraded
    if all(status[n] != "ungraded" for n in eligible):
        eligible += [n for n in DEFER_LAST if oracles.get(n) is not None]

    window: list[str] = []
    # 1. failing previously-graded names must re-prove their fix
    window += [n for n in eligible if status[n] in ("fail", "err")]
    # 2. family coverage is a UNION invariant (round-5 policy, mirrored
    #    in tests/test_graded_window.py): seat a family rep only when NO
    #    round has ever graded a member — otherwise the slot re-proves
    #    green work while never-graded names wait.
    for fam, prefixes in FAMILIES.items():
        members = [
            n for n in registry if any(n.startswith(p) for p in prefixes)
        ]
        if any(status.get(m, "ungraded") != "ungraded" for m in members):
            continue  # family already graded in some round's union
        if any(m in window for m in members):
            continue
        pick = next((m for m in members if m in eligible), None)
        if pick:
            window.append(pick)
    # 3. fill with never-graded in registry order
    for n in eligible:
        if len(window) >= WINDOW:
            break
        if n not in window and status[n] == "ungraded":
            window.append(n)
    # 4. top up with green names if the ungraded pool ran dry
    for n in eligible:
        if len(window) >= WINDOW:
            break
        if n not in window:
            window.append(n)
    return window[:WINDOW], status


def main() -> int:
    window, status = propose()
    counts: dict[str, int] = {}
    for n in window:
        counts[status[n]] = counts.get(status[n], 0) + 1
    print(f"# proposed {len(window)}-name window "
          f"({counts.get('ungraded', 0)} first-time, "
          f"{counts.get('fail', 0) + counts.get('err', 0)} re-proving fixes, "
          f"{counts.get('green', 0)} family keepers already green)")
    for n in window:
        print(f'    "{n}",  # {status[n]}')
    if "--check" in sys.argv:
        from db_writer_redshift_spark.plans.graded import GRADED_FIRST

        ungraded_left = [n for n, s in status.items() if s == "ungraded"]
        wasted = [
            n for n in GRADED_FIRST
            if status.get(n) == "green" and n not in window
        ]
        if ungraded_left and len(wasted) > len(FAMILIES):
            print(
                f"\nWARNING: current window re-grades {len(wasted)} green "
                f"names while {len(ungraded_left)} never-graded remain"
            )
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
