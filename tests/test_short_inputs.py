"""Short-input regression for the sequence(1, N) gram generators.

Spark's ``sequence(1, 0)`` defaults to step -1 and yields the DESCENDING
``[1, 0]`` while DuckDB's ``generate_series(1, 0)`` / ``range(1, 1)`` is
empty — so an unguarded ``transform(sequence(1, size - 2), ...)`` emits
spurious grams for inputs below the gram width (ADVICE r6 #1). The
generated corpus has no short texts, so the registry-wide oracle gate
never exercises the branch; this suite builds a fixture sf_dir whose
documents/part rows are ALL below or at the gram-width boundary and
replays the affected queries through the same value-exact comparator the
driver uses.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from oracle_check import compare_query, duck_connection  # noqa: E402

# Queries whose gram generators need the <width guard, and the fixture
# tables each reads.
GUARDED = {
    "vocab_trigram_coverage_sweep": ("documents",),  # word trigrams, >=3 tokens
    "chargram_neighbor_pairs": ("documents",),  # char 5-grams, >=5 chars
    "er_trigram_cosine_pairs": ("part",),  # char trigrams on names, >=3 chars
}


@pytest.fixture(scope="module")
def short_sf_dir(tmp_path_factory):
    """An sf_dir whose every row sits below/at the gram-width boundary,
    plus a couple of normal rows so the queries return non-trivial output.
    Written as SINGLE parquet files (pyarrow) to match the testdata
    layout DuckDB's read_parquet expects."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path_factory.mktemp("short_sf"))
    docs = pa.table(
        {
            # schema of TESTDATA.md documents
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "text": [
                "a",  # 1 token, 1 char
                "ab",  # 1 token, 2 chars
                "a b",  # 2 tokens, 3 chars
                "ab cd",  # 2 tokens, exactly 5 chars
                "one two three four five",  # normal
                "one two three four six",  # normal
            ],
            "lang": ["en"] * 6,
            "source": ["web"] * 6,
            "n_chars": pa.array([1, 2, 3, 5, 23, 22], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(root, "documents.parquet"))
    part = pa.table(
        {
            "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
            "p_name": ["a", "ab", "cold widget", "old widget"],
            "p_mfgr": ["m1"] * 4,
            "p_brand": ["b1"] * 4,
            "p_type": ["t"] * 4,
            "p_size": pa.array([1] * 4, pa.int32()),
            "p_container": ["c"] * 4,
            "p_retailprice": pa.array([1.0] * 4, pa.float64()),
            "p_comment": ["x"] * 4,
        }
    )
    pq.write_table(part, os.path.join(root, "part.parquet"))
    return root


@pytest.mark.parametrize("name", sorted(GUARDED))
def test_short_inputs_match_oracle(spark, short_sf_dir, name):
    con = duck_connection(short_sf_dir)
    try:
        r = compare_query(spark, name, short_sf_dir, con)
        assert r["status"] == "ok", r["detail"]
    finally:
        con.close()


@pytest.fixture(scope="module")
def degenerate_chain_sf_dir(tmp_path_factory):
    """Events whose journey chain has a prev-only source state ('start',
    never reached) and an absorbing sink ('end', no outgoing edges) —
    the degenerate shapes where the Spark driver replay and the oracle's
    GROUP BY t.nxt row sets used to diverge (ADVICE r6 #3)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path_factory.mktemp("degen_chain"))
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in range(1, 4):
        for step, etype in enumerate(["start", "mid", "end"]):
            rows.append(
                (eid, base + datetime.timedelta(hours=step), user, etype)
            )
            eid += 1
    events = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": [r[3] for r in rows],
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": ["{}"] * len(rows),
        }
    )
    pq.write_table(events, os.path.join(root, "events.parquet"))
    return root


def test_markov_stationary_degenerate_chain(spark, degenerate_chain_sf_dir):
    """Absorbing sinks enter at round 1 and emit no phantom zero-mass
    rows; unreachable sources drop out after round 0; rounds after the
    sink absorbs everything are EMPTY on both engines."""
    con = duck_connection(degenerate_chain_sf_dir)
    try:
        r = compare_query(
            spark, "events_markov_stationary", degenerate_chain_sf_dir, con
        )
        assert r["status"] == "ok", r["detail"]
    finally:
        con.close()

    import __spark_entry__ as entry_mod

    out = entry_mod.queries()["events_markov_stationary"](
        spark, degenerate_chain_sf_dir
    ).collect()
    by_round = {}
    for row in out:
        by_round.setdefault(row.round, set()).add(row.state)
    assert by_round[0] == {"start", "mid"}  # the oracle's v0 = prev states
    assert by_round[1] == {"mid", "end"}  # sink enters, has incoming mass
    assert by_round[2] == {"end"}  # source unreachable, drops out
    assert 3 not in by_round  # chain fully absorbed: no rows at all
