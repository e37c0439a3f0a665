"""Phase 5 gate: every registered query vs its DuckDB oracle at sf0.001.

Local replica of the driver's CORRECTNESS harness (value-exact,
order-insensitive, columns sorted by name). Queries without an oracle are
checked rows-only (must not raise; ≥0 rows with stable schema).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from oracle_check import compare_query, duck_connection  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata missing: {SF_DIR}"
)


def _names():
    import __spark_entry__ as entry_mod

    return list(entry_mod.queries())


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, name):
    r = compare_query(spark, name, SF_DIR, duck)
    assert r["status"] in ("ok", "rows_only"), r["detail"]


def test_bad_sf_dir_raises_cleanly(spark):
    """A wrong data directory must fail fast with Spark's path error
    (AnalysisException), not hang or return an empty frame."""
    from pyspark.errors import AnalysisException

    import __spark_entry__ as entry_mod

    q = entry_mod.queries()["q1_pricing_summary"]
    with pytest.raises(AnalysisException):
        q(spark, "/root/testdata/sf_does_not_exist").collect()
