"""Plan lint: every registered query's physical plan must be free of
CartesianProduct — the one join strategy that cannot survive scale.
(Intentional 1-row threshold cross joins plan as BroadcastNestedLoopJoin
over a broadcast scalar, which is fine and specifically allowed.)
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata missing: {SF_DIR}"
)


def _names():
    import __spark_entry__ as entry_mod

    return list(entry_mod.queries())


@pytest.mark.parametrize("name", _names())
def test_no_cartesian_product(spark, name):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"
