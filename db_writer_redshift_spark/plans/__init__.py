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
