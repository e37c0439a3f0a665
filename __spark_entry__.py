"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in db_writer_redshift_spark/plans/ — this module just
exposes the registry in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from db_writer_redshift_spark import plans  # noqa: E402
from db_writer_redshift_spark.session import configure_existing  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    configure_existing(spark)
    return plans.QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data-pipeline extensions)."""

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_existing(spark)
            return spec.fn(spark, sf_dir)

        run.__doc__ = spec.doc
        return run

    return {name: wrap(spec) for name, spec in plans.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return dict(plans.ORACLES)
