"""External sinks. The managed-parquet write path lives in
operators/writer.py; this package holds the JDBC path that targets an
actual Redshift/Postgres endpoint from a Spark cluster."""

from db_writer_redshift_spark.sinks.jdbc_redshift import (  # noqa: F401
    JdbcTarget,
    create_table_sql,
    full_load_statements,
    incremental_load_statements,
    upsert_statements,
    write_jdbc,
)
