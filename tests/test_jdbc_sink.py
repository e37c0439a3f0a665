"""JDBC sink: statement-generation goldens (no database needed — the SQL
builders are pure; the single Spark call is `write_jdbc`, whose options
mapping is asserted here and whose execution needs a live endpoint)."""

from __future__ import annotations

from db_writer_redshift_spark.config.schema import ColumnItem, TableConfig
from db_writer_redshift_spark.sinks import (
    JdbcTarget,
    create_table_sql,
    full_load_statements,
    incremental_load_statements,
    upsert_statements,
)

TARGET = JdbcTarget(host="rs.example", database="dw", user="u", password="p")

TABLE = TableConfig(
    table_id="in.c-main.products",
    db_name="products",
    items=(
        ColumnItem(name="id", db_name="id", type="INT", nullable=False),
        ColumnItem(name="name", db_name="name", type="VARCHAR", size="255"),
        ColumnItem(name="price", db_name="price", type="DECIMAL", size="10,2", default="0"),
        ColumnItem(name="junk", db_name="junk", type="IGNORE"),
    ),
    incremental=True,
    primary_key=("id",),
)


def test_url_has_keepalive_and_default_port():
    assert TARGET.url() == "jdbc:postgresql://rs.example:5439/dw?tcpKeepAlive=true"


def test_create_table_passes_redshift_types_through():
    sql = create_table_sql(TARGET, TABLE)
    assert sql == (
        'CREATE TABLE "public"."products" ('
        '"id" INT NOT NULL, '
        '"name" VARCHAR(255), '
        '"price" DECIMAL(10,2) DEFAULT \'0\')'
    )


def test_upsert_is_reference_statement_trio_plus_drop():
    stmts = upsert_statements(TARGET, TABLE, "products_temp_abc")
    assert stmts == [
        'UPDATE "public"."products" SET '
        '"id" = "public"."products_temp_abc"."id", '
        '"name" = "public"."products_temp_abc"."name", '
        '"price" = "public"."products_temp_abc"."price" '
        'FROM "public"."products_temp_abc" '
        'WHERE "public"."products"."id" = "public"."products_temp_abc"."id"',
        'DELETE FROM "public"."products_temp_abc" USING "public"."products" '
        'WHERE "public"."products"."id" = "public"."products_temp_abc"."id"',
        'INSERT INTO "public"."products" ("id", "name", "price") '
        'SELECT * FROM "public"."products_temp_abc"',
        'DROP TABLE "public"."products_temp_abc"',
    ]


def test_upsert_without_pk_degrades_to_append():
    no_pk = TableConfig(
        table_id=TABLE.table_id,
        db_name=TABLE.db_name,
        items=TABLE.items,
        primary_key=(),
    )
    stmts = upsert_statements(TARGET, no_pk, "s")
    assert [s.split()[0] for s in stmts] == ["INSERT", "DROP"]


def test_full_load_is_drop_then_create():
    stmts = full_load_statements(TARGET, TABLE)
    assert stmts[0] == 'DROP TABLE IF EXISTS "public"."products"'
    assert stmts[1].startswith('CREATE TABLE "public"."products" (')


def test_incremental_sequence_shapes():
    staging, pre, post = incremental_load_statements(TARGET, TABLE)
    assert staging.startswith("products_temp_")
    assert pre == [create_table_sql(TARGET, TABLE, name=staging)]
    assert post[0].startswith('CREATE TABLE IF NOT EXISTS "public"."products"')
    assert post[1].startswith('UPDATE "public"."products" SET')
    assert post[-1] == f'DROP TABLE "public"."{staging}"'


def test_writer_options_mapping():
    opts = TARGET.writer_options("products", batchsize=5000)
    assert opts["url"] == TARGET.url()
    assert opts["dbtable"] == '"public"."products"'
    assert opts["driver"] == "org.postgresql.Driver"
    assert opts["batchsize"] == "5000"
    assert opts["reWriteBatchedInserts"] == "true"


def test_run_statements_retries_and_reconnects():
    from db_writer_redshift_spark.sinks.jdbc_redshift import run_statements

    calls, reconnects, naps = [], [], []
    fails = {"INSERT": 2}  # fail first two attempts, succeed third

    def run_sql(sql):
        calls.append(sql)
        key = sql.split()[0]
        if fails.get(key, 0) > 0:
            fails[key] -= 1
            raise RuntimeError("transient")

    run_statements(
        ["CREATE t", "INSERT x"],
        run_sql,
        reconnect=lambda: reconnects.append(1),
        sleep=naps.append,
    )
    assert calls == ["CREATE t", "INSERT x", "INSERT x", "INSERT x"]
    assert len(reconnects) == 2  # reconnect precedes each retry only
    assert naps == [1, 4]  # quadratic backoff


def test_run_statements_gives_up_after_attempts():
    import pytest as _pytest

    from db_writer_redshift_spark.sinks.jdbc_redshift import run_statements

    def always_fail(sql):
        raise RuntimeError("down")

    with _pytest.raises(RuntimeError):
        run_statements(["SELECT 1"], always_fail, sleep=lambda s: None)
