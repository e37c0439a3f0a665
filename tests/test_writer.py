"""Phase 3 tests: merge semantics, full/incremental load, catalog ops.

The simple/simple_increment/simple_merged fixture triple is the golden
seed (reference RedshiftTest.php:181-219 upsert test); merge edge cases
from SURVEY.md §7: duplicate staging PKs, composite PK, PK-less append.
"""

from __future__ import annotations

import pytest

from db_writer_redshift_spark.config.schema import ColumnItem, TableConfig
from db_writer_redshift_spark.operators import catalog
from db_writer_redshift_spark.operators.merge import upsert_dataframes
from db_writer_redshift_spark.operators.writer import load_incremental, load_table
from db_writer_redshift_spark.sources import apply_schema, ingest_table, read_table_csv

SIMPLE = TableConfig(
    table_id="simple",
    db_name="simple_w",
    items=(
        ColumnItem("id", "id", "int"),
        ColumnItem("name", "name", "nvarchar", "255"),
        ColumnItem("glasses", "glasses", "nvarchar", "255"),
    ),
    incremental=True,
    primary_key=("id",),
)


def _read(spark, data_path, name, table=SIMPLE):
    return apply_schema(read_table_csv(spark, data_path(name), table), table)


def test_upsert_golden_merge(spark, data_path):
    base = _read(spark, data_path, "simple.csv")
    inc = _read(spark, data_path, "simple_increment.csv")
    golden = {(r.id, r.name, r.glasses) for r in _read(spark, data_path, "simple_merged.csv").collect()}
    merged = upsert_dataframes(base, inc, ["id"])
    assert {(r.id, r.name, r.glasses) for r in merged.collect()} == golden
    assert merged.count() == 12


def test_upsert_no_pk_appends(spark, data_path):
    base = _read(spark, data_path, "simple.csv")
    inc = _read(spark, data_path, "simple_increment.csv")
    merged = upsert_dataframes(base, inc, [])
    assert merged.count() == 14  # pure append (Redshift.php:169-200 guard)


def test_upsert_duplicate_staging_pk_last_wins(spark):
    base = spark.createDataFrame([(1, "old")], "id int, v string")
    stage = spark.createDataFrame([(1, "first"), (1, "second"), (2, "x")], "id int, v string")
    merged = upsert_dataframes(base, stage, ["id"])
    got = {r.id: r.v for r in merged.collect()}
    assert got == {1: "second", 2: "x"}  # deterministic last-occurrence-wins


def test_upsert_composite_pk(spark):
    base = spark.createDataFrame([(1, "a", "keep"), (1, "b", "old")], "k1 int, k2 string, v string")
    stage = spark.createDataFrame([(1, "b", "new"), (2, "c", "ins")], "k1 int, k2 string, v string")
    merged = upsert_dataframes(base, stage, ["k1", "k2"])
    got = {(r.k1, r.k2): r.v for r in merged.collect()}
    assert got == {(1, "a"): "keep", (1, "b"): "new", (2, "c"): "ins"}


def test_full_then_incremental_load_via_catalog(spark, data_path):
    full_cfg = TableConfig(
        table_id="simple", db_name="simple_w", items=SIMPLE.items,
        incremental=False, primary_key=("id",),
    )
    try:
        load_table(spark, full_cfg, _read(spark, data_path, "simple.csv"))
        assert spark.table("simple_w").count() == 10
        load_incremental(spark, SIMPLE, _read(spark, data_path, "simple_increment.csv"))
        result = {(r.id, r.glasses) for r in spark.table("simple_w").collect()}
        assert (8, "sometimes") in result and (10, "no") in result
        assert len(result) == 12
    finally:
        catalog.drop_table(spark, "simple_w")


def test_incremental_into_missing_target_creates_it(spark, data_path):
    try:
        load_incremental(spark, SIMPLE, _read(spark, data_path, "simple_increment.csv"))
        assert spark.table("simple_w").count() == 4
    finally:
        catalog.drop_table(spark, "simple_w")


def test_catalog_create_exists_drop_info(spark):
    t = TableConfig(
        table_id="cat_t", db_name="cat_t",
        items=(
            ColumnItem("id", "id", "int", nullable=False),
            ColumnItem("v", "v", "decimal", "10,2"),
            ColumnItem("junk", "junk", "ignore"),
        ),
        primary_key=("id",),
    )
    try:
        catalog.create_table(spark, t)
        assert catalog.table_exists(spark, "cat_t")
        info = catalog.get_table_info(spark, "cat_t")
        assert [c["name"] for c in info["columns"]] == ["id", "v"]  # ignore dropped
        assert info["columns"][1]["type"] == "decimal(10,2)"
        assert "cat_t" in catalog.show_tables(spark)
    finally:
        catalog.drop_table(spark, "cat_t")
    assert not catalog.table_exists(spark, "cat_t")


def test_tmp_name_scheme():
    n = catalog.generate_tmp_name("orders")
    assert n.startswith("orders_temp_") and len(n) > len("orders_temp_")


def test_get_table_info_missing_raises(spark):
    from db_writer_redshift_spark.config.errors import UserException

    with pytest.raises(UserException, match="does not exist"):
        catalog.get_table_info(spark, "nope_nope")


def test_bucketed_merge_skips_target_shuffle(spark, data_path):
    """Scale contract: a PK-bucketed target feeds the merge anti join
    without an Exchange — only staging shuffles. (Forced SMJ: broadcast
    would hide the bucketing.)"""
    import re

    from db_writer_redshift_spark.operators.merge import upsert_dataframes

    t = TableConfig(
        table_id="b", db_name="bkt_t", items=SIMPLE.items,
        incremental=True, primary_key=("id",),
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        from db_writer_redshift_spark.operators.writer import load_full, load_incremental

        load_full(spark, t, _read(spark, data_path, "simple.csv"), buckets=4)
        stage = _read(spark, data_path, "simple_increment.csv")
        merged = upsert_dataframes(spark.table("bkt_t"), stage, ["id"], dedupe=False)
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert len(re.findall("Exchange hashpartitioning", plan)) == 1  # staging only
        load_incremental(spark, t, stage, buckets=4)
        assert spark.table("bkt_t").count() == 12
    finally:
        for k, v in confs.items():
            spark.conf.set(k, v)
        catalog.drop_table(spark, "bkt_t")


def test_profile_table_stats_and_null_handling(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (3, "b")], ["k", "v"]
    )
    rows = {r["column_name"]: r for r in catalog.profile_table(df).collect()}
    assert set(rows) == {"k", "v"}
    k, v = rows["k"], rows["v"]
    assert (k["n_rows"], k["n_non_null"], k["n_distinct"]) == (4, 4, 3)
    assert (k["min_value"], k["max_value"]) == ("1", "3")
    assert (v["n_rows"], v["n_non_null"], v["n_distinct"]) == (4, 3, 2)
    assert (v["min_value"], v["max_value"]) == ("a", "b")
    # approx mode keeps the same schema and exact nulls/rows
    approx = {
        r["column_name"]: r
        for r in catalog.profile_table(df, exact_ndv=False).collect()
    }
    assert approx["v"]["n_non_null"] == 3
    assert approx["k"]["n_distinct"] >= 1


def test_profile_table_column_subset(spark):
    df = spark.createDataFrame([(1, "x", 2.0)], ["a", "b", "c"])
    out = catalog.profile_table(df, columns=["b"]).collect()
    assert [r["column_name"] for r in out] == ["b"]


def test_upsert_evolving_adds_staging_column(spark):
    from db_writer_redshift_spark.operators.merge import upsert_evolving

    t = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    s = spark.createDataFrame([(2, "b2", 9.5), (3, "c", 1.0)], "id int, v string, score double")
    out = upsert_evolving(t, s, ["id"])
    assert out.columns == ["id", "v", "score"]
    got = {r.id: (r.v, r.score) for r in out.collect()}
    assert got == {1: ("a", None), 2: ("b2", 9.5), 3: ("c", 1.0)}


def test_upsert_evolving_fills_missing_staging_column(spark):
    from db_writer_redshift_spark.operators.merge import upsert_evolving

    t = spark.createDataFrame([(1, "a", 5)], "id int, v string, extra int")
    s = spark.createDataFrame([(2, "b")], "id int, v string")
    got = {r.id: (r.v, r.extra) for r in upsert_evolving(t, s, ["id"]).collect()}
    assert got == {1: ("a", 5), 2: ("b", None)}


def test_upsert_evolving_rejects_type_clash(spark):
    import pytest as _pytest

    from db_writer_redshift_spark.operators.merge import upsert_evolving

    t = spark.createDataFrame([(1, "a")], "id int, v string")
    s = spark.createDataFrame([(2, 3)], "id int, v int")
    with _pytest.raises(ValueError, match="incompatible column types"):
        upsert_evolving(t, s, ["id"])


def test_orphan_warehouse_table_adopted_across_catalog_loss(spark):
    """Cross-process continuity (the CLI runs each action in a fresh
    session whose in-memory catalog is empty): parquet left at the
    managed warehouse location with NO catalog entry must be (a) seen by
    table_exists, (b) readable for an incremental merge, (c) cleanly
    replaced — the LOCATION_ALREADY_EXISTS regression."""
    import os

    from pyspark.sql import functions as F  # noqa: F401

    from db_writer_redshift_spark.config.schema import TableConfig
    from db_writer_redshift_spark.operators import catalog, writer

    name = "orphan_people"
    loc = catalog._managed_location(spark, name).replace("file:", "")
    # simulate the dead session: files exist, catalog has never heard of it
    assert not spark.catalog.tableExists(name)
    spark.createDataFrame(
        [(1, "old"), (2, "old")], "id int, v string"
    ).write.parquet(loc)
    try:
        assert catalog.table_exists(spark, name)  # adopted
        tc = TableConfig(
            table_id=name,
            db_name=name,
            export=True,
            incremental=True,
            primary_key=["id"],
            items=[],
        )
        staging = spark.createDataFrame([(2, "new"), (3, "new")], "id int, v string")
        writer.load_incremental(spark, tc, staging)
        got = {(r.id, r.v) for r in spark.table(name).collect()}
        assert got == {(1, "old"), (2, "new"), (3, "new")}
    finally:
        catalog.drop_table(spark, name)
    assert not os.path.exists(loc)  # drop cleans the managed location


def test_partitioned_orphan_is_adopted(spark):
    """Partition-layout orphans (parquet nested under k=v subdirectories,
    no top-level files) must still register as having data — a probe
    miss would turn the next incremental merge into a silent full
    overwrite (round-2 ADVICE)."""
    from db_writer_redshift_spark.operators import catalog

    name = "orphan_partitioned"
    loc = catalog._managed_location(spark, name).replace("file:", "")
    assert not spark.catalog.tableExists(name)
    spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "id int, v string, p string"
    ).write.partitionBy("p").parquet(loc)
    try:
        assert catalog.table_exists(spark, name)  # adopted despite nesting
        assert spark.table(name).count() == 2
    finally:
        catalog.drop_table(spark, name)


def test_empty_orphan_dir_does_not_block_write(spark):
    """A created-but-never-written orphan directory (no parquet inside)
    is not a table, and a fresh write over that name succeeds."""
    import os

    from db_writer_redshift_spark.config.schema import TableConfig
    from db_writer_redshift_spark.operators import catalog, writer

    name = "orphan_empty"
    loc = catalog._managed_location(spark, name).replace("file:", "")
    os.makedirs(loc, exist_ok=True)
    assert not catalog.table_exists(spark, name)
    tc = TableConfig(
        table_id=name, db_name=name, export=True, incremental=False,
        primary_key=[], items=[],
    )
    writer.load_full(spark, tc, spark.createDataFrame([(1,)], "id int"))
    try:
        assert spark.table(name).count() == 1
    finally:
        catalog.drop_table(spark, name)


def test_show_tables_adopts_all_orphans(spark):
    """getTablesInfo-style listing sees tables written by previous
    processes (persistent-catalog contract of the reference)."""
    import os

    from db_writer_redshift_spark.operators import catalog

    name = "orphan_listed"
    loc = catalog._managed_location(spark, name).replace("file:", "")
    spark.createDataFrame([(1,)], "id int").write.parquet(loc)
    try:
        assert name in catalog.show_tables(spark)
        info = catalog.get_table_info(spark, name)
        assert info["columns"][0]["name"] == "id"
    finally:
        catalog.drop_table(spark, name)
    assert not os.path.exists(loc)
