"""Phase 1 tests: type mapping, config trees, column gate, scrubbing.

Mirrors the reference's config behavior: whitelist Redshift.php:17-26,
defaults in the Symfony trees, ordered column equality
RedshiftApplication.php:169-184 (message asserted like
BaseFunctionalTest.php:31-48).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from db_writer_redshift_spark.config import (
    ALLOWED_TYPES,
    UserException,
    check_columns,
    parse_config,
    scrub_secrets,
    spark_type_for,
    struct_type_for,
)


def test_type_mapping_total_over_whitelist():
    for name in ALLOWED_TYPES:
        dt = spark_type_for(name, "10,2" if name in ("decimal", "numeric") else "")
        assert isinstance(dt, T.DataType)


@pytest.mark.parametrize(
    "decl,size,expected",
    [
        ("int", "", T.IntegerType()),
        ("integer", "", T.IntegerType()),
        ("int2", "", T.ShortType()),
        ("smallint", "", T.ShortType()),
        ("bigint", "", T.LongType()),
        ("decimal", "10,2", T.DecimalType(10, 2)),
        ("numeric", "7", T.DecimalType(7, 0)),
        ("real", "", T.FloatType()),
        ("double precision", "", T.DoubleType()),
        ("boolean", "", T.BooleanType()),
        ("varchar", "255", T.StringType()),
        ("text", "", T.StringType()),
        ("date", "", T.DateType()),
        ("timestamp without timezone", "", T.TimestampNTZType()),
        ("TIMESTAMP", "", T.TimestampNTZType()),  # case-insensitive
    ],
)
def test_type_mapping_cases(decl, size, expected):
    assert spark_type_for(decl, size) == expected


def test_unknown_type_rejected():
    with pytest.raises(UserException, match="not an allowed type"):
        spark_type_for("uuid")


def _multi_table_config(columns=None):
    cols = columns or ["id", "name", "glasses"]
    return {
        "parameters": {
            "db": {"host": "h", "#password": "secret", "user": "u", "database": "d"},
            "tables": [
                {
                    "tableId": "simple",
                    "dbName": "simple",
                    "export": True,
                    "incremental": True,
                    "primaryKey": ["id"],
                    "items": [
                        {"name": "id", "dbName": "id", "type": "int"},
                        {"name": "name", "dbName": "name", "type": "nvarchar", "size": "255"},
                        {"name": "glasses", "dbName": "glasses", "type": "nvarchar", "size": "255"},
                    ],
                }
            ],
        },
        "storage": {"input": {"tables": [{"source": "simple", "columns": cols}]}},
    }


def test_parse_multi_table_defaults():
    cfg = parse_config(_multi_table_config())
    assert cfg.action == "run"
    t = cfg.tables[0]
    assert t.export is True and t.incremental is True
    assert t.primary_key == ("id",)
    assert cfg.db["port"] == 5439  # Redshift.php:58 default


def test_parse_config_row_mode():
    raw = {
        "parameters": {
            "tableId": "simple",
            "dbName": "simple",
            "items": [{"name": "id", "dbName": "id", "type": "int"}],
        }
    }
    cfg = parse_config(raw)
    assert len(cfg.tables) == 1
    assert cfg.tables[0].incremental is False  # tree default


def test_column_order_mismatch_raises_reference_message():
    cfg = parse_config(_multi_table_config(columns=["name", "id", "glasses"]))
    with pytest.raises(UserException) as err:
        check_columns(cfg.tables[0], cfg)
    assert 'Columns in configuration of table "simple" does not match with input mapping.' in str(
        err.value
    )


def test_column_order_match_passes():
    cfg = parse_config(_multi_table_config())
    check_columns(cfg.tables[0], cfg)  # no raise


def test_ignore_column_dropped_from_struct():
    raw = {
        "parameters": {
            "tableId": "t",
            "dbName": "t",
            "items": [
                {"name": "id", "dbName": "id", "type": "int"},
                {"name": "junk", "dbName": "junk", "type": "ignore"},
            ],
        }
    }
    table = parse_config(raw).tables[0]
    st = struct_type_for(table)
    assert [f.name for f in st.fields] == ["id"]


def test_scrub_secrets():
    scrubbed = scrub_secrets(
        {"db": {"#password": "x", "password": "y", "user": "u"}, "n": [{"token": "z"}]}
    )
    assert scrubbed["db"]["#password"] == "*****"
    assert scrubbed["db"]["password"] == "*****"
    assert scrubbed["db"]["user"] == "u"
    assert scrubbed["n"][0]["token"] == "*****"
