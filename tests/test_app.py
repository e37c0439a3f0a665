"""Phase 4 tests: CLI end-to-end — exit codes, JSON results, messages.

Mirrors the reference's functional layer (BaseFunctionalTest.php): happy
path exit 0 + uploaded list, column-order mismatch exit 1 + exact message,
testConnection JSON, bad date exit 1 + golden error line.
"""

from __future__ import annotations

import json
import shutil

import pytest

from db_writer_redshift_spark.app import main
from db_writer_redshift_spark.operators import catalog


def _write_data_dir(tmp_path, data_path, *, columns=None, tables=None, action=None):
    cfg_tables = tables or [
        {
            "tableId": "simple",
            "dbName": "simple_cli",
            "export": True,
            "incremental": False,
            "primaryKey": ["id"],
            "items": [
                {"name": "id", "dbName": "id", "type": "int"},
                {"name": "name", "dbName": "name", "type": "nvarchar", "size": "255"},
                {"name": "glasses", "dbName": "glasses", "type": "nvarchar", "size": "255"},
            ],
        }
    ]
    raw = {
        "parameters": {
            "db": {"host": "local", "#password": "x", "user": "u", "database": "d"},
            "tables": cfg_tables,
        },
        "storage": {
            "input": {
                "tables": [
                    {
                        "source": t["tableId"],
                        "columns": columns or [i["name"] for i in t["items"]],
                    }
                    for t in cfg_tables
                ]
            }
        },
    }
    if action:
        raw["parameters"]["action"] = action
    (tmp_path / "in" / "tables").mkdir(parents=True, exist_ok=True)
    (tmp_path / "config.json").write_text(json.dumps(raw))
    for t in cfg_tables:
        src = data_path(f"{t['tableId']}.csv")
        try:
            shutil.copy(src, tmp_path / "in" / "tables" / f"{t['tableId']}.csv")
        except FileNotFoundError:
            pass
    return tmp_path


def test_cli_happy_path_exit_0(spark, tmp_path, data_path, capsys):
    d = _write_data_dir(tmp_path, data_path)
    try:
        rc = main(["--data", str(d)])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert rc == 0
        assert json.loads(out) == {"status": "success", "uploaded": ["simple"]}
        assert spark.table("simple_cli").count() == 10
    finally:
        catalog.drop_table(spark, "simple_cli")


def test_cli_column_mismatch_exit_1(spark, tmp_path, data_path, capsys):
    d = _write_data_dir(tmp_path, data_path, columns=["name", "id", "glasses"])
    rc = main(["--data", str(d)])
    out = capsys.readouterr().out
    assert rc == 1
    assert 'Columns in configuration of table "simple" does not match with input mapping.' in out


def test_cli_test_connection_action(spark, tmp_path, data_path, capsys):
    d = _write_data_dir(tmp_path, data_path, action="testConnection")
    rc = main(["--data", str(d)])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    assert json.loads(out) == {"status": "success"}


def test_cli_bad_date_exit_1_golden_message(spark, tmp_path, data_path, capsys):
    tables = [
        {
            "tableId": "bad_type",
            "dbName": "bad_cli",
            "export": True,
            "incremental": False,
            "primaryKey": ["id"],
            "items": [
                {"name": "id", "dbName": "id", "type": "int"},
                {"name": "name", "dbName": "name", "type": "nvarchar", "size": "255"},
                {"name": "glasses", "dbName": "glasses", "type": "nvarchar", "size": "255"},
                {"name": "created", "dbName": "created", "type": "date"},
            ],
        }
    ]
    d = _write_data_dir(tmp_path, data_path, tables=tables)
    rc = main(["--data", str(d)])
    out = capsys.readouterr().out
    assert rc == 1
    assert "Column 'created', line 3: Invalid Date Format - length must be 10 or more" in out


def test_cli_unknown_action_exit_1(spark, tmp_path, data_path, capsys):
    d = _write_data_dir(tmp_path, data_path, action="explode")
    rc = main(["--data", str(d)])
    assert rc == 1
    assert "Action 'explode' does not exist." in capsys.readouterr().out


def test_cli_missing_config_exit_1(tmp_path, capsys):
    assert main(["--data", str(tmp_path)]) == 1


def test_cli_export_false_skips(spark, tmp_path, data_path, capsys):
    tables = [
        {
            "tableId": "simple",
            "dbName": "skip_cli",
            "export": False,
            "items": [{"name": "id", "dbName": "id", "type": "int"}],
        }
    ]
    d = _write_data_dir(tmp_path, data_path, tables=tables, columns=["id"])
    rc = main(["--data", str(d)])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    assert json.loads(out) == {"status": "success", "uploaded": []}
    assert not catalog.table_exists(spark, "skip_cli")


def test_cli_empty_items_skips(spark, tmp_path, data_path, capsys):
    tables = [
        {"tableId": "simple", "dbName": "noitems_cli", "export": True, "items": []}
    ]
    d = _write_data_dir(tmp_path, data_path, tables=tables, columns=[])
    rc = main(["--data", str(d)])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    assert json.loads(out) == {"status": "success", "uploaded": []}  # L-14


def test_cli_config_row_mode(spark, tmp_path, data_path, capsys):
    """Single-table config-row layout (FunctionalRowTest analog): the table
    config sits at parameters top level, no tables[] array."""
    raw = {
        "parameters": {
            "db": {"host": "local", "#password": "x", "user": "u", "database": "d"},
            "tableId": "simple",
            "dbName": "simple_row_cli",
            "incremental": False,
            "primaryKey": ["id"],
            "items": [
                {"name": "id", "dbName": "id", "type": "int"},
                {"name": "name", "dbName": "name", "type": "nvarchar", "size": "255"},
                {"name": "glasses", "dbName": "glasses", "type": "nvarchar", "size": "255"},
            ],
        }
    }
    (tmp_path / "in" / "tables").mkdir(parents=True)
    (tmp_path / "config.json").write_text(json.dumps(raw))
    shutil.copy(data_path("simple.csv"), tmp_path / "in" / "tables" / "simple.csv")
    try:
        rc = main(["--data", str(tmp_path)])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert rc == 0
        assert json.loads(out) == {"status": "success", "uploaded": ["simple"]}
        assert spark.table("simple_row_cli").count() == 10
    finally:
        catalog.drop_table(spark, "simple_row_cli")


def test_cli_get_tables_info_action(spark, tmp_path, data_path, capsys):
    """A-5 done properly: the reference's getTablesInfo stubs throw
    'Method not implemented'; ours lists real catalog tables."""
    d = _write_data_dir(tmp_path, data_path)
    try:
        assert main(["--data", str(d)]) == 0  # load simple_cli first
        capsys.readouterr()
        (tmp_path / "config2").mkdir()
        cfg = json.loads((d / "config.json").read_text())
        cfg["parameters"]["action"] = "getTablesInfo"
        (tmp_path / "config2" / "config.json").write_text(json.dumps(cfg))
        rc = main(["--data", str(tmp_path / "config2")])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert rc == 0
        payload = json.loads(out)
        assert payload["status"] == "success"
        assert "simple_cli" in payload["tables"]
        cols = [c["name"] for c in payload["tables"]["simple_cli"]["columns"]]
        assert cols == ["id", "name", "glasses"]
    finally:
        catalog.drop_table(spark, "simple_cli")


def test_cli_internal_error_exit_2(tmp_path, monkeypatch, capsys):
    """E-3: non-user failures map to exit 2 (ApplicationException path)."""
    import db_writer_redshift_spark.app as app_mod

    (tmp_path / "config.json").write_text(
        json.dumps({"parameters": {"action": "run", "tables": []}})
    )

    def boom(self):
        raise app_mod.ApplicationException("engine broke")

    monkeypatch.setattr(app_mod.Application, "run_action", boom)
    assert main(["--data", str(tmp_path)]) == 2


def test_cli_load_leaves_table_statistics(spark, tmp_path, data_path, capsys):
    """The run action ANALYZEs each loaded table (NOSCAN — size stats)."""
    d = _write_data_dir(tmp_path, data_path)
    try:
        rc = main(["--data", str(d)])
        capsys.readouterr()
        assert rc == 0
        detail = {
            r.col_name: r.data_type
            for r in spark.sql("DESCRIBE TABLE EXTENDED simple_cli").collect()
        }
        assert "bytes" in detail.get("Statistics", "")
    finally:
        catalog.drop_table(spark, "simple_cli")
