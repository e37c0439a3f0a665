"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every registered query on Spark and (when an oracle exists) the twin
SQL on DuckDB over the same parquet, then compares row count, column names,
and exact values order-insensitively. Used by tests/test_queries_oracle.py
and runnable standalone:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
# Types DuckDB's fetchdf() lands as pandas float64. HUGEINT is the trap:
# SUM(integer) returns HUGEINT, which becomes float64 while Spark's bigint
# becomes int64 — every value equal, but the driver's hash is
# dtype-sensitive, so the row hash-fails (VERDICT.md round 2). DECIMAL is
# float64 in fetchdf too.
_DUCK_FLOAT = {"HUGEINT", "UHUGEINT", "DOUBLE", "FLOAT", "REAL"}

_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOAT = {"float", "double"}


def _duck_kind(typename: str) -> str | None:
    t = typename.upper()
    if t in _DUCK_INT:
        return "int"
    if t in _DUCK_FLOAT or t.startswith("DECIMAL"):
        return "float"
    return None


def _spark_kind(simple: str) -> str | None:
    if simple in _SPARK_INT:
        return "int"
    if simple in _SPARK_FLOAT:
        return "float"
    return None


def dtype_mismatches(sdf, con, oracle: str) -> list[str]:
    """Numeric-kind disagreements the driver's hash would flap on.

    The driver fetches the oracle via fetchdf() (pandas) and hashes
    dtype-sensitively; an integer-valued column arriving as float64 on one
    side only (the HUGEINT signature) fails even when every value matches.
    DESCRIBE gives DuckDB's declared output types without running the query.
    """
    duck_types = {r[0]: r[1] for r in con.execute(f"DESCRIBE {oracle}").fetchall()}
    out = []
    for field in sdf.schema.fields:
        sk = _spark_kind(field.dataType.simpleString())
        dt = duck_types.get(field.name)
        dk = _duck_kind(dt) if dt is not None else None
        if sk and dk and sk != dk:
            out.append(
                f"column {field.name!r}: spark={field.dataType.simpleString()} "
                f"vs duck={dt} (pandas {dk}64) — CAST the oracle expression"
            )
    return out


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # -0.0 == 0.0
    return v


def _normalize(rows, cols):
    """Sort columns by name (driver behavior), then sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_query(spark, name: str, sf_dir: str, con=None) -> dict:
    """Returns {'name', 'status', 'detail', 'rows'} — status ok|mismatch|error|rows_only."""
    import __spark_entry__ as entry_mod

    qfn = entry_mod.queries()[name]
    oracle = entry_mod.oracle_sql().get(name)
    sdf = qfn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if oracle is None:
        return {"name": name, "status": "rows_only", "rows": len(srows), "detail": ""}
    close = con is None
    con = con or duck_connection(sf_dir)
    try:
        dtype_bad = dtype_mismatches(sdf, con, oracle)
        res = con.execute(oracle)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    finally:
        if close:
            con.close()
    if dtype_bad:
        return {
            "name": name,
            "status": "mismatch",
            "rows": len(srows),
            "detail": "dtype (driver hash-fails even on equal values): " + "; ".join(dtype_bad),
        }
    if sorted(scols) != sorted(dcols):
        return {
            "name": name,
            "status": "mismatch",
            "rows": len(srows),
            "detail": f"columns spark={sorted(scols)} duck={sorted(dcols)}",
        }
    if len(srows) != len(drows):
        return {
            "name": name,
            "status": "mismatch",
            "rows": len(srows),
            "detail": f"rowcount spark={len(srows)} duck={len(drows)}",
        }
    sn = _normalize(srows, scols)
    dn = _normalize(drows, dcols)
    if sn != dn:
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(sn, dn)) if a != b)
        return {
            "name": name,
            "status": "mismatch",
            "rows": len(srows),
            "detail": f"first diff at sorted-row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}",
        }
    return {"name": name, "status": "ok", "rows": len(srows), "detail": ""}


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry_mod
    from db_writer_redshift_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = [a for a in args if not os.path.isdir(a)] or list(entry_mod.queries())
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
                      extra_conf={"spark.ui.enabled": "false"})
    con = duck_connection(sf_dir)
    failed = 0
    for name in names:
        try:
            r = compare_query(spark, name, sf_dir, con)
        except Exception as exc:  # noqa: BLE001
            r = {"name": name, "status": "error", "rows": 0, "detail": f"{type(exc).__name__}: {exc}"}
        flag = {"ok": "PASS", "rows_only": "ROWS", "mismatch": "FAIL", "error": "ERR "}[r["status"]]
        print(f"[{flag}] {name} ({r['rows']} rows) {r['detail'][:800]}")
        if r["status"] in ("mismatch", "error"):
            failed += 1
        # Intra-query persists feed lazily returned DataFrames, so the
        # producing operator cannot unpersist them (plans/registry.py
        # "Persist policy"); a multi-hundred-query session must drop them
        # between queries or cached blocks accumulate for the whole run.
        spark.catalog.clearCache()
    print(f"\n{len(names) - failed}/{len(names)} passing")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
