"""Config model + type system.

Reference parity map (all behavior re-derived, no code copied):

* 24-name type whitelist — Redshift.php:17-26 (``getAllowedTypes``
  Redshift.php:211-214).
* Spark type mapping — SURVEY.md §1.6.
* Config trees — RedshiftConfigDefinition.php:13-98 (multi-table),
  RedshiftConfigRowDefinition.php:13-92 (config-row),
  RedshiftActionConfigRowDefinition.php:13-51 (action, extra keys ignored).
  Defaults preserved: ``incremental`` false, ``export`` true, port 5439,
  ``ssh.sshPort`` 22.
* Strict ordered column-mapping gate — RedshiftApplication.php:169-184
  (exact error message asserted by the reference's functional test,
  BaseFunctionalTest.php:31-48).
* Secret scrubbing — Redshift.php:229-233 scrubs aws credentials from
  logged SQL; we scrub ``#``-prefixed keys and known credential fields
  from any logged config dict.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

from db_writer_redshift_spark.config.errors import UserException

# ---------------------------------------------------------------------------
# Type system (Redshift.php:17-26) — exactly the 24 accepted names.
# ---------------------------------------------------------------------------

ALLOWED_TYPES: tuple[str, ...] = (
    "int",
    "int2",
    "int4",
    "int8",
    "smallint",
    "integer",
    "bigint",
    "decimal",
    "numeric",
    "real",
    "double precision",
    "float",
    "float4",
    "float8",
    "boolean",
    "char",
    "character",
    "nchar",
    "bpchar",
    "varchar",
    "character varying",
    "nvarchar",
    "text",
    "date",
    "timestamp",
    "timestamp without timezone",
)

_INT_TYPES = {"int": T.IntegerType, "integer": T.IntegerType, "int4": T.IntegerType}
_SHORT_TYPES = {"int2": T.ShortType, "smallint": T.ShortType}
_LONG_TYPES = {"int8": T.LongType, "bigint": T.LongType}
_FLOAT_TYPES = {"real": T.FloatType, "float4": T.FloatType}
_DOUBLE_TYPES = {
    "double precision": T.DoubleType,
    "float": T.DoubleType,
    "float8": T.DoubleType,
}
_STRING_TYPES = {
    "char",
    "character",
    "nchar",
    "bpchar",
    "varchar",
    "character varying",
    "nvarchar",
    "text",
}
_TIMESTAMP_TYPES = {"timestamp", "timestamp without timezone"}

#: Declared types whose DDL suppresses DEFAULT literals (Redshift.php:143-145).
TEXT_TYPE = "text"

#: Pseudo-type that drops the column from DDL and merge (Redshift.php:133-135).
IGNORE_TYPE = "ignore"


def parse_decimal_size(size: str) -> tuple[int, int]:
    """``"p,s"`` or ``"p"`` → (precision, scale); default (18, 0) on empty
    (matches Redshift defaulting when size omitted)."""
    if not size:
        return 18, 0
    parts = [p.strip() for p in str(size).split(",")]
    try:
        precision = int(parts[0])
        scale = int(parts[1]) if len(parts) > 1 else 0
    except ValueError as exc:
        raise UserException(f"Invalid decimal size '{size}'") from exc
    return precision, scale


def spark_type_for(decl_type: str, size: str = "") -> T.DataType:
    """Map a declared config type name (case-insensitive, Redshift.php:17-26)
    to the Spark type per SURVEY.md §1.6. Raises UserException off-whitelist."""
    t = decl_type.strip().lower()
    if t in _INT_TYPES:
        return T.IntegerType()
    if t in _SHORT_TYPES:
        return T.ShortType()
    if t in _LONG_TYPES:
        return T.LongType()
    if t in ("decimal", "numeric"):
        precision, scale = parse_decimal_size(size)
        return T.DecimalType(precision, scale)
    if t in _FLOAT_TYPES:
        return T.FloatType()
    if t in _DOUBLE_TYPES:
        return T.DoubleType()
    if t == "boolean":
        return T.BooleanType()
    if t in _STRING_TYPES:
        return T.StringType()
    if t == "date":
        return T.DateType()
    if t in _TIMESTAMP_TYPES:
        return T.TimestampNTZType()
    raise UserException(
        f"Type '{decl_type}' is not an allowed type. Allowed: {', '.join(ALLOWED_TYPES)}"
    )


# ---------------------------------------------------------------------------
# Config dataclasses (the three Symfony trees, A-6)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ColumnItem:
    """One ``items[]`` entry (RedshiftConfigDefinition.php:67-90)."""

    name: str
    db_name: str
    type: str
    size: str = ""
    nullable: bool | None = None
    default: str | None = None

    @property
    def ignored(self) -> bool:
        return self.type.strip().lower() == IGNORE_TYPE

    def spark_field(self) -> T.StructField:
        meta: dict[str, Any] = {}
        if self.size:
            meta["size"] = self.size
        if self.default is not None:
            meta["default"] = self.default
        return T.StructField(
            self.db_name,
            spark_type_for(self.type, self.size),
            nullable=self.nullable is not False,
            metadata=meta,
        )


@dataclass(frozen=True)
class TableConfig:
    """One ``tables[]`` entry (RedshiftConfigDefinition.php:46-93)."""

    table_id: str
    db_name: str
    items: tuple[ColumnItem, ...]
    export: bool = True  # default true (config tree)
    incremental: bool = False  # default false (config tree)
    primary_key: tuple[str, ...] = ()

    @property
    def effective_items(self) -> tuple[ColumnItem, ...]:
        """Columns that survive the ``ignore`` projection (L-16)."""
        return tuple(i for i in self.items if not i.ignored)


@dataclass(frozen=True)
class WriterConfig:
    """Validated root config (multi-table or config-row)."""

    data_dir: str
    action: str = "run"
    tables: tuple[TableConfig, ...] = ()
    input_tables: tuple[dict, ...] = ()  # storage.input.tables mapping
    db: dict = field(default_factory=dict)  # accepted + scrubbed, not used locally
    warehouse_dir: str | None = None


def struct_type_for(table: TableConfig) -> T.StructType:
    """DDL synth analog (L-6): StructType over non-ignored items."""
    return T.StructType([i.spark_field() for i in table.effective_items])


# ---------------------------------------------------------------------------
# Parsing / validation
# ---------------------------------------------------------------------------

_REQUIRED_ITEM_KEYS = ("name", "dbName", "type")


def _parse_item(raw: dict, table_id: str) -> ColumnItem:
    for k in _REQUIRED_ITEM_KEYS:
        if k not in raw or raw[k] in (None, ""):
            raise UserException(
                f'Table "{table_id}": column item missing required key "{k}"'
            )
    t = str(raw["type"]).strip().lower()
    if t != IGNORE_TYPE and t not in ALLOWED_TYPES:
        raise UserException(
            f'Table "{table_id}": type "{raw["type"]}" is not allowed for column '
            f'"{raw["name"]}"'
        )
    nullable = raw.get("nullable")
    if nullable is not None:
        nullable = bool(nullable)
    default = raw.get("default")
    if default is not None:
        default = str(default)
    return ColumnItem(
        name=str(raw["name"]),
        db_name=str(raw["dbName"]),
        type=t,
        size="" if raw.get("size") in (None,) else str(raw.get("size", "")),
        nullable=nullable,
        default=default,
    )


def _parse_table(raw: dict) -> TableConfig:
    for k in ("tableId", "dbName"):
        if k not in raw or raw[k] in (None, ""):
            raise UserException(f'Table config missing required key "{k}"')
    items = tuple(_parse_item(i, raw["tableId"]) for i in raw.get("items", []))
    pk = raw.get("primaryKey") or []
    if not isinstance(pk, (list, tuple)):
        raise UserException(
            f'Table "{raw["tableId"]}": primaryKey must be a list of column names'
        )
    return TableConfig(
        table_id=str(raw["tableId"]),
        db_name=str(raw["dbName"]),
        items=items,
        export=bool(raw.get("export", True)),
        incremental=bool(raw.get("incremental", False)),
        primary_key=tuple(str(c) for c in pk),
    )


def parse_config(raw: dict, data_dir: str = "") -> WriterConfig:
    """Validate the raw ``config.json`` dict.

    Tree selection mirrors RedshiftApplication.php:23-32: presence of
    ``parameters.tables`` → multi-table tree; else the whole ``parameters``
    block is a single table (config-row); ``action`` other than ``run``
    uses the lenient action tree (extra keys ignored, tables optional).
    """
    params = raw.get("parameters")
    if params is None or not isinstance(params, dict):
        raise UserException('Config missing "parameters"')
    action = str(params.get("action", raw.get("action", "run")))

    tables: tuple[TableConfig, ...]
    if "tables" in params:
        tables = tuple(_parse_table(t) for t in params["tables"])
    elif action != "run":
        tables = ()  # action tree: ignoreExtraKeys, no table required
    elif "tableId" in params:
        tables = (_parse_table(params),)  # config-row mode
    else:
        tables = ()

    storage = raw.get("storage", {}) or {}
    input_tables = tuple(storage.get("input", {}).get("tables", []) or [])

    db = dict(params.get("db", {}) or {})
    db.setdefault("port", 5439)  # Redshift.php:58 default
    ssh = db.get("ssh")
    if isinstance(ssh, dict):
        ssh.setdefault("sshPort", 22)  # config tree default

    return WriterConfig(
        data_dir=data_dir,
        action=action,
        tables=tables,
        input_tables=input_tables,
        db=db,
        warehouse_dir=params.get("warehouseDir"),
    )


def get_input_mapping(cfg: WriterConfig, table_id: str) -> dict | None:
    """storage.input.tables lookup (RedshiftApplication.php:148-161)."""
    for m in cfg.input_tables:
        if m.get("source") == table_id:
            return m
    return None


def check_columns(table: TableConfig, cfg: WriterConfig) -> None:
    """Strict ordered-equality gate (L-15, RedshiftApplication.php:169-184).

    Declared ``items[].name`` must equal the input-mapping ``columns`` list
    including order; a shuffle is a hard failure with the reference's exact
    message shape (BaseFunctionalTest.php:31-48).
    """
    mapping = get_input_mapping(cfg, table.table_id)
    if mapping is None:
        return  # no storage mapping declared → nothing to check
    declared = [i.name for i in table.items]
    mapped = list(mapping.get("columns", []))
    if declared != mapped:
        raise UserException(
            f'Columns in configuration of table "{table.table_id}" '
            f"does not match with input mapping."
        )


# ---------------------------------------------------------------------------
# Secret scrubbing (E-1's scrub, Redshift.php:229-233)
# ---------------------------------------------------------------------------

_SECRET_KEYS = frozenset(
    {
        "password",
        "#password",
        "aws_access_key_id",
        "aws_secret_access_key",
        "credentials",
        "secret",
        "token",
        "keys",
        "#keys",
    }
)


def scrub_secrets(obj: Any) -> Any:
    """Deep-copy ``obj`` with credential-looking values replaced by '*****'.

    Keys starting with ``#`` are Keboola-encrypted values — always scrubbed.
    """
    if isinstance(obj, dict):
        return {
            k: "*****"
            if (k.lower() in _SECRET_KEYS or str(k).startswith("#"))
            else scrub_secrets(v)
            for k, v in obj.items()
        }
    if isinstance(obj, (list, tuple)):
        return type(obj)(scrub_secrets(v) for v in obj)
    return obj
