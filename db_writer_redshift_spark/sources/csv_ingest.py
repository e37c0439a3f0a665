"""CSV ingest — the Spark analog of the reference's Redshift COPY (L-1…L-5).

Reference command (Redshift.php:93-112)::

    COPY "t" FROM 's3://…' CREDENTIALS … REGION …
    DELIMITER ',' CSV QUOTE '"' NULL AS 'NULL' ACCEPTANYDATE
    TRUNCATECOLUMNS … GZIP  [MANIFEST | IGNOREHEADER 1]

Spark mapping:

* dialect    → ``spark.read.csv(quote='"', escape='"', multiLine=True)``.
  ``escape='"'`` is mandatory: Spark's default ``escape='\\'`` corrupts
  fields containing literal backslashes (the reference's ``special.csv``
  torture fixture — quote-doubling is the ONLY escape in this dialect).
* NULL AS 'NULL'       → ``nullValue='NULL'`` (L-3).
* GZIP                 → transparent via file extension.
* MANIFEST             → JSON ``{"entries": [{"url": …}]}`` resolved to a
  path list fed to ONE ``spark.read.csv(paths)`` call — Spark parallelizes
  by file natively, same as Redshift's sliced COPY (L-2). An empty entry
  list short-circuits to a zero-row success (Redshift.php:83-90).
* IGNOREHEADER 1       → ``header=True`` on single files; sliced files are
  headerless with schema from config.
* TRUNCATECOLUMNS      → explicit ``substring(1, size)`` projection on
  sized string columns (L-4; no reader option exists).
* ACCEPTANYDATE        → multi-pattern lenient parse (L-5) + a validation
  pass producing the reference's error contract
  ``Column 'col', line N: reason`` (E-2; golden message asserted by the
  reference functional test: a short non-date string fails with
  "Invalid Date Format - length must be 10 or more").

Scale notes: ``multiLine=True`` disables intra-file split parallelism
(a quoted newline can straddle a split), exactly like Redshift's COPY of a
single CSV — parallelism comes from slicing, which the manifest path gives
us for free. The validation pass is one extra distributed scan, columnar
and codegen'd, collecting only (up to) the first few error rows.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from db_writer_redshift_spark.config.errors import UserException
from db_writer_redshift_spark.config.schema import (
    ColumnItem,
    TableConfig,
    parse_decimal_size,
)

#: Lenient date patterns honored by the ACCEPTANYDATE analog (L-5).
_DATE_PATTERNS = ("yyyy-MM-dd", "yyyy/MM/dd", "MM/dd/yyyy", "yyyyMMdd")
_TS_PATTERNS = (
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd",
)

_LINE_COL = "_load_line"


@dataclass(frozen=True)
class LoadError:
    """One rejected input cell — the stl_load_errors analog (E-2)."""

    column: str
    line: int  # 1-based data line (header excluded), like stl_load_errors
    raw_value: str | None
    reason: str

    def message(self) -> str:
        return f"Column '{self.column}', line {self.line}: {self.reason}"


def read_manifest_entries(manifest_path: str) -> list[str]:
    """Resolve a sliced-load JSON manifest to local/remote file paths (L-2).

    Shape per the reference (Redshift.php:326-343): ``{"entries":
    [{"url": "s3://…"}, …]}``. Returns [] for an empty manifest — the
    caller must treat that as a zero-row success, not an error.
    """
    with open(manifest_path, encoding="utf-8") as fh:
        manifest = json.load(fh)
    entries = manifest.get("entries", [])
    paths = []
    for e in entries:
        url = e["url"] if isinstance(e, dict) else str(e)
        parsed = urlparse(url)
        if parsed.scheme in ("", "file"):
            paths.append(parsed.path or url)
        elif parsed.scheme == "s3":
            # Keboola manifests carry s3:// URLs (Redshift.php:326-343);
            # Hadoop's modern connector serves the s3a:// scheme (the bare
            # s3:// FS was removed in Hadoop 3). Credentials for the bucket
            # come from session.configure_s3.
            paths.append("s3a://" + url[len("s3://") :])
        else:
            paths.append(url)  # s3a://, abfss://, gs://… — handed to Hadoop FS as-is
    return paths


def read_table_csv(
    spark: SparkSession,
    source: str | list[str],
    table: TableConfig,
    sliced: bool = False,
) -> DataFrame:
    """Read raw CSV with the pinned dialect; all columns as strings, named
    by the declared config order, plus a 1-based ``_load_line`` column
    (input order) used by :func:`validate_load` for error reporting.
    """
    names = [i.name for i in table.items]
    raw_schema = T.StructType([T.StructField(n, T.StringType(), True) for n in names])
    reader = (
        spark.read.option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true")
        .option("nullValue", "NULL")
        .option("header", "false" if sliced else "true")
        .option("mode", "PERMISSIVE")
        .schema(raw_schema)
    )
    df = reader.csv(source)
    # Per-FILE 1-based line index (exactly Redshift's stl_load_errors
    # numbering): window partitioned by input file, ordered by the
    # monotonic id (ascending within a partition; multiLine makes each
    # file a single partition, so this reconstructs file order). The
    # per-file partitioning keeps a sliced load's validation parallel —
    # a global orderBy window would funnel every slice through ONE
    # reducer. Only materialized when validate_load needs line numbers
    # (apply_schema prunes the column away).
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.input_file_name()).orderBy(F.monotonically_increasing_id())
    return df.withColumn(_LINE_COL, F.row_number().over(w))


def read_table_jsonl(
    spark: SparkSession,
    source: str | list[str],
    table: TableConfig,
) -> DataFrame:
    """JSON-lines twin of :func:`read_table_csv`: every declared column read
    as a string (JSON scalars coerced), then the SAME cast/validate/error
    pipeline applies — one ingest contract across wire formats. Line
    numbers are per-file, like the CSV path.

    (The reference supports only CSV; this is part of the §7 extension
    track — a 100 TB pipeline ingests JSONL logs constantly.)
    """
    names = [i.name for i in table.items]
    raw_schema = T.StructType([T.StructField(n, T.StringType(), True) for n in names])
    df = (
        spark.read.schema(raw_schema)
        .option("mode", "PERMISSIVE")
        .json(source)
        .withColumn("_block_start", F.col("_metadata.file_block_start"))
    )
    from pyspark.sql.window import Window

    # Unlike multiLine CSV and native XML, line-mode JSON IS splittable:
    # a file larger than maxPartitionBytes fans out, and Spark enumerates
    # splits size-sorted, not offset-sorted, so a bare monotonic-id
    # window could interleave chunks. Ordering by the hidden
    # _metadata.file_block_start first makes per-file line numbers
    # correct by construction: block start strictly increases with file
    # offset, and the monotonic id orders rows within one block (pinned
    # by tests/test_ingest.py::test_jsonl_line_numbers_survive_split).
    w = Window.partitionBy(F.input_file_name()).orderBy(
        "_block_start", F.monotonically_increasing_id()
    )
    return df.withColumn(_LINE_COL, F.row_number().over(w)).drop("_block_start")


def read_table_xml(
    spark: SparkSession,
    source: str | list[str],
    table: TableConfig,
    row_tag: str = "row",
) -> DataFrame:
    """XML twin of :func:`read_table_jsonl`, on Spark 4's NATIVE XML
    datasource (the spark-xml package folded into core): every declared
    column read as a string from ``<row_tag>`` elements, then the SAME
    cast/validate/error pipeline applies — one ingest contract across
    wire formats (CSV/JSONL/ORC/XML). Row numbers are per-file in
    element order, like the CSV path's line numbers: Spark's native XML
    source is NON-SPLITTABLE per file (a rowTag can straddle any byte
    split, so unlike spark-xml's XmlInputFormat the core datasource
    never splits — verified empirically and pinned by
    tests/test_ingest.py::test_xml_single_partition_per_file, which
    reads a file many times ``maxPartitionBytes`` as one partition), so
    each file is one partition and the monotonic id reconstructs element
    order exactly as the CSV path's ``multiLine`` comment documents
    (ADVICE r7 #4).

    (The reference supports only CSV; §7 extension track — XML is the
    wire format of the enterprise feeds that still dominate B2B
    integrations.)
    """
    names = [i.name for i in table.items]
    raw_schema = T.StructType([T.StructField(n, T.StringType(), True) for n in names])
    df = (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .schema(raw_schema)
        .load(source)
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.input_file_name()).orderBy(F.monotonically_increasing_id())
    return df.withColumn(_LINE_COL, F.row_number().over(w))


def read_table_fixedwidth(
    spark: SparkSession,
    source: str | list[str],
    table: TableConfig,
    widths: list[int],
) -> DataFrame:
    """Fixed-width ingest — the analog of Redshift COPY's ``FIXEDWIDTH
    'col:width,...'`` option (the one COPY wire format the CSV path
    doesn't cover; the reference itself pins CSV, so this sits on the
    §7 extension track beside JSONL/ORC/XML). ``widths`` aligns with
    the declared column order; each line slices into width-sized
    character fields at cumulative 1-based offsets (pure ``substring``
    column expressions — JVM-side, whole-stage codegen). Fields are
    right-trimmed of pad spaces (Redshift CHAR-padding semantics) and
    the trimmed ``NULL`` literal decodes to NULL (the CSV path's L-3
    contract); then the SAME cast/validate/error pipeline applies — one
    ingest contract across wire formats.

    Line numbers are per-file: the text source IS splittable (like
    line-mode JSON), so the window orders by the hidden
    ``_metadata.file_block_start`` first, exactly the JSONL ordering
    discipline."""
    names = [i.name for i in table.items]
    assert len(widths) == len(names), (len(widths), len(names))
    df = (
        spark.read.text(source if isinstance(source, list) else [source])
        .withColumn("_block_start", F.col("_metadata.file_block_start"))
    )
    cols = []
    off = 1
    for name, w in zip(names, widths):
        field = F.rtrim(F.substring(F.col("value"), off, w))
        cols.append(
            F.when(field == "NULL", F.lit(None).cast("string"))
            .otherwise(field)
            .alias(name)
        )
        off += w
    from pyspark.sql.window import Window

    win = Window.partitionBy(F.input_file_name()).orderBy(
        "_block_start", F.monotonically_increasing_id()
    )
    return df.select(
        *cols, F.row_number().over(win).alias(_LINE_COL)
    )


def _lenient_date(col: F.Column) -> F.Column:
    return F.coalesce(*[F.try_to_timestamp(col, F.lit(p)).cast("date") for p in _DATE_PATTERNS])


def _lenient_ts(col: F.Column) -> F.Column:
    return F.coalesce(
        *[F.try_to_timestamp(col, F.lit(p)).cast("timestamp_ntz") for p in _TS_PATTERNS]
    )


def _cast_expr(item: ColumnItem) -> F.Column:
    """Build the typed expression for one declared column (COPY's implicit
    coercions, L-3/L-4/L-5)."""
    t = item.type
    col = F.col(item.name)
    if t in ("char", "character", "nchar", "bpchar", "varchar", "character varying", "nvarchar"):
        if item.size:
            try:
                width = int(str(item.size).split(",")[0])
            except ValueError:
                width = None
            if width:
                col = F.substring(col, 1, width)  # TRUNCATECOLUMNS (L-4)
        return col
    if t == "text":
        return col
    if t in ("int", "integer", "int4"):
        return col.try_cast("int")
    if t in ("int2", "smallint"):
        return col.try_cast("smallint")
    if t in ("int8", "bigint"):
        return col.try_cast("bigint")
    if t in ("decimal", "numeric"):
        p, s = parse_decimal_size(item.size)
        return col.try_cast(f"decimal({p},{s})")
    if t in ("real", "float4"):
        return col.try_cast("float")
    if t in ("double precision", "float", "float8"):
        return col.try_cast("double")
    if t == "boolean":
        return col.try_cast("boolean")
    if t == "date":
        return _lenient_date(col)
    if t in ("timestamp", "timestamp without timezone"):
        return _lenient_ts(col)
    return col


def apply_schema(raw: DataFrame, table: TableConfig) -> DataFrame:
    """Project the raw string DataFrame to the declared schema:
    drop ``ignore`` columns (L-16), rename to dbName, cast per type."""
    exprs = [
        _cast_expr(item).alias(item.db_name) for item in table.effective_items
    ]
    return raw.select(*exprs)


def _error_reason(item: ColumnItem) -> F.Column:
    """Reason string per failing cell, matching the reference's golden
    message for short date strings (FunctionalTest.php:73-78)."""
    raw = F.col(item.name)
    if item.type == "date":
        return F.when(
            F.length(raw) < 10,
            F.lit("Invalid Date Format - length must be 10 or more"),
        ).otherwise(F.concat(F.lit("Invalid Date Format - '"), raw, F.lit("'")))
    return F.concat(
        F.lit(f"Cannot cast value '"), raw, F.lit(f"' to type {item.type}")
    )


def validate_load(raw: DataFrame, table: TableConfig, max_errors: int = 10) -> list[LoadError]:
    """Distributed scan for uncastable non-NULL cells; returns up to
    ``max_errors`` :class:`LoadError` in line order (E-2 parity).

    One pass over the data: each typed column contributes a
    ``raw IS NOT NULL AND try_cast(raw) IS NULL`` predicate; a row failing
    any predicate emits (column, line, raw, reason) structs that are
    exploded and limited. All codegen'd — no Python in the row path.
    """
    checks = []
    for item in table.effective_items:
        t = item.type
        if t in _STRINGY:
            continue  # strings always load (truncation is silent, L-4)
        typed = _cast_expr(item)
        raw_col = F.col(item.name)
        failed = raw_col.isNotNull() & typed.isNull()
        checks.append(
            F.when(
                failed,
                F.struct(
                    F.lit(item.name).alias("column"),
                    F.col(_LINE_COL).alias("line"),
                    raw_col.alias("raw_value"),
                    _error_reason(item).alias("reason"),
                ),
            )
        )
    if not checks:
        return []
    errs = (
        raw.select(F.explode(F.array_compact(F.array(*checks))).alias("e"))
        .select("e.*")
        .orderBy("line", "column")
        .limit(max_errors)
        .collect()
    )
    return [LoadError(r.column, r.line, r.raw_value, r.reason) for r in errs]


_STRINGY = {
    "char",
    "character",
    "nchar",
    "bpchar",
    "varchar",
    "character varying",
    "nvarchar",
    "text",
}


def load_errors_to_exception(errors: list[LoadError]) -> UserException:
    """Format like the reference's errorsToException (Redshift.php:268-285)."""
    lines = "\n".join(e.message() for e in errors)
    return UserException(f"Failed to load data:\n{lines}")


def ingest_table(
    spark: SparkSession,
    table: TableConfig,
    csv_path: str | None = None,
    manifest_path: str | None = None,
    s3info: dict | None = None,
) -> DataFrame | None:
    """Full COPY analog: resolve source (single file w/ header, or sliced
    manifest), read, validate, cast. Returns None for an empty sliced
    manifest (zero-row success short-circuit, Redshift.php:83-90).

    ``s3info`` is the reference's per-table S3 block (bucket / region /
    temporary credentials — Redshift.php:93-106); when present its STS
    credentials are wired onto the s3a connector for the bucket before
    any read (session.configure_s3).

    Raises UserException with the E-2 message contract on bad cells.
    """
    if s3info:
        from db_writer_redshift_spark.session import configure_s3

        configure_s3(spark, s3info)
    if manifest_path is not None:
        paths = read_manifest_entries(manifest_path)
        if not paths:
            return None
        raw = read_table_csv(spark, paths, table, sliced=True)
    elif csv_path is not None:
        if not os.path.exists(csv_path):
            raise UserException(f"Source file not found: {csv_path}")
        raw = read_table_csv(spark, csv_path, table, sliced=False)
    else:
        raise UserException("No csv_path or manifest_path given")
    errors = validate_load(raw, table)
    if errors:
        raise load_errors_to_exception(errors)
    return apply_schema(raw, table)


def read_table_orc(
    spark: SparkSession,
    source: str | list[str],
    table: TableConfig,
) -> DataFrame:
    """ORC twin of :func:`read_table_csv`: the file's native types are
    read by the vectorized ORC reader, coerced to string, and fed through
    the SAME cast/validate/error pipeline — one ingest contract across
    wire formats (CSV / JSONL / ORC). Line numbers are per-file, like the
    CSV path.

    Caveat (shared with the CSV/JSONL paths): the per-file ordering key is
    monotonically_increasing_id within input_file_name, which reconstructs
    file order only while each file reads as ONE split. A multi-split ORC
    file packs splits by size, so reported error line numbers can then be
    off; ingest-side validation files are expected to stay below one split
    (load slices, not lake files). A split-stable key would need the block
    start offset, which the DataFrame reader does not expose.

    (The reference supports only CSV; §7 extension track.)
    """
    names = [i.name for i in table.items]
    df = spark.read.orc(source).select(
        *[F.col(n).cast("string").alias(n) for n in names]
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.input_file_name()).orderBy(F.monotonically_increasing_id())
    return df.withColumn(_LINE_COL, F.row_number().over(w))
