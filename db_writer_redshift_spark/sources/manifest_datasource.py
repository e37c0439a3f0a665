"""Spark 4 Python DataSource for the reference's sliced-manifest CSV
uploads (SURVEY.md L-1/L-2; manifest fetch at Redshift.php:326-343).

``spark.read.format("keboola_manifest")`` reads a Keboola-style JSON
manifest (``{"entries": [{"url": ...}, ...]}``) of headerless gzip/plain
CSV slices with the pinned dialect (quote ``"``, quote-doubling escape,
literal backslash) — one Spark INPUT PARTITION PER SLICE, which is
exactly the parallelism contract Redshift's sliced COPY has.

This complements the primary ingest path (sources/csv_ingest.py resolves
the manifest to a path list for the built-in CSV reader — the faster,
JVM-side route and the one production loads should use). The DataSource
exists for the API surface: sources Spark has no reader for can be
plugged in at the Python level with partition-level parallelism, schema,
and options; here the reference's own wire format doubles as the demo.

Scale: each slice streams through Python's csv module inside its own
task. CPython parsing is the slow path relative to the vectorized JVM
reader (~10x) — fine for moderate slice counts, wrong for a 100 TB load
(use csv_ingest). Local and file:// URLs only; s3:// entries are
rewritten to s3a:// by csv_ingest's resolver for the JVM path, and this
reader raises a clear error for schemes it cannot stream.
"""

from __future__ import annotations

import csv
import gzip
import io
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType


def _local_path(url: str) -> str:
    if url.startswith("file://"):
        return url[len("file://") :]
    if "://" not in url:
        return url
    raise ValueError(
        f"keboola_manifest reader streams local slices only; got {url!r} "
        "(use sources.csv_ingest for s3a:// via the JVM reader)"
    )


class ManifestSlice(InputPartition):
    def __init__(self, url: str):
        self.url = url


class ManifestCSVReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._manifest = options.get("manifest")
        if not self._manifest:
            raise ValueError("option 'manifest' (path to manifest JSON) is required")

    def partitions(self):
        with open(_local_path(self._manifest), encoding="utf-8") as f:
            entries = json.load(f).get("entries", [])
        # empty manifest -> zero partitions -> zero-row success (L-2)
        return [ManifestSlice(e["url"]) for e in entries]

    def read(self, partition: ManifestSlice):
        if partition is None:
            # empty manifest: Spark still schedules one task with a None
            # partition — the L-2 zero-row success
            return
        path = _local_path(partition.url)
        ncols = len(self._schema.fields)
        if path.endswith(".gz"):
            raw: io.TextIOBase = io.TextIOWrapper(
                gzip.open(path, "rb"), encoding="utf-8", newline=""
            )
        else:
            raw = open(path, encoding="utf-8", newline="")
        with raw:
            # python csv defaults: quotechar '"', doublequote=True,
            # escapechar=None -> exactly the pinned dialect (backslash is
            # a literal character; "" escapes a quote).
            for row in csv.reader(raw):
                if len(row) != ncols:
                    raise ValueError(
                        f"slice {partition.url}: expected {ncols} columns, "
                        f"got {len(row)}"
                    )
                # NULL-literal decode (L-3)
                yield tuple(None if v == "NULL" else v for v in row)


class ManifestCSVDataSource(DataSource):
    """format name: ``keboola_manifest``. Options: ``manifest`` (path),
    ``columns`` (comma-separated names; all columns are strings — typing
    belongs to the cast/validate pipeline, same as the JVM path)."""

    @classmethod
    def name(cls) -> str:
        return "keboola_manifest"

    def schema(self):
        cols = self.options.get("columns")
        if not cols:
            raise ValueError("option 'columns' (comma-separated names) is required")
        return StructType(
            [StructField(c.strip(), StringType()) for c in cols.split(",")]
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return ManifestCSVReader(schema, dict(self.options))


def register(spark) -> None:
    """Register the format on a session: ``manifest_datasource.register(spark)``."""
    spark.dataSource.register(ManifestCSVDataSource)


def read_manifest_python(spark, manifest_path: str, columns: list[str]):
    """Convenience wrapper: register + read in one call."""
    register(spark)
    return (
        spark.read.format("keboola_manifest")
        .option("manifest", os.path.abspath(manifest_path))
        .option("columns", ",".join(columns))
        .load()
    )
