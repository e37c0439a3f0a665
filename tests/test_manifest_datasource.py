"""Python DataSource for sliced-manifest CSV: per-slice partitions, the
pinned dialect, NULL decode, empty-manifest zero-row success."""

from __future__ import annotations

import gzip
import json

import pytest

from db_writer_redshift_spark.sources.manifest_datasource import (
    read_manifest_python,
)


@pytest.fixture()
def sliced(tmp_path):
    s1 = tmp_path / "part1.csv.gz"
    with gzip.open(s1, "wt", encoding="utf-8", newline="") as f:
        f.write('"1","Ada","yes"\r\n"2","Bela ""B""","no"\r\n')
    s2 = tmp_path / "part2.csv"
    # literal backslash + embedded newline in a quoted field + NULL literal
    s2.write_text('"3","back \\ slash","NULL"\n"4","multi\nline","yes"\n')
    man = tmp_path / "data.manifest"
    man.write_text(
        json.dumps({"entries": [{"url": f"file://{s1}"}, {"url": str(s2)}]})
    )
    return str(man)


def test_reads_slices_with_dialect_and_null(spark, sliced):
    df = read_manifest_python(spark, sliced, ["id", "name", "glasses"])
    rows = {r.id: (r.name, r.glasses) for r in df.collect()}
    assert rows == {
        "1": ("Ada", "yes"),
        "2": ('Bela "B"', "no"),
        "3": ("back \\ slash", None),
        "4": ("multi\nline", "yes"),
    }


def test_one_partition_per_slice(spark, sliced):
    df = read_manifest_python(spark, sliced, ["id", "name", "glasses"])
    from pyspark.sql import functions as F

    nparts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert nparts == 2


def test_empty_manifest_zero_rows(spark, tmp_path):
    man = tmp_path / "empty.manifest"
    man.write_text(json.dumps({"entries": []}))
    df = read_manifest_python(spark, str(man), ["id"])
    assert df.count() == 0


def test_column_count_mismatch_raises(spark, tmp_path):
    s = tmp_path / "bad.csv"
    s.write_text('"1","only-two"\n')
    man = tmp_path / "bad.manifest"
    man.write_text(json.dumps({"entries": [{"url": str(s)}]}))
    df = read_manifest_python(spark, str(man), ["a", "b", "c"])
    with pytest.raises(Exception, match="expected 3 columns"):
        df.collect()
