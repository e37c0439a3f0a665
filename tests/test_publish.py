"""Atomic multi-table publish: pointer-swap commit, partial-write
invisibility, time travel, and orphan vacuum."""

from __future__ import annotations

import os

import pytest

from db_writer_redshift_spark.operators import publish


@pytest.fixture()
def base(tmp_path):
    return str(tmp_path / "pub")


def _tables(spark, tag):
    a = spark.createDataFrame([(1, tag), (2, tag)], "k int, v string")
    b = spark.createDataFrame([(tag, 10)], "name string, n int")
    return {"facts": a, "dims": b}


def test_publish_and_read_current(spark, base):
    v1 = publish.publish_tables(_tables(spark, "r1"), base)
    assert v1 == 1 and publish.current_version(base) == 1
    got = {r.v for r in publish.read_table(spark, base, "facts").collect()}
    assert got == {"r1"}


def test_second_publish_swaps_whole_set_and_time_travel(spark, base):
    publish.publish_tables(_tables(spark, "r1"), base)
    v2 = publish.publish_tables(_tables(spark, "r2"), base)
    assert v2 == 2
    assert {r.v for r in publish.read_table(spark, base, "facts").collect()} == {"r2"}
    assert {r.name for r in publish.read_table(spark, base, "dims").collect()} == {"r2"}
    # pinned read of the previous version still works (time travel)
    assert {r.v for r in publish.read_table(spark, base, "facts", version=1).collect()} == {"r1"}


def test_crashed_publish_is_invisible_and_retry_skips_dangling(spark, base):
    publish.publish_tables(_tables(spark, "r1"), base)
    # simulate a crash: v=2 directory half-written, pointer NOT swapped
    dangling = os.path.join(base, "v=2", "facts.parquet")
    os.makedirs(dangling)
    assert publish.current_version(base) == 1
    assert {r.v for r in publish.read_table(spark, base, "facts").collect()} == {"r1"}
    # retry publishes into v=3, never into the dangling v=2 tree
    v = publish.publish_tables(_tables(spark, "r2"), base)
    assert v == 3
    assert {r.v for r in publish.read_table(spark, base, "facts").collect()} == {"r2"}


def test_vacuum_removes_expired_and_dangling_keeps_committed(spark, base):
    publish.publish_tables(_tables(spark, "r1"), base)
    publish.publish_tables(_tables(spark, "r2"), base)
    publish.publish_tables(_tables(spark, "r3"), base)
    os.makedirs(os.path.join(base, "v=9"))  # dangling crashed tree
    # default sweep is concurrent-publish-safe: dangling trees survive
    assert publish.vacuum_versions(base, keep=2) == [1]
    assert os.path.isdir(os.path.join(base, "v=9"))
    # offline sweep reclaims the crashed tree too
    removed = publish.vacuum_versions(base, keep=2, include_dangling=True)
    assert removed == [9]
    # committed + one historical version survive
    assert {r.v for r in publish.read_table(spark, base, "facts").collect()} == {"r3"}
    assert {r.v for r in publish.read_table(spark, base, "facts", version=2).collect()} == {"r2"}
    with pytest.raises(Exception):
        publish.read_table(spark, base, "facts", version=1).collect()


def test_read_before_first_commit_raises(spark, base):
    os.makedirs(base, exist_ok=True)
    with pytest.raises(FileNotFoundError):
        publish.read_table(spark, base, "facts")


def test_publish_empty_set_rejected(spark, base):
    with pytest.raises(ValueError):
        publish.publish_tables({}, base)


def test_diff_versions_between_publishes(spark, base):
    publish.publish_tables(
        {"facts": spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")},
        base,
    )
    publish.publish_tables(
        {"facts": spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")},
        base,
    )
    got = {
        r["k"]: r["change_type"]
        for r in publish.diff_versions(spark, base, "facts", ["k"]).collect()
    }
    assert got == {1: "delete", 2: "update", 3: "insert"}


def test_concurrent_publisher_claim_bumps_version(spark, base):
    """Version directories are claimed with an exclusive mkdir: if another
    publisher has already created v=N (even empty — its writes may not
    have landed yet), a publish skips to N+1 instead of interleaving
    writes into the same directory (round-2 ADVICE)."""
    df = spark.range(3).toDF("id")
    v1 = publish.publish_tables({"t": df}, base)
    assert v1 == 1
    # another publisher's in-flight claim of v=2
    os.mkdir(os.path.join(base, "v=2"))
    v3 = publish.publish_tables({"t": df}, base)
    assert v3 == 3
    assert publish.current_version(base) == 3
    assert publish.read_table(spark, base, "t").count() == 3
