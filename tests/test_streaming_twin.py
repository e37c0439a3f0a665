"""Equivalence proof: the registered batch query
streaming_near_dup_batch_twin (operators/dedup.near_dup_fold) computes
EXACTLY the admission verdicts of the real foreachBatch streaming sink
(streaming/jobs.py near_dup_filter_sink) when both see the same
micro-batch boundaries and the same (xxhash64) hash family.

This is what makes the twin a legitimate driver-checkable stand-in for
the streaming execution: the fold semantics (store of admitted docs'
buckets, first-seen-wins within a batch, dropped docs never index) are
shared, not re-derived.
"""

from __future__ import annotations

import pytest

import glob
import shutil

from pyspark.sql import types as T

from db_writer_redshift_spark.operators.dedup import near_dup_fold
from db_writer_redshift_spark.streaming import near_dup_filter_sink

def _schema(with_batch: bool = False) -> T.StructType:
    """Fresh StructType per call — StructType.add mutates in place, so a
    shared module-level schema would accumulate fields across tests."""
    fields = [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
    if with_batch:
        fields.append(T.StructField("batch", T.LongType()))
    return T.StructType(fields)


def _corpus():
    """Three micro-batches engineered to exercise every fold rule:

    * b2 doc 3 = near-copy of b1 doc 1      -> store collision, rejected
    * b2 docs 4,5 near-copies of each other -> first-seen (4) wins
    * b3 docs 6,7 = near-copies of admitted 4 -> store collision, rejected
      (6 also overlaps rejected 5, whose buckets were never indexed —
      the verdict comes from 4's store rows, and the sink/twin agree)
    * doc 2 and doc 8 unique                -> admitted
    """
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to hide from the loud hunters"
    )
    other = (
        "completely different content about spark query engines and "
        "distributed hash joins over very large partitioned tables"
    )
    third = (
        "yet another unrelated document discussing streaming watermarks "
        "state stores and exactly once processing semantics in pipelines"
    )
    fourth = (
        "final standalone passage describing parquet column pruning "
        "predicate pushdown and adaptive query execution at scale"
    )
    b1 = [(1, base), (2, other)]
    b2 = [(3, base + " extra"), (4, third), (5, third + " tail")]
    b3 = [(6, third + " tail indeed"), (7, third + " coda"), (8, fourth)]
    return b1, b2, b3


EXPECTED_ADMITTED = {1, 2, 4, 8}


@pytest.mark.slow
def test_batch_twin_matches_streaming_sink(spark, tmp_path):
    batches = _corpus()

    # --- real streaming sink over the same 3 micro-batches -------------
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    for i, rows in enumerate(batches):
        w = tmp_path / f"w{i}"
        spark.createDataFrame(rows, _schema()).coalesce(1).write.parquet(str(w))
        for f in sorted(glob.glob(str(w / "*.parquet"))):
            shutil.copy(f, src_dir / f"arrival_{i}.parquet")
    corpus = str(tmp_path / "corpus")
    bands = str(tmp_path / "bands")
    stream = (
        spark.readStream.schema(_schema())
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    q = (
        near_dup_filter_sink(stream, corpus, bands, str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream timed out"
    sink_admitted = {
        r["doc_id"] for r in spark.read.parquet(corpus).select("doc_id").collect()
    }

    # --- batch twin with the same batch boundaries + hash family -------
    rows = [(d, t, bi) for bi, rs in enumerate(batches) for d, t in rs]
    docs = spark.createDataFrame(
        rows, _schema(with_batch=True)
    )
    fold = near_dup_fold(
        docs, "doc_id", "text", "batch", batch_values=[0, 1, 2], portable=False
    ).collect()
    twin_admitted = {r["doc_id"] for r in fold if r["admitted"] == 1}
    twin_all = {r["doc_id"] for r in fold}

    assert twin_all == {1, 2, 3, 4, 5, 6, 7, 8}  # verdict for EVERY doc
    assert twin_admitted == sink_admitted == EXPECTED_ADMITTED


@pytest.mark.slow
def test_fold_portable_tier_same_verdicts(spark):
    """The driver-graded portable tier reaches the same verdicts on this
    fixture (near-copies collide, distinct docs don't, under either hash
    family), and infers batch_values from the data when not given."""
    batches = _corpus()
    rows = [(d, t, bi) for bi, rs in enumerate(batches) for d, t in rs]
    docs = spark.createDataFrame(
        rows, _schema(with_batch=True)
    )
    fold = near_dup_fold(docs, "doc_id", "text", "batch", portable=True).collect()
    admitted = {r["doc_id"] for r in fold if r["admitted"] == 1}
    assert admitted == EXPECTED_ADMITTED


def test_fold_docs_without_shingles_admitted(spark):
    """Docs too short to shingle (<3 words) never band, never collide,
    and are admitted — same behavior in the DuckDB oracle (grams CTE
    excludes them)."""
    docs = spark.createDataFrame(
        [(1, "hi", 0), (2, "hi", 1)], _schema(with_batch=True)
    )
    fold = near_dup_fold(docs, "doc_id", "text", "batch", batch_values=[0, 1])
    got = {(r["doc_id"], r["admitted"]) for r in fold.collect()}
    assert got == {(1, 1), (2, 1)}


def test_fold_rejects_stray_batch_id(spark):
    """An input batch_id missing from an explicit batch_values must fail
    loudly: silently dropping the doc would yield an incomplete relation
    (ADVICE r5)."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "some words here now", 0), (2, "other words there then", 7)],
        _schema(with_batch=True),
    )
    with pytest.raises(ValueError, match="batch_id 7"):
        near_dup_fold(docs, "doc_id", "text", "batch", batch_values=[0, 1])


def test_fold_dedupes_doc_id_within_batch(spark):
    """Duplicate-id batchmates collapse to one verdict row, mirroring the
    sink's per-micro-batch dropDuplicates(['doc_id']) (ADVICE r5): before
    the fix both copies were admitted and emitted two rows."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy sleeping dog", 0),
            (1, "the quick brown fox jumps over the lazy sleeping dog", 0),
            (2, "completely different text about distributed query plans", 0),
        ],
        _schema(with_batch=True),
    )
    fold = near_dup_fold(docs, "doc_id", "text", "batch", batch_values=[0]).collect()
    assert len(fold) == 2
    assert {(r["doc_id"], r["admitted"]) for r in fold} == {(1, 1), (2, 1)}


def test_session_window_batch_native_matches_stream(spark, tmp_path):
    """The registered batch query session_window_batch_native and the
    REAL streaming lane (stream_sessionize — the same session_window
    builtin under a watermark in complete mode) must produce identical
    session boundaries and sizes over the same events — the
    driver-checkable twin contract the near-dup/token-budget/PSI lanes
    follow."""
    import os
    import shutil

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from db_writer_redshift_spark.streaming import (
        read_events_stream,
        stream_sessionize,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        import pytest

        pytest.skip("testdata missing")

    stream_dir = tmp_path / "events_only"
    stream_dir.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"), stream_dir / "events.parquet"
    )
    src = read_events_stream(spark, str(stream_dir))
    q = (
        stream_sessionize(src, "30 minutes")
        .writeStream.format("memory")
        .queryName("t_sess_twin")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_sess_twin"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM t_sess_twin")
        .select(
            "user_id",
            F.unix_micros("session_start").alias("session_start"),
            F.unix_micros("session_end").alias("session_end"),
            "n_events",
        )
        .collect()
    }
    batch = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in entry_mod.queries()["session_window_batch_native"](
            spark, sf_dir
        ).collect()
    }
    assert streamed == batch
