"""token_budget_gate_fold — the batch twin of the streaming
transformWithStateInPandas token-budget gate. The fold's skip-and-
continue semantics are proven by hand here, and against the REAL
streaming gate when protobuf is present (the gate's state protocol
needs it; absent in this container, so that leg self-skips — the twin
is then the only executable form of the semantics, which is exactly
why it's registered as a driver query)."""

from __future__ import annotations

import pytest

from db_writer_redshift_spark.operators.mixing import token_budget_gate_fold

try:
    from google.protobuf import descriptor  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False


def _rows():
    # source a, budget 100: 40 admitted (40), 50 admitted (90),
    # 20 REJECTED (would be 110), 10 admitted (100) <- skip-and-continue
    # source b: 95 admitted, 10 rejected, 5 admitted (100)
    return [
        (1, "a", 40),
        (2, "a", 50),
        (3, "a", 20),
        (4, "a", 10),
        (5, "b", 95),
        (6, "b", 10),
        (7, "b", 5),
    ]


def test_fold_skip_and_continue_semantics(spark):
    docs = spark.createDataFrame(
        _rows(), "doc_id long, source string, n_tokens long"
    )
    out = token_budget_gate_fold(docs, "doc_id", "source", "n_tokens", 100)
    got = {r.doc_id: (r.admitted, r.used_after) for r in out.collect()}
    assert got == {
        1: (1, 40),
        2: (1, 90),
        3: (0, 90),
        4: (1, 100),
        5: (1, 95),
        6: (0, 95),
        7: (1, 100),
    }


def test_fold_order_is_doc_id_not_input_order(spark):
    """Admission order is doc_id, regardless of the incoming row order —
    the same sort the streaming gate applies per micro-batch."""
    rows = [(2, "a", 60), (1, "a", 60)]  # arrives 2-then-1
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long"
    )
    out = token_budget_gate_fold(docs, "doc_id", "source", "n_tokens", 100)
    got = {r.doc_id: r.admitted for r in out.collect()}
    assert got == {1: 1, 2: 0}  # doc 1 wins the budget


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithStateInPandas needs google.protobuf (absent here)",
)
def test_fold_matches_streaming_gate(spark, tmp_path):
    """With protobuf available, the twin's verdicts equal the real
    streaming gate's admitted set over the same docs (single availableNow
    replay, so the gate sees doc_id order within its batches)."""
    from pyspark.sql import types as T

    from db_writer_redshift_spark.streaming import stream_token_budget_gate

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_tokens", T.LongType()),
        ]
    )
    src = tmp_path / "src"
    spark.createDataFrame(_rows(), schema).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        stream_token_budget_gate(stream, 100)
        .writeStream.format("memory")
        .queryName("gate_out")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream timed out"
    gate_admitted = {
        r.doc_id for r in spark.sql("SELECT doc_id FROM gate_out").collect()
    }
    docs = spark.createDataFrame(_rows(), schema)
    fold = token_budget_gate_fold(docs, "doc_id", "source", "n_tokens", 100)
    twin_admitted = {r.doc_id for r in fold.collect() if r.admitted == 1}
    assert twin_admitted == gate_admitted
