"""Unit tests for the deliberate Python slow-path demos (functions/udfs.py):
Arrow pandas_udf int8 quantization and the sentence-split UDTF."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_writer_redshift_spark.functions.udfs import SplitSentences, quantize_int8


class TestSplitSentencesLogic:
    """Pure-Python behavior of the UDTF class (no Spark needed)."""

    def _rows(self, text):
        return list(SplitSentences().eval(text))

    def test_basic_split(self):
        rows = self._rows("One. Two! Three?")
        assert rows == [(0, "One.", 4), (1, "Two!", 4), (2, "Three?", 6)]

    def test_trailing_fragment_kept(self):
        rows = self._rows("Head. tail without terminator")
        assert rows[-1] == (1, "tail without terminator", 23)

    def test_none_and_empty_yield_nothing(self):
        assert self._rows(None) == []
        assert self._rows("") == []
        assert self._rows("   ") == []

    def test_consecutive_terminators_no_empty_rows(self):
        rows = self._rows("Hi!! Bye..")
        assert all(r[1] for r in rows)
        assert [r[0] for r in rows] == list(range(len(rows)))


class TestQuantizeInt8Spark:
    def test_values_and_nulls(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0]), (3, None)],
            "id int, emb array<double>",
        )
        out = {
            r["id"]: r["q8"]
            for r in df.select("id", quantize_int8(F.col("emb")).alias("q8")).collect()
        }
        # scale = 127/2 = 63.5: floor(1*63.5+0.5)=64, floor(-2*63.5+0.5)=-127,
        # floor(0.5*63.5+0.5)=32
        assert out[1] == [64, -127, 32]
        assert out[2] == [0, 0]
        assert out[3] is None

    def test_max_abs_maps_to_127(self, spark):
        df = spark.createDataFrame([(1, [3.0, -1.5])], "id int, emb array<double>")
        (row,) = df.select(quantize_int8(F.col("emb")).alias("q8")).collect()
        assert max(abs(v) for v in row["q8"]) == 127


class TestSplitSentencesUdtfSpark:
    def test_left_lateral_join_shape(self, spark):
        from db_writer_redshift_spark.functions.udfs import register_split_sentences

        df = spark.createDataFrame(
            [(1, "A b. C d!"), (2, None)], "doc_id int, text string"
        )
        register_split_sentences(spark)
        df.createOrReplaceTempView("__udtf_test_docs")
        out = spark.sql(
            """
            SELECT d.doc_id, s.sentence_idx, s.sentence, s.n_chars
            FROM __udtf_test_docs d
            LEFT OUTER JOIN LATERAL split_sentences(d.text) s ON true
            """
        ).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert sorted(r["sentence"] for r in by_doc[1]) == ["A b.", "C d!"]
        # left outer lateral: null text keeps the row with null UDTF columns
        assert len(by_doc[2]) == 1 and by_doc[2][0]["sentence"] is None
