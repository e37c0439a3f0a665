"""Unit tests for multimodal plumbing (Arrow-batched stages) and vector
math (numpy cross-check of the JVM-side folds)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from db_writer_redshift_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    return multimodal.synthesize_media(docs, "doc_id", "text")


def _shape(schema):
    return [(f.name, f.dataType) for f in schema.fields]


def test_media_schema_and_type_assignment(media):
    assert _shape(media.schema) == _shape(multimodal.MEDIA_SCHEMA)
    types = {r.doc_id: r.media_type for r in media.collect()}
    assert types == {0: "image", 1: "audio", 2: "video"}  # id % 3 round-robin


def test_extract_features_deterministic(spark, media):
    a = {r.doc_id: (r.checksum, r.width, r.height) for r in multimodal.extract_features(media).collect()}
    b = {r.doc_id: (r.checksum, r.width, r.height) for r in multimodal.extract_features(media).collect()}
    assert a == b and len(a) == 3
    for checksum, width, height in a.values():
        assert checksum is not None and 16 <= width < 80 and 16 <= height < 80


def test_resize_stub_preserves_schema_and_truncates(spark, media):
    out = multimodal.resize_stub(media, max_dim=2)
    assert _shape(out.schema) == _shape(multimodal.MEDIA_SCHEMA)
    for r in out.collect():
        assert r.n_bytes <= 8  # max_dim * 4


def test_decode_real_raises(spark):
    with pytest.raises(NotImplementedError):
        multimodal.decode_real(b"bytes", "image")


def test_cosine_sim_matches_numpy(spark):
    from db_writer_redshift_spark.functions.vector import cosine_sim

    a = [1.0, 2.0, 3.0, 4.0]
    b = [0.5, -1.0, 2.0, 0.0]
    expected = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    df = spark.createDataFrame([(a, b)], "va array<double>, vb array<double>")
    got = df.select(cosine_sim(F.col("va"), F.col("vb")).alias("c")).collect()[0].c
    assert abs(got - expected) < 1e-12


def test_cosine_sim_zero_norm_null(spark):
    from db_writer_redshift_spark.functions.vector import cosine_sim

    df = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], "va array<double>, vb array<double>")
    assert df.select(cosine_sim(F.col("va"), F.col("vb")).alias("c")).collect()[0].c is None


def test_frame_sample_explodes_videos_only(spark, media):
    frames = multimodal.frame_sample_stub(media, n_frames=4, fps_ms=40)
    assert _shape(frames.schema) == _shape(multimodal.FRAME_SCHEMA)
    rows = frames.collect()
    # only doc 2 (id % 3 == 2) is video -> exactly 4 frames for it
    assert {r.doc_id for r in rows} == {2}
    assert [r.frame_idx for r in sorted(rows, key=lambda r: r.frame_idx)] == [0, 1, 2, 3]
    assert [r.frame_ts_ms for r in sorted(rows, key=lambda r: r.frame_idx)] == [0, 40, 80, 120]
    # frames partition the payload prefix deterministically
    payload = b"delta epsilon zeta"
    step = max(1, len(payload) // 4)
    got = b"".join(r.frame_payload for r in sorted(rows, key=lambda r: r.frame_idx))
    assert got == payload[: step * 4]
    again = multimodal.frame_sample_stub(media, n_frames=4, fps_ms=40).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
