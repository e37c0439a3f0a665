#!/usr/bin/env python
"""Runnable multimodal-lane walkthrough: synthesize REAL media payloads
(PNG across color types / bit depths / interlacing, PCM WAV, compressed
IMA-ADPCM WAV), decode them back with the dependency-free codecs, and
roll corpus-level media statistics — the Spark-side plumbing a training
pipeline uses for image/audio columns, with the decode step real where
the spec allows and a documented NotImplementedError boundary (JPEG,
perceptual audio codecs) where it does not.

    python examples/multimodal/run.py [sf_dir]

Default: sf_dir=/root/testdata/sf0.001. The same operators back the
registered `multimodal_*` queries proven against DuckDB oracles.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pyspark.sql import functions as F  # noqa: E402

from db_writer_redshift_spark.operators import multimodal  # noqa: E402
from db_writer_redshift_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="multimodal-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # 1. Images: every spec-valid PNG shape through the real encoder,
    #    decoded back by the chunk-walk + inflate + defilter pipeline.
    media = multimodal.synthesize_png_media(
        docs,
        "doc_id",
        "text",
        variants=((2, 8, 0), (3, 4, 1), (0, 16, 1), (6, 8, 0), (0, 1, 0)),
    )
    feats = multimodal.extract_features(media)
    img = feats.agg(
        F.count("*").alias("n_images"),
        F.sum("n_pixels").alias("total_pixels"),
        F.sum("px_sum").alias("channel_mass"),
    ).collect()[0]
    print(
        f"images: {img.n_images} decoded, {img.total_pixels} px, "
        f"channel mass {img.channel_mass}"
    )

    # 2. Audio: the same corpus as compressed IMA-ADPCM (multi-block),
    #    decoded by the step-table reconstruction — ~4:1 vs PCM.
    pcm = multimodal.synthesize_wav_media(docs, "doc_id", "text")
    adpcm = multimodal.synthesize_adpcm_media(
        docs, "doc_id", "text", samples_per_block=16
    )
    pcm_bytes = pcm.agg(F.sum("n_bytes")).collect()[0][0]
    adpcm_bytes = adpcm.agg(F.sum("n_bytes")).collect()[0][0]
    audio = multimodal.extract_audio_features(adpcm).agg(
        F.count("*").alias("n_clips"),
        F.sum("n_samples").alias("n_samples"),
        F.max("peak_abs").alias("peak"),
    ).collect()[0]
    print(
        f"audio: {audio.n_clips} ADPCM clips, {audio.n_samples} samples, "
        f"peak {audio.peak}; bytes {adpcm_bytes} vs PCM {pcm_bytes} "
        f"({100 * adpcm_bytes // pcm_bytes}%)"
    )

    # 3. The honest boundary: a JPEG payload falls back to the
    #    deterministic stub features (never a task failure) — the
    #    documented codec-boundary contract.
    jpeg_like = spark.createDataFrame(
        [(0, "image", bytearray(b"\xff\xd8\xffJFIF-not-really"), "image/jpeg", 18)],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.extract_features(jpeg_like).collect()[0]
    print(f"jpeg boundary: stub fallback width={row.width} (no crash)")

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
