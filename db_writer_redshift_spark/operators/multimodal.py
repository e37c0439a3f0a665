"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas stages.

The container has no image/audio codecs, so the decode step is STUBBED
(deterministic fake features, or NotImplementedError when real decoding is
demanded) — but the Spark-side plumbing is real and tested: schema shape,
binary payload handling, mapInPandas batch iteration, partition-preserving
feature extraction. Swapping the stub for PIL/librosa is a one-function
change that touches no plan shape.

Scale notes: payloads stay in executor memory only batch-at-a-time
(mapInPandas is an iterator over Arrow batches — never a full-partition
materialization); metadata-only queries never touch the binary column
thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

REAL_DECODERS_AVAILABLE = False  # flip when PIL/librosa exist in the image

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),  # opaque encoded bytes
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("checksum", LongType(), True),  # stub "feature"
        StructField("width", LongType(), True),  # stub decode metadata
        StructField("height", LongType(), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Manufacture a deterministic binary payload column from text (the test
    corpus has no real media): payload = utf-8 bytes, media_type round-robins
    by id. Produces the MEDIA_SCHEMA shape every downstream op consumes."""
    mt = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        mt.alias("media_type"),
        payload.alias("payload"),
        F.concat(F.lit("application/x-fake-"), mt).alias("mime"),
        F.length(payload).cast("bigint").alias("n_bytes"),
    )


def _stub_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decode. A real implementation would dispatch to
    PIL (image), soundfile (audio), or a frame sampler (video)."""
    if payload is None:
        return {"checksum": None, "width": None, "height": None}
    checksum = 0
    for i, byte in enumerate(payload):
        checksum = (checksum * 31 + byte + i) % (1 << 31)
    # fake dimensions derived from content length — stands in for decoded
    # pixel geometry / sample counts
    return {
        "checksum": checksum,
        "width": 16 + (len(payload) % 64),
        "height": 16 + (checksum % 64),
    }


def decode_real(payload: bytes, media_type: str):
    """The genuine decode path — unavailable in this container."""
    raise NotImplementedError(
        "real media decoding requires PIL/soundfile/ffmpeg, not present in "
        "this environment; use extract_features (stub decode) instead"
    )


def extract_features(media_df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The pandas function is an *iterator* over Arrow record batches — memory
    is bounded by batch size regardless of partition size, which is the
    property that keeps this viable when payloads are MBs each.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _stub_decode(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "checksum": [f["checksum"] for f in feats],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                }
            )

    return media_df.mapInPandas(extract, schema=FEATURE_SCHEMA)


def resize_stub(media_df: DataFrame, max_dim: int = 224) -> DataFrame:
    """Resize/frame-sample plumbing: passes payloads through a pandas stage
    that would re-encode; here it truncates bytes deterministically (stub)
    while preserving MEDIA_SCHEMA."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                None if p is None else bytes(p[: max_dim * 4]) for p in out["payload"]
            ]
            out["n_bytes"] = [None if p is None else len(p) for p in out["payload"]]
            yield out

    return media_df.mapInPandas(resize, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_ts_ms", LongType(), False),
        StructField("frame_payload", BinaryType(), True),
        StructField("frame_bytes", LongType(), True),
    ]
)


def frame_sample_stub(
    media_df: DataFrame, n_frames: int = 4, fps_ms: int = 40
) -> DataFrame:
    """Video frame sampling plumbing: one-to-many mapInPandas that emits
    ``n_frames`` evenly-spaced frames per video row (non-video rows are
    dropped). The decode is stubbed — each "frame" is the payload slice at
    the frame's byte offset, deterministic in (payload, frame_idx) — but
    the plumbing is the real thing: a row-exploding Arrow stage whose
    output height differs from its input height (the shape a real
    ffmpeg-backed sampler needs), timestamp metadata per frame, and
    batch-bounded memory (frames for one input batch at a time).

    At scale this is the fan-out stage before per-frame feature
    extraction; partitioning is inherited from the scan, and the
    downstream per-frame ops see ~n_frames× rows without any shuffle.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["media_type"] == "video"]
            rows = {k: [] for k in ("doc_id", "frame_idx", "frame_ts_ms",
                                    "frame_payload", "frame_bytes")}
            for doc_id, payload in zip(vids["doc_id"], vids["payload"]):
                if payload is None:
                    continue
                step = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    chunk = bytes(payload[i * step : (i + 1) * step])
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * fps_ms)
                    rows["frame_payload"].append(chunk)
                    rows["frame_bytes"].append(len(chunk))
            yield pd.DataFrame(rows)

    return media_df.mapInPandas(sample, schema=FRAME_SCHEMA)
