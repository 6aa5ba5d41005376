"""Multimodal (image/audio/video) column handling.

Media is carried as opaque ``binary`` columns plus typed metadata
(width/height/codec/...). The Spark-side plumbing — schemas, Arrow
batch shapes, mapInPandas partition flow, metadata pushdown — is real
and tested; the actual codec work is stubbed behind ``DECODERS``
because no image/audio libraries exist in this container (clearly
marked; swap in PIL/torchaudio decoders in production).

Scale design: decode runs inside ``mapInPandas`` so bytes never leave
the executor; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``; metadata-only
queries (filter on width/duration) never touch the binary column at
all thanks to Parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
    ]
)

FEATURE_DIM = 8

_FEATURES_FIELDS = "media_id bigint, media_type string, n_bytes bigint, feature array<double>"


def _fake_decode(content: bytes) -> np.ndarray:
    """STUB decoder. Deterministic stand-in for PIL/ffmpeg: folds the
    byte stream into FEATURE_DIM means. Real deployments replace this;
    the surrounding Spark plumbing (schema, batching, partitioning) is
    what this module actually provides."""
    if content is None or len(content) == 0:
        return np.zeros(FEATURE_DIM)
    arr = np.frombuffer(content, dtype=np.uint8)
    pad = (-len(arr)) % FEATURE_DIM
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    return arr.reshape(-1, FEATURE_DIM).mean(axis=0) / 255.0


def extract_features(media: DataFrame) -> DataFrame:
    """binary content -> FEATURE_DIM feature vector via mapInPandas.

    Arrow-batched: each pandas batch holds a bounded number of blobs;
    the binary column is projected only here, so upstream filters never
    read it."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(c).tolist() if c is not None else None
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(lambda c: len(c) if c is not None else 0),
                    "feature": feats,
                }
            )

    return media.select("media_id", "media_type", "content").mapInPandas(
        run, schema=_FEATURES_FIELDS
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    index (media_id, frame_idx), metadata-only — the video bytes are
    untouched until a later decode stage joins on media_id. This is the
    shape that lets a 100 TB video table schedule decode work without
    shuffling blobs."""
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (seeded byte blobs)."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        content = bytes(rng.randint(0, 256, size=200 + (i % 5) * 100, dtype=np.uint8))
        rows.append(
            (
                i,
                mtype,
                bytearray(content),
                64 + i % 32 if mtype == "image" else None,
                48 + i % 16 if mtype == "image" else None,
                30 * (1 + i % 4) if mtype == "video" else None,
                16000 if mtype == "audio" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


_FRAME_FIELDS = (
    "media_id bigint, frame_idx int, frame_f0 double, pooled_f0 double"
)


def decode_sampled_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sample -> decode -> resize/pool pipeline over video rows.

    Stage 1 (metadata-only): ``frame_sample_plan`` schedules one row
    per sampled frame WITHOUT touching bytes. Stage 2: the plan joins
    back to the blob column on media_id — at 100 TB this is the only
    point blobs move, and they move once per media, not per frame
    (frames of one media stay in one task). Stage 3 (mapInPandas,
    Arrow-batched): per-frame decode + a resize/mean-pool step, both
    STUBBED deterministically (no codec libs in this container; swap
    ffmpeg/PIL in production — the schema, batch shape and partition
    flow are the real contract).
    """
    plan = frame_sample_plan(media, every_n)
    blobs = media.select("media_id", "content")
    joined = plan.join(blobs, "media_id").select("media_id", "frame_idx", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            f0, pooled = [], []
            for content, idx in zip(pdf["content"], pdf["frame_idx"]):
                feat = _fake_decode(content)
                # stub frame decode: rotate the feature by frame index
                frame_feat = np.roll(feat, int(idx) % FEATURE_DIM)
                # stub resize: mean-pool adjacent dims (8 -> 4)
                resized = frame_feat.reshape(-1, 2).mean(axis=1)
                f0.append(float(frame_feat[0]))
                pooled.append(float(resized[0]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_f0": f0,
                    "pooled_f0": pooled,
                }
            )

    return joined.mapInPandas(run, schema=_FRAME_FIELDS)
