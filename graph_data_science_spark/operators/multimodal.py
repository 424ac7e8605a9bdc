"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns with typed metadata; decode / feature
extraction / resize / frame-sample run as Arrow-batched `mapInPandas`
transforms.  The actual codec step is STUBBED in this environment (no
image/audio libraries in the container): with `fake=True` every stage emits
deterministic hash-derived features so the Spark-side plumbing — schema,
batch shape, partitioning — is real and tested; with `fake=False` the codec
boundary raises NotImplementedError where a real decoder (PIL/ffmpeg) would
plug in.
"""

# NOTE: no `from __future__ import annotations` — pandas UDF type inference
# needs runtime hints.

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded pseudo-random bytes."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.encode(
            F.concat(F.lit("MEDIA:"), F.md5(F.concat(F.col("id").cast("string"), F.lit(seed)))),
            "UTF-8",
        ).alias("payload"),
        F.element_at(
            F.array(F.lit("image/jpeg"), F.lit("image/png"), F.lit("audio/wav")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("mime"),
        (F.pmod(F.xxhash64("id", F.lit("w")), F.lit(1024)) + 32).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit("h")), F.lit(1024)) + 32).cast("int").alias("height"),
    )


def _fake_feature(payload: bytes, dim: int) -> list:
    """Deterministic feature vector from payload bytes (stands in for a real
    encoder; stable across partitionings)."""
    h = hashlib.sha256(payload or b"").digest()
    raw = (h * ((dim * 2) // len(h) + 1))[: dim * 2]
    return [
        int.from_bytes(raw[2 * i : 2 * i + 2], "big") / 65535.0 - 0.5 for i in range(dim)
    ]


def extract_features(
    media: DataFrame, dim: int = 16, fake: bool = True
) -> DataFrame:
    """Decode + featurize each media payload via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires an image/audio codec library "
                    "not present in this environment; pass fake=True for the "
                    "deterministic stub"
                )
            feats = [_fake_feature(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize plumbing: passes payload through the Arrow boundary and rewrites
    metadata; the pixel transform itself is the stubbed codec step."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real resize requires an image library")
            pdf = pdf.copy()
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Video frame sampling plumbing: emits one row per sampled frame index
    with a deterministic per-frame payload slice."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame sampling requires ffmpeg")
            rows = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = max(1, len(payload or b"") // 8)
                for idx in range(0, n_frames, every_n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame"].append((payload or b"")[idx * 8 : idx * 8 + 8])
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=out_schema)
