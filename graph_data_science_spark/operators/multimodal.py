"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns with typed metadata; decode / feature
extraction / resize / frame-sample run as Arrow-batched `mapInPandas`
transforms.  Codec status (operators/codecs.py):

- REAL pure-numpy decode/encode: PPM (P6), uncompressed 24-bit BMP, PCM
  WAV, PNG (stdlib zlib + numpy unfilter) and JPEG — baseline AND
  progressive SOF2 (huffman + successive approximation + batched IDCT) —
  `fake=False` genuinely decodes these and featurizes the pixels/samples
  (channel stats + histograms), and `resize` does a real nearest-neighbor
  resample.
- REAL video demux + frame sampling for AVI and MP4 containers carrying
  Motion-JPEG (codecs.decode_video: RIFF 'movi' scan / ISO BMFF
  stsc+stco+stsz walk); sampled frames are plain JPEGs that feed the same
  image path.
- Arithmetic-coded JPEG and inter-coded video (H.264/VP9/AV1) still raise
  NotImplementedError at the codec boundary; PIL/ffmpeg plug in at exactly
  that seam on a real cluster.
- `fake=True` keeps the deterministic hash-derived stand-in features (used
  by the driver oracle, stable across engines).
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


def synth_decodable_media(spark, n: int = 30, seed: int = 42) -> DataFrame:
    """Media table whose payloads are REAL encoded PPM / BMP images and PCM
    WAV clips (deterministic numpy content) — exercises the fake=False
    decode path end to end."""
    import numpy as np

    from graph_data_science_spark.operators import codecs

    rows = []
    for i in range(n):
        rng = np.random.RandomState(seed + i)
        kind = i % 3
        if kind == 0:
            img = rng.randint(0, 256, size=(24, 32, 3), dtype=np.uint8)
            rows.append((i, bytearray(codecs.encode_ppm(img)), "image/x-portable-pixmap", 32, 24))
        elif kind == 1:
            img = rng.randint(0, 256, size=(16, 20, 3), dtype=np.uint8)
            rows.append((i, bytearray(codecs.encode_bmp(img)), "image/bmp", 20, 16))
        else:
            x = rng.uniform(-0.5, 0.5, size=800)
            rows.append((i, bytearray(codecs.encode_wav(x, 8000)), "audio/wav", None, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_png_media(spark, n: int = 40, size: int = 16, seed: int = 42) -> DataFrame:
    """Media table of REAL zlib-compressed PNGs with analytically known pixel
    statistics: pixel(y, x, c) = base_c + x + y with base_c = f(media_id) and
    base_c + 2*(size-1) < 256 (no wraparound), so channel c's exact mean is
    base_c + (size-1) and every channel's population std is
    stddev_pop(x + y over the grid) — both SQL-computable, which is what lets
    the real distributed decode path get a full value-hash oracle.  Row i is
    encoded with PNG filter type i % 5, covering all five unfilter kernels
    (None/Sub/Up/Average/Paeth) inside one query."""
    import numpy as np

    from graph_data_science_spark.operators import codecs

    y, x = np.mgrid[0:size, 0:size]
    g = (x + y).astype(np.uint8)
    rows = []
    for i in range(n):
        bases = [(i * 37) % 170, (i * 59) % 170, (i * 83) % 170]
        img = np.stack([g + b for b in bases], axis=2).astype(np.uint8)
        rows.append(
            (i, bytearray(codecs.encode_png(img, filter_type=i % 5)), "image/png", size, size)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_jpeg_media(spark, n: int = 40, seed: int = 42) -> DataFrame:
    """Media table of REAL baseline JPEGs constructed to decode EXACTLY, so
    the lossy format still gets a closed-form value oracle: each image is a
    16x16 grid of four flat gray 8x8 blocks with EVEN values
    v_k = 2*((i*37 + k*53) % 100) + 20.  At quality 50 the Annex-K luma DC
    quant step is exactly 16, which divides the flat block's DC coefficient
    8*(v-128) whenever v is even, and every AC (and chroma, since gray means
    Cb = Cr = 128 identically) quantizes to zero — reconstruction is
    bit-exact.  Channel means and the population pixel std are therefore
    closed forms over the four block values.  i alternates 4:4:4 / 4:2:0
    subsampling, every i%4==1 image is PROGRESSIVE (SOF2, the libjpeg
    default 10-scan progression — same quantized coefficients, so the same
    exact oracle), and every third non-progressive image uses
    restart_interval=1; chroma-upsample, successive-approximation, and
    RSTn decode paths are all exercised under one oracle."""
    import numpy as np

    from graph_data_science_spark.operators import codecs

    rows = []
    for i in range(n):
        img = np.zeros((16, 16), dtype=np.uint8)
        for k in range(4):
            v = 2 * ((i * 37 + k * 53) % 100) + 20
            by, bx = divmod(k, 2)
            img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = v
        rgb = np.repeat(img[:, :, None], 3, axis=2)
        prog = i % 4 == 1
        payload = codecs.encode_jpeg(
            rgb,
            quality=50,
            subsampling="4:2:0" if i % 2 else "4:4:4",
            restart_interval=1 if (i % 3 == 0 and not prog) else 0,
            progressive=prog,
        )
        rows.append((i, bytearray(payload), "image/jpeg", 16, 16))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _exact_jpeg_frame(i: int, f: int) -> "bytes":
    """One 16x16 gray frame that baseline-JPEG round-trips bit-exactly (the
    synth_jpeg_media construction, keyed by (video, frame))."""
    import numpy as np

    from graph_data_science_spark.operators import codecs

    img = np.zeros((16, 16), dtype=np.uint8)
    for k in range(4):
        v = 2 * ((i * 37 + f * 17 + k * 53) % 100) + 20
        by, bx = divmod(k, 2)
        img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = v
    return codecs.encode_jpeg(np.repeat(img[:, :, None], 3, axis=2), quality=50)


def synth_video_media(spark, n: int = 12, n_frames: int = 8, fps: float = 10.0) -> DataFrame:
    """Media table of REAL Motion-JPEG videos — AVI for even ids, MP4 for odd
    — whose frames reconstruct bit-exactly (synth_jpeg_media's flat
    even-valued-block construction keyed by (video, frame)), so the full
    demux -> frame-sample -> JPEG-decode pipeline gets closed-form value
    oracles over (media_id, frame_idx)."""
    from graph_data_science_spark.operators import codecs

    rows = []
    for i in range(n):
        frames = [_exact_jpeg_frame(i, f) for f in range(n_frames)]
        mux = codecs.encode_avi_mjpeg if i % 2 == 0 else codecs.encode_mp4_mjpeg
        mime = "video/avi" if i % 2 == 0 else "video/mp4"
        rows.append((i, bytearray(mux(frames, fps=fps)), mime, 16, 16))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


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
        from graph_data_science_spark.operators import codecs

        for pdf in batches:
            if fake:
                feats = [_fake_feature(p, dim) for p in pdf["payload"]]
            else:
                feats = []
                for p, mime in zip(pdf["payload"], pdf["mime"]):
                    p = bytes(p or b"")
                    if p[:4] == b"RIFF":
                        samples, rate = codecs.decode_wav(p)
                        feats.append(codecs.audio_features(samples, rate, dim))
                    else:
                        feats.append(
                            codecs.image_features(codecs.decode_image(p, mime), dim)
                        )
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
    """Resize over the Arrow boundary.  fake=True only rewrites metadata;
    fake=False really resamples decodable payloads (PPM/BMP, nearest
    neighbor) and re-encodes in the same container."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from graph_data_science_spark.operators import codecs

        for pdf in batches:
            pdf = pdf.copy()
            if not fake:
                out = []
                for p in pdf["payload"]:
                    p = bytes(p or b"")
                    img = codecs.resize_nearest(
                        codecs.decode_image(p), width, height
                    )
                    out.append(
                        codecs.encode_bmp(img)
                        if p[:2] == b"BM"
                        else codecs.encode_ppm(img)
                    )
                pdf["payload"] = out
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("pts_s", T.DoubleType(), True),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """REAL video frame sampling: demux each AVI/MP4 payload (codecs.
    decode_video — RIFF 'movi' scan / ISO BMFF stsc+stco+stsz walk), keep
    every `every_n`-th sample, emit one row per kept frame with its
    presentation timestamp.  Each emitted `frame` is the raw Motion-JPEG
    sample — decodable downstream by extract_features / decode_image, so
    video composes with the image pipeline instead of duplicating it.
    Partitioning: one input row fans out to ceil(n_frames/every_n) output
    rows inside the Arrow batch; at 100 TB the fan-out is bounded by
    frames-per-video, and repartitioning the OUTPUT (tiny JPEG rows) is
    cheap relative to shipping the input containers twice."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from graph_data_science_spark.operators import codecs

        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "pts_s": [], "frame": []}
            for mid, payload, mime in zip(pdf["media_id"], pdf["payload"], pdf["mime"]):
                v = codecs.decode_video(bytes(payload or b""), mime)
                dt = 1.0 / v["fps"] if v["fps"] else None
                for idx in range(0, len(v["frames"]), every_n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["pts_s"].append(idx * dt if dt is not None else None)
                    rows["frame"].append(v["frames"][idx])
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Frame-sampling plumbing shim: fake=True keeps the deterministic
    byte-slicing stand-in (partitioning-stable, engine-replayable);
    fake=False delegates to the real demux path (frame_sample)."""
    if not fake:
        return frame_sample(media, every_n=every_n).drop("pts_s")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = max(1, len(payload or b"") // 8)
                for idx in range(0, n_frames, every_n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame"].append((payload or b"")[idx * 8 : idx * 8 + 8])
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=out_schema)
