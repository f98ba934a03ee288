"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The pattern (north-star requirement): media payloads ride as ``BINARY``
columns with a metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas UDFs over mapInPandas. The
Spark-side plumbing — schema, partitioning, UDF signatures, batch shapes —
is real and tested; the actual codec calls are STUBBED because this
container ships no image/audio libraries (PIL/cv2/tifffile absent):
``decode_media`` raises NotImplementedError for real formats and provides
a deterministic fake ("fake-raw") so pipelines are testable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("format", StringType(), False),  # tiff | png | wav | fake-raw ...
        StructField("meta", StructType([
            StructField("height", IntegerType(), True),
            StructField("width", IntegerType(), True),
            StructField("n_channels", IntegerType(), True),
            StructField("n_frames", IntegerType(), True),
            StructField("sample_rate", IntegerType(), True),
        ]), True),
        StructField("payload", BinaryType(), True),
    ]
)

_REAL_FORMATS = {"mp4", "avi"}


def decode_media(fmt: str, payload: bytes, meta) -> np.ndarray:
    """Decode one payload to a dense array.

    ``tiff``/``png``/``jpg``/``wav`` decode for real through the
    dependency-free baseline codecs (sources/pycodecs.py,
    sources/pyjpeg.py). Video codecs are NOT available in this
    environment — those formats raise, exactly marking the integration
    point where ffmpeg plugs in on a production image. ``fake-raw``
    payloads decode deterministically from the payload bytes
    (md5-seeded), giving tests a stable pseudo-media source.
    """
    if fmt in ("tiff", "tif"):
        # stack decode: multi-page payloads (the microscope z/t layout)
        # map pages to the frame axis; single-page files yield 1 frame
        from deepcell_data_engineering_spark.sources.pycodecs import decode_tiff_stack

        arr = decode_tiff_stack(payload)
        if arr.ndim == 3:
            arr = arr[..., None]
        return arr.astype(np.float32)
    if fmt == "png":
        from deepcell_data_engineering_spark.sources.pycodecs import decode_png

        return np.atleast_3d(decode_png(payload))[None, ...].astype(np.float32)
    if fmt in ("jpg", "jpeg"):
        from deepcell_data_engineering_spark.sources.pyjpeg import decode_jpeg

        return np.atleast_3d(decode_jpeg(payload))[None, ...].astype(np.float32)
    if fmt == "wav":
        from deepcell_data_engineering_spark.sources.pycodecs import decode_wav

        samples, _rate = decode_wav(payload)
        # media tensor layout [frames, h, w, channels]: audio frames map
        # to the frame axis, channels to the channel axis
        return samples.astype(np.float32)[:, None, None, :]
    if fmt in _REAL_FORMATS:
        raise NotImplementedError(
            f"codec for {fmt!r} requires an image/audio library not present "
            "in this environment (PIL/librosa/ffmpeg integration point)"
        )
    h = int(meta["height"] or 1)
    w = int(meta["width"] or 1)
    c = int(meta["n_channels"] or 1)
    f = int(meta["n_frames"] or 1)
    if fmt == "raw-f32":  # C-order float32 [f, h, w, c] — engine-native
        return np.frombuffer(payload, dtype=np.float32).reshape(f, h, w, c)
    if fmt != "fake-raw":
        raise ValueError(f"unknown media format: {fmt}")
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.rand(f, h, w, c).astype(np.float32)


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("mean", ArrayType(DoubleType()), False),  # per channel
        StructField("std", ArrayType(DoubleType()), False),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Per-channel mean/std features per media row — the decode →
    feature-extract stage as one Arrow pass."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = decode_media(r["format"], bytes(r["payload"]), r["meta"])
                rows.append(
                    {
                        "media_id": int(r["media_id"]),
                        "n_frames": int(arr.shape[0]),
                        "mean": [float(v) for v in arr.mean(axis=(0, 1, 2))],
                        "std": [float(v) for v in arr.std(axis=(0, 1, 2))],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return df.mapInPandas(go, schema=FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling: 1 row in → k frame rows out (mapInPandas
    fan-out; the video twin of the crop fan-out)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("height", IntegerType(), False),
            StructField("width", IntegerType(), False),
            StructField("n_channels", IntegerType(), False),
            StructField("frame", BinaryType(), False),
        ]
    )

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = decode_media(r["format"], bytes(r["payload"]), r["meta"])
                for i in range(0, arr.shape[0], every_n):
                    frame = np.ascontiguousarray(arr[i], dtype=np.float32)
                    rows.append(
                        {
                            "media_id": int(r["media_id"]),
                            "frame_idx": i,
                            "height": frame.shape[0],
                            "width": frame.shape[1],
                            "n_channels": frame.shape[2],
                            "frame": frame.tobytes(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(go, schema=out_schema)


def resize_media(df: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Decode → bilinear resize → re-encode as raw float32 payloads."""
    from deepcell_data_engineering_spark.dataset.builder import resize_bilinear

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in pdf.index:
                r = pdf.loc[i]
                arr = decode_media(r["format"], bytes(r["payload"]), r["meta"])
                resized = np.stack([resize_bilinear(fr, out_h, out_w) for fr in arr])
                pdf.at[i, "payload"] = resized.astype(np.float32).tobytes()
                meta = dict(r["meta"].asDict() if hasattr(r["meta"], "asDict") else r["meta"])
                meta["height"], meta["width"] = out_h, out_w
                pdf.at[i, "meta"] = meta
                pdf.at[i, "format"] = "raw-f32"  # decoded-and-resized payloads are engine-native
            yield pdf[[f.name for f in MEDIA_SCHEMA.fields]]

    return df.mapInPandas(go, schema=MEDIA_SCHEMA)
