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
    sources/pyjpeg.py). ``mp4``/``avi`` frame decode routes through an
    optional ffmpeg subprocess (_decode_video_ffmpeg): real where the
    binary exists on the executor image, a NotImplementedError naming
    the gate elsewhere — container METADATA always parses dependency-
    free via probe_media. ``fake-raw`` payloads decode
    deterministically from the payload bytes (md5-seeded), giving
    tests a stable pseudo-media source.
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
        return _decode_video_ffmpeg(fmt, payload)
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


def _ffmpeg_binary() -> str | None:
    import shutil

    return shutil.which("ffmpeg")


def _decode_video_ffmpeg(fmt: str, payload: bytes) -> np.ndarray:
    """mp4/avi frame decode through an OPTIONAL ffmpeg subprocess —
    the same honest-gate pattern as the protobuf-gated
    transformWithState runtime (streaming/stateful.py): real where
    the binary exists on the executor image, a NotImplementedError
    naming the gate elsewhere. Routing metadata (dimensions) comes
    from the dependency-free container probe, so a payload that fails
    the probe never reaches the subprocess — probe_media remains the
    pre-decode quarantine stage at any scale.

    Returns float32 [n_frames, h, w, 3] (rgb24). The subprocess reads
    from a temp file, not a stdin pipe: non-faststart mp4 (moov after
    mdat — most camera output) needs seekable input."""
    # probe FIRST: malformed containers fail here with the quarantine
    # ValueError, with or without ffmpeg present
    probe = probe_mp4(payload) if fmt == "mp4" else probe_avi(payload)
    w, h = probe["width"], probe["height"]
    if not w or not h:
        # quarantine classification must be environment-independent:
        # a dimensionless container is malformed whether or not ffmpeg
        # happens to be installed, so this check precedes the gate
        raise ValueError(f"{fmt} probe found no video dimensions")
    ffmpeg = _ffmpeg_binary()
    if ffmpeg is None:
        raise NotImplementedError(
            f"decoding {fmt!r} frames requires the ffmpeg binary, which is "
            "not on PATH in this environment; container metadata still "
            "parses dependency-free (probe_media — the pre-decode filter "
            "stage)"
        )
    import os
    import subprocess
    import tempfile

    fd, path = tempfile.mkstemp(suffix=f".{fmt}")
    try:
        with os.fdopen(fd, "wb") as tf:
            tf.write(payload)
        proc = subprocess.run(
            [
                ffmpeg, "-v", "error", "-i", path,
                "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
    finally:
        os.unlink(path)
    if proc.returncode != 0:
        err = proc.stderr.decode("utf-8", "replace")[:200]
        raise ValueError(f"ffmpeg failed on {fmt} payload: {err}")
    frame_bytes = w * h * 3
    if not proc.stdout or len(proc.stdout) % frame_bytes:
        raise ValueError(
            f"ffmpeg produced {len(proc.stdout)} bytes, not a multiple of "
            f"the probed {w}x{h} rgb24 frame size"
        )
    n = len(proc.stdout) // frame_bytes
    return (
        np.frombuffer(proc.stdout, dtype=np.uint8)
        .reshape(n, h, w, 3)
        .astype(np.float32)
    )


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


# ---------------------------------------------------------------------------
# Video container probing (metadata WITHOUT codecs)
# ---------------------------------------------------------------------------
#
# Frame DECODING for mp4/avi needs ffmpeg (the NotImplementedError gate
# above). Container METADATA does not: both formats carry duration,
# stream layout, dimensions, and codec fourccs in plain binary
# structures. probe_mp4/probe_avi parse those dependency-free — the
# piece a 100 TB video-corpus pipeline runs FIRST (filter by duration/
# resolution/codec before paying for any decode), so it must not
# require the decode stack. References: ISO/IEC 14496-12 box grammar
# (size u32be + fourcc, size==1 -> u64 largesize, size==0 -> to EOF;
# full boxes add version+flags) and the AVIMAINHEADER/AVISTREAMHEADER
# layouts of the RIFF 'AVI ' form.

import struct

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _mp4_boxes(buf: bytes, start: int, end: int):
    off = start
    while off + 8 <= end:
        size, typ = struct.unpack_from(">I4s", buf, off)
        hdr = 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", buf, off + 8)
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            raise ValueError(f"malformed mp4 box {typ!r} at {off}")
        yield typ, off + hdr, off + size
        off += size


def probe_mp4(payload: bytes) -> dict:
    """Parse ISO BMFF structure: (duration_s, n_tracks, width, height,
    codecs, brand). Raises ValueError on non-mp4 bytes."""
    top = list(_mp4_boxes(payload, 0, len(payload)))
    if not top or top[0][0] != b"ftyp":
        raise ValueError("not an ISO BMFF stream (missing ftyp)")
    brand = payload[top[0][1]: top[0][1] + 4].decode("latin1")
    info = {
        "duration_s": None, "n_tracks": 0, "width": None, "height": None,
        "codecs": [], "brand": brand,
    }

    def walk(start: int, end: int) -> None:
        for typ, b, e in _mp4_boxes(payload, start, end):
            if typ == b"mvhd":
                ver = payload[b]
                if ver == 1:
                    ts, = struct.unpack_from(">I", payload, b + 4 + 16)
                    dur, = struct.unpack_from(">Q", payload, b + 4 + 20)
                else:
                    ts, dur = struct.unpack_from(">II", payload, b + 4 + 8)
                info["duration_s"] = round(dur / ts, 3) if ts else None
            elif typ == b"trak":
                info["n_tracks"] += 1
                walk(b, e)
            elif typ == b"tkhd":
                # width/height: trailing 16.16 fixed-point pair
                w, h = struct.unpack_from(">II", payload, e - 8)
                if w and h:
                    info["width"] = w >> 16
                    info["height"] = h >> 16
            elif typ == b"stsd":
                n, = struct.unpack_from(">I", payload, b + 4)
                if n >= 1:
                    fourcc = payload[b + 12: b + 16].decode("latin1")
                    info["codecs"].append(fourcc)
            elif typ in _MP4_CONTAINERS:
                walk(b, e)

    walk(0, len(payload))
    return info


def _riff_chunks(buf: bytes, start: int, end: int):
    off = start
    while off + 8 <= end:
        cid, size = struct.unpack_from("<4sI", buf, off)
        if off + 8 + size > end:
            raise ValueError(f"malformed RIFF chunk {cid!r} at {off}")
        yield cid, off + 8, off + 8 + size
        off += 8 + size + (size & 1)  # chunks pad to even offsets


def probe_avi(payload: bytes) -> dict:
    """Parse the RIFF 'AVI ' form: (duration_s, n_streams, width,
    height, codecs, n_frames). Raises ValueError on non-AVI bytes."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    info = {
        "duration_s": None, "n_streams": 0, "width": None, "height": None,
        "codecs": [], "n_frames": None,
    }

    def walk(start: int, end: int) -> None:
        for cid, b, e in _riff_chunks(payload, start, end):
            if cid == b"LIST":
                walk(b + 4, e)  # skip the list-type fourcc
            elif cid == b"avih":
                us_pf, = struct.unpack_from("<I", payload, b)
                frames, = struct.unpack_from("<I", payload, b + 16)
                streams, = struct.unpack_from("<I", payload, b + 24)
                w, h = struct.unpack_from("<II", payload, b + 32)
                info["n_frames"] = frames
                info["n_streams"] = streams
                info["width"], info["height"] = w, h
                if us_pf:
                    info["duration_s"] = round(frames * us_pf / 1e6, 3)
            elif cid == b"strh":
                fcc_type = payload[b: b + 4].decode("latin1")
                handler = payload[b + 4: b + 8].decode("latin1")
                info["codecs"].append(f"{fcc_type}:{handler}".strip())

    walk(12, len(payload))
    return info


PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("format", StringType(), False),
        StructField("duration_s", DoubleType(), True),
        StructField("n_tracks", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("codecs", ArrayType(StringType()), True),
        StructField("probe_error", StringType(), True),
    ]
)


def probe_media(df: DataFrame) -> DataFrame:
    """Container-metadata probe over a media DataFrame: one row per
    input row, parsed executor-side in Arrow batches. Malformed
    payloads land in ``probe_error`` instead of failing the job (the
    quarantine posture for crawled corpora). This is the pre-decode
    filter stage: a pipeline drops/routes by duration, resolution, or
    codec here, BEFORE any expensive decode runs."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                rec = {
                    "media_id": int(r["media_id"]),
                    "format": r["format"],
                    "duration_s": None, "n_tracks": None, "width": None,
                    "height": None, "codecs": None, "probe_error": None,
                }
                try:
                    payload = bytes(r["payload"])
                    if r["format"] == "mp4":
                        p = probe_mp4(payload)
                        rec.update(
                            duration_s=p["duration_s"],
                            n_tracks=p["n_tracks"], width=p["width"],
                            height=p["height"], codecs=p["codecs"],
                        )
                    elif r["format"] == "avi":
                        p = probe_avi(payload)
                        rec.update(
                            duration_s=p["duration_s"],
                            n_tracks=p["n_streams"], width=p["width"],
                            height=p["height"], codecs=p["codecs"],
                        )
                    else:
                        rec["probe_error"] = f"no prober for {r['format']!r}"
                except Exception as e:  # malformed payload -> quarantine
                    rec["probe_error"] = f"{type(e).__name__}: {e}"[:200]
                rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in PROBE_SCHEMA.fields]
            )

    return df.mapInPandas(go, schema=PROBE_SCHEMA)
