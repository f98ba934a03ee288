"""JPEG codec contracts (sources/pyjpeg.py), baseline + progressive: PSNR-gated
round-trips (JPEG is lossy — bit equality is not defined for it),
marker-level features (4:2:0, restart intervals, multi-table segments),
and precise rejection of non-baseline coding."""

import struct

import numpy as np
import pytest

from deepcell_data_engineering_spark.sources.pyjpeg import decode_jpeg, encode_jpeg


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _smooth_rgb(h, w):
    x = np.linspace(0, 1, w)
    y = np.linspace(0, 1, h)
    return np.dstack(
        [
            np.outer(y, x) * 255,
            (1 - np.outer(y, x)) * 255,
            np.outer(y**2, np.ones_like(x)) * 255,
        ]
    ).astype(np.uint8)


def test_constant_images_roundtrip_exactly():
    """A flat image is pure DC — quantization cannot move it."""
    for img in [np.full((16, 16), 128, np.uint8), np.full((8, 24, 3), 200, np.uint8)]:
        out = decode_jpeg(encode_jpeg(img, quality=90))
        assert out.shape == img.shape
        assert np.array_equal(out, img)


@pytest.mark.parametrize("shape", [(40, 33), (8, 8), (9, 7), (1, 1)])
def test_grayscale_psnr(shape):
    h, w = shape
    img = (np.add.outer(np.linspace(0, 200, h), np.linspace(0, 50, w))).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(img, out) > 40


@pytest.mark.parametrize("subsample", [False, True])
@pytest.mark.parametrize("restart_interval", [0, 1, 3])
def test_rgb_roundtrip_psnr(subsample, restart_interval):
    """4:4:4 and 4:2:0 at non-multiple-of-MCU dimensions, with and
    without restart markers."""
    img = _smooth_rgb(29, 37)
    out = decode_jpeg(
        encode_jpeg(img, quality=92, subsample=subsample, restart_interval=restart_interval)
    )
    assert out.shape == img.shape
    assert _psnr(img, out) > (40 if subsample else 42)


def test_quality_monotonicity():
    img = _smooth_rgb(32, 32)
    errs = [
        np.mean(
            (decode_jpeg(encode_jpeg(img, quality=q)).astype(float) - img.astype(float)) ** 2
        )
        for q in (25, 75, 95)
    ]
    assert errs[0] >= errs[1] >= errs[2]


def test_rejects_arithmetic_and_garbage():
    img = np.zeros((8, 8), np.uint8)
    payload = bytearray(encode_jpeg(img))
    sof = payload.find(b"\xFF\xC0")
    payload[sof + 1] = 0xC9  # flip SOF0 -> SOF9 (arithmetic sequential)
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG" + bytes(payload))


def test_rejects_12bit_precision():
    img = np.zeros((8, 8), np.uint8)
    payload = bytearray(encode_jpeg(img))
    sof = payload.find(b"\xFF\xC0")
    payload[sof + 4] = 12  # precision byte inside SOF0
    with pytest.raises(NotImplementedError, match="precision 12"):
        decode_jpeg(bytes(payload))


def test_byte_stuffing_survives():
    """High-entropy content forces 0xFF bytes into the entropy stream;
    the stuffed 0xFF00 pairs must decode transparently."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 24), dtype=np.uint8)
    payload = encode_jpeg(img, quality=95)
    assert b"\xFF\x00" in payload  # stuffing actually happened
    out = decode_jpeg(payload)
    assert out.shape == img.shape
    assert _psnr(img, out) > 25


def test_decode_media_jpeg_tensor_layout():
    from deepcell_data_engineering_spark.sources.multimodal import decode_media

    img = _smooth_rgb(16, 16)
    out = decode_media("jpg", encode_jpeg(img, quality=95), None)
    assert out.shape == (1, 16, 16, 3) and out.dtype == np.float32
    assert _psnr(img, out[0]) > 40


def test_decode_image_jpg_fallback():
    """S10 decode path: decode_image('jpg') works without PIL via
    pyjpeg (matching the reference's PIL-based get_image for .jpg,
    caliban_toolbox/utils/misc_utils.py:41-48)."""
    from deepcell_data_engineering_spark.sources.loader import decode_image

    img = (np.add.outer(np.linspace(0, 200, 12), np.linspace(0, 50, 10))).astype(np.uint8)
    out = decode_image(encode_jpeg(img, quality=95), fmt="jpg")
    assert out.dtype == np.float32 and out.shape == (12, 10)
    assert _psnr(img, np.clip(out, 0, 255).astype(np.uint8)) > 40


def test_dri_segment_roundtrips_marker_level():
    """The DRI segment parses and every RSTn boundary resets the DC
    predictors — checked by equality with the no-restart decode."""
    img = _smooth_rgb(48, 48)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    with_rst = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=2))
    assert np.array_equal(base, with_rst)


def test_multiple_tables_single_dqt_segment():
    """Both quant tables packed into ONE DQT segment (legal, common)
    still decode: splice the two DQT payloads together."""
    img = _smooth_rgb(16, 16)
    payload = encode_jpeg(img, quality=90)
    # locate the two DQT segments
    p, dqts, rest = 2, [], bytearray(b"\xFF\xD8")
    while p + 4 <= len(payload):
        marker, ln = struct.unpack(">HH", payload[p : p + 4])
        if marker == 0xFFDA:
            rest += payload[p:]
            break
        seg = payload[p : p + 2 + ln]
        if marker == 0xFFDB:
            dqts.append(seg[4:])
        else:
            rest += seg
        p += 2 + ln
    combined = b"".join(dqts)
    merged = (
        rest[:2]
        + struct.pack(">HH", 0xFFDB, len(combined) + 2)
        + combined
        + rest[2:]
    )
    assert np.array_equal(decode_jpeg(bytes(merged)), decode_jpeg(payload))


def test_binaryfile_scan_decodes_jpegs(spark, tmp_path):
    """End-to-end S10 shape for JPEG: write real .jpg files, scan with
    binaryFile, decode in an Arrow-batched mapInPandas pass — the same
    plumbing the reference's PIL-based loader feeds
    (pre_annotation/data_loader.py:429), dependency-free."""
    import pandas as pd

    rng = np.random.RandomState(5)
    imgs = {}
    for i in range(3):
        base = np.add.outer(np.linspace(0, 200, 24), np.linspace(0, 55, 17))
        imgs[f"fov{i}.jpg"] = (base + i * 10).clip(0, 255).astype(np.uint8)
    for name, arr in imgs.items():
        (tmp_path / name).write_bytes(encode_jpeg(arr, quality=95))
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.jpg")
        .load(str(tmp_path))
    )

    def decode(batches):
        from deepcell_data_engineering_spark.sources.pyjpeg import decode_jpeg

        for pdf in batches:
            out = []
            for path, payload in zip(pdf["path"], pdf["content"]):
                arr = decode_jpeg(bytes(payload))
                out.append(
                    {
                        "name": path.rsplit("/", 1)[-1],
                        "height": arr.shape[0],
                        "width": arr.shape[1],
                        "mean": float(arr.mean()),
                    }
                )
            yield pd.DataFrame(out)

    rows = df.select("path", "content").mapInPandas(
        decode, schema="name string, height int, width int, mean double"
    ).collect()
    assert len(rows) == 3
    for r in rows:
        arr = imgs[r["name"]]
        assert (r["height"], r["width"]) == arr.shape
        # lossy codec: mean within 1 gray level of the original
        assert abs(r["mean"] - float(arr.mean())) < 1.0


# ---------------------------------------------------------------------------
# progressive (SOF2)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("subsample", [False, True])
def test_progressive_decodes_identically_to_baseline(subsample):
    """The progressive scan script (DC Al=1 -> per-component AC first
    Al=1 -> AC refine Al=0 -> DC refine) carries exactly the same
    quantized coefficients as the baseline stream, so the decoded
    pixels must be BIT-IDENTICAL — a two-sided proof: any bug in the
    refinement encoder or decoder breaks the equality."""
    from deepcell_data_engineering_spark.sources.pyjpeg import encode_jpeg_progressive

    img = _smooth_rgb(29, 37)
    base = decode_jpeg(encode_jpeg(img, quality=92, subsample=subsample))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=92, subsample=subsample))
    assert np.array_equal(base, prog)


@pytest.mark.parametrize("quality", [40, 85, 97])
def test_progressive_noise_exercises_eob_and_refinement(quality):
    """High-entropy content at several qualities drives EOB runs,
    ZRL-inside-refinement, and buffered correction bits."""
    from deepcell_data_engineering_spark.sources.pyjpeg import encode_jpeg_progressive

    rng = np.random.RandomState(quality)
    img = rng.randint(0, 256, (41, 26, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=quality))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=quality))
    assert np.array_equal(base, prog)


def test_progressive_grayscale_and_edges():
    from deepcell_data_engineering_spark.sources.pyjpeg import encode_jpeg_progressive

    for img in [
        np.full((8, 8), 128, np.uint8),                      # pure DC
        (np.add.outer(np.linspace(0, 200, 31), np.linspace(0, 50, 22))).astype(np.uint8),
        np.zeros((1, 1), np.uint8),                          # single pixel
        np.eye(16, dtype=np.uint8) * 255,                    # sparse AC
    ]:
        base = decode_jpeg(encode_jpeg(img, quality=90))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=90))
        assert np.array_equal(base, prog)


def test_progressive_marker_is_sof2():
    from deepcell_data_engineering_spark.sources.pyjpeg import encode_jpeg_progressive

    payload = encode_jpeg_progressive(np.zeros((8, 8), np.uint8))
    assert b"\xFF\xC2" in payload and b"\xFF\xC0" not in payload
    # multiple SOS segments (DC first, AC first, AC refine, DC refine)
    assert payload.count(b"\xFF\xDA") == 4
