"""Dependency-free PNG/TIFF codec contracts (sources/pycodecs.py): exact
round-trips across shapes, dtypes, byte orders, and every PNG scanline
filter; integration through the S10 decode path and a Spark binaryFile
pipeline."""

import glob
import struct
import zlib

import numpy as np
import pytest

from deepcell_data_engineering_spark.sources.pycodecs import (
    decode_png,
    decode_tiff,
    encode_png,
    encode_tiff,
)


def _img(shape, dtype, seed=0):
    rng = np.random.RandomState(seed)
    info = np.iinfo(dtype) if np.issubdtype(dtype, np.integer) else None
    if info is not None:
        return rng.randint(0, min(info.max, 2**31 - 1), size=shape).astype(dtype)
    return rng.rand(*shape).astype(dtype)


@pytest.mark.parametrize("channels", [None, 2, 3, 4])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_png_roundtrip_shapes_dtypes(channels, dtype):
    shape = (13, 17) if channels is None else (13, 17, channels)
    img = _img(shape, dtype, seed=channels or 1)
    out = decode_png(encode_png(img))
    assert out.dtype == np.dtype(dtype)
    assert out.shape == img.shape
    assert np.array_equal(out, img)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_every_filter_roundtrips(filter_type):
    """Each encoder filter exercises the matching decoder unfilter path;
    gradient + noise content makes the predictors actually predict."""
    base = np.add.outer(np.arange(19) * 5, np.arange(23) * 3).astype(np.uint16)
    img = ((base % 251).astype(np.uint8)[..., None] + _img((19, 23, 3), np.uint8, 7) // 4).astype(np.uint8)
    out = decode_png(encode_png(img, filter_type=filter_type))
    assert np.array_equal(out, img)


def test_png_16bit_is_network_order():
    """A 16-bit PNG stores big-endian samples; a handcrafted 1x1 image
    pins the byte order independent of our own encoder."""
    raw = b"\x00" + struct.pack(">H", 0xBEEF)  # filter byte + one sample

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert decode_png(payload)[0, 0] == 0xBEEF


def test_png_rejects_exotic_features():
    img = _img((4, 4), np.uint8)
    payload = bytearray(encode_png(img))
    # flip the interlace byte inside IHDR (offset: 8 sig + 8 hdr + 12)
    payload[8 + 8 + 12] = 1
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_png(bytes(payload))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + bytes(payload))


def _png_chunk(ctype, data):
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _palette_png(idx, depth, plte, trns=None):
    """Handcraft a color-type-3 PNG from an (h, w) index array."""
    h, w = idx.shape
    raw = bytearray()
    for row in idx:
        if depth == 8:
            packed = row.astype(np.uint8).tobytes()
        else:
            bits = ((row[:, None] >> np.arange(depth - 1, -1, -1)) & 1).astype(np.uint8)
            packed = np.packbits(bits.reshape(-1)).tobytes()
        raw += b"\x00" + packed  # filter 0 scanline
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", plte)
    )
    if trns is not None:
        payload += _png_chunk(b"tRNS", trns)
    return payload + _png_chunk(b"IDAT", zlib.compress(bytes(raw))) + _png_chunk(b"IEND", b"")


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_palette_png_expands_to_rgb(depth):
    """Color type 3 at every legal bit depth decodes to the PLTE RGB
    expansion (the reference's PIL view of indexed images)."""
    n = 2**depth
    plte = bytes((i * 7) % 256 for i in range(n * 3))
    rng = np.random.RandomState(depth)
    idx = rng.randint(0, n, size=(9, 13))
    out = decode_png(_palette_png(idx, depth, plte))
    lut = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    assert out.shape == (9, 13, 3)
    assert np.array_equal(out, lut[idx])


def test_palette_png_trns_gives_rgba():
    plte = bytes(range(12))  # 4 entries
    trns = bytes([0, 128])  # entries 0/1 translucent, 2/3 default opaque
    idx = np.array([[0, 1], [2, 3]])
    out = decode_png(_palette_png(idx, 8, plte, trns=trns))
    assert out.shape == (2, 2, 4)
    assert np.array_equal(out[..., :3], np.frombuffer(plte, np.uint8).reshape(4, 3)[idx])
    assert np.array_equal(out[..., 3], np.array([[0, 128], [255, 255]]))


def test_palette_png_bad_inputs_raise():
    idx = np.zeros((2, 2), dtype=np.uint8)
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(_palette_png(idx, 8, b""))
    with pytest.raises(ValueError, match="out of PLTE range"):
        decode_png(_palette_png(idx + 3, 8, bytes(9)))  # 3-entry palette


@pytest.mark.parametrize("samples", [None, 2, 3, 4])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.uint32, np.float32])
def test_tiff_roundtrip_shapes_dtypes(samples, dtype):
    shape = (11, 9) if samples is None else (11, 9, samples)
    img = _img(shape, dtype, seed=3)
    out = decode_tiff(encode_tiff(img))
    assert out.dtype.base == np.dtype(dtype)
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_tiff_big_endian_decodes():
    """A handcrafted big-endian (MM) single-strip TIFF decodes with the
    sample bytes swapped correctly."""
    h, w = 2, 3
    vals = (np.arange(h * w).reshape(h, w) * 999).astype(">u2")
    ifd_off = 8
    entries = []
    for tag, typ, cnt, val in [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, 1, 16 << 16),  # SHORT value left-justified in big-endian
        (259, 3, 1, 1 << 16),
        (262, 3, 1, 1 << 16),
        (273, 4, 1, 0),  # patched below
        (277, 3, 1, 1 << 16),
        (279, 4, 1, h * w * 2),
    ]:
        entries.append(struct.pack(">HHII", tag, typ, cnt, val))
    ifd = struct.pack(">H", len(entries)) + b"".join(entries) + struct.pack(">I", 0)
    strip_off = 8 + len(ifd)
    entries[5] = struct.pack(">HHII", 273, 4, 1, strip_off)
    ifd = struct.pack(">H", len(entries)) + b"".join(entries) + struct.pack(">I", 0)
    payload = b"MM" + struct.pack(">HI", 42, ifd_off) + ifd + vals.tobytes()
    out = decode_tiff(payload)
    assert np.array_equal(out.astype(np.uint16), vals.astype(np.uint16))


def test_tiff_rejects_compressed():
    img = _img((4, 4), np.uint8)
    payload = bytearray(encode_tiff(img))
    # compression tag (259) value: find its entry and set value to 5 (LZW)
    n = struct.unpack("<H", payload[8:10])[0]
    for i in range(n):
        off = 10 + 12 * i
        tag = struct.unpack("<H", payload[off : off + 2])[0]
        if tag == 259:
            payload[off + 8 : off + 10] = struct.pack("<H", 5)
    with pytest.raises(NotImplementedError, match="compression 5"):
        decode_tiff(bytes(payload))


def test_decode_image_uses_pure_python_fallback():
    """S10 integration: without tifffile/PIL, decode_image now decodes
    baseline TIFF and PNG through pycodecs instead of raising."""
    from deepcell_data_engineering_spark.sources.loader import decode_image

    img = _img((6, 5), np.uint16, seed=11)
    out_t = decode_image(encode_tiff(img), fmt="tif")
    out_p = decode_image(encode_png(img), fmt="png")
    assert out_t.dtype == np.float32 and out_p.dtype == np.float32
    assert np.array_equal(out_t, img.astype(np.float32))
    assert np.array_equal(out_p, img.astype(np.float32))
    with pytest.raises(NotImplementedError, match="jpg"):
        decode_image(b"\xff\xd8\xff\xe0 not a real jpeg", fmt="jpg")


def test_binaryfile_scan_decodes_tiffs(spark, tmp_path):
    """End-to-end S10 shape: write real TIFF files, scan with binaryFile,
    decode in an Arrow-batched UDF, verify pixels and pushdown of the
    path filter."""
    import pandas as pd

    imgs = {f"fov{i}.tif": _img((8, 7), np.uint16, seed=i) for i in range(4)}
    for name, arr in imgs.items():
        (tmp_path / name).write_bytes(encode_tiff(arr))
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tif")
        .load(str(tmp_path))
    )

    def decode(batches):
        from deepcell_data_engineering_spark.sources.pycodecs import decode_tiff

        for pdf in batches:
            out = []
            for path, payload in zip(pdf["path"], pdf["content"]):
                arr = decode_tiff(bytes(payload))
                out.append(
                    {
                        "name": path.rsplit("/", 1)[-1],
                        "height": arr.shape[0],
                        "width": arr.shape[1],
                        "checksum": int(arr.astype(np.int64).sum()),
                    }
                )
            yield pd.DataFrame(out)

    rows = df.select("path", "content").mapInPandas(
        decode, schema="name string, height int, width int, checksum long"
    ).collect()
    assert len(rows) == 4
    for r in rows:
        arr = imgs[r["name"]]
        assert (r["height"], r["width"]) == arr.shape
        assert r["checksum"] == int(arr.astype(np.int64).sum())


@pytest.mark.parametrize("channels", [None, 2])
@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.int32, np.float32])
def test_wav_roundtrip(channels, dtype):
    from deepcell_data_engineering_spark.sources.pycodecs import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.RandomState(5)
    shape = (441,) if channels is None else (441, channels)
    if dtype == np.float32:
        samples = (rng.rand(*shape) * 2 - 1).astype(dtype)
    else:
        info = np.iinfo(dtype)
        samples = rng.randint(info.min, info.max, size=shape).astype(dtype)
    out, rate = decode_wav(encode_wav(samples, 44100))
    assert rate == 44100
    expect = samples if channels else samples[:, None]
    assert out.dtype == dtype and np.array_equal(out, expect)


def test_wav_rejects_compressed_and_garbage():
    from deepcell_data_engineering_spark.sources.pycodecs import (
        decode_wav,
        encode_wav,
    )

    payload = bytearray(encode_wav(np.zeros(10, dtype=np.int16), 8000))
    # audio format field lives at offset 20 (RIFF8 + WAVE4 + 'fmt '4 + size4)
    payload[20:22] = struct.pack("<H", 2)  # ADPCM
    with pytest.raises(NotImplementedError, match="PCM"):
        decode_wav(bytes(payload))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")
    # a malformed fmt chunk declaring 0 channels must raise the precise
    # ValueError the module promises, not ZeroDivisionError
    zero_ch = bytearray(encode_wav(np.zeros(10, dtype=np.int16), 8000))
    zero_ch[22:24] = struct.pack("<H", 0)  # channel count field
    with pytest.raises(ValueError, match="0 channels"):
        decode_wav(bytes(zero_ch))
    bad_bits = bytearray(encode_wav(np.zeros(10, dtype=np.int16), 8000))
    bad_bits[34:36] = struct.pack("<H", 12)  # bits-per-sample field
    with pytest.raises(ValueError, match="12 bits"):
        decode_wav(bytes(bad_bits))


def test_decode_media_wav_tensor_layout():
    from deepcell_data_engineering_spark.sources.multimodal import decode_media
    from deepcell_data_engineering_spark.sources.pycodecs import encode_wav

    samples = (np.arange(20, dtype=np.int16).reshape(10, 2) * 100).astype(np.int16)
    out = decode_media(
        "wav",
        encode_wav(samples, 16000),
        {"height": 1, "width": 1, "n_channels": 2, "n_frames": 10},
    )
    assert out.shape == (10, 1, 1, 2)
    np.testing.assert_array_equal(out[:, 0, 0, :], samples.astype(np.float32))


@pytest.mark.parametrize("samples", [None, 3])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
def test_tiff_multipage_stack_roundtrip(samples, dtype):
    from deepcell_data_engineering_spark.sources.pycodecs import (
        decode_tiff,
        decode_tiff_stack,
        encode_tiff_stack,
    )

    shape = (5, 7, 6) if samples is None else (5, 7, 6, samples)
    stack = _img(shape, dtype, seed=9)
    payload = encode_tiff_stack(stack)
    out = decode_tiff_stack(payload)
    assert out.shape == stack.shape and out.dtype.base == np.dtype(dtype)
    assert np.array_equal(out, stack)
    # single-page decode of a stack yields the FIRST page
    first = decode_tiff(payload)
    assert np.array_equal(first, stack[0])
    # a single-page file decodes as a 1-page stack
    one = decode_tiff_stack(encode_tiff(stack[0]))
    assert one.shape[0] == 1 and np.array_equal(one[0], stack[0])
