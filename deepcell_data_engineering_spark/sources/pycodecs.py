"""Dependency-free image codecs: PNG (all five scanline filters, gray /
gray+alpha / RGB / RGBA at 8/16-bit, plus palette color type 3 at bit
depth 1/2/4/8 expanded to RGB(A)) and baseline TIFF (uncompressed,
both byte orders, uint8/16/32 + float32, single or multi strip).

The reference decodes microscope TIFF/PNG eagerly with tifffile/PIL
(caliban_toolbox/utils/misc_utils.py:41-48, pre_annotation/
data_loader.py:429). Those libraries are not installed in this
environment, but the container DOES have everything a baseline decode
needs: zlib (PNG's only compression) and struct. These codecs close the
S10 gap for the formats microscopes actually emit — uncompressed or
deflate data — while genuinely exotic encodings (JPEG, LZW-TIFF, tiled
TIFF, interlaced PNG) still raise with a precise message naming the
missing feature.

Scale posture: codecs run inside Arrow-batched UDFs over binaryFile
scans (sources/loader.py:decode_image); each payload decodes
independently, so the work is embarrassingly parallel and the hot loop
per image is numpy slicing, not Python-per-pixel (the PNG unfilter loop
is per-ROW, vectorized across the row's bytes).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a row (a=left, b=up, c=upleft)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG to (h, w) or (h, w, channels), uint8 or uint16.

    Palette images (color type 3, bit depth 1/2/4/8) are expanded to
    RGB — or RGBA when a tRNS chunk is present — matching what the
    reference sees from PIL for indexed screenshots/figures
    (caliban_toolbox/utils/misc_utils.py:45-48)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("not a PNG: missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if interlace != 0:
        raise NotImplementedError("interlaced (Adam7) PNG not supported")
    if color == 3:
        if depth not in (1, 2, 4, 8):
            raise ValueError(f"palette PNG bit depth {depth} invalid")
        if plte is None or len(plte) % 3 != 0 or not plte:
            raise ValueError("palette PNG missing/malformed PLTE chunk")
        channels = 1
        bpp = 1  # filter unit is one byte for sub-byte-packed indices
        stride = (w * depth + 7) // 8
    elif color not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {color} not supported")
    elif depth not in (8, 16):
        raise NotImplementedError(f"PNG bit depth {depth} not supported")
    else:
        channels = _PNG_CHANNELS[color]
        bps = depth // 8
        bpp = channels * bps  # filter unit
        stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    mat = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = mat[:, 0]
    rows = mat[:, 1:]
    recon = np.zeros((h, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        cur = rows[y].astype(np.uint8)
        up = recon[y - 1] if y > 0 else zero_row
        if f == 0:
            recon[y] = cur
        elif f == 1:  # Sub: per byte lane, recon = running sum of raw —
            # cumsum in int64 then mask (mod distributes over addition),
            # so the row vectorizes instead of a Python-per-byte loop
            lanes = cur.reshape(-1, bpp)
            recon[y] = (
                np.cumsum(lanes.astype(np.int64), axis=0) & 0xFF
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up — fully vectorized
            recon[y] = cur + up
        elif f == 3:  # Average
            r = cur.copy()
            for i in range(stride):
                left = int(r[i - bpp]) if i >= bpp else 0
                r[i] = (int(cur[i]) + ((left + int(up[i])) >> 1)) & 0xFF
            recon[y] = r
        elif f == 4:  # Paeth
            r = cur.copy()
            for i in range(stride):
                left = int(r[i - bpp]) if i >= bpp else 0
                ul = int(up[i - bpp]) if i >= bpp else 0
                a_, b_, c_ = left, int(up[i]), ul
                p = a_ + b_ - c_
                pa, pb, pc = abs(p - a_), abs(p - b_), abs(p - c_)
                pred = a_ if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c_)
                r[i] = (int(cur[i]) + pred) & 0xFF
            recon[y] = r
        else:
            raise ValueError(f"PNG filter {f} invalid")
    if color == 3:
        if depth == 8:
            idx = recon
        else:  # unpack big-endian bit groups within each packed byte
            bits_ = np.unpackbits(recon, axis=1)[:, : w * depth]
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
            idx = (bits_.reshape(h, w, depth) * weights).sum(axis=2)
        lut = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if int(idx.max(initial=0)) >= len(lut):
            raise ValueError("palette PNG index out of PLTE range")
        rgb = lut[idx]
        if trns is None:
            return rgb
        alpha_lut = np.full(len(lut), 255, dtype=np.uint8)
        at = np.frombuffer(trns, dtype=np.uint8)[: len(lut)]
        alpha_lut[: len(at)] = at
        return np.dstack([rgb, alpha_lut[idx]])
    if depth == 16:
        img = recon.reshape(h, w, channels, 2).astype(np.uint16)
        img = (img[..., 0] << 8) | img[..., 1]  # network byte order
    else:
        img = recon.reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode (h, w) or (h, w, {2,3,4}) uint8/uint16 as PNG.

    ``filter_type`` selects the per-row scanline filter (0-4) — mainly
    so tests exercise every unfilter path; 0 (None) is the fast
    default (zlib does the compressing either way)."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, channels = a.shape
    if channels not in (1, 2, 3, 4):
        raise ValueError(f"unsupported channel count {channels}")
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if a.dtype == np.uint8:
        depth = 8
        body = a
    elif a.dtype == np.uint16:
        depth = 16
        body = np.stack([(a >> 8).astype(np.uint8), (a & 0xFF).astype(np.uint8)], axis=-1)
        body = body.reshape(h, w, channels * 2)
    else:
        raise ValueError(f"unsupported dtype {a.dtype} (uint8/uint16 only)")
    bpp = channels * (depth // 8)
    flat = body.reshape(h, w * bpp).astype(np.uint8)
    if not 0 <= filter_type <= 4:
        raise ValueError(f"PNG filter {filter_type} invalid")
    lines = bytearray()
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.uint8), cur[:-bpp]]) if w * bpp > bpp else np.zeros_like(cur)
        upleft = np.concatenate([np.zeros(bpp, dtype=np.uint8), prev[:-bpp]]) if w * bpp > bpp else np.zeros_like(prev)
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = cur - left
        elif filter_type == 2:
            enc = cur - prev
        elif filter_type == 3:
            enc = cur - (((left.astype(np.uint16) + prev.astype(np.uint16)) >> 1).astype(np.uint8))
        else:
            enc = cur - _paeth(left, prev, upleft)
        lines.append(filter_type)
        lines.extend(enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + ctype + data
        return c + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# baseline TIFF
# ---------------------------------------------------------------------------

_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG


def _read_ifd_values(buf: bytes, endian: str, type_: int, count: int, raw: bytes) -> list[int]:
    size = _TIFF_TYPE_SIZE.get(type_)
    if size is None:
        raise NotImplementedError(f"TIFF tag type {type_} not supported")
    total = size * count
    if total <= 4:
        data = raw[:total]
    else:
        (off,) = struct.unpack(endian + "I", raw)
        data = buf[off : off + total]
    fmt = {1: "B", 3: "H", 4: "I"}[type_]
    return list(struct.unpack(f"{endian}{count}{fmt}", data))


def _tiff_endian(payload: bytes) -> str:
    if payload[:2] == b"II":
        endian = "<"
    elif payload[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    (magic,) = struct.unpack(endian + "H", payload[2:4])
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")
    return endian


def _decode_ifd(payload: bytes, endian: str, ifd_off: int) -> tuple[np.ndarray, int]:
    """Decode one IFD (page); returns (array, next_ifd_offset — 0 at the
    end of the chain)."""
    (n_tags,) = struct.unpack(endian + "H", payload[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        e = payload[ifd_off + 2 + 12 * i : ifd_off + 2 + 12 * (i + 1)]
        tag, type_, count = struct.unpack(endian + "HHI", e[:8])
        try:
            tags[tag] = _read_ifd_values(payload, endian, type_, count, e[8:12])
        except NotImplementedError:
            continue  # unneeded tag of an exotic type (e.g. RATIONAL dpi)
    next_off_pos = ifd_off + 2 + 12 * n_tags
    (next_off,) = struct.unpack(endian + "I", payload[next_off_pos : next_off_pos + 4])
    w = tags[256][0]
    h = tags[257][0]
    compression = tags.get(259, [1])[0]
    if compression != 1:
        raise NotImplementedError(
            f"TIFF compression {compression} not supported (baseline/uncompressed only)"
        )
    samples = tags.get(277, [1])[0]
    bits = tags.get(258, [8])
    if len(set(bits)) != 1:
        raise NotImplementedError("TIFF mixed bits-per-sample not supported")
    bits = bits[0]
    sample_format = tags.get(339, [1])[0]
    if sample_format == 3:
        if bits != 32:
            raise NotImplementedError("TIFF float requires 32-bit samples")
        dtype = np.dtype(endian + "f4")
    elif sample_format in (1, 4):
        dtype = np.dtype(endian + {8: "u1", 16: "u2", 32: "u4"}[bits])
    else:
        raise NotImplementedError(f"TIFF sample format {sample_format} not supported")
    offsets = tags[273]
    counts = tags.get(279)
    if counts is None:
        counts = [h * w * samples * (bits // 8) // len(offsets)] * len(offsets)
    data = b"".join(payload[o : o + c] for o, c in zip(offsets, counts))
    arr = np.frombuffer(data, dtype=dtype)
    if arr.size != h * w * samples:
        raise ValueError("TIFF strip data length mismatch")
    arr = arr.reshape((h, w) if samples == 1 else (h, w, samples))
    return arr, next_off


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode the first IFD of a baseline uncompressed TIFF to (h, w) or
    (h, w, samples); uint8/uint16/uint32 or float32, either byte order.
    Multi-page stacks: decode_tiff_stack."""
    endian = _tiff_endian(payload)
    (ifd_off,) = struct.unpack(endian + "I", payload[4:8])
    arr, _ = _decode_ifd(payload, endian, ifd_off)
    return arr


def decode_tiff_stack(payload: bytes) -> np.ndarray:
    """Decode EVERY page of a multi-page TIFF — the microscope z/t-stack
    layout (one IFD per frame, chained) — to (pages, h, w) or
    (pages, h, w, samples). Pages must share shape and dtype."""
    endian = _tiff_endian(payload)
    (ifd_off,) = struct.unpack(endian + "I", payload[4:8])
    pages = []
    while ifd_off != 0:
        arr, ifd_off = _decode_ifd(payload, endian, ifd_off)
        pages.append(arr)
        if len(pages) > 100_000:
            raise ValueError("TIFF IFD chain does not terminate")
    if len({(p.shape, str(p.dtype)) for p in pages}) != 1:
        raise NotImplementedError("TIFF pages differ in shape/dtype")
    return np.stack(pages)


def encode_tiff(img: np.ndarray) -> bytes:
    """Encode (h, w) or (h, w, samples) uint8/uint16/uint32/float32 as a
    single-strip uncompressed little-endian baseline TIFF."""
    a = np.ascontiguousarray(img)
    if a.ndim == 2:
        h, w, samples = a.shape[0], a.shape[1], 1
    elif a.ndim == 3:
        h, w, samples = a.shape
    else:
        raise ValueError("expected 2-D or 3-D image")
    if a.dtype == np.uint8:
        bits, fmt = 8, 1
    elif a.dtype == np.uint16:
        bits, fmt = 16, 1
    elif a.dtype == np.uint32:
        bits, fmt = 32, 1
    elif a.dtype == np.float32:
        bits, fmt = 32, 3
    else:
        raise ValueError(f"unsupported dtype {a.dtype}")
    body = a.astype(a.dtype.newbyteorder("<")).tobytes()
    header_size = 8
    photometric = 1 if samples == 1 else 2

    # layout: header | IFD | bits-per-sample array (if samples > 1) | strip;
    # the IFD length is fixed given the entry count, so build it twice —
    # once to size, once with real offsets.
    def build(strip_off: int, bits_off: int) -> bytes:
        e = []
        e.append(struct.pack("<HHI", 256, 4, 1) + struct.pack("<I", w))
        e.append(struct.pack("<HHI", 257, 4, 1) + struct.pack("<I", h))
        if samples == 1:
            e.append(struct.pack("<HHI", 258, 3, 1) + struct.pack("<HH", bits, 0))
        elif samples == 2:
            # two SHORTs fit in the 4-byte value field — the TIFF spec
            # requires inline storage when values fit (offset form here
            # is spec-malformed and misread as inline by readers)
            e.append(struct.pack("<HHI", 258, 3, 2) + struct.pack("<HH", bits, bits))
        else:
            e.append(struct.pack("<HHI", 258, 3, samples) + struct.pack("<I", bits_off))
        e.append(struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 1, 0))
        e.append(struct.pack("<HHI", 262, 3, 1) + struct.pack("<HH", photometric, 0))
        e.append(struct.pack("<HHI", 273, 4, 1) + struct.pack("<I", strip_off))
        e.append(struct.pack("<HHI", 277, 3, 1) + struct.pack("<HH", samples, 0))
        e.append(struct.pack("<HHI", 278, 4, 1) + struct.pack("<I", h))
        e.append(struct.pack("<HHI", 279, 4, 1) + struct.pack("<I", len(body)))
        e.append(struct.pack("<HHI", 339, 3, 1) + struct.pack("<HH", fmt, 0))
        ifd = struct.pack("<H", len(e)) + b"".join(e) + struct.pack("<I", 0)
        return ifd

    ifd_len = len(build(0, 0))
    bits_arr = b""
    bits_off = 0
    if samples > 2:
        bits_off = header_size + ifd_len
        bits_arr = struct.pack(f"<{samples}H", *([bits] * samples))
    strip_off = header_size + ifd_len + len(bits_arr)
    header = b"II" + struct.pack("<HI", 42, header_size)
    return header + build(strip_off, bits_off) + bits_arr + body


def encode_tiff_stack(imgs: np.ndarray) -> bytes:
    """Encode (pages, h, w[, samples]) as a multi-page baseline TIFF —
    one chained IFD per page, the microscope z/t-stack layout. Built by
    splicing single-page encodings: each page's absolute offsets shift
    by its block start, and its next-IFD pointer links the chain."""
    a = np.asarray(imgs)
    if a.ndim not in (3, 4):
        raise ValueError("expected (pages, h, w) or (pages, h, w, samples)")
    header_size = 8
    blocks: list[bytes] = []
    offsets: list[int] = []
    pos = header_size
    for page in a:
        single = encode_tiff(page)
        block = single[header_size:]  # strip the per-page header
        offsets.append(pos)
        blocks.append(block)
        pos += len(block)

    out = bytearray(b"II" + struct.pack("<HI", 42, header_size))
    for i, block in enumerate(blocks):
        shift = offsets[i] - header_size
        b = bytearray(block)
        (n_tags,) = struct.unpack("<H", b[0:2])
        # shift every absolute-offset field: strip offset (273) always;
        # bits-per-sample (258) only when it is an offset (count > 2)
        for t in range(n_tags):
            off = 2 + 12 * t
            tag, typ, cnt = struct.unpack("<HHI", b[off : off + 8])
            if tag == 273 or (tag == 258 and cnt > 2):
                (v,) = struct.unpack("<I", b[off + 8 : off + 12])
                b[off + 8 : off + 12] = struct.pack("<I", v + shift)
        next_pos = 2 + 12 * n_tags
        nxt = offsets[i + 1] if i + 1 < len(blocks) else 0
        b[next_pos : next_pos + 4] = struct.pack("<I", nxt)
        out.extend(b)
    return bytes(out)


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM RIFF/WAVE payload to ((frames, channels) array,
    sample_rate). Integer PCM 8 (unsigned) / 16 / 32-bit and IEEE
    float32 are supported — everything a lab microphone or telemetry
    recorder emits; compressed codecs (ADPCM, mp3-in-wav) raise."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("not a WAV: missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if channels < 1:
        raise ValueError(f"malformed WAV fmt chunk: {channels} channels")
    if bits < 1 or bits % 8 != 0:
        raise ValueError(f"malformed WAV fmt chunk: {bits} bits per sample")
    if audio_format == 1:  # integer PCM
        try:
            dtype = {8: np.uint8, 16: np.int16, 32: np.int32}[bits]
        except KeyError:
            raise NotImplementedError(f"WAV PCM bit depth {bits} not supported")
    elif audio_format == 3 and bits == 32:  # IEEE float
        dtype = np.float32
    else:
        raise NotImplementedError(
            f"WAV audio format {audio_format}/{bits}-bit not supported (PCM only)"
        )
    arr = np.frombuffer(data, dtype=np.dtype(dtype).newbyteorder("<"))
    n_frames = arr.size // channels
    return arr[: n_frames * channels].reshape(n_frames, channels), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode (frames,) or (frames, channels) uint8/int16/int32/float32
    as a PCM RIFF/WAVE payload."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    frames, channels = a.shape
    if a.dtype == np.uint8:
        bits, afmt = 8, 1
    elif a.dtype == np.int16:
        bits, afmt = 16, 1
    elif a.dtype == np.int32:
        bits, afmt = 32, 1
    elif a.dtype == np.float32:
        bits, afmt = 32, 3
    else:
        raise ValueError(f"unsupported dtype {a.dtype}")
    body = a.astype(a.dtype.newbyteorder("<")).tobytes()
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", afmt, channels, sample_rate, sample_rate * block, block, bits)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
