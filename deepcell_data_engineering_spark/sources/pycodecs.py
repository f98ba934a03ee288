"""Dependency-free image codecs: PNG (all five scanline filters, gray /
gray+alpha / RGB / RGBA at 8/16-bit, palette color type 3 at bit depth
1/2/4/8 expanded to RGB(A), progressive/Adam7 interlace) and TIFF
(uncompressed / Deflate / LZW / PackBits, horizontal-differencing
predictor, strip or tile layout, both byte orders, uint8/16/32 + int8/16/32 +
float32, single or multi page).

The reference decodes microscope TIFF/PNG eagerly with tifffile/PIL
(caliban_toolbox/utils/misc_utils.py:41-48, pre_annotation/
data_loader.py:429). Those libraries are not installed in this
environment, but the container DOES have everything those decodes
need: zlib and struct (LZW/PackBits are ~40 lines each in pure
Python). These codecs close the S10 gap for the formats microscopes
and annotation tools actually emit; still-unsupported encodings
(JPEG-in-TIFF, CCITT fax, floating-point predictor) raise with a
precise message naming the missing feature.

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


# Adam7 pass layout: (col0, row0, col_step, row_step) per pass
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _unfilter_scanlines(buf: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering over ``h`` rows of ``stride``
    payload bytes each (``buf`` holds h*(stride+1) bytes, a filter tag
    leading every row); ``bpp`` is the filter unit in bytes."""
    mat = np.frombuffer(buf, dtype=np.uint8).reshape(h, stride + 1)
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
            pad = (-stride) % bpp  # interlaced passes may not be lane-aligned
            lanes = np.concatenate([cur, np.zeros(pad, np.uint8)]).reshape(-1, bpp)
            recon[y] = (
                np.cumsum(lanes.astype(np.int64), axis=0) & 0xFF
            ).astype(np.uint8).reshape(-1)[:stride]
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
    return recon


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG to (h, w) or (h, w, channels), uint8 or uint16.

    Palette images (color type 3, bit depth 1/2/4/8) are expanded to
    RGB — or RGBA when a tRNS chunk is present — matching what the
    reference sees from PIL for indexed screenshots/figures
    (caliban_toolbox/utils/misc_utils.py:45-48). Adam7-interlaced files
    decode by unfiltering each of the seven sub-images independently
    and scattering them into place."""
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
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace} invalid")
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

    def stride_of(pw: int) -> int:
        return (pw * depth + 7) // 8 if color == 3 else pw * bpp

    def pass_pixels(buf: bytes, ph: int, pw: int) -> np.ndarray:
        """Unfilter one (sub-)image: (ph, pw) palette indices, or
        (ph, pw, channels) uint8/uint16 samples."""
        recon = _unfilter_scanlines(buf, ph, stride_of(pw), bpp)
        if color == 3:
            if depth == 8:
                return recon[:, :pw]
            # unpack big-endian bit groups within each packed byte
            bits_ = np.unpackbits(recon, axis=1)[:, : pw * depth]
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
            return (bits_.reshape(ph, pw, depth) * weights).sum(axis=2).astype(np.uint8)
        if depth == 16:
            img = recon.reshape(ph, pw, channels, 2).astype(np.uint16)
            return (img[..., 0] << 8) | img[..., 1]  # network byte order
        return recon.reshape(ph, pw, channels)

    if interlace == 0:
        if len(raw) != h * (stride_of(w) + 1):
            raise ValueError("PNG data length mismatch")
        px = pass_pixels(raw, h, w)
    else:  # Adam7: seven independently-filtered sub-images, scattered
        if color == 3:
            px = np.zeros((h, w), dtype=np.uint8)
        else:
            px = np.zeros((h, w, channels), dtype=np.uint16 if depth == 16 else np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            take = ph * (stride_of(pw) + 1)
            chunk = raw[off : off + take]
            off += take
            if len(chunk) != take:
                raise ValueError("PNG data length mismatch")
            px[y0::dy, x0::dx] = pass_pixels(chunk, ph, pw)
        if off != len(raw):
            raise ValueError("PNG data length mismatch")
    if color == 3:
        lut = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if int(px.max(initial=0)) >= len(lut):
            raise ValueError("palette PNG index out of PLTE range")
        rgb = lut[px]
        if trns is None:
            return rgb
        alpha_lut = np.full(len(lut), 255, dtype=np.uint8)
        at = np.frombuffer(trns, dtype=np.uint8)[: len(lut)]
        alpha_lut[: len(at)] = at
        return np.dstack([rgb, alpha_lut[px]])
    return px[:, :, 0] if channels == 1 else px


def _filter_scanlines(flat: np.ndarray, bpp: int, filter_type: int) -> bytes:
    """Apply one PNG scanline filter to every row of ``flat``
    ((h, stride) uint8); returns the filtered stream with the per-row
    filter tag prepended."""
    h, stride = flat.shape
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.uint8), cur[:-bpp]]) if stride > bpp else np.zeros_like(cur)
        upleft = np.concatenate([np.zeros(bpp, dtype=np.uint8), prev[:-bpp]]) if stride > bpp else np.zeros_like(prev)
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
    return bytes(lines)


def encode_png(img: np.ndarray, filter_type: int = 0, interlace: bool = False) -> bytes:
    """Encode (h, w) or (h, w, {2,3,4}) uint8/uint16 as PNG.

    ``filter_type`` selects the per-row scanline filter (0-4) — mainly
    so tests exercise every unfilter path; 0 (None) is the fast
    default (zlib does the compressing either way). ``interlace``
    emits Adam7: the seven sub-images are gathered and filtered
    independently, mirroring the decoder's scatter."""
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
    if not 0 <= filter_type <= 4:
        raise ValueError(f"PNG filter {filter_type} invalid")
    if interlace:
        lines = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = body[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            flat = sub.reshape(sub.shape[0], sub.shape[1] * bpp).astype(np.uint8)
            lines.extend(_filter_scanlines(flat, bpp, filter_type))
        stream = bytes(lines)
    else:
        flat = body.reshape(h, w * bpp).astype(np.uint8)
        stream = _filter_scanlines(flat, bpp, filter_type)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + ctype + data
        return c + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, int(interlace))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(stream, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# TIFF
# ---------------------------------------------------------------------------

_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG


def _lzw_decode(data: bytes, expected: int | None = None) -> bytes:
    """TIFF-variant LZW (compression 5): MSB-first variable-width codes
    9->12 bits with the shipped early-change convention, ClearCode 256,
    EOI 257.

    ``expected`` is the strip/tile's decoded byte count: real decoders
    stop there and never parse the trailing EOI, which real encoders
    (javax/libtiff lineage) may emit one bit narrower than the table
    state implies — their flush path skips the early-change widen. Cross
    -validated both directions against javax.imageio streams."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    nbits = 9
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + nbits <= total_bits:
        byte_pos = bitpos >> 3
        window = int.from_bytes(data[byte_pos : byte_pos + 3].ljust(3, b"\0"), "big")
        code = (window >> (24 - (bitpos & 7) - nbits)) & ((1 << nbits) - 1)
        bitpos += nbits
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            nbits = 9
            prev = None
            continue
        if not table:
            raise ValueError("corrupt LZW stream: data before clear code")
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt LZW stream: bad initial code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream: code beyond table")
        out.extend(entry)
        prev = entry
        if expected is not None and len(out) >= expected:
            break
        # TIFF "early change" as actually shipped (libtiff/javax, one
        # code earlier than a classic LZW reader would need): widen as
        # soon as the NEXT table slot to assign reaches 2^n - 1.
        # Validated bit-exactly against javax.imageio-written streams
        # crossing the 9->10->11->12 boundaries and table resets.
        if len(table) >= (1 << nbits) - 1 and nbits < 12:
            nbits += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (round-trip twin of _lzw_decode)."""
    CLEAR, EOI = 256, 257
    out_bits = bytearray()
    acc = 0
    acc_n = 0

    def emit(code: int, nbits: int) -> None:
        nonlocal acc, acc_n
        acc = (acc << nbits) | code
        acc_n += nbits
        while acc_n >= 8:
            out_bits.append((acc >> (acc_n - 8)) & 0xFF)
            acc_n -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    nbits = 9
    emitted = 0  # data codes since the last CLEAR
    emit(CLEAR, nbits)

    # The decoder widens by codes RECEIVED (it appends one table entry
    # per data code, flush included), so the encoder must widen by codes
    # EMITTED — not by table adds. The two are identical mid-stream
    # (every in-loop emission adds an entry) but differ at the final
    # flush emission, which adds nothing: keying on adds leaves the EOI
    # one bit narrower than the decoder expects whenever the table-size
    # boundary lands exactly on the flush (found by the round-trip fuzz
    # at 253 novel bytes). The threshold mirrors the decoder's
    # early-change point (next slot reaches 2^n - 1), the convention
    # javax/libtiff streams follow.
    def emit_data(code: int) -> None:
        nonlocal emitted, nbits
        emit(code, nbits)
        emitted += 1
        if 257 + emitted >= (1 << nbits) - 1 and nbits < 12:  # early change
            nbits += 1

    cur = b""
    for b in data:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        emit_data(table[cur])
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << 12) - 1:
            emit(CLEAR, nbits)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            nbits = 9
            emitted = 0
        cur = bytes([b])
    if cur:
        emit_data(table[cur])
    emit(EOI, nbits)
    if acc_n:
        out_bits.append((acc << (8 - acc_n)) & 0xFF)
    return bytes(out_bits)


def _packbits_decode(data: bytes) -> bytes:
    """Apple PackBits RLE (TIFF compression 32773)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        ctl = data[i]
        i += 1
        if ctl < 128:  # literal run of ctl+1 bytes
            out.extend(data[i : i + ctl + 1])
            i += ctl + 1
        elif ctl > 128:  # repeat next byte 257-ctl times
            if i >= n:
                raise ValueError("corrupt PackBits stream: dangling repeat")
            out.extend(bytes([data[i]]) * (257 - ctl))
            i += 1
        # 128 is a no-op
    return bytes(out)


_TIFF_DECOMPRESS = {
    # each entry takes (data, expected_decoded_bytes); only LZW needs the
    # expected size (see _lzw_decode's trailing-EOI note)
    1: lambda d, n: d,
    5: _lzw_decode,
    8: lambda d, n: zlib.decompress(d),
    32946: lambda d, n: zlib.decompress(d),  # legacy Deflate tag
    32773: lambda d, n: _packbits_decode(d),
}


def _undo_predictor(arr: np.ndarray, predictor: int) -> np.ndarray:
    """Reverse TIFF predictor tag 317 on (rows, width[, samples]) integer
    data. Predictor 2 = horizontal differencing per sample channel;
    cumsum along the width axis modulo the sample width restores it."""
    if predictor in (0, 1):
        return arr
    if predictor != 2:
        raise NotImplementedError(f"TIFF predictor {predictor} not supported")
    if arr.dtype.kind not in "ui":
        raise NotImplementedError("TIFF predictor 2 requires integer samples")
    mask = (1 << (arr.dtype.itemsize * 8)) - 1
    acc = np.cumsum(arr.astype(np.int64), axis=1) & mask
    return acc.astype(arr.dtype.newbyteorder("="))


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
    decompress = _TIFF_DECOMPRESS.get(compression)
    if decompress is None:
        raise NotImplementedError(
            f"TIFF compression {compression} not supported "
            "(uncompressed/LZW/Deflate/PackBits only)"
        )
    samples = tags.get(277, [1])[0]
    bits = tags.get(258, [8])
    if len(set(bits)) != 1:
        raise NotImplementedError("TIFF mixed bits-per-sample not supported")
    bits = bits[0]
    predictor = tags.get(317, [1])[0]
    sample_format = tags.get(339, [1])[0]
    if sample_format == 3:
        if bits != 32:
            raise NotImplementedError("TIFF float requires 32-bit samples")
        dtype = np.dtype(endian + "f4")
    elif sample_format == 2:  # signed integer (the reference's MIBI crops)
        dtype = np.dtype(endian + {8: "i1", 16: "i2", 32: "i4"}[bits])
    elif sample_format in (1, 4):
        dtype = np.dtype(endian + {8: "u1", 16: "u2", 32: "u4"}[bits])
    else:
        raise NotImplementedError(f"TIFF sample format {sample_format} not supported")
    if 322 in tags:  # tiled layout: decode each tile, assemble, crop
        tw, tl = tags[322][0], tags[323][0]
        offsets, counts = tags[324], tags[325]
        across = (w + tw - 1) // tw
        down = (h + tl - 1) // tl
        if len(offsets) != across * down:
            raise ValueError("TIFF tile count mismatch")
        full = np.zeros(
            (down * tl, across * tw, samples) if samples > 1 else (down * tl, across * tw),
            dtype=dtype.newbyteorder("="),
        )
        for i, (o, c) in enumerate(zip(offsets, counts)):
            raw = decompress(payload[o : o + c], tl * tw * samples * (bits // 8))
            tile = np.frombuffer(raw, dtype=dtype)
            if tile.size != tl * tw * samples:
                raise ValueError("TIFF tile data length mismatch")
            tile = tile.reshape((tl, tw) if samples == 1 else (tl, tw, samples))
            tile = _undo_predictor(tile, predictor)
            ty, tx = divmod(i, across)
            full[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw] = tile
        return full[:h, :w], next_off
    offsets = tags[273]
    counts = tags.get(279)
    if counts is None:
        if compression != 1:
            raise ValueError("compressed TIFF missing StripByteCounts")
        counts = [h * w * samples * (bits // 8) // len(offsets)] * len(offsets)
    rows_per_strip = tags.get(278, [h])[0]
    strips = []
    for si, (o, c) in enumerate(zip(offsets, counts)):
        n_rows = min(rows_per_strip, h - si * rows_per_strip)
        raw = decompress(payload[o : o + c], n_rows * w * samples * (bits // 8))
        strip = np.frombuffer(raw, dtype=dtype)
        if strip.size != n_rows * w * samples:
            raise ValueError("TIFF strip data length mismatch")
        strip = strip.reshape((n_rows, w) if samples == 1 else (n_rows, w, samples))
        strips.append(_undo_predictor(strip, predictor))
    arr = strips[0] if len(strips) == 1 else np.concatenate(strips, axis=0)
    if arr.shape[0] != h:
        raise ValueError("TIFF strip data length mismatch")
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


def encode_tiff(img: np.ndarray, compression: int = 1, predictor: int = 1) -> bytes:
    """Encode (h, w) or (h, w, samples) uint8/16/32, int8/16/32, or
    float32 as a single-strip little-endian TIFF. ``compression``: 1 (none),
    5 (LZW), 8 (Deflate), 32773 (PackBits); ``predictor``: 1 (none) or
    2 (horizontal differencing, integer dtypes only)."""
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
    elif a.dtype == np.int8:
        bits, fmt = 8, 2
    elif a.dtype == np.int16:  # the reference's MIBI crop dtype
        bits, fmt = 16, 2
    elif a.dtype == np.int32:
        bits, fmt = 32, 2
    elif a.dtype == np.float32:
        bits, fmt = 32, 3
    else:
        raise ValueError(f"unsupported dtype {a.dtype}")
    if predictor == 2:
        if a.dtype.kind not in "ui":
            raise ValueError("TIFF predictor 2 requires an integer dtype")
        d = a.astype(np.int64)
        d[:, 1:] = d[:, 1:] - d[:, :-1]  # differencing along width, per channel
        mask = (1 << bits) - 1
        a = (d & mask).astype(a.dtype)
    elif predictor != 1:
        raise ValueError(f"TIFF predictor {predictor} not supported")
    body = a.astype(a.dtype.newbyteorder("<")).tobytes()
    if compression == 1:
        pass
    elif compression == 5:
        body = _lzw_encode(body)
    elif compression == 8:
        body = zlib.compress(body, 6)
    elif compression == 32773:
        # literal-only PackBits: runs of <=128 raw bytes are valid output
        body = b"".join(
            bytes([len(body[i : i + 128]) - 1]) + body[i : i + 128]
            for i in range(0, len(body), 128)
        )
    else:
        raise ValueError(f"TIFF compression {compression} not supported")
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
        e.append(struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", compression, 0))
        e.append(struct.pack("<HHI", 262, 3, 1) + struct.pack("<HH", photometric, 0))
        e.append(struct.pack("<HHI", 273, 4, 1) + struct.pack("<I", strip_off))
        e.append(struct.pack("<HHI", 277, 3, 1) + struct.pack("<HH", samples, 0))
        e.append(struct.pack("<HHI", 278, 4, 1) + struct.pack("<I", h))
        e.append(struct.pack("<HHI", 279, 4, 1) + struct.pack("<I", len(body)))
        if predictor == 2:
            e.append(struct.pack("<HHI", 317, 3, 1) + struct.pack("<HH", 2, 0))
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
    sample_rate). Integer PCM 8 (unsigned) / 16 / 24 (packed, returned
    as int32) / 32-bit and IEEE float32 are supported — everything a
    lab microphone, studio recorder, or telemetry logger emits;
    compressed codecs (ADPCM, mp3-in-wav) raise."""
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
    if audio_format == 1 and bits == 24:
        # packed 3-byte little-endian signed ints (the studio-recorder
        # depth): assemble into int32 with the top byte sign-extended
        raw = np.frombuffer(data, dtype=np.uint8)
        n = raw.size // 3
        raw = raw[: n * 3].reshape(n, 3)
        arr = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int8).astype(np.int32) << 16)
        )
        n_frames = arr.size // channels
        return arr[: n_frames * channels].reshape(n_frames, channels), rate
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


def encode_wav(samples: np.ndarray, sample_rate: int, bits24: bool = False) -> bytes:
    """Encode (frames,) or (frames, channels) uint8/int16/int32/float32
    as a PCM RIFF/WAVE payload; pass ``bits24=True`` with int32 input
    to emit packed 24-bit PCM (values must fit in 24 bits)."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    frames, channels = a.shape
    if bits24:
        if a.dtype != np.int32:
            raise ValueError("24-bit encode requires int32 samples")
        if a.min() < -(1 << 23) or a.max() > (1 << 23) - 1:
            raise ValueError("sample out of 24-bit range")
        le = a.astype("<i4").tobytes()
        body = b"".join(
            le[i: i + 3] for i in range(0, len(le), 4)
        )
        block = channels * 3
        fmt = struct.pack(
            "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, 24
        )
        # RIFF chunks are word-aligned: odd-length data bodies carry a
        # trailing pad byte (the size field stays the unpadded length)
        pad = b"\x00" if len(body) % 2 else b""
        chunks = (
            b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body + pad
        )
        return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
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
    pad = b"\x00" if len(body) % 2 else b""
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(body)) + body + pad
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
