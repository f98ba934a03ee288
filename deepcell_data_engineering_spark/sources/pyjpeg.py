"""Dependency-free baseline JPEG (JFIF) codec: sequential DCT, Huffman
entropy coding, grayscale + YCbCr 4:4:4 / 4:2:0, restart markers.

The reference decodes `.jpg` annotation uploads through PIL
(caliban_toolbox/utils/misc_utils.py:41-48, pre_annotation/
data_loader.py:429); PIL is absent from this environment, so this
module implements the baseline process (ITU-T T.81 Annex F) directly on
numpy: standard Annex-K quantization and Huffman tables, IJG quality
scaling, per-component sampling factors up to 2x2 with nearest-neighbor
chroma upsampling. Progressive (SOF2), arithmetic coding, and 12-bit
precision raise NotImplementedError by name.

JPEG is lossy: round-trips are validated by PSNR, not bit equality
(decoder-vs-decoder bit equality is not even guaranteed between libjpeg
versions). The DCT/IDCT here is the exact orthonormal transform in
float64, vectorized across blocks; entropy coding is per-symbol Python,
which is fine for the Arrow-batched UDF decode path where each payload
is independent (sources/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order)
_QUANT_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
_QUANT_CHROM = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# zigzag scan: _ZIGZAG[k] = natural index of the k-th zigzag coefficient
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# Annex K.3 Huffman table specs: (BITS[1..16], HUFFVAL)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II basis: _DCT_M @ block @ _DCT_M.T
_DCT_M = np.array(
    [
        [
            (np.sqrt(1.0 / 8) if u == 0 else np.sqrt(2.0 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the decode-side inverse of _huff_codes."""
    return {(ln, code): sym for sym, (code, ln) in _huff_codes(bits, vals).items()}


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled Annex-K table."""
    if not 1 <= quality <= 100:
        raise ValueError(f"JPEG quality {quality} out of range 1-100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC magnitude category coding: value -> (size, appended bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


def _encode_blocks(
    blocks: np.ndarray,
    quant: np.ndarray,
    dc_tbl: dict[int, tuple[int, int]],
    ac_tbl: dict[int, tuple[int, int]],
    writer: _BitWriter,
    pred: int,
) -> int:
    """FDCT + quantize + entropy-code a (n, 8, 8) block batch in order;
    returns the updated DC predictor."""
    d = _DCT_M @ (blocks.astype(np.float64) - 128.0) @ _DCT_M.T
    q = np.round(d / quant).astype(np.int32)
    zz = q.reshape(-1, 64)[:, _ZIGZAG]
    for row in zz:
        diff = int(row[0]) - pred
        pred = int(row[0])
        size, bits = _magnitude(diff)
        code, ln = dc_tbl[size]
        writer.write(code, ln)
        if size:
            writer.write(bits, size)
        run = 0
        last_nz = int(np.max(np.nonzero(row)[0])) if np.any(row[1:]) else 0
        for k in range(1, last_nz + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tbl[0xF0]  # ZRL
                writer.write(code, ln)
                run -= 16
            size, bits = _magnitude(v)
            code, ln = ac_tbl[(run << 4) | size]
            writer.write(code, ln)
            writer.write(bits, size)
            run = 0
        if last_nz < 63:
            code, ln = ac_tbl[0x00]  # EOB
            writer.write(code, ln)
    return pred


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(h8, w8) -> (n, 8, 8) blocks in raster order."""
    h8, w8 = plane.shape
    return (
        plane.reshape(h8 // 8, 8, w8 // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _pad_to(img: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate up to multiples of (mh, mw)."""
    h, w = img.shape
    return np.pad(img, ((0, (-h) % mh), (0, (-w) % mw)), mode="edge")


def encode_jpeg(
    img: np.ndarray, quality: int = 85, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as baseline JFIF.

    ``subsample`` selects 4:2:0 chroma (2x2 luma sampling, averaged
    chroma) instead of the default 4:4:4; ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that many MCUs."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        raise ValueError(f"JPEG encode expects uint8, got {a.dtype}")
    if a.ndim == 2:
        comps = [a.astype(np.float64)]
    elif a.ndim == 3 and a.shape[2] == 3:
        r, g, b = (a[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]
    else:
        raise ValueError("expected (h, w) grayscale or (h, w, 3) RGB")
    h, w = a.shape[:2]
    n_comp = len(comps)
    q_lum = _scale_quant(_QUANT_LUM, quality)
    q_chrom = _scale_quant(_QUANT_CHROM, quality)
    sub = subsample and n_comp == 3
    # sampling factors per component
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * n_comp

    dc_lum = _huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_lum = _huff_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_chrom = _huff_codes(_DC_CHROM_BITS, _DC_CHROM_VALS)
    ac_chrom = _huff_codes(_AC_CHROM_BITS, _AC_CHROM_VALS)

    # per-component planes padded to the MCU grid
    mcu_h = 16 if sub else 8
    mcu_w = 16 if sub else 8
    planes = []
    for ci, c in enumerate(comps):
        if ci == 0 or not sub:
            p = _pad_to(np.clip(c, 0, 255), mcu_h, mcu_w)
        else:  # chroma: average 2x2 then pad to the chroma-block grid
            p = _pad_to(np.clip(c, 0, 255), 2, 2)
            p = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
            p = _pad_to(p, 8, 8)
        planes.append(p)

    writer = _BitWriter()
    preds = [0] * n_comp
    mcus_y = (h + mcu_h - 1) // mcu_h
    mcus_x = (w + mcu_w - 1) // mcu_w
    entropy = bytearray()
    mcu_i = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                entropy += writer.flush() + bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                writer = _BitWriter()
                preds = [0] * n_comp
            mcu_i += 1
            for ci in range(n_comp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = planes[ci][y0 : y0 + 8, x0 : x0 + 8][None]
                        quant = q_lum if ci == 0 else q_chrom
                        dc = dc_lum if ci == 0 else dc_chrom
                        ac = ac_lum if ci == 0 else ac_chrom
                        preds[ci] = _encode_blocks(block, quant, dc, ac, writer, preds[ci])
    entropy += writer.flush()
    entropy = bytes(entropy)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(q_lum.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    if n_comp == 3:
        out += seg(0xFFDB, b"\x01" + bytes(q_chrom.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, n_comp))
    for ci in range(n_comp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xFFC0, bytes(sof))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
    out += dht(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
    if n_comp == 3:
        out += dht(0, 1, _DC_CHROM_BITS, _DC_CHROM_VALS)
        out += dht(1, 1, _AC_CHROM_BITS, _AC_CHROM_VALS)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytearray([n_comp])
    for ci in range(n_comp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += seg(0xFFDA, bytes(sos))
    out += entropy
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over one entropy-coded segment (already
    unstuffed)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        bit = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size`` appended bits to a signed value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JFIF JPEG to (h, w) uint8 grayscale
    or (h, w, 3) uint8 RGB. Supports per-component sampling factors up
    to 2x2 (4:4:4, 4:2:2, 4:2:0), restart intervals, and multiple
    DQT/DHT segments; progressive (SOF2) and arithmetic coding (SOF9+)
    raise NotImplementedError."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, sh, sv, tq)])
    restart_interval = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + length]
        pos += length
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                prec = body[i] >> 4
                tid = body[i] & 0x0F
                i += 1
                if prec == 0:
                    tbl = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(body[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                nat = np.zeros(64, dtype=np.int32)
                nat[_ZIGZAG] = tbl
                quant[tid] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls = body[i] >> 4
                tid = body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _huff_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} not supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            kind = "progressive" if marker == 0xC2 else f"SOF{marker - 0xC0}"
            raise NotImplementedError(f"JPEG {kind} coding not supported (baseline only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan_tables = {}
            for si in range(ns):
                cid, tt = body[1 + 2 * si : 3 + 2 * si]
                scan_tables[cid] = (tt >> 4, tt & 0x0F)
            # find the end of the entropy segment, unstuffing as we go
            segments: list[bytes] = []
            cur = bytearray()
            p = pos
            while p < len(payload) - 1:
                b = payload[p]
                if b != 0xFF:
                    cur.append(b)
                    p += 1
                    continue
                nxt = payload[p + 1]
                if nxt == 0x00:
                    cur.append(0xFF)
                    p += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn: new segment
                    segments.append(bytes(cur))
                    cur = bytearray()
                    p += 2
                else:  # next real marker ends the scan
                    break
            segments.append(bytes(cur))
            pos = p
            scan = (scan_tables, segments)
        elif marker in (0xD0, 0xD1, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7):
            continue  # stray RST outside scan
        # APPn / COM / others: skipped via the generic length field
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    fh, fw, comps = frame
    scan_tables, segments = scan
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    if max_h > 2 or max_v > 2:
        raise NotImplementedError("JPEG sampling factors beyond 2x2 not supported")
    mcu_w, mcu_h = 8 * max_h, 8 * max_v
    mcus_x = (fw + mcu_w - 1) // mcu_w
    mcus_y = (fh + mcu_h - 1) // mcu_h
    planes = [
        np.zeros((mcus_y * c[2] * 8, mcus_x * c[1] * 8), dtype=np.float64) for c in comps
    ]

    n_mcus = mcus_x * mcus_y
    mcu_i = 0
    seg_i = 0
    reader = _BitReader(segments[0])
    preds = [0] * len(comps)
    coeffs = np.zeros(64, dtype=np.float64)
    while mcu_i < n_mcus:
        if restart_interval and mcu_i and mcu_i % restart_interval == 0 and seg_i + 1 < len(segments):
            seg_i += 1
            reader = _BitReader(segments[seg_i])
            preds = [0] * len(comps)
        my, mx = divmod(mcu_i, mcus_x)
        for ci, (cid, sh, sv, tq) in enumerate(comps):
            dc_t = huff.get((0, scan_tables[cid][0]))
            ac_t = huff.get((1, scan_tables[cid][1]))
            if dc_t is None or ac_t is None:
                raise ValueError("JPEG scan references a missing Huffman table")
            qt = quant.get(tq)
            if qt is None:
                raise ValueError("JPEG scan references a missing quantization table")
            for by in range(sv):
                for bx in range(sh):
                    coeffs[:] = 0.0
                    size = reader.read_symbol(dc_t)
                    preds[ci] += _extend(reader.read_bits(size), size)
                    coeffs[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = reader.read_symbol(ac_t)
                        if rs == 0x00:  # EOB
                            break
                        run, size = rs >> 4, rs & 0x0F
                        if size == 0:
                            if run != 15:
                                raise ValueError("invalid JPEG AC run length")
                            k += 16  # ZRL
                            continue
                        k += run
                        if k >= 64:
                            raise ValueError("JPEG AC coefficient index overflow")
                        coeffs[_ZIGZAG[k]] = _extend(reader.read_bits(size), size)
                        k += 1
                    blk = coeffs.reshape(8, 8) * qt
                    px = _DCT_M.T @ blk @ _DCT_M + 128.0
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
        mcu_i += 1

    # upsample each component to the frame grid and crop
    full = []
    for ci, (cid, sh, sv, tq) in enumerate(comps):
        p = planes[ci]
        if sh != max_h or sv != max_v:
            p = np.repeat(np.repeat(p, max_v // sv, axis=0), max_h // sh, axis=1)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise NotImplementedError(f"JPEG with {len(full)} components not supported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.dstack([r, g, b])), 0, 255).astype(np.uint8)
