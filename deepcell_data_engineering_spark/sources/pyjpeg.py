"""Dependency-free JPEG (JFIF) codec: baseline sequential AND full
progressive (SOF2) decode, Huffman entropy coding, grayscale + YCbCr
4:4:4 / 4:2:0, restart markers; encoders for both modes.

The reference decodes `.jpg` annotation uploads through PIL
(caliban_toolbox/utils/misc_utils.py:41-48, pre_annotation/
data_loader.py:429); PIL is absent from this environment, so this
module implements the T.81 processes directly on numpy: standard
Annex-K quantization and Huffman tables, IJG quality scaling,
per-component sampling factors up to 2x2 with libjpeg-style triangle
('fancy') chroma upsampling. The decoder accumulates every scan into per-component
coefficient planes and reconstructs once at EOI, so baseline is just
the one-scan special case of the progressive machinery (spectral
selection, successive approximation with AC refinement and EOB runs,
interleaved DC / non-interleaved AC scans). Arithmetic coding,
hierarchical mode, and 12-bit precision raise NotImplementedError by
name.

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
    """(length, code) -> symbol, plus a flat 16-bit peek table under the
    ``"lut"`` key: lut[peeked_16_bits] = (symbol, code_length), built by
    replicating each code across its don't-care suffix bits — one list
    index replaces up to 16 dict probes per symbol in the decode loop."""
    table = {(ln, code): sym for sym, (code, ln) in _huff_codes(bits, vals).items()}
    lut: list[tuple[int, int] | None] = [None] * (1 << 16)
    for (ln, code), sym in table.items():
        base = code << (16 - ln)
        span = 1 << (16 - ln)
        lut[base : base + span] = [(sym, ln)] * span
    table["lut"] = lut  # type: ignore[assignment]
    return table


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


def _prep_components(
    img: np.ndarray, quality: int, subsample: bool
) -> tuple[int, int, int, list[tuple[int, int]], list[np.ndarray], np.ndarray, np.ndarray]:
    """Shared encoder front half: color conversion, chroma subsampling,
    MCU-grid padding, quant-table scaling. Both the baseline and
    progressive encoders run THIS, so the quantized coefficients they
    emit are identical — the cross-encoder bit-equality test depends on
    it."""
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
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * n_comp
    mcu = 16 if sub else 8
    planes = []
    for ci, c in enumerate(comps):
        if ci == 0 or not sub:
            p = _pad_to(np.clip(c, 0, 255), mcu, mcu)
        else:  # chroma: average 2x2 then pad to the chroma-block grid
            p = _pad_to(np.clip(c, 0, 255), 2, 2)
            p = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
            p = _pad_to(p, 8, 8)
        planes.append(p)
    return h, w, n_comp, samp, planes, q_lum, q_chrom


def encode_jpeg(
    img: np.ndarray, quality: int = 85, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as baseline JFIF.

    ``subsample`` selects 4:2:0 chroma (2x2 luma sampling, averaged
    chroma) instead of the default 4:4:4; ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that many MCUs."""
    h, w, n_comp, samp, planes, q_lum, q_chrom = _prep_components(
        img, quality, subsample
    )
    sub = samp[0] == (2, 2)
    mcu_h = 16 if sub else 8
    mcu_w = 16 if sub else 8

    dc_lum = _huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_lum = _huff_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_chrom = _huff_codes(_DC_CHROM_BITS, _DC_CHROM_VALS)
    ac_chrom = _huff_codes(_AC_CHROM_BITS, _AC_CHROM_VALS)

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
        if n == 0:
            return 0
        byte = self.pos >> 3
        if ((self.pos + n - 1) >> 3) >= len(self.data):
            v = 0  # slow path near stream end keeps the precise error
            for _ in range(n):
                v = (v << 1) | self.read_bit()
            return v
        window = int.from_bytes(self.data[byte : byte + 4].ljust(4, b"\0"), "big")
        v = (window >> (32 - (self.pos & 7) - n)) & ((1 << n) - 1)
        self.pos += n
        return v

    def read_symbol(self, table: dict) -> int:
        # fast path: peek 16 bits, one flat-table lookup
        byte = self.pos >> 3
        if byte + 3 < len(self.data):
            window = int.from_bytes(self.data[byte : byte + 4], "big")
            peek = (window >> (16 - (self.pos & 7))) & 0xFFFF
            hit = table["lut"][peek]
            if hit is not None:
                self.pos += hit[1]
                return hit[0]
            raise ValueError("invalid JPEG Huffman code")
        code = 0  # stream-end path: bit-by-bit with truncation checks
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


def _decode_dc(reader: _BitReader, dc_t: dict, pred: int, al: int, coeff: np.ndarray) -> int:
    """DC coefficient (baseline, or progressive first DC scan at point
    transform ``al``); returns the updated predictor."""
    size = reader.read_symbol(dc_t)
    pred += _extend(reader.read_bits(size), size)
    coeff[0] = pred << al
    return pred


def _decode_ac_first(
    reader: _BitReader, ac_t: dict, coeff: np.ndarray, ss: int, se: int, al: int, eobrun: int
) -> int:
    """AC band (baseline scans use ss=1, se=63, al=0 — the EOB symbol is
    the r=0 case of the progressive EOBRUN); returns the remaining
    EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_symbol(ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG AC coefficient index overflow")
        coeff[_ZIGZAG[k]] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _decode_ac_refine(
    reader: _BitReader, ac_t: dict, coeff: np.ndarray, ss: int, se: int, al: int, eobrun: int
) -> int:
    """Successive-approximation AC refinement (T.81 G.1.2.3): newly
    significant coefficients arrive as ±2^al; already-significant ones
    receive one correction bit each."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(z: int) -> None:
        if reader.read_bit() and (coeff[z] & p1) == 0:
            coeff[z] += p1 if coeff[z] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_symbol(ac_t)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("invalid JPEG AC refinement size")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                z = _ZIGZAG[k]
                if coeff[z] != 0:
                    correct(z)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coeff[_ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            z = _ZIGZAG[k]
            if coeff[z] != 0:
                correct(z)
            k += 1
        eobrun -= 1
    return eobrun


def _upsample_triangle(p: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """Chroma upsampling with the libjpeg-family triangle filter
    (weights 3:1 per axis, 9:3:3:1 for 2x2, rounding (sum+half)>>bits),
    in the clamped integer sample domain — the 'fancy upsampling' every
    mainstream decoder applies; plain pixel replication leaves visible
    chroma blocking and diverges from other decoders' output."""
    if fx == 1 and fy == 1:
        return p
    a = np.clip(np.round(p), 0, 255).astype(np.int32)
    if fx == 2 and fy == 2:
        pad = np.pad(a, 1, mode="edge")
        c = pad[1:-1, 1:-1]
        up, dn = pad[:-2, 1:-1], pad[2:, 1:-1]
        lf, rt = pad[1:-1, :-2], pad[1:-1, 2:]
        ul, ur = pad[:-2, :-2], pad[:-2, 2:]
        dl, dr = pad[2:, :-2], pad[2:, 2:]
        h, w = a.shape
        out = np.zeros((h * 2, w * 2), dtype=np.float64)
        out[0::2, 0::2] = (9 * c + 3 * up + 3 * lf + ul + 8) >> 4
        out[0::2, 1::2] = (9 * c + 3 * up + 3 * rt + ur + 8) >> 4
        out[1::2, 0::2] = (9 * c + 3 * dn + 3 * lf + dl + 8) >> 4
        out[1::2, 1::2] = (9 * c + 3 * dn + 3 * rt + dr + 8) >> 4
        return out
    if fx == 2:  # horizontal-only (4:2:2)
        pad = np.pad(a, ((0, 0), (1, 1)), mode="edge")
        c, lf, rt = pad[:, 1:-1], pad[:, :-2], pad[:, 2:]
        h, w = a.shape
        out = np.zeros((h, w * 2), dtype=np.float64)
        out[:, 0::2] = (3 * c + lf + 2) >> 2
        out[:, 1::2] = (3 * c + rt + 2) >> 2
        return out
    # vertical-only (4:4:0)
    pad = np.pad(a, ((1, 1), (0, 0)), mode="edge")
    c, up, dn = pad[1:-1, :], pad[:-2, :], pad[2:, :]
    h, w = a.shape
    out = np.zeros((h * 2, w), dtype=np.float64)
    out[0::2, :] = (3 * c + up + 2) >> 2
    out[1::2, :] = (3 * c + dn + 2) >> 2
    return out


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline OR progressive JFIF JPEG to (h, w) uint8
    grayscale or (h, w, 3) uint8 RGB. Supports per-component sampling
    factors up to 2x2 (4:4:4, 4:2:2, 4:2:0), restart intervals,
    multiple DQT/DHT segments, and the full progressive feature set
    (spectral selection + successive approximation, interleaved DC and
    non-interleaved AC scans, EOB runs); arithmetic coding, hierarchical
    mode, and 12-bit precision raise NotImplementedError.

    Every scan accumulates into per-component coefficient planes; one
    vectorized dequantize + IDCT pass reconstructs at EOI — so the
    baseline path is just the one-scan special case of the progressive
    machinery."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, comps, progressive)
    restart_interval = 0
    coeffs: list[np.ndarray] = []  # (pbh, pbw, 64) per component
    preds: list[int] = []
    geom = None  # (max_h, max_v, mcus_x, mcus_y, spec block grids)
    any_scan = False
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST
            continue
        (length,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + length]
        pos += length
        if marker == 0xDB:  # DQT
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} not supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps, marker == 0xC2)
            max_h = max(c[1] for c in comps)
            max_v = max(c[2] for c in comps)
            if max_h > 2 or max_v > 2:
                raise NotImplementedError("JPEG sampling factors beyond 2x2 not supported")
            mcus_x = (fw + 8 * max_h - 1) // (8 * max_h)
            mcus_y = (fh + 8 * max_v - 1) // (8 * max_v)
            grids = []
            for cid, sh, sv, tq in comps:
                cw = (fw * sh + max_h - 1) // max_h
                ch = (fh * sv + max_v - 1) // max_v
                grids.append(((ch + 7) // 8, (cw + 7) // 8, ch, cw))
            geom = (max_h, max_v, mcus_x, mcus_y, grids)
            coeffs = [
                np.zeros((mcus_y * sv, mcus_x * sh, 64), dtype=np.int32)
                for cid, sh, sv, tq in comps
            ]
            preds = [0] * nc
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} coding not supported (baseline/progressive only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            fh, fw, comps, progressive = frame
            max_h, max_v, mcus_x, mcus_y, grids = geom
            ns = body[0]
            scan_comps = []  # (comp_index, dc_tid, ac_tid)
            for si in range(ns):
                cid, tt = body[1 + 2 * si : 3 + 2 * si]
                idx = next(i for i, c in enumerate(comps) if c[0] == cid)
                scan_comps.append((idx, tt >> 4, tt & 0x0F))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            # split the entropy data into restart segments, unstuffing
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
                elif 0xD0 <= nxt <= 0xD7:
                    segments.append(bytes(cur))
                    cur = bytearray()
                    p += 2
                else:
                    break
            segments.append(bytes(cur))
            pos = p
            any_scan = True
            _decode_scan(
                segments, scan_comps, comps, coeffs, geom, huff,
                ss, se, ah, al, restart_interval,
            )
        # APPn / COM / others skipped
    if frame is None or not any_scan:
        raise ValueError("JPEG missing SOF/SOS")
    fh, fw, comps, progressive = frame
    max_h, max_v, mcus_x, mcus_y, grids = geom

    full = []
    for ci, (cid, sh, sv, tq) in enumerate(comps):
        qt = quant.get(tq)
        if qt is None:
            raise ValueError("JPEG frame references a missing quantization table")
        pbh, pbw, _ = coeffs[ci].shape
        c = coeffs[ci].reshape(pbh, pbw, 8, 8).astype(np.float64) * qt[None, None]
        px = np.einsum("ij,xyjk,kl->xyil", _DCT_M.T, c, _DCT_M) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(pbh * 8, pbw * 8)
        bh, bw, ch, cw = grids[ci]
        plane = plane[:ch, :cw]
        if sh != max_h or sv != max_v:
            plane = _upsample_triangle(plane, max_h // sh, max_v // sv)
        full.append(plane[:fh, :fw])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise NotImplementedError(f"JPEG with {len(full)} components not supported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.dstack([r, g, b])), 0, 255).astype(np.uint8)


def _decode_scan(
    segments: list[bytes],
    scan_comps: list[tuple[int, int, int]],
    comps: list[tuple[int, int, int, int]],
    coeffs: list[np.ndarray],
    geom,
    huff: dict,
    ss: int, se: int, ah: int, al: int,
    restart_interval: int,
) -> None:
    """Decode one scan's entropy data into the coefficient planes."""
    max_h, max_v, mcus_x, mcus_y, grids = geom
    preds = [0] * len(comps)
    eobrun = 0
    reader = _BitReader(segments[0])
    seg_i = 0

    def tables(idx: int, dc_tid: int, ac_tid: int):
        dc_t = huff.get((0, dc_tid))
        ac_t = huff.get((1, ac_tid))
        if ss == 0 and dc_t is None:
            raise ValueError("JPEG scan references a missing Huffman table")
        if se > 0 and ss > 0 and ac_t is None:
            raise ValueError("JPEG scan references a missing Huffman table")
        return dc_t, ac_t

    interleaved = len(scan_comps) > 1
    if interleaved:
        n_units = mcus_x * mcus_y
    else:
        idx0 = scan_comps[0][0]
        bh, bw, _, _ = grids[idx0]
        n_units = bh * bw

    for unit in range(n_units):
        if restart_interval and unit and unit % restart_interval == 0 and seg_i + 1 < len(segments):
            seg_i += 1
            reader = _BitReader(segments[seg_i])
            preds = [0] * len(comps)
            eobrun = 0
        if interleaved:
            my, mx = divmod(unit, mcus_x)
            for idx, dc_tid, ac_tid in scan_comps:
                cid, sh, sv, tq = comps[idx]
                dc_t, ac_t = tables(idx, dc_tid, ac_tid)
                for by in range(sv):
                    for bx in range(sh):
                        blk = coeffs[idx][my * sv + by, mx * sh + bx]
                        if ss == 0:
                            if ah == 0:
                                preds[idx] = _decode_dc(reader, dc_t, preds[idx], al, blk)
                            elif reader.read_bit():
                                blk[0] |= 1 << al
                        if se > 0 and ss == 0 and ah == 0 and se == 63:
                            # baseline scan: AC follows DC in the same block
                            eobrun = _decode_ac_first(reader, ac_t, blk, 1, 63, 0, eobrun)
        else:
            idx, dc_tid, ac_tid = scan_comps[0]
            bh, bw, _, _ = grids[idx]
            by, bx = divmod(unit, bw)
            blk = coeffs[idx][by, bx]
            dc_t, ac_t = tables(idx, dc_tid, ac_tid)
            if ss == 0:
                if ah == 0:
                    preds[idx] = _decode_dc(reader, dc_t, preds[idx], al, blk)
                elif reader.read_bit():
                    blk[0] |= 1 << al
                if se == 63 and ah == 0:  # single-component baseline scan
                    eobrun = _decode_ac_first(reader, ac_t, blk, 1, 63, 0, eobrun)
            elif ah == 0:
                eobrun = _decode_ac_first(reader, ac_t, blk, ss, se, al, eobrun)
            else:
                eobrun = _decode_ac_refine(reader, ac_t, blk, ss, se, al, eobrun)


def _flat_prog_ac_table() -> tuple[list[int], list[int]]:
    """A fixed all-8-bit Huffman table carrying every symbol a
    progressive AC scan can emit: EOBn (r<<4, r=0..14), ZRL (0xF0) and
    (run, size) pairs for size 1..10. The standard Annex-K AC tables
    lack the EOBn codes (baseline has no EOB runs), so progressive
    scans carry their own table. 176 symbols, all length 8 — a legal
    (incomplete) Huffman code, zero assignment logic to get wrong."""
    vals = [r << 4 for r in range(15)]
    vals.append(0xF0)
    vals += [(r << 4) | s for r in range(16) for s in range(1, 11)]
    bits = [0] * 16
    bits[7] = len(vals)
    return bits, vals


def _enc_ac_first_scan(writer: _BitWriter, actbl: dict, blocks, al: int) -> None:
    """Progressive AC first scan (Ah=0): point-transformed magnitudes
    with EOB-run accumulation."""
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            rr = eobrun.bit_length() - 1
            code, ln = actbl[rr << 4]
            writer.write(code, ln)
            if rr:
                writer.write(eobrun - (1 << rr), rr)
            eobrun = 0

    for zzb in blocks:
        vals = [
            (abs(int(v)) >> al) * (1 if v > 0 else -1) for v in zzb[1:64]
        ]
        nz = [i for i, v in enumerate(vals) if v != 0]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        last = nz[-1]
        r = 0
        for i in range(last + 1):
            v = vals[i]
            if v == 0:
                r += 1
                continue
            while r > 15:
                code, ln = actbl[0xF0]
                writer.write(code, ln)
                r -= 16
            size, bits = _magnitude(v)
            code, ln = actbl[(r << 4) | size]
            writer.write(code, ln)
            writer.write(bits, size)
            r = 0
        if last < 62:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _enc_ac_refine_scan(writer: _BitWriter, actbl: dict, blocks, al: int) -> None:
    """Progressive AC refinement scan (Ah=Al+1): newly significant
    coefficients as (run, 1) symbols + sign bit; correction bits for
    already-significant coefficients buffered and appended after the
    next emitted symbol (T.81 G.1.2.3, mirroring the decoder)."""
    eobrun = 0
    be_bits: list[int] = []

    def flush() -> None:
        nonlocal eobrun, be_bits
        if eobrun:
            rr = eobrun.bit_length() - 1
            code, ln = actbl[rr << 4]
            writer.write(code, ln)
            if rr:
                writer.write(eobrun - (1 << rr), rr)
            eobrun = 0
            for b in be_bits:
                writer.write(b, 1)
            be_bits = []

    for zzb in blocks:
        band = [int(v) for v in zzb[1:64]]
        absv = [abs(v) >> al for v in band]
        # EOB = past the last NEWLY-significant coefficient; runs beyond
        # it fold into the EOB run instead of ZRLs
        eobpos = -1
        for i, t in enumerate(absv):
            if t == 1:
                eobpos = i
        r = 0
        br: list[int] = []
        for i, v in enumerate(band):
            t = absv[i]
            if t == 0:
                r += 1
                continue
            # pending ZRLs flush at EVERY nonzero coefficient (old or
            # new) so buffered correction bits never span a ZRL window
            while r > 15 and i <= eobpos:
                flush()
                code, ln = actbl[0xF0]
                writer.write(code, ln)
                r -= 16
                for b in br:
                    writer.write(b, 1)
                br = []
            if t > 1:  # already significant: one correction bit
                br.append(t & 1)
                continue
            # newly significant (|v| >> al == 1)
            flush()
            code, ln = actbl[(r << 4) | 1]
            writer.write(code, ln)
            writer.write(1 if v > 0 else 0, 1)
            for b in br:
                writer.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be_bits.extend(br)
            if eobrun == 0x7FFF:
                flush()
    flush()


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """Encode as PROGRESSIVE JFIF (SOF2) with a libjpeg-style scan
    script: DC first at Al=1 (interleaved), per-component AC first at
    Al=1 with EOB runs, per-component AC refinement to Al=0, and a
    final interleaved DC refinement — exercising spectral selection AND
    successive approximation. Quantized coefficients are identical to
    encode_jpeg's (shared _prep_components + FDCT), so decoding either
    stream yields bit-identical pixels (pinned in tests)."""
    h, w, n_comp, samp, planes, q_lum, q_chrom = _prep_components(
        img, quality, subsample
    )
    max_h = max(s for s, _ in samp)
    max_v = max(v for _, v in samp)
    mcus_x = (w + 8 * max_h - 1) // (8 * max_h)
    mcus_y = (h + 8 * max_v - 1) // (8 * max_v)
    zzplanes = []
    grids = []
    for ci, p in enumerate(planes):
        quant = q_lum if ci == 0 else q_chrom
        blocks = _plane_blocks(p).astype(np.float64)
        d = _DCT_M @ (blocks - 128.0) @ _DCT_M.T
        q = np.round(d / quant).astype(np.int32)
        pbh, pbw = p.shape[0] // 8, p.shape[1] // 8
        zzplanes.append(q.reshape(-1, 64)[:, _ZIGZAG].reshape(pbh, pbw, 64))
        sh, sv = samp[ci]
        cw = (w * sh + max_h - 1) // max_h
        ch = (h * sv + max_v - 1) // max_v
        grids.append(((ch + 7) // 8, (cw + 7) // 8))

    dc_lum = _huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    dc_chrom = _huff_codes(_DC_CHROM_BITS, _DC_CHROM_VALS)
    ac_bits, ac_vals = _flat_prog_ac_table()
    ac_prog = _huff_codes(ac_bits, ac_vals)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(q_lum.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    if n_comp == 3:
        out += seg(0xFFDB, b"\x01" + bytes(q_chrom.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, n_comp))
    for ci in range(n_comp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xFFC2, bytes(sof))  # SOF2: progressive

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
    if n_comp == 3:
        out += dht(0, 1, _DC_CHROM_BITS, _DC_CHROM_VALS)
    out += dht(1, 0, ac_bits, ac_vals)

    def sos(scan_comps: list[tuple[int, int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytearray([len(scan_comps)])
        for cid, td, ta in scan_comps:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xFFDA, bytes(body))

    def dc_blocks_interleaved():
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(n_comp):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            yield ci, zzplanes[ci][my * sv + by, mx * sh + bx]

    # scan 1: DC first, Al=1, interleaved across all components
    out += sos([(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(n_comp)], 0, 0, 0, 1)
    writer = _BitWriter()
    preds = [0] * n_comp
    for ci, zzb in dc_blocks_interleaved():
        dcv = int(zzb[0]) >> 1  # DC point transform is an arithmetic shift
        diff = dcv - preds[ci]
        preds[ci] = dcv
        size, bits = _magnitude(diff)
        tbl = dc_lum if ci == 0 else dc_chrom
        code, ln = tbl[size]
        writer.write(code, ln)
        if size:
            writer.write(bits, size)
    out += writer.flush()

    # scans 2..: per-component AC first at Al=1, then refine to Al=0
    def comp_blocks(ci: int):
        bh, bw = grids[ci]
        for by in range(bh):
            for bx in range(bw):
                yield zzplanes[ci][by, bx]

    for ci in range(n_comp):
        out += sos([(ci + 1, 0, 0)], 1, 63, 0, 1)
        writer = _BitWriter()
        _enc_ac_first_scan(writer, ac_prog, comp_blocks(ci), 1)
        out += writer.flush()
    for ci in range(n_comp):
        out += sos([(ci + 1, 0, 0)], 1, 63, 1, 0)  # Ah = previous Al
        writer = _BitWriter()
        _enc_ac_refine_scan(writer, ac_prog, comp_blocks(ci), 0)
        out += writer.flush()

    # final scan: DC refinement to full precision, interleaved
    out += sos([(ci + 1, 0, 0) for ci in range(n_comp)], 0, 0, 1, 0)
    writer = _BitWriter()
    for ci, zzb in dc_blocks_interleaved():
        writer.write(int(zzb[0]) & 1, 1)
    out += writer.flush()

    out += b"\xFF\xD9"
    return bytes(out)
