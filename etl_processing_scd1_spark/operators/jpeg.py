"""Baseline JPEG codec — pure Python + numpy, no third-party codecs.

Closes the last compressed-format seam in ``multimodal.decode_image``
(the round-5/6 PNG work covered the lossless side): a real, standard
JFIF encoder/decoder pair for baseline sequential DCT, 8-bit, either
grayscale (1 component) or YCbCr 4:4:4 (3 components, no chroma
subsampling), standard Annex-K quantization and Huffman tables.
Unsupported on decode (progressive SOF2, arithmetic coding, chroma
subsampling, restart intervals, 12-bit) raises ValueError — the same
documented PIL/libvips deployment seam as the other codecs.

Determinism discipline: every rounding step is ``floor(x + 0.5)``
(round-half-up), and the DC quantization is PURE INTEGER
(``(2F + q) // 2q`` after snapping DCT coefficients to ints), so
flat 8×8 tiles survive the whole pipeline bit-exactly: at quality 75
the luma DC quantizer is 8 and a constant tile of value v quantizes
to DC = v−128 and reconstructs to exactly v. The oracle-paired
``multimodal_decode_jpeg`` query leans on this closed form; gradient
round-trips (lossy, bounded error) are pinned by pytest instead.

Perf note: this codec runs inside Arrow ``mapInPandas`` batches like
the other decoders — per-image Python cost, vectorized per-block
numpy DCTs. It is a correctness/plumbing reference, not a throughput
codec; deployment swaps in libjpeg-turbo via PIL behind the same
``decode_image`` dispatch.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Standard tables (JPEG spec ITU-T T.81 Annex K — public domain constants)
# ---------------------------------------------------------------------------

QT_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)

QT_CHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

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

# orthonormal DCT-II basis: C[u, x] = c(u)·cos((2x+1)uπ/16)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (np.sqrt(1 / 8) if _u == 0 else 0.5) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16
        )


def scaled_quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1..100 → per-entry clamp [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: (length, code) -> symbol."""
    out: dict[tuple[int, int], int] = {}
    for sym, (code, length) in _build_codes(bits, vals).items():
        out[(length, code)] = sym
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, s: int) -> int:
    # negative amplitudes are stored as v + 2^s - 1 (one's complement)
    return v if v >= 0 else v + (1 << s) - 1


def _fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Forward DCT + quantization, integer-robust: coefficients snap
    to ints with floor(x+0.5) (safe — true values sit ≥ the matmul
    epsilon away from .5 boundaries only when half-integral, which
    exact-integer DCTs of integer blocks never are), then a pure
    integer round-half-up division (2F+q)//2q."""
    f = _C @ (block - 128.0) @ _C.T
    f_int = np.floor(f + 0.5).astype(np.int64)
    return (2 * f_int + q) // (2 * q)


def _dequant_idct(coefs: np.ndarray, q: np.ndarray) -> np.ndarray:
    spatial = _C.T @ (coefs * q).astype(np.float64) @ _C
    return np.clip(np.floor(spatial + 128.0 + 0.5), 0, 255)


def _encode_block(
    writer: _BitWriter,
    coefs: np.ndarray,
    prev_dc: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    zz = coefs.flatten()[ZIGZAG]
    dc = int(zz[0])
    diff = dc - prev_dc
    s = _category(diff)
    code, length = dc_codes[s]
    writer.write(code, length)
    writer.write(_amplitude(diff, s), s)
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(_amplitude(v, s), s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return dc


def _rgb_to_ycbcr(px: np.ndarray) -> list[np.ndarray]:
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return [
        np.clip(np.floor(p + 0.5), 0, 255) for p in (y, cb, cr)
    ]


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack(
        [np.clip(np.floor(p + 0.5), 0, 255) for p in (r, g, b)], axis=-1
    )
    return out.astype(np.uint8)


def _marker(tag: int, payload: bytes) -> bytes:
    return bytes([0xFF, tag]) + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    quality: int = 75,
    subsample: bool = False,
) -> bytes:
    """Baseline JFIF encoder: grayscale (channels=1) or YCbCr
    (channels=3) at 4:4:4, or 4:2:0 with ``subsample=True`` (2×2
    chroma downsampling by mean — the layout virtually every camera
    JPEG uses); standard tables scaled to ``quality``."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if subsample and channels != 3:
        raise ValueError("subsampling applies to 3-channel YCbCr only")
    px = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    qt_l = scaled_quant_table(QT_LUM, quality)
    qt_c = scaled_quant_table(QT_CHROM, quality)

    if channels == 3:
        planes = _rgb_to_ycbcr(px)
        qts = [qt_l, qt_c, qt_c]
    else:
        planes = [px[:, :, 0].astype(np.float64)]
        qts = [qt_l]

    if subsample:
        # pad to 16-multiples (MCU = 2×2 luma blocks), downsample chroma
        ph = (height + 15) // 16 * 16
        pw = (width + 15) // 16 * 16
        planes = [
            np.pad(p, ((0, ph - height), (0, pw - width)), mode="edge")
            for p in planes
        ]
        for ci in (1, 2):
            c = planes[ci]
            planes[ci] = np.floor(
                (c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2])
                / 4.0
                + 0.5
            )
        samplings = [0x22, 0x11, 0x11]
    else:
        ph = (height + 7) // 8 * 8
        pw = (width + 7) // 8 * 8
        planes = [
            np.pad(p, ((0, ph - height), (0, pw - width)), mode="edge")
            for p in planes
        ]
        samplings = [0x11] * channels

    dc_l = _build_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_l = _build_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_c = _build_codes(_DC_CHROM_BITS, _DC_CHROM_VALS)
    ac_c = _build_codes(_AC_CHROM_BITS, _AC_CHROM_VALS)
    huffs = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (channels - 1)

    writer = _BitWriter()
    prev_dc = [0] * channels

    def emit(ci: int, block: np.ndarray) -> None:
        coefs = _fdct_quant(block, qts[ci])
        prev_dc[ci] = _encode_block(
            writer, coefs, prev_dc[ci], huffs[ci][0], huffs[ci][1]
        )

    if subsample:
        for by in range(ph // 16):
            for bx in range(pw // 16):
                for dy in range(2):
                    for dx in range(2):
                        y0, x0 = by * 16 + dy * 8, bx * 16 + dx * 8
                        emit(0, planes[0][y0 : y0 + 8, x0 : x0 + 8])
                for ci in (1, 2):
                    emit(
                        ci,
                        planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                    )
    else:
        for by in range(ph // 8):
            for bx in range(pw // 8):
                for ci in range(channels):
                    emit(ci, planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8])
    writer.flush()

    def qt_payload(tid: int, q: np.ndarray) -> bytes:
        return bytes([tid]) + bytes(int(q.flatten()[z]) for z in ZIGZAG)

    def dht_payload(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xDB, qt_payload(0, qt_l))
    if channels == 3:
        out += _marker(0xDB, qt_payload(1, qt_c))
    sof = bytearray([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([channels])
    for ci in range(channels):
        sof += bytes([ci + 1, samplings[ci], 0 if ci == 0 else 1])
    out += _marker(0xC0, bytes(sof))
    out += _marker(0xC4, dht_payload(0, 0, _DC_LUM_BITS, _DC_LUM_VALS))
    out += _marker(0xC4, dht_payload(1, 0, _AC_LUM_BITS, _AC_LUM_VALS))
    if channels == 3:
        out += _marker(0xC4, dht_payload(0, 1, _DC_CHROM_BITS, _DC_CHROM_VALS))
        out += _marker(0xC4, dht_payload(1, 1, _AC_CHROM_BITS, _AC_CHROM_VALS))
    sos = bytearray([channels])
    for ci in range(channels):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, bytes(sos))
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, s: int) -> int:
    # invert the encoder's one's-complement amplitude mapping
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _read_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JFIF payload → (width, height, channels,
    packed top-down pixel bytes, gray or RGB). Supports exactly what
    :func:`encode_jpeg` emits (baseline sequential, 8-bit, 1 or 3
    components at 1×1 sampling, no restart markers); anything else
    raises ValueError with the deployment-seam message."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    scan = None
    i = 2
    while i < len(payload):
        if payload[i] != 0xFF:
            raise ValueError("marker expected in JPEG header")
        tag = payload[i + 1]
        if tag == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        seg = payload[i + 4 : i + 2 + seg_len]
        if tag == 0xDB:
            j = 0
            while j < len(seg):
                prec_id = seg[j]
                if prec_id >> 4 != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros(64, dtype=np.int64)
                for k in range(64):
                    tbl[ZIGZAG[k]] = seg[j + 1 + k]
                qts[prec_id & 0x0F] = tbl.reshape(8, 8)
                j += 65
        elif tag == 0xC4:
            j = 0
            while j < len(seg):
                tc_id = seg[j]
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                vals = list(seg[j + 17 : j + 17 + n])
                table = _build_decoder(bits, vals)
                if tc_id >> 4 == 0:
                    dc_tabs[tc_id & 0x0F] = table
                else:
                    ac_tabs[tc_id & 0x0F] = table
                j += 17 + n
        elif tag == 0xC0:
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            samps = []
            for c in range(nc):
                cid, samp, qid = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, qid))
                samps.append((samp >> 4, samp & 0x0F))
            if nc not in (1, 3):
                raise ValueError("only 1- or 3-component JPEG supported")
            if not (
                all(s == (1, 1) for s in samps)
                or (nc == 3 and samps == [(2, 2), (1, 1), (1, 1)])
            ):
                raise ValueError(
                    "only 4:4:4 / gray / 4:2:0 JPEG sampling supported "
                    "(other layouts need PIL/libvips in deployment)"
                )
            frame = (w, h, comps, samps)
        elif tag in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                     0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG (SOF0) supported "
                "(progressive/arithmetic need PIL/libvips in deployment)"
            )
        elif tag == 0xDD:
            raise ValueError("restart intervals not supported")
        elif tag == 0xDA:
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cid] = (tabs >> 4, tabs & 0x0F)
            # entropy data follows: destuff until the next real marker
            j = i + 2 + seg_len
            entropy = bytearray()
            while j < len(payload) - 1:
                b = payload[j]
                if b == 0xFF:
                    nxt = payload[j + 1]
                    if nxt == 0x00:
                        entropy.append(0xFF)
                        j += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        raise ValueError("restart markers not supported")
                    break
                entropy.append(b)
                j += 1
            scan = (sel, bytes(entropy))
            i = j
            continue
        i += 2 + seg_len
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")

    w, h, comps, samps = frame
    sel, entropy = scan
    nc = len(comps)
    reader = _BitReader(entropy)
    subsampled = nc == 3 and samps[0] == (2, 2)

    def read_block(ci: int) -> np.ndarray:
        cid, qid = comps[ci]
        dc_id, ac_id = sel[cid]
        zz = np.zeros(64, dtype=np.int64)
        s = _read_symbol(reader, dc_tabs[dc_id])
        diff = _extend(reader.read_bits(s), s)
        prev_dc[ci] += diff
        zz[0] = prev_dc[ci]
        k = 1
        while k <= 63:
            sym = _read_symbol(reader, ac_tabs[ac_id])
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0x0F
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            k += run
            if k > 63:
                raise ValueError("AC coefficient index overflow")
            zz[k] = _extend(reader.read_bits(size), size)
            k += 1
        coefs = np.zeros(64, dtype=np.int64)
        coefs[ZIGZAG] = zz
        return _dequant_idct(coefs.reshape(8, 8), qts[qid])

    prev_dc = [0] * nc
    if subsampled:
        ph, pw = (h + 15) // 16 * 16, (w + 15) // 16 * 16
        luma = np.zeros((ph, pw))
        chroma = [np.zeros((ph // 2, pw // 2)) for _ in range(2)]
        for by in range(ph // 16):
            for bx in range(pw // 16):
                for dy in range(2):
                    for dx in range(2):
                        y0, x0 = by * 16 + dy * 8, bx * 16 + dx * 8
                        luma[y0 : y0 + 8, x0 : x0 + 8] = read_block(0)
                for ci in (1, 2):
                    chroma[ci - 1][
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ] = read_block(ci)
        # nearest-neighbor chroma upsample back to full resolution
        planes = [luma] + [np.repeat(np.repeat(c, 2, 0), 2, 1) for c in chroma]
    else:
        ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
        planes = [np.zeros((ph, pw)) for _ in range(nc)]
        for by in range(ph // 8):
            for bx in range(pw // 8):
                for ci in range(nc):
                    planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        read_block(ci)
                    )
    planes = [p[:h, :w] for p in planes]
    if nc == 1:
        return (w, h, 1, planes[0].astype(np.uint8).tobytes())
    rgb = _ycbcr_to_rgb(planes[0], planes[1], planes[2])
    return (w, h, 3, rgb.tobytes())
