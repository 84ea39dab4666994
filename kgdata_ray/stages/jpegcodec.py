"""Baseline JFIF (JPEG) codec with NO external codec library.

Everything is stdlib + numpy: forward/inverse DCT as exact int64
matrix products against a pinned integer basis, Annex-K quantization
and Huffman tables, canonical Huffman entropy coding, 4:2:0 chroma
subsampling, pinned integer color conversions. The point of the
all-integer contract is bit-identical reproducibility: the oracle's
independent scalar reimplementation (quadruple loops, bit-by-bit
Huffman — ``oracle_sketch.py``) must produce byte-identical files and
pixel-identical decodes, which integer associativity guarantees and
float reassociation would not.

Pinned decode contract (shared with the oracle as spec constants):

- DCT basis ``B[u, x] = round(C(u) * cos((2x+1) u pi / 16) * 2^18)``
  (literal table below; C(0)=1/sqrt(2), else 1).
- FDCT: ``Fi = B (f - 128) B^T`` exactly in int64; quantized
  coefficient ``q = round_half_away(Fi / (4 * 2^36 * Q[u,v]))``.
- IDCT: ``S = B^T diag-dequantized B`` exactly in int64; sample =
  ``clip(((S + 2^37) >> 38) + 128)`` (round-half-up shift).
- RGB<->YCbCr in 16-bit fixed point with the exact coefficient
  integers written below; chroma downsample = ``(a+b+c+d+2) >> 2``;
  upsample = nearest (each chroma sample covers its 2x2 quad).

Supported on decode: baseline DCT (SOF0), 8-bit, 1 or 3 components,
sampling 1x1 (4:4:4) or luma 2x2 + chroma 1x1 (4:2:0), no restart
markers. Anything else raises NotImplementedError — a declared
boundary, not a silent fake. Reference analog: none (the reference
has no media decode); this is the engine's LLM-training-data
multimodal surface, same contract style as ``decode_png`` /
``decode_gif`` in stages/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

# pinned integer DCT basis: round(C(u) cos((2x+1) u pi/16) * 2^18)
DCT_SCALE_BITS = 18
DCT_BASIS = np.array(
    [
        (185364, 185364, 185364, 185364, 185364, 185364, 185364, 185364),
        (257107, 217965, 145639, 51142, -51142, -145639, -217965, -257107),
        (242189, 100318, -100318, -242189, -242189, -100318, 100318, 242189),
        (217965, -51142, -257107, -145639, 145639, 257107, 51142, -217965),
        (185364, -185364, -185364, 185364, 185364, -185364, -185364, 185364),
        (145639, -257107, 51142, 217965, -217965, -51142, 257107, -145639),
        (100318, -242189, 242189, -100318, -100318, 242189, -242189, 100318),
        (51142, -145639, 217965, -257107, 257107, -217965, 145639, -51142),
    ],
    dtype=np.int64,
)

# ISO/IEC 10918-1 Annex K.1 quantization tables (natural order)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# zig-zag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
HUFF_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _huff_codes(bits, huffval):
    """Canonical Huffman: symbol -> (code, length) per spec C.2."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            out[huffval[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """Pinned 16-bit fixed-point RGB->YCbCr, int64 in/out (0..255)."""
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    cb = (-11059 * r - 21709 * g + 32768 * b + 8421376) >> 16
    cr = (32768 * r - 27439 * g - 5329 * b + 8421376) >> 16
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """Pinned 16-bit fixed-point YCbCr->RGB with clipping, uint8 out."""
    y = ycc[..., 0].astype(np.int64)
    cb = ycc[..., 1].astype(np.int64) - 128
    cr = ycc[..., 2].astype(np.int64) - 128
    r = y + ((91881 * cr + 32768) >> 16)
    g = y - ((22554 * cb + 46802 * cr + 32768) >> 16)
    b = y + ((116130 * cb + 32768) >> 16)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _fdct_quant(block: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Exact-integer FDCT + round-half-away quantization of one level-
    shifted 8x8 int64 block. Returns int64 coefficients."""
    fi = DCT_BASIS @ block @ DCT_BASIS.T
    den = quant << (2 * DCT_SCALE_BITS + 2)
    q = (np.abs(fi) + (den >> 1)) // den
    return np.where(fi < 0, -q, q)


def _blocks_idct(coefs: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Batched exact-integer IDCT: (n, 8, 8) int64 coefficients ->
    (n, 8, 8) uint8 samples, pinned round-half-up shift."""
    d = coefs * quant[None, :, :]
    s = DCT_BASIS.T[None] @ d @ DCT_BASIS[None]
    shift = 2 * DCT_SCALE_BITS + 2
    val = ((s + (1 << (shift - 1))) >> shift) + 128
    return np.clip(val, 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category: value -> (ssss, extra-bits value)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    ssss = a.bit_length()
    bits = v if v > 0 else v + (1 << ssss) - 1
    return ssss, bits


def _encode_block(writer, coefs, dc_codes, ac_codes, pred: int) -> int:
    """Huffman-encode one quantized block; returns the new DC pred."""
    zz = [int(coefs[r, c]) for (r, c) in ZIGZAG]
    diff = zz[0] - pred
    ssss, bits = _magnitude(diff)
    code, ln = dc_codes[ssss]
    writer.put(code, ln)
    if ssss:
        writer.put(bits, ssss)
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_codes[0xF0]  # ZRL
            writer.put(c, l)
            run -= 16
        ssss, bits = _magnitude(v)
        c, l = ac_codes[(run << 4) | ssss]
        writer.put(c, l)
        writer.put(bits, ssss)
        run = 0
    if run:
        c, l = ac_codes[0x00]  # EOB
        writer.put(c, l)
    return zz[0]


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) int64 plane (H, W multiples of 8) -> (n, 8, 8) blocks in
    row-major block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def encode_jpeg(rgb: np.ndarray, *, subsampling: str = "420") -> bytes:
    """8-bit RGB (h, w, 3) -> baseline JFIF bytes with Annex-K tables,
    fully deterministic (all-integer contract). ``subsampling`` is
    ``"420"`` (2x2 luma MCUs, chroma quarter-res), ``"444"`` (no
    subsampling) or ``"gray"`` (single luma component)."""
    if subsampling not in ("420", "444", "gray"):
        raise ValueError(subsampling)
    h, w, _ = rgb.shape
    ycc = rgb_to_ycbcr(rgb.astype(np.int64))
    # pad to a whole number of MCUs by edge replication
    mcu = 16 if subsampling == "420" else 8
    ph = -(-h // mcu) * mcu
    pw = -(-w // mcu) * mcu
    full = np.empty((ph, pw, 3), np.int64)
    full[:h, :w] = ycc
    full[h:, :w] = ycc[h - 1: h, :]
    full[:h, w:] = full[:h, w - 1: w]
    full[h:, w:] = full[h - 1: h, w - 1: w]
    ylum = full[..., 0]
    if subsampling == "420":
        # 4:2:0: chroma = integer mean of each 2x2 quad
        csub = (
            full[0::2, 0::2, 1:] + full[0::2, 1::2, 1:]
            + full[1::2, 0::2, 1:] + full[1::2, 1::2, 1:] + 2
        ) >> 2
        cb, cr = csub[..., 0], csub[..., 1]
    else:
        cb, cr = full[..., 1], full[..., 2]

    dc_l = _huff_codes(*HUFF_DC_LUMA)
    ac_l = _huff_codes(*HUFF_AC_LUMA)
    dc_c = _huff_codes(*HUFF_DC_CHROMA)
    ac_c = _huff_codes(*HUFF_AC_CHROMA)

    wr = _BitWriter()
    preds = [0, 0, 0]
    mby, mbx = ph // mcu, pw // mcu
    nl = 2 if subsampling == "420" else 1
    for my in range(mby):
        for mx in range(mbx):
            for by in range(nl):
                for bx in range(nl):
                    y0 = my * mcu + by * 8
                    x0 = mx * mcu + bx * 8
                    blk = ylum[y0:y0 + 8, x0:x0 + 8] - 128
                    preds[0] = _encode_block(
                        wr, _fdct_quant(blk, QUANT_LUMA),
                        dc_l, ac_l, preds[0])
            if subsampling == "gray":
                continue
            y0, x0 = my * 8, mx * 8
            for ci, plane in ((1, cb), (2, cr)):
                blk = plane[y0:y0 + 8, x0:x0 + 8] - 128
                preds[ci] = _encode_block(
                    wr, _fdct_quant(blk, QUANT_CHROMA),
                    dc_c, ac_c, preds[ci])
    scan = wr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, q: np.ndarray) -> bytes:
        zz = bytes(int(q[r, c]) for (r, c) in ZIGZAG)
        return seg(0xFFDB, bytes([tid]) + zz)

    def dht(cls: int, tid: int, table) -> bytes:
        bits, vals = table
        return seg(0xFFC4, bytes([(cls << 4) | tid])
                   + bytes(bits[1:17]) + bytes(vals))

    samp_y = 0x22 if subsampling == "420" else 0x11
    if subsampling == "gray":
        sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1)
                  + bytes([1, 0x11, 0]))
        sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        tables = dqt(0, QUANT_LUMA) + dht(0, 0, HUFF_DC_LUMA) \
            + dht(1, 0, HUFF_AC_LUMA)
    else:
        sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
                  + bytes([1, samp_y, 0]) + bytes([2, 0x11, 1])
                  + bytes([3, 0x11, 1]))
        sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        tables = (dqt(0, QUANT_LUMA) + dqt(1, QUANT_CHROMA)
                  + dht(0, 0, HUFF_DC_LUMA) + dht(1, 0, HUFF_AC_LUMA)
                  + dht(0, 1, HUFF_DC_CHROMA) + dht(1, 1, HUFF_AC_CHROMA))
    app0 = seg(0xFFE0, b"JFIF\x00" + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0]))
    return (b"\xff\xd8" + app0 + tables + sof + sos + scan + b"\xff\xd9")


class _BitReader:
    """MSB-first bit reader over a byte-unstuffed scan."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        v = 0
        p = self.pos
        bits = self.bits
        if p + n > len(bits):
            raise ValueError("truncated scan")
        for i in range(n):
            v = (v << 1) | int(bits[p + i])
        self.pos = p + n
        return v


class _HuffDecoder:
    """Canonical Huffman decoder from (bits, huffval): per-length
    mincode/maxcode walk (spec F.2.2.3)."""

    def __init__(self, bits, huffval):
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln]:
                self.val_ptr[ln] = k
                self.min_code[ln] = code
                code += bits[ln]
                k += bits[ln]
                self.max_code[ln] = code - 1
            code <<= 1
        self.huffval = list(huffval)

    def decode(self, rd: _BitReader) -> int:
        code = rd.read(1)
        ln = 1
        while code > self.max_code[ln]:
            ln += 1
            if ln > 16:
                raise ValueError("bad Huffman code")
            code = (code << 1) | rd.read(1)
        return self.huffval[self.val_ptr[ln] + code - self.min_code[ln]]


def _extend(v: int, ssss: int) -> int:
    """Spec F.2.2.1 EXTEND: map ssss received bits to a signed value."""
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB (grayscale is
    replicated to 3 channels). Huffman/quant tables are read from the
    file; IDCT/upsample/color follow the pinned integer contract.
    NotImplementedError on progressive/arithmetic/restart/other
    sampling — a declared boundary."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    scan_comps = None
    scan_data = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        body = payload[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tid = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant table")
                q = np.zeros((8, 8), np.int64)
                for k in range(64):
                    r, c = ZIGZAG[k]
                    q[r, c] = body[i + 1 + k]
                quant[tid] = q
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = [0] + list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                huff[(cls, tid)] = _HuffDecoder(bits, vals)
                i += 17 + n
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("non-8-bit precision")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline frame marker 0xFF{marker:02X} "
                "(progressive/arithmetic JPEG)")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((cs, tables >> 4, tables & 0xF))
            # entropy data runs to the next marker (skip stuffed FF00)
            end = pos
            while end + 1 < len(payload):
                if payload[end] == 0xFF and payload[end + 1] not in (
                        0x00,):
                    break
                end += 1
            scan_data = payload[pos:end].replace(b"\xff\x00", b"\xff")
            pos = end
            break
    if frame is None or scan_data is None:
        raise ValueError("missing SOF0/SOS")
    h, w, comps = frame
    if len(comps) not in (1, 3):
        raise NotImplementedError(f"{len(comps)}-component JPEG")
    hs = [c[1] for c in comps]
    vs = [c[2] for c in comps]
    hmax, vmax = max(hs), max(vs)
    if len(comps) == 3 and not (
        (hs == [1, 1, 1] and vs == [1, 1, 1])
        or (hs == [2, 1, 1] and vs == [2, 1, 1])
    ):
        raise NotImplementedError(f"sampling h={hs} v={vs}")

    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mbx = -(-w // mcu_w)
    mby = -(-h // mcu_h)
    rd = _BitReader(scan_data)
    by_id = {cs: (td, ta) for cs, td, ta in scan_comps}
    # per component: collected blocks (MCU-major) and geometry
    blocks: list[list[np.ndarray]] = [[] for _ in comps]
    preds = [0] * len(comps)
    for _ in range(mby * mbx):
        for ci, (cid, ch, cv, tq) in enumerate(comps):
            td, ta = by_id[cid]
            dc = huff[(0, td)]
            ac = huff[(1, ta)]
            for _ in range(ch * cv):
                coefs = np.zeros((8, 8), np.int64)
                ssss = dc.decode(rd)
                diff = _extend(rd.read(ssss), ssss)
                preds[ci] += diff
                coefs[0, 0] = preds[ci]
                k = 1
                while k < 64:
                    rs = ac.decode(rd)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC run overflow")
                    rr, cc = ZIGZAG[k]
                    coefs[rr, cc] = _extend(rd.read(s), s)
                    k += 1
                blocks[ci].append(coefs)

    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        pw_c = mbx * ch * 8
        ph_c = mby * cv * 8
        coefs = np.stack(blocks[ci]) if blocks[ci] else np.zeros(
            (0, 8, 8), np.int64)
        pix = _blocks_idct(coefs, quant[tq])
        plane = np.zeros((ph_c, pw_c), np.uint8)
        bi = 0
        for my in range(mby):
            for mx in range(mbx):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        plane[y0:y0 + 8, x0:x0 + 8] = pix[bi]
                        bi += 1
        # nearest upsample to full resolution
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0),
                          hmax // ch, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        g = planes[0]
        return np.stack([g, g, g], axis=-1)
    ycc = np.stack(planes, axis=-1).astype(np.int64)
    return ycbcr_to_rgb(ycc)
