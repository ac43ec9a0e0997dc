"""Baseline JPEG codec (operators/jpegcodec.py, round 6).

Two independent evidence classes, because a shared encoder/decoder bug
(e.g. a transposed zigzag used by BOTH directions) roundtrips cleanly
and hides:

1. HAND-BUILT byte vectors: minimal JPEGs assembled marker by marker in
   the test with hand-computed entropy bits and hand-computed expected
   pixels (DC-only blocks have closed-form IDCT output). These pin the
   decoder to the T.81 spec independent of encode_jpeg.
2. Encoder<->decoder roundtrips with quality-dependent error bounds,
   plus odd dimensions (edge replication), grayscale, restart markers,
   and the corrupt-payload dead-letter contract.
"""

from __future__ import annotations

import struct

import pytest

from transitlog_hfp_sink_spark.operators.jpegcodec import (
    HUFF_AC_CHROMA,
    HUFF_AC_LUMA,
    HUFF_DC_CHROMA,
    HUFF_DC_LUMA,
    _BitWriter,
    decode_jpeg,
    encode_jpeg,
    synth_dc_jpeg,
)


def _dht(cls, tid, table):
    bits, vals = table
    return (
        b"\xff\xc4"
        + struct.pack(">H", 3 + 16 + len(vals))
        + bytes([(cls << 4) | tid])
        + bytes(bits)
        + bytes(vals)
    )


def _dqt_ones(tid):
    return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + b"\x01" * 64


def test_hand_built_grayscale_dc_only():
    """Single-component 8x8, q-table all 1s, DC coefficient 16 planted by
    HAND-WRITTEN bits (Annex K DC-luma: size 5 = code 0b110 len 3; amp 16
    = 0b10000; AC-luma EOB = 0b1010 len 4; 12 bits + 4 pad 1s = D0 AF).
    Expected pixel: IDCT DC-only = 0.25*(C0*C0)*16 ~= 2 -> 128+2 = 130,
    flat — computed by hand from T.81, not by this repo's encoder."""
    jpg = (
        b"\xff\xd8"
        + _dqt_ones(0)
        + b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
        + _dht(0, 0, HUFF_DC_LUMA)
        + _dht(1, 0, HUFF_AC_LUMA)
        + b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + b"\x00\x3f\x00"
        + bytes([0xD0, 0xAF])
        + b"\xff\xd9"
    )
    w, h, rgb = decode_jpeg(jpg)
    assert (w, h) == (8, 8)
    assert rgb == bytes([130, 130, 130]) * 64


def _flat_gray_420(n_mcus_x: int, restart_interval: int = 0) -> bytes:
    """Hand-assemble a 4:2:0 flat-gray JPEG (Y DC 16, chroma DC 0, all-1
    q tables): 16-px-tall, n_mcus_x MCUs wide. Uses the codec's canonical
    Huffman tables + bit writer for the bit plumbing, but the MARKER
    LAYOUT, block order (Y x4, Cb, Cr per MCU), restart placement, and
    expected pixels are specified by hand from T.81."""
    head = (
        b"\xff\xd8"
        + _dqt_ones(0)
        + _dqt_ones(1)
        + b"\xff\xc0"
        + struct.pack(">HBHHB", 17, 8, 16, 16 * n_mcus_x, 3)
        + bytes([1, 0x22, 0])  # Y: 2x2 sampling
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1])
        + _dht(0, 0, HUFF_DC_LUMA)
        + _dht(1, 0, HUFF_AC_LUMA)
        + _dht(0, 1, HUFF_DC_CHROMA)
        + _dht(1, 1, HUFF_AC_CHROMA)
    )
    if restart_interval:
        head += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    head += (
        b"\xff\xda"
        + struct.pack(">HB", 12, 3)
        + bytes([1, 0x00, 2, 0x11, 3, 0x11])
        + b"\x00\x3f\x00"
    )
    body = b""
    for m in range(n_mcus_x):
        bw = _BitWriter()
        # first Y block of the restart segment carries DC diff 16; with
        # restarts every MCU the predictor resets, so EVERY MCU's first
        # block is diff 16; without restarts only MCU 0 is
        first_y_diff = 16 if (restart_interval or m == 0) else 0
        for blk in range(4):  # Y blocks, raster order inside the MCU
            diff = first_y_diff if blk == 0 else 0
            if diff:
                bw.write(0b110, 3)       # DC-luma size 5
                bw.write(16, 5)          # amplitude
            else:
                bw.write(0b00, 2)        # DC-luma size 0
            bw.write(0b1010, 4)          # AC-luma EOB
        for _ in range(2):  # Cb, Cr: DC 0 + EOB
            bw.write(0b00, 2)            # DC-chroma size 0
            bw.write(0b00, 2)            # AC-chroma EOB
        bw.flush()
        body += bytes(bw.buf)
        if restart_interval and m < n_mcus_x - 1:
            body += bytes([0xFF, 0xD0 + (m % 8)])
    return head + body + b"\xff\xd9"


def test_hand_built_420_sampling_and_upsample():
    jpg = _flat_gray_420(1)
    w, h, rgb = decode_jpeg(jpg)
    assert (w, h) == (16, 16)
    assert rgb == bytes([130, 130, 130]) * (16 * 16)


def test_hand_built_restart_markers_reset_dc_predictors():
    jpg = _flat_gray_420(3, restart_interval=1)
    w, h, rgb = decode_jpeg(jpg)
    assert (w, h) == (48, 16)
    assert rgb == bytes([130, 130, 130]) * (48 * 16)


def test_roundtrip_error_bounds_and_determinism():
    w, h = 16, 16
    flat = bytes([120, 120, 120]) * (w * h)
    enc = encode_jpeg(w, h, flat, quality=90)
    assert enc == encode_jpeg(w, h, flat, quality=90)  # bit-reproducible
    w2, h2, out = decode_jpeg(enc)
    assert (w2, h2) == (w, h) and out == flat  # flat blocks are DC-exact

    grad = bytes(
        ((x * 7 + y * 11) % 200 + 20) for y in range(h) for x in range(w) for _ in range(3)
    )
    _, _, g100 = decode_jpeg(encode_jpeg(w, h, grad, quality=100))
    assert max(abs(a - b) for a, b in zip(g100, grad)) <= 2

    import random

    noise = bytes(random.Random(7).randrange(256) for _ in range(w * h * 3))
    _, _, n85 = decode_jpeg(encode_jpeg(w, h, noise, quality=85))
    mean_err = sum(abs(a - b) for a, b in zip(n85, noise)) / len(noise)
    assert mean_err < 25  # lossy, but in the JPEG ballpark, not garbage


def test_roundtrip_odd_dimensions_edge_replication():
    w, h = 13, 9
    rgb = bytes(((i * 31) % 256) for i in range(w * h * 3))
    ww, hh, out = decode_jpeg(encode_jpeg(w, h, rgb, quality=95))
    assert (ww, hh, len(out)) == (w, h, w * h * 3)


def test_synth_dc_jpeg_closed_form_all_ids():
    from transitlog_hfp_sink_spark.operators.jpegcodec import _round_half_away

    A = 0.7071067811865476

    def expect(i):
        def plane(dc, q0):
            return _round_half_away(0.25 * (A * A * float(dc * q0)) + 128.0)

        Y = plane(i % 29 - 14, 16)
        cb = plane(i % 13 - 6, 17)
        cr = plane(i % 11 - 5, 17)
        r = _round_half_away(Y + 1.402 * (cr - 128.0))
        g = _round_half_away(Y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0))
        b = _round_half_away(Y + 1.772 * (cb - 128.0))
        return r, g, b

    for i in range(0, 4003, 13):  # spans all three modulus cycles
        w, h, rgb = decode_jpeg(synth_dc_jpeg(i))
        px = (rgb[0], rgb[1], rgb[2])
        assert (w, h) == (8, 8)
        assert rgb == bytes(px) * 64, i  # flat
        assert px == expect(i), i


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2 (ADVICE r6): any number of 0xFF fill bytes may pad a
    marker; a fill-padded foreign file must decode identically to the
    unpadded one."""
    good = synth_dc_jpeg(7)
    ref = decode_jpeg(good)
    # pad a header marker: inject fill bytes before the SOF0 marker code
    sof = good.index(b"\xff\xc0")
    padded = good[:sof] + b"\xff\xff\xff" + good[sof:]
    assert decode_jpeg(padded) == ref
    # and before the SOS marker
    sos = good.index(b"\xff\xda")
    padded2 = good[:sos] + b"\xff" * 5 + good[sos:]
    assert decode_jpeg(padded2) == ref


def test_non_interleaved_scan_reported_honestly():
    """ADVICE r6: a baseline file whose SOS covers fewer components than
    the frame (multi-scan, non-interleaved) must raise a descriptive
    NotImplementedError, not a misleading missing-table error."""
    w, h = 16, 16
    color = encode_jpeg(w, h, bytes([90, 140, 190]) * (w * h), quality=90)
    sos = color.index(b"\xff\xda")
    seglen = struct.unpack(">H", color[sos + 2 : sos + 4])[0]
    ns = color[sos + 4]
    assert ns == 3  # sanity: our encoder writes one interleaved scan
    # rewrite the SOS to cover only the FIRST component (len 2+1+2+3=8)
    first_comp = color[sos + 5 : sos + 7]
    tail = color[sos + 2 + seglen - 3 : sos + 2 + seglen]  # Ss/Se/AhAl
    new_sos = b"\xff\xda" + struct.pack(">H", 2 + 1 + 2 + 3) + b"\x01" + first_comp + tail
    mangled = color[:sos] + new_sos + color[sos + 2 + seglen :]
    with pytest.raises(NotImplementedError, match="non-interleaved scan"):
        decode_jpeg(mangled)


def test_corrupt_payloads_deadletter_contract():
    """Corrupt JPEGs must raise within the codec family's documented
    error set (multimodal._DECODE_ERRORS), so ONE bad payload
    dead-letters as a NULL-stats row instead of failing the job."""
    from transitlog_hfp_sink_spark.operators.multimodal import _DECODE_ERRORS

    good = synth_dc_jpeg(7)
    cases = [
        b"\xff\xd8\xff",                      # truncated after SOI
        good[:40],                            # truncated mid-header
        good[:-20],                           # truncated entropy data
        good.replace(b"\xff\xc0", b"\xff\xc2", 1),  # progressive SOF
        b"notajpeg",
        good[:2] + b"\xff\xc4" + b"\x00\x05" + b"\x00\x01\x02",  # mangled DHT
    ]
    for c in cases:
        with pytest.raises(_DECODE_ERRORS):
            decode_jpeg(c)


def test_decode_image_sniffs_jpeg(spark, sf_dir):
    """decode_image routes JPEG magic to the real decoder, and the
    Arrow-batched jpeg_dc_stats leg computes the closed-form stats in a
    real Spark job."""
    from pyspark.sql import functions as F

    from transitlog_hfp_sink_spark.operators.multimodal import (
        decode_image,
        jpeg_dc_stats,
        synth_dc_jpegs,
    )
    from transitlog_hfp_sink_spark.sources.files import read_table

    w, h, rgb = decode_image(synth_dc_jpeg(3))
    assert (w, h) == (8, 8) and len(rgb) == 192

    docs = read_table(spark, sf_dir, "documents").limit(40)
    stats = jpeg_dc_stats(synth_dc_jpegs(docs)).collect()
    assert len(stats) == 40
    for r in stats:
        assert (r["img_w"], r["img_h"], r["n_px"]) == (8, 8, 64)
        assert r["n_distinct_px"] == 1  # DC-only decode is flat
        assert r["px_sum"] is not None and r["rgb_md5"] is not None


def test_truncated_fill_byte_run_raises_valueerror():
    """ADVICE r7: a file truncated inside a 0xFF fill-byte run (or right
    after one) must raise the decoder's documented ValueError, not
    IndexError from the unbounded skip loop."""
    good = synth_dc_jpeg(7)
    sof = good.index(b"\xff\xc0")
    for tail in (b"\xff\xff\xff", b"\xff\xff", b"\xff"):
        with pytest.raises(ValueError, match="truncated JPEG"):
            decode_jpeg(good[:sof] + tail)


# --- round 8: progressive (SOF2) ------------------------------------------

def test_progressive_equals_baseline_pixelwise():
    """The decisive cross-check: encode_jpeg and encode_jpeg_progressive
    share _quantized_blocks, so their byte-very-different streams carry
    IDENTICAL coefficients — decode_jpeg must produce pixel-identical
    output for both. Sizes chosen to exercise >16-zero AC runs with
    interleaved correction bits (the round-8 encoder bug class), block
    edges, and tiny images."""
    import random

    from transitlog_hfp_sink_spark.operators.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = random.Random(20240816)
    for w, h, q in [(8, 8, 90), (17, 9, 85), (1, 1, 90), (32, 24, 50),
                    (5, 3, 95), (16, 16, 75)]:
        rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        base = decode_jpeg(encode_jpeg(w, h, rgb, quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(w, h, rgb, quality=q))
        assert base == prog, (w, h, q)


def test_progressive_partial_file_decodes_at_reduced_precision():
    """A progressive stream cut at a scan boundary (+EOI) is a VALID
    lower-precision image — the format's whole point. Keeping the DC
    first + AC first scans (Al=1) must decode to roughly the full image
    (coefficients at half precision), never raise."""
    from transitlog_hfp_sink_spark.operators.jpegcodec import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    w, h = 24, 16
    rgb = bytes((x * 11 + y * 7) % 256 for y in range(h) for x in range(w)
                for _ in range(3))
    full = encode_jpeg_progressive(w, h, rgb, quality=90)
    # scan starts = every SOS marker; entropy bytes cannot contain FF DA
    # (stuffing makes in-entropy FF always FF 00 / FF D0-D7)
    sos = [i for i in range(len(full) - 1)
           if full[i] == 0xFF and full[i + 1] == 0xDA]
    assert len(sos) == 8  # the 8-scan script
    gw, gh, gfull = decode_jpeg(full)
    for keep in (4, 5):  # after AC-first scans; after DC refine
        partial = full[: sos[keep]] + b"\xff\xd9"
        pw, ph, prgb = decode_jpeg(partial)
        assert (pw, ph) == (w, h)
        worst = max(abs(a - b) for a, b in zip(prgb, gfull))
        mean = sum(abs(a - b) for a, b in zip(prgb, gfull)) / len(gfull)
        assert worst <= 120 and mean <= 16, (keep, worst, mean)


def build_eobrun_hand_vector() -> bytes:
    """The EOBRUN>1 hand-built progressive stream (see
    test_progressive_eobrun_spanning_blocks_hand_vector); also a fuzz
    seed in test_codec_fuzz.py (round 9, VERDICT r8 #6)."""
    import struct

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([16] * 64)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 16, 8, 1)
    out += bytes([1, 0x11, 0])
    # DC table 0: single 1-bit code '0' -> symbol 0 (size 0)
    out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + 1)
    out += bytes([0x00]) + bytes([1] + [0] * 15) + bytes([0x00])
    # AC table 0: single 1-bit code '0' -> symbol 0x10 (EOB, r=1)
    out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + 1)
    out += bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x10])
    # scan 1: DC first, Ss=0 Se=0 AhAl=0x00; bits '0','0' then 1-padding
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 0, 0x00])
    out += bytes([0b00111111])
    # scan 2: AC first, Ss=1 Se=63 AhAl=0x00; code '0' + ext bit '0'
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 1, 63, 0x00])
    out += bytes([0b00111111])
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_eobrun_spanning_blocks_hand_vector():
    """EOBRUN > 1 (one EOB code covering several blocks) — a path our own
    encoder never emits (it pins EOBRUN=1 to stay inside the Annex K
    alphabet), pinned by a HAND-BUILT stream with a custom AC table:
    grayscale 8x16 (two blocks), DC-first scan coding two zero diffs,
    then one AC-first scan whose single EOB(r=1) symbol + one 0 ext bit
    declares EOBRUN=2 — both blocks' AC all zero. Expected output: a
    flat 128 gray plane."""
    from transitlog_hfp_sink_spark.operators.jpegcodec import decode_jpeg

    w, h, rgb = decode_jpeg(build_eobrun_hand_vector())
    assert (w, h) == (8, 16)
    assert rgb == bytes([128]) * (8 * 16 * 3)


def build_420_progressive_hand_vector() -> bytes:
    """The 4:2:0 padded-vs-actual-raster hand-built progressive stream
    (see test_hand_built_420_progressive_padded_vs_actual_block_rasters);
    also a fuzz seed in test_codec_fuzz.py (round 9, VERDICT r8 #6)."""
    from transitlog_hfp_sink_spark.operators.jpegcodec import (
        _build_encode_table,
        _magnitude,
        _prog_scan_header,
    )

    w, h = 24, 16  # mcux=2: luma wb_pad=4 vs wb=3; chroma 2==2
    head = (
        b"\xff\xd8"
        + _dqt_ones(0)
        + _dqt_ones(1)
        + b"\xff\xc2"  # SOF2
        + struct.pack(">HBHHB", 17, 8, h, w, 3)
        + bytes([1, 0x22, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1])
        + _dht(0, 0, HUFF_DC_LUMA)
        + _dht(1, 0, HUFF_AC_LUMA)
        + _dht(0, 1, HUFF_DC_CHROMA)
        + _dht(1, 1, HUFF_AC_CHROMA)
    )
    enc_dc = [_build_encode_table(*HUFF_DC_LUMA), _build_encode_table(*HUFF_DC_CHROMA)]
    enc_ac = [_build_encode_table(*HUFF_AC_LUMA), _build_encode_table(*HUFF_AC_CHROMA)]
    out = bytearray(head)

    # scan 1: DC first, interleaved, Al=1 — padded MCU grid (2 MCUs x
    # [4 Y, Cb, Cr]); every block's DC is 16, so v = 8: luma diffs
    # 8,0,0,0,0,0,0,0 across the two MCUs, chroma v=0 throughout
    out += _prog_scan_header([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 0, 1)
    bw = _BitWriter()
    pred = [0, 0, 0]
    for _m in range(2):
        for _yb in range(4):
            v = 8
            size, amp = _magnitude(v - pred[0])
            pred[0] = v
            code, ln = enc_dc[0][size]
            bw.write(code, ln)
            if size:
                bw.write(amp, size)
        for comp in (1, 2):
            size, amp = _magnitude(0 - pred[comp])
            pred[comp] = 0
            code, ln = enc_dc[1][size]
            bw.write(code, ln)
            if size:
                bw.write(amp, size)
    bw.flush()
    out += bw.buf

    # scans 2-4: AC first per component — the NON-padded rasters:
    # luma 3x2 = 6 blocks, chroma 2x1 = 2 blocks each; all AC zero -> EOB
    for cid, tsel, nblocks in ((1, 0, 6), (2, 1, 2), (3, 1, 2)):
        out += _prog_scan_header([(cid, tsel)], 1, 63, 0, 1)
        bw = _BitWriter()
        code, ln = enc_ac[tsel][0x00]
        for _ in range(nblocks):
            bw.write(code, ln)
        bw.flush()
        out += bw.buf

    # scan 5: DC refinement over the padded grid — bit 16&1 = 0 per block
    out += _prog_scan_header([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 1, 0)
    bw = _BitWriter()
    for _ in range(2 * (4 + 1 + 1)):
        bw.write(0, 1)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


def test_hand_built_420_progressive_padded_vs_actual_block_rasters():
    """Progressive 4:2:0 twin of the baseline 4:2:0 hand vector, with
    w=24 so the luma's ACTUAL block raster (3x2) differs from its
    MCU-PADDED grid (4x2): the interleaved DC scans must walk the padded
    grid while the single-component AC scan walks only the 6 real
    blocks — the index mapping T.81 A.2 prescribes. Flat gray (Y DC 16,
    chroma 0, all-1 quant tables) decoded pixel-exactly to (130,130,130).
    Scan script: DC first interleaved at Al=1, per-component AC first
    (all EOBs), DC refinement bits over the padded grid."""
    gw, gh, rgb = decode_jpeg(build_420_progressive_hand_vector())
    assert (gw, gh) == (24, 16)
    assert rgb == bytes([130, 130, 130]) * (24 * 16)
