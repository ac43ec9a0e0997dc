"""Codec robustness fuzz (round 8; progressive seeds round 9): the five
pure-Python media codecs (BMP, PNG, WAV, AVI, baseline + progressive
JPEG — the SOF2 corpus includes a content-rich 8-scan stream and the two
hand-built vectors covering EOB-run-spanning-blocks and 4:2:0
padded-vs-actual rasters) must obey the malformed-input contract on
ADVERSARIAL bytes, not just the happy-path fixtures:

- every truncation prefix of a valid file raises ValueError (or, where a
  prefix legitimately decodes a shorter-but-consistent file, succeeds) —
  never struct.error / IndexError / KeyError / zlib.error;
- seeded single-byte mutations of a valid file either decode or raise
  ValueError / NotImplementedError (a flipped byte may legally turn a
  file into an unsupported-but-recognized format, e.g. BMP bpp=25);
- random byte blobs never escape the contract;
- no corrupt input may cost unbounded time or memory: a flipped
  dimension byte must be rejected by the declared-size-vs-payload
  validation BEFORE the decoder allocates or loops (the round-8 fuzz
  found mutated BMP height bytes driving multi-second allocations).

Hypothesis drives the roundtrip properties; the truncation sweep is
exhaustive (every prefix) and the mutation fuzz is seeded, so the suite
is deterministic. A 5 s alarm converts a hang into a named failure.

Reference parity note: the reference sink dead-letters malformed
payloads rather than crashing the pipeline (MessageProcessor.java:119
invalid-message branch); these tests pin the same never-crash contract
for the media decode seam.
"""

from __future__ import annotations

import random
import signal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from transitlog_hfp_sink_spark.operators.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)
from transitlog_hfp_sink_spark.operators.multimodal import (
    decode_bmp,
    decode_png,
    decode_wav,
    demux_avi,
    encode_avi,
    encode_bmp,
    encode_png,
    encode_wav,
)

ALLOWED = (ValueError, NotImplementedError)


class _Hang(AssertionError):
    pass


def _raise_hang(signum, frame):
    raise _Hang("decoder exceeded the 5 s fuzz budget")


def _guarded(dec, blob):
    """Run one decode under an alarm; only ALLOWED exceptions may escape."""
    old = signal.signal(signal.SIGALRM, _raise_hang)
    signal.setitimer(signal.ITIMER_REAL, 5.0)
    try:
        dec(blob)
    except ALLOWED:
        pass
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, old)


def _valid_files() -> dict[str, tuple[bytes, object]]:
    # round 9 (VERDICT r8 #6): three more SOF2 seeds so the fuzz reaches
    # the progressive-only decoder states the tiny jpgp seed cannot —
    # jpgp_grad: 24x16 gradient, 8-scan script with REAL AC content and
    #   successive-approximation refinement scans (correction bits);
    # jpgp_eob: the hand-built EOBRUN=2 stream (one EOB code spanning
    #   blocks — a path our own encoder never emits);
    # jpgp_420: the hand-built 4:2:0 stream whose AC scans walk the
    #   actual block raster while DC scans walk the MCU-padded grid.
    from test_jpeg import (
        build_420_progressive_hand_vector,
        build_eobrun_hand_vector,
    )

    w, h = 4, 3
    rgb = bytes(range(w * h * 3))
    gw, gh = 24, 16
    grad = bytes(
        (x * 11 + y * 7) % 256 for y in range(gh) for x in range(gw) for _ in range(3)
    )
    stride = (2 * 3 + 3) & ~3
    return {
        "bmp": (encode_bmp(w, h, rgb), decode_bmp),
        "png": (encode_png(w, h, rgb), decode_png),
        "wav": (encode_wav(8000, [0, 100, -100, 32767, -32768], 1), decode_wav),
        "avi": (
            encode_avi(2, 2, [b"\x00" * (stride * 2), b"\xff" * (stride * 2)]),
            demux_avi,
        ),
        "jpg": (encode_jpeg(w, h, rgb, quality=90), decode_jpeg),
        "jpgp": (encode_jpeg_progressive(w, h, rgb, quality=90), decode_jpeg),
        "jpgp_grad": (encode_jpeg_progressive(gw, gh, grad, quality=90), decode_jpeg),
        "jpgp_eob": (build_eobrun_hand_vector(), decode_jpeg),
        "jpgp_420": (build_420_progressive_hand_vector(), decode_jpeg),
    }


FUZZ_FORMATS = [
    "bmp", "png", "wav", "avi", "jpg", "jpgp", "jpgp_grad", "jpgp_eob", "jpgp_420",
]


@pytest.mark.parametrize("fmt", FUZZ_FORMATS)
def test_every_truncation_prefix_fails_with_named_error(fmt):
    data, dec = _valid_files()[fmt]
    for n in range(len(data)):
        _guarded(dec, data[:n])


@pytest.mark.parametrize("fmt", FUZZ_FORMATS)
def test_seeded_byte_mutations_stay_in_contract(fmt):
    data, dec = _valid_files()[fmt]
    rng = random.Random(20240807)
    for _ in range(400):
        i = rng.randrange(len(data))
        mutated = bytearray(data)
        mutated[i] = rng.randrange(256)
        _guarded(dec, bytes(mutated))


@pytest.mark.parametrize("fmt", FUZZ_FORMATS)
def test_random_blobs_stay_in_contract(fmt):
    _, dec = _valid_files()[fmt]
    rng = random.Random(991)
    for _ in range(300):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 120)))
        _guarded(dec, blob)


# --- hypothesis roundtrips: arbitrary pixel/sample content ----------------

_dims = st.tuples(st.integers(1, 6), st.integers(1, 6))


@settings(max_examples=25, deadline=None)
@given(_dims, st.randoms(use_true_random=False))
def test_bmp_roundtrip_property(dims, rng):
    w, h = dims
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=25, deadline=None)
@given(_dims, st.randoms(use_true_random=False))
def test_png_roundtrip_property(dims, rng):
    w, h = dims
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    assert decode_png(encode_png(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=0, max_size=40),
    st.sampled_from([1, 2]),
    st.sampled_from([8000, 44100]),
)
def test_wav_roundtrip_property(samples, channels, rate):
    if len(samples) % channels:
        samples = samples[: len(samples) - len(samples) % channels]
    got = decode_wav(encode_wav(rate, samples, channels))
    assert got == (rate, channels, samples)


@settings(max_examples=15, deadline=None)
@given(_dims, st.integers(1, 3), st.randoms(use_true_random=False))
def test_avi_roundtrip_property(dims, nframes, rng):
    w, h = dims
    stride = (w * 3 + 3) & ~3
    rgb_frames = [
        bytes(rng.randrange(256) for _ in range(w * h * 3)) for _ in range(nframes)
    ]
    dib_frames = []
    for rgb in rgb_frames:  # top-down RGB -> bottom-up padded BGR (DIB)
        rows = []
        for y in range(h - 1, -1, -1):
            row = bytearray()
            for x in range(w):
                r, g, b = rgb[(y * w + x) * 3 : (y * w + x) * 3 + 3]
                row += bytes((b, g, r))
            rows.append(bytes(row) + b"\x00" * (stride - w * 3))
        dib_frames.append(b"".join(rows))
    got_w, got_h, got_frames = demux_avi(encode_avi(w, h, dib_frames))
    assert (got_w, got_h, got_frames) == (w, h, rgb_frames)


@settings(max_examples=15, deadline=None)
@given(_dims, st.integers(0, 255), st.integers(0, 255), st.integers(0, 255))
def test_jpeg_constant_color_roundtrip_bounded_error(dims, r, g, b):
    """DCT of a constant block is DC-only, so a constant-color image must
    survive quality-90 quantization with small per-channel error (the
    chroma subsample + YCbCr rounding budget)."""
    w, h = dims
    rgb = bytes((r, g, b)) * (w * h)
    got_w, got_h, out = decode_jpeg(encode_jpeg(w, h, rgb, quality=90))
    assert (got_w, got_h) == (w, h)
    worst = max(
        abs(out[i] - rgb[i]) for i in range(len(rgb))
    )
    assert worst <= 12, (r, g, b, worst)


# --- directed cases the random fuzz cannot reach (round-8 review) ----------

def test_bmp_zero_width_huge_height_rejected_fast():
    """w=0 makes stride 0, so the pixel-payload bound sees nothing to
    check while the row loop would still iterate h times — a crafted
    (w=0, h=2^31-1) header must be rejected, not spun for minutes."""
    import struct
    import time

    hdr = (
        b"BM"
        + struct.pack("<IHHI", 54, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 0, 0x7FFFFFFF, 1, 24, 0, 0, 0, 0, 0, 0)
    )
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="bad BMP dimensions"):
        decode_bmp(hdr)
    assert time.monotonic() - t0 < 1.0


def test_avi_zero_width_huge_height_rejected_fast():
    import time

    data, _ = _valid_files()["avi"]
    # strf payload starts 8 bytes after the 'strf' tag: <IiiHH = size,w,h,planes,bpp
    i = data.index(b"strf") + 8 + 4  # width field
    mutated = bytearray(data)
    mutated[i : i + 8] = (0).to_bytes(4, "little") + (0x7FFFFFFF).to_bytes(4, "little")
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="bad AVI dimensions"):
        demux_avi(bytes(mutated))
    assert time.monotonic() - t0 < 1.0


def test_png_lying_ihdr_rejected_before_inflating():
    """An IHDR declaring ~1.5 GB of pixels over a few-KB IDAT (deflate of
    zeros expands ~1000x, nowhere near the declared size) must be
    rejected by the expansion bound BEFORE any decompression allocates."""
    import struct
    import time
    import zlib

    from transitlog_hfp_sink_spark.operators.multimodal import _png_chunk

    ihdr = struct.pack(">IIBBBBB", 1, 2**29, 8, 2, 0, 0, 0)  # w=1, h=2^29
    idat = zlib.compress(b"\x00" * 4096)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="PNG pixel data mismatch"):
        decode_png(data)
    assert time.monotonic() - t0 < 1.0


def test_encode_wav_rejects_out_of_range_samples_with_named_error():
    with pytest.raises(ValueError, match="int16 PCM range"):
        encode_wav(8000, [0, 70000, 1])
    with pytest.raises(ValueError, match="-40000"):
        encode_wav(8000, [-40000])
