"""Multimodal plumbing: bytes+meta, frame sampling, resize planning, and
feature extraction (round 4) — the full decode/feature/resize/frame-sample
surface with the deterministic codec stand-ins, including the handoff of
extracted features into the ANN stack."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_bytes_meta,
    extract_features,
    resize_plan,
)


def _media(spark, rows):
    return spark.createDataFrame(
        [
            (i, "image", content, None)
            for i, content in enumerate(rows)
        ],
        schema=MEDIA_SCHEMA,
    )


def test_extract_features_deterministic_and_null_safe(spark):
    payloads = [b"hello world", b"", None, b"hello world"]
    df = _media(spark, payloads)
    got = {r["media_id"]: r["features"] for r in extract_features(df).collect()}
    assert got[2] is None  # null payload -> null features, not a crash
    assert got[0] == got[3]  # identical bytes -> identical features
    expected = [x / 127.5 - 1.0 for x in hashlib.md5(b"hello world").digest()]
    assert got[0] == expected
    assert len(got[1]) == 16 and all(-1.0 <= x < 1.0 for x in got[1])


def test_extracted_features_feed_the_ann_stack(spark):
    """The feature column plugs into brute_force_topk unchanged: a planted
    duplicate payload must be its twin's top-1 neighbor at cos ~1.0."""
    from transitlog_hfp_sink_spark.operators.similarity import brute_force_topk

    payloads = [b"alpha", b"beta", b"gamma", b"alpha", b"delta", b"epsilon"]
    feats = extract_features(_media(spark, payloads)).select(
        F.col("media_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    queries = feats.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = brute_force_topk(feats, queries, k=1).collect()
    assert len(top) == 1
    assert top[0]["neighbor_id"] == 3
    assert abs(top[0]["cos_sim"] - 1.0) < 1e-9


def test_resize_plan_invariants(spark):
    df = _media(
        spark,
        [b"x" * 100_000, b"y" * 9, b"", b"z" * 50176],  # 224^2 = 50176
    )
    got = {r["media_id"]: r for r in resize_plan(df, max_dim=224).collect()}
    # large image: bounded to max_dim, aspect preserved within rounding
    big = got[0]
    assert max(big["out_w"], big["out_h"]) <= 224
    assert big["src_w"] > 224 or big["src_h"] > 224
    # small image: untouched (scale capped at 1.0)
    small = got[1]
    assert (small["out_w"], small["out_h"]) == (small["src_w"], small["src_h"])
    # empty payload: all-zero dims, no division error
    assert (got[2]["src_w"], got[2]["out_w"], got[2]["out_h"]) == (0, 0, 0)
    # exactly max_dim^2 bytes: square 224x224, unscaled
    assert (got[3]["src_w"], got[3]["src_h"]) == (224, 224)
    assert (got[3]["out_w"], got[3]["out_h"]) == (224, 224)


def test_bytes_meta_null_content(spark):
    got = {
        r["media_id"]: r
        for r in extract_bytes_meta(_media(spark, [b"abc", None])).collect()
    }
    assert got[0]["n_bytes"] == 3
    assert got[0]["content_md5"] == hashlib.md5(b"abc").hexdigest()
    assert got[1]["n_bytes"] is None and got[1]["content_md5"] is None


# ---------------------------------------------------------------------------
# Real BMP/PNG codecs (round 5): pure-Python decode with closed-form oracle
# ---------------------------------------------------------------------------

def _rgb(seed: int, w: int, h: int) -> bytes:
    return bytes((seed * 31 + j) % 256 for j in range(w * h * 3))


def test_bmp_roundtrip_and_padding():
    from transitlog_hfp_sink_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
        encode_bmp,
    )

    # widths 2..9 cover every stride-padding residue (w*3 % 4 in all states)
    for w in range(2, 10):
        for h in (1, 2, 5):
            rgb = _rgb(w * 10 + h, w, h)
            data = encode_bmp(w, h, rgb)
            assert data[:2] == b"BM"
            assert decode_bmp(data) == (w, h, rgb)
            assert decode_image(data) == (w, h, rgb)


def test_bmp_top_down_negative_height():
    import struct

    from transitlog_hfp_sink_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    w, h = 3, 4
    rgb = _rgb(7, w, h)
    data = bytearray(encode_bmp(w, h, rgb))
    # flip to the top-down variant: negate height, reorder the rows
    (data_offset,) = struct.unpack_from("<I", bytes(data), 10)
    struct.pack_into("<i", data, 18 + 4, -h)
    stride = (w * 3 + 3) & ~3
    rows = [
        bytes(data[data_offset + y * stride : data_offset + (y + 1) * stride])
        for y in range(h)
    ]
    data[data_offset:] = b"".join(reversed(rows))
    assert decode_bmp(bytes(data)) == (w, h, rgb)


def test_png_roundtrip_exercises_all_filters():
    from transitlog_hfp_sink_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    # h >= 6 guarantees every filter type 0-4 appears (encoder cycles y%5)
    for w, h in ((2, 6), (5, 7), (8, 11)):
        rgb = _rgb(w + h, w, h)
        data = encode_png(w, h, rgb)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        assert decode_png(data) == (w, h, rgb)
        assert decode_image(data) == (w, h, rgb)


def test_decode_image_rejects_unknown_formats():
    import pytest as _pytest

    from transitlog_hfp_sink_spark.operators.multimodal import (
        _DECODE_ERRORS,
        decode_image,
    )

    # WebP-class containers still need a binary codec -> env gate
    with _pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    # JPEG magic routes to the REAL baseline decoder (round 6); a
    # truncated payload dead-letters within the documented error set
    with _pytest.raises(_DECODE_ERRORS):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish payload")


def test_synth_images_decode_stats_match_closed_form(spark):
    import hashlib as _hashlib

    from transitlog_hfp_sink_spark.operators.multimodal import (
        decode_stats,
        synth_images,
    )

    ids = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    got = {r["media_id"]: r for r in decode_stats(synth_images(ids)).collect()}
    assert len(got) == 24
    for i in range(24):
        w, h = i % 7 + 2, i % 5 + 2
        rgb = _rgb(i, w, h)
        r = got[i]
        assert (r["img_w"], r["img_h"]) == (w, h)
        assert r["px_sum"] == sum(rgb)
        assert r["px_wsum"] == sum((j + 1) * b for j, b in enumerate(rgb))
        assert r["px_md5"] == _hashlib.md5(rgb.hex().encode()).hexdigest()


def test_decode_stats_null_and_undecodable_payloads(spark):
    got = {
        r["media_id"]: r
        for r in __import__(
            "transitlog_hfp_sink_spark.operators.multimodal",
            fromlist=["decode_stats"],
        ).decode_stats(_media(spark, [b"not an image", None])).collect()
    }
    for mid in (0, 1):
        assert got[mid]["img_w"] is None and got[mid]["px_md5"] is None


# ---------------------------------------------------------------------------
# Real WAV (RIFF PCM16) codec (round 5): audio leg of the multimodal surface
# ---------------------------------------------------------------------------

def test_wav_roundtrip_mono_and_stereo():
    from transitlog_hfp_sink_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    samples = [((j * 257) % 65536) - 32768 for j in range(40)]
    data = encode_wav(16000, samples)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert decode_wav(data) == (16000, 1, samples)
    # stereo interleaved
    data2 = encode_wav(44100, samples, channels=2)
    rate, ch, got = decode_wav(data2)
    assert (rate, ch, got) == (44100, 2, samples)


def test_wav_decoder_walks_extra_chunks():
    import struct

    from transitlog_hfp_sink_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    samples = [1, -2, 3, -4, 32767, -32768]
    data = bytearray(encode_wav(8000, samples))
    # splice a LIST chunk (odd length -> exercises word-alignment) between
    # fmt and data, fixing up the RIFF size
    payload = b"INFOxy z"  # 8 bytes; make odd:
    payload = payload[:7]
    chunk = b"LIST" + struct.pack("<I", len(payload)) + payload + b"\x00"
    fmt_end = 12 + 8 + 16
    data[fmt_end:fmt_end] = chunk
    struct.pack_into("<I", data, 4, len(data) - 8)
    assert decode_wav(bytes(data)) == (8000, 1, samples)


def test_wav_rejects_non_pcm16():
    import pytest as _pytest

    from transitlog_hfp_sink_spark.operators.multimodal import decode_wav

    with _pytest.raises(ValueError):
        decode_wav(b"OggS not a riff")


def test_synth_audio_stats_match_closed_form(spark):
    import math as _math

    from transitlog_hfp_sink_spark.operators.multimodal import (
        audio_stats,
        synth_audio,
    )

    ids = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    got = {r["media_id"]: r for r in audio_stats(synth_audio(ids)).collect()}
    assert len(got) == 24
    for i in range(24):
        n = i % 50 + 20
        samples = [((i * 37 + j * 257) % 65536) - 32768 for j in range(n)]
        r = got[i]
        assert (r["sample_rate"], r["n_samples"]) == (16000, n)
        assert r["pcm_sum"] == sum(samples)
        assert r["pcm_wsum"] == sum((j + 1) * v for j, v in enumerate(samples))
        want_rms = [
            round(_math.sqrt(sum(v * v for v in samples[k : k + 10]) / 10), 6)
            for k in range(0, n - 9, 10)
        ]
        assert list(r["frame_rms"]) == want_rms


# ---------------------------------------------------------------------------
# Real AVI (RIFF video) demux (round 5): video leg of the multimodal surface
# ---------------------------------------------------------------------------

def _dib_frames(seed: int, w: int, h: int, nf: int):
    stride = (w * 3 + 3) & ~3
    frames, rgbs = [], []
    for f in range(nf):
        rgb = bytes((seed * 41 + f * 7 + j) % 256 for j in range(w * h * 3))
        rgbs.append(rgb)
        dib = bytearray()
        for y in range(h - 1, -1, -1):
            row = rgb[y * w * 3 : (y + 1) * w * 3]
            for x in range(w):
                r, g, b = row[x * 3 : x * 3 + 3]
                dib += bytes((b, g, r))
            dib += b"\x00" * (stride - w * 3)
        frames.append(bytes(dib))
    return frames, rgbs


def test_avi_roundtrip_all_stride_residues():
    from transitlog_hfp_sink_spark.operators.multimodal import (
        demux_avi,
        encode_avi,
    )

    for w in range(2, 7):  # covers every stride residue
        frames, rgbs = _dib_frames(w, w, 3, 4)
        data = encode_avi(w, 3, frames)
        assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
        got_w, got_h, got = demux_avi(data)
        assert (got_w, got_h) == (w, 3)
        assert got == rgbs


def test_avi_rejects_garbage():
    import pytest as _pytest

    from transitlog_hfp_sink_spark.operators.multimodal import demux_avi

    with _pytest.raises(ValueError):
        demux_avi(b"RIFFxxxxWAVE")  # RIFF but not AVI
    with _pytest.raises(ValueError):
        demux_avi(b"not riff at all")


def test_synth_videos_stats_match_closed_form(spark):
    import hashlib as _hashlib

    from transitlog_hfp_sink_spark.operators.multimodal import (
        synth_videos,
        video_stats,
    )

    ids = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    rows = video_stats(synth_videos(ids), every_n=2).collect()
    got = {(r["media_id"], r["frame_idx"]): r for r in rows}
    for i in range(12):
        w, h, nf = i % 5 + 2, i % 4 + 2, i % 6 + 2
        sampled = list(range(0, nf, 2))
        assert {k[1] for k in got if k[0] == i} == set(sampled)
        for f in sampled:
            rgb = bytes((i * 41 + f * 7 + j) % 256 for j in range(w * h * 3))
            r = got[(i, f)]
            assert (r["img_w"], r["img_h"]) == (w, h)
            assert r["px_sum"] == sum(rgb)
            assert r["px_wsum"] == sum((j + 1) * b for j, b in enumerate(rgb))
            assert r["px_md5"] == _hashlib.md5(rgb.hex().encode()).hexdigest()


def test_stats_dead_letter_truncated_and_corrupt_payloads(spark):
    """Malformed payloads dead-letter as NULL-stats rows instead of
    failing the whole job: the pure-Python codecs raise struct.error /
    zlib.error / IndexError on truncated or corrupt bytes, and the stats
    kernels catch exactly that set (_DECODE_ERRORS, round-5 review fix —
    previously only NotImplementedError/ValueError were caught, so one
    truncated BMP aborted the Spark job)."""
    from transitlog_hfp_sink_spark.operators.multimodal import (
        audio_stats,
        decode_stats,
        encode_png,
        video_stats,
    )

    # image: truncated BMP header (struct.error), truncated PNG chunk
    # walk (zlib.error on the empty IDAT), valid-header PNG with corrupt
    # IDAT bytes (zlib.error)
    corrupt_png = bytearray(encode_png(3, 3, bytes(range(27))))
    corrupt_png[40] ^= 0xFF  # inside IDAT
    img_payloads = [
        b"BM" + b"\x00" * 8,
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x64IDAT",
        bytes(corrupt_png),
    ]
    rows = decode_stats(_media(spark, img_payloads)).collect()
    assert len(rows) == 3
    assert all(r["img_w"] is None and r["px_md5"] is None for r in rows)

    # audio: RIFF/WAVE magic but truncated chunk table (struct.error)
    wav_payloads = [b"RIFF\x24\x00\x00\x00WAVEfmt ", b"RIFF1234WAVE"]
    rows = audio_stats(_media(spark, wav_payloads)).collect()
    assert len(rows) == 2
    assert all(r["n_samples"] is None for r in rows)

    # video: RIFF/AVI magic but truncated header list (struct.error /
    # IndexError in the chunk walk)
    avi_payloads = [b"RIFF\x10\x00\x00\x00AVI LIST", b"RIFF1234AVI "]
    rows = video_stats(_media(spark, avi_payloads)).collect()
    assert len(rows) == 2
    assert all(r["img_w"] is None for r in rows)
