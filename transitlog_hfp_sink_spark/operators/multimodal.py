"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Pattern for 100 TB media pipelines: the media payload travels as a binary
column with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over mapInPandas so the
Python cost is per-BATCH, not per-row, and the bytes never round-trip
through the driver. Partitioning: repartition by a content-hash prefix so
batch sizes stay even when payload sizes skew.

The actual codec step is STUBBED — image/audio libraries are not in this
container (see decode_image). The Spark-side plumbing (schema, batching,
UDF signatures) is real and tested; byte-level metadata extraction is
fully implemented and oracle-checkable (length, md5).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image/audio/video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("content_md5", T.StringType(), True),
                    T.StructField("format_hint", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

BYTES_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
    ]
)


def decode_image(content: bytes) -> "object":
    """STUB: decode an image payload to HxWxC array.

    Real implementation needs Pillow/opencv (not in this container). The
    call sites below isolate this behind the batch boundary so swapping in
    a real codec touches nothing else.
    """
    raise NotImplementedError("image codec not available in this environment")


def extract_bytes_meta(df: DataFrame, id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Byte-level metadata via mapInPandas — the real (non-stub) leg of the
    multimodal path: size + content hash per payload, computed per Arrow
    batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf[content_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": content.map(lambda b: len(b) if b is not None else None).astype("Int64"),
                    "content_md5": content.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                }
            )

    return df.mapInPandas(batches, schema=BYTES_META_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled frame index
    based on byte-length-derived fake frame counts (deterministic stand-in
    until a real demuxer is wired into decode_image's slot)."""
    n_frames = (F.octet_length("content") / 1000).cast("int") + 1
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )


def resize_plan(df: DataFrame, max_dim: int = 224) -> DataFrame:
    """Image-resize plumbing: source dims fake-decoded from byte length
    (w = ceil(sqrt(n)), h = ceil(n / w) — the deterministic stand-in in
    decode_image's slot), then aspect-preserving bound to max_dim. Pure
    expressions (map-only, codegen); a real decoder only replaces the
    dim derivation, the scaling math and schema stay.

    Returns (media_id, src_w, src_h, out_w, out_h)."""
    n = F.octet_length("content").cast("double")
    w = F.ceil(F.sqrt(n)).cast("int")
    h = F.when(w > 0, F.ceil(n / w)).otherwise(F.lit(0)).cast("int")
    scale = F.least(
        F.lit(1.0), F.lit(float(max_dim)) / F.greatest(w, h).cast("double")
    )
    return df.select(
        "media_id",
        w.alias("src_w"),
        h.alias("src_h"),
        F.when(w > 0, F.greatest(F.lit(1), F.floor(w * scale).cast("int")))
        .otherwise(F.lit(0))
        .alias("out_w"),
        F.when(h > 0, F.greatest(F.lit(1), F.floor(h * scale).cast("int")))
        .otherwise(F.lit(0))
        .alias("out_h"),
    )


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def extract_features(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Feature-extraction plumbing (the embed-the-media step): Arrow-
    batched mapInPandas producing a fixed-width array<double> per payload
    that feeds the existing ANN stack (brute_force_topk / pq_encode /
    ivf_assign) unchanged. The kernel is the DETERMINISTIC stand-in in
    decode_image's slot — md5 digest bytes mapped to 16 doubles in
    [-1, 1) — so the whole leg is oracle-checkable; a real encoder
    replaces only the per-batch kernel."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def feats(b):
            if b is None:
                return None
            digest = hashlib.md5(b).digest()
            return [x / 127.5 - 1.0 for x in digest]

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "features": pdf[content_col].map(feats),
                }
            )

    return df.mapInPandas(batches, schema=FEATURES_SCHEMA)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter used by tests/queries: treats document text bytes as an
    opaque payload so the multimodal plumbing is exercised end-to-end on
    the synthetic corpus (UTF-8 bytes play the role of an undecoded blob)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("text").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
    )
