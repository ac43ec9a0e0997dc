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


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter used by tests/queries: treats document text bytes as an
    opaque payload so the multimodal plumbing is exercised end-to-end on
    the synthetic corpus (UTF-8 bytes play the role of an undecoded blob)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("text").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
    )
