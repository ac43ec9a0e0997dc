"""`spark.read.format("hfp")` — a custom Python Data Source (Spark 4
`pyspark.sql.datasource` API) for binary HFP wire files.

The reference consumes protobuf ``Hfp.Data`` messages from Pulsar
(MessageProcessor.java:118-119); this engine-pluggable source plays the
same role for file-framed captures: each ``*.hfpw`` file is a sequence of
``[u32 big-endian frame length][Hfp.Data wire bytes]`` records (the
shape a topic-dump/capture tool would write), decoded with the pure-
Python wire codec (sources/protowire.py). Undecodable frames surface as
``schema_valid = false`` rows with NULL structs — the F1 dead-letter
contract, identical to decode_hfp_wire/decode_hfp_json.

Usage:
    spark.dataSource.register(HfpDataSource)
    df  = spark.read.format("hfp").load("/captures")           # batch
    sdf = spark.readStream.format("hfp").load("/captures")     # stream

Scale shape: one InputPartition per file — parallelism = file count,
exactly like the parquet/text sources (a capture pipeline writes many
rolled files, one per topic-partition per interval, so executor fan-out
is natural). Decode is per-partition Python, the same cost class as the
mapInPandas codec path; no driver involvement beyond listing files. The
streaming reader is a SimpleDataSourceStreamReader whose offset is the
count of consumed files in sorted order (monotone, replayable — the
at-least-once contract M3 maps onto Structured Streaming's offset log).
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from pyspark.sql import types as T

from transitlog_hfp_sink_spark.schema import HFP_RAW_SCHEMA

#: HFP_RAW_SCHEMA with nullable topic/payload: undecodable frames surface
#: as schema_valid=false rows whose structs are NULL (dead-letter rows),
#: which the strict non-null declaration would reject at codegen time.
SOURCE_SCHEMA = T.StructType(
    [
        T.StructField(f.name, f.dataType, True if f.name in ("topic", "payload") else f.nullable)
        for f in HFP_RAW_SCHEMA.fields
    ]
)

FRAME_HEADER = struct.Struct(">I")
SUFFIX = ".hfpw"


def write_wire_file(path: str, messages: list[bytes]) -> None:
    """Frame messages into one capture file (test/tooling helper)."""
    with open(path, "wb") as f:
        for m in messages:
            f.write(FRAME_HEADER.pack(len(m)))
            f.write(m)


def read_wire_file(path: str) -> Iterator[bytes]:
    """Yield raw frames; a truncated trailer yields one undecodable
    marker frame instead of raising (the partial-write case of a capture
    being rolled while read — the decoder dead-letters it)."""
    with open(path, "rb") as f:
        data = f.read()
    pos, n = 0, len(data)
    while pos + FRAME_HEADER.size <= n:
        (ln,) = FRAME_HEADER.unpack_from(data, pos)
        pos += FRAME_HEADER.size
        if pos + ln > n:
            yield data[pos:]  # truncated tail -> undecodable
            return
        yield data[pos : pos + ln]
        pos += ln
    if pos != n:
        yield data[pos:]


def _list_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(SUFFIX)
    )


def _decode_rows(frames: Iterator[bytes]):
    """Frames -> (schema_valid, topic tuple, payload tuple) rows in
    HFP_RAW_SCHEMA field order."""
    from transitlog_hfp_sink_spark.sources.protowire import (
        _P_COLS,
        _T_COLS,
        decode_data,
    )

    for buf in frames:
        try:
            t, p = decode_data(bytes(buf))
        except (ValueError, struct.error, UnicodeDecodeError):
            yield (False, None, None)
            continue
        yield (
            True,
            tuple(t[c] for c in _T_COLS),
            tuple(p[c] for c in _P_COLS),
        )


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class HfpWireReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("hfp source requires a path (.load(path))")

    def partitions(self):
        return [_FilePartition(p) for p in _list_files(self.path)]

    def read(self, partition: _FilePartition):
        yield from _decode_rows(read_wire_file(partition.path))


class HfpWireStreamReader(SimpleDataSourceStreamReader):
    """Directory-tailing stream: offset = {"n": files consumed} over the
    sorted listing. New files between offsets form the micro-batch."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("hfp source requires a path (.load(path))")

    def initialOffset(self) -> dict:
        return {"n": 0}

    def read(self, start: dict):
        files = _list_files(self.path)
        end = {"n": len(files)}
        rows = []
        for p in files[start["n"] :]:
            rows.extend(_decode_rows(read_wire_file(p)))
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _list_files(self.path)
        rows = []
        for p in files[start["n"] : end["n"]]:
            rows.extend(_decode_rows(read_wire_file(p)))
        return iter(rows)


class HfpDataSource(DataSource):
    """format("hfp"): batch + streaming reads of framed HFP wire files."""

    @classmethod
    def name(cls) -> str:
        return "hfp"

    def schema(self):
        return SOURCE_SCHEMA

    def reader(self, schema) -> HfpWireReader:
        return HfpWireReader(self.options)

    def simpleStreamReader(self, schema) -> HfpWireStreamReader:
        return HfpWireStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(HfpDataSource)
