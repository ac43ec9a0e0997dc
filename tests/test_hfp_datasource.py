"""Custom Python Data Source (format='hfp'): batch, stream, dead-letter."""

import os

import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.sources.hfp_datasource import (
    HfpDataSource,
    HfpWireStreamReader,
    read_wire_file,
    write_wire_file,
)
from transitlog_hfp_sink_spark.sources.protowire import (
    INVALID_WIRE_BYTES,
    encode_data,
)

from hfp_fixtures import make_hfp_rows


def _wire_messages():
    """Encode the golden fixture rows to wire bytes (valid rows only)."""
    msgs = []
    for row in make_hfp_rows():
        if not row["schema_valid"]:
            msgs.append(INVALID_WIRE_BYTES)
            continue
        msgs.append(encode_data(dict(row["topic"]), dict(row["payload"])))
    return msgs


@pytest.fixture(scope="module")
def capture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("captures")
    msgs = _wire_messages()
    mid = len(msgs) // 2
    write_wire_file(str(d / "part-000.hfpw"), msgs[:mid])
    write_wire_file(str(d / "part-001.hfpw"), msgs[mid:])
    return str(d)


def test_frame_roundtrip(tmp_path):
    msgs = [b"abc", b"", b"\x00\x01\x02"]
    p = str(tmp_path / "f.hfpw")
    write_wire_file(p, msgs)
    assert list(read_wire_file(p)) == msgs


def test_truncated_tail_becomes_single_frame(tmp_path):
    p = str(tmp_path / "t.hfpw")
    write_wire_file(p, [b"good"])
    with open(p, "ab") as f:
        f.write(b"\x00\x00\x00\xff partial")  # header promises more bytes
    frames = list(read_wire_file(p))
    assert frames[0] == b"good" and len(frames) == 2


def test_batch_read_matches_fixtures(spark, capture_dir):
    spark.dataSource.register(HfpDataSource)
    df = spark.read.format("hfp").load(capture_dir)
    rows = make_hfp_rows()
    assert df.count() == len(rows)
    n_valid = sum(1 for r in rows if r["schema_valid"])
    assert df.where("schema_valid").count() == n_valid
    # invalid frames dead-letter with NULL structs
    assert (
        df.where(~F.col("schema_valid")).where(F.col("topic").isNotNull()).count()
        == 0
    )
    # spot-check a decoded value roundtrips exactly
    want = {
        r["topic"]["unique_vehicle_id"]
        for r in rows
        if r["schema_valid"]
    }
    got = {
        r["unique_vehicle_id"]
        for r in df.where("schema_valid").select("topic.unique_vehicle_id").collect()
    }
    assert got == want


def test_batch_read_parallelism_is_file_count(spark, capture_dir):
    spark.dataSource.register(HfpDataSource)
    df = spark.read.format("hfp").load(capture_dir)
    assert df.rdd.getNumPartitions() == 2


def test_feeds_engine_transform(spark, capture_dir):
    from transitlog_hfp_sink_spark.transform import hfp_split

    spark.dataSource.register(HfpDataSource)
    raw = spark.read.format("hfp").load(capture_dir)
    valid, dead = hfp_split(raw)
    assert valid.count() > 0
    assert len(valid.columns) == 40


def test_streaming_tail_picks_up_new_files(spark, tmp_path):
    import time
    import uuid

    spark.dataSource.register(HfpDataSource)
    d = tmp_path / "stream"
    d.mkdir()
    msgs = _wire_messages()
    write_wire_file(str(d / "a.hfpw"), msgs)
    name = f"hfp_stream_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("hfp")
        .load(str(d))
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table(name).count() < len(msgs):
            time.sleep(0.5)
        assert spark.table(name).count() == len(msgs)
        write_wire_file(str(d / "b.hfpw"), msgs)  # roll a second capture
        deadline = time.time() + 60
        while time.time() < deadline and spark.table(name).count() < 2 * len(msgs):
            time.sleep(0.5)
        assert spark.table(name).count() == 2 * len(msgs)
    finally:
        q.stop()


def test_stream_offsets_are_filename_watermarks(tmp_path):
    """Round-2 ADVICE: a late file sorting BELOW consumed names must not
    re-index the listing (count offsets re-emitted the tail and skipped
    the newcomer forever). Watermark offsets ignore the late file and
    keep offset-range replay stable as the listing grows."""
    d = tmp_path / "wm"
    d.mkdir()
    msgs = _wire_messages()
    write_wire_file(str(d / "m.hfpw"), msgs)
    write_wire_file(str(d / "t.hfpw"), msgs)
    rdr = HfpWireStreamReader({"path": str(d)})
    start = rdr.initialOffset()
    rows, end = rdr.read(start)
    assert end == {"last": "t.hfpw"}
    assert len(list(rows)) == 2 * len(msgs)
    # a late arrival sorting below the watermark is ignored...
    write_wire_file(str(d / "a.hfpw"), msgs)
    rows2, end2 = rdr.read(end)
    assert list(rows2) == [] and end2 == {"last": "t.hfpw"}
    # ...and offset-range replay stays a pure name-interval selection:
    # the two consumed files are re-delivered exactly once each; the late
    # in-interval file rides along (at-least-once: delivered on replay,
    # never duplicated, never index-shifts other files)
    replay = list(rdr.readBetweenOffsets(start, end))
    assert len(replay) == 3 * len(msgs)
    # a properly-named newcomer above the watermark is consumed
    write_wire_file(str(d / "z.hfpw"), msgs)
    rows3, end3 = rdr.read(end2)
    assert len(list(rows3)) == len(msgs) and end3 == {"last": "z.hfpw"}
    # legacy count offsets from a round-2 checkpoint still resolve
    legacy = list(rdr.readBetweenOffsets({"n": 0}, {"n": 2}))
    assert len(legacy) == 2 * len(msgs)
