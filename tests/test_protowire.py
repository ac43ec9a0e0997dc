"""Protobuf wire codec: roundtrip losslessness + dead-letter semantics."""

from __future__ import annotations

import math

import pytest

from transitlog_hfp_sink_spark.sources.protowire import (
    INVALID_WIRE_BYTES,
    PAYLOAD_FIELDS,
    TOPIC_FIELDS,
    decode_data,
    encode_data,
)


def _full_topic():
    return {
        "received_at": 1718000000123,
        "topic_prefix": "/hfp/",
        "topic_version": "v2",
        "journey_type": "journey",
        "temporal_type": "ongoing",
        "event_type": "VP",
        "transport_mode": "tram",
        "operator_id": 40,
        "vehicle_number": 423,
        "unique_vehicle_id": "0040/00423",
        "route_id": "2550",
        "direction_id": 2,
        "headsign": "H7",
        "start_time": "7:30",
        "next_stop": "1234",
        "geohash_level": 4,
        "latitude": 60.1699,
        "longitude": 24.9384,
    }


def _full_payload():
    return {
        "desi": "550",
        "dir": "2",
        "oper": 40,
        "veh": 423,
        "tst": "2024-06-10T07:31:02",
        "tsi": 1718004662,
        "spd": 11.9,
        "hdg": 271,
        "lat": 60.1699,
        "long": 24.9384,
        "acc": -1.25,
        "dl": -180,  # negative int32 -> two's-complement varint
        "odo": 48721.0,
        "drst": "0",
        "oday": "2024-06-10",
        "jrn": 885,
        "line": 261,
        "start": "7:30",
        "loc": "GPS",
        "stop": 1362,
        "route": "2550",
        "occu": 0,
    }


def test_roundtrip_full_message_lossless():
    t, p = _full_topic(), _full_payload()
    dt, dp = decode_data(encode_data(t, p))
    assert dt == t
    assert dp == p
    # doubles must be BITWISE identical (fixed64)
    for k in ("spd", "lat", "long", "acc", "odo"):
        assert math.copysign(1, dp[k]) == math.copysign(1, p[k])
        assert dp[k].hex() == p[k].hex()


def test_roundtrip_optionals_omitted():
    t, p = _full_topic(), _full_payload()
    for k in ("event_type", "transport_mode", "route_id", "direction_id",
              "headsign", "start_time", "next_stop", "geohash_level",
              "latitude", "longitude"):
        t[k] = None
    for k in ("desi", "dir", "oper", "spd", "hdg", "lat", "long", "acc",
              "dl", "odo", "drst", "oday", "jrn", "line", "start", "loc",
              "stop", "route", "occu"):
        p[k] = None
    dt, dp = decode_data(encode_data(t, p))
    assert dt == t
    assert dp == p


def test_malformed_string_values_survive_the_wire():
    """The safe-parse contract: malformed dir/tst/drst/oday/start strings
    must reach the transform intact (they are strings on the wire)."""
    t, p = _full_topic(), _full_payload()
    p.update(tst="bad-tst", dir="X", drst="2", oday="2024-13-45", start="99:99")
    t["start_time"] = "25:99"
    dt, dp = decode_data(encode_data(t, p))
    assert (dp["tst"], dp["dir"], dp["drst"], dp["oday"], dp["start"]) == (
        "bad-tst", "X", "2", "2024-13-45", "99:99",
    )
    assert dt["start_time"] == "25:99"


@pytest.mark.parametrize(
    "garbage",
    [INVALID_WIRE_BYTES, b"", b"\x12\xff", b"\x0a\x05abc", b"\x07"],
)
def test_garbage_bytes_raise(garbage):
    with pytest.raises(ValueError):
        decode_data(garbage)


def test_unknown_fields_are_skipped_not_fatal():
    """Forward compat: a message with an extra unknown field decodes."""
    t, p = _full_topic(), _full_payload()
    raw = encode_data(t, p)
    # append an unknown varint field (num=15) to the Data envelope
    extra = raw + bytes([15 << 3 | 0]) + b"\x2a"
    dt, dp = decode_data(extra)
    assert dt == t and dp == p


def test_field_numbers_unique_and_sorted():
    for fields in (TOPIC_FIELDS, PAYLOAD_FIELDS):
        nums = [n for n, _, _ in fields]
        assert nums == sorted(nums) and len(set(nums)) == len(nums)
        assert 1 not in nums  # 1 is reserved for schema_version


def test_wire_dataframe_roundtrip(spark, sf_dir):
    """Spark-side encode->decode equals the original rows (valid ones)."""
    from pyspark.sql import functions as F

    from transitlog_hfp_sink_spark.queries.hfp import synth_hfp
    from transitlog_hfp_sink_spark.sources.files import read_table
    from transitlog_hfp_sink_spark.sources.protowire import (
        decode_hfp_wire,
        encode_hfp_wire,
    )

    raw = synth_hfp(read_table(spark, sf_dir, "events")).limit(500).cache()
    decoded = decode_hfp_wire(encode_hfp_wire(raw))
    orig_valid = raw.where("schema_valid").select("topic", "payload")
    got_valid = decoded.where("schema_valid").select("topic", "payload")
    assert got_valid.count() == orig_valid.count()
    # exceptAll on the full nested rows: bitwise-equal or nothing
    assert got_valid.exceptAll(orig_valid).count() == 0
    assert orig_valid.exceptAll(got_valid).count() == 0
    # invalid rows became dead-letter rows with NULL structs
    n_invalid = raw.where(~F.col("schema_valid")).count()
    assert decoded.where(~F.col("schema_valid")).count() == n_invalid
    raw.unpersist()


# ---------------------------------------------------------------------------
# Property fuzz: the codec is lossless over the full value space
# ---------------------------------------------------------------------------

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from transitlog_hfp_sink_spark.sources.protowire import _ENUMS


def _field_strategy(kind: str):
    if kind == "i32":
        base = st.integers(-(2**31), 2**31 - 1)
    elif kind == "i64":
        base = st.integers(-(2**63), 2**63 - 1)
    elif kind == "str":
        base = st.text(max_size=64)
    elif kind == "dbl":
        base = st.floats(allow_nan=True, allow_infinity=True)
    else:
        base = st.sampled_from(_ENUMS[kind.split(":", 1)[1]])
    return st.one_of(st.none(), base)


_TOPIC_STRAT = st.fixed_dictionaries(
    {name: _field_strategy(kind) for _, name, kind in TOPIC_FIELDS}
)
_PAYLOAD_STRAT = st.fixed_dictionaries(
    {name: _field_strategy(kind) for _, name, kind in PAYLOAD_FIELDS}
)


@given(_TOPIC_STRAT, _PAYLOAD_STRAT)
@settings(max_examples=300, deadline=None)
def test_fuzz_roundtrip_any_values(t, p):
    """Randomized topic/payload dicts (int32/int64 boundaries, +-Inf,
    signed zero, unicode strings incl. empty, every enum member, any
    subset of fields omitted) roundtrip losslessly. NaN doubles are the
    one documented exception: proto has no 'present NaN' contract here,
    the encoder treats them as omitted -> decode yields None."""
    dt, dp = decode_data(encode_data(t, p))
    for fields, orig, got in ((TOPIC_FIELDS, t, dt), (PAYLOAD_FIELDS, p, dp)):
        for _, name, kind in fields:
            a, b = orig[name], got[name]
            if kind == "dbl" and a is not None:
                if a != a:  # NaN -> omitted by contract
                    assert b is None
                else:  # bitwise, so signed zero / Inf are exact
                    assert struct.pack("<d", a) == struct.pack("<d", b)
            else:
                assert a == b, (name, a, b)
