"""Deterministic HFP raw fixture generator (FIXTURES.md §1).

Pure-Python rows matching HFP_RAW_SCHEMA, covering: every enum value, every
safe-parse malformed path (dir/drst/oday/start/start_time), schema_valid
rejects, an unparseable tst, nulls in every nullable column, duplicated
(vehicle, tst) pairs for at-least-once replay, and received_at jitter.
Seeded — same rows every run.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

JOURNEY_TYPES = ["journey", "deadrun", "signoff"]
EVENT_TYPES = [
    "VP", "DUE", "ARR", "ARS", "PDE", "DEP", "PAS", "WAIT", "DOO",
    "DOC", "TLR", "TLA", "DA", "DOUT", "BA", "BOUT", "VJA", "VJOUT",
]
MODES = ["bus", "train", "tram", "metro", "ferry"]
LOCS = ["GPS", "ODO", "MAN", "NA"]

BASE = datetime(2024, 3, 15, 6, 0, 0)


def make_hfp_rows(n: int = 600, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        veh = i % 40
        oper = veh % 7
        ts = BASE + timedelta(seconds=i * 7 + rng.randint(0, 3))
        received = ts + timedelta(milliseconds=rng.randint(-500, 5000))
        malformed = i % 37 == 5
        topic = {
            "received_at": int(received.timestamp() * 1000),
            "topic_prefix": "/hfp/",
            "topic_version": "v2",
            "journey_type": JOURNEY_TYPES[i % 3],
            "temporal_type": "ongoing" if i % 10 else "upcoming",
            "event_type": None if i % 29 == 7 else EVENT_TYPES[i % 18],
            "transport_mode": None if i % 31 == 8 else MODES[i % 5],
            "operator_id": oper,
            "vehicle_number": veh,
            "unique_vehicle_id": f"{oper:04d}/{veh:05d}",
            "route_id": None if i % 23 == 9 else f"2{i % 55:03d}",
            "direction_id": None if i % 19 == 3 else (i % 2) + 1,
            "headsign": None if i % 17 == 4 else f"Head{i % 9}",
            "start_time": ("25:99" if malformed else None if i % 13 == 6 else f"{(6 + i) % 24}:{i % 60:02d}"),
            "next_stop": None if i % 11 == 2 else str(1000 + i % 500),
            "geohash_level": None if i % 21 == 1 else i % 6,
            "latitude": None if i % 27 == 3 else 60.0 + (i % 100) / 200.0,
            "longitude": None if i % 27 == 3 else 24.5 + (i % 100) / 100.0,
        }
        payload = {
            "desi": None if i % 23 == 11 else str(500 + i % 55),
            "dir": ("X" if malformed else None if i % 19 == 7 else str((i % 2) + 1)),
            "oper": None if i % 31 == 2 else oper,
            "veh": veh,
            # one deliberately unparseable tst (F3 dead-letter path)
            "tst": ("not-a-timestamp" if i == 111 else ts.strftime("%Y-%m-%dT%H:%M:%S.") + f"{i % 1000:03d}"),
            "tsi": int(ts.timestamp()),
            "spd": None if i % 13 == 1 else (i % 250) / 10.0,
            "hdg": None if i % 17 == 8 else i % 360,
            "lat": None if i % 27 == 3 else 60.0 + (i % 100) / 200.0,
            "long": None if i % 27 == 3 else 24.5 + (i % 100) / 100.0,
            "acc": None if i % 15 == 4 else (i % 50) / 10.0 - 2.5,
            "dl": None if i % 14 == 5 else (i % 600) - 300,
            "odo": None if i % 16 == 6 else float(i * 13 % 100000),
            "drst": ("2" if malformed else None if i % 12 == 7 else str(i % 2)),
            "oday": ("2024-13-45" if malformed else None if i % 18 == 9 else ts.strftime("%Y-%m-%d")),
            "jrn": None if i % 22 == 10 else i % 100000,
            "line": None if i % 24 == 11 else i % 550,
            "start": ("99:99" if malformed else None if i % 13 == 6 else f"{(6 + i) % 24}:{i % 60:02d}"),
            "loc": None if i % 26 == 12 else LOCS[i % 4],
            "stop": None if i % 11 == 2 else 1000 + i % 500,
            "route": None if i % 23 == 9 else f"2{i % 55:03d}",
            "occu": None if i % 20 == 13 else i % 101,
        }
        rows.append(
            {
                "schema_valid": i % 53 != 17,  # a few wrong-protobuf-schema rows
                "topic": topic,
                "payload": payload,
            }
        )
    # at-least-once replay: duplicate a handful of rows verbatim
    rows.extend(rows[100:110])
    return rows
