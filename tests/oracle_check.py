"""Local mirror of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 (or $SF_DIR) and
compares row count, column names, and values against oracle_sql() via
DuckDB: columns sorted by name, rows sorted by string repr, exact equality
(no tolerance — queries are designed for bit-identical results via the
DECIMAL-sum idiom). Queries without an oracle get a rows-only check.

Usage: python tests/oracle_check.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)
    if val is None:
        return "<NULL>"
    return str(val)


def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon(r[i]) for i in order))
    out.sort()
    return out


def main(only: list[str]) -> int:
    import __spark_entry__ as entrymod
    from transitlog_hfp_sink_spark.session import build_session

    spark = build_session(app_name="oracle-check", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = only or list(qs)
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {dt:.1f}s)")
            n_pass += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sk, ok_ = frame_key(srows, scols), frame_key(orows, ocols)
            if sk != ok_:
                for i, (a, b) in enumerate(zip(sk, ok_)):
                    if a != b:
                        problems.append(f"first value diff at sorted row {i}:\n  spark : {a}\n  oracle: {b}")
                        break
                else:
                    problems.append("value diff at tail rows")
        if problems:
            print(f"FAIL {name} ({len(srows)} rows, {dt:.1f}s): " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail (sf_dir={SF_DIR})")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
