"""Local mirror of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 (or $SF_DIR) and
compares row count, column names, COLUMN TYPES, and values against
oracle_sql() via DuckDB: columns sorted by name, rows sorted by string
repr, exact equality (no tolerance — queries are designed for
bit-identical results via the DECIMAL-sum idiom). Queries without an
oracle get a rows-only check.

The type check mirrors the driver's type-sensitive value hash (round-1
lesson: DuckDB windowed sum(int) is HUGEINT -> arrow decimal128, Spark
emits bigint — values stringified equal, hashes differ). Spark dtypes and
DuckDB arrow types are both mapped to a canonical name and must agree.

Usage: python tests/oracle_check.py [query_name ...]
       python tests/oracle_check.py --digest [query_name ...]

--digest (round 9, VERDICT r8 #1): compare engine-side AGGREGATE
digests instead of collected rows — count(*) plus two BIGINT sums of
32-bit md5 slices over the canonicalized rows (the registry's own
digest law, shared with queries/power.py). Neither engine materializes
a row to the driver, so the sf1 pair-emitters (tens of millions of
pair rows; the row-compare harness bound in rounds 1-8) verify too.
Double columns canonicalize via the decimal(38,6) law, which is exact
for the <= 6 dp rounded values every registry query emits.
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


def canon_spark_dtype(dt: str) -> str:
    dt = dt.lower()
    m = {
        "tinyint": "int8", "smallint": "int16", "int": "int32",
        "bigint": "int64", "float": "float32", "double": "float64",
        "string": "string", "boolean": "bool", "date": "date",
        "binary": "binary",
    }
    if dt in m:
        return m[dt]
    if dt.startswith("decimal"):
        return dt.replace(" ", "")
    if dt.startswith("timestamp"):
        return "timestamp"
    if dt.startswith("array") or dt.startswith("map") or dt.startswith("struct"):
        return dt.replace(" ", "")
    return dt


def canon_arrow_type(t) -> str:
    import pyarrow as pa

    if pa.types.is_int8(t):
        return "int8"
    if pa.types.is_int16(t):
        return "int16"
    if pa.types.is_int32(t):
        return "int32"
    if pa.types.is_int64(t):
        return "int64"
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{canon_arrow_type(t.value_type)}>"
    return str(t)


def canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)
    if val is None:
        return "<NULL>"
    return str(val)


def canon_pd(val):
    """Canonicalize a PANDAS-path cell. Maps the lossless spellings of the
    same value onto one string (None/NaN/NaT -> <NULL>; ints spelled as
    exact floats -> int; naive == UTC-aware timestamps) while PRESERVING
    lossy divergences: a Decimal whose float64 coercion rounds (magnitude
    > 2**53) canonicalizes differently on the two engines — exactly the
    round-4 driver-red class this check exists to surface locally."""
    import datetime as _dt
    import decimal

    import pandas as pd

    if val is None:
        return "<NULL>"
    if isinstance(val, float):
        if math.isnan(val):
            return "<NULL>"  # pandas spells numeric NULL as NaN
        if val.is_integer() and abs(val) < 2**63:
            return str(int(val))  # int column coerced to float64 by NULLs
        return repr(val)
    if isinstance(val, decimal.Decimal):
        if val == val.to_integral_value():
            return str(int(val))
        return str(float(val))
    try:
        if pd.isna(val):
            return "<NULL>"
    except (TypeError, ValueError):
        pass
    if isinstance(val, pd.Timestamp):
        if val.tzinfo is not None:
            val = val.tz_convert("UTC").tz_localize(None)
        return val.isoformat()
    if isinstance(val, _dt.datetime):
        return val.isoformat()
    if isinstance(val, _dt.date):
        # spark toPandas yields datetime.date; duckdb .df() yields a
        # midnight datetime64 — same value, one spelling
        return f"{val.isoformat()}T00:00:00"
    if hasattr(val, "tolist"):  # numpy scalar / array
        return canon_pd(val.tolist()) if not isinstance(val.tolist(), list) else str(
            val.tolist()
        )
    return str(val)


def pandas_frame_key(pdf):
    """frame_key over a pandas DataFrame (the driver-mirror path)."""
    cols = list(pdf.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in pdf.itertuples(index=False, name=None):
        out.append(tuple(canon_pd(row[i]) for i in order))
    out.sort()
    return out


def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon(r[i]) for i in order))
    out.sort()
    return out


def digest_main(only: list[str]) -> int:
    """--digest mode: aggregate-digest comparison (module docstring)."""
    import __spark_entry__ as entrymod
    from transitlog_hfp_sink_spark.queries.power import (
        agg_digest_spark,
        agg_digest_sql,
    )
    from transitlog_hfp_sink_spark.session import build_session

    spark = build_session(app_name="oracle-digest", master="local[32]",
                          shuffle_partitions=32)
    con = duckdb.connect()
    # digest mode exists for results too big to collect — cap DuckDB's
    # memory and give it a spill directory so big window sorts (e.g. the
    # sf1 winnow leg: per-character rows) spill instead of OOM-killing
    # the process (first sf1 run died at 71 GB RSS)
    con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '40GB')}'")
    con.execute("SET temp_directory='/tmp/duckdb-oracle-spill'")
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM {src}")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name in only or list(oracles):
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            # the digest law's schema classes, derived from the LIVE
            # Spark schema: round-6 doubles take the decimal(38,6)
            # canonical form; everything else plain-casts
            schema = [(c, t) for c, t in sdf.dtypes]
            srow = tuple(agg_digest_spark(sdf, schema).collect()[0])
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        try:
            orow = tuple(
                con.execute(agg_digest_sql(oracles[name], schema)).fetchone()
            )
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if srow == orow:
            print(
                f"PASS {name} (digest: n={srow[0]:,} d1={srow[1]} "
                f"d2={srow[2]}; spark {t_spark:.1f}s, total {dt:.1f}s)"
            )
            n_pass += 1
        else:
            print(f"FAIL {name}: spark={srow} oracle={orow} ({dt:.1f}s)")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail (digest mode, sf_dir={SF_DIR})")
    spark.stop()
    return 1 if n_fail else 0


def main(only: list[str]) -> int:
    import __spark_entry__ as entrymod
    from transitlog_hfp_sink_spark.session import build_session

    spark = build_session(app_name="oracle-check", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata tables are single parquet FILES; tool-synthesized
        # inputs (tools/stress_sf1.py) are Spark DIRECTORY outputs — glob
        # the parts in that case so the sweep runs at sf1 too (round 8)
        path = f"{SF_DIR}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM {src}")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = only or list(qs)
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        sdf = None
        try:
            sdf = qs[name](spark, SF_DIR).persist()  # collected twice:
            # once exact (collect) + once through the pandas mirror
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            if sdf is not None:
                sdf.unpersist()  # don't let a failing entry's cache
                # occupy storage memory for the rest of the sweep
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            sdf.unpersist()
            print(f"ok   {name}: rows-only ({len(srows)} rows, {dt:.1f}s)")
            n_pass += 1
            continue
        try:
            tbl = con.execute(oracles[name]).arrow()
            ocols = tbl.schema.names
            otypes = {f.name: canon_arrow_type(f.type) for f in tbl.schema}
            orows = list(zip(*[col.to_pylist() for col in tbl.columns])) if tbl.num_columns else []
            if tbl.num_rows and not orows:
                orows = [()] * tbl.num_rows
        except Exception as e:
            sdf.unpersist()
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        else:
            stypes = {c: canon_spark_dtype(t) for c, t in sdf.dtypes}
            for c in scols:
                if stypes.get(c) != otypes.get(c):
                    problems.append(
                        f"type mismatch {c}: spark={stypes.get(c)} oracle={otypes.get(c)}"
                    )
        if not problems:
            sk, ok_ = frame_key(srows, scols), frame_key(orows, ocols)
            if sk != ok_:
                for i, (a, b) in enumerate(zip(sk, ok_)):
                    if a != b:
                        problems.append(f"first value diff at sorted row {i}:\n  spark : {a}\n  oracle: {b}")
                        break
                else:
                    problems.append("value diff at tail rows")
        if not problems:
            # PANDAS-PATH mirror (round-4 driver-red lesson): the driver
            # compares via pandas conversions, where DuckDB coerces wide
            # decimals to float64 — values that are arrow-exact-equal can
            # still hash-mismatch there. Re-fetch both sides through the
            # lossy path and compare canonicalized values.
            try:
                spdf = sdf.toPandas()
                opdf = con.execute(oracles[name]).df()
                pk_s, pk_o = pandas_frame_key(spdf), pandas_frame_key(opdf)
                if pk_s != pk_o:
                    for i, (a, b) in enumerate(zip(pk_s, pk_o)):
                        if a != b:
                            problems.append(
                                "PANDAS-PATH divergence (arrow-exact equal!) "
                                f"at sorted row {i}:\n  spark : {a}\n  oracle: {b}"
                            )
                            break
                    else:
                        problems.append(
                            "PANDAS-PATH divergence (arrow-exact equal!) "
                            f"rowcount spark={len(pk_s)} oracle={len(pk_o)}"
                        )
            except Exception as e:  # the mirror must never mask a pass
                problems.append(f"PANDAS-PATH check errored: {e}")
        sdf.unpersist()
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
    argv = sys.argv[1:]
    if argv and argv[0] == "--digest":
        raise SystemExit(digest_main(argv[1:]))
    raise SystemExit(main(argv))
