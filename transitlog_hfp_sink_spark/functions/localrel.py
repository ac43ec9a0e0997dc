"""JVM-local literal DataFrames for small driver-side tables.

``spark.createDataFrame(rows, schema)`` on a local Python list plans a
``ParallelCollectionRDD -> PythonRDD`` leaf: the rows are pickled into
``spark.default.parallelism`` slices and EVERY materialization of the
plan runs that many Python-worker tasks — measured 1.22 s per noop
materialization for a 4-row query table on local[32] (round 11 profile;
the leaf runs once per branch that consumes it, so a query table feeding
two broadcast joins pays it twice per execution). The same rows rendered
as a SQL ``VALUES`` literal become a JVM ``LocalRelation``
(LocalTableScan): zero Python workers, zero scan stage, 0.05 s — and at
any scale the query-side table of a broadcast join is exactly the thing
that should be a LocalRelation, not an RDD.

``values_df`` renders rows with EXACT literals (doubles via repr
round-trip, the ``_dlit`` law from operators/similarity.py) and casts
every column to the declared type, so schema and values are identical
to the ``createDataFrame`` formulation it replaces.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _split_fields(schema: str) -> list[tuple[str, str]]:
    """'a int, b array<double>' -> [('a','int'), ('b','array<double>')]
    (top-level comma split, <>-nesting respected; backticks stripped)."""
    parts, depth, cur = [], 0, []
    for ch in schema:
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            depth += ch == "<"
            depth -= ch == ">"
            cur.append(ch)
    parts.append("".join(cur))
    out = []
    for p in parts:
        name, typ = p.strip().split(None, 1)
        out.append((name.strip().strip("`"), typ.strip()))
    return out


def _elem_type(typ: str) -> str:
    t = typ.strip()
    if not t.startswith("array<"):
        raise ValueError(f"not an array type: {typ!r}")
    return t[len("array<"):-1]


def _lit(v, typ: str) -> str:
    t = typ.strip().lower()
    if v is None:
        return f"CAST(NULL AS {typ})"
    if t.startswith("array"):
        inner = _elem_type(typ)
        return "array(" + ",".join(_lit(x, inner) for x in v) + ")"
    if t in ("double", "float"):
        x = float(v)
        if math.isnan(x):
            return f"CAST('NaN' AS {typ})"
        if math.isinf(x):
            return f"CAST('{'' if x > 0 else '-'}Infinity' AS {typ})"
        # repr round-trips doubles exactly; the D suffix keeps the
        # parser from narrowing (float columns re-cast on select)
        return repr(x) + "D"
    if t in ("int", "integer", "bigint", "long", "smallint", "tinyint"):
        return str(int(v))
    if t == "boolean":
        return "TRUE" if v else "FALSE"
    if t == "string":
        s = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"
    raise ValueError(f"values_df: unsupported literal type {typ!r}")


def _arrow_type(typ: str):
    """DDL type -> pyarrow type, for exactly the literal types _lit
    supports (anything else raises, keeping the two paths' supported
    surface identical)."""
    import pyarrow as pa

    t = typ.strip().lower()
    if t.startswith("array"):
        return pa.list_(_arrow_type(_elem_type(typ)))
    scalar = {
        "double": pa.float64(),
        "float": pa.float32(),
        "int": pa.int32(),
        "integer": pa.int32(),
        "bigint": pa.int64(),
        "long": pa.int64(),
        "smallint": pa.int16(),
        "tinyint": pa.int8(),
        "boolean": pa.bool_(),
        "string": pa.string(),
    }
    if t not in scalar:
        raise ValueError(f"values_df: unsupported literal type {typ!r}")
    return scalar[t]


def values_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """A LocalRelation DataFrame of `rows` with the DDL `schema` —
    drop-in for ``spark.createDataFrame(rows, schema)`` on small local
    lists (same column names, types and values; no Python-worker leaf).
    Rows are tuples/lists in schema field order.

    Round 11: rows travel as ONE pyarrow table instead of a SQL VALUES
    literal — createDataFrame(pa.Table) still plans a JVM LocalRelation
    (LocalTableScan, verified in tests), but skips the ANTLR parse of a
    literal body that grew linear in cell count (measured 0.74 s per
    BUILD for the IVF-PQ ADC table vs ~0.08 s via Arrow; the bench pays
    the build inside every timed run). Values are exact both ways:
    doubles cross as binary IEEE754 (stricter than the repr round-trip),
    ints/strings/bools losslessly, None as null (pyarrow, unlike a
    pandas float column, never coerces None to NaN). The final
    cast-select pins the declared DDL types exactly as before."""
    fields = _split_fields(schema)
    if not rows:
        return spark.range(0).select(
            *[F.lit(None).cast(t).alias(n) for n, t in fields]
        )
    import pyarrow as pa

    pa_schema = pa.schema([(n, _arrow_type(t)) for n, t in fields])
    names = [n for n, _t in fields]
    tbl = pa.Table.from_pylist(
        [dict(zip(names, row)) for row in rows], schema=pa_schema
    )
    raw = spark.createDataFrame(tbl)
    return raw.select(*[F.col(f"`{n}`").cast(t).alias(n) for n, t in fields])
