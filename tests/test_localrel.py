"""values_df must be a drop-in for createDataFrame on small local rows:
identical schema (names + dtypes) and identical collected values, with a
LocalRelation leaf (no Python-worker scan stage) — round-11 optimization
(guide §4: the query side of a broadcast join should not be an RDD)."""

import math

import pytest

from transitlog_hfp_sink_spark.functions.localrel import values_df


CASES = [
    (
        [(1, "machine learning"), (2, "it's a 'quoted' str"), (3, None),
         (4, "back\\slash and new\nline")],
        "query_id int, qtext string",
    ),
    (
        [(1, [1.5, -0.25, 3.0]), (2, None), (3, [])],
        "vec_id bigint, embedding array<double>",
    ),
    (
        [(1, 0, [[1.0, 2.5], [float("nan"), float("inf")]]),
         (2, 3, [[-0.0, float("-inf")]])],
        "query_id int, list_id int, __tabs array<array<double>>",
    ),
    (
        [(True, 0.1), (False, -1e-300), (None, float("nan"))],
        "flag boolean, x double",
    ),
]


@pytest.mark.parametrize("rows,schema", CASES)
def test_values_df_matches_createdataframe(spark, rows, schema):
    a = values_df(spark, rows, schema)
    b = spark.createDataFrame(rows, schema)
    assert a.dtypes == b.dtypes
    ra = sorted(map(repr, a.collect()))
    rb = sorted(map(repr, b.collect()))
    assert ra == rb


def test_values_df_empty(spark):
    a = values_df(spark, [], "query_id int, qtext string")
    b = spark.createDataFrame([], "query_id int, qtext string")
    assert a.dtypes == b.dtypes
    assert a.collect() == [] == b.collect()


def test_values_df_exact_double_roundtrip(spark):
    vals = [0.1 + 0.2, 1e-17, 123456789.123456789, 2.0 ** -1074]
    rows = [(i, v) for i, v in enumerate(vals)]
    out = dict(
        values_df(spark, rows, "i int, x double").collect()
    )
    for i, v in enumerate(vals):
        assert out[i] == v, (out[i], v)


def test_values_df_is_local_relation(spark):
    """No Python-worker leaf: the plan must not contain an RDD scan."""
    df = values_df(spark, [(1, "a")], "query_id int, qtext string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan, plan
    assert "Scan ExistingRDD" not in plan, plan
