"""tpch_power_run consolidation invariants.

The power run's oracle SQL is generated from the static POWER_SCHEMAS map
(no SparkSession at oracle_sql() time), so that map must track the live
query schemas exactly — a drift would silently canonicalize a column with
the wrong rule and flip the digest red (or worse, hide a type change).
Round 6 widened the run from the 17 tpch_extra tail shapes to
POWER_QUERIES (+ q4_order_priority, top_brands_revenue).
"""

from __future__ import annotations

from transitlog_hfp_sink_spark.queries import power


def test_power_schemas_match_live(spark, sf_dir):
    assert set(power.POWER_SCHEMAS) == set(power.POWER_QUERIES)
    for name, fn in power.POWER_QUERIES.items():
        # "double_raw" is a CANONICALIZATION marker (raw data doubles get
        # the tie-proof integer-microunit form, round 8), not a Spark type
        want = [(c, t.replace("double_raw", "double"))
                for c, t in power.POWER_SCHEMAS[name]]
        assert fn(spark, sf_dir).dtypes == want, name


def test_canon_raw_double_tie_is_engine_stable(spark):
    """The sf0.1 regression pinned: 97.6015625 sits exactly on the 6 dp
    half boundary, where Spark's double->decimal cast (HALF_UP) said
    97.601563 and DuckDB's (HALF_EVEN) said 97.601562 — one flipped
    digest. The double_raw integer-microunit form must agree exactly on
    both engines for boundary and non-boundary values, positive and
    negative."""
    import duckdb

    vals = [97.6015625, -97.6015625, 0.0000005, -0.0000005, 12.25, 0.0,
            -1.9999995, 8887.171875]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    from pyspark.sql import functions as F

    got_spark = [
        r[0]
        for r in sdf.select(
            F.floor(F.col("x") * F.lit(1000000.0) + F.lit(0.5))
            .cast("bigint").cast("string")
        ).collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            f"SELECT CAST(CAST(floor(CAST({v!r} AS DOUBLE) * 1000000.0 + 0.5)"
            " AS BIGINT) AS VARCHAR)"
        ).fetchone()[0]
        for v in vals
    ]
    assert got_spark == got_duck, list(zip(vals, got_spark, got_duck))


def test_power_run_covers_every_query_nonempty(spark, sf_dir):
    got = (
        power.tpch_power_run(spark, sf_dir)
        .groupBy("qname")
        .count()
        .collect()
    )
    counts = {r["qname"]: r["count"] for r in got}
    # highly selective shapes (q2/q20/q21) can be legitimately empty at
    # sf0.001; the sf0.01 driver gate sees all 19 non-empty
    assert set(counts) <= set(power.POWER_QUERIES)
    assert len(counts) >= 14 and all(n > 0 for n in counts.values()), counts
    # the round-6 folded shapes must be present at every SF
    assert counts.get("q4_order_priority", 0) > 0
    assert counts.get("top_brands_revenue", 0) > 0


def test_power_oracle_mentions_every_query():
    for name in power.POWER_QUERIES:
        assert f"'{name}'" in power.ORACLE_POWER
