"""Physical-plan checks — the 100 TB checklist (SURVEY §4 mapping).

Correctness says the answer is right; these say the PLAN would survive a
1000-executor cluster: pushdown reaches the scan, dims broadcast, no
cartesian products, no Python eval in built-in paths.
"""

import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.plans.inspect import (
    explain_str,
    has_cartesian,
    has_python_eval,
    pushed_filters,
    uses_broadcast_join,
)
from transitlog_hfp_sink_spark.sources.files import read_table


def test_scan_pushdown_and_pruning(spark, sf_dir):
    """Filter + projection must reach the parquet scan."""
    li = read_table(spark, sf_dir, "lineitem")
    q = li.where(F.col("l_shipdate") > "1998-01-01").select("l_orderkey", "l_quantity")
    pf = pushed_filters(q)
    assert "l_shipdate" in pf, pf  # predicate pushed
    # only the needed columns are read
    assert "l_extendedprice" not in pf.split("ReadSchema")[-1]


def test_q5_broadcasts_dimensions(spark, sf_dir):
    from transitlog_hfp_sink_spark.queries.relational import q_region_revenue

    plan = explain_str(q_region_revenue(spark, sf_dir), "simple")
    assert plan.count("BroadcastHashJoin") >= 3  # cust/sup/nation/region dims
    assert not has_cartesian(q_region_revenue(spark, sf_dir))


def test_hfp_transform_pure_codegen(spark, sf_dir):
    from transitlog_hfp_sink_spark.queries.hfp import synth_vehicles

    v = synth_vehicles(spark, sf_dir)
    assert not has_python_eval(v)
    # '* Node (n)' + 'codegen id' markers = whole-stage codegen spans.
    # The widening repartition makes this an adaptive plan, which only
    # prints codegen ids once finalized — run it first.
    v.collect()
    assert "codegen id" in explain_str(v, "formatted")


def test_no_cartesian_anywhere_in_registry(spark, sf_dir):
    """Every registered query plan is cartesian-free (BroadcastNestedLoop
    is tolerated only for the intentionally-broadcast tiny query sets in
    similarity search)."""
    from transitlog_hfp_sink_spark.queries import queries

    # q11/q22: scalar-subquery-as-1-row-broadcast-cross-join is intentional
    allowed_bnlj = {
        "embedding_topk_exact",
        "embedding_sketches",
        "q11_important_parts",
        "q22_idle_customers",
        "tpch_power_run",  # contains q11/q22's 1-row broadcast cross-joins
        "text_search_bm25",  # 1-row broadcast N/avgdl corpus-stats join (both legs)
        "lm_score_documents",  # 1-row broadcast OOV-mass scalar join
        "hfp_trajectory_length",  # 'sim' leg: broadcast tiny query-signature
        # set against the per-vehicle signature table (one short row per
        # trajectory) — the embedding_topk_exact pattern
        "transit_analytics",  # 'hist' leg: the STATIC 17-row width_bucket
        # spine cross-joined into the per-route histogram densify — a
        # constant-size broadcast that does not grow with the data
        # (catalog.py register_histogram_view)
    }
    for name, fn in queries().items():
        if name == "events_hourly_rollup":
            continue  # runs streaming/incremental legs; batch twin's plan
            # is asserted in test_window_and_agg_queries_have_partial_agg
        df = fn(spark, sf_dir)
        plan = explain_str(df, "simple")
        assert "CartesianProduct" not in plan, name
        if name not in allowed_bnlj:
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_window_and_agg_queries_have_partial_agg(spark, sf_dir):
    """Rollup aggregations must show partial (map-side) aggregation."""
    from transitlog_hfp_sink_spark.queries.timeseries import q_hourly_rollup

    plan = explain_str(q_hourly_rollup(spark, sf_dir), "formatted")
    assert "HashAggregate" in plan
    # partial + final pair: two HashAggregate nodes around the exchange
    assert plan.count("HashAggregate") >= 2


def test_partitioned_sink_prunes(spark, tmp_path):
    """Vehicles parquet layout: a received_hour predicate must prune
    partitions at the scan (SURVEY §2.5 Q1)."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from hfp_fixtures import make_hfp_rows

    from transitlog_hfp_sink_spark.schema import HFP_RAW_SCHEMA
    from transitlog_hfp_sink_spark.sinks import write_vehicles_parquet
    from transitlog_hfp_sink_spark.transform import hfp_transform

    raw = spark.createDataFrame(make_hfp_rows(300), schema=HFP_RAW_SCHEMA)
    path = str(tmp_path / "vehicles")
    write_vehicles_parquet(hfp_transform(raw), path, mode="overwrite")
    q = spark.read.parquet(path).where(F.col("received_hour") == 6)
    plan = explain_str(q, "formatted")
    assert "received_hour" in plan
    n_all = spark.read.parquet(path).count()
    n_pruned = q.count()
    assert 0 < n_pruned < n_all


def test_tpch_extra_plan_shapes(spark, sf_dir):
    """The adapted TPC-H tail (queries/tpch_extra.py): subquery rewrites
    must keep the scale-friendly physical shape."""
    from transitlog_hfp_sink_spark.queries import tpch_extra as tx

    # q6: all three predicates reach the parquet scan
    pf = pushed_filters(tx.q6_forecast_revenue(spark, sf_dir))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pf, pf

    # q17: correlated-avg rewrite = two broadcast joins into lineitem,
    # no shuffle join on the fact table
    p17 = explain_str(tx.q17_small_quantity(spark, sf_dir), "simple")
    assert p17.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p17

    # q18: HAVING-IN rewrite runs as a broadcast left-semi join
    p18 = explain_str(tx.q18_large_volume(spark, sf_dir), "simple")
    assert "LeftSemi" in p18

    # q21: EXISTS/NOT-EXISTS rewrite = ONE window shuffle over l_orderkey,
    # not an agg + self-join pair
    p21 = explain_str(tx.q21_waiting_supplier(spark, sf_dir), "formatted")
    assert "Window" in p21
    assert p21.count("SortMergeJoin") <= 1  # only lineitem x orders

    # q8/q7: every dimension (incl. both nation aliases) broadcasts
    p8 = explain_str(tx.q8_market_share(spark, sf_dir), "simple")
    assert p8.count("BroadcastHashJoin") >= 5
