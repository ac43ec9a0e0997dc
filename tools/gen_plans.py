"""Regenerate PLANS.md — physical-plan snapshots of headline queries."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transitlog_hfp_sink_spark.session import build_session
from transitlog_hfp_sink_spark.queries import queries
from transitlog_hfp_sink_spark.plans.inspect import explain_str

PICKS = {
    "hfp_vehicles_transform": "40-column transform: single codegen stage, no shuffle",
    "q5_region_revenue": "6-way join: all dimensions broadcast, fact never shuffles pre-agg",
    "asof_error_click": "as-of join: one shuffle on the key, keyed window, no nested loop",
    "events_hourly_rollup": "rollup: partial (map-side) + final HashAggregate pair",
    "dedup_minhash_lsh": "LSH: explode+agg signatures, band equi-join, no cartesian",
    "embedding_topk_exact": "brute-force ANN: broadcast queries, map-only scoring, tiny top-k window",
    "q17_small_quantity": "correlated-avg rewrite: two broadcast joins into the fact, no shuffle join",
    "q21_waiting_supplier": "EXISTS/NOT-EXISTS rewrite: one window shuffle on l_orderkey, dims broadcast",
}

def main(sf_dir="/root/testdata/sf0.01"):
    spark = build_session(master="local[8]", shuffle_partitions=8)
    qs = queries()
    # events_hourly_rollup's registry entry executes its streaming +
    # incremental legs on construction; snapshot the batch leg's plan
    from transitlog_hfp_sink_spark.queries.timeseries import q_hourly_rollup
    qs["events_hourly_rollup"] = q_hourly_rollup
    # the TPC-H tail lives behind tpch_power_run; snapshot members directly
    from transitlog_hfp_sink_spark.queries import tpch_extra
    qs.update(tpch_extra.QUERIES)
    out = ["# PLANS — physical-plan snapshots (sf0.01, local[8])", "",
           "Auto-generated evidence that headline queries compile to the plans",
           "the 100 TB design calls for. Regenerate: `python tools/gen_plans.py`.", ""]
    for name, why in PICKS.items():
        plan = explain_str(qs[name](spark, sf_dir), "simple")
        out += [f"## {name}", "", f"*{why}*", "", "```", plan.strip()[:3000], "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()

if __name__ == "__main__":
    main(*sys.argv[1:])
