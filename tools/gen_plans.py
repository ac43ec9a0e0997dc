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
    "dedup_minhash_lsh": "LSH: explode+agg signatures, band equi-join, no cartesian; verify joins SHUFFLE-HASH hinted (sort-merge spills at scale — round 8)",
    "embedding_topk_exact": "brute-force ANN: broadcast queries, map-only scoring, tiny top-k window",
    "q16_supplier_counts": "distinct-agg: broadcast anti/dim joins run MAP-SIDE before the only wide distinct (round-3 reorder, 2.3x)",
    "q17_small_quantity": "correlated-avg rewrite: two broadcast joins into the fact, no shuffle join",
    "q18_large_volume": "top-k after join: one lineitem agg exchange; semi/customer/re-join sides broadcast (size-based at this SF)",
    "q21_waiting_supplier": "EXISTS/NOT-EXISTS rewrite: one window shuffle on l_orderkey, dims broadcast",
    "zorder_clustered_scan": "Z-ordered layout: both range predicates pushed to the clustered parquet scan",
    "embedding_topk_ivf": "IVF ANN: index built on a bounded sample; centroids broadcast, corpus scored map-only",
    "text_search_bm25": "BM25: postings hash-agg with map-side combine; query terms/df/stats all broadcast — corpus never joins wide",
    "pack_token_sequences": "token packing: one shuffle into shards, per-shard window cumsum, no global sort",
    "hybrid_search_rrf": "hybrid RRF: both retrieval legs broadcast-driven; fusion aggregates only |q| x topN x 2 rows",
    "embedding_diversity_sample": "diversity sampling: map-only codebook assignment, salted two-phase per-cluster top-k — Window-free",
    "lm_score_documents": "unigram LM: train agg + broadcast model join, decimal-exact NLL sum per doc",
    "embedding_semdedup": "SemDeDup: map-only codebook assignment; within-cluster equi-join, never corpus all-pairs",
    "nb_classifier_score": "NB classifier: hashed features, broadcast <=D-row model join, decimal-exact per-doc sum",
    "dedup_spans_exact": "duplicated substrings: window hash-agg (map-side combine), dup-set equi-join, per-doc interval-union window",
    "bpe_encode_documents": "BPE encode: one map-only projection, replace chain inside whole-stage codegen, zero Python/zero exchange",
    "pack_bpe_compose": "tokenize->pack: subword widths feed the same one-shuffle per-shard window cumsum",
    "trajectory_similarity": "trajectory search: one hash-agg builds signatures, broadcast queries, map-only distance scan, tiny top-k window",
    "corpus_profile": "data card: exact-distinct costs a second (group,fingerprint) exchange; approx mode collapses to one group-key shuffle",
    "gapfill_rollup": "time_bucket_gapfill (round-7): fills resolve on OBSERVED rows (two window passes over the small aggregate), then a pinned slice repartition + map-only explode — the dense result is never sorted or shuffled; no join, no cache, no UDF",
}

def main(sf_dir="/root/testdata/sf0.01"):
    spark = build_session(master="local[8]", shuffle_partitions=8)
    qs = queries()
    # events_hourly_rollup's registry entry executes its streaming +
    # incremental legs on construction; snapshot the batch leg's plan
    # (and the round-5 gapfill arm separately — its window/join shape is
    # the interesting part)
    from transitlog_hfp_sink_spark.queries.timeseries import (
        q_gapfill_rollup,
        q_hourly_rollup,
    )
    qs["events_hourly_rollup"] = q_hourly_rollup
    qs["gapfill_rollup"] = q_gapfill_rollup
    # the TPC-H shapes live behind tpch_power_run (incl. q4/top_brands
    # since round 6); snapshot the members directly
    from transitlog_hfp_sink_spark.queries import power
    qs.update(power.POWER_QUERIES)
    # round-3 standalone operators (registry runs them as legs of
    # consolidated entries; snapshot the standalone bench shapes)
    from bench import bench_overrides

    _ov = bench_overrides()
    for _n in ("embedding_semdedup", "nb_classifier_score", "dedup_spans_exact",
               "bpe_encode_documents", "pack_bpe_compose",
               "trajectory_similarity", "corpus_profile",
               "embedding_topk_ivf"):  # bench-only since round 5
        qs[_n] = _ov[_n]

    # zorder_clustered_scan's registry entry re-derives the 32-term Morton
    # key per row (hash evidence), which swamps the snapshot cap; the plan
    # worth showing is the clustered-copy scan with BOTH range predicates
    # pushed to parquet
    def _zorder_scan_plan(spark, sf_dir):
        import tempfile

        from pyspark.sql import functions as F

        from transitlog_hfp_sink_spark.plans.zorder import write_zordered
        from transitlog_hfp_sink_spark.sources.files import read_table

        ev = read_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "ts", "value"
        )
        path = tempfile.mkdtemp(prefix="plans_zorder_") + "/events_z"
        write_zordered(ev, path, "value", "user_id", n_files=8)
        return spark.read.parquet(path).where(
            (F.col("value") >= 50.0)
            & (F.col("value") < 150.0)
            & (F.col("user_id") <= 10)
        )

    qs["zorder_clustered_scan"] = _zorder_scan_plan
    # consolidated round-3 legs: snapshot their standalone plans
    from transitlog_hfp_sink_spark.queries.ml import (
        q_embedding_diversity,
        q_hybrid_search,
    )

    qs["hybrid_search_rrf"] = q_hybrid_search
    qs["embedding_diversity_sample"] = q_embedding_diversity
    out = ["# PLANS — physical-plan snapshots (sf0.01, local[8])", "",
           "Auto-generated evidence that headline queries compile to the plans",
           "the 100 TB design calls for. Regenerate: `python tools/gen_plans.py`.", ""]
    for name, why in PICKS.items():
        plan = explain_str(qs[name](spark, sf_dir), "simple")
        out += [f"## {name}", "", f"*{why}*", "", "```", plan.strip()[:3000], "```", ""]
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    # hand-written analysis after the sentinel survives regeneration
    try:
        with open(path) as f:
            old = f.read()
        idx = old.find("<!-- notes -->")
        if idx >= 0:
            out += ["", old[idx:].rstrip()]
    except FileNotFoundError:
        pass
    with open(path, "w") as f:
        f.write("\n".join(out))
    spark.stop()

if __name__ == "__main__":
    main(*sys.argv[1:])
