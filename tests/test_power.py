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
        assert fn(spark, sf_dir).dtypes == power.POWER_SCHEMAS[name], name


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
