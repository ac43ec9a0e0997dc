"""tpch_power_run consolidation invariants.

The power run's oracle SQL is generated from the static POWER_SCHEMAS map
(no SparkSession at oracle_sql() time), so that map must track the live
query schemas exactly — a drift would silently canonicalize a column with
the wrong rule and flip the digest red (or worse, hide a type change).
"""

from __future__ import annotations

from transitlog_hfp_sink_spark.queries import power, tpch_extra


def test_power_schemas_match_live(spark, sf_dir):
    assert set(power.POWER_SCHEMAS) == set(tpch_extra.QUERIES)
    for name, fn in tpch_extra.QUERIES.items():
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
    # sf0.001; the sf0.01 driver gate sees all 17 non-empty
    assert set(counts) <= set(tpch_extra.QUERIES)
    assert len(counts) >= 12 and all(n > 0 for n in counts.values()), counts


def test_power_oracle_mentions_every_query():
    for name in tpch_extra.QUERIES:
        assert f"'{name}'" in power.ORACLE_POWER
