"""TPC-H power run — 19 shapes (q2, q4, q6-q22 + the broadcast top-k
brands query) as ONE registered, fully hash-checked query.

Why: the driver's correctness gate evaluates a bounded number of registry
entries; 17 individual rows crowded out the LLM-pipeline operators in
round 1, and round 6 folded q4_order_priority + top_brands_revenue in as
well (they add no plan shape the power run's EXISTS semi-join and
broadcast-dim top-k legs don't already digest) to fund the
transit_analytics slot under the 50-entry cap. Consolidating keeps EVERY
query hash-verified (not rows-only) while freeing registry slots:

- Spark side: run each tpch_extra query, reduce every result row to a
  canonical md5 digest (columns sorted by name, types canonicalized),
  union the (qname, digest) rows.
- Oracle side: the same reduction expressed in DuckDB SQL over each
  query's ORACLE_* text. md5() and the canonical string forms are
  bit-identical across both engines (verified: ints/strings/timestamps
  via explicit formats; doubles via DECIMAL(38,6), exact for the
  decimal-derived sums these queries emit).

A digest mismatch in ANY row of ANY of the 17 queries flips the entry
red, so the consolidation loses no detection power — only per-query
attribution, which bench.py's per-query timings and
tests/test_queries_extra.py retain.

The individual query callables stay importable for bench/tests; only the
registry entry is consolidated. Each subquery keeps its own optimized
plan (broadcast dims, single-shuffle aggregations) inside the union —
Spark plans union branches independently.

Scale note (100 TB): the union is 17 independent jobs' worth of work in
one plan; nothing is collected on the driver and the digest projection is
a map-only stage appended to each branch, so the consolidated form costs
the same as running the 17 queries back-to-back.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.queries import relational, tpch_extra

NULL_SENTINEL = "<NULL>"

#: every query the power run digests: the 17 tpch_extra tail shapes plus
#: the two relational headliners folded in round 6 (their callables and
#: oracle SQL stay in relational.py for bench/tests; only the registry
#: slot moved here)
POWER_QUERIES = {
    **tpch_extra.QUERIES,
    "q4_order_priority": relational.q_order_priority,
    "top_brands_revenue": relational.q_top_brands,
}
POWER_ORACLES = {
    **tpch_extra.ORACLES,
    "q4_order_priority": relational.ORACLE_PRIORITY,
    "top_brands_revenue": relational.ORACLE_TOP_BRANDS,
}

# Static (name -> [(column, spark_dtype)]) so oracle_sql() can be built
# without a SparkSession; tests/test_power.py asserts these match the
# live DataFrame schemas.
POWER_SCHEMAS: dict[str, list[tuple[str, str]]] = {
    "q2_min_cost_supplier": [("p_partkey", "bigint"), ("p_brand", "string"), ("s_name", "string"), ("s_acctbal", "double_raw"), ("n_name", "string"), ("unit_price", "double_raw")],
    "q11_important_parts": [("l_partkey", "bigint"), ("part_value", "double")],
    "q16_supplier_counts": [("p_brand", "string"), ("p_type", "string"), ("p_size", "int"), ("supplier_cnt", "bigint")],
    "q20_promo_suppliers": [("s_name", "string"), ("s_acctbal", "double_raw")],
    "q6_forecast_revenue": [("revenue", "double")],
    "q7_volume_shipping": [("supp_nation", "string"), ("cust_nation", "string"), ("l_year", "int"), ("revenue", "double")],
    "q8_market_share": [("o_year", "int"), ("mkt_share", "double")],
    "q9_product_profit": [("nation", "string"), ("o_year", "int"), ("sum_profit", "double")],
    "q10_returned_items": [("c_custkey", "bigint"), ("c_name", "string"), ("c_acctbal", "double_raw"), ("n_name", "string"), ("c_mktsegment", "string"), ("revenue", "double")],
    "q12_late_shipments": [("ship_year", "int"), ("high_line_count", "bigint"), ("low_line_count", "bigint")],
    "q14_promo_effect": [("promo_revenue", "double")],
    "q15_top_supplier": [("s_suppkey", "bigint"), ("s_name", "string"), ("total_revenue", "double")],
    "q17_small_quantity": [("avg_yearly", "double")],
    "q18_large_volume": [("c_custkey", "bigint"), ("c_name", "string"), ("o_orderkey", "bigint"), ("o_orderdate", "timestamp_ntz"), ("o_totalprice", "double_raw"), ("sum_qty", "double")],
    "q19_disjunctive": [("revenue", "double")],
    "q21_waiting_supplier": [("s_name", "string"), ("numwait", "bigint")],
    "q22_idle_customers": [("c_mktsegment", "string"), ("numcust", "bigint"), ("totacctbal", "double")],
    "q4_order_priority": [("o_orderpriority", "string"), ("n_orders", "bigint")],
    "top_brands_revenue": [("p_brand", "string"), ("revenue", "double"), ("n_items", "bigint")],
}


def _canon_spark(col: str, dtype: str):
    """Canonical string form of a column, identical to _canon_sql's.

    Two double forms (round 8, found by the sf0.1 sweep):

    - "double" — DECIMAL-derived sums (the repo idiom): the double is the
      nearest-double of a <= 6 dp decimal, so the decimal(38,6) cast
      recovers those digits exactly on both engines (a rounding tie would
      need the double within 0.5 ulp of a .xxxxxx5 boundary — impossible
      when the true value has <= 6 dp).
    - "double_raw" — RAW data doubles (acctbal, totalprice, unit costs):
      these can be dyadic rationals sitting EXACTLY on a 6 dp half
      boundary (sf0.1 hit 97.6015625), where Spark's double->decimal cast
      rounds HALF_UP and DuckDB's HALF_EVEN — one digest flips. Canonical
      form is integer microunits via floor(x*1e6 + 0.5): multiply, add,
      floor are single IEEE double ops, bit-identical across engines; no
      decimal rounding mode is ever consulted.
    """
    c = F.col(col)
    if dtype == "double":
        s = c.cast("decimal(38,6)").cast("string")
    elif dtype == "double_raw":
        s = F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("bigint").cast("string")
    elif dtype.startswith("timestamp"):
        s = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    else:  # ints, strings, decimals, dates: plain cast is format-stable
        s = c.cast("string")
    return F.coalesce(s, F.lit(NULL_SENTINEL))


def _canon_sql(col: str, dtype: str) -> str:
    if dtype == "double":
        s = f"CAST(CAST({col} AS DECIMAL(38,6)) AS VARCHAR)"
    elif dtype == "double_raw":
        s = f"CAST(CAST(floor({col} * 1000000.0 + 0.5) AS BIGINT) AS VARCHAR)"
    elif dtype.startswith("timestamp"):
        s = f"strftime({col}, '%Y-%m-%d %H:%M:%S')"
    else:
        s = f"CAST({col} AS VARCHAR)"
    return f"COALESCE({s}, '{NULL_SENTINEL}')"


def digest_spark(df: DataFrame, schema: list[tuple[str, str]], qname: str) -> DataFrame:
    cols = sorted(schema, key=lambda ct: ct[0])
    return df.select(
        F.lit(qname).alias("qname"),
        F.md5(F.concat_ws("|", *[_canon_spark(c, t) for c, t in cols])).alias("digest"),
    )


def digest_sql(oracle: str, schema: list[tuple[str, str]], qname: str) -> str:
    cols = sorted(schema, key=lambda ct: ct[0])
    exprs = ", ".join(_canon_sql(c, t) for c, t in cols)
    return (
        f"SELECT '{qname}' AS qname, md5(concat_ws('|', {exprs})) AS digest\n"
        f"FROM (\n{oracle.strip()}\n) AS {qname}_t"
    )


def agg_digest_spark(df: DataFrame, schema: list[tuple[str, str]]) -> DataFrame:
    """ORDER-INDEPENDENT aggregate digest of a result frame (round 9,
    VERDICT r8 #1): count(*) plus two BIGINT sums of 32-bit md5 slices
    over the same canonical row strings digest_spark hashes. Built for
    results too large to driver-collect (the sf1 pair-emitters: tens of
    millions of rows) — both engines aggregate fully engine-side and the
    comparison ships THREE numbers. Sum bound: each slice term is
    < 2^32, so even 2^30 rows stay under 2^62 — no overflow at any
    realistic result size. Two independent slices (md5 chars 1-8 and
    9-16) so a value error cannot cancel against a row-order artifact in
    a single checksum."""
    cols = sorted(schema, key=lambda ct: ct[0])
    h = F.md5(F.concat_ws("|", *[_canon_spark(c, t) for c, t in cols]))
    term = lambda lo: F.conv(F.substring(h, lo, 8), 16, 10).cast("bigint")  # noqa: E731
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum(term(1)), F.lit(0)).cast("bigint").alias("d1"),
        F.coalesce(F.sum(term(9)), F.lit(0)).cast("bigint").alias("d2"),
    )


def agg_digest_sql(oracle: str, schema: list[tuple[str, str]]) -> str:
    """DuckDB twin of agg_digest_spark over an oracle's SQL text."""
    cols = sorted(schema, key=lambda ct: ct[0])
    exprs = ", ".join(_canon_sql(c, t) for c, t in cols)
    return (
        "SELECT CAST(count(*) AS BIGINT) AS n_rows,\n"
        "  COALESCE(sum(('0x' || substr(h, 1, 8))::BIGINT), 0)::BIGINT AS d1,\n"
        "  COALESCE(sum(('0x' || substr(h, 9, 8))::BIGINT), 0)::BIGINT AS d2\n"
        "FROM (\n"
        f"  SELECT md5(concat_ws('|', {exprs})) AS h\n"
        f"  FROM (\n{oracle.strip()}\n) AS agg_digest_inner\n"
        ") AS agg_digest_hashed"
    )


def tpch_power_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 19 TPC-H shapes, digested and unioned (see module doc)."""
    parts = [
        digest_spark(fn(spark, sf_dir), POWER_SCHEMAS[name], name)
        for name, fn in POWER_QUERIES.items()
    ]
    return reduce(DataFrame.unionByName, parts)


ORACLE_POWER = "\nUNION ALL\n".join(
    digest_sql(POWER_ORACLES[name], POWER_SCHEMAS[name], name)
    for name in POWER_QUERIES
)

QUERIES = {"tpch_power_run": tpch_power_run}
ORACLES = {"tpch_power_run": ORACLE_POWER}
