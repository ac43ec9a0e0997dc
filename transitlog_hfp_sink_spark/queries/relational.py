"""Relational surface: scan/filter/project, hash & broadcast joins, semi/
anti joins, outer joins, aggregation, grouping sets, top-k, set ops.

The reference implements none of these (SURVEY §2.6) — they are the
Catalyst-native surface the engine exposes over the materialized data
model. Queries are TPC-H-shaped over the driver tables.

Physical-plan expectations at 100 TB (verified in tests/test_plans.py):
- dimension joins (region/nation/supplier/part) broadcast;
- fact-fact joins (orders x lineitem) shuffle-hash/sort-merge on the key;
- filters and column pruning reach the parquet scan;
- all double sums use the DECIMAL idiom for cross-engine exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.sources.files import read_table


def _dec(col, prec: int = 18, scale: int = 2):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def money_cents(col) -> F.Column:
    """Exact integer cents of a NON-NEGATIVE 2-dp money double —
    floor(x*100 + 0.5) == the HALF_UP double->decimal(18,2) cast for
    every non-negative input (q1's round-8 cents law, hoisted to a
    shared helper in round 11). Two-dp source data never sits exactly
    on a .xx5 tie (not binary-representable), so the recovery is exact
    for the stored doubles at any magnitude below 2^43."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(100.0) + F.lit(0.5)).cast("bigint")


def disc_price_units() -> F.Column:
    """l_extendedprice * (1 - l_discount) in exact 1e-4 units (BIGINT
    per row, <= ~1e9): cents(ext) * (100 - cents(disc)) — the same
    rational as the decimal(18,2) product pipeline, as a 64-bit integer
    multiply instead of two decimal casts + a decimal multiply."""
    return money_cents("l_extendedprice") * (
        F.lit(100) - money_cents("l_discount")
    )


def units_sum_double(units: F.Column, scale: int) -> F.Column:
    """SUM integer money units exactly and convert to DOUBLE, value-
    identical to ``cast(sum(decimal(18,2)[ * decimal]) as double)``
    (round 11, measured 2x on the q1 aggregate stage): the per-row
    accumulation is widened to decimal(38,0) BEFORE the sum (the house
    overflow stance, ADVICE r8 — per-row units up to 1e9 would overflow
    a bigint sum near 1e10 rows), the division by 10^scale happens ONCE
    per output group and is exact (decimal scale >= 6 >= the units
    scale), and the only rounding is the final correctly-rounded
    double cast — the same single rounding of the same rational the
    decimal formulation performs."""
    s = F.sum(units.cast("decimal(38,0)"))
    return (s / F.lit(10 ** scale).cast("decimal(6,0)")).cast("double")


def bigint_sum_double(units: F.Column, scale: int) -> F.Column:
    """units_sum_double for SMALL per-row units (quantity/discount
    cents, <= ~1e4 per row): a plain BIGINT sum (overflow beyond 1e14
    rows, i.e. never — and ANSI mode fails loud, not silently wrong)
    with the same exact decimal divide + single double rounding."""
    s = F.sum(units).cast("decimal(38,0)")
    return (s / F.lit(10 ** scale).cast("decimal(6,0)")).cast("double")


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-table scan + filter + groupBy agg.
    Map-side partial aggregation; shuffle carries only |groups| rows."""
    li = read_table(spark, sf_dir, "lineitem")
    # sum_charge is computed in INTEGER CENTS end to end (round-8 sf1
    # sweep): the decimal formulation hides three cross-engine hazards —
    # (a) double->decimal(18,2) cast ties (Spark HALF_UP vs DuckDB
    # HALF_EVEN) on values sitting exactly on the 2 dp half boundary,
    # (b) DuckDB's decimal multiply pipeline rounded an inner product
    # (its (18,2)x(18,2) result carries width 18, not 36), and (c)
    # DuckDB's int128->double conversion is not correctly rounded for
    # sums past 2^53. The cents law floor(x*100+0.5) is a single
    # engine-identical IEEE op (== HALF_UP for the non-negative inputs,
    # so Spark's values are unchanged); the bigint product/sum is exact
    # on both engines; and the final value is assembled from two
    # exactly-representable pieces (quot < 2^53 and rem < 1e6) with one
    # deterministic rounding each — no wide-integer conversion anywhere.
    # round 11: EVERY money aggregate runs the cents law (helpers above),
    # not just sum_charge — per-row work drops from five decimal casts +
    # a decimal multiply + wide-decimal accumulators to integer
    # floor/multiply with bigint (small units) or decimal(38,0) (price
    # units, the ADVICE-r8 overflow stance) accumulation; the exact
    # decimal divide + single double rounding happens once per OUTPUT
    # GROUP. Values bit-identical to the decimal formulation (verified
    # row-for-row at sf0.01/0.1 and via the unchanged DuckDB oracle);
    # measured 0.87 -> 0.44 s on the sf0.1 noop (the single-row-group
    # scan task is the whole stage, so per-row agg cost IS the wall).
    cents = money_cents
    charge_u = (
        cents("l_extendedprice")
        * (F.lit(100) - cents("l_discount"))
        * (F.lit(100) + cents("l_tax"))
    )
    n = F.count("*")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            bigint_sum_double(cents("l_quantity"), 2).alias("sum_qty"),
            units_sum_double(cents("l_extendedprice"), 2).alias("sum_base_price"),
            units_sum_double(disc_price_units(), 4).alias("sum_disc_price"),
            F.sum(charge_u.cast("decimal(38,0)")).alias("__charge_u"),
            (bigint_sum_double(cents("l_quantity"), 2) / n).alias("avg_qty"),
            (units_sum_double(cents("l_extendedprice"), 2) / n).alias("avg_price"),
            (bigint_sum_double(cents("l_discount"), 2) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        # integer DIV/% keep both pieces exactly double-representable;
        # the two casts and one add are the only roundings, all
        # deterministic IEEE ops (see the charge_u comment above)
        .withColumn(
            "sum_charge",
            F.expr(
                "CAST(__charge_u DIV 1000000 AS DOUBLE)"
                " + CAST(__charge_u % 1000000 AS DOUBLE) / 1e6"
            ),
        )
        .select(
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "sum_charge", "avg_qty", "avg_price",
            "avg_disc", "count_order",
        )
    )


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  -- integer-cents law + two-piece double assembly (see the Spark twin's
  -- comment for the three cross-engine hazards this dodges)
  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
           * (100 + CAST(floor(l_tax * 100.0 + 0.5) AS BIGINT))) // 1000000
       AS DOUBLE)
  + CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
             * (100 + CAST(floor(l_tax * 100.0 + 0.5) AS BIGINT))) % 1000000
         AS DOUBLE) / 1e6 AS sum_charge,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10.
    customer filter broadcasts into orders; orders x lineitem is the big
    join on the shuffle key."""
    cust = read_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    # round 11 cents law (see q_pricing_summary): same rational, same
    # single double rounding, integer per-row work
    revenue = units_sum_double(disc_price_units(), 4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


ORACLE_SHIPPING = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with two dimension chains. All dims are
    broadcast; lineitem never shuffles except for the final tiny agg."""
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    sup = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    # round 11 cents law (see q_pricing_summary): same rational, same
    # single double rounding, integer per-row work
    revenue = units_sum_double(disc_price_units(), 4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .where(cust.c_nationkey == sup.s_nationkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(revenue.alias("revenue"), F.count("*").alias("n_items"))
    )


ORACLE_REGION = """
SELECT r_name, n_name,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY r_name, n_name
"""


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS -> left-semi join, then agg."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    # lineitems shipped >60 days after the order date qualify the order
    qualified = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.timestamp_add("DAY", F.lit(60), orders.o_orderdate)),
        "left_semi",
    )
    return qualified.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


ORACLE_PRIORITY = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left OUTER join + two-level aggregation
    (orders-per-customer histogram, including zero-order customers)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


ORACLE_CUSTDIST = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count
"""


def q_top_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-join top-k: part is a small dim -> broadcast into the
    lineitem scan, agg by brand, deterministic top-5."""
    part = read_table(spark, sf_dir, "part")
    li = read_table(spark, sf_dir, "lineitem")
    # round 11 cents law (see q_pricing_summary): same rational, same
    # single double rounding, integer per-row work
    revenue = units_sum_double(disc_price_units(), 4)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(revenue.alias("revenue"), F.count("*").alias("n_items"))
        .orderBy(F.col("revenue").desc(), F.col("p_brand").asc())
        .limit(5)
    )


ORACLE_TOP_BRANDS = """
SELECT p_brand,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY revenue DESC, p_brand ASC
LIMIT 5
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) with subtotal + grand total."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


ORACLE_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP and CUBE grouping-set families in one entry (registry
    consolidation, round 2 — formerly rollup_grouping_sets +
    surface.cube_events): the lineitem ROLLUP tagged ``rollup`` and the
    events CUBE (surface.q_cube) tagged ``cube``, harmonized to
    (shape, d1, d2, n, agg_value). NULL grouping-set dims stay NULL."""
    from transitlog_hfp_sink_spark.queries.surface import q_cube

    roll = q_grouping_sets(spark, sf_dir).select(
        F.lit("rollup").alias("shape"),
        F.col("l_returnflag").alias("d1"),
        F.col("l_linestatus").alias("d2"),
        "n",
        F.col("sum_qty").alias("agg_value"),
    )
    cube = q_cube(spark, sf_dir).select(
        F.lit("cube").alias("shape"),
        F.col("event_type").alias("d1"),
        F.col("user_decile").cast("string").alias("d2"),
        "n",
        F.col("sum_value").alias("agg_value"),
    )
    return roll.unionByName(cube)


def _oracle_rollup_cube() -> str:
    from transitlog_hfp_sink_spark.queries.surface import ORACLE_CUBE

    return f"""
SELECT 'rollup' AS shape, l_returnflag AS d1, l_linestatus AS d2, n,
       sum_qty AS agg_value
FROM ({ORACLE_GROUPING_SETS}) AS r_t
UNION ALL
SELECT 'cube' AS shape, event_type AS d1, CAST(user_decile AS VARCHAR) AS d2,
       n, sum_value AS agg_value
FROM ({ORACLE_CUBE}) AS c_t
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations + anti join over customers, tagged legs (round-3
    consolidation absorbs the former anti_join_customers entry):

    leg='except'    — customers with an order EXCEPT the BUILDING segment;
    leg='intersect' — the INTERSECT counterpart;
    leg='anti'      — NOT EXISTS via left-anti join: customers with no
                      order since 2000 (surface.q_anti_join), c_mktsegment
                      carried so the anti output stays fully checked."""
    from transitlog_hfp_sink_spark.queries.surface import q_anti_join

    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    with_orders = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey")
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ns = F.lit(None).cast("string")
    except_leg = with_orders.exceptAll(building).distinct().select(
        F.lit("except").alias("leg"), "c_custkey", ns.alias("c_mktsegment")
    )
    intersect_leg = with_orders.intersect(building).select(
        F.lit("intersect").alias("leg"), "c_custkey", ns.alias("c_mktsegment")
    )
    anti_leg = q_anti_join(spark, sf_dir).select(
        F.lit("anti").alias("leg"), "c_custkey", "c_mktsegment"
    )
    return except_leg.unionByName(intersect_leg).unionByName(anti_leg)


ORACLE_SET_OPS = """
SELECT 'except' AS leg, c_custkey, CAST(NULL AS VARCHAR) AS c_mktsegment FROM (
  SELECT DISTINCT c_custkey FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
  EXCEPT
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
UNION ALL
SELECT 'intersect' AS leg, c_custkey, CAST(NULL AS VARCHAR) AS c_mktsegment FROM (
  SELECT DISTINCT c_custkey FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
  INTERSECT
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
UNION ALL
SELECT 'anti' AS leg, c_custkey, c_mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01'
)
"""


# q4_order_priority and top_brands_revenue moved into the power-run
# digest in round 6 (power.POWER_QUERIES) to fund the transit_analytics
# registry slot; their callables + oracle SQL above stay importable for
# bench.py and tests.
QUERIES = {
    "q1_pricing_summary": q_pricing_summary,
    "q3_shipping_priority": q_shipping_priority,
    "q5_region_revenue": q_region_revenue,
    "q13_customer_distribution": q_customer_distribution,
    "rollup_cube_grouping": q_rollup_cube,
    "set_ops_customers": q_set_ops,
}

ORACLES = {
    "q1_pricing_summary": ORACLE_PRICING,
    "q3_shipping_priority": ORACLE_SHIPPING,
    "q5_region_revenue": ORACLE_REGION,
    "q13_customer_distribution": ORACLE_CUSTDIST,
    "rollup_cube_grouping": _oracle_rollup_cube(),
    "set_ops_customers": ORACLE_SET_OPS,
}
