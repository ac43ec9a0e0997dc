"""Standard-surface coverage: scalar functions, anti joins, exact/approx
distinct, percentiles, pivot — the SURVEY §2.6 gap list as first-class,
oracle-checked queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.sources.files import read_table


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math/date scalar-function showcase (map-only projection)."""
    part = read_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("-", "p_brand", F.col("p_size").cast("string")).alias("brand_size"),
        F.round(F.sqrt(F.col("p_retailprice")), 6).alias("price_sqrt"),
        F.round(F.log(F.col("p_retailprice") + 1.0), 6).alias("price_ln"),
        (F.col("p_size") % 5).cast("int").alias("size_mod5"),
        F.when(F.col("p_size") >= 25, "large").otherwise("small").alias("size_class"),
        F.coalesce(F.nullif("p_brand", F.lit("Brand#1")), F.lit("OTHER")).alias("brand_or_other"),
    )


ORACLE_SCALAR = """
SELECT p_partkey,
  upper(p_name) AS name_upper,
  CAST(length(p_name) AS INTEGER) AS name_len,
  substring(p_type, 1, 5) AS type_prefix,
  p_brand || '-' || CAST(p_size AS VARCHAR) AS brand_size,
  round(sqrt(p_retailprice), 6) AS price_sqrt,
  round(ln(p_retailprice + 1.0), 6) AS price_ln,
  CAST(p_size % 5 AS INTEGER) AS size_mod5,
  CASE WHEN p_size >= 25 THEN 'large' ELSE 'small' END AS size_class,
  coalesce(nullif(p_brand, 'Brand#1'), 'OTHER') AS brand_or_other
FROM part
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS -> left-anti join: customers with no order since 2000
    (the recency filter keeps the result non-empty — every customer has
    SOME order in the synthetic data, which would make the plain variant
    a trivially-empty check)."""
    cust = read_table(spark, sf_dir, "customer")
    recent = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


ORACLE_ANTI = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01'
)
"""


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct aggregation + HLL++ sketch in one pass
    (registry consolidation, round 2: absorbs approx_distinct_users).
    The sketch value itself is engine-specific, so what's hash-checked is
    the CONTRACT: |approx - exact| / exact <= 5% per group (HLL++ at
    rsd=0.02; the tighter ~3*rsd bound is asserted in
    tests/test_queries_extra.py). The oracle emits constant TRUE — a
    stronger check than rows-only, since any group drifting past the
    bound flips the boolean and fails the hash."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.02)
                - F.countDistinct("user_id")
            )
            / F.greatest(F.countDistinct("user_id"), F.lit(1))
            <= 0.05
        ).alias("approx_within_5pct"),
    )


ORACLE_DISTINCT = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events,
       min(ts) AS first_ts, max(ts) AS last_ts,
       TRUE AS approx_within_5pct
FROM events GROUP BY event_type
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approx distinct — the at-scale form of q_distinct_counts
    (no shuffle of the distinct keys). Approximate -> rows-only check; the
    <2% error bound vs exact is asserted in tests/test_queries_extra.py."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation-profile union (registry consolidation, round 3 — frees
    a slot for the new merge/resample rows while keeping every leg
    driver-checked):

    part='pctl'     — exact linear-interpolation percentiles of order
                      value per priority (grp = o_orderpriority);
    part='distinct' — the former distinct_counts entry: exact
                      multi-column distinct aggregation + the HLL++
                      |approx-exact|<=5% contract boolean per event type
                      (grp = event_type);
    part='profile'  — the corpus data card (operators/profile.py,
                      round 3): per-source document/token totals,
                      token-length percentiles, exact-duplicate /
                      quality-pass / empty-doc rates over the documents
                      table (grp = source) — every statistic replayed
                      in the DuckDB twin;
    part='regr'     — TimescaleDB Toolkit ``stats_agg``/PostgreSQL
                      ``regr_*`` parity (round 5): per returnflag the
                      OLS of extendedprice on quantity — slope,
                      intercept, r², corr — computed from EXACT decimal
                      moment sums (n, Σx, Σy, Σxy, Σx², Σy²; one
                      map-side-combinable hash-agg) with a single
                      double cast at the end, so the values are
                      bit-identical cross-engine where the engines' own
                      regr_slope/corr (order-dependent float partials)
                      would not be (grp = l_returnflag)."""
    orders = read_table(spark, sf_dir, "orders")
    pct = F.percentile("o_totalprice", F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75, 0.9)]))
    nb = F.lit(None).cast("bigint")
    nt = F.lit(None).cast("timestamp")
    pctl_leg = orders.groupBy(
        F.col("o_orderpriority").alias("grp")
    ).agg(
        F.round(F.element_at(pct, 1), 4).alias("p25"),
        F.round(F.element_at(pct, 2), 4).alias("p50"),
        F.round(F.element_at(pct, 3), 4).alias("p75"),
        F.round(F.element_at(pct, 4), 4).alias("p90"),
    ).select(
        F.lit("pctl").alias("part"), "grp", "p25", "p50", "p75", "p90",
        nb.alias("n_users"), nb.alias("n_events"),
        nt.alias("first_ts"), nt.alias("last_ts"),
        F.lit(None).cast("boolean").alias("approx_within_5pct"),
    )
    nd = F.lit(None).cast("double")
    distinct_leg = q_distinct_counts(spark, sf_dir).select(
        F.lit("distinct").alias("part"),
        F.col("event_type").alias("grp"),
        nd.alias("p25"), nd.alias("p50"), nd.alias("p75"), nd.alias("p90"),
        "n_users", "n_events", "first_ts", "last_ts", "approx_within_5pct",
    )
    from transitlog_hfp_sink_spark.operators.profile import corpus_profile

    docs = read_table(spark, sf_dir, "documents", widen=True)
    profile_leg = corpus_profile(docs, "text", ("source",)).select(
        F.lit("profile").alias("part"),
        F.col("source").alias("grp"),
        nd.alias("p25"), F.col("p50_tokens").alias("p50"),
        nd.alias("p75"), F.col("p90_tokens").alias("p90"),
        nb.alias("n_users"), nb.alias("n_events"),
        nt.alias("first_ts"), nt.alias("last_ts"),
        F.lit(None).cast("boolean").alias("approx_within_5pct"),
        "n_docs", "n_tokens", "dup_doc_rate", "mean_quality",
        "quality_pass_rate", "empty_doc_rate",
    )
    li = read_table(spark, sf_dir, "lineitem")
    dx = F.col("l_quantity").cast("decimal(18,6)")
    dy = F.col("l_extendedprice").cast("decimal(18,6)")
    mom = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count("*").alias("mn"),
        F.sum(dx).alias("msx"),
        F.sum(dy).alias("msy"),
        F.sum(dx * dy).alias("msxy"),
        F.sum(dx * dx).alias("msxx"),
        F.sum(dy * dy).alias("msyy"),
    )
    n_, sx, sy = (F.col(c).cast("double") for c in ("mn", "msx", "msy"))
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("msxy", "msxx", "msyy"))
    cov = n_ * sxy - sx * sy
    slope = cov / (n_ * sxx - sx * sx)
    corr = cov / F.sqrt((n_ * sxx - sx * sx) * (n_ * syy - sy * sy))
    regr_leg = mom.select(
        F.lit("regr").alias("part"), "grp",
        nd.alias("p25"), nd.alias("p50"), nd.alias("p75"), nd.alias("p90"),
        nb.alias("n_users"), nb.alias("n_events"),
        nt.alias("first_ts"), nt.alias("last_ts"),
        F.lit(None).cast("boolean").alias("approx_within_5pct"),
        nb.alias("n_docs"), nb.alias("n_tokens"),
        nd.alias("dup_doc_rate"), nd.alias("mean_quality"),
        nd.alias("quality_pass_rate"), nd.alias("empty_doc_rate"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n_, 6).alias("intercept"),
        F.round(corr * corr, 6).alias("r2"),
        F.round(corr, 6).alias("corr"),
    )
    pad = [
        F.lit(None).cast("bigint").alias("n_docs"),
        F.lit(None).cast("bigint").alias("n_tokens"),
        F.lit(None).cast("double").alias("dup_doc_rate"),
        F.lit(None).cast("double").alias("mean_quality"),
        F.lit(None).cast("double").alias("quality_pass_rate"),
        F.lit(None).cast("double").alias("empty_doc_rate"),
    ]
    rpad = [
        F.lit(None).cast("double").alias(c)
        for c in ("slope", "intercept", "r2", "corr")
    ]
    return (
        pctl_leg.select("*", *pad, *rpad)
        .unionByName(distinct_leg.select("*", *pad, *rpad))
        .unionByName(profile_leg.select("*", *rpad))
        .unionByName(regr_leg)
    )


def _oracle_percentiles_sql() -> str:
    from transitlog_hfp_sink_spark.queries.ml import (
        _SW_ARR,
        SQL_NORM,
        sql_quality_case,
    )

    norm = SQL_NORM.format(c="text")
    awl = "CAST(list_sum(list_transform(words, w -> length(w))) AS DOUBLE) / len(words)"
    swr = (
        f"CAST(len(list_filter(words, w -> list_contains({_SW_ARR}, w))) AS DOUBLE)"
        " / len(words)"
    )
    pad = """
  CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS BIGINT) AS n_tokens,
  CAST(NULL AS DOUBLE) AS dup_doc_rate, CAST(NULL AS DOUBLE) AS mean_quality,
  CAST(NULL AS DOUBLE) AS quality_pass_rate, CAST(NULL AS DOUBLE) AS empty_doc_rate"""
    rpad = """
  CAST(NULL AS DOUBLE) AS slope, CAST(NULL AS DOUBLE) AS intercept,
  CAST(NULL AS DOUBLE) AS r2, CAST(NULL AS DOUBLE) AS corr"""
    return f"""
WITH pdoc AS (
  SELECT source,
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt,
    md5({norm}) AS fp,
    string_split({norm}, ' ') AS words,
    CASE WHEN length(text) > 0
         THEN CAST(length(regexp_replace(text, '[A-Za-z0-9 \\t\\n\\r]', '', 'g')) AS DOUBLE) / length(text)
         ELSE CAST(0.0 AS DOUBLE) END AS pr
  FROM documents
),
pq AS (
  SELECT source, nt, fp,
    {sql_quality_case('nt', awl, swr, 'pr')} AS q
  FROM pdoc
)
SELECT 'pctl' AS part, o_orderpriority AS grp,
  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
  round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
  round(quantile_cont(o_totalprice, 0.90), 4) AS p90,
  CAST(NULL AS BIGINT) AS n_users, CAST(NULL AS BIGINT) AS n_events,
  CAST(NULL AS TIMESTAMP) AS first_ts, CAST(NULL AS TIMESTAMP) AS last_ts,
  CAST(NULL AS BOOLEAN) AS approx_within_5pct,{pad},{rpad}
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT 'distinct' AS part, event_type AS grp,
  CAST(NULL AS DOUBLE) AS p25, CAST(NULL AS DOUBLE) AS p50,
  CAST(NULL AS DOUBLE) AS p75, CAST(NULL AS DOUBLE) AS p90,
  count(DISTINCT user_id) AS n_users, count(*) AS n_events,
  min(ts) AS first_ts, max(ts) AS last_ts,
  TRUE AS approx_within_5pct,{pad},{rpad}
FROM events GROUP BY event_type
UNION ALL
SELECT 'profile' AS part, source AS grp,
  CAST(NULL AS DOUBLE) AS p25,
  round(CAST(quantile_cont(nt, 0.50) AS DOUBLE), 4) AS p50,
  CAST(NULL AS DOUBLE) AS p75,
  round(CAST(quantile_cont(nt, 0.90) AS DOUBLE), 4) AS p90,
  CAST(NULL AS BIGINT) AS n_users, CAST(NULL AS BIGINT) AS n_events,
  CAST(NULL AS TIMESTAMP) AS first_ts, CAST(NULL AS TIMESTAMP) AS last_ts,
  CAST(NULL AS BOOLEAN) AS approx_within_5pct,
  count(*) AS n_docs,
  CAST(sum(nt) AS BIGINT) AS n_tokens,
  round(1.0 - CAST(count(DISTINCT fp) AS DOUBLE) / count(*), 6) AS dup_doc_rate,
  round(CAST(sum(CAST(q AS DECIMAL(20,4))) / count(*) AS DOUBLE), 4) AS mean_quality,
  round(CAST(sum(CASE WHEN q >= 0.5 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS quality_pass_rate,
  round(CAST(sum(CASE WHEN nt = 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS empty_doc_rate,{rpad}
FROM pq GROUP BY source
UNION ALL
SELECT 'regr' AS part, grp,
  CAST(NULL AS DOUBLE) AS p25, CAST(NULL AS DOUBLE) AS p50,
  CAST(NULL AS DOUBLE) AS p75, CAST(NULL AS DOUBLE) AS p90,
  CAST(NULL AS BIGINT) AS n_users, CAST(NULL AS BIGINT) AS n_events,
  CAST(NULL AS TIMESTAMP) AS first_ts, CAST(NULL AS TIMESTAMP) AS last_ts,
  CAST(NULL AS BOOLEAN) AS approx_within_5pct,{pad},
  round((nd * sxy - sx * sy) / (nd * sxx - sx * sx), 6) AS slope,
  round((sy - ((nd * sxy - sx * sy) / (nd * sxx - sx * sx)) * sx) / nd, 6)
    AS intercept,
  round(((nd * sxy - sx * sy)
         / sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)))
        * ((nd * sxy - sx * sy)
           / sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy))), 6) AS r2,
  round((nd * sxy - sx * sy)
        / sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 6) AS corr
FROM (
  -- DECIMAL(19,6) forces DuckDB's int128 storage class (a (18,6)
  -- operand pair multiplies in int64 and overflows); the VALUES are
  -- identical to Spark's (18,6) sums, and (19,6)x(19,6) -> (38,12)
  -- stays exact in-range
  SELECT l_returnflag AS grp, CAST(count(*) AS DOUBLE) AS nd,
    CAST(sum(CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS sx,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS sy,
    CAST(sum(CAST(l_quantity AS DECIMAL(19,6))
             * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
    CAST(sum(CAST(l_quantity AS DECIMAL(19,6))
             * CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(19,6))
             * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY 1
) m
"""


ORACLE_PERCENTILES = _oracle_percentiles_sql()

_EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per user-decile, event counts by type as columns."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.withColumn("user_decile", (F.col("user_id") % 10).cast("int"))
        .groupBy("user_decile")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )


_PIVOT_COLS = ",\n  ".join(
    f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS {t}" for t in _EVENT_TYPES
)

ORACLE_PIVOT = f"""
SELECT CAST(user_id % 10 AS INTEGER) AS user_decile,
  {_PIVOT_COLS}
FROM events GROUP BY 1
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, user_decile): all 4 grouping-set combos."""
    ev = read_table(spark, sf_dir, "events")
    # value goes through the engine-agnostic picounits law
    # floor(value*1e12 + 0.5) instead of a double->decimal(30,12) cast:
    # the sf1 sweep caught the grand-total row (1M inputs) accumulating
    # the cast's HALF_UP-vs-HALF_EVEN tie bias past the double-repr
    # threshold. floor/multiply/add are single IEEE ops identical on
    # both engines; value*1e12 < 2^53 stays exact; the bigint sum is
    # exact; the final /1e12 rounds once, deterministically.
    micro = F.floor(F.col("value") * F.lit(1e12) + F.lit(0.5)).cast("decimal(20,0)")
    return (
        ev.withColumn("user_decile", (F.col("user_id") % 10).cast("int"))
        .cube("event_type", "user_decile")
        .agg(
            F.count("*").alias("n"),
            F.sum(micro).alias("__sv"),
        )
        # two-piece double assembly: the picounit total passes 2^53 at
        # scale, where a direct wide-integer->double conversion is not
        # correctly rounded in every engine; DIV/% pieces are exactly
        # representable and the one divide + one add round identically
        .withColumn(
            "sum_value",
            F.expr(
                "CAST(__sv DIV 1000000000000 AS DOUBLE)"
                " + CAST(__sv % 1000000000000 AS DOUBLE) / 1e12"
            ),
        )
        .select("event_type", "user_decile", "n", "sum_value")
    )


ORACLE_CUBE = """
SELECT event_type, CAST(user_id % 10 AS INTEGER) AS user_decile, count(*) AS n,
  -- picounits law + two-piece assembly, mirroring the Spark twin
  CAST(sum(CAST(floor(value * 1e12 + 0.5) AS BIGINT)) // 1000000000000
       AS DOUBLE)
  + CAST(sum(CAST(floor(value * 1e12 + 0.5) AS BIGINT)) % 1000000000000
         AS DOUBLE) / 1e12 AS sum_value
FROM events
GROUP BY CUBE (event_type, (CAST(user_id % 10 AS INTEGER)))
"""


def q_moving_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per user, events + value-sum in the trailing
    hour (event-time range frame over unix seconds)."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.count("*").over(w).alias("n_trailing_1h"),
        F.sum(F.col("value").cast("decimal(30,12)")).over(w).cast("double").alias(
            "sum_trailing_1h"
        ),
    )




def q_udtf_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-frequency surface, tagged union (round 3 adds the sketch):

    part='udtf' — Python UDTF via LATERAL join (functions/udfs.py):
                  per-document word histogram. The UDTF is the genuine
                  table-function API (not an explode rewrite) — the
                  oracle is DuckDB unnest + GROUP BY, proving the Python
                  surface agrees with the relational semantics.
    part='cms'  — count-min-sketch heavy hitters (operators/sketch.py):
                  global words whose 4x2048 md5-bucketed CMS estimate
                  reaches 50 (doc_id NULL, n = the estimate). The full
                  sketch build + probe + min-over-seeds is replayed in
                  SQL, so every counter and estimate is
                  value-hash-checked; the est>=true guarantee and
                  collision behavior live in tests/test_sketch.py."""
    from transitlog_hfp_sink_spark.functions.udfs import register_udtfs
    from transitlog_hfp_sink_spark.operators.sketch import heavy_hitters

    register_udtfs(spark)
    docs = read_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents_udtf_v")
    udtf_leg = spark.sql(
        """
        SELECT d.doc_id, w.word, w.n
        FROM documents_udtf_v d, LATERAL word_counts(d.text) w
        """
    ).select(F.lit("udtf").alias("part"), "doc_id", "word", F.col("n").cast("bigint"))
    words = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
    ).where(F.col("word") != "")
    cms_leg = heavy_hitters(words, "word", min_count=50, depth=4, width=2048).select(
        F.lit("cms").alias("part"),
        F.lit(None).cast("bigint").alias("doc_id"),
        "word",
        F.col("est").alias("n"),
    )
    return udtf_leg.unionByName(cms_leg)


ORACLE_UDTF_WORDS = """
WITH cms_wz AS (
  SELECT word FROM (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word FROM documents
  ) WHERE word <> ''
),
cms_cells AS (
  SELECT word, seed,
    CAST(('0x' || substr(md5('cms' || CAST(seed AS VARCHAR) || ':' || word), 1, 8))::BIGINT
         % 2048 AS INTEGER) AS bucket
  FROM cms_wz CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS seed)
),
cms_grid AS (
  SELECT seed, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM cms_cells GROUP BY 1, 2
),
cms_probe AS (SELECT DISTINCT word, seed, bucket FROM cms_cells),
cms_est AS (
  SELECT word, min(cnt) AS est
  FROM cms_probe JOIN cms_grid USING (seed, bucket)
  GROUP BY 1
)
SELECT 'udtf' AS part, doc_id, word, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
  FROM documents
)
WHERE word <> ''
GROUP BY doc_id, word
UNION ALL
SELECT 'cms' AS part, CAST(NULL AS BIGINT) AS doc_id, word, est AS n
FROM cms_est WHERE est >= 50
"""


def q_zorder_clustered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering evidence (plans/zorder.py; SURVEY §2.5 Q3 —
    the reference's multi-column btrees, `run/init.sql`, served here by
    Morton-interleaved parquet layout). Clusters events by the z-key of
    (value, user_id) into a temp parquet, then answers a 2-D range
    predicate FROM THE CLUSTERED COPY, re-deriving each row's z-key.
    Hash-green vs the raw-table oracle (which re-implements rank16 +
    bit-interleave in SQL) proves the rewrite is lossless AND the Morton
    math agrees bit-for-bit cross-engine; file-level min/max tightening
    is asserted in tests/test_zorder.py."""
    import tempfile

    from transitlog_hfp_sink_spark.plans.zorder import (
        _rank16,
        write_zordered,
        zorder_key,
    )

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    path = tempfile.mkdtemp(prefix="spark_graft_zorder_") + "/events_z"
    write_zordered(ev, path, "value", "user_id", n_files=8)
    z = spark.read.parquet(path)
    b = ev.agg(
        F.min("value").alias("v_lo"), F.max("value").alias("v_hi"),
        F.min("user_id").alias("u_lo"), F.max("user_id").alias("u_hi"),
    ).first()
    ra = _rank16(F.col("value"), F.lit(b["v_lo"]), F.lit(b["v_hi"]))
    rb = _rank16(F.col("user_id"), F.lit(b["u_lo"]), F.lit(b["u_hi"]))
    return (
        z.where(
            (F.col("value") >= 50.0)
            & (F.col("value") < 150.0)
            & (F.col("user_id") <= 10)
        )
        .select(
            "event_id", "user_id", "event_type", "ts", "value",
            zorder_key(ra, rb).alias("z_key"),
        )
    )


def _morton_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB bit-interleave matching plans.zorder.zorder_key exactly."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


# rank16 twin of plans.zorder._rank16: scale into [0, 65535] given global
# lo/hi. trunc() before the BIGINT cast — DuckDB CAST(DOUBLE AS BIGINT)
# rounds half-to-even while Spark's cast truncates toward zero.
def _rank16_sql(col: str, lo: str, hi: str) -> str:
    return (
        f"least(65535, greatest(0, CAST(trunc("
        f"(CAST({col} AS DOUBLE) - {lo}) / "
        f"(CASE WHEN {hi} > {lo} THEN {hi} - {lo} ELSE 1 END) * 65535"
        f") AS BIGINT)))"
    )


ORACLE_ZORDER = f"""
WITH b AS (
  SELECT min(value) AS v_lo, max(value) AS v_hi,
         min(user_id) AS u_lo, max(user_id) AS u_hi
  FROM events
),
r AS (
  SELECT event_id, user_id, event_type, ts, value,
         {_rank16_sql("value", "b.v_lo", "b.v_hi")} AS ra,
         {_rank16_sql("user_id", "b.u_lo", "b.u_hi")} AS rb
  FROM events, b
  WHERE value >= 50.0 AND value < 150.0 AND user_id <= 10
)
SELECT event_id, user_id, event_type, ts, value,
       {_morton_sql("ra", "rb")} AS z_key
FROM r
"""


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed MERGE into a partitioned parquet store (sinks/merge.py) —
    new driver row (round-2 directive #6; previously test-only). Runs
    the REAL file-based upsert: seed a store from orders (keys not
    divisible by 5, partitioned by order year), then merge an update
    batch carrying (a) two conflicting versions per updated key —
    greatest version must win, (b) brand-new keys. Returns the final
    store content; the oracle states the INSERT .. ON CONFLICT DO
    UPDATE outcome declaratively (winner-per-key CTE + anti-join +
    union), so the hash checks conflict resolution, partition-pruned
    rewrite, and read-back fidelity."""
    import tempfile

    from transitlog_hfp_sink_spark.sinks.merge import upsert_partitioned

    orders = read_table(spark, sf_dir, "orders")
    o_year = F.year("o_orderdate").cast("int").alias("o_year")
    base = orders.where(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey", o_year, "o_totalprice", F.lit(0).alias("version")
    )
    upd_src = orders.where(
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 5 != 0)
    )
    v1 = upd_src.select(
        "o_orderkey", o_year,
        (F.col("o_totalprice") + 100.0).alias("o_totalprice"),
        F.lit(1).alias("version"),
    )
    v2 = upd_src.select(
        "o_orderkey", o_year,
        (F.col("o_totalprice") + 200.0).alias("o_totalprice"),
        F.lit(2).alias("version"),
    )
    new = orders.where(
        (F.col("o_orderkey") % 5 == 0) & (F.col("o_orderkey") % 3 == 0)
    ).select("o_orderkey", o_year, "o_totalprice", F.lit(3).alias("version"))

    path = tempfile.mkdtemp(prefix="spark_graft_merge_") + "/orders_store"
    base.write.partitionBy("o_year").parquet(path)
    upsert_partitioned(
        spark,
        path,
        v1.unionByName(v2).unionByName(new),
        key_cols=["o_orderkey"],
        partition_cols=["o_year"],
        version_col="version",
    )
    return spark.read.parquet(path).select(
        "o_orderkey",
        F.col("o_year").cast("int").alias("o_year"),
        "o_totalprice",
        "version",
    )


ORACLE_MERGE = """
WITH base AS (
  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         o_totalprice, 0 AS version
  FROM orders WHERE o_orderkey % 5 <> 0
),
upd AS (
  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         o_totalprice + 100.0 AS o_totalprice, 1 AS version
  FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 5 <> 0
  UNION ALL
  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         o_totalprice + 200.0 AS o_totalprice, 2 AS version
  FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 5 <> 0
  UNION ALL
  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         o_totalprice, 3 AS version
  FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey % 3 = 0
),
win AS (
  SELECT o_orderkey, o_year, o_totalprice, version FROM (
    SELECT *, row_number() OVER (
      PARTITION BY o_orderkey ORDER BY version DESC, o_orderkey
    ) AS rn FROM upd
  ) WHERE rn = 1
)
SELECT o_orderkey, o_year, o_totalprice, version FROM base
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM win)
UNION ALL
SELECT o_orderkey, o_year, o_totalprice, version FROM win
"""


# Registry consolidation (round 2): cube_events merged into relational's
# rollup_cube_grouping; window_moving_1h merged into timeseries'
# window_frames; approx_distinct_users merged into distinct_counts (its
# slot now carries zorder_clustered_scan). Round 3: distinct_counts
# merged into percentiles_orders and anti_join_customers into
# relational's set_ops_customers, freeing the 50-entry driver budget for
# merge_upsert_store here and resample_trajectory (timeseries.py). The
# standalone callables (q_cube, q_moving_window, q_approx_distinct,
# q_anti_join, q_distinct_counts) stay importable.
QUERIES = {
    "udtf_word_counts": q_udtf_word_counts,
    "scalar_functions": q_scalar_functions,
    "merge_upsert_store": q_merge_upsert,
    "zorder_clustered_scan": q_zorder_clustered_scan,
    "percentiles_orders": q_percentiles,
    "pivot_event_counts": q_pivot,
}

ORACLES = {
    "udtf_word_counts": ORACLE_UDTF_WORDS,
    "scalar_functions": ORACLE_SCALAR,
    "merge_upsert_store": ORACLE_MERGE,
    "zorder_clustered_scan": ORACLE_ZORDER,
    "percentiles_orders": ORACLE_PERCENTILES,
    "pivot_event_counts": ORACLE_PIVOT,
}
