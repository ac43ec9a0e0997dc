"""functions/units.py — the integer-units aggregation law (round 12).

The log-score family sums decimal(20,s)-cast doubles; the units form
must be VALUE-IDENTICAL (these sums feed oracle-hash-checked outputs):
per-row units are exact integers of the already-rounded decimal, the
bigint sum is exact, and the reconversion divide must not hit Spark's
decimal-division precision-loss rounding (the naive decimal(38,0)/10^s
form silently rounds the quotient to 6 decimals — a real divergence
caught while building the law).
"""

import random

import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.functions.units import dec_units, units_double


@pytest.mark.parametrize("scale", [4, 8, 10, 12])
def test_units_sum_equals_decimal_sum_bitwise(spark, scale):
    rng = random.Random(137 + scale)
    # signed, magnitude-diverse doubles including near-tie 10^-s values
    rows = [
        (i % 37, rng.uniform(-50, 50) * (10 ** rng.randint(-scale, 1)))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "g int, x double")
    dec = F.col("x").cast(f"decimal(20,{scale})")
    ref = df.groupBy("g").agg(
        F.sum(dec).cast("double").alias("s"), F.count("*").alias("n")
    )
    got = df.groupBy("g").agg(
        units_double(F.sum(dec_units(dec, scale)), scale).alias("s"),
        F.count("*").alias("n"),
    )
    import struct

    def canon(frame):
        return sorted(
            (r["g"], r["n"], struct.pack(">d", r["s"]).hex()) for r in frame.collect()
        )

    assert canon(ref) == canon(got)


def test_units_null_propagation(spark):
    df = spark.createDataFrame(
        [(0, 1.5), (0, None), (1, None)], "g int, x double"
    )
    dec = F.col("x").cast("decimal(20,10)")
    got = {
        r["g"]: (r["s"], r["n"])
        for r in df.groupBy("g")
        .agg(
            units_double(F.sum(dec_units(dec, 10)), 10).alias("s"),
            F.count(dec_units(dec, 10)).alias("n"),
        )
        .collect()
    }
    # sum over only-NULL group is NULL (matches F.sum(dec)); count of
    # units counts exactly the non-NULL inputs
    assert got[0] == (1.5, 1)
    assert got[1] == (None, 0)


def test_bigram_hash_keys_collision_free_on_testdata(spark, sf_dir):
    """The xxhash64 join keys in bigram_score_from_bigrams merge counts
    on a 64-bit collision; assert the test corpus vocabulary has none
    (the library docstring documents the ~n^2/2^65 stance at scale)."""
    from transitlog_hfp_sink_spark.operators.lm import (
        _doc_bigrams,
        bigram_tables_from_bigrams,
    )
    from transitlog_hfp_sink_spark.sources.files import read_table

    docs = read_table(spark, sf_dir, "documents")
    bi = _doc_bigrams(docs, "text", "doc_id")
    pairs, hist = bigram_tables_from_bigrams(bi)
    n_pairs = pairs.count()
    n_pairs_h = pairs.select(F.xxhash64("prev", "term")).distinct().count()
    n_hist = hist.count()
    n_hist_h = hist.select(F.xxhash64("prev")).distinct().count()
    assert n_pairs == n_pairs_h
    assert n_hist == n_hist_h
