"""User-defined function surface (SURVEY §2.6 gap list).

The engine's rule is built-ins first — every hot-path operator in this
repo is pure Catalyst expressions. This module is the EXTENSION surface
for logic that genuinely cannot be expressed with built-ins: Arrow-batched
pandas UDFs (scalar + grouped-aggregate), registered for both DataFrame
and spark.sql use. Row-at-a-time Python UDFs are deliberately not offered.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def haversine_km(
    lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series
) -> pd.Series:
    """Great-circle distance in km — scalar pandas UDF (Arrow-batched;
    the trig has no exact Catalyst composition that is also readable).
    Vectorized numpy math: per-BATCH Python cost, not per-row.
    Inputs are coerced to float64: SQL numeric literals arrive as
    DECIMAL (object-dtype Decimal series), which numpy ufuncs reject —
    a real pitfall for spark.sql callers of a registered UDF."""
    import numpy as np

    lat1, lon1, lat2, lon2 = (
        s.astype("float64") for s in (lat1, lon1, lat2, lon2)
    )
    rlat1, rlat2 = np.radians(lat1), np.radians(lat2)
    dlat = rlat2 - rlat1
    dlon = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dlat / 2.0) ** 2 + np.cos(rlat1) * np.cos(rlat2) * np.sin(dlon / 2.0) ** 2
    return pd.Series(2.0 * 6371.0088 * np.arcsin(np.sqrt(a)))


@pandas_udf(DoubleType())
def geometric_mean(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (UDAF surface): exp(mean(log x)) over
    positive values — not expressible as a single built-in aggregate."""
    import numpy as np

    x = v[v > 0]
    if len(x) == 0:
        return float("nan")
    return float(math.exp(np.log(x).mean()))


def register_udfs(spark: SparkSession) -> None:
    """Expose the UDFs to spark.sql (SQL-surface parity)."""
    spark.udf.register("haversine_km", haversine_km)
    spark.udf.register("geometric_mean", geometric_mean)


def make_word_counts_udtf():
    """Python UDTF (table function) surface: per-document word histogram,
    consumed via LATERAL join in spark.sql. Arrow-batched where the
    runtime supports it. Built lazily (decorator needs no session, but
    keeping construction in a factory mirrors the lazy-lit rule used
    across the query modules)."""
    import re
    from collections import Counter

    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, n: bigint")
    class WordCounts:
        def eval(self, text: str):
            if text is None:
                return
            for w, c in Counter(re.split(r"\s+", text.strip())).items():
                if w:
                    yield w, int(c)

    return WordCounts


def register_udtfs(spark: SparkSession) -> None:
    spark.udtf.register("word_counts", make_word_counts_udtf())
