"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query at sf0.001 (smoke check).
queries()      — one callable per implemented operator (SURVEY.md §2 +
                 north-star extensions), (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB-equivalent SQL per query; approximate/sketch
                 operators (MinHash/SimHash/SRP-LSH) are intentionally
                 omitted -> rows-only check; their recall is asserted
                 against exact ground truth in tests/test_dedup.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthetic HFP stream -> engine transform -> ongoing VP
    events per route/oday (the downstream query the reference's hypertable
    layout serves)."""
    from transitlog_hfp_sink_spark.queries.hfp import q_hfp_vp_per_route

    return q_hfp_vp_per_route(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from transitlog_hfp_sink_spark.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from transitlog_hfp_sink_spark.queries import oracle_sql as _o

    return _o()
