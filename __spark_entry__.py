"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query at sf0.001 (smoke check).
queries()      — one callable per implemented operator (SURVEY.md §2 +
                 north-star extensions), (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB-equivalent SQL per query. ALL 50 entries carry a
                 value-hash oracle (sketches run a portable hash_fn="md5"
                 mode; SRP planes are SQL array literals). The genuinely
                 approximate embedding_topk_ivf (nprobe<n_lists) is
                 bench-only: its machinery is hash-checked via the IVF
                 full-probe leg of embedding_topk_exact and its recall is
                 asserted in tests/test_similarity.py.

No registry output column is a wide decimal: digest/checksum columns are
BIGINT sums of 32-bit md5 terms (magnitude << 2**53), so values survive
every arrow/pandas conversion path exactly on both engines.
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
