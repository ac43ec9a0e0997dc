"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query at sf0.001 (smoke check).
queries()      — one callable per implemented operator (SURVEY.md §2 +
                 north-star extensions), (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB-equivalent SQL per query. 49 of the 50 entries
                 carry a value-hash oracle (sketches run a portable
                 hash_fn="md5" mode; SRP planes are SQL array literals);
                 the one omission is embedding_topk_ivf — genuinely
                 approximate nprobe<n_lists search, whose machinery is
                 hash-checked via the IVF full-probe leg of
                 embedding_topk_exact and whose recall is asserted in
                 tests/test_similarity.py.
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
