"""Analytics operators.

Two groups:

1. The query workload the reference's data model exists to serve (SURVEY
   §2.5-2.6): time rollups, as-of / range joins for trajectory and schedule
   enrichment, sessionization, windowed rankings — all compositions of
   built-in DataFrame ops so Catalyst plans them.

2. Large-scale training-data-pipeline operators (BASELINE.json north star):
   dedup family (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
   cosine), similarity search (brute-force + LSH-bucketed ANN), text
   analysis (language-ID, quality, tokens, fingerprints), multimodal
   binary-column plumbing.

Every operator documents its shuffle/partitioning behavior at 100 TB.
"""

from transitlog_hfp_sink_spark.operators.asof import asof_join
from transitlog_hfp_sink_spark.operators.range_join import range_join
from transitlog_hfp_sink_spark.operators.sessionize import sessionize
from transitlog_hfp_sink_spark.operators.rollup import time_bucket, hourly_rollup

__all__ = ["asof_join", "range_join", "sessionize", "time_bucket", "hourly_rollup"]
