"""Structured Streaming layer — the reference's runtime loop, Spark-native."""

from transitlog_hfp_sink_spark.streaming.pipeline import (
    HfpPipeline,
    RateLoggingListener,
)

__all__ = ["HfpPipeline", "RateLoggingListener"]
