"""Plan inspection utilities — keep the physical plan honest at scale."""

from transitlog_hfp_sink_spark.plans.inspect import (
    explain_str,
    has_python_eval,
    pushed_filters,
    uses_broadcast_join,
)

__all__ = ["explain_str", "has_python_eval", "pushed_filters", "uses_broadcast_join"]
