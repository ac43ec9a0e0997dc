"""Application entrypoint — Main.java parity (SURVEY §3.1).

Startup path: parse config (env + flags) -> build session -> wire source
-> HfpPipeline(transform + sink) -> start -> awaitTermination. Failure
anywhere logs and stops the query/session (Main.java:31-38 behavior).

Usage::

    python -m transitlog_hfp_sink_spark.app \
        --source /data/hfp-drops --source-format parquet \
        --sink parquet:/data/vehicles \
        --checkpoint /data/ckpt --dead-letter /data/dead \
        [--max-runtime-s 60]

    # JDBC sink (connection string from /run/secrets/db_conn_string or
    # $DB_CONN_STRING, README.md:40-41 parity):
    python -m transitlog_hfp_sink_spark.app --source ... --sink jdbc:vehicles
"""

from __future__ import annotations

import argparse
import logging
import sys

from transitlog_hfp_sink_spark.config import (
    PipelineConfig,
    connection_string_from_file_or_env,
)
from transitlog_hfp_sink_spark.session import build_session
from transitlog_hfp_sink_spark.sinks.jdbc import JdbcVehiclesSink
from transitlog_hfp_sink_spark.sinks.parquet import write_vehicles_parquet
from transitlog_hfp_sink_spark.sources.files import read_hfp_stream
from transitlog_hfp_sink_spark.streaming.pipeline import HfpPipeline, RateLoggingListener

logger = logging.getLogger(__name__)


def make_sink(spec: str):
    """'parquet:<path>' -> partitioned parquet appender; 'jdbc:<table>' ->
    JDBC writer with the secret-resolved connection string."""
    kind, _, arg = spec.partition(":")
    if kind == "parquet":
        def sink(df, batch_id):
            write_vehicles_parquet(df, arg, mode="append")
        return sink
    if kind == "jdbc":
        return JdbcVehiclesSink(url=connection_string_from_file_or_env(), table=arg or "vehicles")
    raise ValueError(f"unknown sink spec: {spec}")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True, help="input dir (file stream) or topic")
    p.add_argument("--source-format", default="parquet",
                   choices=["parquet", "json", "pulsar", "kafka"])
    p.add_argument("--sink", required=True, help="parquet:<path> | jdbc:<table>")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--dead-letter", default=None)
    p.add_argument("--trigger-s", type=float, default=None)
    p.add_argument("--dedup", action="store_true",
                   help="natural-key dedup per batch (at-least-once -> effectively-once)")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--max-runtime-s", type=float, default=None,
                   help="stop after N seconds (tests/bounded runs)")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    cfg = PipelineConfig.from_env(
        **{k: v for k, v in {
            "checkpoint": args.checkpoint,
            "dump_interval_s": args.trigger_s,
        }.items() if v is not None}
    )

    spark = build_session(app_name="hfp-sink")
    listener = RateLoggingListener()
    spark.streams.addListener(listener)
    query = None
    try:
        stream = read_hfp_stream(
            spark, args.source, fmt=args.source_format,
            max_files_per_trigger=args.max_files_per_trigger,
        )
        pipe = HfpPipeline(
            sink=make_sink(args.sink),
            checkpoint=cfg.checkpoint,
            trigger_seconds=cfg.dump_interval_s,
            dead_letter_path=args.dead_letter,
            dedup=args.dedup,
        )
        query = pipe.start(stream)
        logger.info("pipeline started: %s -> %s (trigger=%.1fs)",
                    args.source, args.sink, cfg.dump_interval_s)
        if args.max_runtime_s:
            query.awaitTermination(args.max_runtime_s)
            query.stop()
        else:
            query.awaitTermination()
        return 0
    except Exception:
        logger.exception("pipeline failed")  # Main.java:31-38: log + close
        return 1
    finally:
        if query is not None and query.isActive:
            query.stop()
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
