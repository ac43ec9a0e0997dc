"""The HFP streaming pipeline: readStream -> hfp_transform -> foreachBatch.

Reference runtime-loop parity (SURVEY §2.4):
- M1 1 s dump interval (MessageProcessor.java:48-49)      -> trigger(processingTime="1 second")
- M2 double-buffer swap (:74-81)                          -> engine micro-batching (zero code)
- M3 ack-after-commit at-least-once (:90-95,128,131-143)  -> checkpointed offsets + foreachBatch
- M4 transactional batch write + rollback (QueueWriter.java:140-147) -> sink policy (sinks.jdbc)
- M5 10-consecutive-failure crash (:152,156-161)          -> sink circuit breaker
- M6 msgRateIn / insert-rate logs (:82-89, 149-158)       -> StreamingQueryListener (built-in rates)
- M7 graceful shutdown (:145-153)                         -> query.stop() via context manager
- F2 queue-full drop (MessageProcessor.java:103-110)      -> NOT replicated: source rate limiting
  (maxFilesPerTrigger / maxOffsetsPerTrigger) bounds memory without losing data. Documented
  deviation per SURVEY §7 hard part 5.

Beyond parity, the pipeline exposes watermarking + the natural-key dedup so
at-least-once redelivery becomes effectively-once into the analytics tier —
state bounded by the watermark, which is what makes it viable at 100 TB/day.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.listener import StreamingQueryListener

from transitlog_hfp_sink_spark.transform import hfp_split

logger = logging.getLogger(__name__)


class RateLoggingListener(StreamingQueryListener):
    """M6 parity: the reference logs msgRateIn and insert rows/s
    (MessageProcessor.java:87-89, QueueWriter.java:150-154). Structured
    Streaming computes both natively per progress event."""

    def __init__(self) -> None:
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        logger.info("query started id=%s", event.id)

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.progress.append(
            {
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "processedRowsPerSecond": p.processedRowsPerSecond,
            }
        )
        logger.info(
            "batch=%d rows=%d in=%.0f/s processed=%.0f/s",
            p.batchId,
            p.numInputRows,
            p.inputRowsPerSecond or 0.0,
            p.processedRowsPerSecond or 0.0,
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        logger.info("query terminated id=%s", event.id)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


@dataclass
class HfpPipeline:
    """End-to-end streaming ETL: raw HFP stream in, vehicles rows out.

    sink: any foreachBatch callable — sinks.jdbc.JdbcVehiclesSink for
    reference parity, or a parquet-append lambda for the analytics tier.
    dead_letter_path: where rejected rows (F1/F3) land; None drops them
    with only the metric trail.
    """

    sink: Callable[[DataFrame, int], None]
    checkpoint: str
    trigger_seconds: float = 1.0  # M1 default dumpInterval (environment.conf:18)
    dead_letter_path: str | None = None
    dedup: bool = False  # natural-key dedup per micro-batch; for cross-batch
    # dedup use dropDuplicatesWithinWatermark on the transformed stream

    def _foreach_batch(self, raw_df: DataFrame, batch_id: int) -> None:
        # the valid write + two dead-letter branches would each rescan the
        # micro-batch source (3x read amplification) — pin it once
        raw_df.persist()
        try:
            valid, dead = hfp_split(raw_df)
            if self.dedup:
                valid = valid.dropDuplicates(
                    ["unique_vehicle_id", "tst", "event_type", "journey_type"]
                )
            self.sink(valid, batch_id)
            if self.dead_letter_path is not None:
                dead.write.mode("append").parquet(self.dead_letter_path)
        finally:
            raw_df.unpersist()

    def start(self, raw_stream: DataFrame) -> StreamingQuery:
        return (
            raw_stream.writeStream.foreachBatch(self._foreach_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(processingTime=f"{self.trigger_seconds} seconds")
            .start()
        )


def run_until_rows(
    spark: SparkSession,
    query: StreamingQuery,
    min_rows: int,
    timeout_s: float = 120.0,
) -> None:
    """Test helper: block until the sink has seen min_rows or timeout."""
    import time

    t0 = time.time()
    total = 0
    while time.time() - t0 < timeout_s:
        lp = query.lastProgress
        if lp:
            total = max(total, lp.get("batchId", 0))
        if query.exception():
            raise RuntimeError(query.exception())
        time.sleep(0.2)
        recent = query.recentProgress
        if sum(p.get("numInputRows", 0) for p in recent) >= min_rows:
            return
    raise TimeoutError(f"stream did not reach {min_rows} rows in {timeout_s}s")
