"""transitlog_hfp_sink_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of HSLdevcom/transitlog-hfp-sink.

The reference (/root/reference) is a Java streaming ETL app: Pulsar protobuf
HFP vehicle telemetry -> 40-column flatten -> batched JDBC insert into a
TimescaleDB hypertable (see SURVEY.md). This package re-expresses that
dataflow Spark-first:

- ``schema``     : canonical StructTypes + enum domains (init.sql:21-68)
- ``transform``  : the 40-column HFP flatten as a pure DataFrame function
                   (QueueWriter.java:57-137) usable in batch AND streaming
- ``sources``    : batch/streaming readers (file, rate-synthetic, kafka/pulsar
                   pluggable)
- ``sinks``      : partitioned parquet (hypertable-equivalent layout,
                   init.sql:70-73) and JDBC writer with circuit breaker
                   (QueueWriter.java:140-161)
- ``streaming``  : Structured Streaming pipeline wrapper (MessageProcessor's
                   1 s dump loop -> processingTime trigger + foreachBatch)
- ``operators``  : the analytics surface the sink's data model exists to
                   serve (time rollups, as-of/range joins, sessionization)
                   plus large-scale training-data-pipeline ops (dedup
                   family, similarity search, text analysis, multimodal)
- ``functions``  : scalar helpers (safe time-of-day parse, enum validation)
                   with try_cast null-on-malformed semantics
- ``plans``      : partitioning/plan-inspection utilities for 100 TB scale

Everything is DataFrame/Catalyst-native; Python UDFs appear only as
Arrow-batched pandas UDFs where built-ins cannot express the semantics.
"""

__version__ = "0.1.0"
