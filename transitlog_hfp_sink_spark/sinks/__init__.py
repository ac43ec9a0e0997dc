"""Sinks: partitioned parquet (analytics tier) + JDBC (reference parity)."""

from transitlog_hfp_sink_spark.sinks.parquet import write_vehicles_parquet
from transitlog_hfp_sink_spark.sinks.jdbc import JdbcVehiclesSink

__all__ = ["write_vehicles_parquet", "JdbcVehiclesSink"]
