"""Streaming semantics: CDC pipeline, event-time windows, watermarks,
stateful dedup — plus their batch-equivalent registered queries."""

from mysql_postgres_debezium_cdc_spark.streaming import (  # noqa: F401
    cdc_queries,
    event_windows,
)
