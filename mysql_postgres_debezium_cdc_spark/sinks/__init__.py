"""Sinks: keyed UPSERT/DELETE writers for materialized CDC replicas."""

from mysql_postgres_debezium_cdc_spark.sinks.dbapi import (  # noqa: F401
    DbapiKeyedSink,
    build_delete_sql,
    build_upsert_sql,
    duckdb_connection_factory,
)
