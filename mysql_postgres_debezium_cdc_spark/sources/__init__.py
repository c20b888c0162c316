"""Sources: fixture parquet loader, Debezium envelope, Kafka CDC source."""

from mysql_postgres_debezium_cdc_spark.sources import parquet  # noqa: F401  (registers queries)
from mysql_postgres_debezium_cdc_spark.sources.parquet import TABLES, load

__all__ = ["TABLES", "load"]
