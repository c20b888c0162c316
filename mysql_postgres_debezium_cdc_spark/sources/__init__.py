"""Sources: fixture parquet loader, Debezium envelope, Kafka CDC source,
JSON-lines/CSV text formats."""

from mysql_postgres_debezium_cdc_spark.sources import (  # noqa: F401  (registers queries)
    binary_files,
    parquet,
    text_formats,
)
from mysql_postgres_debezium_cdc_spark.sources.parquet import TABLES, load

__all__ = ["TABLES", "load"]
