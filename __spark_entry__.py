"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``mysql_postgres_debezium_cdc_spark``; this file
only adapts the registry to the driver's contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mysql_postgres_debezium_cdc_spark import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3-style shipping priority) on sf0.001."""
    specs = _registry.all_queries()
    return specs["q3_shipping_priority"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted where the op is
    not SQL-expressible → driver records a rows-only check)."""
    return _registry.oracle_map()
