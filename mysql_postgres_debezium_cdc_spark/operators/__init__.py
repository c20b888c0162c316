"""Batch relational operators, each registered as an oracle-checked query."""

from mysql_postgres_debezium_cdc_spark.operators import (  # noqa: F401
    aggregates,
    behavioral,
    filters,
    graphs,
    joins,
    mining,
    pivots,
    setops,
    stats,
    subqueries,
    topk,
    tpch,
    tpch_extra,
    windows,
)
