"""Date/time function surface — includes the Debezium epoch-millis decode
(`timestamp_millis`) that the reference relies on for its wire format
(connectors/mysql-source.json:26, time.precision.mode=connect).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load


@register(
    "fn_date_parts",
    oracle="""
    SELECT
      o_orderkey,
      CAST(YEAR(o_orderdate) AS INT)            AS order_year,
      CAST(MONTH(o_orderdate) AS INT)           AS order_month,
      CAST(DAY(o_orderdate) AS INT)             AS order_day,
      CAST(QUARTER(o_orderdate) AS INT)         AS order_quarter,
      CAST(ISODOW(o_orderdate) AS INT)          AS order_dow,
      STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS order_month_start
    FROM orders
    WHERE o_orderkey < 500
    """,
    tags=("function", "date"),
)
def fn_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        # ISO day-of-week (Mon=1..Sun=7): Spark weekday() is Mon=0, DuckDB
        # DAYOFWEEK is Sun=0 — ISODOW is the portable formulation.
        (F.weekday("o_orderdate") + 1).cast("int").alias("order_dow"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "order_month_start"
        ),
    )


@register(
    "fn_date_arithmetic",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      STRFTIME(l_shipdate, '%Y-%m-%d')                       AS ship_date,
      STRFTIME(l_shipdate + INTERVAL 30 DAY, '%Y-%m-%d')     AS due_date,
      DATE_DIFF('day', TIMESTAMP '1995-01-01 00:00:00', l_shipdate) AS days_since_epoch_start,
      STRFTIME(LAST_DAY(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS ship_month_end
    FROM lineitem
    WHERE l_orderkey < 200
    """,
    tags=("function", "date"),
)
def fn_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        F.date_format(F.date_add(F.col("l_shipdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).cast("bigint").alias("days_since_epoch_start"),
        F.date_format(F.last_day(F.col("l_shipdate").cast("date")), "yyyy-MM-dd").alias(
            "ship_month_end"
        ),
    )


@register(
    "fn_epoch_millis_roundtrip",
    oracle="""
    SELECT
      event_id,
      CAST(FLOOR(EPOCH(ts) * 1000) AS BIGINT)       AS ts_millis,
      CAST(FLOOR(EPOCH(ts)) AS BIGINT)              AS ts_seconds,
      STRFTIME(ts, '%Y-%m-%d %H:%M')                AS ts_minute_str
    FROM events
    WHERE event_id < 200
    ORDER BY event_id
    """,
    tags=("function", "date", "cdc"),
)
def fn_epoch_millis_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium wire-format decode: epoch millis ↔ timestamp.

    The reference receives timestamps as epoch-millis int64 (SURVEY §1.3);
    `unix_millis`/`timestamp_millis` are the lossless Spark mapping.
    """
    ev = load(spark, sf_dir, "events").where(F.col("event_id") < 200)
    return ev.select(
        "event_id",
        F.unix_millis(F.col("ts")).alias("ts_millis"),
        F.unix_timestamp(F.col("ts")).alias("ts_seconds"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("ts_minute_str"),
    ).orderBy("event_id")
