"""Sort / limit / top-k: global sort, limit, per-group top-k.

Spark's global ``orderBy().limit(k)`` compiles to TakeOrderedAndProject —
each partition keeps its local top-k, the driver merges k·P rows; no full
sort ever materializes.  Per-group top-k is the row_number()-filter
pattern: one shuffle on the group key, heap-bounded per group under AQE.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load


@register(
    "sort_global_limit",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tags=("sort", "limit"),
)
def sort_global_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "sort_multi_key",
    oracle="""
    SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 2) AS acctbal
    FROM supplier
    ORDER BY s_nationkey ASC, acctbal DESC, s_suppkey ASC
    """,
    tags=("sort",),
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey", "s_nationkey", F.round("s_acctbal", 2).alias("acctbal")
    ).orderBy(F.asc("s_nationkey"), F.desc("acctbal"), F.asc("s_suppkey"))


@register(
    "topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    )
    SELECT c_custkey, c_mktsegment, ROUND(c_acctbal, 2) AS acctbal, rn
    FROM ranked
    WHERE rn <= 3
    ORDER BY c_mktsegment, rn
    """,
    tags=("topk", "window"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per market segment."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 3)
        .select(
            "c_custkey",
            "c_mktsegment",
            F.round("c_acctbal", 2).alias("acctbal"),
            "rn",
        )
        .orderBy("c_mktsegment", "rn")
    )


@register(
    "topk_max_by_group",
    oracle="""
    -- (ts, event_id) composite ordering: MAX_BY over a bare ts picks an
    -- ARBITRARY row among tied timestamps and the engines disagree
    -- (caught by the ties-fixture sweep); event_id totalizes the order
    SELECT user_id, MAX({'t': ts, 'e': event_id}).e AS latest_event_id,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("topk", "agg"),
)
def topk_max_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-event-per-key via max_by — shuffle-light alternative to the
    window formulation (partial aggregation halves the shuffled volume);
    this is exactly the CDC compaction primitive (SURVEY §2.1).  The
    ordering key is the COMPOSITE (ts, event_id): with a bare ts,
    max_by picks an arbitrary row among tied timestamps — Kafka-style
    same-millisecond events made Spark and DuckDB disagree on the
    ties-fixture sweep (the CDC path itself was never exposed: its
    ORDER_COL offset is unique by construction)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by("event_id", F.struct("ts", "event_id")).alias("latest_event_id"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )
