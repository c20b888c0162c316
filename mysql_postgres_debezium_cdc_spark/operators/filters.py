"""Projection & predicate surface: select, arithmetic, IN/BETWEEN/LIKE,
null-safe equality, CASE.

All predicates here are Catalyst-native expressions — they fold into the
scan (PushedFilters) or into whole-stage codegen; nothing drops to Python.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load


@register(
    "project_arithmetic",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charged,
      CAST(FLOOR(l_extendedprice * 100 / l_quantity) AS BIGINT)  AS unit_price_cents,
      CAST(l_quantity AS BIGINT) % 7                             AS qty_mod7
    FROM lineitem
    WHERE l_orderkey < 1000
    """,
    tags=("projection",),
)
def project_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 2
        ).alias("charged"),
        # floor-of-cents instead of round(quotient, 2): quotients of 2dp
        # prices by integral quantities land on exact decimal halves where
        # engines' double-rounding disagrees; floor over identical IEEE
        # doubles is always engine-consistent.
        F.floor(F.col("l_extendedprice") * 100 / F.col("l_quantity"))
        .cast("bigint")
        .alias("unit_price_cents"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
    )


@register(
    "filter_in_between_like",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, ROUND(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_totalprice BETWEEN 50000 AND 150000
      AND o_orderpriority LIKE '%URGENT'
    """,
    tags=("filter",),
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(50000, 150000)
        & F.col("o_orderpriority").like("%URGENT")
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("totalprice"),
    )


@register(
    "filter_null_safe_eq",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL
    """,
    tags=("filter", "null"),
)
def filter_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM) over a derived NULL."""
    o = load(spark, sf_dir, "orders")
    return o.where(
        F.nullif(F.col("o_orderstatus"), F.lit("O")).eqNullSafe(F.lit(None).cast("string"))
    ).select("o_orderkey", "o_orderstatus")


@register(
    "project_case_when",
    oracle="""
    SELECT
      o_orderkey,
      CASE
        WHEN o_totalprice >= 300000 THEN 'large'
        WHEN o_totalprice >= 100000 THEN 'medium'
        ELSE 'small'
      END AS size_bucket,
      CASE o_orderstatus WHEN 'F' THEN 'final' WHEN 'O' THEN 'open' ELSE 'partial' END AS status_name
    FROM orders
    WHERE o_orderkey < 2000
    """,
    tags=("projection", "case"),
)
def project_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_bucket"),
        F.when(F.col("o_orderstatus") == "F", "final")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_name"),
    )


@register(
    "dq_referential_integrity",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        AS orphan_orders,
      (SELECT COUNT(*) FROM lineitem l
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        AS orphan_lineitems,
      (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0 OR o_totalprice IS NULL)
        AS bad_totalprice,
      (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 0.5)
        AS bad_discount
    """,
    tags=("dq", "anti-join", "validation"),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: FK orphans (anti-joins) + range violations —
    the validation pass a training-data pipeline runs before ingest.
    Spark doesn't enforce FK/CHECK constraints (SURVEY §2.1 Q3 note);
    this operator IS the enforcement, as a plan instead of a promise.
    Each anti-join broadcasts the key side at this SF and degrades to a
    shuffle join at scale; the four counts run as one job."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer").select("c_custkey")
    okeys = o.select("o_orderkey")
    orphan_orders = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_orders"))
    )
    orphan_lineitems = (
        li.join(okeys, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_lineitems"))
    )
    bad_price = o.agg(
        F.count(F.when(F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0), 1)).alias(
            "bad_totalprice"
        )
    )
    bad_disc = li.agg(
        F.count(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.5), 1)).alias(
            "bad_discount"
        )
    )
    return orphan_orders.join(orphan_lineitems).join(bad_price).join(bad_disc)
