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
      -- exact DECIMAL product: the three 2dp factors multiply to an
      -- exact 6dp value that lands exactly on .005 ties (one sf0.1 row
      -- flipped between engines under double math); decimal arithmetic
      -- rounds the TRUE value half-up in both engines, and the final
      -- cast back to DOUBLE is exact for 2dp results.
      CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))
                 * (1 + CAST(l_tax AS DECIMAL(12,2))), 2) AS DOUBLE) AS charged,
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
        # exact decimal product — see the oracle comment: double math
        # flips engine rounding on exact .005 ties.
        F.round(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(12,2)"))
            * (F.lit(1) + F.col("l_tax").cast("decimal(12,2)")),
            2,
        )
        .cast("double")
        .alias("charged"),
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


@register(
    "dq_null_profile",
    oracle="""
    WITH d AS (
      SELECT NULLIF(o_orderstatus, 'O') AS status_closed,
             o_orderpriority AS priority,
             CASE WHEN o_totalprice >= 50000 THEN NULL
                  ELSE o_totalprice END AS price_small
      FROM orders
    ),
    s AS (
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN status_closed IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_status,
             CAST(COUNT(DISTINCT status_closed) AS BIGINT) AS dist_status,
             CAST(SUM(CASE WHEN priority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_priority,
             CAST(COUNT(DISTINCT priority) AS BIGINT) AS dist_priority,
             CAST(SUM(CASE WHEN price_small IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_price,
             CAST(COUNT(DISTINCT price_small) AS BIGINT) AS dist_price
      FROM d
    )
    SELECT u.column_name, n_rows, u.n_null, u.n_distinct,
           ROUND(CAST(u.n_null AS DOUBLE) / n_rows, 4) AS null_frac
    FROM s, LATERAL (
      SELECT UNNEST(['price_small', 'priority', 'status_closed']) AS column_name,
             UNNEST([null_price, null_priority, null_status]) AS n_null,
             UNNEST([dist_price, dist_priority, dist_status]) AS n_distinct
    ) u
    ORDER BY u.column_name
    """,
    tags=("dq", "profile"),
)
def dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler: per-column null count, exact distinct count and
    null fraction — the data-quality report a pipeline runs before
    trusting a new drop.  (The fixture tables ship null-free, so two
    profiled columns derive nulls deterministically via NULLIF/CASE;
    the profiler itself is column-agnostic.)

    ONE pass over the table: all six aggregates sit in a single Agg
    node (Catalyst plans multi-distinct via Expand — rows×3, still one
    scan, no self-joins), and the per-column report rows come from
    ``stack`` over the 1-row aggregate, not from unioning three
    re-aggregations of the same scan."""
    o = load(spark, sf_dir, "orders")
    d = o.select(
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_closed"),
        F.col("o_orderpriority").alias("priority"),
        F.when(F.col("o_totalprice") >= 50000, None)
        .otherwise(F.col("o_totalprice"))
        .alias("price_small"),
    )

    def null_cnt(c):
        return F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint")

    s = d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        null_cnt("status_closed").alias("null_status"),
        F.count_distinct(F.col("status_closed")).alias("dist_status"),
        null_cnt("priority").alias("null_priority"),
        F.count_distinct(F.col("priority")).alias("dist_priority"),
        null_cnt("price_small").alias("null_price"),
        F.count_distinct(F.col("price_small")).alias("dist_price"),
    )
    stacked = s.select(
        "n_rows",
        F.expr(
            "stack(3, "
            "'price_small', null_price, dist_price, "
            "'priority', null_priority, dist_priority, "
            "'status_closed', null_status, dist_status) "
            "AS (column_name, n_null, n_distinct)"
        ),
    )
    return stacked.select(
        "column_name",
        "n_rows",
        "n_null",
        "n_distinct",
        F.round(F.col("n_null").cast("double") / F.col("n_rows"), 4).alias("null_frac"),
    ).orderBy("column_name")
