"""Pivot / unpivot and explicit GROUPING SETS.

Pivot with an explicit value list compiles to a single partial+final
aggregation (no per-value scans); always pass the value list at scale —
inferring it costs an extra distinct pass over the fact table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("pivot",),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts: priority rows × status columns."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "unpivot_balances",
    oracle="""
    SELECT nationkey, kind, ROUND(bal, 2) AS bal
    FROM (
      SELECT n_nationkey AS nationkey,
             (SELECT ROUND(SUM(c_acctbal), 2) FROM customer WHERE c_nationkey = n_nationkey) AS cust,
             (SELECT ROUND(SUM(s_acctbal), 2) FROM supplier WHERE s_nationkey = n_nationkey) AS supp
      FROM nation
    ) UNPIVOT (bal FOR kind IN (cust, supp))
    ORDER BY nationkey, kind
    """,
    tags=("unpivot",),
)
def unpivot_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) per-nation customer/supplier balances into rows."""
    cust = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.round(F.sum("c_acctbal"), 2).alias("cust"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.round(F.sum("s_acctbal"), 2).alias("supp"))
    )
    nation = load(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    wide = (
        nation.join(cust, "nationkey", "left")
        .join(supp, nation.nationkey == supp.snk, "left")
        .select("nationkey", "cust", "supp")
    )
    return (
        wide.unpivot("nationkey", ["cust", "supp"], "kind", "bal")
        .where(F.col("bal").isNotNull())
        .select("nationkey", "kind", F.round("bal", 2).alias("bal"))
        .orderBy("nationkey", "kind")
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) + 2 * CAST(GROUPING(l_linestatus) AS INT)
             AS grouping_id,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    ORDER BY grouping_id, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("agg", "grouping_sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS + GROUPING() marker columns.

    grouping_id encodes which columns are aggregated away — bit 0 for
    l_returnflag, bit 1 for l_linestatus (composed portably from
    GROUPING() since Spark's GROUPING_ID() bit order differs)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) + 2 * CAST(GROUPING(l_linestatus) AS INT)
                 AS grouping_id,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        ORDER BY grouping_id, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )
