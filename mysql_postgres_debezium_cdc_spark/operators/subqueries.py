"""Subquery surface: scalar, IN / NOT IN, correlated EXISTS, lateral-ish
per-group lookups.  Registered through ``spark.sql`` over temp views —
Catalyst rewrites correlated subqueries into joins (check the plan:
EXISTS becomes a left-semi join, the scalar subquery a broadcast of a
1-row aggregate), so nothing here costs more than the equivalent join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


@register(
    "subq_scalar_avg",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
    ORDER BY o_orderkey
    """,
    tags=("subquery", "scalar"),
)
def subq_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders above 2× the mean price."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
        FROM orders
        WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
        ORDER BY o_orderkey
        """
    )


@register(
    "subq_in_list",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey IN (
      SELECT n_nationkey FROM nation WHERE n_regionkey =
        (SELECT r_regionkey FROM region WHERE r_name = 'EUROPE')
    )
    ORDER BY c_custkey
    """,
    tags=("subquery", "in"),
)
def subq_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested IN + scalar subquery (region → nations → customers)."""
    _views(spark, sf_dir, "customer", "nation", "region")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_nationkey IN (
          SELECT n_nationkey FROM nation WHERE n_regionkey =
            (SELECT r_regionkey FROM region WHERE r_name = 'EUROPE')
        )
        ORDER BY c_custkey
        """
    )


@register(
    "subq_correlated_exists",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    ORDER BY o_orderkey
    """,
    tags=("subquery", "exists"),
)
def subq_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS → Catalyst left-semi join."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_orderpriority
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        ORDER BY o_orderkey
        """
    )


@register(
    "subq_correlated_scalar",
    oracle="""
    SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS acctbal
    FROM supplier s
    WHERE s_acctbal = (
      SELECT MAX(s2.s_acctbal) FROM supplier s2
      WHERE s2.s_nationkey = s.s_nationkey
    )
    ORDER BY s_suppkey
    """,
    tags=("subquery", "correlated"),
)
def subq_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-group max via correlated scalar subquery."""
    _views(spark, sf_dir, "supplier")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS acctbal
        FROM supplier s
        WHERE s_acctbal = (
          SELECT MAX(s2.s_acctbal) FROM supplier s2
          WHERE s2.s_nationkey = s.s_nationkey
        )
        ORDER BY s_suppkey
        """
    )


@register(
    "subq_not_in_with_filter",
    oracle="""
    SELECT p_partkey, p_brand
    FROM part
    WHERE p_partkey NOT IN (
      SELECT l_partkey FROM lineitem WHERE l_quantity >= 49
    )
    ORDER BY p_partkey
    """,
    tags=("subquery", "not_in"),
)
def subq_not_in_with_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (null-free subquery) → Catalyst left-anti join.  The
    quantity threshold keeps the subquery selective enough that parts
    DO survive (a NOT IN that returns 0 rows is an empty-matches-empty
    oracle check, which proves nothing)."""
    _views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_brand
        FROM part
        WHERE p_partkey NOT IN (
          SELECT l_partkey FROM lineitem WHERE l_quantity >= 49
        )
        ORDER BY p_partkey
        """
    )


_LATERAL_TOPN_STMT = """
    SELECT n_name, t.s_name, ROUND(t.s_acctbal, 2) AS top_acctbal
    FROM nation, LATERAL (
      SELECT s_name, s_acctbal FROM supplier
      WHERE s_nationkey = n_nationkey
      ORDER BY s_acctbal DESC, s_name LIMIT 3
    ) t
    ORDER BY n_name, top_acctbal DESC, t.s_name
"""


@register(
    "sql_api_lateral_topn",
    oracle=_LATERAL_TOPN_STMT,
    tags=("sql-api", "subquery", "lateral"),
)
def sql_api_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    SQL spelling of top-N-per-group, IDENTICAL text on both engines
    (Spark supports lateral correlated subqueries since 3.4).

    Catalyst decorrelates this into the same window/limit-per-key plan
    the DataFrame formulation (topk_per_group) produces — registered
    separately because a reference user migrating SQL workloads writes
    exactly this shape and should not have to rewrite it."""
    _views(spark, sf_dir, "nation", "supplier")
    return spark.sql(_LATERAL_TOPN_STMT)


_AGG_FILTER_STMT = """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
           ROUND(SUM(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 2)
             AS urgent_price,
           ROUND(AVG(o_totalprice) FILTER (WHERE o_orderpriority <> '1-URGENT'), 2)
             AS rest_avg_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""


@register(
    "sql_api_agg_filter_clause",
    oracle=_AGG_FILTER_STMT,
    tags=("sql-api", "agg", "filter-clause"),
)
def sql_api_agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard-SQL FILTER (WHERE …) aggregate clause, identical text on
    both engines — conditional aggregation without CASE gymnastics.
    Catalyst compiles each filtered aggregate to a conditional update of
    its own buffer in the SAME Agg node: one scan, one shuffle,
    regardless of how many filtered aggregates ride along."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_AGG_FILTER_STMT)
