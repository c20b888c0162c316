"""Set operations: union all, union distinct, intersect, except.

UNION ALL is shuffle-free (plan concatenation).  DISTINCT variants
shuffle on the full row — at 100 TB prefer keyed dedup
(dropDuplicates on a key subset) over whole-row distinct.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load


def _cust_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))


def _supp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))


@register(
    "setop_union_all",
    oracle="""
    SELECT nationkey, COUNT(*) AS n
    FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    )
    GROUP BY nationkey
    ORDER BY nationkey
    """,
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _cust_nations(spark, sf_dir).unionByName(_supp_nations(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n")).orderBy("nationkey")


@register(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _cust_nations(spark, sf_dir)
        .unionByName(_supp_nations(spark, sf_dir))
        .distinct()
        .orderBy("nationkey")
    )


@register(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _cust_nations(spark, sf_dir)
        .intersect(_supp_nations(spark, sf_dir))
        .orderBy("nationkey")
    )


@register(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
    ORDER BY nationkey
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with a high-balance customer but no high-balance
    supplier.  (Unfiltered, both relations cover every nation — an
    empty EXCEPT whose oracle check proves nothing; the balance filter
    makes the subtraction observable.)

    subtract == EXCEPT DISTINCT (exceptAll is the multiset variant and
    would keep keys whose left multiplicity exceeds the right's)."""
    cust = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return cust.subtract(supp).orderBy("nationkey")


@register(
    "setop_intersect_all",
    oracle="""
    SELECT nationkey, COUNT(*) AS multiplicity
    FROM (
      SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 8000
      INTERSECT ALL
      SELECT s_nationkey AS nationkey FROM supplier
    )
    GROUP BY nationkey
    ORDER BY nationkey
    """,
    tags=("setop", "multiset"),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL: per key the surviving multiplicity is
    min(left count, right count) — observable here because high-balance
    customers and suppliers have different per-nation counts, unlike the
    DISTINCT variant which collapses to the key set.  The trailing
    group-count makes the multiset cardinality part of the value hash."""
    cust = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 8000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    supp = _supp_nations(spark, sf_dir)
    return (
        cust.intersectAll(supp)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
        .orderBy("nationkey")
    )


@register(
    "setop_except_all",
    oracle="""
    SELECT nationkey, COUNT(*) AS multiplicity
    FROM (
      SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 8000
      EXCEPT ALL
      SELECT s_nationkey AS nationkey FROM supplier
    )
    GROUP BY nationkey
    ORDER BY nationkey
    """,
    tags=("setop", "multiset"),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL: per key, max(0, left count − right count)
    survivors — the 'subtract one occurrence per match' semantics the
    DISTINCT variant cannot express."""
    cust = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 8000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    supp = _supp_nations(spark, sf_dir)
    return (
        cust.exceptAll(supp)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
        .orderBy("nationkey")
    )
