"""Math function surface: round, abs, pow, log, sqrt, ceil/floor, sign."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load


@register(
    "fn_math_basic",
    oracle="""
    SELECT
      p_partkey,
      ROUND(p_retailprice, 1)                              AS price_r1,
      CAST(CEIL(p_retailprice) AS BIGINT)                  AS price_ceil,
      CAST(FLOOR(p_retailprice) AS BIGINT)                 AS price_floor,
      ABS(p_size - 25)                                     AS size_dev,
      ROUND(SQRT(p_retailprice), 4)                        AS price_sqrt,
      ROUND(LN(p_retailprice + 1), 4)                      AS price_ln,
      ROUND(LOG10(p_retailprice + 1), 4)                   AS price_log10,
      ROUND(POW(p_size, 2), 1)                             AS size_sq,
      CAST(SIGN(p_size - 25) AS INT)                       AS size_sign
    FROM part
    WHERE p_partkey < 150
    """,
    tags=("function", "math"),
)
def fn_math_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").where(F.col("p_partkey") < 150)
    return p.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_r1"),
        F.ceil("p_retailprice").cast("bigint").alias("price_ceil"),
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.round(F.sqrt("p_retailprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("p_retailprice") + 1), 4).alias("price_ln"),
        F.round(F.log10(F.col("p_retailprice") + 1), 4).alias("price_log10"),
        F.round(F.pow(F.col("p_size"), 2), 1).alias("size_sq"),
        F.signum(F.col("p_size") - 25).cast("int").alias("size_sign"),
    )


@register(
    "fn_conditional_bitwise",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN')          AS status_norm,
           GREATEST(o_totalprice, 100000.0)                      AS floor_price,
           LEAST(o_totalprice, 200000.0)                         AS cap_price,
           o_orderkey & 255                                      AS key_low_byte,
           XOR(o_orderkey, 255)                                  AS key_xor,
           CAST(o_orderkey << 2 AS BIGINT)                       AS key_shl,
           IF(o_totalprice > 150000, 'big', 'small')             AS size_class
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
    tags=("function", "conditional", "bitwise"),
)
def fn_conditional_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (coalesce/nullif/greatest/least/if) and bitwise
    (and/xor/shift) scalar surface."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias("status_norm"),
        F.greatest("o_totalprice", F.lit(100000.0)).alias("floor_price"),
        F.least("o_totalprice", F.lit(200000.0)).alias("cap_price"),
        F.col("o_orderkey").bitwiseAND(F.lit(255)).alias("key_low_byte"),
        F.col("o_orderkey").bitwiseXOR(F.lit(255)).alias("key_xor"),
        F.shiftleft("o_orderkey", 2).cast("bigint").alias("key_shl"),
        F.when(F.col("o_totalprice") > 150000, "big").otherwise("small").alias("size_class"),
    ).orderBy("o_orderkey")
