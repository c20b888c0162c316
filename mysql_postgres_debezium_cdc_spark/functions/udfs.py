"""UDF / UDAF surface: row-at-a-time Python UDF, Arrow pandas UDF,
grouped applyInPandas.

Hierarchy (SURVEY §2.2, pyspark guide): built-ins ≫ pandas_udf ≫
row-Python.  The row-UDF query here exists to *prove the surface* and is
deliberately confined to a small slice; the pandas paths are the
sanctioned escape hatch for logic Catalyst can't express (model scoring,
custom normalization) — Arrow moves columnar batches, numpy does the
math, and throughput stays within ~2-5× of native instead of ~100×.
"""

# NOTE: no `from __future__ import annotations` — PEP-563 stringified
# hints break pandas_udf signature resolution.
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load


@register(
    "udf_python_row",
    oracle="""
    SELECT doc_id,
           CASE WHEN n_chars >= 300 THEN 'long'
                WHEN n_chars >= 150 THEN 'medium'
                ELSE 'short' END AS size_class
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
    tags=("udf", "python"),
)
def udf_python_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow path, on a bounded slice)."""

    @F.udf(T.StringType())
    def size_class(n: int) -> str:
        if n >= 300:
            return "long"
        if n >= 150:
            return "medium"
        return "short"

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return d.select("doc_id", size_class("n_chars").alias("size_class")).orderBy("doc_id")


@register(
    "udaf_grouped_zscore",
    oracle="""
    WITH stats AS (
      SELECT doc_id, lang, n_chars,
             AVG(n_chars) OVER (PARTITION BY lang)         AS mu,
             STDDEV_SAMP(n_chars) OVER (PARTITION BY lang) AS sd,
             COUNT(*) OVER (PARTITION BY lang)             AS n
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN n > 1 AND sd > 0
                THEN ROUND((n_chars - mu) / sd, 4) END AS z
    FROM stats
    ORDER BY doc_id
    """,
    tags=("udaf", "pandas", "applyinpandas"),
)
def udaf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-score of document length via applyInPandas.

    Grouped-map pandas UDF: one shuffle on lang, then per-group numpy
    math in Arrow batches — the canonical custom-normalization shape.
    The oracle reproduces it with window functions, so the UDF's
    statistics (pandas mean/std, ddof=1) are value-checked."""
    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)
        z = (pdf["n_chars"] - mu) / sd if len(pdf) > 1 and sd > 0 else None
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "z": (z.round(4) if z is not None else pd.Series([None] * len(pdf))),
            }
        )

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("z", T.DoubleType()),
        ]
    )
    return d.groupBy("lang").applyInPandas(zscore, out_schema).orderBy("doc_id")


@register(
    "udf_pandas_scalar_tax",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 + l_tax) - l_extendedprice * l_discount, 4) AS net_due
    FROM lineitem
    WHERE l_orderkey < 500
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("udf", "pandas"),
)
def udf_pandas_scalar_tax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF over three columns (vectorized arithmetic)."""
    import pandas as pd

    @F.pandas_udf(T.DoubleType())
    def net_due(price: pd.Series, tax: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 + tax) - price * disc

    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round at 4dp: the exact result lives on a 4-decimal grid (2dp×2dp
        # products), so no cross-engine decimal-half ambiguity exists there.
        F.round(net_due("l_extendedprice", "l_tax", "l_discount"), 4).alias("net_due"),
    ).orderBy("l_orderkey", "l_linenumber")
