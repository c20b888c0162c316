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


@register(
    "udtf_tokenize_positions",
    oracle="""
    SELECT doc_id, tok, pos
    FROM (
      SELECT doc_id,
             UNNEST(STRING_SPLIT(text, ' ')) AS tok,
             GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS pos
      FROM documents
      WHERE doc_id < 20
    )
    ORDER BY doc_id, pos
    """,
    tags=("udtf", "python", "lateral"),
)
def udtf_tokenize_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4 table function): one input row →
    many output rows, lateral-joined against the source.

    A UDTF runs row-at-a-time in Python — the SLOW path, kept off hot
    loops (the same result is posexplode in Catalyst, which is how
    fn_array_explode does it).  Registered here to prove the API surface
    with an oracle-checkable tokenizer."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok: string, pos: int")
    class Tokenize:
        def eval(self, text: str):
            if text is None:  # UNNEST(STRING_SPLIT(NULL)) emits no rows
                return
            for i, tok in enumerate(text.split(" "), start=1):
                yield tok, i

    spark.udtf.register("tokenize_positions", Tokenize)
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, t.tok AS tok, t.pos AS pos
        FROM _udtf_docs, LATERAL tokenize_positions(text) t
        ORDER BY doc_id, pos
        """
    )


@register(
    "fn_try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(o_orderstatus AS BIGINT)                    AS bad_cast,
           o_totalprice / NULLIF(o_orderkey % 3, 0)             AS safe_div,
           TRY_CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT)      AS roundtrip
    FROM orders
    WHERE o_orderkey < 300
    ORDER BY o_orderkey
    """,
    tags=("function", "ansi", "try"),
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: Spark 4 runs ANSI mode (overflow/bad-cast/
    div-by-zero THROW); try_cast/try_divide are the explicit
    null-on-error escape hatches, matching DuckDB's TRY_CAST /
    NULLIF-guarded division."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 300)
    return o.select(
        "o_orderkey",
        F.col("o_orderstatus").try_cast("bigint").alias("bad_cast"),
        F.try_divide("o_totalprice", F.col("o_orderkey") % 3).alias("safe_div"),
        F.col("o_orderkey").cast("string").try_cast("bigint").alias("roundtrip"),
    ).orderBy("o_orderkey")


@register(
    "udaf_pandas_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 2)
             AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("udf", "pandas", "grouped_agg"),
)
def udaf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF (the `groupBy().agg(pandas_udf)` surface,
    distinct from applyInPandas): quantity-weighted average price per
    return flag, computed by numpy over each group's Arrow batch.

    The weighted mean is a ratio of two sums, so it is NOT decomposable
    into Spark's built-in aggregates without two passes or a struct
    accumulator — exactly the shape where a grouped-agg pandas UDF
    earns its Arrow transfer cost.  (Partial aggregation does not apply
    to pandas aggregates — each group's rows all reach one executor —
    so at scale, keys must outnumber cores and no key may dominate;
    both hold for the flag domain here and the salting devices in
    plans/skew.py are the mitigation when they don't.)

    Both float sums run over value-sorted arrays: a group's rows arrive
    in partition order, which changes across re-partitionings, and
    float addition is not associative — sorting first makes the result
    a pure function of the group's multiset, so the rounded output
    can't flip on a half-cent tie when the cluster layout changes."""
    import numpy as np
    import pandas as pd

    @F.pandas_udf(T.DoubleType())
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        num = np.sort((price * qty).to_numpy())
        den = np.sort(qty.to_numpy())
        return float(num.sum() / den.sum())

    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(wavg("l_extendedprice", "l_quantity"), 2).alias("wavg_price"))
        .orderBy("l_returnflag")
    )


@register(
    "udf_cogrouped_merge",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, COUNT(*) AS n_lines,
             CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
      FROM lineitem WHERE l_orderkey < 2000
      GROUP BY l_orderkey
    )
    SELECT o.o_orderkey, ROUND(o.o_totalprice, 2) AS total,
           COALESCE(li.n_lines, 0) AS n_lines,
           COALESCE(li.sum_qty, 0) AS sum_qty
    FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey < 2000
    ORDER BY o.o_orderkey
    """,
    tags=("udf", "pandas", "cogroup"),
)
def udf_cogrouped_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas (`groupBy().cogroup().applyInPandas`) —
    the two-sided Arrow surface: each key's order row and its lineitem
    rows arrive as two aligned pandas frames in ONE function call,
    which is the shape custom per-key merges (as-of logic, model
    scoring against per-key history, bitemporal reconciliation) need
    when a plain join can't express the pairing.

    Here the merge itself is deliberately SQL-expressible (count + sum
    against the order header, empty-side → zeros) so the driver value-
    checks the whole cogroup path: both sides co-shuffle on the key,
    then Python sees each group exactly once — at scale the cost is the
    same two keyed exchanges a sort-merge join pays, plus Arrow
    transfer of only the touched columns.  Quantities are integral in
    the fixture, so the pandas sum is exact as a BIGINT."""
    import pandas as pd

    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 2000)
        .select("o_orderkey", "o_totalprice")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < 2000)
        .select("l_orderkey", "l_quantity")
    )

    def merge(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        if odf.empty:  # lineitem-only key: FK guarantees none, but stay total
            return pd.DataFrame(
                columns=["o_orderkey", "total", "n_lines", "sum_qty"]
            ).astype({"o_orderkey": "int64", "total": "float64", "n_lines": "int64", "sum_qty": "int64"})
        return pd.DataFrame(
            {
                "o_orderkey": [key[0]],
                "total": [round(float(odf["o_totalprice"].iloc[0]), 2)],
                "n_lines": [len(ldf)],
                "sum_qty": [int(ldf["l_quantity"].sum()) if len(ldf) else 0],
            }
        )

    out_schema = "o_orderkey long, total double, n_lines long, sum_qty long"
    return (
        o.groupBy("o_orderkey")
        .cogroup(li.groupBy("l_orderkey"))
        .applyInPandas(merge, out_schema)
        .orderBy("o_orderkey")
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice * 100, 0) AS price_cents,
           LENGTH(o_orderpriority) AS prio_len
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
    tags=("udf", "arrow"),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: per-partition transformation over raw Arrow
    RecordBatches — the zero-copy tier below mapInPandas (no pandas
    conversion at all), the right surface when the Python side is
    itself Arrow-native (polars, duckdb, custom C extensions).  The
    batch math here is deliberately exact-integer so the oracle can
    replay it."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def per_batch(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("o_orderkey"),
                    pc.round(pc.multiply(b.column("o_totalprice"), pa.scalar(100.0))),
                    pc.utf8_length(b.column("o_orderpriority")),
                ],
                names=["o_orderkey", "price_cents", "prio_len"],
            )

    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    out_schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("price_cents", T.DoubleType()),
            T.StructField("prio_len", T.IntegerType()),
        ]
    )
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .mapInArrow(per_batch, out_schema)
        .orderBy("o_orderkey")
    )
