"""Array / map / JSON function surface.

The JSON queries mirror the reference's envelope handling (P1/P3,
Consumer.java:138-149, 255-274): JSON string → typed fields.  Arrays are
exercised via tokenized document text; all array ops are Catalyst
higher-order functions (transform/filter/aggregate) — no Python.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load


@register(
    "fn_json_extract",
    oracle="""
    SELECT
      event_id,
      CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_value,
      CASE WHEN JSON_EXTRACT_STRING(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END AS has_k
    FROM events
    WHERE event_id < 500
    ORDER BY event_id
    """,
    tags=("function", "json"),
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object — the P1 envelope-field extraction primitive."""
    ev = load(spark, sf_dir, "events").where(F.col("event_id") < 500)
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.cast("bigint").alias("k_value"),
        F.when(k.isNotNull(), 1).otherwise(0).alias("has_k"),
    ).orderBy("event_id")


@register(
    "fn_json_schema_parse",
    oracle="""
    SELECT
      event_id,
      CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) AS k_typed
    FROM events
    WHERE event_id < 500 AND JSON_EXTRACT(props, '$.k') IS NOT NULL
    ORDER BY event_id
    """,
    tags=("function", "json"),
)
def fn_json_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit StructType — the typed envelope decode
    path (vs stringly get_json_object)."""
    ev = load(spark, sf_dir, "events").where(F.col("event_id") < 500)
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = F.from_json(F.col("props"), schema)
    return (
        ev.select("event_id", parsed.getField("k").alias("k_typed"))
        .where(F.col("k_typed").isNotNull())
        .orderBy("event_id")
    )


@register(
    "fn_array_ops",
    oracle="""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS tokens FROM documents WHERE doc_id < 50
    )
    SELECT
      doc_id,
      LEN(tokens)                                             AS n_tokens,
      CASE WHEN LIST_CONTAINS(tokens, 'data') THEN 1 ELSE 0 END AS has_data,
      LIST_SORT(tokens)[1]                                    AS min_token,
      LEN(LIST_FILTER(tokens, t -> LENGTH(t) >= 5))           AS n_long_tokens,
      CAST(LIST_AGGREGATE(LIST_TRANSFORM(tokens, t -> LENGTH(t)), 'sum') AS BIGINT) AS total_chars
    FROM toks
    ORDER BY doc_id
    """,
    tags=("function", "array", "higher_order"),
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform / filter / aggregate."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    toks = F.split(F.col("text"), " ")
    return (
        d.select("doc_id", toks.alias("tokens"))
        .select(
            "doc_id",
            F.size("tokens").cast("bigint").alias("n_tokens"),
            F.when(F.array_contains("tokens", "data"), 1).otherwise(0).alias("has_data"),
            F.array_sort("tokens").getItem(0).alias("min_token"),
            F.size(F.filter("tokens", lambda t: F.length(t) >= 5))
            .cast("bigint")
            .alias("n_long_tokens"),
            F.aggregate(
                F.transform("tokens", lambda t: F.length(t).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("total_chars"),
        )
        .orderBy("doc_id")
    )


@register(
    "fn_array_explode",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (
      SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token
      FROM documents
    )
    WHERE LENGTH(token) > 0
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
    tags=("function", "array", "explode"),
)
def fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode → word count: the canonical flatten-then-aggregate shape."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .where(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


@register(
    "fn_map_ops",
    oracle="""
    SELECT
      doc_id,
      lang,
      source,
      CAST(2 AS INT)     AS n_keys,
      -- CONCAT_WS skips NULLs like Spark's concat_ws (null-sweep)
      CONCAT_WS('|', lang, source) AS joined_vals
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id
    """,
    tags=("function", "map"),
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a map, read it back via element_at/map_keys.

    The oracle states the expected *values* (DuckDB's MAP type does not
    hash-compare cleanly with Spark's), so the map round-trip is asserted
    by producing scalar columns from the map.
    """
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("lang"),
        F.element_at(m, "source").alias("source"),
        F.size(m).alias("n_keys"),
        F.concat_ws("|", F.map_values(m)).alias("joined_vals"),
    ).orderBy("doc_id")


@register(
    "fn_variant_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("function", "json", "variant"),
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON through the VARIANT type (Spark 4):
    ``parse_json`` decodes once into a binary-encoded variant,
    ``variant_get`` extracts typed paths from the decoded form.

    Versus per-path ``get_json_object`` (which re-parses the string for
    every path), VARIANT parses each document ONCE and every extraction
    walks the binary encoding — the right trade at 100 TB where props
    blobs are wide and queries touch several paths.  Storage-side, a
    variant column also shreds into parquet natively."""
    ev = load(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.variant_get("v", "$.k", "bigint")
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(k).alias("sum_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )
