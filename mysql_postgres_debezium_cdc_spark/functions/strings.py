"""String function surface: concat, substr, case-mapping, trim, regexp,
split/length — mirrors the reference's only string handling (lower-cased
identifiers, Consumer.java:208-210) and extends to a full library.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load


@register(
    "fn_string_basic",
    oracle="""
    SELECT
      c_custkey,
      UPPER(c_name)                              AS name_upper,
      LOWER(c_mktsegment)                        AS segment_lower,
      LENGTH(c_name)                             AS name_len,
      CONCAT(c_name, ':', c_mktsegment)          AS name_seg,
      SUBSTR(c_name, 1, 8)                       AS name_prefix,
      TRIM(CONCAT(' ', c_name, ' '))             AS name_trimmed,
      REPLACE(c_name, '#', '-')                  AS name_dashed
    FROM customer
    WHERE c_custkey < 100
    """,
    tags=("function", "string"),
)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.concat(F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("name_seg"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("name_trimmed"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
    )


@register(
    "fn_string_regexp",
    oracle="""
    SELECT
      p_partkey,
      p_brand,
      CAST(REGEXP_EXTRACT(p_brand, 'Brand#?([0-9]+)', 1) AS BIGINT) AS brand_num,
      REGEXP_REPLACE(p_type, '[aeiou]', '_', 'g')                   AS type_devoweled,
      CASE WHEN REGEXP_MATCHES(p_name, '^[a-m]') THEN 1 ELSE 0 END  AS starts_first_half
    FROM part
    WHERE p_partkey < 150
    """,
    tags=("function", "string", "regexp"),
)
def fn_string_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp extract/replace/match with ASCII-only patterns (portable
    across Java regex and RE2)."""
    p = load(spark, sf_dir, "part").where(F.col("p_partkey") < 150)
    return p.select(
        "p_partkey",
        "p_brand",
        F.regexp_extract("p_brand", r"Brand#?([0-9]+)", 1).cast("bigint").alias("brand_num"),
        F.regexp_replace("p_type", "[aeiou]", "_").alias("type_devoweled"),
        F.when(F.col("p_name").rlike("^[a-m]"), 1).otherwise(0).alias("starts_first_half"),
    )


@register(
    "fn_string_split_tokens",
    oracle="""
    SELECT
      doc_id,
      LEN(STRING_SPLIT(text, ' '))     AS n_tokens,
      STRING_SPLIT(text, ' ')[1]       AS first_token,
      LEFT(text, 20)                   AS head,
      CASE WHEN CONTAINS(text, 'spark') THEN 1 ELSE 0 END AS mentions_spark
    FROM documents
    WHERE doc_id < 100
    """,
    tags=("function", "string", "split"),
)
def fn_string_split_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        toks.getItem(0).alias("first_token"),
        F.substring("text", 1, 20).alias("head"),
        F.when(F.col("text").contains("spark"), 1).otherwise(0).alias("mentions_spark"),
    )


@register(
    "fn_url_parse",
    oracle="""
    WITH u AS (
      SELECT c_custkey,
             'https://shop.example.com/c/' || LOWER(c_mktsegment)
               || '?cust=' || CAST(c_custkey AS VARCHAR)
               || '&page=' || CAST(c_custkey % 7 AS VARCHAR) || '#top' AS url
      FROM customer WHERE c_custkey < 200
    )
    SELECT c_custkey,
           REGEXP_EXTRACT(url, '^[a-z]+://([^/?#]+)', 1)      AS url_host,
           REGEXP_EXTRACT(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS url_path,
           REGEXP_EXTRACT(url, '\\?([^#]*)', 1)                AS url_query,
           REGEXP_EXTRACT(url, '[?&]cust=([^&#]*)', 1)         AS q_cust,
           REGEXP_EXTRACT(url, '#(.*)$', 1)                    AS url_ref
    FROM u
    ORDER BY c_custkey
    """,
    tags=("function", "string", "url"),
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition via Spark's ``parse_url`` (host/path/query/
    named query param/fragment).  The oracle reproduces each part with
    anchored regexes — proving parse_url's java.net semantics agree
    with the regex spec on well-formed URLs, which is what log/
    clickstream pipelines rely on when they mix both approaches."""
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") < 200)
    url = F.concat(
        F.lit("https://shop.example.com/c/"),
        F.lower("c_mktsegment"),
        F.lit("?cust="),
        F.col("c_custkey").cast("string"),
        F.lit("&page="),
        (F.col("c_custkey") % 7).cast("string"),
        F.lit("#top"),
    )
    u = c.select("c_custkey", url.alias("url"))
    return u.select(
        "c_custkey",
        F.parse_url("url", F.lit("HOST")).alias("url_host"),
        F.parse_url("url", F.lit("PATH")).alias("url_path"),
        F.parse_url("url", F.lit("QUERY")).alias("url_query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("cust")).alias("q_cust"),
        F.parse_url("url", F.lit("REF")).alias("url_ref"),
    ).orderBy("c_custkey")


@register(
    "fn_xml_parse",
    oracle="""
    SELECT c_custkey,
           c_name AS xml_name,
           ROUND(c_acctbal, 2) AS xml_bal,
           c_custkey AS xml_attr_id,
           c_name AS xpath_name
    FROM customer
    WHERE c_custkey < 200
    ORDER BY c_custkey
    """,
    tags=("function", "string", "xml"),
)
def fn_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML decode surface (Spark 4 ``from_xml`` + the legacy ``xpath_*``
    family): documents built from each row's own columns are parsed
    back with an explicit schema — element text, typed element (double),
    and attribute (``_id``) extraction — and the oracle recomputes the
    expected values from the source columns, certifying the
    construct→parse round-trip (the PII/URL fixture device)."""
    from pyspark.sql import types as T

    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") < 200)
    xml = F.concat(
        F.lit('<cust id="'),
        F.col("c_custkey").cast("string"),
        F.lit('"><name>'),
        F.col("c_name"),
        F.lit("</name><bal>"),
        F.round("c_acctbal", 2).cast("string"),
        F.lit("</bal></cust>"),
    )
    schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("bal", T.DoubleType()),
        ]
    )
    d = c.select("c_custkey", xml.alias("x"))
    parsed = F.from_xml("x", schema)
    return d.select(
        "c_custkey",
        parsed.getField("name").alias("xml_name"),
        F.round(parsed.getField("bal"), 2).alias("xml_bal"),
        parsed.getField("_id").alias("xml_attr_id"),
        F.xpath_string("x", F.lit("/cust/name")).alias("xpath_name"),
    ).orderBy("c_custkey")


@register(
    "fn_string_collation",
    oracle="""
    WITH m AS (
      SELECT CASE WHEN s_suppkey % 2 = 0 THEN n_name
                  ELSE LOWER(n_name) END AS mixed
      FROM supplier JOIN nation ON n_nationkey = s_nationkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT mixed) AS BIGINT) AS n_distinct_cs,
           CAST(COUNT(DISTINCT LOWER(mixed)) AS BIGINT) AS n_distinct_ci,
           CAST(COUNT(*) FILTER (LOWER(mixed) = 'nation_1')
                AS BIGINT) AS n_probe_matches
    FROM m
    """,
    tags=("fn", "string", "collation"),
)
def fn_string_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATION surface: distinct-counting and equality under
    ``UTF8_LCASE`` on a deliberately case-mangled column (each
    supplier\'s nation name, lower-cased for odd suppliers — every
    nation therefore exists in TWO case variants).  Case-sensitive
    distinct sees both variants (up to 2x|nations|); the collated
    distinct folds them back to |nations| — the declarative form of
    the case-insensitive identity that lower()-normalization pipelines
    (including the reference\'s identifier lower-casing,
    Consumer.java:208-210) hand-roll.  The oracle expresses the SAME
    semantics in portable ANSI (DISTINCT LOWER / LOWER =), which is
    exactly the equivalence the collation feature guarantees for ASCII
    data — so the value check certifies that Spark\'s collated
    semantics match the normalization they replace.

    Scale shape: broadcast dim join + scalar aggregates (partial
    map-side); collation compares JVM-side inside codegen, no UDF."""
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    mixed = F.when(
        F.col("s_suppkey") % 2 == 0, F.col("n_name")
    ).otherwise(F.lower(F.col("n_name")))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(mixed.alias("mixed"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(F.col("mixed")).alias("n_distinct_cs"),
            F.countDistinct(F.collate(F.col("mixed"), "UTF8_LCASE")).alias(
                "n_distinct_ci"
            ),
            # coalesce: SUM over zero rows is NULL in Spark but the
            # oracle's COUNT(*) FILTER is 0 — fold the empty corpus
            F.coalesce(
                F.sum(
                    F.when(
                        F.collate(F.col("mixed"), "UTF8_LCASE")
                        == F.lit("NATION_1"),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_probe_matches"),
        )
    )
