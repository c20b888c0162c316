"""Text-format sources: JSON-lines and CSV scans with explicit schemas.

The reference's wire format is schemaless JSON (SURVEY.md §1.3 — events
carry no schema, `connectors/mysql-source.json:30-31`), and its typing
is inferred per value.  Our engine's rule is the opposite and these
sources enforce it: **schema is explicit config** — every text read
passes a `StructType`, never `inferSchema` (at 100 TB schema inference
is a full extra pass over the data, and a drifting file silently
changes column types mid-pipeline).

Each query materializes a fixture once per scale factor into a scratch
directory in the target format, then answers an aggregate from the
text-format scan, oracle-checked against the parquet truth — proving
the round-trip preserves types (timestamps included) end-to-end.

Malformed-record isolation (the E1 dead-letter analogue for file
sources, `Consumer.java:186-188`) is covered in
tests/test_text_sources.py: PERMISSIVE mode routes bad lines to
`_corrupt_record` instead of failing the scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.scratch import materialize_once
from mysql_postgres_debezium_cdc_spark.sources.parquet import load

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

ORDERS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        # the fixture column is NTZ (no zone on disk); keep it NTZ through
        # the text round-trip rather than silently rebasing into a zone
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

# Microsecond-precision, timezone-less — written and parsed with the
# session pinned to UTC so the round-trip is value-exact.
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def jsonl_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture version) events as JSON-lines;
    return the path (staged + atomic rename, see scratch.py)."""
    return materialize_once(
        sf_dir,
        "src_events_jsonl",
        lambda p: load(spark, sf_dir, "events")
        .write.mode("overwrite")
        .option("timestampFormat", TS_FMT)
        .json(p),
    )


def csv_orders_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture version) orders as headered CSV;
    return the path (staged + atomic rename, see scratch.py)."""
    return materialize_once(
        sf_dir,
        "src_orders_csv",
        lambda p: load(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .option("header", "true")
        .option("timestampNTZFormat", TS_FMT)
        .csv(p),
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines scan with explicit schema; PERMISSIVE (default) mode
    nulls out unparseable fields instead of failing the scan."""
    return spark.read.schema(schema).option("timestampFormat", TS_FMT).json(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampNTZFormat", TS_FMT)
        .csv(path)
    )


@register(
    "source_jsonl_scan",
    oracle="""
    SELECT user_id, COUNT(*) AS n_purchases, ROUND(SUM(value), 2) AS spend
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("source", "json"),
)
def source_jsonl_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate straight off a JSON-lines scan (explicit schema).
    Matching the parquet-truth oracle proves long/double/timestamp
    fidelity through the text round-trip."""
    ev = read_jsonl(spark, jsonl_events_path(spark, sf_dir), EVENTS_SCHEMA)
    return (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("spend"),
        )
        .orderBy("user_id")
    )


@register(
    "source_csv_scan",
    oracle="""
    SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR)
             AS order_month,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY order_month
    ORDER BY order_month
    """,
    tags=("source", "csv"),
)
def source_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue off a headered-CSV scan with explicit schema —
    timestamp parsing included (the type the reference's sink got wrong,
    landing epoch millis in VARCHAR, postgres/init/01_schema.sql:9-10)."""
    orders = read_csv(spark, csv_orders_path(spark, sf_dir), ORDERS_CSV_SCHEMA)
    return (
        orders.where(F.col("o_orderstatus") == "F")
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .cast("string")
            .alias("order_month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("order_month")
    )


def orc_lineitem_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture version) lineitem as ORC — the
    other columnar format a lakehouse ingests; return the path."""
    return materialize_once(
        sf_dir,
        "src_lineitem_orc",
        lambda p: load(spark, sf_dir, "lineitem")
        .write.mode("overwrite")
        .orc(p),
    )


@register(
    "source_orc_scan",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_lines,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_quantity < 25
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("source", "orc"),
)
def source_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate straight off an ORC scan.  Spark's vectorized ORC
    reader gives the same column pruning + predicate pushdown story as
    parquet (the filter lands in the ORC search argument); matching the
    parquet-truth oracle proves type fidelity through the columnar
    round-trip.  At scale this is the drop-in path for ORC-resident
    lakehouse data — same plan shape, different file source."""
    li = spark.read.orc(orc_lineitem_path(spark, sf_dir))
    return (
        li.where(F.col("l_quantity") < 25)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "source_parquet_merge_schema",
    oracle="""
    SELECT CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_orderpriority END
             AS o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY 1
    ORDER BY o_orderpriority NULLS FIRST
    """,
    tags=("source", "parquet", "schema-evolution"),
)
def source_parquet_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution scan: a table whose files were written across a
    schema change (one file predates the ``o_orderpriority`` column)
    reads as ONE frame via ``mergeSchema`` — old-file rows surface the
    added column as null, the standard parquet evolution contract a
    long-lived 100 TB table depends on.  (mergeSchema reconciles
    footers at planning time — an extra metadata pass, so production
    tables pin the merged schema in a catalog; the per-file column
    fill-in is the part this query certifies.)

    The two-schema layout derives deterministically from ``orders``
    (even keys → old schema, odd → new), so the oracle reproduces the
    merged result from the original table without touching scratch
    paths."""
    def write(path: str) -> None:
        o = load(spark, sf_dir, "orders")
        old = o.where(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
        new = o.where(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        )
        # Two subdirectories = two file generations of one logical table.
        old.write.mode("overwrite").parquet(f"{path}/gen=0")
        new.write.mode("overwrite").parquet(f"{path}/gen=1")
        # top-level _SUCCESS marker for materialize_once
        import os

        open(os.path.join(path, "_SUCCESS"), "w").close()

    root = materialize_once(sf_dir, "parquet_evolution", write)
    merged = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "true"
    ).parquet(root)
    return (
        merged.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy(F.col("o_orderpriority").asc_nulls_first())
    )


ORDERS_XML_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        # written as DATE: XML interchange rarely carries sub-day
        # precision, and DATE round-trips without format negotiation
        T.StructField("o_orderdate", T.DateType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


def xml_orders_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture version) orders as XML (Spark 4's
    built-in XML source, one <row> element per record); return the
    path."""
    return materialize_once(
        sf_dir,
        "src_orders_xml",
        lambda p: load(spark, sf_dir, "orders")
        .withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
        .write.mode("overwrite")
        .format("xml")
        .option("rowTag", "row")
        .save(p),
    )


@register(
    "source_xml_scan",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR) AS first_order_day,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
             / CAST(100.0 AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("source", "xml"),
)
def source_xml_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate straight off an XML scan (Spark 4 built-in `xml`
    source, explicit schema — same no-inference rule as every text
    source here).  Matching the parquet-truth oracle proves
    long/double/date fidelity through the XML round-trip.  Like the
    other text sources, PERMISSIVE mode routes malformed elements to
    `_corrupt_record` rather than failing the scan
    (tests/test_text_sources.py)."""
    orders = (
        spark.read.schema(ORDERS_XML_SCHEMA)
        .format("xml")
        .option("rowTag", "row")
        .load(xml_orders_path(spark, sf_dir))
    )
    return (
        orders.where(F.col("o_orderstatus") != "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.min("o_orderdate").cast("string").alias("first_order_day"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")) / 100.0
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )
