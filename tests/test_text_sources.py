"""Text-format source tests: schema fidelity and malformed-record
isolation (the file-source analogue of the reference's per-record
error skip, Consumer.java:186-188)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import types as T

from mysql_postgres_debezium_cdc_spark.sources.text_formats import (
    EVENTS_SCHEMA,
    jsonl_events_path,
    read_jsonl,
)
from mysql_postgres_debezium_cdc_spark.sources.parquet import load
from tests.conftest import SF_DIR_SMOKE


def test_jsonl_roundtrip_preserves_types_and_values(spark):
    ev_txt = read_jsonl(spark, jsonl_events_path(spark, SF_DIR_SMOKE), EVENTS_SCHEMA)
    ev_pq = load(spark, SF_DIR_SMOKE, "events")
    assert dict(ev_txt.dtypes) == dict(ev_pq.dtypes)
    # exact value equality both directions (timestamps to the microsecond)
    assert ev_txt.exceptAll(ev_pq).count() == 0
    assert ev_pq.exceptAll(ev_txt).count() == 0


def test_jsonl_corrupt_records_are_isolated_not_fatal(spark, tmp_path):
    """PERMISSIVE mode: bad lines land in _corrupt_record; good lines
    parse; the scan never throws — dead-letter routing for files."""
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"event_id": 1, "user_id": 7, "event_type": "click", "value": 1.5}\n'
        "this is not json at all\n"
        '{"event_id": 2, "user_id": 8, "event_type": "view", "value": 2.5}\n'
        '{"event_id": "WRONG_TYPE", "user_id": 9}\n'
    )
    schema = T.StructType(
        EVENTS_SCHEMA.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    df = spark.read.schema(schema).json(str(p)).cache()
    try:
        good = df.where(F.col("_corrupt_record").isNull())
        bad = df.where(F.col("_corrupt_record").isNotNull())
        assert good.count() == 2
        assert bad.count() == 2  # garbage line + type-mismatch line
        assert sorted(r.event_id for r in good.collect()) == [1, 2]
    finally:
        df.unpersist()


def test_xml_corrupt_records_are_isolated_not_fatal(spark, tmp_path):
    """XML source, PERMISSIVE (default) mode: a malformed <row> element
    lands in _corrupt_record; well-formed rows parse; the scan never
    throws — the same dead-letter routing contract as the JSONL/CSV
    sources (and the docstring claim on `source_xml_scan`)."""
    p = tmp_path / "mixed.xml"
    p.write_text(
        "<rows>"
        "<row><o_orderkey>1</o_orderkey><o_custkey>7</o_custkey>"
        "<o_orderstatus>F</o_orderstatus><o_totalprice>10.5</o_totalprice>"
        "<o_orderdate>1995-01-02</o_orderdate>"
        "<o_orderpriority>1-URGENT</o_orderpriority></row>"
        "<row><o_orderkey>NOT_A_NUMBER</o_orderkey><o_custkey>8</o_custkey>"
        "<o_orderstatus>O</o_orderstatus><o_totalprice>11.5</o_totalprice>"
        "<o_orderdate>1995-01-03</o_orderdate>"
        "<o_orderpriority>2-HIGH</o_orderpriority></row>"
        "<row><o_orderkey>2</o_orderkey><o_custkey>9</o_custkey>"
        "<o_orderstatus>O</o_orderstatus><o_totalprice>12.5</o_totalprice>"
        "<o_orderdate>1995-01-04</o_orderdate>"
        "<o_orderpriority>3-MEDIUM</o_orderpriority></row>"
        "</rows>"
    )
    from mysql_postgres_debezium_cdc_spark.sources.text_formats import (
        ORDERS_XML_SCHEMA,
    )

    schema = T.StructType(
        ORDERS_XML_SCHEMA.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    df = (
        spark.read.schema(schema)
        .format("xml")
        .option("rowTag", "row")
        .load(str(p))
        .cache()
    )
    try:
        good = df.where(F.col("_corrupt_record").isNull())
        bad = df.where(F.col("_corrupt_record").isNotNull())
        assert good.count() == 2
        assert bad.count() == 1  # the type-mismatch row
        assert sorted(r.o_orderkey for r in good.collect()) == [1, 2]
    finally:
        df.unpersist()
