"""Kafka CDC source plumbing, testable without a broker.

The sandbox has no Kafka, so the socket itself can't be exercised here
— but everything around it can: the reader options (subscription
regex, offset policy) are pure data, and the column projection runs on
a static frame with the EXACT schema spark-sql-kafka emits at runtime.
A live end-to-end test runs whenever ``SPARK_KAFKA_BOOTSTRAP`` points
at a real broker (reference e2e: /root/reference/README.md:47-101).
"""

from __future__ import annotations

import json
import os
import re

import pytest

from mysql_postgres_debezium_cdc_spark.sources.debezium import (
    KAFKA_WIRE_SCHEMA,
    decode_envelope,
    kafka_cdc_source,
    kafka_reader_options,
    project_kafka_frame,
)
from tests.test_cdc import ROW_SCHEMA, SRC

# The reference's subscription regex (config.properties:6) and the topic
# names Debezium actually creates for it (README.md:67-69).
REFERENCE_TOPIC_REGEX = r"^[^.]+\.[^.]+\.(customers|orders)$"
REFERENCE_TOPICS = ["mysql.app.customers", "mysql.app.orders"]


def test_reader_options_match_reference_semantics():
    opts = kafka_reader_options("broker:9092", REFERENCE_TOPIC_REGEX)
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["startingOffsets"] == "earliest"  # Consumer.java:111
    assert opts["failOnDataLoss"] == "false"  # replay-converge stance
    # the regex goes through verbatim and matches exactly the topics the
    # reference's connector produces
    pat = opts["subscribePattern"]
    assert all(re.fullmatch(pat, t) for t in REFERENCE_TOPICS)
    assert not re.fullmatch(pat, "mysql.app.audit_log")
    assert not re.fullmatch(pat, "other.customers")


def test_projection_on_kafka_wire_schema(spark):
    """project_kafka_frame must accept spark-sql-kafka's runtime schema
    (binary key/value, int timestampType) and emit string key/value with
    offsets intact — then compose with decode_envelope end-to-end."""
    env = json.dumps(
        {
            "payload": {
                "before": None,
                "after": {"id": 7, "name": "x"},
                "source": SRC,
                "op": "c",
                "ts_ms": 1700000000123,
            }
        }
    )
    rows = [
        (
            json.dumps({"id": 7}).encode(),
            env.encode(),
            "mysql.app.customers",
            0,
            41,
            None,
            0,
        )
    ]
    raw = spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)
    projected = project_kafka_frame(raw)
    assert dict(projected.dtypes) == {
        "topic": "string",
        "partition": "int",
        "offset": "bigint",
        "key": "string",
        "value": "string",
        "timestamp": "timestamp",
    }
    out = projected.collect()[0]
    assert out["offset"] == 41 and out["key"] == '{"id": 7}'
    decoded = decode_envelope(projected, ROW_SCHEMA, topic_col="topic").collect()[0]
    assert decoded["op"] == "c" and decoded["after"]["id"] == 7
    assert decoded["src_table"] == "customers" and decoded["_error"] is None


@pytest.mark.skipif(
    not os.environ.get("SPARK_KAFKA_BOOTSTRAP"),
    reason="no Kafka broker (set SPARK_KAFKA_BOOTSTRAP to run live)",
)
def test_live_kafka_stream_schema(spark, tmp_path):
    """With a real broker: the composed source must be a streaming frame
    whose schema equals the tested static projection, and a bounded
    availableNow pass must complete."""
    src = kafka_cdc_source(
        spark, os.environ["SPARK_KAFKA_BOOTSTRAP"], REFERENCE_TOPIC_REGEX
    )
    assert src.isStreaming
    expected = project_kafka_frame(
        spark.createDataFrame([], KAFKA_WIRE_SCHEMA)
    ).schema
    assert src.schema == expected
    q = (
        src.writeStream.format("memory")
        .queryName("kafka_live_probe")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.table("kafka_live_probe").count() >= 0
