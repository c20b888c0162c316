"""Custom Python DataSource tests: the offline Debezium/Kafka emulator
must drive the engine's real CDC pipeline in batch AND as a genuine
streaming query with source-managed offsets."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import types as T

from mysql_postgres_debezium_cdc_spark.sources.debezium import decode_envelope
from mysql_postgres_debezium_cdc_spark.sources.synth_datasource import make_record, register
from mysql_postgres_debezium_cdc_spark.streaming.cdc import (
    apply_changes,
    compact,
    with_change_columns,
)

ROW_SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
)

OPTS = {"total_rows": "1000", "n_keys": "37", "n_partitions": "4"}


def _python_oracle(total_rows: int, n_keys: int, malformed_every: int = 0):
    """In-order single-threaded replay of the generated log."""
    state: dict[int, float] = {}
    for seq in range(total_rows):
        _, payload, _, _, _, _ = make_record(seq, n_keys, malformed_every)
        try:
            env = json.loads(payload)
        except ValueError:
            continue
        env = env.get("payload", env)
        if env["op"] == "d":
            state.pop(env["before"]["id"], None)
        else:
            state[env["after"]["id"]] = env["after"]["v"]
    return state


def _final_state(df):
    return {r["id"]: r["v"] for r in df.collect()}


def test_batch_read_through_cdc_pipeline(spark):
    register(spark)
    raw = spark.read.format("debezium_synth").options(**OPTS).load()
    assert raw.rdd.getNumPartitions() == 4
    ev = with_change_columns(decode_envelope(raw, ROW_SCHEMA))
    state = apply_changes(None, compact(ev, ["id"]), ["id"], ["v"])
    assert _final_state(state.select("id", "v")) == _python_oracle(1000, 37)


def test_malformed_records_hit_dead_letter_not_pipeline(spark):
    register(spark)
    raw = (
        spark.read.format("debezium_synth")
        .options(**OPTS)
        .option("malformed_every", "10")
        .load()
    )
    decoded = decode_envelope(raw, ROW_SCHEMA)
    assert decoded.where(F.col("_error").isNotNull()).count() == 100
    ev = with_change_columns(decoded)
    state = apply_changes(None, compact(ev, ["id"]), ["id", "v"][:1], ["v"])
    assert _final_state(state.select("id", "v")) == _python_oracle(1000, 37, 10)


def test_stream_read_microbatches_converge_to_batch_state(spark, tmp_path):
    """availableNow streaming over the synthetic log: 4 micro-batches of
    250 offsets, checkpointed, must converge to the batch replica."""
    register(spark)
    raw = spark.readStream.format("debezium_synth").options(**OPTS).load()
    ev = with_change_columns(decode_envelope(raw, ROW_SCHEMA))

    acc: dict[str, object] = {"state": None, "batches": 0}

    def merge(batch_df, _epoch):
        acc["state"] = apply_changes(
            acc["state"], compact(batch_df, ["id"]), ["id"], ["v"]
        )
        acc["state"] = acc["state"].localCheckpoint()
        acc["batches"] += 1

    # Python stream sources don't support availableNow; run continuous
    # micro-batches and stop once the source head reaches the log end.
    q = (
        ev.writeStream.foreachBatch(merge)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    import ast
    import time

    deadline = time.time() + 240
    try:
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["sources"]:
                # Python-source offsets serialize as a dict repr
                end = ast.literal_eval(p["sources"][0]["endOffset"] or "{}")
                if end.get("seq") == 1000 and p["numInputRows"] == 0:
                    break
            time.sleep(0.5)
    finally:
        q.stop()
    assert acc["batches"] >= 4, "offset pacing must yield multiple micro-batches"
    assert _final_state(acc["state"].select("id", "v")) == _python_oracle(1000, 37)
