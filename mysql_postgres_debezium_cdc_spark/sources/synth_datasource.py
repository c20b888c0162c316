"""Custom Python DataSource: an offline Debezium/Kafka wire emulator.

The reference's source is a Kafka topic of Debezium JSON envelopes
(S1/S2, SURVEY.md §2.1); this harness has no broker.  Spark 4's Python
DataSource API lets the engine ship its OWN connector with the exact
Kafka record shape — (key, value, topic, partition, offset, timestamp)
— in both BATCH and STREAMING modes, so the full
`readStream → decode_envelope → compact → apply` pipeline runs as a
genuine streaming query with source-managed offsets, no external
service.  Swapping in the real broker is a one-line format change
(`format("kafka")` — sources/debezium.py `kafka_cdc_source`).

Determinism: record k (a global sequence number) always produces the
same envelope — key `k % n_keys`, op cycling upsert/delete by a hash of
k, every 3rd envelope payload-wrapped (Consumer.java:139-140), an
optional malformed record rate for dead-letter testing.  Partition p of
n serves sequence numbers ≡ p (mod n): generation is pure compute per
executor — no driver state, no shared files — which is what lets the
same source scale out arbitrarily (the 100 TB posture for any synthetic
/ replay source).

Streaming offsets: the reader advances `rows_per_batch` sequence
numbers per micro-batch up to `total_rows`, mirroring how the Kafka
source tracks (topic, partition) → offset watermarks.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

WIRE_SCHEMA = (
    "key string, value string, topic string, partition int, offset bigint,"
    " timestamp_ms bigint"
)

_TOPIC = "dbserver1.app.user_state"


def _mix(k: int) -> int:
    """Deterministic 64-bit mix (splitmix64 finalizer) — the op/payload
    chooser; avoids trivially periodic op patterns."""
    z = (k + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4B169) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def make_record(seq: int, n_keys: int, malformed_every: int, n_partitions: int = 4) -> tuple:
    """Envelope for global sequence number ``seq`` (pure function).

    The emitted ``partition`` field matches the reader's actual layout
    (partition p serves seq ≡ p mod n_partitions), so the wire record
    agrees with the physical partitioning for any n_partitions."""
    key = seq % n_keys
    h = _mix(seq)
    is_delete = h % 10 == 0  # ~10% deletes
    v = round((h >> 8) % 100000 / 100.0, 2)
    img = {"id": key, "v": v}
    env = {
        "before": img if is_delete else None,
        "after": None if is_delete else img,
        "source": {"db": "app", "table": "user_state", "ts_ms": seq},
        "op": "d" if is_delete else ("c" if h % 3 == 0 else "u"),
        "ts_ms": seq,
    }
    if h % 3 == 2:  # payload-wrapped variant (Consumer.java:139-140)
        payload = json.dumps({"payload": env})
    else:
        payload = json.dumps(env)
    if malformed_every and seq % malformed_every == malformed_every - 1:
        payload = "{ not json %d" % seq
    return (str(key), payload, _TOPIC, seq % n_partitions, seq, 1704067200000 + seq)


class _Opts:
    def __init__(self, options):
        self.total_rows = int(options.get("total_rows", 1000))
        self.n_keys = int(options.get("n_keys", 50))
        self.n_partitions = int(options.get("n_partitions", 4))
        self.malformed_every = int(options.get("malformed_every", 0))
        self.rows_per_batch = int(options.get("rows_per_batch", 250))


class _Range(InputPartition):
    def __init__(self, lo: int, hi: int, step: int, opts: _Opts):
        self.lo, self.hi, self.step, self.opts = lo, hi, step, opts


def _gen(part: _Range):
    o = part.opts
    for seq in range(part.lo, part.hi, part.step):
        yield make_record(seq, o.n_keys, o.malformed_every, o.n_partitions)


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.opts = _Opts(options)

    def partitions(self):
        n = self.opts.n_partitions
        return [_Range(p, self.opts.total_rows, n, self.opts) for p in range(n)]

    def read(self, partition):
        return _gen(partition)


class _StreamReader(DataSourceStreamReader):
    """Offset-managed micro-batches: {"seq": N} → {"seq": N + rows_per_batch}."""

    def __init__(self, options):
        self.opts = _Opts(options)

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def latestOffset(self) -> dict:
        # In a real connector this polls the broker; here the log is
        # finite, so the head advances one batch per call until done.
        if not hasattr(self, "_head"):
            self._head = 0
        self._head = min(self._head + self.opts.rows_per_batch, self.opts.total_rows)
        return {"seq": self._head}

    def partitions(self, start: dict, end: dict):
        n = self.opts.n_partitions
        return [
            _Range(start["seq"] + p, end["seq"], n, self.opts)
            for p in range(n)
            if start["seq"] + p < end["seq"]
        ]

    def read(self, partition):
        return _gen(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets are positional; nothing to acknowledge

    def stop(self) -> None:
        pass


class DebeziumSynthDataSource(DataSource):
    """`spark.read.format("debezium_synth")` / `spark.readStream.format(...)`.

    Options: total_rows, n_keys, n_partitions, malformed_every,
    rows_per_batch (streaming).
    """

    @classmethod
    def name(cls) -> str:
        return "debezium_synth"

    def schema(self) -> str:
        return WIRE_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _BatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(DebeziumSynthDataSource)
