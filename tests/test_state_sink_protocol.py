"""State-sink protocol conformance (VERDICT r3 #9).

One scenario, run against every sink implementation: insert → update +
delete + insert → time-travel.  ParquetStateSink is the reference
implementation (always runs); DeltaStateSink runs when delta-spark is
importable (not in this harness) — the point is that BOTH classes are
pinned to the same observable contract, so swapping sinks on a cluster
is a constructor change, not a semantics change.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from mysql_postgres_debezium_cdc_spark.sources.debezium import decode_envelope
from mysql_postgres_debezium_cdc_spark.streaming.cdc import (
    DeltaStateSink,
    ParquetStateSink,
    compact,
    has_delta,
    with_change_columns,
)

ROW_SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
)


def _compacted(spark, records):
    """records: list of (op, id, name, offset) → compacted batch frame."""
    rows = []
    for op, id_, name, off in records:
        row = {"id": id_, "name": name}
        e = {
            "before": row if op == "d" else None,
            "after": None if op == "d" else row,
            "source": {"db": "app", "table": "t", "ts_ms": 1},
            "op": op,
            "ts_ms": 1,
        }
        rows.append((json.dumps(e), "dbserver1.app.t", off))
    raw = spark.createDataFrame(rows, "value string, topic string, offset long")
    return compact(with_change_columns(decode_envelope(raw, ROW_SCHEMA)), ["id"])


def _state(sink, version=None):
    df = sink.read(version)
    return {r["id"]: r["name"] for r in df.collect()} if df is not None else None


SINKS = [
    pytest.param("parquet", id="parquet"),
    pytest.param(
        "delta",
        id="delta",
        marks=pytest.mark.skipif(not has_delta(), reason="delta-spark not installed"),
    ),
]


def _make_sink(kind, spark, root):
    cls = {"parquet": ParquetStateSink, "delta": DeltaStateSink}[kind]
    return cls(spark, root, ["id"], ["name"], retain=2)


@pytest.mark.parametrize("kind", SINKS)
def test_sink_protocol_merge_read_versions(kind, spark, tmp_path):
    sink = _make_sink(kind, spark, str(tmp_path / "state"))

    # Pre-commit: empty protocol state.
    assert sink.read() is None
    assert sink.versions() == []
    assert sink.latest_seq() == -1

    # Commit 1: two inserts.
    sink.merge(_compacted(spark, [("c", 1, "a", 0), ("c", 2, "b", 1)]))
    assert _state(sink) == {1: "a", 2: "b"}
    seq1 = sink.latest_seq()
    assert seq1 >= 0

    # Commit 2: update 1, delete 2, insert 3 — one batch.
    sink.merge(
        _compacted(spark, [("u", 1, "a2", 2), ("d", 2, None, 3), ("c", 3, "c", 4)])
    )
    assert _state(sink) == {1: "a2", 3: "c"}
    seq2 = sink.latest_seq()
    assert seq2 > seq1
    assert len(sink.versions()) >= 2

    # Time travel: absolute seq and relative addressing both reach the
    # pre-batch-2 state.
    assert _state(sink, version=seq1) == {1: "a", 2: "b"}
    assert _state(sink, version=-2) == {1: "a", 2: "b"}

    # Unknown version raises, never silently returns the wrong snapshot.
    with pytest.raises(IndexError):
        sink.read(version=seq2 + 100)


@pytest.mark.parametrize("kind", SINKS)
def test_sink_protocol_delete_only_batch_and_reinsert(kind, spark, tmp_path):
    sink = _make_sink(kind, spark, str(tmp_path / "state"))
    sink.merge(_compacted(spark, [("c", 1, "a", 0)]))
    sink.merge(_compacted(spark, [("d", 1, None, 1)]))
    assert _state(sink) == {}
    # Re-insert after delete lands as a fresh row (reference replays do this).
    sink.merge(_compacted(spark, [("c", 1, "a3", 2)]))
    assert _state(sink) == {1: "a3"}


def test_delta_sink_requires_delta(spark, tmp_path):
    if has_delta():
        pytest.skip("delta-spark installed; import guard not reachable")
    with pytest.raises(ImportError):
        DeltaStateSink(spark, str(tmp_path / "d"), ["id"], ["name"])


# ---------------------------------------------------------------------------
# r9: property test — ANY sequence of envelope batches drained through the
# sink equals a single-threaded dict reference applying Debezium op
# semantics (last offset per key wins; c/r/u upsert, d delete), and the
# retained time-travel version equals the reference one commit back.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

record_strategy = st.tuples(
    st.sampled_from(["c", "u", "d"]),
    st.integers(min_value=0, max_value=5),  # id (small space -> collisions)
    st.sampled_from(["a", "b", "c", "dd"]),  # name
)
batches_strategy = st.lists(
    st.lists(record_strategy, min_size=1, max_size=6), min_size=1, max_size=4
)


def _ref_apply(state: dict, batch, offset0: int) -> int:
    """Single-threaded reference: records carry increasing offsets; the
    LAST record per id in the batch wins (compact's max_by contract)."""
    last = {}
    off = offset0
    for op, id_, name in batch:
        last[id_] = (op, name)
        off += 1
    for id_, (op, name) in last.items():
        if op == "d":
            state.pop(id_, None)
        else:
            state[id_] = name
    return off


@settings(
    max_examples=5, deadline=None, derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(batches=batches_strategy)
def test_sink_merge_matches_dict_reference_for_any_batch_sequence(
    spark, tmp_path_factory, batches
):
    import uuid

    root = str(tmp_path_factory.mktemp("sinkprop") / uuid.uuid4().hex)
    sink = ParquetStateSink(spark, root, ["id"], ["name"], retain=2)
    ref: dict = {}
    prev_ref = None
    off = 0
    for i, batch in enumerate(batches):
        records = []
        o = off
        for op, id_, name in batch:
            records.append((op, id_, None if op == "d" else name, o))
            o += 1
        sink.merge(_compacted(spark, records))
        prev_ref, ref = dict(ref), ref
        off = _ref_apply(ref, batch, off)
        assert _state(sink) == ref, (i, batch)
        if i >= 1:
            assert _state(sink, -2) == prev_ref, (i, "time-travel -2")
