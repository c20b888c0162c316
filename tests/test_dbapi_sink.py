"""DBAPI keyed sink: SQL construction parity (W1/W2) + end-to-end
upsert/delete against a real sqlite database (sqlite speaks
``ON CONFLICT … DO UPDATE SET … EXCLUDED.*``, same dialect as the
reference's Postgres sink, Consumer.java:210-211)."""

from __future__ import annotations

import functools
import sqlite3

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from mysql_postgres_debezium_cdc_spark.sinks import (
    DbapiKeyedSink,
    build_delete_sql,
    build_upsert_sql,
    duckdb_connection_factory,
)
from mysql_postgres_debezium_cdc_spark.sources.debezium import decode_envelope
from mysql_postgres_debezium_cdc_spark.streaming.cdc import compact, with_change_columns

ROW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def test_upsert_sql_shape():
    sql = build_upsert_sql("Customers", ["ID", "First_Name", "email"], ["id"])
    assert sql == (
        "INSERT INTO customers (id, first_name, email) VALUES (?, ?, ?) "
        "ON CONFLICT (id) DO UPDATE SET first_name = EXCLUDED.first_name, "
        "email = EXCLUDED.email"
    )


def test_upsert_sql_all_pk_degenerates_to_do_nothing():
    # Consumer.java:228-230: a table whose every column is the key
    sql = build_upsert_sql("t", ["a", "b"], ["a", "b"])
    assert sql.endswith("ON CONFLICT (a, b) DO NOTHING")


def test_delete_sql_multi_pk():
    assert build_delete_sql("T", ["A", "b"]) == "DELETE FROM t WHERE a = ? AND b = ?"


def test_unsafe_identifier_rejected():
    with pytest.raises(ValueError):
        build_upsert_sql("t; DROP TABLE x", ["a"], ["a"])
    with pytest.raises(ValueError):
        build_delete_sql("t", ["a = 1 OR"])


@pytest.mark.parametrize(
    "paramstyle,ph",
    [("qmark", "?"), ("format", "%s")],  # sqlite3 | psycopg2/pg8000 (Postgres)
)
def test_dialect_matrix_statement_text(paramstyle, ph):
    """Per-dialect statement text, asserted exactly without a live
    Postgres: identifier lower-casing (Consumer.java:208-210), PK
    exclusion from the SET list (:225), the all-PK DO NOTHING
    degenerate (:228-230), and the driver's placeholder style.  The
    reference's sink statement (Consumer.java:210-211) is the
    ``format``-dialect row of this matrix."""
    up = build_upsert_sql("Customers", ["ID", "First_Name", "email"], ["id"], paramstyle)
    assert up == (
        f"INSERT INTO customers (id, first_name, email) VALUES ({ph}, {ph}, {ph}) "
        "ON CONFLICT (id) DO UPDATE SET first_name = EXCLUDED.first_name, "
        "email = EXCLUDED.email"
    )
    assert build_upsert_sql("t", ["A", "B"], ["a", "b"], paramstyle) == (
        f"INSERT INTO t (a, b) VALUES ({ph}, {ph}) ON CONFLICT (a, b) DO NOTHING"
    )
    assert build_delete_sql("T", ["A", "b"], paramstyle) == (
        f"DELETE FROM t WHERE a = {ph} AND b = {ph}"
    )


def test_unknown_paramstyle_rejected():
    with pytest.raises(ValueError, match="paramstyle"):
        build_upsert_sql("t", ["a"], ["a"], paramstyle="pyformat")


def test_format_dialect_executes_against_dbapi():
    """The format-dialect statements must be executable by a DBAPI
    driver that uses %s placeholders.  No Postgres in the sandbox, so a
    minimal paramstyle-converting shim over sqlite3 stands in: it
    translates %s -> ? at execute time (exactly what psycopg2 does in
    reverse against the Postgres wire protocol), proving the emitted
    text + parameter arity line up for a format-style driver."""
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE customers (id INTEGER PRIMARY KEY, first_name TEXT, email TEXT)")

    def execmany(sql, rows):
        con.executemany(sql.replace("%s", "?"), rows)

    up = build_upsert_sql("customers", ["id", "first_name", "email"], ["id"], "format")
    execmany(up, [(1, "a", "a@x"), (1, "a2", "a2@x"), (2, "b", "b@x")])
    dele = build_delete_sql("customers", ["id"], "format")
    execmany(dele, [(2,)])
    rows = con.execute("SELECT id, first_name FROM customers ORDER BY id").fetchall()
    assert rows == [(1, "a2")]
    con.close()


def _envelopes(spark, rows):
    """rows: list of (op, id, name, score, offset) → raw Kafka-shaped DF."""
    data = []
    for op, id_, name, score, off in rows:
        img = {"id": id_, "name": name, "score": score}
        env = {
            "before": img if op == "d" else None,
            "after": None if op == "d" else img,
            "source": {"db": "app", "table": "people", "ts_ms": 0},
            "op": op,
            "ts_ms": 0,
        }
        import json

        data.append((json.dumps(env), off))
    return spark.createDataFrame(data, "value string, offset long")


def _sink_state(db_path):
    with sqlite3.connect(db_path) as conn:
        return sorted(conn.execute("SELECT id, name, score FROM people").fetchall())


def _apply(spark, db_path, rows):
    raw = _envelopes(spark, rows)
    events = with_change_columns(decode_envelope(raw, ROW_SCHEMA))
    batch = compact(events, ["id"])
    sink = DbapiKeyedSink(
        functools.partial(sqlite3.connect, db_path),
        "people",
        pk_cols=["id"],
        row_cols=["id", "name", "score"],
        n_partitions=1,  # sqlite: single writer
    )
    sink.apply(batch)


def test_end_to_end_upsert_update_delete(spark, tmp_path):
    db = str(tmp_path / "sink.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE people (id INTEGER PRIMARY KEY, name TEXT, score REAL)")

    _apply(
        spark,
        db,
        [
            ("c", 1, "ann", 1.0, 10),
            ("c", 2, "bob", 2.0, 11),
            ("u", 1, "ann2", 1.5, 12),  # same batch: update wins over insert (offset)
            ("c", 3, "cat", 3.0, 13),
            ("d", 3, "cat", 3.0, 14),  # insert-then-delete in one batch → absent
        ],
    )
    assert _sink_state(db) == [(1, "ann2", 1.5), (2, "bob", 2.0)]

    # second batch: update existing, delete existing, insert new
    _apply(
        spark,
        db,
        [
            ("u", 2, "bob2", 2.5, 20),
            ("d", 1, "ann2", 1.5, 21),
            ("r", 4, "dee", 4.0, 22),  # snapshot read = upsert (Consumer.java:175-178)
        ],
    )
    assert _sink_state(db) == [(2, "bob2", 2.5), (4, "dee", 4.0)]


def test_replay_is_idempotent(spark, tmp_path):
    """At-least-once replay converges — the property that lets the
    reference (and us) skip two-phase commit."""
    db = str(tmp_path / "sink.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE people (id INTEGER PRIMARY KEY, name TEXT, score REAL)")
    rows = [("c", 1, "ann", 1.0, 10), ("u", 1, "ann2", 1.5, 11), ("d", 2, "x", 0.0, 12)]
    _apply(spark, db, rows)
    first = _sink_state(db)
    _apply(spark, db, rows)  # replay the same batch
    assert _sink_state(db) == first == [(1, "ann2", 1.5)]


def test_streaming_foreachbatch_into_dbapi_sink(spark, tmp_path):
    """Full streaming topology ending in the SQL sink: file stream →
    foreachBatch(decode → compact → DbapiKeyedSink.apply) → sqlite —
    the reference's consumer loop with its Postgres sink swapped for a
    DBAPI target."""
    db = str(tmp_path / "sink.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE people (id INTEGER PRIMARY KEY, name TEXT, score REAL)")

    import json

    rows = []
    for i in range(30):
        key = i % 10
        img = {"id": key, "name": f"n{i}", "score": float(i)}
        env = {
            "before": img if (i >= 20 and key % 3 == 0) else None,
            "after": None if (i >= 20 and key % 3 == 0) else img,
            "source": {"db": "app", "table": "people", "ts_ms": 0},
            "op": "d" if (i >= 20 and key % 3 == 0) else "u",
            "ts_ms": 0,
        }
        rows.append((json.dumps(env), i))
    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame(rows, "value string, offset long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src))

    sink = DbapiKeyedSink(
        functools.partial(sqlite3.connect, db),
        "people",
        pk_cols=["id"],
        row_cols=["id", "name", "score"],
        n_partitions=1,
    )

    def sink_batch(batch_df, _bid):
        events = with_change_columns(decode_envelope(batch_df, ROW_SCHEMA))
        sink.apply(compact(events, ["id"]))

    stream = spark.readStream.schema("value string, offset long").parquet(str(src))
    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    state = _sink_state(db)
    # keys 0,3,6,9 deleted in the final wave (i>=20, key%3==0); keys
    # 1,2,4,5,7,8 hold their last-written version
    expected_keys = {1, 2, 4, 5, 7, 8}
    assert {r[0] for r in state} == expected_keys
    for key, name, score in state:
        last_i = max(i for i in range(30) if i % 10 == key)
        assert name == f"n{last_i}" and score == float(last_i)


def test_end_to_end_against_duckdb_postgres_grammar(spark, tmp_path):
    """Second REAL engine for the sink e2e: DuckDB speaks the
    Postgres-flavored ``INSERT … ON CONFLICT (pk) DO UPDATE SET c =
    EXCLUDED.c`` grammar the reference emits (Consumer.java:210-230) —
    unlike sqlite, whose ON CONFLICT support is its own dialect that
    happens to overlap.  Running the identical decode→compact→sink
    pipeline into DuckDB exercises EXCLUDED resolution, identifier
    folding, and executemany batching against a Postgres-grammar
    engine, which is as close to the reference's actual Postgres sink
    as this container gets."""
    import duckdb

    # duckdb.connect itself is unpicklable (PyCapsule); ship a wrapper
    # whose body imports on the executor instead.
    db = str(tmp_path / "sink.duckdb")
    with duckdb.connect(db) as conn:
        conn.execute("CREATE TABLE people (id INTEGER PRIMARY KEY, name TEXT, score DOUBLE)")

    def apply(rows):
        raw = _envelopes(spark, rows)
        events = with_change_columns(decode_envelope(raw, ROW_SCHEMA))
        batch = compact(events, ["id"])
        sink = DbapiKeyedSink(
            functools.partial(duckdb_connection_factory, db),
            "people",
            pk_cols=["id"],
            row_cols=["id", "name", "score"],
            n_partitions=1,  # one writer: duckdb files are single-writer
        )
        sink.apply(batch)

    def state():
        with duckdb.connect(db) as conn:
            return sorted(conn.execute("SELECT id, name, score FROM people").fetchall())

    batch1 = [
        ("c", 1, "ann", 1.0, 10),
        ("c", 2, "bob", 2.0, 11),
        ("u", 1, "ann2", 1.5, 12),
        ("c", 3, "cat", 3.0, 13),
        ("d", 3, "cat", 3.0, 14),
    ]
    apply(batch1)
    assert state() == [(1, "ann2", 1.5), (2, "bob", 2.0)]
    apply(batch1)  # replay converges (idempotent merge)
    assert state() == [(1, "ann2", 1.5), (2, "bob", 2.0)]
    apply([("u", 2, "bob2", 2.5, 20), ("d", 1, "ann2", 1.5, 21), ("r", 4, "dee", 4.0, 22)])
    assert state() == [(2, "bob2", 2.5), (4, "dee", 4.0)]
