"""Checkpoint-restart semantics: the exactly-once story SURVEY §2
claims (checkpointed offsets + stateful operators restored across
restarts) exercised for real — a query stops, more data arrives, and a
RESTARTED query with the same checkpoint must (a) process only the new
files and (b) restore its dedup state, so duplicates of keys seen
before the restart are still suppressed."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _run_once(spark, in_dir, out_dir, ckpt):
    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(str(in_dir))
        .dropDuplicates(["user_id", "event_type"])
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_checkpoint_restart_restores_dedup_state(spark, tmp_path):
    in_dir, out_dir, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    in_dir.mkdir()

    first = [(u, t, 1.0) for u in range(10) for t in ("click", "view")]
    spark.createDataFrame(first, SCHEMA).coalesce(1).write.mode("append").parquet(
        str(in_dir)
    )
    _run_once(spark, in_dir, out_dir, ckpt)
    n1 = spark.read.parquet(str(out_dir)).count()
    assert n1 == 20  # every (user, type) key is first-seen

    # Second arrival: 10 duplicates of pre-restart keys + 5 new keys.
    second = [(u, "click", 2.0) for u in range(10)] + [
        (u, "purchase", 3.0) for u in range(5)
    ]
    spark.createDataFrame(second, SCHEMA).coalesce(1).write.mode("append").parquet(
        str(in_dir)
    )
    _run_once(spark, in_dir, out_dir, ckpt)

    out = spark.read.parquet(str(out_dir))
    # State survived the restart: the 10 duplicate keys emitted NOTHING;
    # only the 5 genuinely-new keys appended.
    assert out.count() == 25
    assert out.select("user_id", "event_type").distinct().count() == 25
    # And the duplicates' values prove first-write-wins: every click row
    # carries the FIRST file's value, never the re-delivered 2.0.
    assert out.where((F.col("event_type") == "click") & (F.col("value") != 1.0)).count() == 0


def test_checkpoint_restart_does_not_reprocess_old_files(spark, tmp_path):
    """Offset tracking: a restart with an unchanged input directory is a
    no-op — zero new rows, not a re-emission of the whole input."""
    in_dir, out_dir, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    in_dir.mkdir()
    rows = [(u, "click", 1.0) for u in range(8)]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        str(in_dir)
    )
    _run_once(spark, in_dir, out_dir, ckpt)
    assert spark.read.parquet(str(out_dir)).count() == 8
    _run_once(spark, in_dir, out_dir, ckpt)  # restart, nothing new
    assert spark.read.parquet(str(out_dir)).count() == 8
