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


# ---------------------------------------------------------------------------
# Durable experiment state (r9): the stream_experiment_snapshot fold
# committed through the CDC state-sink protocol must survive a driver
# restart AND absorb a replayed micro-batch idempotently.
# ---------------------------------------------------------------------------

EXP_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _exp_rows(users, day, value):
    import datetime as dt

    ts = dt.datetime(2024, 1, day, 12, 0, 0)
    return [(u, ts, value) for u in users]


def _exp_run_once(spark, in_dir, ckpt, sink):
    from mysql_postgres_debezium_cdc_spark.operators.behavioral import (
        _experiment_fold,
    )

    q = (
        spark.readStream.schema(EXP_SCHEMA)
        .parquet(str(in_dir))
        .writeStream.foreachBatch(
            lambda df, bid: _experiment_fold(sink, df, bid)
        )
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)


def _per_user_rows(sink):
    from mysql_postgres_debezium_cdc_spark.operators.behavioral import (
        _experiment_state_per_user,
    )

    state = sink.read()
    return sorted(
        (r.user_id, r.x, r.y)
        for r in _experiment_state_per_user(state).collect()
    )


def test_experiment_fold_survives_restart_and_replays_idempotently(
    spark, tmp_path
):
    """Kill-and-restart the stream_experiment_snapshot fold: (a) a
    restarted query with the same checkpoint + state sink processes only
    the new file and the recovered snapshot equals the one-shot batch
    answer; (b) a REPLAYED micro-batch (same batch_id — foreachBatch's
    at-least-once redelivery after a crash between fold-commit and
    offset-commit) MERGEs into its own generation instead of
    double-folding, leaving the per-user sums bit-identical."""
    from mysql_postgres_debezium_cdc_spark.operators.behavioral import (
        _experiment_fold,
        _experiment_per_user,
    )
    from mysql_postgres_debezium_cdc_spark.streaming.cdc import ParquetStateSink

    in_dir, ckpt = tmp_path / "in", tmp_path / "ckpt"
    in_dir.mkdir()
    sink = ParquetStateSink(
        spark,
        str(tmp_path / "state"),
        pk_cols=("batch_id", "user_id"),
        row_cols=("x", "y"),
    )

    first = _exp_rows(range(6), day=10, value=1.5)  # pre-cut -> x
    batch0 = spark.createDataFrame(first, EXP_SCHEMA)
    batch0.coalesce(1).write.mode("append").parquet(str(in_dir))
    _exp_run_once(spark, in_dir, ckpt, sink)
    s1 = _per_user_rows(sink)
    assert s1 == [(u, 150, 0) for u in range(6)]

    # (b) replay batch 0 verbatim: the fold must be a self-overwrite.
    n_state = sink.read().count()
    _experiment_fold(sink, batch0, 0)
    assert _per_user_rows(sink) == s1, "replayed batch double-folded"
    assert sink.read().count() == n_state

    # (a) driver "dies"; new data lands; a fresh query restarts from the
    # same checkpoint and the same durable state.
    second = _exp_rows(range(3, 9), day=20, value=2.0)  # post-cut -> y
    spark.createDataFrame(second, EXP_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    _exp_run_once(spark, in_dir, ckpt, sink)

    everything = spark.createDataFrame(first + second, EXP_SCHEMA)
    expected = sorted(
        (r.user_id, r.x, r.y)
        for r in _experiment_per_user(everything).collect()
    )
    assert _per_user_rows(sink) == expected


def test_srm_monitor_set_union_state_replays_idempotently(spark, tmp_path):
    """The SRM guardrail's set-union state needs NO generation keying:
    a replayed micro-batch upserts the same user keys (state unchanged),
    and a restarted query folding NEW users across a checkpoint gap
    yields exactly the distinct-user arm counts of the one-shot batch."""
    from mysql_postgres_debezium_cdc_spark.operators.behavioral import _srm_fold
    from mysql_postgres_debezium_cdc_spark.streaming.cdc import ParquetStateSink

    sink = ParquetStateSink(
        spark, str(tmp_path / "state"), pk_cols=("user_id",), row_cols=("arm",)
    )
    batch0 = spark.createDataFrame(
        _exp_rows([1, 2, 3, 4, 5], day=10, value=1.0), EXP_SCHEMA
    )
    _srm_fold(sink, batch0, 0)
    s1 = sorted((r.user_id, r.arm) for r in sink.read().collect())
    assert s1 == [(u, u % 2) for u in [1, 2, 3, 4, 5]]

    _srm_fold(sink, batch0, 0)  # replay: same batch redelivered
    assert sorted((r.user_id, r.arm) for r in sink.read().collect()) == s1

    # post-"restart" batch: 2 repeat users (already first-seen) + 3 new
    batch1 = spark.createDataFrame(
        _exp_rows([4, 5, 6, 7, 8], day=20, value=2.0), EXP_SCHEMA
    )
    _srm_fold(sink, batch1, 1)
    assert sorted((r.user_id, r.arm) for r in sink.read().collect()) == [
        (u, u % 2) for u in range(1, 9)
    ]


def test_experiment_state_compaction_preserves_sums_and_bounds_generations(
    spark, tmp_path
):
    """Generation compaction: folding batches at or below the committed
    horizon into the base generation (batch_id = -1) via one atomic
    MERGE leaves the per-user sums bit-identical, shrinks the state to
    base + above-horizon generations, keeps above-horizon replays
    idempotent, and refolds its own base cleanly on the next pass."""
    from mysql_postgres_debezium_cdc_spark.operators.behavioral import (
        _experiment_fold,
        _experiment_state_compact,
    )
    from mysql_postgres_debezium_cdc_spark.streaming.cdc import ParquetStateSink

    sink = ParquetStateSink(
        spark,
        str(tmp_path / "state"),
        pk_cols=("batch_id", "user_id"),
        row_cols=("x", "y"),
    )
    batches = [
        spark.createDataFrame(_exp_rows(range(6), day=10, value=1.5), EXP_SCHEMA),
        spark.createDataFrame(_exp_rows(range(3, 9), day=20, value=2.0), EXP_SCHEMA),
        spark.createDataFrame(_exp_rows(range(0, 3), day=21, value=3.0), EXP_SCHEMA),
    ]
    for i, b in enumerate(batches):
        _experiment_fold(sink, b, i)
    before = _per_user_rows(sink)

    _experiment_state_compact(sink, horizon=1)  # batches 0 and 1 committed
    assert _per_user_rows(sink) == before
    gens = sorted(r.batch_id for r in sink.read().select("batch_id").distinct().collect())
    assert gens == [-1, 2], gens

    # a replay of the ABOVE-horizon batch is still a self-overwrite
    _experiment_fold(sink, batches[2], 2)
    assert _per_user_rows(sink) == before

    # the next compaction pass refolds the base generation with batch 2
    _experiment_state_compact(sink, horizon=2)
    assert _per_user_rows(sink) == before
    gens = sorted(r.batch_id for r in sink.read().select("batch_id").distinct().collect())
    assert gens == [-1], gens


def test_live_fold_compacts_in_run_and_bounds_generations(spark, tmp_path):
    """The compaction cadence WIRED INTO the live fold (r10, VERDICT r9
    task #2): a real file-source stream drained through
    _experiment_fold_with_compaction (the exact foreachBatch
    stream_experiment_snapshot runs) must invoke compaction in-run, so
    after STREAM_EXP_SLICES micro-batches the state holds only the base
    generation plus the above-horizon tail — never one generation per
    batch — while the per-user sums stay bit-identical to the one-shot
    batch answer."""
    from mysql_postgres_debezium_cdc_spark.operators.behavioral import (
        STREAM_EXP_COMPACT_EVERY,
        STREAM_EXP_SLICES,
        _experiment_fold_with_compaction,
        _experiment_per_user,
    )
    from mysql_postgres_debezium_cdc_spark.streaming.cdc import ParquetStateSink

    in_dir, ckpt = tmp_path / "in", tmp_path / "ckpt"
    in_dir.mkdir()
    all_rows = []
    for i in range(STREAM_EXP_SLICES):
        rows = _exp_rows(range(3 * i, 3 * i + 6), day=10 + i, value=1.0 + i)
        all_rows += rows
        spark.createDataFrame(rows, EXP_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))
    sink = ParquetStateSink(
        spark,
        str(tmp_path / "state"),
        pk_cols=("batch_id", "user_id"),
        row_cols=("x", "y"),
    )
    q = (
        spark.readStream.schema(EXP_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
        .writeStream.foreachBatch(
            lambda df, bid: _experiment_fold_with_compaction(sink, df, bid)
        )
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    assert q.exception() is None

    gens = sorted(
        r.batch_id for r in sink.read().select("batch_id").distinct().collect()
    )
    # base generation + everything above the last compaction horizon
    last_compact = ((STREAM_EXP_SLICES - 1) // STREAM_EXP_COMPACT_EVERY) * (
        STREAM_EXP_COMPACT_EVERY
    )
    expected_gens = [-1] + list(range(last_compact, STREAM_EXP_SLICES))
    assert gens == expected_gens, (gens, expected_gens)
    assert len(gens) <= STREAM_EXP_COMPACT_EVERY + 2 < STREAM_EXP_SLICES + 1

    everything = spark.createDataFrame(all_rows, EXP_SCHEMA)
    expected = sorted(
        (r.user_id, r.x, r.y) for r in _experiment_per_user(everything).collect()
    )
    assert _per_user_rows(sink) == expected


def test_crash_between_fold_and_compact_replays_cleanly(spark, tmp_path):
    """ADVICE r10: _experiment_fold_with_compaction issues TWO sink
    commits per compaction batch (the fold MERGE, then the compact
    MERGE); a crash in the window between them leaves a
    folded-but-uncompacted state, and correctness across the restart
    rests on each merge being individually replay-idempotent.  Pin that
    invariant: fold batch N WITHOUT its compaction (the crash), then
    redeliver batch N through the full fold-with-compaction (the
    restart) — per-user sums must equal the one-shot answer and the
    deferred compaction must land as if the crash never happened."""
    from mysql_postgres_debezium_cdc_spark.operators.behavioral import (
        STREAM_EXP_COMPACT_EVERY,
        _experiment_fold,
        _experiment_fold_with_compaction,
        _experiment_per_user,
    )
    from mysql_postgres_debezium_cdc_spark.streaming.cdc import ParquetStateSink

    sink = ParquetStateSink(
        spark,
        str(tmp_path / "state"),
        pk_cols=("batch_id", "user_id"),
        row_cols=("x", "y"),
    )
    crash_bid = STREAM_EXP_COMPACT_EVERY  # first batch that compacts
    batches = [
        spark.createDataFrame(
            _exp_rows(range(3 * i, 3 * i + 6), day=10 + i, value=1.0 + i),
            EXP_SCHEMA,
        )
        for i in range(crash_bid + 1)
    ]
    for bid in range(crash_bid):
        _experiment_fold_with_compaction(sink, batches[bid], bid)

    # the crash: batch N's fold commit lands, its compact commit does not
    _experiment_fold(sink, batches[crash_bid], crash_bid)
    gens_crashed = sorted(
        r.batch_id for r in sink.read().select("batch_id").distinct().collect()
    )
    assert crash_bid - 1 in gens_crashed  # uncompacted evidence of the window

    # the restart: foreachBatch redelivers the SAME batch_id through the
    # full cadence — the fold self-overwrites, the compaction catches up
    _experiment_fold_with_compaction(sink, batches[crash_bid], crash_bid)

    everything = batches[0]
    for b in batches[1:]:
        everything = everything.unionByName(b)
    expected = sorted(
        (r.user_id, r.x, r.y) for r in _experiment_per_user(everything).collect()
    )
    assert _per_user_rows(sink) == expected
    gens = sorted(
        r.batch_id for r in sink.read().select("batch_id").distinct().collect()
    )
    assert gens == [-1, crash_bid], gens  # horizon N-1 folded, N's gen kept


def test_dedup_pair_fold_replays_idempotently(spark, tmp_path):
    """stream_incremental_dedup's pair accumulator (r10, VERDICT r9
    task #3): set-shaped pair state MERGEd on the natural pk
    (new_doc, dup_doc) absorbs an at-least-once redelivered micro-batch
    as a self-overwrite — the drained state equals the single-delivery
    union, never a double-append."""
    from mysql_postgres_debezium_cdc_spark.llm.dedup import _dedup_pair_fold
    from mysql_postgres_debezium_cdc_spark.streaming.cdc import ParquetStateSink

    sink = ParquetStateSink(
        spark,
        str(tmp_path / "state"),
        pk_cols=("new_doc", "dup_doc"),
        row_cols=("jaccard",),
    )
    pairs0 = spark.createDataFrame(
        [(13, 2, 0.9), (13, 4, 0.85), (23, 2, 0.8)],
        "new_doc bigint, dup_doc bigint, jaccard double",
    )
    _dedup_pair_fold(sink, pairs0, 0)
    s1 = sorted(map(tuple, sink.read().select("new_doc", "dup_doc", "jaccard").collect()))
    assert s1 == [(13, 2, 0.9), (13, 4, 0.85), (23, 2, 0.8)]
    n_versions = sink.latest_seq()

    # replay: crash between pair-commit and offset-commit redelivers
    # batch 0 verbatim -> MERGE self-overwrite, state unchanged
    _dedup_pair_fold(sink, pairs0, 0)
    assert (
        sorted(map(tuple, sink.read().select("new_doc", "dup_doc", "jaccard").collect()))
        == s1
    )
    assert sink.latest_seq() == n_versions + 1  # a commit happened...
    assert sink.read().count() == 3  # ...but appended nothing

    # next batch: disjoint new_doc cohort unions in
    _dedup_pair_fold(
        sink,
        spark.createDataFrame(
            [(33, 7, 0.95)], "new_doc bigint, dup_doc bigint, jaccard double"
        ),
        1,
    )
    assert sorted(
        map(tuple, sink.read().select("new_doc", "dup_doc", "jaccard").collect())
    ) == s1 + [(33, 7, 0.95)]


def test_streaming_twins_reclaim_run_dirs(spark):
    """VERDICT r9 task #4: the run-scoped /tmp state+checkpoint dirs the
    three streaming twins create must be gone after the twin returns —
    a double invocation leaves zero orphans."""
    import glob
    import tempfile

    from mysql_postgres_debezium_cdc_spark.registry import all_queries

    pattern = f"{tempfile.gettempdir()}/spark_graft_stream_*"
    before = set(glob.glob(pattern))
    qs = all_queries()
    sf = "/root/testdata/sf0.001"
    for key in (
        "stream_experiment_snapshot",
        "stream_srm_monitor",
        "stream_incremental_dedup",
    ):
        for _ in range(2):
            qs[key].fn(spark, sf).collect()
    spark.catalog.clearCache()
    leaked = set(glob.glob(pattern)) - before
    assert leaked == set(), leaked
