#!/usr/bin/env python
"""100x scaling probe for round 12 (VERDICT r11 task #4).

One probe: events_experiment_report at 100x EVENTS — the composed
experiment readout is the one experiment-family key without a direct
scale stamp.  Its constituents all have one (winsorized 1.3x, snapshot
1.4x, SRM monitor 2.4x, sequential pair 1.5x/2.3x), but the composition
adds the persisted per-user relation feeding five statistic branches
plus the two-sample distinct-value grid, so the claim deserves its own
number.  Expectation: <= ~3x wall for 100x events (the battery
envelope).

Replication recipe (ADVICE r11 #2): the 100 disjoint-user replicas are
built with ONE crossJoin against a 0..99 replica-index range —
`id + rep * n` — instead of the r9-r11 chain of 100 unionByName calls,
which produced a 100-way nested plan that was slow to analyze.  Same
data, flat plan.  The offset scheme assumes non-negative ids, so the
probe now ASSERTS min(id) >= 0 instead of silently overlapping replicas
on sparse-negative ids (the second half of the same ADVICE item).

Timing: one warmup pass per (key, scale) then one steady-state
measurement, clearing the SQL cache between runs (bench.py protocol).
Run on a QUIET box (no concurrent pytest/drift-audit — PLANS.md r11
records 3-15x wall inflation under load); record /proc/loadavg first.
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")

from mysql_postgres_debezium_cdc_spark.registry import all_queries
from mysql_postgres_debezium_cdc_spark.session import get_session
from mysql_postgres_debezium_cdc_spark.sources.parquet import load

SF_DIR = "/root/testdata/sf0.1"
ROOT = "/tmp/spark_graft_probe100x_r12"
REPS = 100


def _replicate_events(spark, out: str) -> None:
    """100 disjoint-user replicas of sf0.1 events via one flat crossJoin."""
    ev = load(spark, SF_DIR, "events")
    mins = ev.agg(
        F.min("event_id"), F.max("event_id"), F.min("user_id"), F.max("user_id")
    ).collect()[0]
    assert mins[0] >= 0 and mins[2] >= 0, "offset scheme assumes ids >= 0"
    n_events, n_users = mins[1] + 1, mins[3] + 1
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    out_df = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("event_id") + F.col("rep") * F.lit(n_events)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("rep") * F.lit(n_users)).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    out_df.repartition(64).write.mode("overwrite").parquet(f"{out}/events.parquet")
    print(
        f"{out}: {spark.read.parquet(f'{out}/events.parquet').count()} events",
        flush=True,
    )


def _time_key(spark, qs, key: str, d: str) -> tuple[float, int]:
    fn = qs[key].fn
    fn(spark, d).write.format("noop").mode("overwrite").save()  # warmup
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    n = fn(spark, d).count()
    wall = time.perf_counter() - t0
    spark.catalog.clearCache()
    return wall, n


def _replicate_embeddings(spark, out: str) -> None:
    """100 EXACT copies of every sf0.1 vector (vec_id offset by n per
    replica) — the deliberately DUP-SATURATED stress case for the LSH
    pair path: every bucket's width grows 100×, the true pair
    population grows ~10⁴× (each 100-copy family alone is C(100,2)
    pairs), and the registered key's max_bucket_width cap must bound
    both the inline expansion and the output."""
    emb = load(spark, SF_DIR, "embeddings")
    mx = emb.agg(F.min("vec_id"), F.max("vec_id")).collect()[0]
    assert mx[0] >= 0, "offset scheme assumes ids >= 0"
    n = mx[1] + 1
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("rep") * F.lit(n)).alias("vec_id"),
        "embedding",
    ).repartition(64).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    print(
        f"{out}: {spark.read.parquet(f'{out}/embeddings.parquet').count()} vectors",
        flush=True,
    )


def main() -> None:
    spark = get_session("probe100x_r12")
    ev_dir = f"{ROOT}/events"
    _replicate_events(spark, ev_dir)

    qs = all_queries()
    # Beyond the VERDICT #4 target: the reference-core CDC pair and the
    # sessionizer are long-standing bench keys without a direct 100x
    # stamp — all three read the events table, so the same replicas
    # serve.  cdc_lastwrite_materialize is THE reference standing query
    # (decode → compact → apply); its state is keyed by id, linear in
    # the changelog.  cdc_offset_range_diff is one decode + one keyed
    # aggregate.  events_sessionize_gap windows per-user — user-scale
    # partitions, never a global sort.
    for key in (
        "events_experiment_report",
        "cdc_lastwrite_materialize",
        "cdc_offset_range_diff",
        "events_sessionize_gap",
    ):
        w1, n1 = _time_key(spark, qs, key, SF_DIR)
        w100, n100 = _time_key(spark, qs, key, ev_dir)
        print(
            f"{key}: 1x={w1:.2f}s ({n1} rows) | 100x={w100:.2f}s "
            f"({n100} rows) | wall_ratio={w100 / w1:.1f}x",
            flush=True,
        )

    # r12.2: re-stamp dedup_embedding_lsh after the vectorized
    # signature kernel, on the dup-saturated replicas (the media-LSH
    # probe's stress story applied to the embedding path).
    emb_dir = f"{ROOT}/embeddings"
    _replicate_embeddings(spark, emb_dir)
    w1, n1 = _time_key(spark, qs, "dedup_embedding_lsh", SF_DIR)
    w100, n100 = _time_key(spark, qs, "dedup_embedding_lsh", emb_dir)
    print(
        f"dedup_embedding_lsh: 1x={w1:.2f}s ({n1} pairs) | "
        f"100x={w100:.2f}s ({n100} pairs) | wall_ratio={w100 / w1:.1f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
