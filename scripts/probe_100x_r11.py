#!/usr/bin/env python
"""100x scaling probes for round 11 (VERDICT r10 tasks #3/#4).

Two probes, reusing the established distribution-preserving recipes:

- events_experiment_winsorized at 100x EVENTS (the r9/r10 battery
  recipe: 100 replicas of sf0.1 events with disjoint event_id/user_id
  offsets, so the user population — the winsorized key's banded
  percentile grid is USER-scale — grows 100x).  This is the one r10
  key that shipped without an empirical scale stamp; expectation is
  the battery envelope (<= ~3x wall for 100x users).

- rag_bm25_topk at 100x DOCUMENTS (verbatim replicas, disjoint doc_id
  ranges; the query cohort stays the replica-0 docs).  The r10 probe
  measured 31x wall here because every stopword-grade posting list
  grew 100x and all of them flowed into scoring; the r11 score-neutral
  df-cap (classic floored idf: 2*df >= n_docs terms pruned from the
  broadcast query side) should collapse that to the corpus-linear
  inverted-index build plus rare-term postings only.

Timing: one warmup pass per (key, scale) then one steady-state
measurement, clearing the SQL cache between runs (bench.py protocol).
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
ROOT = "/tmp/spark_graft_probe100x_r11"
REPS = 100


def _replicate_events(spark, out: str) -> None:
    ev = load(spark, SF_DIR, "events")
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_events = ev.agg(F.max("event_id")).collect()[0][0] + 1
    reps = None
    for i in range(REPS):
        r = ev.select(
            (F.col("event_id") + F.lit(i * n_events)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(i * n_users)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        reps = r if reps is None else reps.unionByName(r)
    reps.repartition(64).write.mode("overwrite").parquet(f"{out}/events.parquet")
    print(
        f"{out}: {spark.read.parquet(f'{out}/events.parquet').count()} events",
        flush=True,
    )


def _replicate_docs(spark, out: str) -> None:
    docs = load(spark, SF_DIR, "documents")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = None
    for i in range(REPS):
        r = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_docs))
        reps = r if reps is None else reps.unionByName(r)
    reps.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print(
        f"{out}: {spark.read.parquet(f'{out}/documents.parquet').count()} docs",
        flush=True,
    )


def _time_key(spark, qs, key: str, d: str) -> tuple[float, int]:
    fn = qs[key].fn
    fn(spark, d).write.format("noop").mode("overwrite").save()  # warmup
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fn(spark, d).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    spark.catalog.clearCache()
    n = fn(spark, d).count()
    spark.catalog.clearCache()
    return wall, n


def main() -> None:
    spark = get_session("probe100x_r11")
    ev_dir, rag_dir = f"{ROOT}/events", f"{ROOT}/rag"
    _replicate_events(spark, ev_dir)
    _replicate_docs(spark, rag_dir)

    qs = all_queries()
    for key, hundred in (
        ("events_experiment_winsorized", ev_dir),
        ("rag_bm25_topk", rag_dir),
        # the durable streaming twins (bench-flagged in r11): 100x events
        # through the real availableNow micro-batch folds — the claim is
        # per-batch O(batch + |users|) with the corpus never re-scanned,
        # so wall should scale with the fold volume, not the machinery
        ("stream_experiment_snapshot", ev_dir),
        ("stream_srm_monitor", ev_dir),
    ):
        w1, n1 = _time_key(spark, qs, key, SF_DIR)
        w100, n100 = _time_key(spark, qs, key, hundred)
        print(
            f"{key}: 1x={w1:.2f}s ({n1} rows) | 100x={w100:.2f}s "
            f"({n100} rows) | wall_ratio={w100 / w1:.1f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
