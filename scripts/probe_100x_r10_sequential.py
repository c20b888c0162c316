#!/usr/bin/env python
"""100x scaling probe for the r10 sequential-testing pair (PLANS.md
protocol — the r9 battery recipe: 100 replicas of sf0.1 events with
disjoint event_id/user_id offsets so the user population scales with
the data).  Steady-state timing after a warmup, cache cleared between
runs."""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")

from mysql_postgres_debezium_cdc_spark.registry import all_queries
from mysql_postgres_debezium_cdc_spark.session import get_session
from mysql_postgres_debezium_cdc_spark.sources.parquet import load

SF_DIR = "/root/testdata/sf0.1"
BIG = "/tmp/spark_graft_probe100x_r10_seq"
KEYS = ["events_srm_sequential", "events_effect_msprt"]
REPS = 100


def main() -> None:
    spark = get_session("probe100x_seq")
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
    reps.repartition(64).write.mode("overwrite").parquet(f"{BIG}/events.parquet")
    print(
        f"100x corpus: {spark.read.parquet(f'{BIG}/events.parquet').count()} rows",
        flush=True,
    )

    qs = all_queries()
    for key in KEYS:
        row = [key]
        for label, d in (("1x", SF_DIR), ("100x", BIG)):
            qs[key].fn(spark, d).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[key].fn(spark, d).write.format("noop").mode("overwrite").save()
            row.append(f"{label}={time.perf_counter() - t0:.2f}s")
            spark.catalog.clearCache()
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
