#!/usr/bin/env python
"""10x scaling probe for the r9-changed keys (PLANS.md protocol).

Synthesizes a 10x events corpus from sf0.1 (10 replicas with disjoint
event_id/user_id offsets so the user population scales with the data —
the distribution-preserving recipe of the r8 probe batch), then times
each changed key once at 1x and once at 10x on the same cores.
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
TENX = "/tmp/spark_graft_probe10x_r9"
KEYS = [
    "events_funnel_time_to_convert",
    "events_power_mde",
    "stream_experiment_snapshot",
    "stream_srm_monitor",
    "events_experiment_report",
]


def main() -> None:
    spark = get_session("probe10x")
    ev = load(spark, SF_DIR, "events")
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_events = ev.agg(F.max("event_id")).collect()[0][0] + 1
    reps = None
    for i in range(10):
        r = ev.select(
            (F.col("event_id") + F.lit(i * n_events)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(i * n_users)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        reps = r if reps is None else reps.unionByName(r)
    reps.write.mode("overwrite").parquet(f"{TENX}/events.parquet")
    print(f"10x corpus written: {spark.read.parquet(f'{TENX}/events.parquet').count()} rows")

    qs = all_queries()
    for key in KEYS:
        row = [key]
        for label, d in (("1x", SF_DIR), ("10x", TENX)):
            t0 = time.perf_counter()
            qs[key].fn(spark, d).write.format("noop").mode("overwrite").save()
            row.append(f"{label}={time.perf_counter() - t0:.2f}s")
            spark.catalog.clearCache()
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
