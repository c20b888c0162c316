"""Data layout: Hive-style partitioned writes and partition-pruned scans.

The second big write-time lever after bucketing (plans/bucketing.py):
``partitionBy(col)`` lays files out as ``col=value/`` directories, so a
predicate on the partition column prunes whole directories at PLANNING
time — at 100 TB a scan for one event_type out of five touches 20% of
the files and reads zero bytes of the rest.  This is how the engine's
sink tables should be laid out for any column with bounded cardinality
that queries filter on (event type, date, tenant).

The registered query writes the `events` fixture partitioned by
`event_type` into a scratch directory (once per sf, reused after), then
answers an aggregate from two partitions.  The plan property — the scan
lists only the two matching directories — is asserted in
tests/test_plans.py::test_partitioned_scan_prunes_directories.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.scratch import materialize_once
from mysql_postgres_debezium_cdc_spark.sources.parquet import load

PARTITION_COL = "event_type"


def write_partitioned(df: DataFrame, path: str, partition_col: str = PARTITION_COL) -> None:
    """One-time layout shuffle: directory-partition ``df`` on a bounded-
    cardinality column every downstream query filters on."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def partitioned_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture version) the events fixture
    partitioned by event_type; return the path.  Staged + atomically
    renamed, keyed by sf and fixture fingerprint (see scratch.py)."""
    return materialize_once(
        sf_dir, "layout_events", lambda p: write_partitioned(load(spark, sf_dir, "events"), p)
    )


def read_partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the partitioned layout; ts comes back as micros timestamp
    (the write already normalized the fixture's nano timestamps)."""
    return spark.read.parquet(partitioned_events_path(spark, sf_dir))


@register(
    "layout_partition_pruned_scan",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("layout", "pruning"),
)
def layout_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over two of five event_type partitions.  The filter is
    a partition predicate, so the scan never opens the other three
    directories (PartitionFilters in the plan; pruning asserted in
    tests/test_plans.py)."""
    ev = read_partitioned_events(spark, sf_dir)
    return (
        ev.where(F.col(PARTITION_COL).isin("purchase", "signup"))
        .groupBy(PARTITION_COL)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy(PARTITION_COL)
    )


def compact_small_files(
    df: DataFrame, path: str, target_rows_per_file: int, total_rows: int | None = None
) -> None:
    """Small-file compaction: rewrite ``df`` into ~equal files of
    ``target_rows_per_file`` rows.

    The operational counterpart of streaming ingestion: every micro-batch
    writes a file per partition, and after a day a 100 TB table is
    millions of KB-sized files whose open/footer costs dominate scans.
    Compaction is one job: count (or reuse a known count), choose the
    file count, and rewrite via ``repartition(n)`` — a round-robin
    shuffle that yields uniform files regardless of input skew."""
    n = total_rows if total_rows is not None else df.count()
    n_files = max(1, -(-n // target_rows_per_file))  # ceil
    df.repartition(n_files).write.mode("overwrite").parquet(path)
