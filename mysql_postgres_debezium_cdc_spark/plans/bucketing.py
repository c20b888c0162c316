"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the single biggest lever for a repeated fact⋈fact join is to
pay the shuffle ONCE at write time: ``bucketBy(n, key)`` hash-partitions
files on disk, and every subsequent join/aggregation on the bucket key
runs with ZERO exchanges (Spark trusts the on-disk ``HashPartitioning``).
The reference's sink tables are keyed by PK — the natural bucket key —
so a downstream consumer of the replica joins it shuffle-free.

tests/test_plans.py::test_bucketed_join_has_no_shuffle proves the plan
property (SortMergeJoin with no Exchange on either side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_key: str,
    n_buckets: int = 8,
) -> None:
    """Write ``df`` as a bucketed+sorted external table: the one-time
    shuffle that every later key-join amortizes."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .saveAsTable(table_name)
    )
