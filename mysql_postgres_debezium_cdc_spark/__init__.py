"""PySpark-native analytics engine with the capabilities of the reference
CDC pipeline (vijayleom/mysql-postgres-debezium-cdc) plus a full batch /
streaming / LLM-data operator surface.

The reference is a Debezium→Kafka→JVM-consumer→Postgres last-write-wins
replication pipeline (see SURVEY.md).  This package re-expresses that
standing query — and the broader operator inventory in SURVEY.md §2 —
Spark-first: declarative DataFrame/SQL plans handed to Catalyst, Structured
Streaming for the CDC/stream path, and Arrow-batched pandas UDFs only where
built-ins genuinely cannot express the semantics.

Layout
------
- ``session``    : SparkSession construction tuned for the bench harness.
- ``sources``    : parquet fixtures loader, Debezium envelope decode, Kafka
                   CDC source builder (the reference's S1/S2/P1/P3).
- ``operators``  : batch relational operators (joins, aggregation, windows,
                   set ops, top-k) registered as oracle-checked queries.
- ``functions``  : scalar function surface (string/date/math/array/json).
- ``streaming``  : CDC pipeline (compaction + merge sink), watermarks,
                   event-time windows, stateful dedup.
- ``llm``        : LLM-training-data operators — dedup (exact/minhash/
                   simhash/ngram), similarity search, text analysis,
                   multimodal plumbing.
- ``plans``      : plan-inspection and scale helpers (explain capture,
                   broadcast/salt utilities).
"""

from mysql_postgres_debezium_cdc_spark.registry import all_queries, oracle_map, register

__all__ = ["all_queries", "oracle_map", "register"]
