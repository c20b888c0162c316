"""LLM-training-data operators: dedup, similarity search, text analysis,
multimodal column plumbing."""

from mysql_postgres_debezium_cdc_spark.llm import (  # noqa: F401
    clustering,
    contamination,
    dedup,
    embeddings,
    multimodal,
    pii,
    selection,
    similarity,
    splits,
    text,
)
