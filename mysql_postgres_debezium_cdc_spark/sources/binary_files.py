"""``binaryFile`` source: whole-file binary ingestion.

The multimodal pipeline (llm/multimodal.py) models image/audio/video as
opaque ``binary`` columns; THIS is the source that gets such bytes into
a DataFrame in the first place.  Spark's built-in ``binaryFile`` format
reads each file as one row ``(path, modificationTime, length, content)``
with filters on the metadata columns (path glob, length) pushed into the
file listing — so a "files under 10 MB modified since T" scan never
opens the excluded files.  At 100 TB the direction is reversed from this
fixture (media files already exist on object storage and we only read),
but the API surface, schema, and partitioning behavior (one task per
file group, driven by ``maxPartitionBytes``) are exactly what's
exercised here.

Certification device: files are materialized from the ``documents``
fixture (UTF-8 bytes of the text column, doc_id in the filename), and
the query emits per-file byte length + MD5 of the raw bytes.  DuckDB
recomputes both straight from the table (``octet_length`` / ``md5`` on
the same UTF-8 text), so the value hash proves the bytes on disk and
the bytes the scan returned are identical end-to-end.

Reference parity: the reference ingests only Kafka JSON (SURVEY.md
§2.1 S1); binary ingestion is part of the §2.2 source-category gap the
driver contract adds.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.scratch import materialize_once
from mysql_postgres_debezium_cdc_spark.sources.parquet import load

# Deterministic subset: one file per 17 docs (~300 files at sf0.1).  The
# fixture direction (table -> files) collects doc rows on the driver,
# which is fine for a test fixture and exactly backwards for production
# (where the files pre-exist and this module only ever READS).
_DOC_STRIDE = 17


def binary_docs_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture version) a directory of .bin files,
    one per sampled document, content = UTF-8 bytes of ``text``."""

    def write(path: str) -> None:
        os.makedirs(path, exist_ok=True)
        rows = (
            load(spark, sf_dir, "documents")
            # a NULL text has no bytes to write — skip (oracle mirrors)
            .where((F.col("doc_id") % _DOC_STRIDE == 0) & F.col("text").isNotNull())
            .select("doc_id", "text")
            .collect()
        )
        for r in rows:
            with open(os.path.join(path, f"doc_{r.doc_id:08d}.bin"), "wb") as f:
                f.write(r.text.encode("utf-8"))
        open(os.path.join(path, "_SUCCESS"), "w").close()

    return materialize_once(sf_dir, "src_docs_bin", write)


@register(
    "source_binaryfile_scan",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS content_md5
    FROM documents
    WHERE doc_id % {_DOC_STRIDE} = 0 AND text IS NOT NULL
    ORDER BY doc_id
    """,
    tags=("source", "binary", "multimodal"),
)
def source_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file binary scan -> (doc_id from filename, byte length from
    file metadata, MD5 of raw content).  ``pathGlobFilter`` excludes the
    ``_SUCCESS`` marker at listing time (pushed, not a post-filter); the
    MD5 runs JVM-side on the binary column — no Python in the loop."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(binary_docs_path(spark, sf_dir))
    )
    return files.select(
        F.regexp_extract(
            F.element_at(F.split(F.col("path"), "/"), -1), r"doc_(\d+)", 1
        )
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").alias("byte_len"),
        F.md5(F.col("content")).alias("content_md5"),
    ).orderBy("doc_id")
