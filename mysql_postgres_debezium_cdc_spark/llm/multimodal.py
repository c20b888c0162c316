"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``decode_media`` raises NotImplementedError unless
the deterministic fake is requested).  Everything around it — binary
columns, schema, Arrow batch shape, ``mapInPandas`` partition-parallel
feature extraction — is real and tested, so swapping in PIL/ffmpeg on a
real cluster touches ONE function.

Scale: media blobs ride in parquet binary columns; feature extraction is
a narrow mapInPandas (no shuffle), so throughput scales linearly with
executors and Arrow batch size bounds memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table: text payloads as opaque binary columns.

    Stands in for image/audio bytes; the engine treats payloads as
    opaque either way (SURVEY north star: binary + typed metadata).
    NULL-text rows are dropped — a media ingest has no row without a
    payload, and a None payload crashed every downstream Python worker
    on the null-sweep fixture (oracles mirror the filter)."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return d.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.length(F.encode(F.col("text"), "UTF-8")).cast("bigint").alias("n_bytes"),
    )


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> list[float]:
    """Decode a media payload into a feature vector.

    STUB: real decoding (PIL/librosa/ffmpeg) is unavailable in this
    container.  ``fake=True`` returns a deterministic byte-histogram
    feature (real math over real bytes, stable across runs) so the
    pipeline shape is fully testable."""
    if not fake:
        raise NotImplementedError(
            "media codecs not installed; pass fake=True for the deterministic "
            "byte-histogram featurizer"
        )
    buckets = [0] * FEATURE_DIM
    for b in payload:
        buckets[b % FEATURE_DIM] += 1
    total = max(len(payload), 1)
    # Fixed-point parts-per-million ratios: INTEGER math only, so the
    # values are portable bit-for-bit to the SQL oracle (float rounding
    # of c/total ties differently between Python's banker's rounding and
    # SQL ROUND-half-away — e.g. any 128-byte payload).
    return [float(c * 1_000_000 // total) for c in buckets]


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Partition-parallel feature extraction via mapInPandas (Arrow)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(p, m, fake=fake)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           'text/plain' AS media_type,
           CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
           MD5(text) AS payload_md5
    FROM documents WHERE text IS NOT NULL
    ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads (md5 proves the bytes
    round-tripped through the binary column identically)."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.md5(F.col("payload")).alias("payload_md5"),
    ).orderBy("doc_id")


@register(
    "multimodal_fake_features",
    # The featurizer runs through mapInPandas (Python, not SQL), but its
    # math is deterministic integer arithmetic over the payload bytes —
    # so the oracle reconstructs the actual UTF-8 byte stream from the
    # code points (1-4 bytes per char, the RFC 3629 encoding spelled out
    # as integer arithmetic) and recomputes the residues per BYTE.  The
    # unicode-fixture sweep caught the previous per-CHARACTER
    # formulation, which coincides with bytes only on ASCII corpora.
    oracle="""
    WITH b AS (
      SELECT doc_id,
             CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
             FLATTEN([
               CASE
                 WHEN c < 128 THEN [c % 8]
                 WHEN c < 2048 THEN
                   [(192 + c // 64) % 8, (128 + c % 64) % 8]
                 WHEN c < 65536 THEN
                   [(224 + c // 4096) % 8, (128 + (c // 64) % 64) % 8,
                    (128 + c % 64) % 8]
                 ELSE
                   [(240 + c // 262144) % 8, (128 + (c // 4096) % 64) % 8,
                    (128 + (c // 64) % 64) % 8, (128 + c % 64) % 8]
               END
               FOR c IN [UNICODE(text[i]) FOR i IN RANGE(1, LEN(text) + 1)]
             ]) AS residues
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id, n_bytes,
           CAST(LEN(LIST_FILTER(residues, r -> r = 0)) * 1000000
                // GREATEST(n_bytes, 1) AS DOUBLE) AS f0,
           CAST(LEN(LIST_FILTER(residues, r -> r = 1)) * 1000000
                // GREATEST(n_bytes, 1) AS DOUBLE) AS f1
    FROM b ORDER BY doc_id
    """,
    tags=("llm", "multimodal", "mapinpandas"),
)
def multimodal_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic featurization of binary payloads via mapInPandas."""
    feats = extract_features(media_table(spark, sf_dir), fake=True)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.element_at("features", 1).alias("f0"),
        F.element_at("features", 2).alias("f1"),
    ).orderBy("doc_id")


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, frame_bytes: int = 64, every_nth: int = 4) -> DataFrame:
    """Frame sampling over opaque payloads via mapInPandas: emit every
    ``every_nth`` fixed-width chunk ("frame") with its offset.

    For real video this is where ffmpeg seek+decode goes; the chunking
    stand-in keeps the exact Spark shape — one input row fans out to
    0..n output rows inside the Arrow batch, no shuffle, no collect."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "frame_offset": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for frame_no, off in enumerate(
                    range(0, len(data), frame_bytes * every_nth)
                ):
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(frame_no)
                    out["frame_offset"].append(off)
                    out["frame"].append(data[off : off + frame_bytes])
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("resized_bytes", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_media(df: DataFrame, factor: int = 4) -> DataFrame:
    """Resize/downsample stand-in over opaque payloads via mapInPandas:
    keep every ``factor``-th byte (deterministic decimation).

    For real images this is where PIL's resize goes — same Spark shape
    either way: a narrow Arrow-batched pass, one output row per input
    row, payload column rewritten in place, no shuffle.  Downstream
    stages (feature extraction, frame sampling) compose unchanged on
    the smaller payloads."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            resized = [bytes(bytes(p)[::factor]) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "orig_bytes": pdf["n_bytes"],
                    "resized_bytes": [len(r) for r in resized],
                    "payload": resized,
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


FRAME_BYTES = 64
FRAME_EVERY_NTH = 4

# Shared CTE: the UTF-8 byte stream reconstructed as a list of integer
# byte VALUES (RFC 3629 spelled out as arithmetic — the same device
# multimodal_fake_features proved out, minus its %8 residue fold).  This
# is what lets the frame/resize oracles certify BYTE content on any
# text: this DuckDB build has no md5(BLOB)/substring(BLOB), and the old
# md5-of-characters formulation was only valid on ASCII corpora (the
# unicode-sweep finding).
_UTF8_BYTES_CTE = """
    b AS (
      SELECT doc_id,
             FLATTEN([
               CASE
                 WHEN c < 128 THEN [c]
                 WHEN c < 2048 THEN [192 + c // 64, 128 + c % 64]
                 WHEN c < 65536 THEN
                   [224 + c // 4096, 128 + (c // 64) % 64, 128 + c % 64]
                 ELSE
                   [240 + c // 262144, 128 + (c // 4096) % 64,
                    128 + (c // 64) % 64, 128 + c % 64]
               END
               FOR c IN [UNICODE(text[i]) FOR i IN RANGE(1, LEN(text) + 1)]
             ]) AS bs,
             CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n
      FROM documents WHERE text IS NOT NULL
    )
"""


def _byte_fact_udfs():
    """Arrow-batched byte-fact UDFs, built lazily PER CALL: a module-level
    ``@pandas_udf`` would re-register itself during executor-side module
    import (every mapInPandas worker re-imports this package) and crash
    the worker.  Returns (byte_sum, byte_weighted_sum); the weighted sum
    Σ (1-based position × byte value) pins byte ORDER, so two frames
    with equal sums but swapped bytes cannot collide."""

    def byte_sum(payload):
        return payload.map(lambda b: 0 if b is None else int(sum(b)))

    def byte_weighted_sum(payload):
        return payload.map(
            lambda b: 0
            if b is None
            else int(sum((i + 1) * v for i, v in enumerate(b)))
        )

    return (
        F.pandas_udf(byte_sum, "bigint"),
        F.pandas_udf(byte_weighted_sum, "bigint"),
    )


@register(
    "multimodal_frame_sample",
    # The fan-out runs through mapInPandas (Python, not SQL), but the
    # frame geometry and the certified facts are pure integer arithmetic
    # over the payload BYTES: the oracle reconstructs the UTF-8 byte
    # stream (works on ANY text — the md5-of-characters predecessor was
    # ASCII-only), regenerates the offsets with RANGE over the byte
    # length, and value-checks each frame's length, byte sum, and
    # position-weighted byte sum — geometry AND content.
    oracle=f"""
    WITH {_UTF8_BYTES_CTE},
    offs AS (
      SELECT doc_id, bs,
             UNNEST(RANGE(0, n, {FRAME_BYTES * FRAME_EVERY_NTH}))
               AS frame_offset
      FROM b
    ),
    fr AS (
      SELECT doc_id, frame_offset,
             LIST_SLICE(bs, CAST(frame_offset AS INT) + 1,
                        CAST(frame_offset AS INT) + {FRAME_BYTES}) AS f
      FROM offs
    )
    SELECT doc_id,
           CAST(frame_offset // {FRAME_BYTES * FRAME_EVERY_NTH} AS INT)
             AS frame_no,
           CAST(frame_offset AS BIGINT) AS frame_offset,
           CAST(LEN(f) AS BIGINT) AS frame_len,
           CAST(LIST_SUM(f) AS BIGINT) AS frame_sum,
           CAST(LIST_SUM([f[i] * i FOR i IN RANGE(1, LEN(f) + 1)]) AS BIGINT)
             AS frame_wsum
    FROM fr
    ORDER BY doc_id, frame_no
    """,
    tags=("llm", "multimodal", "mapinpandas"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque media payloads, driver-certified: one
    payload row fans out to 0..n fixed-width frames (every {FRAME_EVERY_NTH}th
    {FRAME_BYTES}-byte chunk with its offset) inside the Arrow batch via
    ``sample_frames`` — the exact Spark shape real video frame
    extraction uses (ffmpeg seek+decode replaces the chunker; schema,
    fan-out, and partitioning are unchanged).

    Scale shape: narrow mapInPandas — no shuffle, no collect; output
    cardinality is bytes/stride per doc, and Arrow batch size bounds
    executor memory however large a single payload is relative to the
    batch.  Frames leave as integer byte facts (length / sum /
    position-weighted sum) so the value check pins CONTENT, not just
    geometry — and, unlike the md5 predecessor, stays oracle-checkable
    on non-ASCII corpora."""
    frames = sample_frames(
        media_table(spark, sf_dir), frame_bytes=FRAME_BYTES, every_nth=FRAME_EVERY_NTH
    )
    byte_sum, byte_wsum = _byte_fact_udfs()
    return frames.select(
        "doc_id",
        "frame_no",
        "frame_offset",
        F.length("frame").cast("bigint").alias("frame_len"),
        byte_sum("frame").alias("frame_sum"),
        byte_wsum("frame").alias("frame_wsum"),
    ).orderBy("doc_id", "frame_no")


RESIZE_FACTOR = 4


@register(
    "multimodal_resize_decimate",
    # The decimator keeps every 4th BYTE of the UTF-8 payload — on
    # multibyte text that slices through codepoints, so no string
    # function can express the result; the oracle decimates the
    # reconstructed byte list directly and certifies size + byte sum +
    # position-weighted byte sum (the md5-of-characters predecessor was
    # only valid on ASCII corpora).
    oracle=f"""
    WITH {_UTF8_BYTES_CTE},
    d AS (
      SELECT doc_id, n,
             [bs[i] FOR i IN RANGE(1, CAST(n AS INT) + 1, {RESIZE_FACTOR})]
               AS r
      FROM b
    )
    SELECT doc_id,
           n AS orig_bytes,
           CAST(LEN(r) AS BIGINT) AS resized_bytes,
           CAST(COALESCE(LIST_SUM(r), 0) AS BIGINT) AS resized_sum,
           CAST(COALESCE(LIST_SUM([r[i] * i FOR i IN RANGE(1, LEN(r) + 1)]),
                         0) AS BIGINT) AS resized_wsum
    FROM d
    ORDER BY doc_id
    """,
    tags=("llm", "multimodal", "mapinpandas"),
)
def multimodal_resize_decimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample stand-in over opaque payloads, driver-certified:
    ``resize_media`` keeps every {RESIZE_FACTOR}th byte per payload
    (PIL's resize drops in for the decimator on a real cluster — same
    one-row-per-row Arrow pass, payload rewritten in place, no
    shuffle).  Output pins the size arithmetic plus integer byte facts
    (sum and position-weighted sum) of the decimated bytes, so the
    value check certifies the rewrite content on ANY text, non-ASCII
    included.  Composability is the point: the decimated payload feeds
    [[multimodal_frame_sample]] and the featurizer unchanged."""
    resized = resize_media(media_table(spark, sf_dir), factor=RESIZE_FACTOR)
    byte_sum, byte_wsum = _byte_fact_udfs()
    return resized.select(
        "doc_id",
        "orig_bytes",
        "resized_bytes",
        byte_sum("payload").alias("resized_sum"),
        byte_wsum("payload").alias("resized_wsum"),
    ).orderBy("doc_id")
