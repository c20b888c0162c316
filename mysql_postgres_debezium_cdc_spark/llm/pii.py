"""PII detection and redaction for training-data pipelines.

Scrubbing emails / phone numbers / IP addresses before pretraining is a
standard corpus-governance pass (C4 and The Pile both ship regex-based
scrubbers).  Everything here is Catalyst ``regexp_replace`` /
``regexp_extract_all`` built-ins — a pure narrow map over partitions, no
shuffle, no Python in the hot path — so 100 TB of text redacts at scan
speed with filters and column pruning untouched.

Pattern portability: the patterns use only character classes, bounded
repetition and word boundaries — the regex subset on which Java's
``java.util.regex`` (Spark) and RE2 (DuckDB oracle) agree exactly.  No
backreferences or lookaround (RE2 has neither).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load

# (label, pattern, replacement) — applied in order.  Email first: its
# pattern is the only one that could span characters the later patterns
# inspect (digits/dots in the local part).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def redact_pii(col: Column) -> Column:
    """Replace every PII match with its typed placeholder."""
    out = col
    for _, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-pattern match counts (computed on the UNredacted text)."""
    return {
        f"n_{label}": F.size(F.regexp_extract_all(col, F.lit(pat), 0)).cast("bigint")
        for label, pat, _ in PII_PATTERNS
    }


def _planted_sql() -> str:
    """DuckDB expression planting deterministic PII into each document."""
    return (
        "'mail ' || source || '-' || CAST(doc_id AS VARCHAR) || '@example.com"
        " tel 555-' || LPAD(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
        " || '-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
        " || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)"
        " || ' ' || text"
    )


def _redact_sql(expr: str) -> str:
    out = expr
    for _, pat, rep in PII_PATTERNS:
        out = f"REGEXP_REPLACE({out}, '{pat}', '{rep}', 'g')"  # 'g' = replace ALL
    return out


def _count_sql(expr: str, pat: str) -> str:
    return f"CAST(LEN(REGEXP_EXTRACT_ALL({expr}, '{pat}')) AS BIGINT)"


@register(
    "text_pii_redaction",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id, {_planted_sql()} AS body FROM documents
    )
    SELECT doc_id,
           {_count_sql("body", PII_PATTERNS[0][1])} AS n_email,
           {_count_sql("body", PII_PATTERNS[1][1])} AS n_phone,
           {_count_sql("body", PII_PATTERNS[2][1])} AS n_ipv4,
           MD5({_redact_sql("body")}) AS redacted_fp,
           {_count_sql(_redact_sql("body"), PII_PATTERNS[0][1])}
             + {_count_sql(_redact_sql("body"), PII_PATTERNS[1][1])}
             + {_count_sql(_redact_sql("body"), PII_PATTERNS[2][1])} AS n_residual
    FROM planted
    ORDER BY doc_id
    """,
    tags=("llm", "text", "pii"),
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect-and-redact over documents with deterministically PLANTED
    PII (the synthetic corpus contains none, so the fixture builds an
    email + phone + IPv4 from each row's own columns — every pattern
    fires on every row and the value check exercises real replacements,
    not a no-op pass-through).

    Output is self-verifying: ``n_residual`` re-counts PII in the
    redacted text and the oracle requires it to hash as part of the
    row — a redactor that missed a match would fail the value check,
    not just a separate assertion.  ``redacted_fp`` (md5) keeps the
    compared payload fixed-width regardless of document size."""
    d = load(spark, sf_dir, "documents")
    body = F.concat(
        F.lit("mail "),
        F.col("source"),
        F.lit("-"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com tel 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit(" "),
        F.col("text"),
    )
    planted = d.select("doc_id", body.alias("body"))
    counts = pii_counts(F.col("body"))
    redacted = redact_pii(F.col("body"))
    residual = pii_counts(redacted)
    return planted.select(
        "doc_id",
        counts["n_email"].alias("n_email"),
        counts["n_phone"].alias("n_phone"),
        counts["n_ipv4"].alias("n_ipv4"),
        F.md5(redacted).alias("redacted_fp"),
        (residual["n_email"] + residual["n_phone"] + residual["n_ipv4"]).alias(
            "n_residual"
        ),
    ).orderBy("doc_id")


K_ANON_THRESHOLD = 5  # groups below this size are re-identification risks
K_ANON_LEN_BUCKET = 100  # n_chars bucket width in the quasi-identifier


@register(
    "dq_k_anonymity_audit",
    oracle=f"""
    WITH qi AS (
      SELECT lang, source, n_chars // {K_ANON_LEN_BUCKET} AS len_bucket,
             CAST(COUNT(*) AS BIGINT) AS group_size
      FROM documents
      GROUP BY 1, 2, 3
    ),
    banded AS (
      SELECT CASE WHEN group_size = 1 THEN 'unique'
                  WHEN group_size < {K_ANON_THRESHOLD} THEN 'small'
                  ELSE 'anonymous' END AS risk_band,
             group_size
      FROM qi
    )
    SELECT risk_band,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(group_size) AS BIGINT) AS n_docs,
           CAST(MAX(group_size) AS BIGINT) AS max_group
    FROM banded
    GROUP BY risk_band
    ORDER BY risk_band
    """,
    tags=("governance", "privacy", "quality"),
)
def dq_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY audit over the release quasi-identifiers: every
    (lang, source, length-bucket) combination is an equivalence class a
    re-identification attack can pivot on; classes below
    K_ANON_THRESHOLD members — and especially singletons — mean a
    document's metadata alone may identify its author.  The audit
    reports document and group counts per risk band, the number a
    release checklist gates on before publishing a corpus datasheet
    (complements [[text_pii_redaction]], which scrubs content, and
    [[cdc_gdpr_scrub]], which erases subjects: this one measures the
    METADATA side channel).

    Scale shape: one map-side-combining groupBy on the bounded QI key
    space, then a constant-size rollup over the group-size relation —
    the corpus is touched once and nothing downstream scales with it."""
    d = load(spark, sf_dir, "documents")
    qi = (
        d.select(
            "lang",
            "source",
            (F.col("n_chars") / K_ANON_LEN_BUCKET).cast("bigint").alias("len_bucket"),
        )
        .groupBy("lang", "source", "len_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("group_size"))
    )
    band = (
        F.when(F.col("group_size") == 1, "unique")
        .when(F.col("group_size") < K_ANON_THRESHOLD, "small")
        .otherwise("anonymous")
    )
    return (
        qi.select(band.alias("risk_band"), "group_size")
        .groupBy("risk_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("group_size").cast("bigint").alias("n_docs"),
            F.max("group_size").cast("bigint").alias("max_group"),
        )
        .orderBy("risk_band")
    )
