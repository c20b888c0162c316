"""Benchmark-contamination detection: n-gram overlap between a training
corpus and a held-out evaluation set.

The standard decontamination pass (GPT-3 appendix C, The Pile, FineWeb)
flags training documents sharing word-n-grams with any benchmark doc.
Shape at 100 TB:

- The eval side is DISTINCT shingles of the (bounded, benchmark-sized)
  eval set — orders of magnitude smaller than the corpus; Spark's
  autoBroadcastJoinThreshold/AQE broadcasts it when it fits and falls
  back to a shuffle join when a pathological eval set doesn't (no forced
  hint — the r3 verdict's forced-broadcast lesson applies here too).
- The train side streams: shingle → LEFT JOIN eval → per-doc aggregate.
  One shuffle (the per-doc groupBy); map-side partial aggregation
  collapses within-partition shingle hits first.
- The join key is the shingle STRING, not a hash — collision-free, so
  a flagged overlap is a real overlap.  (At production scale, hash both
  sides with the same 64-bit hash to shrink the exchange; a collision
  then only ever OVER-counts contamination, which fails safe.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mysql_postgres_debezium_cdc_spark.llm.dedup import (
    _SHINGLES_SQL,
    _shingles_with_count_of,
)
from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load

# Deterministic pseudo-benchmark: every 97th document is "the eval set".
EVAL_MOD = 97
# A doc with >= half its shingles in the eval set is flagged contaminated.
FLAG_NUM, FLAG_DEN = 1, 2


@register(
    "dq_contamination_ngram_overlap",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL.format(filter="")}),
    eval_sh AS (
      SELECT DISTINCT shingle FROM shingles WHERE doc_id % {EVAL_MOD} = 0
    ),
    per_doc AS (
      SELECT t.doc_id,
             COUNT(*) AS n_shingles,
             CAST(SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_overlap
      FROM shingles t LEFT JOIN eval_sh e ON t.shingle = e.shingle
      WHERE t.doc_id % {EVAL_MOD} <> 0
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_shingles, n_overlap,
           ROUND(CAST(n_overlap AS DOUBLE) / n_shingles, 4) AS overlap_frac,
           CASE WHEN n_overlap * {FLAG_DEN} >= n_shingles * {FLAG_NUM}
                THEN 1 ELSE 0 END AS flag_contaminated
    FROM per_doc
    WHERE n_overlap > 0
    ORDER BY doc_id
    """,
    tags=("llm", "dq", "contamination"),
)
def dq_contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-training-document eval-set shingle overlap + contamination
    flag (integer cross-multiplied threshold — no float compare at the
    decision boundary, so the flag is bit-stable cross-engine)."""
    # r13: each side shingles through the Arrow kernel (the
    # dedup_ngram_jaccard device), with its cohort predicate applied
    # BEFORE the kernel — mapInPandas is opaque to predicate pushdown,
    # so filtering first is what keeps the doc_id % mod cut at the
    # parquet scan (the retired expression shingler relied on Catalyst
    # pushing the filter through the deterministic transform chain).
    docs = load(spark, sf_dir, "documents")
    eval_sh = (
        _shingles_with_count_of(docs.where(F.col("doc_id") % EVAL_MOD == 0))
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    train = _shingles_with_count_of(
        docs.where(F.col("doc_id") % EVAL_MOD != 0)
    ).select("doc_id", "shingle")
    per_doc = (
        train.join(eval_sh, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint").alias("n_overlap"),
        )
    )
    return (
        per_doc.where(F.col("n_overlap") > 0)
        .select(
            "doc_id",
            "n_shingles",
            "n_overlap",
            F.round(F.col("n_overlap").cast("double") / F.col("n_shingles"), 4).alias(
                "overlap_frac"
            ),
            F.when(
                F.col("n_overlap") * FLAG_DEN >= F.col("n_shingles") * FLAG_NUM, 1
            )
            .otherwise(0)
            .alias("flag_contaminated"),
        )
        .orderBy("doc_id")
    )


@register(
    "dq_decontaminate_corpus",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL.format(filter="")}),
    eval_sh AS (
      SELECT DISTINCT shingle FROM shingles WHERE doc_id % {EVAL_MOD} = 0
    ),
    per_doc AS (
      SELECT t.doc_id,
             COUNT(*) AS n_shingles,
             CAST(SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_overlap
      FROM shingles t LEFT JOIN eval_sh e ON t.shingle = e.shingle
      WHERE t.doc_id % {EVAL_MOD} <> 0
      GROUP BY t.doc_id
    ),
    verdicts AS (
      SELECT d.doc_id, d.source, d.n_chars,
             CASE WHEN d.doc_id % {EVAL_MOD} = 0 THEN 'eval'
                  WHEN p.n_overlap * {FLAG_DEN} >= p.n_shingles * {FLAG_NUM}
                    THEN 'removed'
                  ELSE 'kept' END AS verdict
      FROM documents d
      LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    )
    SELECT source, verdict, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS first_doc
    FROM verdicts
    GROUP BY source, verdict
    ORDER BY source, verdict
    """,
    tags=("llm", "dq", "contamination"),
)
def dq_decontaminate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACT half of decontamination: apply
    [[dq_contamination_ngram_overlap]]'s verdicts to the corpus and
    account for what happened — per (source, verdict ∈ {kept, removed,
    eval}) document counts and character volume, the removal report a
    training-data release publishes next to its dataset card
    ([[corpus_dataset_card]]).

    Shape: the detector's per-doc relation LEFT-joins back onto the
    corpus by doc_id (docs with zero eval overlap — the overwhelming
    majority — carry a NULL and default to 'kept', so the flagged
    relation stays small and the join cheap), then one grouped
    aggregate.  The same integer cross-multiplied threshold as the
    detector keeps the keep/remove boundary bit-stable cross-engine.
    In production the 'removed'/'eval' partitions become anti-join
    predicates on the training write path — same plan, different
    sink."""
    d = load(spark, sf_dir, "documents")
    # r13: kernel shingler with pre-kernel cohort filters (see
    # dq_contamination_ngram_overlap).
    eval_sh = (
        _shingles_with_count_of(d.where(F.col("doc_id") % EVAL_MOD == 0))
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    per_doc = (
        _shingles_with_count_of(d.where(F.col("doc_id") % EVAL_MOD != 0))
        .select("doc_id", "shingle")
        .join(eval_sh, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint").alias("n_overlap"),
        )
    )
    verdict = (
        F.when(F.col("doc_id") % EVAL_MOD == 0, "eval")
        .when(
            F.col("n_overlap") * FLAG_DEN >= F.col("n_shingles") * FLAG_NUM, "removed"
        )
        .otherwise("kept")
    )
    return (
        d.select("doc_id", "source", "n_chars")
        .join(per_doc, "doc_id", "left")
        .select("doc_id", "source", "n_chars", verdict.alias("verdict"))
        .groupBy("source", "verdict")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source", "verdict")
    )
