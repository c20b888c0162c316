#!/usr/bin/env python
"""100x scaling probe for the dedup/RAG headline families (r10,
VERDICT r9 task #5 — extend the empirical scale stamps of the r9
experiment-battery probe to the LSH s-curve and postings-broadcast
claims in SURVEY §6.1).

Two distribution-preserving 100x recipes over sf0.1 documents (5,000
docs -> 500,000), because "100x the corpus" means different things to
the two families:

- DEDUP corpus: 100 replicas with disjoint doc_id ranges AND a
  per-replica token-suffix rewrite (every token t -> "t~rK" for
  replica K>0).  Within a replica the near-dup structure is EXACTLY
  the original (a consistent token renaming preserves every shingle-set
  Jaccard relation); across replicas the vocabularies are disjoint, so
  inter-replica Jaccard is 0 and the TRUE pair population scales
  linearly (100x docs -> 100x pairs), never quadratically.  Naive
  verbatim replication would instead make every doc 99 exact dups and
  measure output explosion, not engine scaling (the r6 lesson at
  PLANS.md "100x pairs -> 40x wall").
- RAG corpus: 100 verbatim replicas with disjoint doc_id ranges.  The
  query cohort (doc_id % mod, doc_id < cap) stays the replica-0 docs;
  every query term's posting list grows 100x — exactly the stress the
  broadcast-query-terms-before-postings claim is about.  Exact dups are
  irrelevant to top-k scoring.

Timing: one warmup pass per (key, scale) then one steady-state
measurement, clearing the SQL cache between runs (bench.py protocol).
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
ROOT = "/tmp/spark_graft_probe100x_r10"
REPS = 100
DEDUP_KEYS = ["dedup_minhash_lsh", "dedup_media_lsh", "corpus_near_dedup_pipeline"]
RAG_KEYS = ["rag_bm25_topk"]


def _replicate(spark, out: str, suffix_tokens: bool) -> None:
    docs = load(spark, SF_DIR, "documents")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for i in range(REPS):
        r = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_docs))
        if suffix_tokens and i > 0:
            sfx = F.lit(f"~r{i}")
            toks = F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
            r = r.withColumn(
                "text", F.array_join(F.transform(toks, lambda t: F.concat(t, sfx)), " ")
            ).withColumn("n_chars", F.length("text").cast("bigint"))
        parts.append(r)
    reps = parts[0]
    for p in parts[1:]:
        reps = reps.unionByName(p)
    reps.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print(
        f"{out}: {spark.read.parquet(f'{out}/documents.parquet').count()} docs "
        f"(suffix_tokens={suffix_tokens})",
        flush=True,
    )


def _time_key(spark, qs, key: str, d: str) -> tuple[float, int]:
    fn = qs[key].fn
    fn(spark, d).write.format("noop").mode("overwrite").save()  # warmup
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fn(spark, d).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    spark.catalog.clearCache()
    n = fn(spark, d).count()
    spark.catalog.clearCache()
    return wall, n


def main() -> None:
    spark = get_session("probe100x_r10")
    dedup_dir, rag_dir = f"{ROOT}/dedup", f"{ROOT}/rag"
    _replicate(spark, dedup_dir, suffix_tokens=True)
    _replicate(spark, rag_dir, suffix_tokens=False)

    qs = all_queries()
    for key in DEDUP_KEYS + RAG_KEYS:
        hundred = dedup_dir if key in DEDUP_KEYS else rag_dir
        w1, n1 = _time_key(spark, qs, key, SF_DIR)
        w100, n100 = _time_key(spark, qs, key, hundred)
        print(
            f"{key}: 1x={w1:.2f}s ({n1} rows) | 100x={w100:.2f}s "
            f"({n100} rows) | wall_ratio={w100 / w1:.1f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
