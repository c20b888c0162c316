#!/usr/bin/env python
"""Interleaved A/B of rag_rrf_fusion: r12 shape (dims localCheckpoint +
separate nrm groupBy + join) vs r13 shape (n2 inline from the kernel,
single consumer, no checkpoint)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F
from pyspark.sql import Window

from mysql_postgres_debezium_cdc_spark.llm.similarity import (
    RRF_C,
    RRF_POOL,
    RRF_TOPK,
    RAG_DIMS,
    RAG_QUERY_CAP,
    RAG_QUERY_MOD,
    RAG_QUERY_REM,
    _rrf_dims_relation,
    _rrf_horner,
    _rrf_terms_relation,
    _rrf_tokenized,
    rag_rrf_fusion,
)
from mysql_postgres_debezium_cdc_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old(spark, sf_dir):
    base = _rrf_tokenized(spark, sf_dir)
    is_q = (F.col("doc_id") % RAG_QUERY_MOD == RAG_QUERY_REM) & (
        F.col("doc_id") < RAG_QUERY_CAP
    )
    qbase = base.where(is_q)
    terms = _rrf_terms_relation(base)
    qterms = qbase.select(
        F.col("doc_id").alias("q_doc"),
        F.explode(F.array_distinct("toks")).alias("tok"),
    )
    lex = (
        terms.join(F.broadcast(qterms), "tok")
        .where(F.col("doc_id") != F.col("q_doc"))
        .groupBy("q_doc", "doc_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    lw = Window.partitionBy("q_doc").orderBy(F.desc("overlap"), F.asc("doc_id"))
    lex_rk = (
        lex.withColumn("lex_rank", F.row_number().over(lw).cast("bigint"))
        .where(F.col("lex_rank") <= RRF_POOL)
        .select("q_doc", "doc_id", "lex_rank")
    )
    dims = (
        _rrf_dims_relation(base)
        .select("doc_id", "dim", "cnt")
        .localCheckpoint(eager=True)
    )
    nrm = dims.groupBy("doc_id").agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("n2")
    )
    qdims = (
        qbase.select(F.col("doc_id").alias("q_doc"), F.explode("toks").alias("tok"))
        .select("q_doc", (_rrf_horner(F.col("tok")) % RAG_DIMS).alias("dim"))
        .groupBy("q_doc", "dim")
        .agg(F.count(F.lit(1)).alias("qcnt"))
    )
    qnrm = qdims.groupBy("q_doc").agg(
        F.sum(F.col("qcnt") * F.col("qcnt")).cast("bigint").alias("qn2")
    )
    dots = (
        dims.join(F.broadcast(qdims), "dim")
        .where(F.col("doc_id") != F.col("q_doc"))
        .groupBy("q_doc", "doc_id")
        .agg(F.sum(F.col("qcnt") * F.col("cnt")).cast("bigint").alias("dot"))
    )
    cs = F.col("dot").cast("double") / (
        F.sqrt(F.col("qn2").cast("double")) * F.sqrt(F.col("n2").cast("double"))
    )
    dw = Window.partitionBy("q_doc").orderBy(F.desc("cs"), F.asc("doc_id"))
    dense_rk = (
        dots.join(F.broadcast(qnrm), "q_doc")
        .join(nrm, "doc_id")
        .withColumn("cs", cs)
        .withColumn("dense_rank", F.row_number().over(dw).cast("bigint"))
        .where(F.col("dense_rank") <= RRF_POOL)
        .select("q_doc", "doc_id", "dense_rank")
    )
    fused = (
        lex_rk.join(dense_rk, ["q_doc", "doc_id"], "full_outer")
        .select(
            "q_doc",
            F.col("doc_id").alias("hit_doc"),
            "lex_rank",
            "dense_rank",
            (
                F.coalesce(F.lit(1.0) / (F.lit(RRF_C) + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_C) + F.col("dense_rank")), F.lit(0.0)
                )
            ).alias("score"),
        )
    )
    fw = Window.partitionBy("q_doc").orderBy(F.desc("score"), F.asc("hit_doc"))
    return (
        fused.withColumn("rk", F.row_number().over(fw).cast("bigint"))
        .where(F.col("rk") <= RRF_TOPK)
        .select(
            "q_doc", "rk", "hit_doc", "lex_rank", "dense_rank",
            F.round("score", 6).alias("rrf_score"),
        )
        .orderBy("q_doc", "rk")
    )


def new(spark, sf_dir):
    return rag_rrf_fusion.__wrapped__(spark, sf_dir)


def main():
    spark = get_session("ab-rrf-r13")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    ref = [tuple(r) for r in old(spark, SF_DIR).collect()]
    got = [tuple(r) for r in new(spark, SF_DIR).collect()]
    assert got == ref, "r13 rrf differs from r12 shape!"
    print(f"rows identical ({len(got)} rows)", flush=True)
    spark.catalog.clearCache()

    n_rounds = int(os.environ.get("AB_ROUNDS", "6"))
    best = {"old": float("inf"), "new": float("inf")}
    for r in range(n_rounds):
        for name, fn in (("old", old), ("new", new)):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            spark.catalog.clearCache()
            print(f"round {r} {name}: {dt:.3f}s", flush=True)
    print("BEST:", {k: round(v, 3) for k, v in best.items()})


if __name__ == "__main__":
    main()
