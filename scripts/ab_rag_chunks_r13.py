#!/usr/bin/env python
"""Interleaved A/B of corpus_rag_retrieval: r12 shape (expression
chunk/hash pipeline + localCheckpoint + cnorm groupBy + join) vs r13
shape (chunk-dims kernel with n2 inline, single consumer)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F
from pyspark.sql import Window

from mysql_postgres_debezium_cdc_spark.llm.similarity import (
    RAG_DIMS,
    RAG_QUERY_CAP,
    RAG_QUERY_MOD,
    RAG_QUERY_REM,
    RAG_TOPK,
    _RAG_CHUNK_S,
    _RAG_CHUNK_W,
    _rrf_horner,
    corpus_rag_retrieval,
)
from mysql_postgres_debezium_cdc_spark.sources.parquet import load
from mysql_postgres_debezium_cdc_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = d.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    nc = F.ceil(
        F.greatest(F.col("n") - _RAG_CHUNK_W, F.lit(0)) / F.lit(float(_RAG_CHUNK_S))
    ) + 1
    chunks = base.select(
        "doc_id", "toks", F.explode(F.sequence(F.lit(0), nc - 1)).alias("chunk_id")
    ).select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.slice(
            F.col("toks"),
            F.lit(1) + F.col("chunk_id") * _RAG_CHUNK_S,
            F.lit(_RAG_CHUNK_W),
        ).alias("ctoks"),
    )
    cdims = (
        chunks.select("doc_id", "chunk_id", F.explode("ctoks").alias("tok"))
        .select(
            "doc_id", "chunk_id", (_rrf_horner(F.col("tok")) % RAG_DIMS).alias("dim")
        )
        .groupBy("doc_id", "chunk_id", "dim")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    cnorm = cdims.groupBy("doc_id", "chunk_id").agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("n2")
    )
    qd = base.where(
        (F.col("doc_id") % RAG_QUERY_MOD == RAG_QUERY_REM)
        & (F.col("doc_id") < RAG_QUERY_CAP)
    )
    qdims = (
        qd.select(F.col("doc_id").alias("q_doc"), F.explode("toks").alias("tok"))
        .select("q_doc", (_rrf_horner(F.col("tok")) % RAG_DIMS).alias("dim"))
        .groupBy("q_doc", "dim")
        .agg(F.count(F.lit(1)).alias("qcnt"))
    )
    qnorm = qdims.groupBy("q_doc").agg(
        F.sum(F.col("qcnt") * F.col("qcnt")).cast("bigint").alias("qn2")
    )
    dots = (
        cdims.join(F.broadcast(qdims), "dim")
        .where(F.col("doc_id") != F.col("q_doc"))
        .groupBy("q_doc", "doc_id", "chunk_id")
        .agg(F.sum(F.col("qcnt") * F.col("cnt")).cast("bigint").alias("dot"))
    )
    scored = (
        dots.join(F.broadcast(qnorm), "q_doc")
        .join(cnorm, ["doc_id", "chunk_id"])
        .select(
            "q_doc",
            "doc_id",
            "chunk_id",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("qn2").cast("double"))
                    * F.sqrt(F.col("n2").cast("double"))
                )
            ).alias("c"),
        )
    )
    w = Window.partitionBy("q_doc").orderBy(F.desc("c"), "doc_id", "chunk_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= RAG_TOPK)
        .select(
            "q_doc",
            "rk",
            F.col("doc_id").alias("hit_doc"),
            F.col("chunk_id").alias("hit_chunk"),
            F.round("c", 6).alias("cos"),
        )
        .orderBy("q_doc", "rk")
    )


def new(spark, sf_dir):
    return corpus_rag_retrieval.__wrapped__(spark, sf_dir)


def main():
    spark = get_session("ab-rag-chunks-r13")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    ref = [tuple(r) for r in old(spark, SF_DIR).collect()]
    got = [tuple(r) for r in new(spark, SF_DIR).collect()]
    assert got == ref, "r13 rag retrieval differs from r12 shape!"
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
