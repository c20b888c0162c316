#!/usr/bin/env python
"""Interleaved A/B of dedup_simhash: r12 shape (sid kernel + JVM 32-term
bit-sum aggregate) vs r13 shape (full-signature kernel).  Same session,
alternating, best-of-N — the only timing method this shared box
supports."""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F
from pyspark.sql import Window

from mysql_postgres_debezium_cdc_spark.llm.dedup import (
    MH_MULT,
    MH_PRIME,
    SH_BANDS,
    SH_BAND_BITS,
    SH_BITS,
    SH_HAMMING_MAX,
    _SH_BAND_CONSTS,
    _pairs_from_bucket,
    _shingle_sids_of,
)
from mysql_postgres_debezium_cdc_spark.registry import bench_queries
from mysql_postgres_debezium_cdc_spark.sources.parquet import load
from mysql_postgres_debezium_cdc_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _downstream(sigs):
    band_vals = F.array(
        *[
            (F.col("sig") / F.lit(c)).cast("bigint") % (1 << SH_BAND_BITS)
            for c in _SH_BAND_CONSTS
        ]
    )
    buckets = (
        sigs.select(
            F.struct("doc_id", "sig").alias("ds"),
            F.posexplode(band_vals).alias("band", "bval"),
        )
        .groupBy("band", "bval")
        .agg(F.sort_array(F.collect_list("ds")).alias("docs"))
        .where(F.size("docs") > 1)
    )
    cand = _pairs_from_bucket(buckets, fields={"sig": ("sig_a", "sig_b")}).distinct()
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("bigint")
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= SH_HAMMING_MAX)
        .orderBy("doc_a", "doc_b")
    )


def old(spark, sf_dir):
    dt = _shingle_sids_of(load(spark, sf_dir, "documents")).withColumnRenamed(
        "sid", "tid"
    )
    bit_terms = [
        F.when(
            F.sum(
                F.when(
                    (F.lit((j * MH_MULT + 1) % MH_PRIME) * F.col("tid") + j)
                    % MH_PRIME
                    % 2
                    == 1,
                    1,
                ).otherwise(-1)
            )
            >= 0,
            F.lit(1 << j).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        for j in range(SH_BITS)
    ]
    sigs = dt.groupBy("doc_id").agg(
        functools.reduce(lambda a, b: a + b, bit_terms).alias("sig")
    )
    return _downstream(sigs)


def new(spark, sf_dir):
    return bench_queries()["dedup_simhash"].fn(spark, sf_dir)


def main():
    spark = get_session("ab-simhash-r13")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    ref = [tuple(r) for r in old(spark, SF_DIR).collect()]
    got = [tuple(r) for r in new(spark, SF_DIR).collect()]
    assert got == ref, "r13 simhash differs from r12 shape!"
    print(f"rows identical ({len(got)} pairs)", flush=True)
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
