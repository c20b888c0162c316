#!/usr/bin/env python
"""Interleaved A/B of corpus_dsir_importance variants (r13 item 1).

V0: r12 shape — two persisted vocab relations (raw_cnt, tgt_cnt).
V1: ONE persist (raw_cnt: feeds the consts aggregate AND the weight
    join); n_t comes from a 1-row conditional aggregate over the
    pushdown-filtered documents scan (no explode, no second persist);
    tgt_cnt is single-consumer and unpersisted.
V2: ZERO persists — v rides raw_cnt as a global-window count (vocab
    rows), n_r/n_t from one unfiltered doc-scan conditional aggregate.
V3: r11 shape — no persists, consts recomputed from both count
    relations (the 5-scan plan).

Each variant is checked row-identical to V0 before timing.
Interleaved best-of-N per the box-noise methodology.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F
from pyspark.sql import Window

from mysql_postgres_debezium_cdc_spark.llm.selection import (
    DSIR_TARGET_LANG,
    DSIR_TOP_K,
    _toks,
    corpus_dsir_importance,
)
from mysql_postgres_debezium_cdc_spark.sources.parquet import load
from mysql_postgres_debezium_cdc_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ntoks():
    return F.size(
        F.filter(F.split(F.col("text"), " "), lambda t: F.length(t) > 0)
    ).cast("bigint")


def _w_and_scored(toks, raw_cnt, tgt_cnt, consts):
    w = (
        raw_cnt.join(tgt_cnt, "token", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "token",
            (
                F.log(
                    (F.coalesce(F.col("c_t"), F.lit(0)) + 1)
                    / (F.col("n_t") + F.col("v")).cast("double")
                )
                - F.log(
                    (F.col("c_r") + 1) / (F.col("n_r") + F.col("v")).cast("double")
                )
            ).alias("lw"),
        )
    )
    scored = (
        toks.join(F.broadcast(w), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg("lw"), 6).alias("avg_log_ratio"),
        )
    )
    return scored.orderBy(F.desc("avg_log_ratio"), "doc_id").limit(DSIR_TOP_K)


def v0(spark, sf_dir):
    return corpus_dsir_importance.__wrapped__(spark, sf_dir)


def v1(spark, sf_dir):
    toks = _toks(spark, sf_dir)
    tgt_toks = _toks(spark, sf_dir, F.col("lang") == DSIR_TARGET_LANG)
    raw_cnt = (
        toks.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("c_r")).persist()
    )
    tgt_cnt = tgt_toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_t")
    )
    n_t_df = (
        load(spark, sf_dir, "documents")
        .where(F.col("lang") == DSIR_TARGET_LANG)
        .agg(F.coalesce(F.sum(_ntoks()), F.lit(0)).cast("bigint").alias("n_t"))
    )
    consts = raw_cnt.agg(
        F.sum("c_r").cast("bigint").alias("n_r"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    ).crossJoin(n_t_df)
    return _w_and_scored(toks, raw_cnt, tgt_cnt, consts)


def v2(spark, sf_dir):
    toks = _toks(spark, sf_dir)
    tgt_toks = _toks(spark, sf_dir, F.col("lang") == DSIR_TARGET_LANG)
    raw_cnt = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_r"))
        .withColumn("v", F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint"))
    )
    tgt_cnt = tgt_toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_t")
    )
    consts = load(spark, sf_dir, "documents").agg(
        F.coalesce(F.sum(_ntoks()), F.lit(0)).cast("bigint").alias("n_r"),
        F.coalesce(
            F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG, _ntoks())), F.lit(0)
        )
        .cast("bigint")
        .alias("n_t"),
    )
    w = (
        raw_cnt.join(tgt_cnt, "token", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "token",
            (
                F.log(
                    (F.coalesce(F.col("c_t"), F.lit(0)) + 1)
                    / (F.col("n_t") + F.col("v")).cast("double")
                )
                - F.log(
                    (F.col("c_r") + 1) / (F.col("n_r") + F.col("v")).cast("double")
                )
            ).alias("lw"),
        )
    )
    scored = (
        toks.join(F.broadcast(w), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg("lw"), 6).alias("avg_log_ratio"),
        )
    )
    return scored.orderBy(F.desc("avg_log_ratio"), "doc_id").limit(DSIR_TOP_K)


def v3(spark, sf_dir):
    toks = _toks(spark, sf_dir)
    tgt_toks = _toks(spark, sf_dir, F.col("lang") == DSIR_TARGET_LANG)
    raw_cnt = toks.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("c_r"))
    tgt_cnt = tgt_toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_t")
    )
    consts = raw_cnt.agg(
        F.sum("c_r").cast("bigint").alias("n_r"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    ).crossJoin(
        tgt_cnt.agg(F.coalesce(F.sum("c_t"), F.lit(0)).cast("bigint").alias("n_t"))
    )
    return _w_and_scored(toks, raw_cnt, tgt_cnt, consts)


def main():
    spark = get_session("ab-dsir-r13")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    variants = {"v0": v0, "v5": v5, "v6": v6}

    ref = [tuple(r) for r in v0(spark, SF_DIR).collect()]
    spark.catalog.clearCache()
    for name, fn in variants.items():
        got = [tuple(r) for r in fn(spark, SF_DIR).collect()]
        spark.catalog.clearCache()
        assert got == ref, f"{name} differs from v0!"
        print(f"{name}: rows identical to v0 ({len(got)} rows)", flush=True)

    n_rounds = int(os.environ.get("AB_ROUNDS", "6"))
    best = {k: float("inf") for k in variants}
    for r in range(n_rounds):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            spark.catalog.clearCache()
            print(f"round {r} {name}: {dt:.3f}s", flush=True)
    print("BEST:", {k: round(v, 3) for k, v in best.items()})



def v5(spark, sf_dir):
    toks = _toks(spark, sf_dir)
    tgt_toks = _toks(spark, sf_dir, F.col("lang") == DSIR_TARGET_LANG)
    gw = Window.partitionBy()
    raw_cnt = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_r"))
        .withColumn("v", F.count(F.lit(1)).over(gw).cast("bigint"))
        .withColumn("n_r", F.sum("c_r").over(gw).cast("bigint"))
    )
    tgt_cnt = tgt_toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_t")
    )
    consts = (
        load(spark, sf_dir, "documents")
        .where(F.col("lang") == DSIR_TARGET_LANG)
        .agg(F.coalesce(F.sum(_ntoks()), F.lit(0)).cast("bigint").alias("n_t"))
    )
    w = (
        raw_cnt.join(tgt_cnt, "token", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "token",
            (
                F.log(
                    (F.coalesce(F.col("c_t"), F.lit(0)) + 1)
                    / (F.col("n_t") + F.col("v")).cast("double")
                )
                - F.log(
                    (F.col("c_r") + 1) / (F.col("n_r") + F.col("v")).cast("double")
                )
            ).alias("lw"),
        )
    )
    scored = (
        toks.join(F.broadcast(w), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg("lw"), 6).alias("avg_log_ratio"),
        )
    )
    return scored.orderBy(F.desc("avg_log_ratio"), "doc_id").limit(DSIR_TOP_K)




def v6(spark, sf_dir):
    toks = _toks(spark, sf_dir)
    tgt_toks = _toks(spark, sf_dir, F.col("lang") == DSIR_TARGET_LANG)
    gw = Window.partitionBy()
    raw_cnt = toks.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("c_r"))
    tgt_cnt = tgt_toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_t")
    )
    joined = (
        raw_cnt.join(tgt_cnt, "token", "left")
        .withColumn("v", F.count(F.lit(1)).over(gw).cast("bigint"))
        .withColumn("n_r", F.sum("c_r").over(gw).cast("bigint"))
        .withColumn(
            "n_t",
            F.sum(F.coalesce(F.col("c_t"), F.lit(0))).over(gw).cast("bigint"),
        )
    )
    w = joined.select(
        "token",
        (
            F.log(
                (F.coalesce(F.col("c_t"), F.lit(0)) + 1)
                / (F.col("n_t") + F.col("v")).cast("double")
            )
            - F.log((F.col("c_r") + 1) / (F.col("n_r") + F.col("v")).cast("double"))
        ).alias("lw"),
    )
    scored = (
        toks.join(F.broadcast(w), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg("lw"), 6).alias("avg_log_ratio"),
        )
    )
    return scored.orderBy(F.desc("avg_log_ratio"), "doc_id").limit(DSIR_TOP_K)


if __name__ == "__main__":
    main()
