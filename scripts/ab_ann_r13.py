#!/usr/bin/env python
"""Interleaved A/B of the ANN family: r12 shapes (corpus-wide cell
window computed once per consumer; ivfpq codebook as a 512-double
literal tree + interpreted encode folds) vs r13 shapes (per-row array
sort over the broadcast 1-row centroid array; encode/qtab Arrow
kernels).  Old bodies reconstructed verbatim from the r12 tree."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F
from pyspark.sql import Window

from mysql_postgres_debezium_cdc_spark.llm.similarity import (
    CENTROID_BASE,
    N_CELLS,
    N_PROBE,
    N_QUERIES,
    PQ_BASE,
    PQ_D,
    PQ_K,
    PQ_M,
    PQ_RERANK,
    TOP_K,
    _PQ_CODEBOOK_CACHE,
    _as_double,
    _dot,
    _norm,
    ann_ivf_topk,
    ann_ivfpq_topk,
    cosine_from_norms,
)
from mysql_postgres_debezium_cdc_spark.scratch import fixture_fingerprint
from mysql_postgres_debezium_cdc_spark.sources.parquet import load
from mysql_postgres_debezium_cdc_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _e(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        _as_double("embedding").alias("emb"),
        _norm(_as_double("embedding")).alias("nrm"),
    )


def _cent(e):
    return e.where(
        (F.col("vec_id") >= CENTROID_BASE) & (F.col("vec_id") < CENTROID_BASE + N_CELLS)
    ).select(
        (F.col("vec_id") - CENTROID_BASE).cast("int").alias("cid"),
        F.col("emb").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )


def old_ivf(spark, sf_dir):
    e = _e(spark, sf_dir)
    cent = _cent(e)
    ccos = cosine_from_norms(
        _dot(F.col("emb"), F.col("c_emb")), F.col("nrm"), F.col("c_nrm")
    )
    cw = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    scored_cells = (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", "cid", "emb", "nrm", ccos.alias("ccos"))
        .withColumn("crk", F.row_number().over(cw))
    )
    assign = scored_cells.where(F.col("crk") == 1).select(
        F.col("vec_id").alias("c_id"),
        "cid",
        F.col("emb").alias("c_vec"),
        F.col("nrm").alias("c_nrm"),
    )
    probes = scored_cells.where(
        (F.col("crk") <= N_PROBE) & (F.col("vec_id") < N_QUERIES)
    ).select(
        F.col("vec_id").alias("q_id"),
        "cid",
        F.col("emb").alias("q_vec"),
        F.col("nrm").alias("q_nrm"),
    )
    cs = cosine_from_norms(
        _dot(F.col("q_vec"), F.col("c_vec")), F.col("q_nrm"), F.col("c_nrm")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        assign.join(F.broadcast(probes), "cid")
        .where(F.col("c_id") != F.col("q_id"))
        .select("q_id", "c_id", F.round(cs, 4).alias("cos_sim"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= TOP_K)
        .orderBy("q_id", "rk")
    )


def old_ivfpq(spark, sf_dir):
    e = _e(spark, sf_dir)
    cache_key = (sf_dir, fixture_fingerprint(sf_dir))
    donors = _PQ_CODEBOOK_CACHE.get(cache_key)
    if donors is None:
        donors = {
            int(r["vec_id"]) - PQ_BASE: list(r["emb"])
            for r in e.where(
                (F.col("vec_id") >= PQ_BASE) & (F.col("vec_id") < PQ_BASE + PQ_K)
            )
            .select("vec_id", "emb")
            .collect()
        }
        _PQ_CODEBOOK_CACHE[cache_key] = donors
    cw = [
        [donors[j][m * PQ_D : (m + 1) * PQ_D] for j in range(PQ_K)]
        for m in range(PQ_M)
    ]

    def _py_fold(vals):
        acc = 0.0
        for v in vals:
            acc += v
        return acc

    selfdot = [
        [_py_fold([x * x for x in cw[m][j]]) for j in range(PQ_K)] for m in range(PQ_M)
    ]

    def _lit_arr(vals):
        return F.array(*[F.lit(float(v)) for v in vals])

    def _fold(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    cw_lit = F.array(
        *[F.array(*[_lit_arr(cw[m][j]) for j in range(PQ_K)]) for m in range(PQ_M)]
    )
    sd_lit = F.array(*[_lit_arr(selfdot[m]) for m in range(PQ_M)])
    _MS = F.sequence(F.lit(0), F.lit(PQ_M - 1))

    def _sub_of(emb_col, m):
        return F.slice(emb_col, m * PQ_D + F.lit(1), F.lit(PQ_D))

    def _codes_expr(emb_col):
        def per_m(m):
            sub = _sub_of(emb_col, m)
            d2s = F.transform(
                F.get(cw_lit, m),
                lambda cwj: _fold(F.zip_with(sub, cwj, lambda x, y: (x - y) * (x - y))),
            )
            return (F.array_position(d2s, F.array_min(d2s)) - 1).cast("int")

        return F.transform(_MS, per_m)

    def with_codes(df, emb_col):
        df = df.withColumn("codes", _codes_expr(F.col(emb_col)))
        self_terms = F.zip_with(F.col("codes"), sd_lit, lambda c, sdm: F.get(sdm, c))
        return df.withColumn("pq_nrm", F.sqrt(_fold(self_terms)))

    cent = _cent(e)
    ccos = cosine_from_norms(
        _dot(F.col("emb"), F.col("c_emb")), F.col("nrm"), F.col("c_nrm")
    )
    cw_win = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    scored_cells = (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", "cid", "emb", "nrm", ccos.alias("ccos"))
        .withColumn("crk", F.row_number().over(cw_win))
    )
    assign = with_codes(
        scored_cells.where(F.col("crk") == 1).select(
            F.col("vec_id").alias("c_id"), "cid", "emb"
        ),
        "emb",
    ).select("c_id", "cid", "codes", "pq_nrm")

    def _qtab_per_m(m):
        sub = _sub_of(F.col("emb"), m)
        return F.transform(
            F.get(cw_lit, m),
            lambda cwj: _fold(F.zip_with(sub, cwj, lambda x, y: x * y)),
        )

    qtab = F.transform(_MS, _qtab_per_m)
    probes = (
        scored_cells.where((F.col("crk") <= N_PROBE) & (F.col("vec_id") < N_QUERIES))
        .select(F.col("vec_id").alias("q_id"), "cid", "emb", F.col("nrm").alias("q_nrm"))
        .withColumn("qtab", qtab)
        .select("q_id", "cid", "qtab", "q_nrm")
    )

    adc_dot = _fold(
        F.zip_with(F.col("codes"), F.col("qtab"), lambda c, row: F.get(row, c))
    )
    shortlist_w = Window.partitionBy("q_id").orderBy(F.desc("approx_cos"), F.asc("c_id"))
    shortlist = (
        assign.join(F.broadcast(probes), "cid")
        .where(F.col("c_id") != F.col("q_id"))
        .select(
            "q_id",
            "c_id",
            (adc_dot / (F.col("q_nrm") * F.col("pq_nrm"))).alias("approx_cos"),
        )
        .withColumn("crank", F.row_number().over(shortlist_w))
        .where(F.col("crank") <= PQ_RERANK)
        .select("q_id", "c_id")
    )
    cs = cosine_from_norms(
        _dot(F.col("q_emb"), F.col("c_emb")), F.col("q_nrm"), F.col("c_nrm")
    )
    rank_w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        shortlist.join(
            e.select(
                F.col("vec_id").alias("c_id"),
                F.col("emb").alias("c_emb"),
                F.col("nrm").alias("c_nrm"),
            ),
            "c_id",
        )
        .join(
            F.broadcast(
                e.where(F.col("vec_id") < N_QUERIES).select(
                    F.col("vec_id").alias("q_id"),
                    F.col("emb").alias("q_emb"),
                    F.col("nrm").alias("q_nrm"),
                )
            ),
            "q_id",
        )
        .select("q_id", "c_id", F.round(cs, 4).alias("cos_sim"))
        .withColumn("rk", F.row_number().over(rank_w).cast("bigint"))
        .where(F.col("rk") <= TOP_K)
        .orderBy("q_id", "rk")
    )


def main():
    spark = get_session("ab-ann-r13")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    pairs = {
        "ivf": (old_ivf, lambda s, d: ann_ivf_topk.__wrapped__(s, d)),
        "ivfpq": (old_ivfpq, lambda s, d: ann_ivfpq_topk.__wrapped__(s, d)),
    }
    for name, (o, n) in pairs.items():
        ref = [tuple(r) for r in o(spark, SF_DIR).collect()]
        got = [tuple(r) for r in n(spark, SF_DIR).collect()]
        assert got == ref, f"{name} differs!"
        print(f"{name}: rows identical ({len(got)})", flush=True)
        spark.catalog.clearCache()

    n_rounds = int(os.environ.get("AB_ROUNDS", "6"))
    best: dict[str, float] = {}
    for r in range(n_rounds):
        for name, (o, n) in pairs.items():
            for tag, fn in (("old", o), ("new", n)):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                k = f"{name}_{tag}"
                best[k] = min(best.get(k, 1e9), dt)
                spark.catalog.clearCache()
                print(f"round {r} {k}: {dt:.3f}s", flush=True)
    print("BEST:", {k: round(v, 3) for k, v in best.items()})


if __name__ == "__main__":
    main()
