#!/usr/bin/env python
"""r13: dedup_media_lsh's bucket-key / dot-product trees as SQL-string
expressions — the same py4j-chatter cut as the report and banded-grid
rewrites (scripts/ab_report_expr_r13.py).  The 16 grid-cell
expressions and the 3×8-term dot products cost ~3 000 blocking py4j
round trips per build (cProfile: 0.66 s socket wait of a 1.0 s build).

`check`: the pre-r13 DSL formulation (inline, verbatim) vs the repo —
analyzed plans identical modulo expression ids AND identical rows at
all three scales.  `ab`: interleaved best-of-6 at sf0.1."""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F  # noqa: E402

from mysql_postgres_debezium_cdc_spark.llm import multimodal as M  # noqa: E402
from mysql_postgres_debezium_cdc_spark.session import get_session  # noqa: E402


def _media_key_columns_dsl_r12() -> list:
    keys = []
    for band in (0, 1):
        for off in (0, M.MEDIA_LSH_GRID // 2):
            cells = [
                F.floor(
                    (F.element_at("f", band * 4 + i) + F.lit(off))
                    / F.lit(M.MEDIA_LSH_GRID)
                ).cast("bigint")
                for i in range(1, 5)
            ]
            keys.append(
                F.concat_ws(
                    ",",
                    F.lit(str(band)),
                    F.lit(str(off)),
                    *[c.cast("string") for c in cells],
                )
            )
    return keys


def _media_pairs_dsl_r12(feats, max_bucket_width=M.MEDIA_LSH_BUCKET_WIDTH):
    """The pre-r13 DSL body of _media_pairs_from_features, verbatim."""
    from mysql_postgres_debezium_cdc_spark.llm.dedup import _pairs_from_bucket

    keyed = feats.select(
        "doc_id", F.explode(F.array(*_media_key_columns_dsl_r12())).alias("bkey")
    )
    buckets = (
        keyed.groupBy("bkey")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .where(F.size("docs") > 1)
    )
    cand = _pairs_from_bucket(buckets, max_bucket_width=max_bucket_width).distinct()
    fa = feats.select(F.col("doc_id").alias("doc_a"), F.col("f").alias("fa"))
    fb = feats.select(F.col("doc_id").alias("doc_b"), F.col("f").alias("fb"))

    def _dotcol(x: str, y: str):
        terms = [F.element_at(x, i) * F.element_at(y, i) for i in range(1, 9)]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    scored = (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            _dotcol("fa", "fb").alias("dot"),
            _dotcol("fa", "fa").alias("na"),
            _dotcol("fb", "fb").alias("nb"),
        )
    )
    return (
        scored.where(
            (F.col("na") > 0)
            & (F.col("nb") > 0)
            & (
                dec(F.col("dot")) * F.col("dot") * 100000000
                >= dec(F.lit(M.MEDIA_LSH_THRESH_SQ_E8)) * F.col("na") * F.col("nb")
            )
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                ),
                4,
            ).alias("cos_sim"),
        )
        .orderBy("doc_a", "doc_b")
    )


def _feats(spark, sfd):
    return (
        M.extract_features(M.media_table(spark, sfd), fake=True)
        .select(
            "doc_id",
            F.transform("features", lambda x: x.cast("bigint")).alias("f"),
        )
        .persist()
    )


def norm_plan(df):
    txt = df._jdf.queryExecution().analyzed().toString()
    txt = re.sub(r"#\d+", "#N", txt)
    # lambda-variable names carry a session-global counter (x_3, y_4…)
    # that differs between two builds of the SAME tree — normalize it.
    return re.sub(r"(lambda [a-z]+)_\d+", r"\1_K", txt)


def main():
    spark = get_session("ab-media-expr-r13")
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    rc = 0
    if mode == "check":
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            sfd = f"/root/testdata/{sf}"
            feats = _feats(spark, sfd)
            old = _media_pairs_dsl_r12(feats)
            new = M._media_pairs_from_features(feats)
            plan_same = norm_plan(old) == norm_plan(new)
            rows_same = old.collect() == new.collect()
            ok = plan_same and rows_same
            rc |= 0 if ok else 1
            print(
                f"{sf}: plan_identical={plan_same} rows={rows_same}", flush=True
            )
            if not plan_same:
                import difflib

                for ln in list(
                    difflib.unified_diff(
                        norm_plan(old).splitlines(),
                        norm_plan(new).splitlines(),
                        lineterm="",
                    )
                )[:24]:
                    print("   ", ln)
            spark.catalog.clearCache()
    else:
        from mysql_postgres_debezium_cdc_spark.registry import all_queries

        sfd = "/root/testdata/sf0.1"
        spark.read.parquet(f"{sfd}/region.parquet").count()
        new_fn = all_queries()["dedup_media_lsh"].fn

        def old_fn(spark, sf_dir):
            return _media_pairs_dsl_r12(_feats(spark, sf_dir))

        for rnd in range(6):
            for name, fn in (("old", old_fn), ("new", new_fn)):
                t0 = time.perf_counter()
                df = fn(spark, sfd)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                spark.catalog.clearCache()
                print(
                    f"round{rnd} {name}: build={t1 - t0:.3f} "
                    f"action={t2 - t1:.3f} total={t2 - t0:.3f}",
                    flush=True,
                )
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
