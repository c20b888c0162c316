#!/usr/bin/env python
"""r13: `_banded_rank_cums` + `_winsorized_welch` as SQL-string
expressions — the same py4j-chatter cut as the experiment report
(scripts/ab_report_expr_r13.py): the DSL window/select trees cost one
blocking socket round trip per operator; the strings parse JVM-side
into the IDENTICAL trees (window frames spelled out explicitly, since
the DSL used explicit rowsBetween frames).

`check`: the r13-pre DSL formulations (inline below, verbatim) vs the
repo implementations — analyzed plans identical modulo expression ids
AND identical rows at all three scales, for the banded grid itself and
for `events_experiment_winsorized`.
`ab`: interleaved best-of-6 build+action of events_experiment_winsorized
at sf0.1."""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from mysql_postgres_debezium_cdc_spark.operators import behavioral as B  # noqa: E402
from mysql_postgres_debezium_cdc_spark.session import get_session  # noqa: E402
from mysql_postgres_debezium_cdc_spark.sources.parquet import load  # noqa: E402


def banded_dsl_r12(vals):
    """The pre-r13 DSL body of _banded_rank_cums, verbatim."""
    banded = vals.withColumn(
        "band",
        F.when(F.col("v") > 0, F.length(F.bin(F.col("v"))))
        .when(F.col("v") < 0, -F.length(F.bin(-F.col("v"))))
        .otherwise(F.lit(0)),
    ).persist()
    wb = Window.partitionBy("band").orderBy("v")
    inc = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    exc = wb.rowsBetween(Window.unboundedPreceding, -1)
    t = F.col("ca") + F.col("cb")
    within = banded.select(
        "band",
        "v",
        "ca",
        "cb",
        t.alias("t"),
        F.sum("ca").over(inc).alias("wca"),
        F.sum("cb").over(inc).alias("wcb"),
        F.coalesce(F.sum(t).over(exc), F.lit(0)).alias("wbefore"),
    )
    bands = banded.groupBy("band").agg(
        F.sum("ca").alias("bca"), F.sum("cb").alias("bcb")
    )
    woff = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy()
    off = bands.select(
        "band",
        F.coalesce(F.sum("bca").over(woff), F.lit(0)).alias("off_ca"),
        F.coalesce(F.sum("bcb").over(woff), F.lit(0)).alias("off_cb"),
        F.sum("bca").over(wall).alias("t1"),
        F.sum("bcb").over(wall).alias("t2"),
    )
    return within.join(F.broadcast(off), "band").select(
        "v",
        "ca",
        "cb",
        "t",
        (F.col("wbefore") + F.col("off_ca") + F.col("off_cb")).alias("before"),
        (F.col("wca") + F.col("off_ca")).alias("c1"),
        (F.col("wcb") + F.col("off_cb")).alias("c2"),
        "t1",
        "t2",
    )


def winsorized_welch_dsl_r12(per_user):
    """The pre-r13 DSL body of _winsorized_welch, verbatim (over the
    DSL banded grid so the comparison is end-to-end old-vs-new)."""
    per_user = per_user.persist()
    vals = per_user.groupBy(F.col("y").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("ca"),
        F.lit(0).cast("bigint").alias("cb"),
    )
    cums = banded_dsl_r12(vals)
    cap = cums.agg(
        F.min(
            F.when(
                F.col("c1") * 100 >= F.col("t1") * F.lit(B.WINSOR_PCT), F.col("v")
            )
        ).alias("cap")
    )
    capped = per_user.crossJoin(F.broadcast(cap)).select(
        "arm", F.least(F.col("y"), F.col("cap")).alias("y"), "cap"
    )
    s = capped.agg(
        F.count(F.when(F.col("arm") == 1, 1)).cast("bigint").alias("nt"),
        F.count(F.when(F.col("arm") == 0, 1)).cast("bigint").alias("nc"),
        F.coalesce(F.sum(F.when(F.col("arm") == 1, F.col("y"))), F.lit(0))
        .cast("bigint")
        .alias("st"),
        F.coalesce(F.sum(F.when(F.col("arm") == 0, F.col("y"))), F.lit(0))
        .cast("bigint")
        .alias("sc"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 1, F.col("y") * F.col("y"))), F.lit(0)
        )
        .cast("bigint")
        .alias("sst"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 0, F.col("y") * F.col("y"))), F.lit(0)
        )
        .cast("bigint")
        .alias("ssc"),
        F.max("cap").alias("cap"),
    )
    nt, nc = F.col("nt"), F.col("nc")
    st, sc, sst, ssc = F.col("st"), F.col("sc"), F.col("sst"), F.col("ssc")
    ntd, ncd = nt.cast("double"), nc.cast("double")
    theta = st.cast("double") / nt - sc.cast("double") / nc
    v = (ntd * sst.cast("double") - st.cast("double") * st) / (
        ntd * (nt - F.lit(1)) * nt
    ) + (ncd * ssc.cast("double") - sc.cast("double") * sc) / (
        ncd * (nc - F.lit(1)) * nc
    )
    t_stat = F.round(theta / F.sqrt(v), 4)
    ok = (nt >= 2) & (nc >= 2)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    var_pos = (dec(nt) * sst - dec(st) * st + (dec(nc) * ssc - dec(sc) * sc)) > 0
    return s.select(
        nt.alias("n_treat"),
        nc.alias("n_ctrl"),
        F.col("cap").alias("winsor_cap_cents"),
        F.when(ok, F.round(theta / F.lit(100.0), 4)).alias("mean_diff"),
        F.when(ok & var_pos, t_stat).alias("t_stat"),
        F.when(ok & var_pos, F.abs(t_stat) >= F.lit(1.96)).alias("significant_05"),
    )


def norm_plan(df):
    return re.sub(r"#\d+", "#N", df._jdf.queryExecution().analyzed().toString())


def main():
    from mysql_postgres_debezium_cdc_spark.operators.stats import _banded_rank_cums

    spark = get_session("ab-banded-expr-r13")
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    rc = 0
    if mode == "check":
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            sfd = f"/root/testdata/{sf}"
            pu = B._experiment_per_user(load(spark, sfd, "events")).select(
                (F.col("user_id") % 2).alias("arm"), "y"
            )
            old = winsorized_welch_dsl_r12(pu)
            new = B._winsorized_welch(pu)
            plan_same = norm_plan(old) == norm_plan(new)
            rows_same = old.collect() == new.collect()
            # the grid itself, standalone
            vals = pu.groupBy(F.col("y").alias("v")).agg(
                F.count(F.lit(1)).cast("bigint").alias("ca"),
                F.lit(0).cast("bigint").alias("cb"),
            )
            g_old, g_new = banded_dsl_r12(vals), _banded_rank_cums(vals)
            g_plan = norm_plan(g_old) == norm_plan(g_new)
            g_rows = sorted(map(tuple, g_old.collect())) == sorted(
                map(tuple, g_new.collect())
            )
            ok = plan_same and rows_same and g_plan and g_rows
            rc |= 0 if ok else 1
            print(
                f"{sf}: welch plan_identical={plan_same} rows={rows_same} | "
                f"grid plan_identical={g_plan} rows={g_rows}",
                flush=True,
            )
            if not plan_same:
                import difflib

                for ln in list(
                    difflib.unified_diff(
                        norm_plan(old).splitlines(),
                        norm_plan(new).splitlines(),
                        lineterm="",
                    )
                )[:20]:
                    print("   ", ln)
            spark.catalog.clearCache()
    else:
        from mysql_postgres_debezium_cdc_spark.registry import all_queries

        sfd = "/root/testdata/sf0.1"
        spark.read.parquet(f"{sfd}/region.parquet").count()
        new_fn = all_queries()["events_experiment_winsorized"].fn

        def old_fn(spark, sf_dir):
            per_user = B._experiment_per_user(load(spark, sf_dir, "events")).select(
                (F.col("user_id") % 2).alias("arm"), "y"
            )
            return winsorized_welch_dsl_r12(per_user)

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
