#!/usr/bin/env python
"""r13: the experiment-report build rebuilt as SQL-string expressions.

The report family's `fn()` build cost ~2 s warm, of which cProfile
attributes 1.67 s to ~6 500 blocking py4j round trips — the Column DSL
pays one socket round trip per operator.  The rewrite keeps the exact
same expression trees but ships them as SQL strings (`F.expr` /
`selectExpr`), one round trip each, parsed JVM-side.

`check` mode proves equivalence: the r12 DSL formulation (reconstructed
inline below, verbatim) and the repo implementation must produce
IDENTICAL analyzed plans modulo expression ids, and identical rows, at
all three fixture scales — for both `_experiment_report_from_per_user`
and the `events_effect_msprt` tree that now routes through
`_msprt_sql`.

`ab` mode interleaves old/new full build+action at sf0.1, best-of-6.

Two parser traps the strings must respect (both caught by the plan
comparison when violated): a bare `100.0` literal parses as
DECIMAL(4,1) in Spark SQL where the DSL's F.lit(100.0) is a DOUBLE
(hence the `D` suffixes), and Python's `2 * col` reverse-op builds
`col * 2` (hence `before * 2`)."""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F  # noqa: E402

from mysql_postgres_debezium_cdc_spark.operators import behavioral as B  # noqa: E402
from mysql_postgres_debezium_cdc_spark.session import get_session  # noqa: E402
from mysql_postgres_debezium_cdc_spark.sources.parquet import load  # noqa: E402


def _msprt_cols_dsl_r12(nt, nc, st, sc, sst, ssc):
    """The r12 DSL body of _msprt_cols, verbatim (Column args)."""
    ntd, ncd = nt.cast("double"), nc.cast("double")
    theta = st.cast("double") / nt - sc.cast("double") / nc
    v = (ntd * sst.cast("double") - st.cast("double") * st) / (
        ntd * (nt - F.lit(1)) * nt
    ) + (ncd * ssc.cast("double") - sc.cast("double") * sc) / (
        ncd * (nc - F.lit(1)) * nc
    )
    tau2 = F.lit(float(B._TAU2_MSPRT))
    log_bf = F.lit(0.5) * F.log(v / (v + tau2)) + theta * theta * tau2 / (
        F.lit(2.0) * v * (v + tau2)
    )
    return theta, v, log_bf


def report_dsl_r12(per_user):
    """The r12 DSL formulation of _experiment_report_from_per_user,
    reconstructed verbatim from git history for the A/B."""
    from mysql_postgres_debezium_cdc_spark.operators.stats import (
        _banded_rank_cums,
        _dec_floordiv_1e6,
    )

    stats = (
        per_user.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.count(F.when(F.col("arm") == 1, 1)).cast("bigint").alias("nt"),
            F.sum(F.when(F.col("arm") == 1, F.col("x"))).alias("sxt"),
            F.sum(F.when(F.col("arm") == 1, F.col("y"))).alias("syt"),
            F.sum(F.when(F.col("arm") == 1, F.col("y") * F.col("y"))).alias("syyt"),
            F.count(F.when(F.col("arm") == 0, 1)).cast("bigint").alias("nc"),
            F.sum(F.when(F.col("arm") == 0, F.col("x"))).alias("sxc"),
            F.sum(F.when(F.col("arm") == 0, F.col("y"))).alias("syc"),
            F.sum(F.when(F.col("arm") == 0, F.col("y") * F.col("y"))).alias("syyc"),
        )
        .where((F.col("nt") > 0) & (F.col("nc") > 0))
        .persist()
    )
    dn = F.col("n").cast("double")
    cov_n = dn * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    varx_n = dn * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")

    nullb = F.lit(None).cast("boolean")
    nulld = F.lit(None).cast("double")
    raw_row = stats.select(
        F.lit("uplift_raw").alias("metric"),
        F.col("nt").alias("n_treat"),
        F.col("nc").alias("n_ctrl"),
        F.round(
            (
                F.col("syt").cast("double") / F.col("nt")
                - F.col("syc").cast("double") / F.col("nc")
            )
            / 100.0,
            4,
        ).alias("estimate"),
        nulld.alias("stat"),
        nullb.alias("significant"),
    )
    theta = cov_n / varx_n
    mean_x_all = F.col("sx").cast("double") / F.col("n")
    adj_t = F.col("syt").cast("double") / F.col("nt") - theta * (
        F.col("sxt").cast("double") / F.col("nt") - mean_x_all
    )
    adj_c = F.col("syc").cast("double") / F.col("nc") - theta * (
        F.col("sxc").cast("double") / F.col("nc") - mean_x_all
    )
    cuped_row = stats.select(
        F.lit("uplift_cuped").alias("metric"),
        F.col("nt").alias("n_treat"),
        F.col("nc").alias("n_ctrl"),
        F.when(varx_n != 0, F.round((adj_t - adj_c) / 100.0, 4)).alias("estimate"),
        F.when(varx_n != 0, F.round(theta, 6)).alias("stat"),
        nullb.alias("significant"),
    )

    m_nt, m_nc = F.col("nt"), F.col("nc")
    m_theta, _m_v, m_log_bf = _msprt_cols_dsl_r12(
        m_nt, m_nc, F.col("syt"), F.col("syc"), F.col("syyt"), F.col("syyc")
    )
    m_ok = (m_nt >= 2) & (m_nc >= 2)
    decg = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    m_var_pos = (
        decg(m_nt) * F.col("syyt")
        - decg(F.col("syt")) * F.col("syt")
        + (decg(m_nc) * F.col("syyc") - decg(F.col("syc")) * F.col("syc"))
    ) > 0
    msprt_row = stats.select(
        F.lit("msprt").alias("metric"),
        m_nt.alias("n_treat"),
        m_nc.alias("n_ctrl"),
        F.when(m_ok, F.round(m_theta / F.lit(100.0), 4)).alias("estimate"),
        F.when(m_ok & m_var_pos, F.round(m_log_bf, 6)).alias("stat"),
        F.when(
            m_ok & m_var_pos, F.round(m_log_bf, 6) > F.lit(float(B._LN_20))
        ).alias("significant"),
    )

    vals = per_user.groupBy(F.col("y").alias("v")).agg(
        F.count(F.when(F.col("arm") == 1, 1)).cast("bigint").alias("ca"),
        F.count(F.when(F.col("arm") == 0, 1)).cast("bigint").alias("cb"),
    )
    cum = _banded_rank_cums(vals).persist()
    mw = cum.agg(
        F.coalesce(F.sum("ca"), F.lit(0)).cast("bigint").alias("n1"),
        F.coalesce(F.sum("cb"), F.lit(0)).cast("bigint").alias("n2"),
        F.coalesce(
            F.sum(F.col("ca") * (2 * F.col("before") + F.col("t") + 1)), F.lit(0)
        )
        .cast("bigint")
        .alias("r2x"),
        F.coalesce(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")), F.lit(0)
        )
        .cast("bigint")
        .alias("ties"),
        F.max(F.abs(F.col("c1") * F.col("t2") - F.col("c2") * F.col("t1")))
        .cast("bigint")
        .alias("d_num"),
    ).persist()
    n1, n2 = F.col("n1"), F.col("n2")
    u = (F.col("r2x") - n1 * (n1 + 1)) / 2.0
    sigma2 = (n1.cast("double") * n2 / 12.0) * (
        (n1 + n2 + 1)
        - F.col("ties").cast("double") / ((n1 + n2).cast("double") * (n1 + n2 - 1))
    )
    z_cond = (n1 > 0) & (n2 > 0) & (n1 + n2 > 1) & (sigma2 > 0)
    z4 = F.round((u - n1.cast("double") * n2 / 2.0) / F.sqrt(sigma2), 4)
    mw_row = mw.select(
        F.lit("mann_whitney").alias("metric"),
        n1.alias("n_treat"),
        n2.alias("n_ctrl"),
        F.when(n1 > 0, u).alias("estimate"),
        F.when(z_cond, z4).alias("stat"),
        F.when(z_cond, F.abs(z4) >= 1.96).alias("significant"),
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    ks_row = mw.select(
        F.lit("ks").alias("metric"),
        n1.alias("n_treat"),
        n2.alias("n_ctrl"),
        F.when(
            (n1 > 0) & (n2 > 0),
            F.round(F.col("d_num").cast("double") / (n1.cast("double") * n2), 6),
        ).alias("estimate"),
        F.col("d_num").cast("double").alias("stat"),
        F.when(
            (n1 > 0) & (n2 > 0),
            dec(F.col("d_num")) * F.col("d_num")
            > _dec_floordiv_1e6(
                dec(F.lit(B._KS_ALPHA05_SQ_E6)) * (n1 + n2) * n1 * n2
            ),
        ).alias("significant"),
    )
    wcap = cum.agg(
        F.min(
            F.when(
                (F.col("c1") + F.col("c2")) * 100
                >= (F.col("t1") + F.col("t2")) * F.lit(B.WINSOR_PCT),
                F.col("v"),
            )
        ).alias("cap")
    )
    wy = F.least(F.col("v"), F.col("cap"))
    wsums = cum.select("v", "ca", "cb").crossJoin(F.broadcast(wcap)).agg(
        F.coalesce(F.sum("ca"), F.lit(0)).cast("bigint").alias("wnt"),
        F.coalesce(F.sum("cb"), F.lit(0)).cast("bigint").alias("wnc"),
        F.coalesce(F.sum(F.col("ca") * wy), F.lit(0)).cast("bigint").alias("wst"),
        F.coalesce(F.sum(F.col("cb") * wy), F.lit(0)).cast("bigint").alias("wsc"),
        F.coalesce(F.sum(F.col("ca") * wy * wy), F.lit(0))
        .cast("bigint")
        .alias("wsst"),
        F.coalesce(F.sum(F.col("cb") * wy * wy), F.lit(0))
        .cast("bigint")
        .alias("wssc"),
    )
    wnt, wnc = F.col("wnt"), F.col("wnc")
    wst, wsc, wsst, wssc = (
        F.col("wst"),
        F.col("wsc"),
        F.col("wsst"),
        F.col("wssc"),
    )
    w_theta = wst.cast("double") / wnt - wsc.cast("double") / wnc
    w_v = (wnt.cast("double") * wsst.cast("double") - wst.cast("double") * wst) / (
        wnt.cast("double") * (wnt - F.lit(1)) * wnt
    ) + (wnc.cast("double") * wssc.cast("double") - wsc.cast("double") * wsc) / (
        wnc.cast("double") * (wnc - F.lit(1)) * wnc
    )
    w_t = F.round(w_theta / F.sqrt(w_v), 4)
    w_ok = (wnt >= 2) & (wnc >= 2)
    w_var_pos = (
        dec(wnt) * wsst - dec(wst) * wst + (dec(wnc) * wssc - dec(wsc) * wsc)
    ) > 0
    winsor_row = wsums.select(
        F.lit("winsorized").alias("metric"),
        wnt.alias("n_treat"),
        wnc.alias("n_ctrl"),
        F.when(w_ok, F.round(w_theta / F.lit(100.0), 4)).alias("estimate"),
        F.when(w_ok & w_var_pos, w_t).alias("stat"),
        F.when(w_ok & w_var_pos, F.abs(w_t) >= F.lit(1.96)).alias("significant"),
    )
    return (
        raw_row.unionAll(cuped_row)
        .unionAll(msprt_row)
        .unionAll(mw_row)
        .unionAll(ks_row)
        .unionAll(winsor_row)
        .orderBy("metric")
    )


def msprt_dsl_r12(spark, sf_dir):
    """The r12 DSL formulation of events_effect_msprt (verbatim)."""
    per_user = B._experiment_per_user(load(spark, sf_dir, "events")).select(
        (F.col("user_id") % 2).alias("arm"), "y"
    )
    s = per_user.agg(
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
    )
    nt, nc = F.col("nt"), F.col("nc")
    st, sc, sst, ssc = F.col("st"), F.col("sc"), F.col("sst"), F.col("ssc")
    theta, v, log_bf = _msprt_cols_dsl_r12(nt, nc, st, sc, sst, ssc)
    ok = (nt >= 2) & (nc >= 2)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    var_pos = (dec(nt) * sst - dec(st) * st + (dec(nc) * ssc - dec(sc) * sc)) > 0
    return s.select(
        nt.alias("n_treat"),
        nc.alias("n_ctrl"),
        F.when(ok, F.round(theta / F.lit(100.0), 4)).alias("mean_diff"),
        F.when(ok & var_pos, F.round(log_bf, 6)).alias("log_bf"),
        F.when(
            ok & var_pos,
            F.round(F.least(F.lit(1.0), F.exp(-F.round(log_bf, 6))), 6),
        ).alias("p_always_valid"),
        F.when(ok & var_pos, F.round(log_bf, 6) > F.lit(float(B._LN_20))).alias(
            "effect_detected"
        ),
    )


def norm_plan(df):
    return re.sub(r"#\d+", "#N", df._jdf.queryExecution().analyzed().toString())


def _per_user(spark, sfd):
    return (
        B._experiment_per_user(load(spark, sfd, "events"))
        .select((F.col("user_id") % 2).alias("arm"), "x", "y")
        .persist()
    )


def main():
    spark = get_session("ab-report-expr-r13")
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    rc = 0
    if mode == "check":
        from mysql_postgres_debezium_cdc_spark.registry import all_queries

        specs = all_queries()
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            sfd = f"/root/testdata/{sf}"
            pu = _per_user(spark, sfd)
            old = report_dsl_r12(pu)
            new = B._experiment_report_from_per_user(pu)
            plan_same = norm_plan(old) == norm_plan(new)
            rows_same = old.collect() == new.collect()
            m_old = msprt_dsl_r12(spark, sfd)
            m_new = specs["events_effect_msprt"].fn(spark, sfd)
            m_plan = norm_plan(m_old) == norm_plan(m_new)
            m_rows = m_old.collect() == m_new.collect()
            ok = plan_same and rows_same and m_plan and m_rows
            rc |= 0 if ok else 1
            print(
                f"{sf}: report plan_identical={plan_same} rows={rows_same} | "
                f"msprt plan_identical={m_plan} rows={m_rows}",
                flush=True,
            )
            spark.catalog.clearCache()
    else:
        sfd = "/root/testdata/sf0.1"
        spark.read.parquet(f"{sfd}/region.parquet").count()
        for rnd in range(6):
            for name, fn in (
                ("old", report_dsl_r12),
                ("new", B._experiment_report_from_per_user),
            ):
                t0 = time.perf_counter()
                df = fn(_per_user(spark, sfd))
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
