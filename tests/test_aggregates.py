"""Aggregate checks that SQL oracles can't express: sketch-accuracy
bounds for the approximate aggregates."""

from __future__ import annotations

from mysql_postgres_debezium_cdc_spark.registry import all_queries
from tests.conftest import SF_DIR_ORACLE


def test_approx_count_distinct_within_bound(spark):
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in all_queries()["agg_approx_count_distinct"].fn(spark, SF_DIR_ORACLE).collect()
    }
    exact = {
        r["l_returnflag"]: r["n_parts"]
        for r in all_queries()["agg_count_distinct"].fn(spark, SF_DIR_ORACLE).collect()
    }
    assert set(approx) == set(exact)
    for flag, e in exact.items():
        rel = abs(approx[flag] - e) / e
        assert rel <= 0.05, f"{flag}: approx {approx[flag]} vs exact {e} ({rel:.1%})"


def test_hll_sketch_merge_matches_direct(spark):
    """Union of per-group sketches must estimate the same cardinality as
    sketching the whole column directly, and land within 5% of exact."""
    import pyspark.sql.functions as F

    from mysql_postgres_debezium_cdc_spark.sources.parquet import load

    li = load(spark, SF_DIR_ORACLE, "lineitem")
    exact = li.select("l_partkey").distinct().count()
    merged = all_queries()["agg_hll_sketch_mergeable"].fn(spark, SF_DIR_ORACLE).collect()[0][
        "approx_global_parts"
    ]
    direct = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("e")
    ).collect()[0]["e"]
    # union-of-sketches and direct sketching take different register
    # paths; both must land within the sketch's error bound of exact
    assert abs(merged - exact) / exact <= 0.05
    assert abs(direct - exact) / exact <= 0.05
    assert abs(merged - direct) / exact <= 0.05


def test_approx_percentile_within_bound(spark):
    """GK-sketch percentiles at accuracy=10000 must land within 0.5%
    (relative) of the exact per-group percentiles."""
    import pyspark.sql.functions as F

    from mysql_postgres_debezium_cdc_spark.sources.parquet import load

    approx = {
        r["l_returnflag"]: (r["p50"], r["p90"], r["p99"])
        for r in all_queries()["agg_approx_percentile"].fn(spark, SF_DIR_ORACLE).collect()
    }
    li = load(spark, SF_DIR_ORACLE, "lineitem")
    ex = F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
    exact = {
        r["l_returnflag"]: r["ex"]
        for r in li.groupBy("l_returnflag").agg(ex.alias("ex")).collect()
    }
    assert set(approx) == set(exact)
    for flag, (a50, a90, a99) in approx.items():
        for a, e in zip((a50, a90, a99), exact[flag]):
            assert abs(a - e) / e <= 0.005, (flag, a, e)
