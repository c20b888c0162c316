"""Sketch-accuracy checks beyond the registry flags: the self-certifying
queries (r4) carry their approx-vs-exact bounds IN-PLAN and the oracle
pins the flags to 1; these tests additionally recompute the raw
estimates so a flag bug (e.g. a flipped comparison) cannot hide a
broken sketch."""

from __future__ import annotations

import pyspark.sql.functions as F

from mysql_postgres_debezium_cdc_spark.registry import all_queries
from mysql_postgres_debezium_cdc_spark.sources.parquet import load
from tests.conftest import SF_DIR_ORACLE


def test_approx_count_distinct_flags_and_raw_bound(spark):
    rows = all_queries()["agg_approx_count_distinct"].fn(spark, SF_DIR_ORACLE).collect()
    assert rows and all(r["approx_within_5pct"] == 1 for r in rows)
    li = load(spark, SF_DIR_ORACLE, "lineitem")
    raw = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("a"),
        F.count_distinct(F.col("l_partkey")).alias("e"),
    )
    for r in raw.collect():
        assert abs(r["a"] - r["e"]) / r["e"] <= 0.05, r


def test_hll_sketch_merge_matches_direct(spark):
    """Union of per-group sketches must estimate the same cardinality as
    sketching the whole column directly, and land within 5% of exact."""
    row = all_queries()["agg_hll_sketch_mergeable"].fn(spark, SF_DIR_ORACLE).collect()[0]
    assert row["merged_within_5pct"] == 1 and row["merge_agrees_direct"] == 1
    li = load(spark, SF_DIR_ORACLE, "lineitem")
    exact = li.select("l_partkey").distinct().count()
    assert row["exact_global_parts"] == exact
    direct = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("e")
    ).collect()[0]["e"]
    assert abs(direct - exact) / exact <= 0.05


def test_approx_percentile_within_bound(spark):
    """GK-sketch percentiles at accuracy=10000 must land within 0.5%
    (relative) of the exact per-group percentiles — tighter than the
    registry query's quantile band."""
    rows = all_queries()["agg_approx_percentile"].fn(spark, SF_DIR_ORACLE).collect()
    assert rows and all(r["approx_in_band"] == 1 for r in rows)
    li = load(spark, SF_DIR_ORACLE, "lineitem")
    ap = F.expr("percentile_approx(l_extendedprice, array(0.5, 0.9, 0.99), 10000)")
    ex = F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
    both = li.groupBy("l_returnflag").agg(ap.alias("a"), ex.alias("e"))
    for r in both.collect():
        for a, e in zip(r["a"], r["e"]):
            assert abs(a - e) / e <= 0.005, (r["l_returnflag"], a, e)


def test_percentiles_match_oracle_on_tiny_groups(spark):
    """sf0.001 regression pin: with two-element groups, percentile
    interpolation lands on exact midpoints — raw-price doubles rounded
    at 2dp flipped between engines (caught by the full sf0.001 sweep);
    the integer-cents formulation must hold at the smallest fixture."""
    from mysql_postgres_debezium_cdc_spark.registry import all_queries
    from tests.parity import compare, duck_connection

    con = duck_connection("/root/testdata/sf0.001")
    try:
        for key in ("agg_percentiles", "agg_approx_percentile"):
            spec = all_queries()[key]
            errors = compare(spec.fn(spark, "/root/testdata/sf0.001"), con.sql(spec.oracle).df())
            assert not errors, (key, errors)
    finally:
        con.close()
