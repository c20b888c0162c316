"""Spill-path robustness: operators must complete (correctly) when
their in-memory buffers are forced to disk.

At 100 TB some partition always exceeds executor memory; the scale
contract is that window/sort/aggregate fall back to spilling external
buffers rather than OOM.  Forcing the spill thresholds to tiny values
runs the fixture workload through the SAME external-spill code paths a
memory-pressured cluster hits, and asserts results are unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window


def _with_confs(spark, confs):
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return saved


def _restore(spark, saved):
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_window_completes_with_forced_spill(spark):
    confs = {
        # every window partition buffer past 16 rows goes to disk
        "spark.sql.windowExecBufferSpillThreshold": "16",
        "spark.sql.windowExecBufferInMemoryThreshold": "16",
    }
    saved = _with_confs(spark, confs)
    try:
        df = spark.range(200_000).selectExpr("id % 7 AS k", "id")
        w = Window.partitionBy("k").orderBy("id")
        spilled = (
            df.select("k", F.row_number().over(w).alias("rn"), F.sum("id").over(w).alias("s"))
            .groupBy("k")
            .agg(F.max("rn").alias("n"), F.max("s").alias("total"))
        )
        rows = {r["k"]: (r["n"], r["total"]) for r in spilled.collect()}
        # oracle: per-key count and full running-sum endpoint = sum of the
        # arithmetic progression of ids ≡ k (mod 7) below 200000
        for k in range(7):
            ids = range(k, 200_000, 7)
            assert rows[k] == (len(ids), sum(ids))
    finally:
        _restore(spark, saved)


def test_aggregate_completes_with_forced_sort_fallback(spark):
    confs = {
        # force hash aggregation to give up quickly and fall back to
        # sort-based aggregation (the spillable path)
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": "2",
    }
    saved = _with_confs(spark, confs)
    try:
        df = spark.range(100_000).selectExpr("id % 1000 AS k", "id")
        out = (
            df.groupBy("k")
            .agg(F.sort_array(F.collect_list("id")).alias("ids"))
            .select("k", F.size("ids").alias("n"), F.element_at("ids", 1).alias("first"))
        )
        rows = {r["k"]: (r["n"], r["first"]) for r in out.collect()}
        assert len(rows) == 1000
        assert rows[3] == (100, 3)
    finally:
        _restore(spark, saved)


def test_ivfpq_completes_with_forced_spill(spark):
    """ann_ivfpq_topk under forced window-buffer and hash-agg
    fallbacks: the shortlist/re-rank windows and the ADC join must
    survive the external-spill paths with identical results."""
    from mysql_postgres_debezium_cdc_spark.registry import all_queries
    from tests.conftest import SF_DIR_SMOKE

    fn = all_queries()["ann_ivfpq_topk"].fn
    baseline = [tuple(r) for r in fn(spark, SF_DIR_SMOKE).collect()]
    confs = {
        "spark.sql.windowExecBufferSpillThreshold": "8",
        "spark.sql.windowExecBufferInMemoryThreshold": "8",
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": "2",
    }
    saved = _with_confs(spark, confs)
    try:
        spilled = [tuple(r) for r in fn(spark, SF_DIR_SMOKE).collect()]
        assert spilled == baseline
    finally:
        _restore(spark, saved)


def test_vocab_coverage_completes_with_forced_spill(spark):
    """text_vocab_head_coverage's banded windows and the term-count
    aggregation under the same forced-spill thresholds."""
    from mysql_postgres_debezium_cdc_spark.registry import all_queries
    from tests.conftest import SF_DIR_SMOKE

    fn = all_queries()["text_vocab_head_coverage"].fn
    baseline = [tuple(r) for r in fn(spark, SF_DIR_SMOKE).collect()]
    confs = {
        "spark.sql.windowExecBufferSpillThreshold": "8",
        "spark.sql.windowExecBufferInMemoryThreshold": "8",
    }
    saved = _with_confs(spark, confs)
    try:
        spilled = [tuple(r) for r in fn(spark, SF_DIR_SMOKE).collect()]
        assert spilled == baseline
    finally:
        _restore(spark, saved)


def test_iqr_and_weighted_median_complete_under_forced_spill(spark):
    """The two new rank/cumulative-window statistics finish — with
    oracle-matching values — when window buffers are forced to disk
    after 16 rows: the exact memory-pressure path their fact-sized (IQR)
    and distinct-value-sized (weighted median) windows hit at 100 TB."""
    from mysql_postgres_debezium_cdc_spark.registry import all_queries
    from tests.conftest import SF_DIR_SMOKE
    from tests.parity import compare, duck_connection

    confs = {
        "spark.sql.windowExecBufferSpillThreshold": "16",
        "spark.sql.windowExecBufferInMemoryThreshold": "16",
    }
    saved = _with_confs(spark, confs)
    try:
        con = duck_connection(SF_DIR_SMOKE)
        try:
            for key in ("dq_outlier_iqr", "agg_weighted_median"):
                spec = all_queries()[key]
                errors = compare(spec.fn(spark, SF_DIR_SMOKE), con.sql(spec.oracle).df())
                assert not errors, (key, errors[:1])
        finally:
            con.close()
    finally:
        _restore(spark, saved)


def test_banded_rank_family_completes_under_forced_spill(spark):
    """The banded prefix-sum family (r8 rank statistics; r9 funnel
    median) must finish with oracle-matching values when window buffers
    are forced to disk after 16 rows — the memory-pressure path the
    within-band windows hit on a wide value domain at 100 TB.  The
    composed experiment report rides the same device."""
    from mysql_postgres_debezium_cdc_spark.registry import all_queries
    from tests.conftest import SF_DIR_SMOKE
    from tests.parity import compare, duck_connection

    confs = {
        "spark.sql.windowExecBufferSpillThreshold": "16",
        "spark.sql.windowExecBufferInMemoryThreshold": "16",
    }
    saved = _with_confs(spark, confs)
    try:
        con = duck_connection(SF_DIR_SMOKE)
        try:
            for key in (
                "stats_mann_whitney_u",
                "stats_ks_test",
                "events_funnel_time_to_convert",
                "events_experiment_report",
                # r10: the winsorized cap rank is the newest banded caller
                "events_experiment_winsorized",
            ):
                spec = all_queries()[key]
                errors = compare(spec.fn(spark, SF_DIR_SMOKE), con.sql(spec.oracle).df())
                assert not errors, (key, errors[:1])
                spark.catalog.clearCache()
        finally:
            con.close()
    finally:
        _restore(spark, saved)
