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
