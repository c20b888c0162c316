"""Physical-plan audits — the scale contract, asserted.

Result-correctness is covered by the oracle tests; these assert the
plans are the ones we'd want at 100 TB: dimension joins broadcast,
filters reach the parquet scan, projections prune columns, aggregations
run partial before the shuffle, and shuffle counts stay at the expected
minimum.  A regression that keeps results right but, say, turns a
broadcast join into a sort-merge join fails HERE."""

from __future__ import annotations

from mysql_postgres_debezium_cdc_spark.plans.explain import plan_report
from mysql_postgres_debezium_cdc_spark.registry import all_queries
from tests.conftest import SF_DIR_SMOKE


def _plan(spark, name):
    return plan_report(all_queries()[name].fn(spark, SF_DIR_SMOKE))


def test_q1_is_pure_partial_agg(spark):
    r = _plan(spark, "q1_pricing_summary")
    # scan → partial agg → 1 shuffle → final agg → sort: no joins at all
    assert r.n_broadcast_joins == 0 and r.n_sortmerge_joins == 0
    assert r.pushed_filters, "l_shipdate predicate must reach the parquet scan"
    assert "HashAggregate" in r.text


def test_q3_dims_broadcast(spark):
    r = _plan(spark, "q3_shipping_priority")
    assert r.n_broadcast_joins >= 1, "customer join must broadcast at this SF"
    assert r.pushed_filters


def test_q5_all_dim_joins_broadcast(spark):
    r = _plan(spark, "q5_local_supplier_volume")
    # region/nation/supplier/customer should all broadcast; the fact table
    # must never be the build side of a shuffle join at this SF.
    assert r.n_broadcast_joins >= 3
    assert r.n_sortmerge_joins <= 1


def test_q8_seven_way_join_broadcasts_dims(spark):
    r = _plan(spark, "q8_market_share")
    assert r.n_broadcast_joins >= 5
    assert r.pushed_filters


def test_scan_projection_prunes_columns(spark):
    r = _plan(spark, "scan_project")
    # ReadSchema must carry only the projected columns, not all 11
    read = [ln for ln in r.text.splitlines() if "ReadSchema" in ln]
    assert read and "l_comment" not in read[0]
    assert sum(c == "," for c in read[0]) <= 3, f"projection not pruned: {read[0]}"


def test_filter_pushdown_reaches_scan(spark):
    r = _plan(spark, "scan_filter_pushdown")
    assert r.pushed_filters


def test_join_sort_merge_reuses_partitioning_for_agg(spark):
    r = _plan(spark, "join_sort_merge")
    assert r.n_sortmerge_joins == 1
    # 2 join-side hash shuffles + 1 range shuffle for the final sort; the
    # groupBy on the join key must REUSE the join's partitioning — a 4th
    # shuffle means the agg re-partitioned what was already co-located
    assert r.n_shuffles <= 3, r.ops


def test_broadcast_dim_join_has_no_fact_shuffle(spark):
    r = _plan(spark, "join_broadcast_dim")
    assert r.n_broadcast_joins >= 1
    assert r.n_sortmerge_joins == 0


def test_dedup_exact_is_one_hash_shuffle(spark):
    r = _plan(spark, "dedup_exact_text")
    assert r.n_sortmerge_joins == 0 and r.n_broadcast_joins == 0
    # one hash shuffle for the groupBy + one range shuffle for the sort
    assert r.text.count("Arguments: hashpartitioning") == 1
    assert "HashAggregate" in r.ops  # partial agg before the shuffle


def test_topk_per_group_window_is_partitioned(spark):
    r = _plan(spark, "topk_per_group")
    assert "Window" in r.ops or "WindowGroupLimit" in r.ops
    # the window must be keyed (hashpartitioning), not a global single partition
    assert "Arguments: SinglePartition" not in r.text


def test_q11_reuses_aggregation_for_threshold(spark):
    """The scalar-subquery threshold must reuse the per-part aggregate
    (persisted), not recompute the lineitem join from scratch."""
    r = _plan(spark, "q11_important_parts")
    # both consumers read the cache (2 InMemoryTableScans over 1 relation);
    # the lineitem join itself lives only inside the cached subtree
    assert r.ops.count("InMemoryTableScan") == 2, r.ops
