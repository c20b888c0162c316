"""Zero-row robustness: every operator meets empty partitions at scale
(a pruned scan, a filter that matches nothing, a new tenant).  A
representative cross-category slice must agree with the DuckDB oracle
on a fixture with the right SCHEMAS and zero rows — no exceptions, no
engine-specific phantom rows."""

from __future__ import annotations

import pytest

from mysql_postgres_debezium_cdc_spark.registry import all_queries
from mysql_postgres_debezium_cdc_spark.sources.parquet import TABLES
from tests.conftest import SF_DIR_ORACLE
from tests.parity import compare, duck_connection

EMPTY_SLICE = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "scan_project",
    "filter_in_between_like",
    "agg_group_basic",
    "agg_stats",
    "window_running_sum",
    "setop_union_all",
    "join_broadcast_dim",
    "subq_scalar_avg",
    "dedup_exact_text",
    "dedup_fingerprint",
    "dedup_cross_source_leak",
    "dedup_ngram_containment",
    "text_stats",
    "text_vocab_head_coverage",
    "corpus_train_val_test_split",
    "corpus_reservoir_per_group",
    "corpus_bpe_train_merges",
    "corpus_bpe_train_and_encode",
    "text_source_divergence",
    "stream_tumbling_window",
    "events_sessionize_gap",
    # r5 additions
    "dedup_boilerplate_lines",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "text_gopher_quality_flags",
    "rag_rrf_fusion",
    "graph_pagerank_trade",
    "graph_triangle_count",
    "agg_skew_profile",
    "events_seasonal_naive_eval",
    "embedding_dimension_correlation",
    "dedup_boilerplate_removal",
    "dedup_lsh_recall_eval",
    "ann_ivf_recall_eval",
    "text_ngram_novelty",
    "fn_string_collation",
    "layout_bucketed_join_no_shuffle",
    "corpus_span_corruption_plan",
    "agg_bitmap_exact_distinct",
    "events_seasonal_anomaly_hours",
    "dedup_minhash_recall_eval",
    "join_asof_tolerance",
    # r6 additions
    "graph_pagerank_distributed",
    "rag_rrf_persisted_index",
    "corpus_rag_persisted_chunks",
    "dedup_minhash_incremental",
    "layout_compaction_plan",
    "corpus_bpe_fertility_by_lang",
    "stream_incremental_dedup",
    "embedding_hard_negatives",
    "dq_k_anonymity_audit",
    "embedding_label_centroid_separation",
    "text_encoding_quality",
    "events_disorder_audit",
    # late-r6 additions
    "ann_range_search",
    "agg_countmin_sketch",
    "window_gaps_islands",
    "events_changepoint_window",
    "text_char_entropy",
    "corpus_curriculum_order",
    "multimodal_frame_sample",
    "multimodal_resize_decimate",
    "graph_label_propagation",
    "basket_affinity_pairs",
    "skyline_pareto_parts",
    "rag_bm25_topk",
    "ann_mmr_diversified",
    "text_trigram_substring_search",
    "text_trigram_persisted_index",
    "agg_quantile_histogram_sketch",
    "stream_windowed_topk",
    "join_interval_overlap",
    "events_rfm_segmentation",
    "events_ab_test_eval",
    # late-r6 additions, second batch
    "stats_regression_by_group",
    "stats_chi_square_independence",
    "agg_moments_sketch",
    "agg_weighted_median",
    "events_rate_ratio_test",
    "events_top_trigram_paths",
    "events_dau_wau_rolling",
    "events_funnel_time_to_convert",
    "window_moving_median",
    "graph_bfs_reachability",
    "graph_degree_distribution",
    "sql_recursive_cte_spine",
    "source_xml_scan",
    "corpus_dsir_importance",
    "ml_naive_bayes_lang",
    "corpus_token_type_ratio",
    "text_zipf_fit",
    "dq_benford_test",
    "dq_outlier_iqr",
    "cdc_offset_range_diff",
    "layout_minmax_skipping_audit",
    "geo_haversine_knn",
    # r7 additions
    "stats_mann_whitney_u",
    "stats_ols_multivariate",
    "dq_functional_dependency_audit",
    "corpus_temperature_mixture",
    "join_runtime_filter_pushdown",
    "stats_ks_test",
    "events_uplift_cuped",
    "corpus_quality_prefilter_funnel",
    # r8 additions
    "dedup_media_lsh",
    "events_experiment_report",
    "stats_welch_ttest",
    "events_srm_check",
    "dedup_media_clusters",
    "events_proportion_ztest",
    "stream_experiment_snapshot",
    "dedup_media_lsh_persisted",
    "dedup_media_incremental",
    "events_uplift_cuped_by_segment",
    # r9 additions
    "events_power_mde",
    "stream_srm_monitor",
    # r10 additions
    "events_srm_sequential",
    "events_effect_msprt",
    "events_experiment_winsorized",
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    base = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(f"{SF_DIR_ORACLE}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(base / f"{t}.parquet"))
    return str(base)


def test_dataset_card_empty_corpus_known_divergence(spark, empty_dir):
    """DOCUMENTED cross-engine edge: per the SQL standard (DuckDB
    follows it), GROUPING SETS containing the empty set () emit one
    grand-total row even over ZERO input rows — like a global
    COUNT(*).  Spark's Expand-based groupingSets emits no rows on
    empty input, so corpus_dataset_card returns 0 rows where the
    oracle returns the degenerate all-zeros 'ALL/ALL' row.  Real
    corpora are never empty, and every non-empty case value-matches
    (oracle parity + the sweep above); this test pins the divergence
    so it is a recorded property, not a surprise."""
    spec = all_queries()["corpus_dataset_card"]
    con = duck_connection(empty_dir)
    try:
        assert spec.fn(spark, empty_dir).count() == 0  # Spark: no groups
        assert len(con.sql(spec.oracle).df()) == 1  # standard: () row
    finally:
        con.close()


@pytest.mark.parametrize("name", EMPTY_SLICE)
def test_empty_corpus_parity(spark, empty_dir, name):
    spec = all_queries()[name]
    con = duck_connection(empty_dir)
    try:
        errors = compare(spec.fn(spark, empty_dir), con.sql(spec.oracle).df())
    finally:
        con.close()
    assert not errors, errors
