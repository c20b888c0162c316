"""The ulp-exposure ledger (PLANS.md r12, VERDICT r11 task #3) must
stay current: every registered key whose oracle ROUNDs a transcendental
(LN/SQRT/EXP/LOG10/LOG2/POW/POWER) relies on cross-engine libm
agreement at the final rounding boundary, and the ledger is the lookup
a future last-digit hash flake resolves against.  This test pins the
mechanically-derived set, so a NEW transcendental key cannot land
without the author consciously adding it to the ledger (and this
list), and a key that sheds its exposure (e.g. by moving to exact
integer devices, the df-capped-BM25 route) must be removed here too."""

from __future__ import annotations

import re

from mysql_postgres_debezium_cdc_spark.registry import all_queries

# The exact derivation rule recorded in the PLANS.md ledger.
_TRANSCENDENTAL = re.compile(r"\b(LN|SQRT|EXP|LOG10|LOG2|POWER|POW)\s*\(", re.I)
_ROUND = re.compile(r"ROUND\(", re.I)

# The r12 ledger: 54 keys.  Keep sorted; update PLANS.md in the same
# commit as any change here.
ULP_EXPOSED = frozenset(
    {
        "agg_moments_sketch",
        "ann_bruteforce_topk",
        "ann_cosine_pandas_udf",
        "ann_ivf_recall_eval",
        "ann_ivf_topk",
        "ann_ivfpq_persisted_index",
        "ann_ivfpq_topk",
        "ann_knn_label_eval",
        "ann_lsh_topk",
        "ann_mmr_diversified",
        "ann_range_search",
        "corpus_curriculum_order",
        "corpus_dsir_importance",
        "corpus_rag_persisted_chunks",
        "corpus_rag_retrieval",
        "corpus_semantic_dedup",
        "corpus_token_type_ratio",
        "dedup_embedding_cosine",
        "dedup_embedding_lsh",
        "dedup_lsh_recall_eval",
        "dedup_media_incremental",
        "dedup_media_lsh",
        "dedup_media_lsh_persisted",
        "dq_benford_test",
        "embedding_dimension_correlation",
        "embedding_hard_negatives",
        "embedding_label_centroid_separation",
        "embedding_normalize_quantize",
        "events_ab_test_eval",
        "events_effect_msprt",
        "events_experiment_report",
        "events_experiment_winsorized",
        "events_power_mde",
        "events_proportion_ztest",
        "events_rate_ratio_test",
        "events_seasonal_naive_eval",
        "events_srm_sequential",
        "fn_math_basic",
        "geo_haversine_knn",
        "ml_naive_bayes_lang",
        "rag_bm25_topk",
        "rag_rrf_fusion",
        "rag_rrf_persisted_index",
        "stats_chi_square_independence",
        "stats_mann_whitney_u",
        "stats_welch_ttest",
        "stream_experiment_snapshot",
        "stream_srm_monitor",
        "text_char_entropy",
        "text_pmi_bigrams",
        "text_source_divergence",
        "text_tfidf_topk",
        "text_unigram_lm_score",
        "text_zipf_fit",
    }
)

# Keys that CONTAIN a transcendental but are documented as NOT exposed:
# the transcendental feeds an exact integer device and no double is
# ROUNDed into the output (PLANS.md ledger "NOT exposed" note).
_EXEMPT_NO_ROUND = frozenset(
    {
        "corpus_temperature_mixture",  # FLOOR(SQRT()) integer weights
        "dedup_embedding_clusters",  # integer cosine verdict
        "graph_triangle_count",  # integer arithmetic around SQRT bound
    }
)


def test_ulp_ledger_matches_derivation():
    derived = {
        name
        for name, spec in all_queries().items()
        if spec.oracle
        and _TRANSCENDENTAL.search(spec.oracle)
        and _ROUND.search(spec.oracle)
    }
    pinned = ULP_EXPOSED - _EXEMPT_NO_ROUND
    assert derived == pinned, (
        "ulp-exposure ledger out of date: "
        f"new={sorted(derived - pinned)} stale={sorted(pinned - derived)} "
        "— update PLANS.md ('The ulp-exposure ledger') and this pin together"
    )


def test_exempt_keys_really_have_no_round():
    for name in sorted(_EXEMPT_NO_ROUND):
        spec = all_queries()[name]
        assert spec.oracle and _TRANSCENDENTAL.search(spec.oracle), (
            f"{name} no longer contains a transcendental — drop the exemption"
        )
        assert not _ROUND.search(spec.oracle), (
            f"{name} gained a ROUND — move it into the exposed set"
        )
