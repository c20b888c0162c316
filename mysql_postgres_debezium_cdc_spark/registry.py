"""Central query registry.

Every operator in the engine registers itself here as a named query:
``fn(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a DuckDB
oracle SQL string over the same parquet tables.  The driver harness
(``__spark_entry__.py``) exposes this registry; tests iterate it.

Determinism rules every registered query must follow (SURVEY.md §5.2):

- Alias every computed column identically in Spark and oracle SQL — the
  driver sorts columns by name before value-hashing.
- Every LIMIT / top-k has a total ORDER BY (unique tie-break key), else the
  two engines may legitimately pick different ties.
- Float aggregates are rounded (default 2dp) in BOTH engines; double
  summation order differs between engines so raw sums are not hash-stable.
- Timestamps in output are cast to DATE or epoch BIGINT; session timezone
  is pinned to UTC by ``ensure_session_confs``.

Cache contract: a few queries ``persist()`` a relation that feeds two
branches of the RETURNED plan (`text_vocab_head_coverage`,
`text_source_divergence`, `events_sessionize_gap_chunked`,
`text_tfidf_topk`, `cluster_kmeans_embeddings`, the rank-statistic
family via `_banded_rank_cums`, `events_experiment_winsorized`'s
per-user relation, `rag_bm25_topk`'s 1-row corpus stats, and
`events_funnel_time_to_convert`'s
converted cohort) — the cache populates
when the caller executes the plan and cannot be released from inside the
builder.  A long-lived session sweeping many queries should call
``spark.catalog.clearCache()`` between queries (``scripts/sweep_parity.py``
and ``bench.py`` do; a one-shot driver invocation doesn't need to).  The
ITERATIVE builders (BPE trainer, IVM loop) are exempt: they materialize
eagerly and release superseded generations themselves
(tests/test_iterative_memory.py).

Ulp exposure: every ROUNDED transcendental output (LN/SQRT/EXP/LOG
trees, ~56 keys) relies on cross-engine libm agreement at the final
rounding boundary; the authoritative key list and the per-column remedy
live in PLANS.md ("The ulp-exposure ledger", r12) — a future last-digit
hash flake on one of those keys is a lookup there, not an investigation.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False

# The driver's correctness harness checks queries in registry order and caps
# the sweep at the first 50 keys.  The prefix is ROTATED each round so the
# union of driver rounds certifies the whole registry.  After round 8 the
# union covers ALL registered keys with zero red latest rows; the remaining
# program is REFRESH — no key's green driver row should predate its current
# code.
#
# Round-12 prefix, mechanically derived by `scripts/drift_audit.py`
# (verbatim output; VERDICT r11 task #1 — the rotation tail), re-spliced
# after the audit's PUBLIC-helper closure upgrade (r12.2):
#   1. No never-rowed keys: the registry is closed at 306.
#   2. The 13 drifted keys.  Four by this round's registered-block edits:
#      events_effect_msprt (double-side LN guard, ADVICE #1, + bench=True),
#      stream_srm_monitor (bench=True), events_experiment_report (the
#      winsorized row, VERDICT #7) and stream_experiment_snapshot (helper-
#      mediated through `_experiment_report_from_per_user`).  Four by the
#      r12.2 `lsh_signatures` vectorization — ann_lsh_topk,
#      dedup_embedding_lsh, dedup_embedding_clusters, dedup_lsh_recall_eval
#      (bit-exact by construction AND value-swept at 3 scales, but the
#      shared helper changed, so they queue).  Three by the shared
#      `_shingles`/`_shingles_of` helpers (dedup_ngram_containment,
#      dq_contamination_ngram_overlap, dq_decontaminate_corpus).  Two
#      HISTORIC public-helper drifts the old private-only closure missed,
#      surfaced by the upgrade: graph_triangle_count (r6),
#      join_interval_overlap (r7).
#   3. The oldest-standing driver certs, vintage order: the remaining 17
#      r5-vintage keys, then the 20 oldest r6 keys (key order within a
#      vintage).  13 drifted + 17 + 20 = 50.  The four r6 keys displaced
#      by the new drift tier (fn_string_collation, fn_url_parse,
#      fn_xml_parse, graph_pagerank_distributed) head the r13 rotation;
#      after this round no green row predates r6 except those four.
# Every key also passes the identical in-repo comparison
# (tests/test_oracle_parity.py), which sweeps all registered keys every
# round regardless of prefix.
_PRIORITY: tuple[str, ...] = (
    "dedup_embedding_clusters",  # tier 2: drifted (last green r5)
    "dedup_ngram_containment",  # tier 2: drifted (last green r5)
    "dq_contamination_ngram_overlap",  # tier 2: drifted (last green r5)
    "dq_decontaminate_corpus",  # tier 2: drifted (last green r5)
    "dedup_lsh_recall_eval",  # tier 2: drifted (last green r6)
    "graph_triangle_count",  # tier 2: drifted (last green r6)
    "join_interval_overlap",  # tier 2: drifted (last green r7)
    "dedup_embedding_lsh",  # tier 2: drifted (last green r8)
    "ann_lsh_topk",  # tier 2: drifted (last green r11)
    "events_effect_msprt",  # tier 2: drifted (last green r11)
    "events_experiment_report",  # tier 2: drifted (last green r11)
    "stream_experiment_snapshot",  # tier 2: drifted (last green r11)
    "stream_srm_monitor",  # tier 2: drifted (last green r11)
    "dedup_exact_substring_spans",  # tier 3: oldest-standing cert (r5)
    "embedding_dimension_stats",  # tier 3: oldest-standing cert (r5)
    "embedding_normalize_quantize",  # tier 3: oldest-standing cert (r5)
    "events_ewma_hourly",  # tier 3: oldest-standing cert (r5)
    "events_markov_transition",  # tier 3: oldest-standing cert (r5)
    "events_sessionize_gap_chunked",  # tier 3: oldest-standing cert (r5)
    "layout_dpp_join_pruned_scan",  # tier 3: oldest-standing cert (r5)
    "layout_zorder_cells",  # tier 3: oldest-standing cert (r5)
    "stream_static_enrichment",  # tier 3: oldest-standing cert (r5)
    "stream_stream_join_left_outer",  # tier 3: oldest-standing cert (r5)
    "stream_user_running_state_stateful",  # tier 3: oldest-standing cert (r5)
    "text_pii_redaction",  # tier 3: oldest-standing cert (r5)
    "text_pmi_bigrams",  # tier 3: oldest-standing cert (r5)
    "text_quality_classifier",  # tier 3: oldest-standing cert (r5)
    "text_source_divergence",  # tier 3: oldest-standing cert (r5)
    "text_vocab_head_coverage",  # tier 3: oldest-standing cert (r5)
    "udf_map_in_arrow",  # tier 3: oldest-standing cert (r5)
    "agg_bitmap_exact_distinct",  # tier 3: oldest-standing cert (r6)
    "agg_bool_and_or",  # tier 3: oldest-standing cert (r6)
    "agg_skew_profile",  # tier 3: oldest-standing cert (r6)
    "agg_string_concat_ordered",  # tier 3: oldest-standing cert (r6)
    "ann_ivf_recall_eval",  # tier 3: oldest-standing cert (r6)
    "corpus_bigram_lm_counts",  # tier 3: oldest-standing cert (r6)
    "corpus_chunk_documents",  # tier 3: oldest-standing cert (r6)
    "corpus_length_bucketed_batches",  # tier 3: oldest-standing cert (r6)
    "corpus_rag_persisted_chunks",  # tier 3: oldest-standing cert (r6)
    "corpus_span_corruption_plan",  # tier 3: oldest-standing cert (r6)
    "dedup_boilerplate_lines",  # tier 3: oldest-standing cert (r6)
    "dedup_boilerplate_removal",  # tier 3: oldest-standing cert (r6)
    "dedup_minhash_incremental",  # tier 3: oldest-standing cert (r6)
    "dedup_minhash_recall_eval",  # tier 3: oldest-standing cert (r6)
    "dq_null_profile",  # tier 3: oldest-standing cert (r6)
    "events_anomaly_mad",  # tier 3: oldest-standing cert (r6)
    "events_cumulative_unique_users",  # tier 3: oldest-standing cert (r6)
    "events_multi_granularity_rollup",  # tier 3: oldest-standing cert (r6)
    "events_seasonal_anomaly_hours",  # tier 3: oldest-standing cert (r6)
    "events_seasonal_naive_eval",  # tier 3: oldest-standing cert (r6)
)


def ensure_session_confs(spark: SparkSession) -> None:
    """Pin the session confs correctness depends on.

    The driver hands us its own SparkSession; timezone and ANSI behavior
    must not depend on its defaults.  These are runtime-settable confs.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str, *args, **kwargs) -> DataFrame:
            # Extra args pass through for operators with tuning levers
            # (e.g. cardinality guards); the driver always calls (spark,
            # sf_dir) so registered defaults govern oracle comparisons.
            ensure_session_confs(spark)
            return fn(spark, sf_dir, *args, **kwargs)

        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, wrapped, oracle, tuple(tags), bench)
        return wrapped

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are side-effecting: each module registers its queries.
    from mysql_postgres_debezium_cdc_spark import functions, llm, operators, plans, sources, streaming  # noqa: F401

    _LOADED = True


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    rank = {name: i for i, name in enumerate(_PRIORITY)}
    order = {name: i for i, name in enumerate(_REGISTRY)}
    names = sorted(_REGISTRY, key=lambda n: (rank.get(n, len(rank)), order[n]))
    return {name: _REGISTRY[name] for name in names}


def query_fns() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_map() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }


def bench_queries() -> dict[str, QuerySpec]:
    return {name: spec for name, spec in all_queries().items() if spec.bench}
