"""Degenerate-input parity: the statistical operators' guard rails.

Spark 4 runs ANSI mode, where a 0.0 divisor THROWS while DuckDB returns
inf/nan — so every ratio in the statistics family guards its
denominator identically on both engines (NULL result).  This fixture
manufactures exactly the degenerate regimes the guards exist for (a
code-review finding: the shipped fixtures never produce them):

- an event_type with ZERO events before the rate-ratio cut (n1 = 0),
- a single-row lineitem group and a constant-quantity group
  (zero x-variance → undefined slope; zero variance → undefined
  moments; quartiles of a 1-row group),
- orders with a single status (1×K contingency → dof 0, undefined
  Cramér's V),
- a documents corpus with NO target-language rows (DSIR n_t = 0) where
  every token appears exactly once (Zipf fit on a flat spectrum —
  y ≡ ln(1) = 0 exactly, so both engines hit vary_n = 0 bit-exactly).

Each key must value-match its DuckDB oracle on this fixture — not
crash, not emit inf.
"""

from __future__ import annotations

import pytest

from mysql_postgres_debezium_cdc_spark.registry import all_queries
from mysql_postgres_debezium_cdc_spark.sources.parquet import TABLES
from tests.conftest import SF_DIR_ORACLE
from tests.parity import compare, duck_connection

DEGENERATE_KEYS = [
    "events_rate_ratio_test",
    "stats_regression_by_group",
    "agg_moments_sketch",
    "agg_weighted_median",
    "dq_outlier_iqr",
    "stats_chi_square_independence",
    "corpus_dsir_importance",
    "ml_naive_bayes_lang",
    "corpus_token_type_ratio",
    "text_zipf_fit",
    "dq_benford_test",
    # r7 additions: zero purchase/click events (U undefined), constant
    # regressors (singular normal matrix), empty dim slice (runtime
    # filter falls back to the plain join)
    "stats_mann_whitney_u",
    "stats_ols_multivariate",
    "dq_functional_dependency_audit",
    "corpus_temperature_mixture",
    "join_runtime_filter_pushdown",
    "stats_ks_test",
    "events_uplift_cuped",
    "corpus_quality_prefilter_funnel",
    # pre-existing keys the whole-registry degenerate sweep flagged
    # (NULL-vs-0 empty aggregates; sketch band below its resolution)
    "cdc_envelope_encode_roundtrip",
    "dedup_bloom_incremental",
    "agg_approx_percentile",
    # r8: zero-byte payload pair => zero-norm cosine guard (both sides)
    "dedup_media_lsh",
    # r8: composed report — same degenerate regimes as its constituents
    # (zero-variance covariate, one-sided arms, all-tied values)
    "events_experiment_report",
    # r8: empty purchase/click slice => zero rows (no variance exists);
    # zero enrolled users is covered by the empty-corpus sweep
    "stats_welch_ttest",
    "events_srm_check",
    "dedup_media_clusters",
    # r8: degenerate fixture has zero purchase users => pooled rate 0
    "events_proportion_ztest",
    # r8: streaming twin must equal the batch report on every fixture
    "stream_experiment_snapshot",
    # r8: warm index path over the zero-byte-pair fixture
    "dedup_media_lsh_persisted",
    "dedup_media_incremental",
    # r9: zero purchase users => p_pooled 0, mde_abs 0, NULL mde_rel
    "events_power_mde",
    # r9: streaming guardrail must equal the batch SRM on every fixture
    "stream_srm_monitor",
    # r10: anytime-valid SRM — same degenerate enrollment regimes as the
    # fixed-horizon gate (empty arm, zero users) through the shared
    # fixed double tree
    "events_srm_sequential",
    # r10: anytime-valid effect monitor — undersized arm / zero pooled
    # variance guards (integer predicates, both engines)
    "events_effect_msprt",
    # r10: winsorized readout — degenerate cap (all-tied values => cap
    # = the tie, zero capped variance) and undersized arms
    "events_experiment_winsorized",
    # r8: per-segment CUPED — single-arm segments must emit no row
    "events_uplift_cuped_by_segment",
]


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = tmp_path_factory.mktemp("degenerate_sf")

    def write(name, rows):
        schema = pq.read_schema(f"{SF_DIR_ORACLE}/{name}.parquet")
        if rows:
            cols = {
                f.name: [r.get(f.name) for r in rows] for f in schema
            }
            table = pa.Table.from_pydict(cols, schema=schema)
        else:
            table = schema.empty_table()
        pq.write_table(table, str(base / f"{name}.parquet"))

    us = lambda s: s * 1_000_000  # noqa: E731 — epoch-micros helper
    jan = 1704067200  # 2024-01-01T00:00:00Z epoch seconds
    cut = jan + 15 * 86400  # 2024-01-16
    write(
        "events",
        [
            # 'signup': events on both sides of the cut (normal ratio)
            {"event_id": 0, "ts": us(jan + 10), "user_id": 1, "event_type": "signup", "value": 1.0, "props": "{}"},
            {"event_id": 1, "ts": us(cut + 10), "user_id": 1, "event_type": "signup", "value": 2.0, "props": "{}"},
            # 'launch': exists ONLY after the cut → n1 = 0 → NULL ratio
            {"event_id": 2, "ts": us(cut + 20), "user_id": 2, "event_type": "launch", "value": 3.0, "props": "{}"},
            {"event_id": 3, "ts": us(cut + 30), "user_id": 2, "event_type": "launch", "value": 4.0, "props": "{}"},
        ],
    )
    li = lambda ok, ln, flag, qty, price: {  # noqa: E731
        "l_orderkey": ok, "l_partkey": 1, "l_suppkey": 1, "l_linenumber": ln,
        "l_quantity": qty, "l_extendedprice": price, "l_discount": 0.0,
        "l_tax": 0.0, "l_returnflag": flag, "l_linestatus": "O",
        "l_shipdate": us(jan),
    }
    write(
        "lineitem",
        [
            li(1, 1, "A", 5.0, 100.0),  # single-row group
            li(2, 1, "B", 7.0, 100.0),  # constant-quantity group…
            li(2, 2, "B", 7.0, 200.0),
            li(2, 3, "B", 7.0, 300.0),
            li(3, 1, "C", 1.0, 100.0),  # normal group
            li(3, 2, "C", 2.0, 250.0),
            li(3, 3, "C", 9.0, 975.5),
        ],
    )
    write(
        "orders",
        [
            {"o_orderkey": k, "o_custkey": 1, "o_orderstatus": "F",
             "o_totalprice": p, "o_orderdate": us(jan),
             "o_orderpriority": pr}
            for k, (p, pr) in enumerate(
                [
                    (123.0, "1-URGENT"),
                    (456.0, "2-HIGH"),
                    (789.0, "1-URGENT"),
                    # Benford guard regimes: a sub-1 total floors to
                    # leading digit 0 (divide-by-zero in benford_p) and a
                    # negative total's '-' prefix fails Spark's ANSI
                    # string→bigint cast — both must be filtered
                    # identically in engine and oracle.
                    (0.45, "2-HIGH"),
                    (-250.0, "1-URGENT"),
                ]
            )
        ],
    )
    write(
        "documents",
        [
            # no 'en' rows at all → DSIR target slice is EMPTY;
            # every token unique corpus-wide → flat Zipf spectrum
            {"doc_id": 0, "text": "alpha beta gamma", "lang": "fr", "source": "s1", "n_chars": 16},
            {"doc_id": 1, "text": "delta epsilon", "lang": "de", "source": "s1", "n_chars": 13},
            {"doc_id": 5, "text": "zeta eta theta iota", "lang": "fr", "source": "s2", "n_chars": 19},
            # TWO empty-text docs: zero-byte payloads featurize to the
            # all-zero vector, collide in every LSH cell, and form a
            # zero-norm candidate pair — the dedup_media_lsh cosine
            # guard must drop it identically in both engines (the ANSI
            # divide rule).  Empty texts emit no tokens (LENGTH > 0
            # filters), so the flat-Zipf premise above is untouched.
            {"doc_id": 7, "text": "", "lang": "de", "source": "s2", "n_chars": 0},
            {"doc_id": 8, "text": "", "lang": "fr", "source": "s2", "n_chars": 0},
        ],
    )
    for t in TABLES:
        if t not in ("events", "lineitem", "orders", "documents"):
            write(t, [])
    return str(base)


@pytest.mark.parametrize("name", DEGENERATE_KEYS)
def test_degenerate_parity(spark, degenerate_dir, name):
    spec = all_queries()[name]
    con = duck_connection(degenerate_dir)
    try:
        errors = compare(spec.fn(spark, degenerate_dir), con.sql(spec.oracle).df())
    finally:
        con.close()
    assert not errors, errors[:3]


TIES_KEYS = [
    # the three keys the ties sweep caught (fixed: composite orderings /
    # exact constant-dim exclusion) plus tie-sensitive survivors as guards
    "topk_max_by_group",
    "agg_min_by_max_by",
    "embedding_dimension_correlation",
    "topk_per_group",
    "sort_global_limit",
    "dedup_exact_text",
    "text_tfidf_topk",
    "ann_bruteforce_topk",
    "events_sessionize_gap",
    # r7: constant event value => all ranks tied, U variance 0 => NULL z;
    # constant discount column => collinear regressor, det 0 => NULL betas;
    # all post-period ties => vary 0 => NULL CUPED variance reduction
    "stats_mann_whitney_u",
    "stats_ols_multivariate",
    "stats_ks_test",
    "events_uplift_cuped",
    # r8: the composed report inherits every constituent's tie regime
    "events_experiment_report",
    # r8: constant values => zero variance => NULL t under both engines
    "stats_welch_ttest",
    "events_uplift_cuped_by_segment",
    # r11: all-tied metric => V_n = 0 exactly => DuckDB LN(0) throws
    # unless the oracle's CASE guard masks the mixture tree — the report's
    # msprt row surfaced this; the standalone key had the same latent
    # unguarded LN and is pinned here with it
    "events_effect_msprt",
    "events_experiment_winsorized",
]


@pytest.fixture(scope="module")
def ties_dir(tmp_path_factory):
    """Ties-heavy fixture: duplicate texts, identical vectors, identical
    event timestamps, constant prices — any arg-min/max or top-k whose
    ordering key is not TOTAL lets each engine pick a different row
    (the sweep over this fixture caught two bare-ordering MIN_BY/MAX_BY
    keys and a SQRT-of-negative-variance crash on constant dims)."""
    import math

    import duckdb as dd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = tmp_path_factory.mktemp("ties_sf")

    def write(name, rows):
        schema = pq.read_schema(f"{SF_DIR_ORACLE}/{name}.parquet")
        if rows:
            cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
            table = pa.Table.from_pydict(cols, schema=schema)
        else:
            table = schema.empty_table()
        pq.write_table(table, str(base / f"{name}.parquet"))

    us = lambda s: s * 1_000_000  # noqa: E731
    jan = 1704067200
    write(
        "events",
        [
            {"event_id": i, "ts": us(jan + 3600 * (i % 3)), "user_id": i % 4,
             "event_type": ["click", "purchase", "signup"][i % 3],
             "value": 5.0, "props": "{}"}
            for i in range(120)
        ],
    )
    write(
        "orders",
        [
            {"o_orderkey": i, "o_custkey": i % 5, "o_orderstatus": "FO"[i % 2],
             "o_totalprice": 500.0, "o_orderdate": us(jan + 86400 * (i % 4)),
             "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM"][i % 3]}
            for i in range(30)
        ],
    )
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten",
        "red green blue red green blue red green blue red",
        "spark query engine table column row batch stream join filter",
        "data data data data data data data data data data",
    ]
    write(
        "documents",
        [
            {"doc_id": i, "text": texts[i % 5], "lang": ["en", "fr"][i % 2],
             "source": f"s{i % 3}", "n_chars": len(texts[i % 5])}
            for i in range(40)
        ],
    )

    def vec(k):
        raw = [((j * (k + 2)) % 7) - 3.0 for j in range(64)]
        n = math.sqrt(sum(x * x for x in raw)) or 1.0
        return [x / n for x in raw]

    write(
        "embeddings",
        [{"vec_id": i, "embedding": vec(i % 4), "label": i % 3} for i in range(256)],
    )
    # real small dims so dimension joins behave normally
    for t in ("customer", "supplier", "part", "nation", "region"):
        dd.sql(
            f"COPY (SELECT * FROM read_parquet('{SF_DIR_ORACLE}/{t}.parquet'))"
            f" TO '{base}/{t}.parquet' (FORMAT PARQUET)"
        )
    write("lineitem", [
        {"l_orderkey": i // 2, "l_partkey": i % 3 + 1, "l_suppkey": 1,
         "l_linenumber": i % 2 + 1, "l_quantity": float(10 + (i % 2) * 10),
         "l_extendedprice": [100.0, 250.0][i % 2], "l_discount": 0.05,
         "l_tax": 0.02, "l_returnflag": "AR"[i % 2], "l_linestatus": "O",
         "l_shipdate": us(jan + 86400 * (i % 5))}
        for i in range(60)
    ])
    return str(base)


@pytest.mark.parametrize("name", TIES_KEYS)
def test_ties_parity(spark, ties_dir, name):
    spec = all_queries()[name]
    con = duck_connection(ties_dir)
    try:
        errors = compare(spec.fn(spark, ties_dir), con.sql(spec.oracle).df())
    finally:
        con.close()
    assert not errors, errors[:3]


UNICODE_KEYS = [
    # keys the unicode/skew sweep exercised hardest: byte-vs-char
    # semantics, tokenization of multibyte scripts, hash splits under
    # 90%-one-user skew, and the pooled-variance A/B guard
    "multimodal_fake_features",
    # frame/resize oracles upgraded from ASCII-only md5-of-characters to
    # UTF-8 byte reconstruction — certified here on multibyte text
    "multimodal_frame_sample",
    "multimodal_resize_decimate",
    "events_ab_test_eval",
    "text_stats",
    "text_token_count_regex",
    "text_lang_id",
    "corpus_token_type_ratio",
    "text_zipf_fit",
    "dedup_exact_text",
    "events_sessionize_gap",
    "agg_salted_two_phase",
    # r7: multibyte whitespace tokens in the sqrt-weight token counts;
    # unicode source->lang FD values; multibyte funnel metrics
    "corpus_temperature_mixture",
    "dq_functional_dependency_audit",
    "corpus_quality_prefilter_funnel",
]


@pytest.fixture(scope="module")
def unicode_dir(tmp_path_factory):
    """Unicode + skew fixture: CJK / emoji (astral + ZWJ) / RTL / accented
    text, no purchase conversions (pooled A/B variance = 0), and 90% of
    events on ONE user.  Caught the per-character byte model in the
    multimodal oracles and the unguarded pooled-variance z-test."""
    import math

    import duckdb as dd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = tmp_path_factory.mktemp("unicode_sf")

    def write(name, rows):
        schema = pq.read_schema(f"{SF_DIR_ORACLE}/{name}.parquet")
        if rows:
            cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
            table = pa.Table.from_pydict(cols, schema=schema)
        else:
            table = schema.empty_table()
        pq.write_table(table, str(base / f"{name}.parquet"))

    us = lambda s: s * 1_000_000  # noqa: E731
    jan = 1704067200
    write(
        "events",
        [
            {"event_id": i, "ts": us(jan + 97 * i), "user_id": 7 if i % 10 else i,
             "event_type": ["click", "café", "购买", "signup", "ошибка"][i % 5],
             "value": round(1.0 + (i % 13) * 0.37, 2), "props": '{"k": 1}'}
            for i in range(200)
        ],
    )
    texts = [
        "数据 处理 引擎 分布式 计算 数据 湖 查询 优化 器",
        "café naïve déjà vu résumé façade garçon éclair crème brûlée",
        "🚀 rocket 🚀 launch 🧪 test 👩‍🔬 science 🚀 data 🔥🔥",
        "مرحبا بالعالم هذا نص عربي للاختبار مع كلمات متكررة مرحبا",
        "ascii words mixed with 中文 and émojis 🎉 and ДАННЫЕ here",
        "tab\tseparated and  double  spaced   words here",
    ]
    write(
        "documents",
        [
            {"doc_id": i, "text": texts[i % 6],
             "lang": ["zh", "fr", "en", "ar", "ru", "en"][i % 6],
             "source": f"s{i % 4}", "n_chars": len(texts[i % 6])}
            for i in range(36)
        ],
    )

    def vec(k):
        raw = [math.sin(0.7 * j * (k + 1)) for j in range(64)]
        n = math.sqrt(sum(x * x for x in raw)) or 1.0
        return [x / n for x in raw]

    write(
        "embeddings",
        [{"vec_id": i, "embedding": vec(i), "label": i % 3} for i in range(256)],
    )
    for t in ("customer", "supplier", "part", "nation", "region", "orders", "lineitem"):
        dd.sql(
            f"COPY (SELECT * FROM read_parquet('{SF_DIR_ORACLE}/{t}.parquet'))"
            f" TO '{base}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(base)


@pytest.mark.parametrize("name", UNICODE_KEYS)
def test_unicode_skew_parity(spark, unicode_dir, name):
    spec = all_queries()[name]
    con = duck_connection(unicode_dir)
    try:
        errors = compare(spec.fn(spark, unicode_dir), con.sql(spec.oracle).df())
    finally:
        con.close()
    assert not errors, errors[:3]


NULL_KEYS = [
    # keys the null-sweep caught (all fixed) plus null-sensitive guards
    "cdc_lastwrite_materialize",
    "cdc_incremental_convergence",
    "cdc_incremental_agg_maintenance",
    "multimodal_metadata",
    "multimodal_fake_features",
    "multimodal_frame_sample",
    "multimodal_resize_decimate",
    "source_binaryfile_scan",
    "udtf_tokenize_positions",
    "fn_map_ops",
    "dedup_bloom_incremental",
    "text_stats",
    "dedup_exact_text",
    # NULL event_type inside user sequences (concat_ws-vs-|| asymmetry)
    "events_top_trigram_paths",
    # r7: NULL values filtered before ranking; NULL lang/source groups
    "stats_mann_whitney_u",
    "stats_ks_test",
    "events_uplift_cuped",
    "dq_functional_dependency_audit",
    "corpus_temperature_mixture",
    # NULL text is stage-1 funnel fallout by definition
    "corpus_quality_prefilter_funnel",
]


@pytest.fixture(scope="module")
def nulls_dir(tmp_path_factory):
    """NULL-heavy fixture: NULL event values/props, NULL document text
    and lang.  Caught five latent defects: DuckDB's bare MAX_BY silently
    skips NULL values (the CDC oracles resurrected the previous non-null
    v where the engine faithfully stores NULL); the incremental view
    used old_v IS NOT NULL as its key-presence test, double-counting a
    key whose stored value is NULL; Python workers crashed on None
    payloads (media table, binary-file writer, UDTF); and two
    NULL-vs-empty-string join/hash semantics mismatches."""
    import math

    import duckdb as dd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = tmp_path_factory.mktemp("nulls_sf")

    def write(name, rows):
        schema = pq.read_schema(f"{SF_DIR_ORACLE}/{name}.parquet")
        if rows:
            cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
            table = pa.Table.from_pydict(cols, schema=schema)
        else:
            table = schema.empty_table()
        pq.write_table(table, str(base / f"{name}.parquet"))

    us = lambda s: s * 1_000_000  # noqa: E731
    jan = 1704067200
    write(
        "events",
        [
            # NULL event_type (every 11th row) lands INSIDE user
            # sequences: the trigram-path key must drop it identically
            # in engine and oracle (concat_ws skips NULLs, || doesn't).
            {"event_id": i, "ts": us(jan + 211 * i), "user_id": i % 6,
             "event_type": None if i % 11 == 0
             else ["click", "purchase", "view", "signup", "error"][i % 5],
             "value": None if i % 4 == 0 else round(2.0 + i * 0.11, 2),
             "props": None if i % 3 == 0 else '{"k": 2}'}
            for i in range(150)
        ],
    )
    write(
        "documents",
        [
            {"doc_id": i,
             "text": None if i % 7 == 0
             else f"word{i % 5} common text row number {i % 11} filler tokens here",
             "lang": None if i % 5 == 0 else ["en", "fr"][i % 2],
             "source": f"s{i % 3}", "n_chars": 0 if i % 7 == 0 else 40}
            for i in range(60)
        ],
    )

    def vec(k):
        raw = [math.cos(0.3 * j * (k + 1)) for j in range(64)]
        n = math.sqrt(sum(x * x for x in raw)) or 1.0
        return [x / n for x in raw]

    write(
        "embeddings",
        [{"vec_id": i, "embedding": vec(i), "label": i % 3} for i in range(256)],
    )
    for t in ("customer", "supplier", "part", "nation", "region", "orders", "lineitem"):
        dd.sql(
            f"COPY (SELECT * FROM read_parquet('{SF_DIR_ORACLE}/{t}.parquet'))"
            f" TO '{base}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(base)


@pytest.mark.parametrize("name", NULL_KEYS)
def test_null_parity(spark, nulls_dir, name):
    spec = all_queries()[name]
    con = duck_connection(nulls_dir)
    try:
        errors = compare(spec.fn(spark, nulls_dir), con.sql(spec.oracle).df())
    finally:
        con.close()
    assert not errors, errors[:3]
