"""Behavioral invariants for the late-r6 operator batch (range search,
Count-Min sketch, gaps-and-islands, changepoint, char entropy,
curriculum ordering, multimodal frame/resize, label propagation).

Value correctness is covered by the all-key oracle parity sweep
(tests/test_oracle_parity.py); these tests pin the SEMANTIC guarantees
the value hash alone can't express — the CMS no-undercount bound, LPA
communities refining connected components, curriculum phases
partitioning the corpus, frame geometry arithmetic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from mysql_postgres_debezium_cdc_spark.registry import all_queries
from tests.conftest import SF_DIR_ORACLE, SF_DIR_SMOKE


def _run(spark, key: str, sf_dir: str = SF_DIR_SMOKE):
    return all_queries()[key].fn(spark, sf_dir)


def test_cms_never_undercounts(spark):
    """The defining CMS guarantee: estimate >= true count, every key."""
    rows = _run(spark, "agg_countmin_sketch", SF_DIR_ORACLE).collect()
    assert rows, "CMS output empty"
    for r in rows:
        assert r.cms_est >= r.true_cnt, (r.user_id, r.cms_est, r.true_cnt)
        assert r.no_undercount == 1


def test_range_search_agrees_with_bruteforce_topk(spark):
    """Every top-k neighbor whose similarity clears the radius must be
    in the range-search hit set (range search = top-k with the rank
    filter swapped for a similarity filter)."""
    from mysql_postgres_debezium_cdc_spark.llm.similarity import RANGE_THRESHOLD

    topk = {
        (r.q_id, r.c_id): r.cos_sim
        for r in _run(spark, "ann_bruteforce_topk", SF_DIR_ORACLE).collect()
        if r.cos_sim >= RANGE_THRESHOLD
    }
    hits = {
        (r.q_id, r.c_id): r.cos_sim
        for r in _run(spark, "ann_range_search", SF_DIR_ORACLE).collect()
    }
    missing = set(topk) - set(hits)
    assert not missing, f"top-k hits above threshold absent from range search: {missing}"
    for pair, sim in topk.items():
        assert hits[pair] == sim


def test_gaps_islands_bounds(spark):
    """Longest streak can't exceed the user's active-day count, and
    streak counts are positive."""
    out = {r.user_id: r for r in _run(spark, "window_gaps_islands").collect()}
    assert out
    days = (
        _load_events(spark)
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_days"))
        .collect()
    )
    for r in days:
        o = out[r.user_id]
        assert 1 <= o.longest_streak <= r.n_days
        assert o.n_streaks >= 1


def _load_events(spark):
    from mysql_postgres_debezium_cdc_spark.sources.parquet import load

    return load(spark, SF_DIR_SMOKE, "events")


def test_curriculum_phases_partition_and_rank_contiguous(spark):
    out = _run(spark, "corpus_curriculum_order", SF_DIR_SMOKE).collect()
    n_docs = _n_docs(spark)
    assert len(out) == n_docs  # every doc gets exactly one curriculum slot
    by_phase: dict[int, list] = {}
    for r in out:
        by_phase.setdefault(r.phase, []).append(r)
    assert set(by_phase) <= {1, 2, 3, 4}
    for rows in by_phase.values():
        ranks = sorted(r.curriculum_rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))  # contiguous 1..n
        # easy-to-hard within phase
        by_rank = sorted(rows, key=lambda r: r.curriculum_rank)
        diffs = [r.difficulty for r in by_rank]
        assert diffs == sorted(diffs)


def _n_docs(spark) -> int:
    from mysql_postgres_debezium_cdc_spark.sources.parquet import load

    return load(spark, SF_DIR_SMOKE, "documents").count()


def test_label_propagation_refines_connected_components(spark):
    """Two docs in the same LPA community must share a CC component
    (labels only travel along edges, so communities can't straddle
    components); community sizes are consistent."""
    lpa = _run(spark, "graph_label_propagation", SF_DIR_ORACLE).collect()
    cc = {
        r.doc_id: r.component_id
        for r in _run(spark, "dedup_connected_components", SF_DIR_ORACLE).collect()
    }
    by_comm: dict[int, set] = {}
    for r in lpa:
        by_comm.setdefault(r.community, set()).add(r.doc_id)
    for comm, members in by_comm.items():
        comps = {cc[d] for d in members if d in cc}
        assert len(comps) <= 1, f"community {comm} straddles CC components {comps}"
    sizes = {r.community: r.community_size for r in lpa}
    for comm, members in by_comm.items():
        assert sizes[comm] == len(members)


def test_frame_sample_geometry(spark):
    """Frame offsets follow stride arithmetic and cover every payload."""
    from mysql_postgres_debezium_cdc_spark.llm.multimodal import (
        FRAME_BYTES,
        FRAME_EVERY_NTH,
        media_table,
    )

    stride = FRAME_BYTES * FRAME_EVERY_NTH
    n_bytes = {
        r.doc_id: r.n_bytes
        for r in media_table(spark, SF_DIR_SMOKE).select("doc_id", "n_bytes").collect()
    }
    frames = _run(spark, "multimodal_frame_sample", SF_DIR_SMOKE).collect()
    per_doc: dict[int, list] = {}
    for r in frames:
        assert r.frame_offset == r.frame_no * stride
        per_doc.setdefault(r.doc_id, []).append(r.frame_no)
    for doc_id, nb in n_bytes.items():
        expected = max(1, -(-nb // stride)) if nb > 0 else 1
        assert len(per_doc[doc_id]) == expected
        assert sorted(per_doc[doc_id]) == list(range(expected))


def test_resize_decimate_size_arithmetic(spark):
    from mysql_postgres_debezium_cdc_spark.llm.multimodal import RESIZE_FACTOR

    for r in _run(spark, "multimodal_resize_decimate", SF_DIR_SMOKE).collect():
        # ceil(orig / factor) surviving bytes
        assert r.resized_bytes == -(-r.orig_bytes // RESIZE_FACTOR)


def test_char_entropy_bounds(spark):
    """0 <= H <= log2(alphabet size), with equality cases meaningful."""
    import math

    for r in _run(spark, "text_char_entropy", SF_DIR_SMOKE).collect():
        assert r.char_entropy >= 0.0
        assert r.char_entropy <= math.log2(r.n_unique_chars) + 1e-9


def test_changepoint_scores_symmetric_windows(spark):
    """Flagged hours carry full windows on both sides: before/after
    averages exist and the score matches their normalized difference in
    sign."""
    for r in _run(spark, "events_changepoint_window", SF_DIR_ORACLE).collect():
        assert r.before_avg is not None and r.after_avg is not None
        if r.shift_score > 0:
            assert r.after_avg > r.before_avg
        else:
            assert r.after_avg < r.before_avg


# --- second late-r6 batch: mining / retrieval / experiment ops -------------


def test_basket_lift_arithmetic(spark):
    """Lift is the exact integer (co*N*1e6) div (cnt_a*cnt_b), and
    co-occurrence is bounded by each brand's own order count."""
    rows = _run(spark, "basket_affinity_pairs", SF_DIR_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.lift_ppm == (r.co_orders * r.n_orders * 1000000) // (
            r.cnt_a * r.cnt_b
        )
        assert r.co_orders <= min(r.cnt_a, r.cnt_b) <= r.n_orders


def test_skyline_frontier_sound_and_complete(spark):
    """No frontier point dominates another (soundness) and every
    non-frontier part is dominated by some frontier part (completeness)
    — checked against the raw part table."""
    from mysql_postgres_debezium_cdc_spark.sources.parquet import load

    frontier = [
        (r.price_cents, r.p_size)
        for r in _run(spark, "skyline_pareto_parts", SF_DIR_SMOKE).collect()
    ]
    assert frontier
    for p1, s1 in frontier:
        for p2, s2 in frontier:
            dominates = p1 <= p2 and s1 >= s2 and (p1 < p2 or s1 > s2)
            assert not dominates, ((p1, s1), (p2, s2))
    pts = [
        (int(round(r.p_retailprice * 100)), r.p_size)
        for r in load(spark, SF_DIR_SMOKE, "part")
        .select("p_retailprice", "p_size")
        .collect()
    ]
    fset = set(frontier)
    for p, s in pts:
        if (p, s) in fset:
            continue
        assert any(
            fp <= p and fs >= s and (fp < p or fs > s) for fp, fs in fset
        ), (p, s)


def test_ab_test_arms_partition_users(spark):
    from mysql_postgres_debezium_cdc_spark.sources.parquet import load

    r = _run(spark, "events_ab_test_eval", SF_DIR_ORACLE).collect()[0]
    n_users = (
        load(spark, SF_DIR_ORACLE, "events").select("user_id").distinct().count()
    )
    assert r.n_a + r.n_b == n_users
    assert 0 < r.conv_a < r.n_a and 0 < r.conv_b < r.n_b  # non-degenerate
    if r.z_score > 0:
        assert r.rate_a > r.rate_b
    elif r.z_score < 0:
        assert r.rate_a < r.rate_b


def test_bm25_hits_share_terms_with_query(spark):
    """Positive BM25 score implies lexical overlap; ranks contiguous.

    Runs at SF_DIR_ORACLE: under the r11 score-neutral df-cap (classic
    floored idf — terms in ≥ half the corpus contribute exactly 0),
    the sf0.001 fixture's 31-word dense vocabulary leaves no positive
    scoring term shared between any query doc and the corpus, so the
    smoke fixture legitimately returns zero hits; sf0.01's query 107
    shares the one rare term."""
    from mysql_postgres_debezium_cdc_spark.sources.parquet import load

    hits = _run(spark, "rag_bm25_topk", SF_DIR_ORACLE).collect()
    assert hits
    toks = {
        r.doc_id: set(r.text.split(" "))
        for r in load(spark, SF_DIR_ORACLE, "documents").collect()
    }
    per_q: dict[int, list] = {}
    for r in hits:
        assert r.score_micro > 0
        assert toks[r.q_doc] & toks[r.hit_doc], (r.q_doc, r.hit_doc)
        per_q.setdefault(r.q_doc, []).append(r.rk)
    for q, rks in per_q.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))


def test_mmr_picks_refine_relevance_shortlist(spark):
    """MMR picks come from the top-MMR_POOL relevance shortlist, pick 1
    is the relevance argmax, and the pick set is duplicate-free with
    exactly MMR_K picks per query."""
    from mysql_postgres_debezium_cdc_spark.llm.similarity import MMR_K, MMR_POOL

    picks = _run(spark, "ann_mmr_diversified", SF_DIR_ORACLE).collect()
    short: dict[int, list] = {}
    for r in _run(spark, "ann_bruteforce_topk", SF_DIR_ORACLE).collect():
        short.setdefault(r.q_id, []).append((r.c_id, r.cos_sim))
    by_q: dict[int, list] = {}
    for r in picks:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == set(short)
    for q, rows in by_q.items():
        assert len(rows) == MMR_K
        ids = [r.c_id for r in rows]
        assert len(set(ids)) == MMR_K
        first = next(r for r in rows if r.pick_order == 1)
        # bruteforce top-1 (rounded 4dp == rel_i/10000 ordering)
        assert first.c_id == short[q][0][0]
        assert first.mmr_i == 7 * first.rel_i
        # every pick's relevance is within the top-POOL of its query
        rels = sorted((r.rel_i for r in rows), reverse=True)
        assert len(rels) <= MMR_POOL


def test_trigram_search_equals_direct_scan(spark):
    """Index+verify must return exactly the docs a direct substring
    scan finds — soundness (contains really holds) and completeness
    (no containing doc pruned away by the index)."""
    from mysql_postgres_debezium_cdc_spark.llm.text import TRIGRAM_PATTERNS
    from mysql_postgres_debezium_cdc_spark.sources.parquet import load

    out: dict[str, set] = {}
    for r in _run(spark, "text_trigram_substring_search", SF_DIR_SMOKE).collect():
        out.setdefault(r.pattern, set()).add(r.doc_id)
    docs = load(spark, SF_DIR_SMOKE, "documents").collect()
    for p in TRIGRAM_PATTERNS:
        truth = {r.doc_id for r in docs if p in r.text}
        assert out.get(p, set()) == truth, p


def test_trigram_persisted_index_bit_identical_to_inline(spark):
    """The serving-path contract ([[rag_rrf_persisted_index]] pattern):
    answering from the persisted (doc_id, tg) parquet must reproduce
    the inline index+verify output exactly — exact integer/string index
    rows round-trip parquet, downstream intersection/verify is the same
    expression tree."""
    inline = _run(spark, "text_trigram_substring_search", SF_DIR_SMOKE)
    persisted = _run(spark, "text_trigram_persisted_index", SF_DIR_SMOKE)
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, persisted.collect())
    )


def test_quantile_sketch_order_statistic_in_bucket(spark):
    """The defining histogram-sketch guarantee: the target-rank order
    statistic lies inside the chosen bucket, so the estimate is off by
    at most one bucket width plus interpolation skew."""
    from mysql_postgres_debezium_cdc_spark.operators.aggregates import (
        HQ_BUCKET_CENTS,
    )
    from mysql_postgres_debezium_cdc_spark.sources.parquet import load

    cents = sorted(
        int(round(r.l_extendedprice * 100))
        for r in load(spark, SF_DIR_ORACLE, "lineitem")
        .select("l_extendedprice")
        .collect()
    )
    for r in _run(spark, "agg_quantile_histogram_sketch", SF_DIR_ORACLE).collect():
        order_stat = cents[r.target_rank - 1]  # 1-indexed rank
        lo = r.bucket * HQ_BUCKET_CENTS
        assert lo <= order_stat < lo + HQ_BUCKET_CENTS, (r.q_pct, order_stat, lo)
        assert lo * 1000 <= r.est_millicents <= (lo + HQ_BUCKET_CENTS) * 1000
        assert r.err_cents <= 2 * HQ_BUCKET_CENTS


def test_interval_overlap_equals_quadratic_definition(spark):
    """The bucket decomposition must equal the direct range-predicate
    join recomputed from its two certified inputs."""
    sess = {
        (r.user_id, r.session_idx): (r.session_start_s, r.session_start_s + r.duration_s)
        for r in _run(spark, "events_sessionize_gap", SF_DIR_SMOKE).collect()
    }
    out = {
        (r.user_id, r.session_idx, r.event_type, r.busy_hour_s)
        for r in _run(spark, "join_interval_overlap", SF_DIR_SMOKE).collect()
    }
    busy = {
        (r.event_type, r.busy_hour_s)
        for r in _run(spark, "join_interval_overlap", SF_DIR_SMOKE)
        .select("event_type", "busy_hour_s")
        .collect()
    }
    # soundness + completeness against the definition, restricted to the
    # busy hours the output itself names (the busy set is part of the
    # oracle-checked contract)
    expected = {
        (u, sidx, et, h)
        for (u, sidx), (s, e) in sess.items()
        for (et, h) in busy
        if s < h + 3600 and h <= e
    }
    assert out == expected


def test_rfm_segments_partition_users(spark):
    """The 8 RFM segments partition the user base, and segment revenue
    sums to total purchase revenue."""
    from mysql_postgres_debezium_cdc_spark.sources.parquet import load
    import pyspark.sql.functions as G

    rows_out = _run(spark, "events_rfm_segmentation", SF_DIR_ORACLE).collect()
    ev = load(spark, SF_DIR_ORACLE, "events")
    n_users = ev.select("user_id").distinct().count()
    total_cents = (
        ev.where(G.col("event_type") == "purchase")
        .agg(G.sum(G.round(G.col("value") * 100).cast("bigint")))
        .collect()[0][0]
    )
    assert sum(r.n_users for r in rows_out) == n_users
    assert sum(r.segment_cents for r in rows_out) == total_cents
    assert all(
        r.r_score in (1, 2) and r.f_score in (1, 2) and r.m_score in (1, 2)
        for r in rows_out
    )


def test_markov_eval_counts_consistent(spark):
    """Eval bookkeeping: per source state, 0 <= n_correct <= n_test,
    accuracy = n_correct/n_test at 4dp, and the held-out transitions
    counted across states equal the deterministic split size."""
    from mysql_postgres_debezium_cdc_spark.operators.behavioral import (
        MARKOV_TEST_MOD,
    )
    from mysql_postgres_debezium_cdc_spark.sources.parquet import load

    out = _run(spark, "events_markov_next_eval", SF_DIR_ORACLE).collect()
    assert out
    for r in out:
        assert 0 <= r.n_correct <= r.n_test
        assert abs(r.accuracy - round(r.n_correct / r.n_test, 4)) < 1e-9
    ev = load(spark, SF_DIR_ORACLE, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    n_test_truth = (
        ev.select("event_id", F.lead("event_type").over(w).alias("nt"))
        .where(F.col("nt").isNotNull() & (F.col("event_id") % MARKOV_TEST_MOD == 0))
        .count()
    )
    assert sum(r.n_test for r in out) == n_test_truth
