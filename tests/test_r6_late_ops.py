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
