"""ANN quality gates: LSH and IVF recall against the exact brute-force
top-k, and internal consistency of the returned rankings."""

from __future__ import annotations

from mysql_postgres_debezium_cdc_spark.registry import all_queries
from tests.conftest import SF_DIR_ORACLE


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["c_id"])
    return out


def _recall(approx, exact):
    total = hit = 0
    for q, truth in exact.items():
        got = approx.get(q, set())
        hit += len(got & truth)
        total += len(truth)
    return hit / total


def test_lsh_recall_vs_bruteforce(spark):
    exact = _topk_sets(all_queries()["ann_bruteforce_topk"].fn(spark, SF_DIR_ORACLE))
    approx = _topk_sets(all_queries()["ann_lsh_topk"].fn(spark, SF_DIR_ORACLE))
    r = _recall(approx, exact)
    # 4 tables x 4 bits lands ~0.4-0.5 on this mid-similarity corpus; the
    # gate catches a collapse (e.g. a broken signature), not tuning drift.
    assert r >= 0.2, f"LSH recall collapsed: {r:.3f}"
    assert set(approx) <= set(exact)  # only real query ids


def test_ivf_recall_vs_bruteforce(spark):
    exact = _topk_sets(all_queries()["ann_bruteforce_topk"].fn(spark, SF_DIR_ORACLE))
    approx = _topk_sets(all_queries()["ann_ivf_topk"].fn(spark, SF_DIR_ORACLE))
    r = _recall(approx, exact)
    assert r >= 0.05, f"IVF recall collapsed: {r:.3f}"


def test_ivfpq_recall_vs_bruteforce_and_vs_ivf(spark):
    """IVF-PQ probes the same cells as plain IVF, so its recall ceiling
    is IVF's; quantization + the ADC shortlist may only cost a bounded
    slice of that.  Both gates catch collapse (broken codes / ADC), not
    tuning drift."""
    exact = _topk_sets(all_queries()["ann_bruteforce_topk"].fn(spark, SF_DIR_ORACLE))
    ivf = _topk_sets(all_queries()["ann_ivf_topk"].fn(spark, SF_DIR_ORACLE))
    pq = _topk_sets(all_queries()["ann_ivfpq_topk"].fn(spark, SF_DIR_ORACLE))
    r_pq, r_ivf = _recall(pq, exact), _recall(ivf, exact)
    assert r_pq >= 0.05, f"IVF-PQ recall collapsed: {r_pq:.3f}"
    assert r_pq >= 0.6 * r_ivf, f"quantization lost too much: {r_pq:.3f} vs IVF {r_ivf:.3f}"


def test_rankings_are_sorted_and_bounded(spark):
    for name in ("ann_bruteforce_topk", "ann_ivf_topk", "ann_lsh_topk", "ann_ivfpq_topk"):
        rows = all_queries()[name].fn(spark, SF_DIR_ORACLE).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["q_id"], []).append(r)
        for q, rs in by_q.items():
            rks = [r["rk"] for r in rs]
            assert rks == sorted(rks) and rks[0] == 1 and len(rks) <= 5
            sims = [r["cos_sim"] for r in rs]
            assert sims == sorted(sims, reverse=True), (name, q, sims)


def test_exact_neardup_guard_refuses_quadratic_input(spark):
    """dedup_embedding_cosine must refuse inputs past its cardinality
    guard with a pointer to the LSH scale path, and still run (and stay
    subset-consistent with LSH survivors) under the bound."""
    import pytest

    from mysql_postgres_debezium_cdc_spark.llm.dedup import dedup_embedding_cosine
    from tests.conftest import SF_DIR_SMOKE

    with pytest.raises(ValueError, match="dedup_embedding_lsh"):
        dedup_embedding_cosine(spark, SF_DIR_SMOKE, max_rows=5)
    # under the bound it runs normally
    assert dedup_embedding_cosine(spark, SF_DIR_SMOKE).count() >= 0


def test_ivfpq_missing_codebook_raises_clearly(spark, tmp_path):
    """An embeddings table without the codebook donor ids must fail with
    an actionable error, not a KeyError from deep inside codebook
    slicing."""
    import pyarrow.parquet as pq
    import pytest

    schema = pq.read_schema(f"{SF_DIR_ORACLE}/embeddings.parquet")
    base = tmp_path / "nodonors"
    base.mkdir()
    pq.write_table(schema.empty_table(), str(base / "embeddings.parquet"))
    from mysql_postgres_debezium_cdc_spark.llm import similarity

    similarity._PQ_CODEBOOK_CACHE.clear()
    with pytest.raises(ValueError, match="codebook donors missing"):
        all_queries()["ann_ivfpq_topk"].fn(spark, str(base))


def test_rrf_persisted_index_bit_identical_to_inline(spark):
    """The serving-path contract: reading the persisted term/dim indexes
    must reproduce the inline fusion output exactly (integer index rows
    round-trip parquet; downstream float math is the same expression
    tree)."""
    inline = all_queries()["rag_rrf_fusion"].fn(spark, SF_DIR_ORACLE)
    persisted = all_queries()["rag_rrf_persisted_index"].fn(spark, SF_DIR_ORACLE)
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, persisted.collect())
    )


def test_rag_persisted_chunks_bit_identical_to_inline(spark):
    """Same serving-path contract as the RRF index: the persisted
    chunk-vector index must reproduce the inline retrieval exactly."""
    inline = all_queries()["corpus_rag_retrieval"].fn(spark, SF_DIR_ORACLE)
    persisted = all_queries()["corpus_rag_persisted_chunks"].fn(spark, SF_DIR_ORACLE)
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, persisted.collect())
    )


def test_hard_negatives_are_cross_label_and_rank_monotone(spark):
    """Every mined negative carries a label different from its anchor's,
    ranks are dense 1..K per anchor, and similarity is non-increasing
    in rank (ties broken by neg_id, so equal-cos rows may interleave
    ids but never increase cos)."""
    from mysql_postgres_debezium_cdc_spark.llm.similarity import HN_K, HN_QUERIES
    from mysql_postgres_debezium_cdc_spark.sources.parquet import load

    rows = all_queries()["embedding_hard_negatives"].fn(spark, SF_DIR_ORACLE).collect()
    labels = {
        r["vec_id"]: r["label"]
        for r in load(spark, SF_DIR_ORACLE, "embeddings").select("vec_id", "label").collect()
    }
    by_q = {}
    for r in rows:
        assert r["neg_label"] == labels[r["neg_id"]]
        assert r["neg_label"] != labels[r["q_id"]]
        by_q.setdefault(r["q_id"], []).append((r["rk"], r["cos_sim"]))
    assert len(by_q) == HN_QUERIES
    for q, pairs in by_q.items():
        pairs.sort()
        assert [rk for rk, _ in pairs] == list(range(1, HN_K + 1))
        sims = [s for _, s in pairs]
        assert sims == sorted(sims, reverse=True)


def test_bm25_df_cap_predicate_is_exactly_idf_positive():
    """The r11 df-cap theorem, pinned: the engine's exact-integer prune
    predicate 2·df < N must coincide with idf > 0 under the classic
    zero-floored Robertson idf ln((N − df + ½)/(df + ½)) for EVERY
    (df, N) with 1 ≤ df ≤ N — so dropping capped terms before the
    postings join removes only exactly-zero contributions.  Exhaustive
    over small N, plus boundary rows of large N."""
    import math

    def idf(n, df):
        return max(0.0, math.log((n - df + 0.5) / (df + 0.5)))

    cases = [(n, df) for n in range(1, 200) for df in range(1, n + 1)]
    cases += [
        (n, df)
        for n in (10**6, 10**9, 10**12)
        for df in (1, n // 2 - 1, n // 2, n // 2 + 1, n - 1, n)
        if 1 <= df <= n
    ]
    for n, df in cases:
        assert (2 * df < n) == (idf(n, df) > 0.0), (n, df, idf(n, df))
