"""Semantic invariants for the r5 additions (graph analytics, hybrid
retrieval, boilerplate/Gopher profiling) — properties the DuckDB parity
sweep cannot express because they relate a query's output to ANOTHER
query's output or to a closed-form identity."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    from mysql_postgres_debezium_cdc_spark.registry import all_queries

    return {k: s.fn for k, s in all_queries().items()}


def test_pagerank_is_a_distribution(spark, queries):
    """With every nation having outgoing trade (TPC-H guarantees
    suppliers per nation), there are no dangling nodes, so the damped
    walk conserves mass: ranks sum to 1 and are strictly positive."""
    rows = queries["graph_pagerank_trade"](spark, SF).collect()
    assert len(rows) == 25
    assert all(r["pagerank"] > 0 for r in rows)
    assert abs(sum(r["pagerank"] for r in rows) - 1.0) < 1e-4


def test_triangles_are_closed_and_oriented(spark, queries):
    """Each reported triangle is id-oriented (a<b<c) and all three of
    its edges exist in the near-dup pair relation."""
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in queries["dedup_embedding_lsh"](spark, SF).collect()
    }
    tris = queries["graph_triangle_count"](spark, SF).collect()
    assert len(tris) >= 1  # fixture has at least one duplicate family
    for t in tris:
        a, b, c = t["vec_a"], t["vec_b"], t["vec_c"]
        assert a < b < c
        assert (a, b) in pairs and (b, c) in pairs and (a, c) in pairs


def test_boilerplate_ratio_identity(spark, queries):
    rows = queries["dedup_boilerplate_lines"](spark, SF).collect()
    assert rows and any(r["n_boiler_lines"] > 0 for r in rows)
    for r in rows:
        assert 0 <= r["n_boiler_lines"] <= r["n_lines"]
        assert abs(r["boiler_ratio"] - round(r["n_boiler_lines"] / r["n_lines"], 4)) < 1e-9


def test_gopher_overall_is_conjunction(spark, queries):
    rows = queries["text_gopher_quality_flags"](spark, SF).collect()
    seen_fail = seen_pass = False
    for r in rows:
        conj = (
            r["pass_word_count"]
            & r["pass_mean_len"]
            & r["pass_stopwords"]
            & r["pass_repetition"]
        )
        assert r["pass_overall"] == conj
        seen_pass |= bool(conj)
        seen_fail |= not conj
    assert seen_pass and seen_fail  # the rules actually discriminate


def test_rrf_score_identity(spark, queries):
    """The fused score is exactly the sum of the reciprocal-rank terms
    of the retrievers that returned the hit."""
    rows = queries["rag_rrf_fusion"](spark, SF).collect()
    assert rows
    saw_lex_only = saw_both = False
    for r in rows:
        want = 0.0
        if r["lex_rank"] is not None:
            want += 1.0 / (60 + r["lex_rank"])
        if r["dense_rank"] is not None:
            want += 1.0 / (60 + r["dense_rank"])
        assert abs(r["rrf_score"] - round(want, 6)) < 1e-9
        saw_both |= r["lex_rank"] is not None and r["dense_rank"] is not None
        saw_lex_only |= (r["lex_rank"] is None) != (r["dense_rank"] is None)
    assert saw_both  # fusion actually meets in the middle somewhere


def test_distributed_pagerank_is_a_distribution_over_pair_nodes(spark, queries):
    """The symmetrized near-dup graph has no dangling nodes (every
    endpoint has out-degree >= 1), so mass conserves: ranks sum to 1,
    all strictly positive, and the node set is exactly the set of
    near-dup pair endpoints."""
    from mysql_postgres_debezium_cdc_spark.llm.dedup import _jaccard_pairs

    rows = queries["graph_pagerank_distributed"](spark, SF).collect()
    assert len(rows) > 0
    assert all(r["pagerank"] > 0 for r in rows)
    assert abs(sum(r["pagerank"] for r in rows) - 1.0) < 1e-4
    endpoints = set()
    for p in _jaccard_pairs(spark, SF).collect():
        endpoints.add(p["doc_a"])
        endpoints.add(p["doc_b"])
    assert {r["doc_id"] for r in rows} == endpoints


def test_distributed_pagerank_never_collects_rank_relation(spark, queries):
    """The rank relation must stay on the cluster: the returned plan
    reads checkpointed RDDs (Scan ExistingRDD), never a LocalTableScan
    or parallelized local collection — the signature graph_pagerank_
    trade's bounded driver solve leaves and this operator must not."""
    df = queries["graph_pagerank_distributed"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan, plan
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, plan
