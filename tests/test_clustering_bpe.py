"""Property tests for the two algorithmic kernels added in r4's second
half: the BPE replace-chain encoder (boundary safety + equivalence to a
reference leftmost-greedy implementation) and fixed-point k-means
(equivalence to a plain-Python Lloyd's on the same integer geometry).

Both operators are also DuckDB-value-checked end-to-end by the parity
sweep; these tests pin the ALGORITHM against an independent
implementation on adversarial inputs the fixture corpus doesn't
contain (repeated pairs, merge-of-merge cascades, tie-distance
points)."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_postgres_debezium_cdc_spark.llm.clustering import (
    KM_K,
    _assign,
    _update,
)
from mysql_postgres_debezium_cdc_spark.llm.text import BPE_MERGES


def bpe_reference(word: str, merges=BPE_MERGES) -> list[str]:
    """Reference BPE apply: for each merge in rank order, replace
    occurrences leftmost-first, non-overlapping, in one pass (the
    semantics a single string REPLACE implements)."""
    syms = list(word)
    for x, y in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def spark_bpe_tokens(spark, words: list[str]) -> list[int]:
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    cur = F.concat(F.lit("  "), F.regexp_replace(F.col("w"), "(.)", "$1  "))
    for x, y in BPE_MERGES:
        cur = F.replace(cur, F.lit(f" {x}  {y} "), F.lit(f" {x}{y} "))
    n = F.size(F.filter(F.split(cur, "  "), lambda t: F.length(t) > 0))
    rows = df.select(F.col("w"), n.alias("n")).collect()
    got = {r["w"]: r["n"] for r in rows}
    return [got[w] for w in words]


# Alphabet chosen to hit every merge, including the ta→tab→table cascade
# and repeated-pair overlap cases (erer, stst, aaaa...).
_WORDS = st.text(alphabet="tablesrowin", min_size=1, max_size=12)


@settings(max_examples=20, deadline=None)
@given(st.lists(_WORDS, min_size=1, max_size=8, unique=True))
def test_bpe_chain_matches_reference(spark, words):
    expect = [len(bpe_reference(w)) for w in words]
    assert spark_bpe_tokens(spark, words) == expect


def test_bpe_cascade_merges_whole_word(spark):
    # 'table' must collapse through t+a → ta+b → tab+le to ONE token.
    # 'stable': s+t merges first (rank 3), stealing the t from 'ta', then
    # l+e → st,a,b,le = 4 tokens — merge order genuinely changes the
    # result, which is exactly what this pin protects.
    assert spark_bpe_tokens(spark, ["table", "tables", "stable"]) == [1, 2, 4]


def kmeans_reference(vectors: dict[int, list[int]], k: int, iters: int):
    """Plain-python fixed-point Lloyd's mirroring llm/clustering.py:
    init = k lowest ids, dist = exact int sq-euclidean, ties to lowest
    cid, update = floor(sum/count) per dim, empty clusters drop."""
    import math

    ids = sorted(vectors)
    cents = {c: list(vectors[v]) for c, v in enumerate(ids[:k])}

    def assign():
        out = {}
        for vid, v in vectors.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(v, cents[c])), c) for c in cents
            )
            out[vid] = best
        return out

    a = assign()
    for _ in range(iters - 1):
        newc = {}
        for vid, (_, c) in a.items():
            newc.setdefault(c, []).append(vectors[vid])
        cents = {
            c: [
                math.floor(sum(col) / len(vs))
                for col in zip(*vs)
            ]
            for c, vs in newc.items()
        }
        a = assign()
    return {vid: (c, d) for vid, (d, c) in a.items()}


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=-50, max_value=50), min_size=3, max_size=3),
        min_size=KM_K,
        max_size=24,
    )
)
def test_kmeans_stages_match_reference(spark, vecs):
    vectors = {i: v for i, v in enumerate(vecs)}
    expect = kmeans_reference(vectors, KM_K, 2)

    q = spark.createDataFrame(
        [(i, v) for i, v in vectors.items()], "vec_id: long, qv: array<long>"
    )
    ids = sorted(vectors)
    init = spark.createDataFrame(
        [(c, vectors[v]) for c, v in enumerate(ids[:KM_K])],
        "cid: long, cv: array<long>",
    )
    assigned = _assign(q, init)
    assigned = _assign(q, _update(assigned))
    got = {
        r["vec_id"]: (r["cid"], r["dist"]) for r in assigned.collect()
    }
    assert got == expect


def test_bpe_training_counts_are_monotone_and_consistent_with_encode_table(spark):
    """BPE theory check: each round's best-pair count is non-increasing
    (a merge can only reduce existing pair counts, and a new symbol's
    pair counts are bounded by its constituents'), and the learned
    first merges must agree with the hand-mined prefix of BPE_MERGES
    (both derive from the same fixture statistics)."""
    from mysql_postgres_debezium_cdc_spark.llm.text import BPE_MERGES
    from mysql_postgres_debezium_cdc_spark.registry import all_queries
    from tests.conftest import SF_DIR_ORACLE

    rows = (
        all_queries()["corpus_bpe_train_merges"].fn(spark, SF_DIR_ORACLE).collect()
    )
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True), counts
    learned = {(r["merge_left"], r["merge_right"]) for r in rows}
    # the mined table's character-level prefix came from the same corpus
    assert ("e", "r") in learned and ("e", "r") == BPE_MERGES[0]
