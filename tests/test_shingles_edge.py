"""Edge-case guard for the shingler: documents shorter than k tokens.

The fixture corpus has no short documents, but any real corpus does —
and F.sequence(1, size-k+1) silently becomes the DESCENDING [1, 0] when
size < k, crashing slice() at runtime.  The oracle's RANGE() yields an
empty list for the same input, so the correct behavior is: short docs
produce NO shingles (and therefore drop out of every dedup family),
identically in both engines.
"""

from __future__ import annotations

import duckdb

from mysql_postgres_debezium_cdc_spark.llm.dedup import _SHINGLES_SQL, _shingles


def _write_docs(spark, tmp_path, texts):
    p = str(tmp_path / "sf-tiny")
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(p + "/documents.parquet")
    return p


def test_short_documents_yield_no_shingles_and_do_not_crash(spark, tmp_path):
    texts = ["one", "one two", "one two three", "a b c d", ""]
    sf_dir = _write_docs(spark, tmp_path, texts)
    got = {
        (r["doc_id"], r["shingle"]) for r in _shingles(spark, sf_dir).collect()
    }
    # docs 0, 1, 4 are sub-k → absent; doc 2 has exactly one 3-shingle
    assert got == {
        (2, "one two three"),
        (3, "a b c"),
        (3, "b c d"),
    }


def test_short_documents_match_duckdb_oracle_shingles(spark, tmp_path):
    texts = ["one", "one two", "one two three", "a b c d"]
    sf_dir = _write_docs(spark, tmp_path, texts)
    got_spark = sorted(
        (r["doc_id"], r["shingle"]) for r in _shingles(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    got_duck = sorted(con.execute(_SHINGLES_SQL.format(filter="")).fetchall())
    assert got_spark == got_duck


def test_vocab_coverage_band_boundaries(spark, tmp_path):
    """Adversarial fixture for the two-phase prefix sum in
    text_vocab_head_coverage: token counts sitting EXACTLY at power-of-2
    band boundaries (1, 2, 4, 8...), a run of equal counts (ties broken
    by token within one band), and a dominant head token.  The banded
    decomposition must equal DuckDB's single global window on the same
    file."""
    import duckdb

    from mysql_postgres_debezium_cdc_spark.registry import all_queries
    from tests.parity import compare

    # Build documents whose token multiset is exact by construction:
    # token t_k appears exactly k times for k in {1,2,3,4,7,8,9,16,16,16}.
    counts = {"a": 1, "b": 2, "c": 3, "d": 4, "e": 7, "f": 8, "g": 9,
              "h": 16, "i": 16, "j": 16, "head": 100}
    words = [t for t, n in counts.items() for _ in range(n)]
    # spread across 3 docs deterministically
    docs = [
        (0, " ".join(words[0::3]), "en", "src0", 1),
        (1, " ".join(words[1::3]), "en", "src0", 1),
        (2, " ".join(words[2::3]), "en", "src0", 1),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, source string, n_chars long")
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    spec = all_queries()["text_vocab_head_coverage"]
    out = spec.fn(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    errors = compare(out, con.sql(spec.oracle).df())
    assert not errors, errors


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["alpha", "beta", "gamma", "delta", "eps"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12),
    min_size=2,
    max_size=6,
)


def _py_shingles(toks):
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=docs_strategy)
def test_containment_matches_set_oracle(spark, tmp_path_factory, docs):
    """For ANY corpus, dedup_ngram_containment must report exactly the
    pairs a set-based oracle finds — in particular, a document whose
    token stream extends another's must surface with containment 1.0
    (the subset case symmetric Jaccard misses)."""
    import pyspark.sql.functions as F

    from mysql_postgres_debezium_cdc_spark.llm.dedup import (
        CONTAINMENT_THRESHOLD,
    )
    from mysql_postgres_debezium_cdc_spark.registry import all_queries

    # Force at least one true-containment pair: doc n = doc 0 + suffix.
    docs = docs + [docs[0] + ["beta", "alpha", "gamma", "delta"]]
    rows = [
        (i, " ".join(toks), "en", "src0", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    base = tmp_path_factory.mktemp("contain")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(base / "documents.parquet"))

    got = {
        (r["doc_a"], r["doc_b"]): (r["containment"], r["jaccard"])
        for r in all_queries()["dedup_ngram_containment"].fn(spark, str(base)).collect()
    }

    expected = {}
    sh = {i: _py_shingles(toks) for i, toks in enumerate(docs)}
    for a in sh:
        for b in sh:
            if a >= b or not sh[a] or not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            cont = inter / min(len(sh[a]), len(sh[b]))
            if cont >= CONTAINMENT_THRESHOLD:
                jac = inter / len(sh[a] | sh[b])
                expected[(a, b)] = (round(cont, 4), round(jac, 4))

    assert got == expected
    # the planted extension pair must be present with containment 1.0
    # whenever doc 0 produced shingles at all
    if sh[0]:
        assert got[(0, len(docs) - 1)][0] == 1.0


def test_r12_shingle_kernels_match_expression_pipeline(spark):
    """The r12 Arrow kernels (_shingle_sids_of, _mh_profile_kernel_of,
    _shingles_with_count_of) must reproduce the retired expression
    pipeline (_shingles_of + _feature_id [+ distinct/groupBy]) row-set
    for row-set on edge-heavy documents: empty text, sub-k docs,
    interior/trailing multi-spaces (empty tokens), repeated shingles,
    NULL text."""
    import pyspark.sql.functions as F

    from mysql_postgres_debezium_cdc_spark.llm.dedup import (
        MH_MULT,
        MH_PRIME,
        N_HASHES,
        _feature_id,
        _mh_profile_kernel_of,
        _shingle_sids_of,
        _shingles_of,
        _shingles_with_count_of,
    )

    texts = [
        "one",
        "",
        None,
        "a b c d e",
        "x  y   z w",  # empty tokens -> shingles with double spaces
        "a b c a b c a b c",  # repeated shingles -> per-doc dedup
        "tail space  ",
    ]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    # (doc_id, sid) multiset over distinct shingle strings
    sh = _shingles_of(d)
    want_sids = sorted(
        (r["doc_id"], r["sid"])
        for r in sh.select(
            "doc_id", _feature_id(F.col("shingle")).alias("sid")
        ).collect()
    )
    got_sids = sorted(
        (r["doc_id"], r["sid"]) for r in _shingle_sids_of(d).collect()
    )
    assert got_sids == want_sids

    # (doc_id, n_sh, shingle) with inline counts
    want_cnt = sorted(
        (r["doc_id"], r["n_sh"], r["shingle"])
        for r in sh.join(
            sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh")), "doc_id"
        ).collect()
    )
    got_cnt = sorted(
        (r["doc_id"], r["n_sh"], r["shingle"])
        for r in _shingles_with_count_of(d).collect()
    )
    assert got_cnt == want_cnt

    # full MinHash profile
    doc_sids = sh.select(
        "doc_id", _feature_id(F.col("shingle")).alias("sid")
    ).distinct()
    mh = [
        F.min(
            (F.lit((j * MH_MULT + 1) % MH_PRIME) * F.col("sid") + j) % MH_PRIME
        ).alias(f"mh{j}")
        for j in range(N_HASHES)
    ]
    want_prof = sorted(
        tuple(
            [r["doc_id"], r["n_sh"], tuple(r["sids"])]
            + [r[f"mh{j}"] for j in range(N_HASHES)]
        )
        for r in doc_sids.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sort_array(F.collect_list("sid")).alias("sids"),
            *mh,
        )
        .collect()
    )
    got_prof = sorted(
        tuple(
            [r["doc_id"], r["n_sh"], tuple(r["sids"])]
            + [r[f"mh{j}"] for j in range(N_HASHES)]
        )
        for r in _mh_profile_kernel_of(d).collect()
    )
    assert got_prof == want_prof


def test_r13_simhash_signature_kernel_matches_expression_pipeline(spark):
    """The r13 full-signature kernel (_simhash_sigs_of) must reproduce
    the retired shape — the (doc_id, sid) multiset kernel + the JVM
    32-term ±1 SUM(CASE) aggregate — signature for signature on the
    same edge-heavy documents (sub-k docs emit nothing; repeated
    shingles dedup per doc; the ±1 sums are exact integers, so the
    per-doc set iteration order cannot change a bit)."""
    import functools

    import pyspark.sql.functions as F

    from mysql_postgres_debezium_cdc_spark.llm.dedup import (
        MH_MULT,
        MH_PRIME,
        SH_BITS,
        _shingle_sids_of,
        _simhash_sigs_of,
    )

    texts = [
        "one",
        "",
        None,
        "a b c d e",
        "x  y   z w",
        "a b c a b c a b c",
        "tail space  ",
        "p q r s t u v w p q r",
    ]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    bit_terms = [
        F.when(
            F.sum(
                F.when(
                    (F.lit((j * MH_MULT + 1) % MH_PRIME) * F.col("sid") + j)
                    % MH_PRIME
                    % 2
                    == 1,
                    1,
                ).otherwise(-1)
            )
            >= 0,
            F.lit(1 << j).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        for j in range(SH_BITS)
    ]
    want = sorted(
        (r["doc_id"], r["sig"])
        for r in _shingle_sids_of(d)
        .groupBy("doc_id")
        .agg(functools.reduce(lambda a, b: a + b, bit_terms).alias("sig"))
        .collect()
    )
    got = sorted((r["doc_id"], r["sig"]) for r in _simhash_sigs_of(d).collect())
    assert got == want
