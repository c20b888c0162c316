"""Hot-bucket caps for the dedup pair expansion.

A degenerate bucket (stopword shingle, all-zeros LSH band) expands
quadratically inline — the one scale hazard in the bucketed dedup
design.  These tests pin the two caps' contracts:

- capping only ever REMOVES pairs — every surviving pair is
  bit-identical to the uncapped expansion (subset property, checked
  against a pure-python oracle over randomized buckets);
- the pair count out of a hot bucket is bounded by width*(width-1)/2;
- the caps are observable (never silent): an Observation reports how
  many buckets were dropped/truncated.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
from pyspark.sql import Observation

from mysql_postgres_debezium_cdc_spark.llm.dedup import _jaccard_pairs, _pairs_from_bucket
from tests.conftest import SF_DIR_SMOKE


def _python_pairs(buckets, max_doc_freq=None, max_bucket_width=None):
    """Pure-python oracle for the capped inline pair expansion."""
    out = set()
    for docs in buckets:
        if max_doc_freq is not None and len(docs) > max_doc_freq:
            continue
        kept = docs if max_bucket_width is None else docs[:max_bucket_width]
        for i in range(len(kept)):
            for j in range(i + 1, len(kept)):
                out.add((kept[i], kept[j]))
    return out


def _spark_pairs(spark, buckets, **kwargs):
    df = spark.createDataFrame([(b,) for b in buckets], "docs array<bigint>")
    rows = _pairs_from_bucket(df, **kwargs).collect()
    return [(r["doc_a"], r["doc_b"]) for r in rows]


def test_hot_bucket_truncation_bounds_pairs(spark):
    hot = sorted(random.Random(7).sample(range(10_000), 60))
    cold = [3, 5, 9]
    buckets = [hot, cold]
    obs = Observation("cap")
    got = _spark_pairs(spark, buckets, max_bucket_width=10, observation=obs)
    # 10*9/2 pairs from the truncated hot bucket + 3 from the cold one
    assert len(got) == 45 + 3
    assert set(got) == _python_pairs(buckets, max_bucket_width=10)
    assert set(got) <= _python_pairs(buckets)  # capping only drops
    m = obs.get
    assert m["n_truncated_buckets"] == 1
    assert m["n_dropped_buckets"] == 0
    assert m["widest_bucket"] == 60


def test_doc_freq_cap_drops_hot_bucket_entirely(spark):
    hot = list(range(50))
    cold = [100, 200]
    obs = Observation("dfcap")
    got = _spark_pairs(spark, [hot, cold], max_doc_freq=10, observation=obs)
    assert set(got) == {(100, 200)}
    m = obs.get
    assert m["n_dropped_buckets"] == 1
    assert m["n_truncated_buckets"] == 0


def test_caps_match_python_oracle_on_random_buckets(spark):
    """Randomized subset/equality property in one Spark round-trip:
    many buckets of varied widths, both caps at once."""
    rng = random.Random(42)
    buckets = [
        sorted(rng.sample(range(100_000), rng.randint(2, 40))) for _ in range(60)
    ]
    for kwargs in (
        {},
        {"max_bucket_width": 5},
        {"max_doc_freq": 20},
        {"max_doc_freq": 25, "max_bucket_width": 8},
    ):
        got = _spark_pairs(spark, buckets, **kwargs)
        assert len(got) == len(set(got))  # expansion never duplicates within buckets
        assert set(got) == _python_pairs(buckets, **kwargs), kwargs
        assert set(got) <= _python_pairs(buckets), kwargs


def test_truncation_preserves_struct_payloads(spark):
    """With struct buckets (the join-free SimHash/Jaccard shape), the
    truncated expansion must carry the SAME payloads as the uncapped
    run for every surviving pair."""
    df = spark.createDataFrame(
        [([(1, 11), (2, 22), (3, 33), (4, 44)],)],
        "docs array<struct<doc_id:bigint,sig:bigint>>",
    )
    full = {
        (r["doc_a"], r["doc_b"]): (r["sig_a"], r["sig_b"])
        for r in _pairs_from_bucket(df, fields={"sig": ("sig_a", "sig_b")}).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): (r["sig_a"], r["sig_b"])
        for r in _pairs_from_bucket(
            df, fields={"sig": ("sig_a", "sig_b")}, max_bucket_width=3
        ).collect()
    }
    assert set(capped) == {(1, 2), (1, 3), (2, 3)}
    assert all(capped[k] == full[k] for k in capped)


def test_jaccard_pipeline_with_caps_is_subset(spark):
    """End-to-end: the capped Jaccard pipeline emits a subset of the
    uncapped verified pairs, with identical scores on survivors."""
    base = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _jaccard_pairs(spark, SF_DIR_SMOKE).collect()
    }
    obs = Observation("jac-cap")
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _jaccard_pairs(
            spark, SF_DIR_SMOKE, max_doc_freq=50, max_bucket_width=8, observation=obs
        ).collect()
    }
    assert set(capped) <= set(base)
    assert all(capped[k] == base[k] for k in capped)
    assert obs.get["widest_bucket"] >= 1


def test_shingle_doc_freq_cap(spark):
    """_shingles(max_doc_freq=N): no surviving shingle appears in more
    than N documents, and surviving rows equal the python-filtered
    uncapped set."""
    from mysql_postgres_debezium_cdc_spark.llm.dedup import _shingles

    full = [(r["doc_id"], r["shingle"]) for r in _shingles(spark, SF_DIR_SMOKE).collect()]
    from collections import Counter

    df_count = Counter(s for _, s in full)
    cap = 3
    expect = {(d, s) for d, s in full if df_count[s] <= cap}
    got = {
        (r["doc_id"], r["shingle"])
        for r in _shingles(spark, SF_DIR_SMOKE, max_doc_freq=cap).collect()
    }
    assert got == expect
    assert max(Counter(s for _, s in got).values()) <= cap


def test_embedding_lsh_cap_only_removes_pairs(spark):
    """The r4 cap passthrough on dedup_embedding_lsh: capped output is a
    strict subset of uncapped output with identical surviving values."""
    from mysql_postgres_debezium_cdc_spark.llm.dedup import dedup_embedding_lsh
    from tests.conftest import SF_DIR_SMOKE

    full = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in dedup_embedding_lsh(spark, SF_DIR_SMOKE).collect()
    }
    capped = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in dedup_embedding_lsh(
            spark, SF_DIR_SMOKE, max_bucket_width=2
        ).collect()
    }
    assert set(capped) <= set(full)
    for k, v in capped.items():
        assert v == full[k]
