"""Behavioral tests for the corpus-governance ops added in round 4:
PII redaction, contamination detection, deterministic splits, and the
seeded global shuffle.  Oracle parity (tests/test_oracle_parity.py)
already value-checks the registry queries; these tests pin the operator
SEMANTICS on hand-built inputs where the expected answer is knowable by
eye.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from mysql_postgres_debezium_cdc_spark.llm.pii import pii_counts, redact_pii
from mysql_postgres_debezium_cdc_spark.llm.splits import (
    N_SHARDS,
    split_column,
)


def test_redact_pii_replaces_all_occurrences(spark):
    df = spark.createDataFrame(
        [
            ("write a@b.com or c.d+e@f-g.org today", 2, 0, 0),
            ("call 555-123-4567 then 555-000-1111", 0, 2, 0),
            ("hosts 10.0.0.1 and 192.168.254.7", 0, 0, 2),
            ("mixed a@b.co 555-111-2222 8.8.8.8", 1, 1, 1),
            ("no pii at all here", 0, 0, 0),
        ],
        "s string, e int, p int, i int",
    )
    counts = pii_counts(F.col("s"))
    got = df.select(
        counts["n_email"].alias("ne"),
        counts["n_phone"].alias("np"),
        counts["n_ipv4"].alias("ni"),
        redact_pii(F.col("s")).alias("red"),
        "e",
        "p",
        "i",
    ).collect()
    for r in got:
        assert (r["ne"], r["np"], r["ni"]) == (r["e"], r["p"], r["i"]), r
        if (r["e"], r["p"], r["i"]) != (0, 0, 0):
            for frag in ("@", "555-", "10.0", "192.168", "8.8.8.8"):
                assert frag not in r["red"], r["red"]
    # Redaction is idempotent: placeholders contain no redactable text.
    twice = df.select(redact_pii(redact_pii(F.col("s"))).alias("r2"),
                      redact_pii(F.col("s")).alias("r1")).collect()
    for r in twice:
        assert r["r1"] == r["r2"]


def test_redact_pii_word_boundaries(spark):
    """Version strings and decimals must NOT be flagged as phone/IP."""
    df = spark.createDataFrame(
        [("pi is 3.14 and version 1.2.3 beats 1.2.3.4.5",)], "s string"
    )
    c = pii_counts(F.col("s"))
    row = df.select(c["n_phone"].alias("np"), c["n_ipv4"].alias("ni")).first()
    assert row["np"] == 0
    # 1.2.3.4.5 contains a 4-octet prefix — flagged; 1.2.3 and 3.14 are not.
    assert row["ni"] == 1


def test_split_column_is_stable_and_exhaustive(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = df.select("doc_id", split_column(F.col("doc_id")).alias("s"))
    counts = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    # 80/10/10 within loose tolerance at n=500
    assert counts["train"] > 300 and counts["val"] > 10 and counts["test"] > 10
    # Stable: same ids → same labels across a re-evaluation and a repartition.
    a = {r["doc_id"]: r["s"] for r in out.collect()}
    b = {r["doc_id"]: r["s"] for r in out.repartition(7).collect()}
    assert a == b


def test_global_shuffle_permutation_properties(spark, tmp_path):
    """(shard, pos) is a bijection onto per-shard dense ranks and is
    independent of input partitioning."""
    from mysql_postgres_debezium_cdc_spark.llm.dedup import _feature_id
    from mysql_postgres_debezium_cdc_spark.llm.splits import SHUFFLE_SEED
    from pyspark.sql import Window

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    h = _feature_id(F.concat(F.lit(f"shuffle:{SHUFFLE_SEED}:"), F.col("doc_id").cast("string")))
    hashed = df.select("doc_id", h.alias("h"), (h % N_SHARDS).alias("shard"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    out = hashed.withColumn("pos", F.row_number().over(w))
    rows = out.collect()
    assert len(rows) == 300
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    again = {(r["doc_id"], r["shard"], r["pos"]) for r in out.repartition(13).collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}


def test_contamination_flags_planted_overlap(spark, tmp_path):
    """A training doc sharing >= half its 3-gram shingles with an eval
    doc is flagged; a disjoint doc is absent from the report."""
    from mysql_postgres_debezium_cdc_spark.llm.contamination import (
        EVAL_MOD,
        dq_contamination_ngram_overlap,
    )

    eval_text = "alpha beta gamma delta epsilon zeta"
    near_copy = "alpha beta gamma delta epsilon other"  # 3 of 4 shingles shared
    disjoint = "one two three four five six"
    rows = [
        (0 * EVAL_MOD, eval_text),  # eval member (doc_id % EVAL_MOD == 0)
        (1, near_copy),
        (2, disjoint),
    ]
    p = str(tmp_path / "sf-contam")
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text").cast("long")
    ).write.mode("overwrite").parquet(p + "/documents.parquet")

    got = {r["doc_id"]: r for r in dq_contamination_ngram_overlap(spark, p).collect()}
    assert 2 not in got  # disjoint doc: zero overlap rows
    assert 0 not in got  # eval docs are never reported as contaminated
    assert got[1]["n_overlap"] == 3 and got[1]["n_shingles"] == 4
    assert got[1]["flag_contaminated"] == 1


def test_minhash_incremental_equals_cross_slice_of_full_run(spark):
    """Band signatures are per-document, so a (batch, index) pair
    collides in the split incremental probe iff it collides in the
    full-corpus LSH run; verification math is identical.  The
    incremental output must therefore equal the full run's pairs
    restricted to exactly-one-side-in-batch (in either orientation),
    jaccard values included — and every reported pair must straddle
    the cohort."""
    from mysql_postgres_debezium_cdc_spark.llm.dedup import INCR_MOD, INCR_REM
    from mysql_postgres_debezium_cdc_spark.registry import all_queries

    sf = "/root/testdata/sf0.01"
    full = all_queries()["dedup_minhash_lsh"].fn(spark, sf).collect()
    incr = all_queries()["dedup_minhash_incremental"].fn(spark, sf).collect()

    def in_batch(d):
        return d % INCR_MOD == INCR_REM

    expected = {}
    for r in full:
        a, b = r["doc_a"], r["doc_b"]
        if in_batch(a) != in_batch(b):
            new, dup = (a, b) if in_batch(a) else (b, a)
            expected[(new, dup)] = r["jaccard"]
    got = {(r["new_doc"], r["dup_doc"]): r["jaccard"] for r in incr}
    assert got == expected
    assert all(in_batch(n) and not in_batch(d) for n, d in got)


def test_stream_incremental_dedup_runs_real_micro_batches(spark):
    """The streaming twin must drain MULTIPLE genuine micro-batches
    (maxFilesPerTrigger=1 over the range-split slices) and its union
    must equal the one-shot batch probe exactly."""
    from mysql_postgres_debezium_cdc_spark.llm import dedup
    from mysql_postgres_debezium_cdc_spark.registry import all_queries
    from mysql_postgres_debezium_cdc_spark.scratch import materialize_once

    sf = "/root/testdata/sf0.01"
    stream = all_queries()["stream_incremental_dedup"].fn(spark, sf)
    batch = all_queries()["dedup_minhash_incremental"].fn(spark, sf)
    assert sorted(map(tuple, stream.collect())) == sorted(
        map(tuple, batch.collect())
    )

    # the staged slice layout the stream just drained really is
    # multi-file — one parquet per micro-batch (materialize_once is a
    # no-op write_fn here because the stream run above built it)
    import glob

    slices = materialize_once(sf, "mh_stream_slices", lambda p: None)
    files = [f for f in glob.glob(f"{slices}/part-*") if f.endswith(".parquet")]
    assert len(files) == dedup.STREAM_DEDUP_SLICES
