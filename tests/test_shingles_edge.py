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
