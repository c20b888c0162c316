"""Short/empty-document edge parity (ADVICE r5, both medium items).

Zero-token documents are a DESIGNED output of dedup_boilerplate_removal,
so any composed pipeline can feed them into downstream text operators.
The two operators that generate per-position / per-gram rows from a
token count must agree with their oracles on the degenerate lengths:

- corpus_span_corruption_plan: sequence(0, n_tokens-1) with n_tokens=0
  used to yield a DESCENDING [0, -1] array (phantom positions) and an
  ANSI DIVIDE_BY_ZERO at the mask_ratio division, while the oracle's
  RANGE(0, 0) silently dropped the doc.
- text_ngram_novelty: greatest(n-K+1, 1) used to emit one PARTIAL gram
  per short doc while the oracle's RANGE upper bound emitted none.

Both now pin the oracle semantic: no rows for the degenerate docs.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mysql_postgres_debezium_cdc_spark.registry import all_queries
from mysql_postgres_debezium_cdc_spark.sources.parquet import TABLES
from tests.conftest import SF_DIR_ORACLE
from tests.parity import compare, duck_connection

# doc_id, text — lengths 0 (empty string), 0 (whitespace only), 1, 2,
# exactly NOVELTY_K=3, and a normal doc.  n_chars kept consistent.
DOCS = [
    (0, ""),
    (1, "   "),
    (2, "alpha"),
    (3, "alpha beta"),
    (4, "alpha beta gamma"),
    (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
]


@pytest.fixture(scope="module")
def short_doc_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("short_docs_sf")
    for t in TABLES:
        schema = pq.read_schema(f"{SF_DIR_ORACLE}/{t}.parquet")
        if t == "documents":
            tbl = pa.table(
                {
                    "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                    "text": pa.array([s for _, s in DOCS], pa.string()),
                    "lang": pa.array(["en"] * len(DOCS), pa.string()),
                    "source": pa.array(["edge"] * len(DOCS), pa.string()),
                    "n_chars": pa.array([len(s) for _, s in DOCS], pa.int64()),
                }
            ).cast(schema.remove_metadata())
        else:
            tbl = schema.empty_table()
        pq.write_table(tbl, str(base / f"{t}.parquet"))
    return str(base)


@pytest.mark.parametrize(
    "key", ["corpus_span_corruption_plan", "text_ngram_novelty"]
)
def test_degenerate_doc_parity(spark, short_doc_dir, key):
    spec = all_queries()[key]
    sdf = spec.fn(spark, short_doc_dir)
    duck = duck_connection(short_doc_dir).execute(spec.oracle).df()
    assert compare(sdf, duck) == []


def test_span_corruption_drops_zero_token_docs(spark, short_doc_dir):
    rows = (
        all_queries()["corpus_span_corruption_plan"]
        .fn(spark, short_doc_dir)
        .collect()
    )
    ids = [r["doc_id"] for r in rows]
    assert 0 not in ids and 1 not in ids  # empty + whitespace-only dropped
    assert set(ids) == {2, 3, 4, 5}
    by_id = {r["doc_id"]: r for r in rows}
    # every emitted row has sane bounds: 0 <= masked <= n_tokens
    for r in rows:
        assert 0 <= r["n_masked"] <= r["n_tokens"]
        assert r["mask_ratio"] is not None


def test_novelty_emits_no_partial_grams(spark, short_doc_dir):
    rows = (
        all_queries()["text_ngram_novelty"].fn(spark, short_doc_dir).collect()
    )
    ids = {r["doc_id"] for r in rows}
    # docs with < K=3 tokens emit nothing; the 3-token doc emits 1 gram
    assert ids == {4, 5}
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[4]["n_grams"] == 1
    assert by_id[5]["n_grams"] == 8  # 10 tokens -> 10-3+1 distinct grams


MOJI_DOCS = [
    (0, "perfectly clean ascii text"),
    (1, "bad decode Ã©tÃ© here"),        # 2 'Ã' mojibake markers
    (2, "smart quote â€™ and dash â€”"),  # 2 'â€' markers
    (3, "lost bytes �� end"),   # 2 replacement chars
    (4, "bell \x07 and nul-ish \x1f"),    # 2 control chars
    (5, "mixed Ã‚Â badness �"),      # 1 'Ã' + 2 'Â' + 1 replacement
]


@pytest.fixture(scope="module")
def moji_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("moji_sf")
    for t in TABLES:
        schema = pq.read_schema(f"{SF_DIR_ORACLE}/{t}.parquet")
        if t == "documents":
            tbl = pa.table(
                {
                    "doc_id": pa.array([d for d, _ in MOJI_DOCS], pa.int64()),
                    "text": pa.array([s for _, s in MOJI_DOCS], pa.string()),
                    "lang": pa.array(["en"] * len(MOJI_DOCS), pa.string()),
                    "source": pa.array(
                        ["clean", "web", "web", "ocr", "ocr", "web"], pa.string()
                    ),
                    "n_chars": pa.array([len(s) for _, s in MOJI_DOCS], pa.int64()),
                }
            ).cast(schema.remove_metadata())
        else:
            tbl = schema.empty_table()
        pq.write_table(tbl, str(base / f"{t}.parquet"))
    return str(base)


def test_encoding_quality_detects_injected_corruption(spark, moji_dir):
    """Each marker class is counted exactly on the corrupted fixture,
    clean docs stay clean, and the DuckDB oracle agrees on the same
    bytes (the cross-engine string-length contract)."""
    spec = all_queries()["text_encoding_quality"]
    sdf = spec.fn(spark, moji_dir)
    duck = duck_connection(moji_dir).execute(spec.oracle).df()
    assert compare(sdf, duck) == []

    by_src = {r["source"]: r for r in sdf.collect()}
    assert by_src["clean"]["n_suspect"] == 0
    assert by_src["clean"]["n_mojibake_markers"] == 0
    # web: doc1 (2 'Ã') + doc2 (2 'â€') + doc5 ("Ã‚Â" = Ã + U+201A + Â
    # -> 1 'Ã' + 1 'Â'), and doc5 carries 1 replacement char
    assert by_src["web"]["n_docs"] == 3
    assert by_src["web"]["n_suspect"] == 3
    assert by_src["web"]["n_mojibake_markers"] == 2 + 2 + 2
    assert by_src["web"]["n_replacement_chars"] == 1
    # ocr: doc3 (2 replacement) + doc4 (2 control)
    assert by_src["ocr"]["n_suspect"] == 2
    assert by_src["ocr"]["n_replacement_chars"] == 2
    assert by_src["ocr"]["n_control_chars"] == 2
