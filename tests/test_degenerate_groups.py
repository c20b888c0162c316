"""Degenerate-input parity: the statistical operators' guard rails.

Spark 4 runs ANSI mode, where a 0.0 divisor THROWS while DuckDB returns
inf/nan — so every ratio in the statistics family guards its
denominator identically on both engines (NULL result).  This fixture
manufactures exactly the degenerate regimes the guards exist for (a
code-review finding: the shipped fixtures never produce them):

- an event_type with ZERO events before the rate-ratio cut (n1 = 0),
- a single-row lineitem group and a constant-quantity group
  (zero x-variance → undefined slope; zero variance → undefined
  moments; quartiles of a 1-row group),
- orders with a single status (1×K contingency → dof 0, undefined
  Cramér's V),
- a documents corpus with NO target-language rows (DSIR n_t = 0) where
  every token appears exactly once (Zipf fit on a flat spectrum —
  y ≡ ln(1) = 0 exactly, so both engines hit vary_n = 0 bit-exactly).

Each key must value-match its DuckDB oracle on this fixture — not
crash, not emit inf.
"""

from __future__ import annotations

import pytest

from mysql_postgres_debezium_cdc_spark.registry import all_queries
from mysql_postgres_debezium_cdc_spark.sources.parquet import TABLES
from tests.conftest import SF_DIR_ORACLE
from tests.parity import compare, duck_connection

DEGENERATE_KEYS = [
    "events_rate_ratio_test",
    "stats_regression_by_group",
    "agg_moments_sketch",
    "agg_weighted_median",
    "dq_outlier_iqr",
    "stats_chi_square_independence",
    "corpus_dsir_importance",
    "ml_naive_bayes_lang",
    "corpus_token_type_ratio",
    "text_zipf_fit",
    "dq_benford_test",
    # pre-existing keys the whole-registry degenerate sweep flagged
    # (NULL-vs-0 empty aggregates; sketch band below its resolution)
    "cdc_envelope_encode_roundtrip",
    "dedup_bloom_incremental",
    "agg_approx_percentile",
]


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = tmp_path_factory.mktemp("degenerate_sf")

    def write(name, rows):
        schema = pq.read_schema(f"{SF_DIR_ORACLE}/{name}.parquet")
        if rows:
            cols = {
                f.name: [r.get(f.name) for r in rows] for f in schema
            }
            table = pa.Table.from_pydict(cols, schema=schema)
        else:
            table = schema.empty_table()
        pq.write_table(table, str(base / f"{name}.parquet"))

    us = lambda s: s * 1_000_000  # noqa: E731 — epoch-micros helper
    jan = 1704067200  # 2024-01-01T00:00:00Z epoch seconds
    cut = jan + 15 * 86400  # 2024-01-16
    write(
        "events",
        [
            # 'signup': events on both sides of the cut (normal ratio)
            {"event_id": 0, "ts": us(jan + 10), "user_id": 1, "event_type": "signup", "value": 1.0, "props": "{}"},
            {"event_id": 1, "ts": us(cut + 10), "user_id": 1, "event_type": "signup", "value": 2.0, "props": "{}"},
            # 'launch': exists ONLY after the cut → n1 = 0 → NULL ratio
            {"event_id": 2, "ts": us(cut + 20), "user_id": 2, "event_type": "launch", "value": 3.0, "props": "{}"},
            {"event_id": 3, "ts": us(cut + 30), "user_id": 2, "event_type": "launch", "value": 4.0, "props": "{}"},
        ],
    )
    li = lambda ok, ln, flag, qty, price: {  # noqa: E731
        "l_orderkey": ok, "l_partkey": 1, "l_suppkey": 1, "l_linenumber": ln,
        "l_quantity": qty, "l_extendedprice": price, "l_discount": 0.0,
        "l_tax": 0.0, "l_returnflag": flag, "l_linestatus": "O",
        "l_shipdate": us(jan),
    }
    write(
        "lineitem",
        [
            li(1, 1, "A", 5.0, 100.0),  # single-row group
            li(2, 1, "B", 7.0, 100.0),  # constant-quantity group…
            li(2, 2, "B", 7.0, 200.0),
            li(2, 3, "B", 7.0, 300.0),
            li(3, 1, "C", 1.0, 100.0),  # normal group
            li(3, 2, "C", 2.0, 250.0),
            li(3, 3, "C", 9.0, 975.5),
        ],
    )
    write(
        "orders",
        [
            {"o_orderkey": k, "o_custkey": 1, "o_orderstatus": "F",
             "o_totalprice": p, "o_orderdate": us(jan),
             "o_orderpriority": pr}
            for k, (p, pr) in enumerate(
                [(123.0, "1-URGENT"), (456.0, "2-HIGH"), (789.0, "1-URGENT")]
            )
        ],
    )
    write(
        "documents",
        [
            # no 'en' rows at all → DSIR target slice is EMPTY;
            # every token unique corpus-wide → flat Zipf spectrum
            {"doc_id": 0, "text": "alpha beta gamma", "lang": "fr", "source": "s1", "n_chars": 16},
            {"doc_id": 1, "text": "delta epsilon", "lang": "de", "source": "s1", "n_chars": 13},
            {"doc_id": 5, "text": "zeta eta theta iota", "lang": "fr", "source": "s2", "n_chars": 19},
        ],
    )
    for t in TABLES:
        if t not in ("events", "lineitem", "orders", "documents"):
            write(t, [])
    return str(base)


@pytest.mark.parametrize("name", DEGENERATE_KEYS)
def test_degenerate_parity(spark, degenerate_dir, name):
    spec = all_queries()[name]
    con = duck_connection(degenerate_dir)
    try:
        errors = compare(spec.fn(spark, degenerate_dir), con.sql(spec.oracle).df())
    finally:
        con.close()
    assert not errors, errors[:3]
