"""sf0.1 parity smoke: value-check a representative slice of heavy
queries at 10× the oracle scale — catches scale-dependent bugs (int
overflow, skew-sensitive formulations, threshold effects) that sf0.01
can't see.  The full corpus runs at sf0.01 in test_oracle_parity.py."""

from __future__ import annotations

import pytest

from mysql_postgres_debezium_cdc_spark.registry import all_queries
from tests.parity import compare, duck_connection

SF_DIR = "/root/testdata/sf0.1"

HEAVY_SLICE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q8_market_share",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q21_waiting_supplier",
    "join_sort_merge",
    "agg_salted_two_phase",
    "stream_tumbling_window",
    "cdc_lastwrite_materialize",
    "dedup_fingerprint",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "ann_bruteforce_topk",
    # late-r4 additions with scale-sensitive shapes
    "ann_ivfpq_topk",
    "text_vocab_head_coverage",
    "dedup_ngram_containment",
    "cdc_scd2_point_in_time_join",
    "corpus_reservoir_per_group",
]


@pytest.fixture(scope="module")
def duck01():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", HEAVY_SLICE)
def test_sf01_parity(spark, duck01, name):
    spec = all_queries()[name]
    assert spec.oracle, f"{name} has no oracle"
    errors = compare(spec.fn(spark, SF_DIR), duck01.execute(spec.oracle).fetchdf())
    assert not errors, f"{name}@sf0.1: " + " | ".join(errors)
