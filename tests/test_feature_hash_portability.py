"""Property test for the portable feature-id hash (llm/dedup._feature_id).

The MinHash/SimHash oracles depend on ALL THREE evaluations of the
Horner hash — Python reference, Spark `aggregate` over split chars, and
DuckDB `LIST_REDUCE` (the `_SID_SQL` fragment) — agreeing bit-for-bit
on arbitrary strings.  Any divergence (fold init semantics, unicode vs
byte indexing, modulo sign) silently breaks every dedup value check, so
it gets its own adversarial gate.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mysql_postgres_debezium_cdc_spark.llm.dedup import MH_PRIME, _SID_SQL, _feature_id


def _horner_py(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % MH_PRIME
    return h


# Printable ASCII without the quote/backslash escaping pitfalls — the
# shingle alphabet is word characters + spaces, but test wider.
_ALPHABET = st.characters(min_codepoint=32, max_codepoint=126)
strings = st.lists(st.text(alphabet=_ALPHABET, min_size=1, max_size=40), min_size=1, max_size=20)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(strings)
def test_horner_hash_portable_spark_duckdb_python(spark, xs):
    expected = [_horner_py(s) for s in xs]

    df = spark.createDataFrame([(s,) for s in xs], "s string")
    got_spark = [r["h"] for r in df.select(_feature_id(F.col("s")).alias("h")).collect()]
    assert got_spark == expected

    con = duckdb.connect()
    sql = _SID_SQL.replace("shingle", "s")
    got_duck = [
        con.execute(f"SELECT {sql} AS h FROM (SELECT ? AS s)", [s]).fetchone()[0]
        for s in xs
    ]
    assert got_duck == expected
