"""The primary correctness gate: every registered query with an oracle
must match DuckDB on sf0.01 — the exact comparison the driver runs."""

from __future__ import annotations

import pytest

from mysql_postgres_debezium_cdc_spark.registry import all_queries
from tests.conftest import SF_DIR_ORACLE
from tests.parity import compare, duck_connection

SPECS = all_queries()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, duck, name):
    spec = SPECS[name]
    spark_df = spec.fn(spark, SF_DIR_ORACLE)
    duck_df = duck.execute(spec.oracle).fetchdf()
    errors = compare(spark_df, duck_df)
    assert not errors, f"{name}: " + " | ".join(errors)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
