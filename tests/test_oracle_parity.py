"""The primary correctness gate: every registered query with an oracle
must match DuckDB on sf0.01 — the exact comparison the driver runs."""

from __future__ import annotations

import pytest

from mysql_postgres_debezium_cdc_spark.registry import all_queries
from tests.conftest import SF_DIR_ORACLE
from tests.parity import compare, complex_type_fields, duck_connection

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
    bad = complex_type_fields(spark_df.schema)
    assert not bad, (
        f"{name}: complex-typed output column(s) {bad} — the driver's "
        "canonicalizer cannot hash array/map/struct cells; serialize them"
    )
    duck_df = duck.execute(spec.oracle).fetchdf()
    errors = compare(spark_df, duck_df)
    assert not errors, f"{name}: " + " | ".join(errors)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR_ORACLE)
    assert not complex_type_fields(df.schema)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_parity_harness_detects_mismatch(spark):
    """Canary for the comparison harness itself: a deliberately
    perturbed result must FAIL the compare — otherwise every green
    parity row above is meaningless."""
    import pyspark.sql.functions as F

    from mysql_postgres_debezium_cdc_spark.registry import all_queries
    from tests.conftest import SF_DIR_ORACLE
    from tests.parity import compare, duck_connection

    spec = all_queries()["dedup_fingerprint"]
    con = duck_connection(SF_DIR_ORACLE)
    oracle = con.sql(spec.oracle).df()
    good = spec.fn(spark, SF_DIR_ORACLE)
    assert not compare(good, oracle)
    # value perturbation → caught
    assert compare(good.withColumn("n_docs", F.col("n_docs") + 1), oracle)
    # row-drop perturbation → caught
    assert compare(good.limit(1), oracle)
    # schema perturbation → caught
    assert compare(good.withColumnRenamed("n_docs", "n"), oracle)
    con.close()


def test_complex_type_guard_detects_arrays(spark):
    """Canary for the no-complex-output-types guard: an array column must
    be flagged (the driver canonicalizer cannot hash ndarray cells)."""
    import pyspark.sql.functions as F

    from tests.parity import complex_type_fields

    df = spark.range(1).select(
        F.lit(1).alias("k"),
        F.array(F.lit("a"), F.lit("b")).alias("xs"),
        F.create_map(F.lit("k"), F.lit(1)).alias("m"),
        F.struct(F.lit(1).alias("a")).alias("s"),
    )
    assert complex_type_fields(df.schema) == ["xs", "m", "s"]
    assert complex_type_fields(df.select("k").schema) == []
