"""Spark-vs-DuckDB parity checking, mirroring the driver's correctness
gate (row count + schema + order-insensitive value comparison)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from mysql_postgres_debezium_cdc_spark.sources.parquet import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()

    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            return f"{v:.6f}"
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(canon(x) for x in v) + "]"
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    for c in df.columns:
        df[c] = df[c].map(canon)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def complex_type_fields(schema) -> list[str]:
    """Names of output fields typed array/map/struct.

    The DRIVER's canonicalizer (unlike ``normalize`` above, which
    string-serializes) factorizes object columns with pandas and cannot
    hash ndarray cells — an array-typed output column is un-certifiable
    even when values match (r6's one red row, ``agg_collect_sorted``).
    Every registered query must therefore emit scalar columns only;
    serialize lists with ``array_join`` / ``ARRAY_TO_STRING``.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def compare(spark_df, duck_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    errors: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(duck_df.columns):
        errors.append(f"schema: spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}")
        return errors
    if len(sp) != len(duck_df):
        errors.append(f"rowcount: spark={len(sp)} duck={len(duck_df)}")
        return errors
    a, b = normalize(sp), normalize(duck_df)
    neq = (a != b).any(axis=1)
    if neq.any():
        idx = neq[neq].index[:5]
        for i in idx:
            errors.append(f"row {i}: spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}")
    return errors
