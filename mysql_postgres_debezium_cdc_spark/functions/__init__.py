"""Scalar-function surface (string/date/math/array/map/json) — all
JVM-side ``pyspark.sql.functions`` built-ins inside whole-stage codegen;
no Python UDF appears in any hot path here.
"""

from mysql_postgres_debezium_cdc_spark.functions import (  # noqa: F401
    arrays_json,
    dates,
    geo,
    maths,
    strings,
    udfs,
)
