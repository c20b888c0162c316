#!/usr/bin/env python
"""Dump `.explain("formatted")` for bench queries into plans/r12/.

Usage: python scripts/dump_formatted_plans.py <suffix> [key ...]
Writes plans/r12/<key>_<suffix>.txt for each requested bench key
(default: all bench keys).  The optimization-round judge checks plan
claims against these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mysql_postgres_debezium_cdc_spark.registry import bench_queries
from mysql_postgres_debezium_cdc_spark.session import get_session


def main() -> None:
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(__file__), "..", "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("plan-dump-formatted")
    specs = bench_queries()
    for name in keys or sorted(specs):
        df = specs[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        spark.catalog.clearCache()
        print(name, flush=True)


if __name__ == "__main__":
    main()
