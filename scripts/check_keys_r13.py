#!/usr/bin/env python
"""Value-check the given registry keys against their DuckDB oracles at
all three fixture scales: `python scripts/check_keys_r13.py key [key ...]`.
The per-change parity gate of the r13 optimization round."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mysql_postgres_debezium_cdc_spark.registry import all_queries
from mysql_postgres_debezium_cdc_spark.session import get_session
from tests.parity import compare, duck_connection


def main() -> int:
    keys = sys.argv[1:]
    specs = all_queries()
    spark = get_session("check-keys-r13")
    bad = 0
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        con = duck_connection(sf_dir)
        for name in keys:
            spec = specs[name]
            try:
                errors = compare(spec.fn(spark, sf_dir), con.sql(spec.oracle).df())
            except Exception as ex:  # noqa: BLE001
                errors = ["EXC: " + str(ex)[:300]]
            spark.catalog.clearCache()
            status = "OK" if not errors else f"FAIL {errors[0][:200]}"
            if errors:
                bad += 1
            print(f"{sf_dir.rsplit('/',1)[-1]:8s} {name:40s} {status}", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
