#!/usr/bin/env python
"""Value-check EVERY registry key against its DuckDB oracle at an
arbitrary fixture scale: `python scripts/sweep_parity.py [sf_dir]`.

The in-suite gates run the full registry at sf0.01 (the driver's scale)
plus curated slices at sf0.001/sf0.1; this sweep is the exhaustive
cross-scale audit.  It has caught two real latent flakes the sf0.01
gate could not see: percentile interpolation midpoints at sf0.001
(two-element groups) and a .005 double-rounding tie in
project_arithmetic at sf0.1 — both fixed with exact integer/decimal
arithmetic (see PLANS.md)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mysql_postgres_debezium_cdc_spark.registry import all_queries
from mysql_postgres_debezium_cdc_spark.session import get_session
from tests.parity import compare, duck_connection


def sweep(spark, sf_dir: str) -> list[tuple[str, str]]:
    con = duck_connection(sf_dir)
    bad = []
    for name, spec in all_queries().items():
        if spec.oracle is None:
            continue
        try:
            errors = compare(spec.fn(spark, sf_dir), con.sql(spec.oracle).df())
            if errors:
                bad.append((name, errors[0][:200]))
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            bad.append((name, "EXC: " + str(ex)[:200]))
        spark.catalog.clearCache()
    print(f"swept {sf_dir}: failures={len(bad)}", flush=True)
    for name, err in bad:
        print(f"  {name}: {err}", flush=True)
    return bad


def main() -> int:
    # Accepts any number of fixture dirs (the documented
    # `sf{0.001,0.1}` brace-expansion invocation) and sweeps each.
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    spark = get_session("sweep-parity")
    total_bad = 0
    for sf_dir in sf_dirs:
        total_bad += len(sweep(spark, sf_dir))
    return 1 if total_bad else 0


if __name__ == "__main__":
    sys.exit(main())
