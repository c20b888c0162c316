"""Central query registry.

Every operator in the engine registers itself here as a named query:
``fn(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a DuckDB
oracle SQL string over the same parquet tables.  The driver harness
(``__spark_entry__.py``) exposes this registry; tests iterate it.

Determinism rules every registered query must follow (SURVEY.md §5.2):

- Alias every computed column identically in Spark and oracle SQL — the
  driver sorts columns by name before value-hashing.
- Every LIMIT / top-k has a total ORDER BY (unique tie-break key), else the
  two engines may legitimately pick different ties.
- Float aggregates are rounded (default 2dp) in BOTH engines; double
  summation order differs between engines so raw sums are not hash-stable.
- Timestamps in output are cast to DATE or epoch BIGINT; session timezone
  is pinned to UTC by ``ensure_session_confs``.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def ensure_session_confs(spark: SparkSession) -> None:
    """Pin the session confs correctness depends on.

    The driver hands us its own SparkSession; timezone and ANSI behavior
    must not depend on its defaults.  These are runtime-settable confs.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, wrapped, oracle, tuple(tags), bench)
        return wrapped

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are side-effecting: each module registers its queries.
    from mysql_postgres_debezium_cdc_spark import functions, llm, operators, plans, sources, streaming  # noqa: F401

    _LOADED = True


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def query_fns() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_map() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }


def bench_queries() -> dict[str, QuerySpec]:
    return {name: spec for name, spec in all_queries().items() if spec.bench}
