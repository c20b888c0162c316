"""Skew mitigation: salted aggregation and salted join.

AQE's skew-join split handles moderate skew at runtime; salting is the
explicit lever when one key dominates (the classic power-law user_id or
hot shingle).  Both helpers keep results IDENTICAL to the unsalted form
— verified by the DuckDB oracles below — they only change the shuffle's
key space.

- ``salted_partial_agg``: groupBy(key) → groupBy(key, salt) partial +
  groupBy(key) final.  The hot key's rows spread over ``n_salts``
  reducers in round 1; round 2 combines ``n_salts`` partial rows per
  key — O(keys × salts), tiny.  This is exactly what map-side partial
  aggregation already does per-partition; explicit salting adds the
  *reducer*-side spread that partial agg alone cannot give when one key
  exceeds a single reducer's capacity.
- ``salted_join``: big skewed side gets a random-ish deterministic salt
  in [0, n); the small side is replicated n× with every salt value, and
  the join key becomes (key, salt).  The hot key's probe rows land on n
  different reducers instead of one.  Replication multiplies the small
  side by n — use only when the small side × n is still comfortably
  shuffle-able (or broadcast would have been used anyway).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load

SALT_COL = "_salt"


def _salt_of(cols: Sequence[str], n_salts: int) -> Column:
    """Deterministic per-row salt (hash of the whole row's identity
    columns) — deterministic so retries/replays land identically."""
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def salted_partial_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, Column],
    salt_src_cols: Sequence[str],
    n_salts: int = 16,
    combiners: dict[str, Column] | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.  ``aggs`` maps output name → a
    partial aggregate expression; partials combine with ``combiners``
    (same name → combining expression over the partial column), default
    ``F.sum`` — correct for sum/count.  min/max callers pass
    ``combiners={"m": F.min("m")}`` etc.; avg must be decomposed into
    sum+count by the caller (not a commutative monoid on its own)."""
    salted = df.withColumn(SALT_COL, _salt_of(salt_src_cols, n_salts))
    partial = salted.groupBy(*key_cols, SALT_COL).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    combiners = combiners or {}
    final = partial.groupBy(*key_cols).agg(
        *[combiners.get(name, F.sum(name)).alias(name) for name in aggs]
    )
    return final


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with the big (skewed) side salted and the small
    side replicated n_salts×.

    The salt must vary WITHIN a key (a key-derived salt would send the
    hot key to one reducer again), so it hashes the whole row."""
    big_s = big.withColumn(SALT_COL, _salt_of(big.columns, n_salts))
    # replicate small side once per salt value
    small_r = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = big_s.join(
        small_r,
        (F.col(big_key) == F.col(small_key)) & (big_s[SALT_COL] == small_r[SALT_COL]),
    )
    return joined.drop(SALT_COL)


@register(
    "agg_salted_two_phase",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("agg", "skew", "salting"),
)
def agg_salted_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over the (low-cardinality, hence
    maximally skewed) user_id key — result identical to the plain
    groupBy, shuffle spread over 16 salts per key."""
    ev = load(spark, sf_dir, "events")
    out = salted_partial_agg(
        ev,
        ["user_id"],
        {"n_events": F.count(F.lit(1)), "sum_value": F.sum("value")},
        salt_src_cols=["event_id"],
        n_salts=16,
    )
    return out.select(
        "user_id", "n_events", F.round("sum_value", 2).alias("sum_value")
    ).orderBy("user_id")


@register(
    "join_salted_skew",
    oracle="""
    SELECT e.user_id, u.event_type AS user_segment,
           COUNT(*) AS n, ROUND(SUM(e.value), 2) AS sum_value
    FROM events e
    JOIN (
      SELECT user_id, MIN(event_type) AS event_type
      FROM events GROUP BY user_id
    ) u ON e.user_id = u.user_id
    GROUP BY e.user_id, u.event_type
    ORDER BY e.user_id
    """,
    tags=("join", "skew", "salting"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join on the skewed user_id key: the dim (one row
    per user) is replicated 8×, the fact side salted — same rows out as
    the plain join, hot keys spread over 8 reducers."""
    ev = load(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(F.min("event_type").alias("user_segment"))
    joined = salted_join(
        ev.select(F.col("user_id"), F.col("value")),
        dim.select(F.col("user_id").alias("u_id"), "user_segment"),
        "user_id",
        "u_id",
        n_salts=8,
    )
    return (
        joined.groupBy("user_id", "user_segment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("user_id")
    )
