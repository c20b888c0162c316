"""Property tests for the exact-integer selection rules in
operators/stats.py: the weighted-median and quartile cut rules must
match a single-threaded reference scan for ANY multiset of values —
the distributed window/aggregate plan is an implementation detail the
properties must not see.  (Derandomized, the r5 suite contract.)"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window

values_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-1000, max_value=1000),  # value (cents)
        st.integers(min_value=1, max_value=20),  # weight
    ),
    min_size=1,
    max_size=40,
)


def ref_weighted_median(pairs):
    """Reference scan: smallest v whose cumulative weight doubles to at
    least the total (lower weighted median) over the SORTED values."""
    agg: dict[int, int] = {}
    for v, w in pairs:
        agg[v] = agg.get(v, 0) + w
    total = sum(agg.values())
    cum = 0
    for v in sorted(agg):
        cum += agg[v]
        if 2 * cum >= total:
            return v
    raise AssertionError("unreachable: weights are positive")


def ref_quartiles(vals):
    """Reference scan: rank-based lower quartiles — smallest v with
    4*rank >= n (q1) / 4*rank >= 3n (q3) over the sorted multiset."""
    s = sorted(vals)
    n = len(s)
    q1 = next(v for i, v in enumerate(s, 1) if 4 * i >= n)
    q3 = next(v for i, v in enumerate(s, 1) if 4 * i >= 3 * n)
    return q1, q3


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(pairs=values_strategy)
def test_weighted_median_rule_matches_reference_scan(spark, pairs):
    df = spark.createDataFrame(pairs, "v bigint, w bigint")
    vals = df.groupBy("v").agg(F.sum("w").alias("w"))
    part = Window.partitionBy()
    cum = vals.select(
        "v",
        F.sum("w").over(part.orderBy("v")).alias("cw"),
        F.sum("w").over(part).alias("tw"),
    )
    got = (
        cum.where(F.col("cw") * 2 >= F.col("tw"))
        .agg(F.min("v").alias("wm"))
        .collect()[0]["wm"]
    )
    assert got == ref_weighted_median(pairs)


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(vals=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40))
def test_iqr_quartile_rule_matches_reference_scan(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    w = Window.partitionBy()
    ranked = df.select(
        "v",
        F.row_number().over(w.orderBy("v")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    row = ranked.agg(
        F.min(F.when(F.col("rn") * 4 >= F.col("n"), F.col("v"))).alias("q1"),
        F.min(F.when(F.col("rn") * 4 >= 3 * F.col("n"), F.col("v"))).alias("q3"),
    ).collect()[0]
    assert (row["q1"], row["q3"]) == ref_quartiles(vals)


@settings(max_examples=6, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(
    days=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # day index
            st.integers(min_value=-10_000, max_value=10_000),  # rev cents
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
def test_moving_median_frame_matches_reference_scan(spark, days):
    """The 7-day RANGE frame + integer half-up midpoint rule of
    `window_moving_median` must equal a single-threaded scan over any
    sparse daily series (gaps in the calendar shrink the frame — the
    RANGE semantics a row-based frame would get wrong)."""
    df = spark.createDataFrame(days, "d bigint, cents bigint")
    w = Window.orderBy("d").rangeBetween(-6, 0)
    frame = df.select("d", F.array_sort(F.collect_list("cents").over(w)).alias("vals"))
    n = F.size("vals")
    hi = F.element_at("vals", (n / 2 + 1).cast("int"))
    lo = F.element_at("vals", ((n + 1) / 2).cast("int"))
    got = {
        r["d"]: r["m"]
        for r in frame.select("d", F.floor((lo + hi + 1) / 2).alias("m")).collect()
    }
    expected = {}
    by_day = dict(days)
    for d in by_day:
        window_vals = sorted(v for dd, v in by_day.items() if d - 6 <= dd <= d)
        k = len(window_vals)
        lo_v = window_vals[(k + 1) // 2 - 1]
        hi_v = window_vals[k // 2]
        expected[d] = (lo_v + hi_v + 1) // 2
    assert got == expected
