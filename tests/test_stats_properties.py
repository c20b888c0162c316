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


two_sample_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),  # value (cents)
        st.booleans(),  # True = sample A, False = sample B
    ),
    min_size=0,
    max_size=60,
)


def _rank_cum_relation(spark, rows):
    """The distinct-value + cumulative-count decomposition both rank
    statistics are built on (the engine formulation, minus I/O)."""
    df = spark.createDataFrame(
        [(v, 1 if a else 0, 0 if a else 1) for v, a in rows],
        "v bigint, ca bigint, cb bigint",
    )
    return df.groupBy("v").agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(rows=two_sample_strategy)
def test_mann_whitney_doubled_rank_sum_matches_midrank_scan(spark, rows):
    """The engine's 2·R_a = Σ ca·(2·cum_before + t + 1) identity must
    equal the textbook midrank sum computed by a single-threaded scan,
    for ANY two-sample multiset — ties, empty sides, all-one-side."""
    if not rows:
        return
    vals = _rank_cum_relation(spark, rows)
    t = F.col("ca") + F.col("cb")
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = vals.select(
        "ca", t.alias("t"), F.coalesce(F.sum(t).over(w), F.lit(0)).alias("before")
    )
    got = cum.agg(
        F.coalesce(
            F.sum(F.col("ca") * (2 * F.col("before") + F.col("t") + 1)), F.lit(0)
        ).alias("r2x")
    ).collect()[0]["r2x"]

    # reference: explicit midranks over the sorted pooled multiset
    pooled = sorted(v for v, _ in rows)
    mid = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        mid[pooled[i]] = (i + 1 + j) / 2
        i = j
    ra = sum(mid[v] for v, a in rows if a)
    assert got == round(2 * ra)


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(rows=two_sample_strategy)
def test_ks_numerator_matches_brute_force_cdf_scan(spark, rows):
    """The engine's max|c1·n2 − c2·n1| over the merged grid must equal
    the brute-force max CDF gap for ANY two-sample multiset."""
    a = sorted(v for v, s in rows if s)
    b = sorted(v for v, s in rows if not s)
    if not a and not b:
        return
    vals = _rank_cum_relation(spark, rows)
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = vals.select(
        F.sum("ca").over(wcum).alias("c1"),
        F.sum("cb").over(wcum).alias("c2"),
        F.sum("ca").over(wall).alias("t1"),
        F.sum("cb").over(wall).alias("t2"),
    )
    got = cum.agg(
        F.max(
            F.abs(F.col("c1") * F.col("t2") - F.col("c2") * F.col("t1"))
        ).alias("d")
    ).collect()[0]["d"]

    import bisect

    n1, n2 = len(a), len(b)
    grid = sorted(set(a) | set(b))
    ref = max(
        abs(bisect.bisect_right(a, v) * n2 - bisect.bisect_right(b, v) * n1)
        for v in grid
    )
    assert got == ref


signed_counts_strategy = st.lists(
    st.tuples(
        # SIGNED values — the fixtures' cent domains are nonnegative, so
        # without this the banding's negative branch would never run
        st.integers(min_value=-(2**40), max_value=2**40),
        st.integers(min_value=0, max_value=5),  # ca
        st.integers(min_value=0, max_value=5),  # cb
    ),
    min_size=0,
    max_size=30,
    unique_by=lambda t: t[0],
)


@settings(max_examples=10, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(rows=signed_counts_strategy)
def test_banded_rank_cums_equal_naive_global_window(spark, rows):
    """_banded_rank_cums (the r8 distributed two-phase prefix sum) must
    be BIT-IDENTICAL to the naive unpartitioned ORDER BY v window for
    any signed distinct-value relation — including negative values and
    magnitudes past 2^32, which no fixture produces (event cents are
    nonnegative): the signed-bit-length bands must order and partition
    the full BIGINT axis correctly."""
    from mysql_postgres_debezium_cdc_spark.operators.stats import (
        _banded_rank_cums,
    )

    rows = [r for r in rows if r[1] + r[2] > 0]
    if not rows:
        return
    vals = spark.createDataFrame(rows, "v bigint, ca bigint, cb bigint")
    got = {
        r["v"]: (r["before"], r["c1"], r["c2"], r["t1"], r["t2"])
        for r in _banded_rank_cums(vals).collect()
    }
    rows.sort()
    t1 = sum(ca for _, ca, _ in rows)
    t2 = sum(cb for _, _, cb in rows)
    before = c1 = c2 = 0
    for v, ca, cb in rows:
        c1 += ca
        c2 += cb
        assert got[v] == (before, c1, c2, t1, t2), (v, got[v])
        before += ca + cb


# ---------------------------------------------------------------------------
# OLS normal-equation identities (the r7 ADVICE finding: engine and
# oracle shared a WRONG Cramer cofactor in det_b1, so oracle parity was
# structurally blind to it.  These tests solve the normal equations
# EXACTLY in rational arithmetic, so a shared algebra error cannot pass.)
# ---------------------------------------------------------------------------

from fractions import Fraction


def _det3(m):
    """Exact 3x3 determinant over Fractions/ints."""
    (a, b, c), (d, e, f2), (g, h, i) = m
    return a * (e * i - f2 * h) - b * (d * i - f2 * g) + c * (d * h - e * g)


def _exact_ols(data):
    """Exact Cramer solve of the 2-regressor normal equations.

    data: list of (x1, x2, y) ints.  Returns (det, b0, b1, b2) with the
    coefficients as Fractions (None when singular)."""
    n = len(data)
    s1 = sum(x1 for x1, _, _ in data)
    s2 = sum(x2 for _, x2, _ in data)
    sy = sum(y for _, _, y in data)
    s11 = sum(x1 * x1 for x1, _, _ in data)
    s12 = sum(x1 * x2 for x1, x2, _ in data)
    s22 = sum(x2 * x2 for _, x2, _ in data)
    s1y = sum(x1 * y for x1, _, y in data)
    s2y = sum(x2 * y for _, x2, y in data)
    m = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]]
    rhs = [sy, s1y, s2y]
    det = _det3(m)
    if det == 0:
        return 0, None, None, None
    cols = []
    for j in range(3):
        mj = [row[:] for row in m]
        for i in range(3):
            mj[i][j] = rhs[i]
        cols.append(Fraction(_det3(mj), det))
    return det, cols[0], cols[1], cols[2]


def _engine_cofactors(data):
    """EXACT-arithmetic mirror of the engine's four cofactor
    expansions (operators/stats.py stats_ols_multivariate: det,
    det_b0, det_b1, det_b2) — kept textually in step with the Spark
    Column code so the algebra itself is what's under test."""
    n = len(data)
    s1 = sum(x1 for x1, _, _ in data)
    s2 = sum(x2 for _, x2, _ in data)
    sy = sum(y for _, _, y in data)
    s11 = sum(x1 * x1 for x1, _, _ in data)
    s12 = sum(x1 * x2 for x1, x2, _ in data)
    s22 = sum(x2 * x2 for _, x2, _ in data)
    s1y = sum(x1 * y for x1, _, y in data)
    s2y = sum(x2 * y for _, x2, y in data)
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det_b0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det_b1 = (
        n * (s1y * s22 - s12 * s2y)
        - s1 * (sy * s22 - s2 * s2y)
        + s2 * (sy * s12 - s1y * s2)
    )
    det_b2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    return det, det_b0, det_b1, det_b2


ks_counts_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3_000_000_000),  # n1
        st.integers(min_value=1, max_value=3_000_000_000),  # n2
        # D fraction in ppm of n1*n2 — spans insignificant → maximal
        st.integers(min_value=0, max_value=1_000_000),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(rows=ks_counts_strategy)
def test_ks_rearranged_verdict_matches_bigint_reference(spark, rows):
    """The rearranged α=0.05 verdict (d_num² > B div 10⁶, Spark's
    exact pmod floor-div) must equal the mathematically-defined
    d_num²·10⁶ > 1844164·(n1+n2)·n1·n2 computed in Python big ints —
    INCLUDING at rank-family-horizon magnitudes (n ~ 3e9, d_num ~
    9e18) where the r7 naive ×10⁶ form overflowed DECIMAL(38,0)."""
    from mysql_postgres_debezium_cdc_spark.operators.stats import (
        _dec_floordiv_1e6,
    )

    data = []
    for n1, n2, ppm in rows:
        d_num = (n1 * n2 * ppm) // 1_000_000
        want = d_num * d_num * 1_000_000 > 1844164 * (n1 + n2) * n1 * n2
        data.append((str(d_num), n1, n2, want))
    df = spark.createDataFrame(
        data, "d_num_s string, n1 bigint, n2 bigint, want boolean"
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    got = df.select(
        "want",
        (
            dec(F.col("d_num_s")) * dec(F.col("d_num_s"))
            > _dec_floordiv_1e6(
                dec(F.lit(1844164)) * (F.col("n1") + F.col("n2"))
                * F.col("n1") * F.col("n2")
            )
        ).alias("got"),
    ).collect()
    for r in got:
        assert r["got"] == r["want"], r


ols_rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=50),  # x1 (quantity)
        st.integers(min_value=0, max_value=1000),  # x2 (discount bp)
        st.integers(min_value=1, max_value=1_000_000),  # y (price cents)
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=60, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(data=ols_rows_strategy)
def test_ols_cofactor_expansion_solves_normal_equations_exactly(data):
    """Every coefficient of the engine's written cofactor expansion,
    evaluated in EXACT integer arithmetic, must equal the exact Cramer
    solution of the normal equations — for any dataset, including
    collinear/singular ones (where both must report det == 0).  This is
    the test the r7 ADVICE demanded: a shared engine+oracle algebra
    error now fails here even though oracle parity passes."""
    det_ref, b0, b1, b2 = _exact_ols(data)
    det, det_b0, det_b1, det_b2 = _engine_cofactors(data)
    assert det == det_ref
    if det == 0:
        return
    assert Fraction(det_b0, det) == b0
    assert Fraction(det_b1, det) == b1
    assert Fraction(det_b2, det) == b2


def test_ols_engine_end_to_end_matches_exact_rational_solve(spark, tmp_path):
    """The REGISTERED stats_ols_multivariate (real I/O, real Spark
    plan, double cofactors, 6dp presentation round) must agree with the
    exact rational solve on seeded random data — guards against the
    Spark Column code drifting from the algebra the pure test pins."""
    import random

    import pyarrow.parquet as pq
    import pyarrow as pa

    from mysql_postgres_debezium_cdc_spark.operators.stats import (
        stats_ols_multivariate,
    )
    from tests.conftest import SF_DIR_ORACLE

    rng = random.Random(20260815)
    schema = pq.read_schema(f"{SF_DIR_ORACLE}/lineitem.parquet")
    rows = []
    exact_inputs = {"O": [], "F": []}
    for i in range(240):
        g = "O" if i % 2 == 0 else "F"
        qty = rng.randint(1, 50)
        disc_bp = rng.randint(0, 1000)
        price_c = rng.randint(100, 99_999_999)
        exact_inputs[g].append((qty, disc_bp, price_c))
        rows.append(
            {
                "l_orderkey": i, "l_partkey": 1, "l_suppkey": 1,
                "l_linenumber": 1, "l_quantity": float(qty),
                "l_extendedprice": price_c / 100.0,
                "l_discount": disc_bp / 10000.0, "l_tax": 0.0,
                "l_returnflag": "N", "l_linestatus": g,
                "l_shipdate": 1704067200_000000,
            }
        )
    cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
    pq.write_table(
        pa.Table.from_pydict(cols, schema=schema),
        str(tmp_path / "lineitem.parquet"),
    )
    got = {
        r["l_linestatus"]: r
        for r in stats_ols_multivariate(spark, str(tmp_path)).collect()
    }
    for g, data in exact_inputs.items():
        det, b0, b1, b2 = _exact_ols(data)
        assert det != 0, "seeded random data must be non-singular"
        # presentation scale: cents→dollars for intercept/slope_qty,
        # per-bp→per-unit-fraction (×10000) then cents→dollars (÷100)
        exp = {
            "intercept": float(b0) / 100.0,
            "slope_qty": float(b1) / 100.0,
            "slope_discount": float(b2) * 100.0,
        }
        for col, want in exp.items():
            have = got[g][col]
            assert have is not None
            assert abs(have - want) <= 1e-4 * max(1.0, abs(want)), (
                g, col, have, want
            )


# ---------------------------------------------------------------------------
# Welch's t / SRM chi-square (r9): the newest experiment-battery algebra
# solved from first principles in exact rational arithmetic — the OLS
# pattern, so a shared engine+oracle algebra error cannot survive parity.
# ---------------------------------------------------------------------------

welch_samples_strategy = st.tuples(
    st.lists(st.integers(min_value=-100_000, max_value=100_000), min_size=2, max_size=30),
    st.lists(st.integers(min_value=-100_000, max_value=100_000), min_size=2, max_size=30),
)


def _welch_engine_fracs(a, b):
    """EXACT-arithmetic mirror of the engine's written expression tree
    (operators/stats.py stats_welch_ttest: power sums -> se1/se2 ->
    t^2 -> dof) — kept textually in step with the Spark Column code so
    the algebra itself is what's under test."""
    n1, n2 = len(a), len(b)
    s1, s2 = sum(a), sum(b)
    ss1, ss2 = sum(v * v for v in a), sum(v * v for v in b)
    se1 = Fraction(n1 * ss1 - s1 * s1, n1 * (n1 - 1) * n1)
    se2 = Fraction(n2 * ss2 - s2 * s2, n2 * (n2 - 1) * n2)
    m1, m2 = Fraction(s1, n1), Fraction(s2, n2)
    se = se1 + se2
    t2 = (m1 - m2) ** 2 / se if se > 0 else None
    dof_den = se1 * se1 * (n2 - 1) + se2 * se2 * (n1 - 1)
    dof = (
        se * se * (n1 - 1) * (n2 - 1) / dof_den if dof_den > 0 else None
    )
    return se1, se2, t2, dof


def _welch_reference_fracs(a, b):
    """First-principles Welch: sample variance as the literal
    sum-of-squared-deviations definition, standard errors var/n, and
    the Welch-Satterthwaite dof in its textbook (se^2/(n-1))-sum form —
    NO shared algebra with the engine's power-sum rearrangement."""
    n1, n2 = len(a), len(b)
    m1 = Fraction(sum(a), n1)
    m2 = Fraction(sum(b), n2)
    var1 = sum((v - m1) ** 2 for v in a) / Fraction(n1 - 1)
    var2 = sum((v - m2) ** 2 for v in b) / Fraction(n2 - 1)
    se1, se2 = var1 / n1, var2 / n2
    se = se1 + se2
    t2 = (m1 - m2) ** 2 / se if se > 0 else None
    den = se1**2 / (n1 - 1) + se2**2 / (n2 - 1)
    dof = se * se / den if den > 0 else None
    return se1, se2, t2, dof


@settings(max_examples=60, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(samples=welch_samples_strategy)
def test_welch_power_sum_algebra_matches_rational_reference(samples):
    """The engine's power-sum standard errors, t^2 and rearranged
    Welch-Satterthwaite dof must equal the textbook definitions in
    exact rational arithmetic for ANY two integer samples — including
    constant samples (zero variance), where both must agree the
    statistic is undefined."""
    a, b = samples
    e = _welch_engine_fracs(a, b)
    r = _welch_reference_fracs(a, b)
    for name, ev, rv in zip(("se1", "se2", "t2", "dof"), e, r):
        assert ev == rv, (name, ev, rv)


def test_welch_engine_end_to_end_matches_exact_rational_reference(spark, tmp_path):
    """The REGISTERED stats_welch_ttest (real parquet I/O, real Spark
    plan, double tree, 4dp/2dp presentation rounds) must agree with the
    exact rational reference on seeded random data."""
    import math
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysql_postgres_debezium_cdc_spark.operators.stats import stats_welch_ttest

    rng = random.Random(20260815)
    cents = {"purchase": [], "click": []}
    rows = []
    for i in range(300):
        et = "purchase" if i % 3 == 0 else "click"
        c = rng.randint(-50_000, 150_000)
        cents[et].append(c)
        rows.append((i, 1704067200_000000 + i * 1_000_000, i % 17, et, c / 100.0, "{}"))
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))

    got = stats_welch_ttest(spark, str(tmp_path)).collect()[0]
    a, b = cents["purchase"], cents["click"]
    _, _, t2, dof = _welch_reference_fracs(a, b)
    m1, m2 = Fraction(sum(a), len(a)), Fraction(sum(b), len(b))
    t_ref = math.copysign(math.sqrt(float(t2)), float(m1 - m2))
    assert got["n_purchase"] == len(a) and got["n_click"] == len(b)
    assert abs(got["mean_diff"] - float(m1 - m2) / 100.0) <= 1e-3
    assert abs(got["t_stat"] - t_ref) <= 1e-3 * max(1.0, abs(t_ref))
    assert abs(got["dof"] - float(dof)) <= 0.02 + 1e-4 * float(dof)
    assert got["significant_05"] == (abs(round(t_ref, 4)) >= 1.96)


srm_counts_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3_000_000_000_000),  # nt
        st.integers(min_value=0, max_value=3_000_000_000_000),  # nc
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=60, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(rows=srm_counts_strategy)
def test_srm_chi2_collapse_matches_two_cell_first_principles(rows):
    """The (nt-nc)^2/(nt+nc) closed form the engine AND oracle share
    must equal the literal two-cell goodness-of-fit sum
    sum((obs-exp)^2/exp) with exp = total/2, in exact rationals, and
    the integer verdict (nt-nc)^2 * 1e6 > C * (nt+nc) must be exactly
    the rational predicate chi2 > C/1e6."""
    from mysql_postgres_debezium_cdc_spark.operators.behavioral import (
        _SRM_CHI2_001_E6,
    )

    for nt, nc in rows:
        total = nt + nc
        if total == 0:
            continue
        exp = Fraction(total, 2)
        chi2_cells = (nt - exp) ** 2 / exp + (nc - exp) ** 2 / exp
        chi2_closed = Fraction((nt - nc) ** 2, total)
        assert chi2_cells == chi2_closed
        want = chi2_closed > Fraction(_SRM_CHI2_001_E6, 1_000_000)
        got = (nt - nc) ** 2 * 1_000_000 > _SRM_CHI2_001_E6 * total
        assert got == want


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(rows=srm_counts_strategy)
def test_srm_verdict_decimal_expression_matches_bigint_reference(spark, rows):
    """The engine's DECIMAL(38,0) verdict expression evaluated by Spark
    must equal the Python big-int truth INCLUDING at ~3e12-user
    magnitudes (where (nt-nc)^2 * 1e6 ~ 1e31 — far past BIGINT, inside
    the documented DECIMAL horizon)."""
    from mysql_postgres_debezium_cdc_spark.operators.behavioral import (
        _SRM_CHI2_001_E6,
    )

    data = [
        (nt, nc, (nt - nc) ** 2 * 1_000_000 > _SRM_CHI2_001_E6 * (nt + nc))
        for nt, nc in rows
        if nt + nc > 0
    ]
    if not data:
        return
    df = spark.createDataFrame(data, "nt bigint, nc bigint, want boolean")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    nt, nc = F.col("nt"), F.col("nc")
    got = df.select(
        "want",
        (
            dec(nt - nc) * (nt - nc) * 1000000
            > dec(F.lit(_SRM_CHI2_001_E6)) * (nt + nc)
        ).alias("got"),
    ).collect()
    for r in got:
        assert r["got"] == r["want"], r


# ---------------------------------------------------------------------------
# Sequential SRM (r10): the mixture Bayes factor for integer arm counts
# is EXACTLY nt!*nc!/(nt+nc+1)! * 2^(nt+nc) in rational arithmetic, so
# the engine's shared Stirling double tree can be checked from first
# principles — the same device that pinned the Welch power sums and the
# SRM chi-square collapse (r9).
# ---------------------------------------------------------------------------


def _exact_bf_fraction(nt: int, nc: int):
    from fractions import Fraction
    from math import factorial

    return Fraction(
        factorial(nt) * factorial(nc) * 2 ** (nt + nc),
        factorial(nt + nc + 1),
    )


@settings(max_examples=10, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(
    nt=st.integers(min_value=0, max_value=400),
    nc=st.integers(min_value=0, max_value=400),
)
def test_sequential_srm_bayes_factor_matches_exact_rational(spark, nt, nc):
    """The engine's log BF (shift-by-6 + 3-term Stirling, evaluated by
    Spark itself on a 1-row frame) must agree with ln of the exact
    Fraction Bayes factor to well under the 6dp presentation round, and
    the alpha=0.001 paging verdict must agree with the exact rational
    comparison BF > 1000 whenever log BF is not within 1e-6 of the
    boundary (it never is on an integer count grid this small)."""
    import math

    from mysql_postgres_debezium_cdc_spark.operators.behavioral import (
        _LN_2,
        _LN_1000,
        _lgamma_col,
    )

    row = spark.createDataFrame([(nt, nc)], "nt bigint, nc bigint")
    tot = F.col("nt") + F.col("nc")
    log_bf = (
        _lgamma_col(F.col("nt").cast("double") + F.lit(1.0))
        + _lgamma_col(F.col("nc").cast("double") + F.lit(1.0))
        - _lgamma_col(tot.cast("double") + F.lit(2.0))
        + tot.cast("double") * F.lit(float(_LN_2))
    )
    got = row.select(
        log_bf.alias("log_bf"),
        (log_bf > F.lit(float(_LN_1000))).alias("paged"),
    ).collect()[0]

    exact = _exact_bf_fraction(nt, nc)
    expected = math.log(exact.numerator) - math.log(exact.denominator)
    assert abs(got.log_bf - expected) < 1e-6, (nt, nc, got.log_bf, expected)
    assert got.paged == (exact > 1000), (nt, nc, float(exact))


def test_sequential_srm_is_conservative_under_balanced_enrollment(spark):
    """Supermartingale sanity: under exactly balanced arms the Bayes
    factor is maximal over the H0 ratio yet still ~1/sqrt(n) — the
    monitor must never page, at any peek size."""
    import math

    rows = [(n, n) for n in (1, 10, 75, 1000, 10**6)]
    from mysql_postgres_debezium_cdc_spark.operators.behavioral import (
        _LN_2,
        _LN_1000,
        _lgamma_col,
    )

    df = spark.createDataFrame(rows, "nt bigint, nc bigint")
    tot = F.col("nt") + F.col("nc")
    log_bf = (
        _lgamma_col(F.col("nt").cast("double") + F.lit(1.0))
        + _lgamma_col(F.col("nc").cast("double") + F.lit(1.0))
        - _lgamma_col(tot.cast("double") + F.lit(2.0))
        + tot.cast("double") * F.lit(float(_LN_2))
    )
    out = df.select("nt", log_bf.alias("lb")).collect()
    for r in out:
        assert r.lb < 0, r  # balanced arms: BF < 1 always
        # and the engine tree stays within 1e-6 of true lgamma math
        expected = (
            math.lgamma(r.nt + 1)
            + math.lgamma(r.nt + 1)
            - math.lgamma(2 * r.nt + 2)
            + 2 * r.nt * math.log(2.0)
        )
        assert abs(r.lb - expected) < 1e-6, (r.nt, r.lb, expected)


# ---------------------------------------------------------------------------
# Effect-metric mSPRT (r10): the engine's fixed double tree from integer
# sufficient statistics vs a first-principles reference — theta and V_n
# derived with exact Fraction arithmetic from the raw per-user lists
# (textbook sample variance, never the engine's rearranged power-sum
# form), the log Bayes factor assembled in plain math.  Catches the
# shared-algebra bug class the r9 exact-rational Welch test pinned.
# ---------------------------------------------------------------------------

arm_strategy = st.lists(
    st.integers(min_value=-2000, max_value=2000), min_size=2, max_size=30
)


@settings(max_examples=10, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(yt=arm_strategy, yc=arm_strategy)
def test_effect_msprt_tree_matches_first_principles(spark, yt, yc):
    import math
    from fractions import Fraction

    from mysql_postgres_debezium_cdc_spark.operators.behavioral import (
        _LN_20,
        _TAU2_MSPRT,
        _msprt_cols,
    )

    # first-principles reference: exact rational theta and V_n
    def var(xs):
        m = Fraction(sum(xs), len(xs))
        return sum((Fraction(x) - m) ** 2 for x in xs) / (len(xs) - 1)

    theta_ref = Fraction(sum(yt), len(yt)) - Fraction(sum(yc), len(yc))
    v_ref = var(yt) / len(yt) + var(yc) / len(yc)
    if v_ref == 0:
        return  # guarded to NULL in the engine; degenerate sweep covers it
    tau2 = Fraction(_TAU2_MSPRT)
    lam_exp_term = theta_ref**2 * tau2 / (2 * v_ref * (v_ref + tau2))  # rational
    log_bf_ref = 0.5 * math.log(float(v_ref / (v_ref + tau2))) + float(lam_exp_term)

    # engine tree, evaluated by Spark from the integer sufficient stats
    row = spark.createDataFrame(
        [
            (
                len(yt),
                len(yc),
                sum(yt),
                sum(yc),
                sum(x * x for x in yt),
                sum(x * x for x in yc),
            )
        ],
        "nt bigint, nc bigint, st bigint, sc bigint, sst bigint, ssc bigint",
    )
    theta, v, log_bf = _msprt_cols("nt", "nc", "st", "sc", "sst", "ssc")
    got = row.select(
        theta.alias("theta"),
        v.alias("v"),
        log_bf.alias("log_bf"),
        (log_bf > F.lit(float(_LN_20))).alias("detected"),
    ).collect()[0]

    assert abs(got.theta - float(theta_ref)) < 1e-9 * max(1.0, abs(float(theta_ref)))
    assert abs(got.v - float(v_ref)) < 1e-9 * max(1.0, float(v_ref))
    assert abs(got.log_bf - log_bf_ref) < 1e-7 * max(1.0, abs(log_bf_ref)), (
        yt,
        yc,
        got.log_bf,
        log_bf_ref,
    )
    # the paging rule agrees with the exact-side comparison away from
    # the (measure-zero) boundary
    if abs(log_bf_ref - float(_LN_20)) > 1e-6:
        assert got.detected == (log_bf_ref > float(_LN_20))


def test_effect_msprt_detects_a_strong_synthetic_effect(spark):
    """Sanity in both directions: a flat A/A split must not page; a
    large shift with tight variance must page."""
    from mysql_postgres_debezium_cdc_spark.operators.behavioral import (
        _LN_20,
        _msprt_cols,
    )

    def eval_lb(yt, yc):
        row = spark.createDataFrame(
            [
                (
                    len(yt),
                    len(yc),
                    sum(yt),
                    sum(yc),
                    sum(x * x for x in yt),
                    sum(x * x for x in yc),
                )
            ],
            "nt bigint, nc bigint, st bigint, sc bigint, sst bigint, ssc bigint",
        )
        _, _, lb = _msprt_cols("nt", "nc", "st", "sc", "sst", "ssc")
        return row.select(lb.alias("lb")).collect()[0].lb

    aa = [100 + (i % 7) for i in range(50)]
    assert eval_lb(aa, aa) < float(_LN_20)  # A/A: never pages
    treat = [1000 + (i % 3) for i in range(200)]
    ctrl = [100 + (i % 3) for i in range(200)]
    assert eval_lb(treat, ctrl) > float(_LN_20)  # 9x lift, tight variance


# ---------------------------------------------------------------------------
# Winsorized Welch readout (r10): end-to-end property — the factored
# _winsorized_welch over an arbitrary (arm, y) relation vs a
# first-principles reference (percentile by single-threaded scan,
# textbook sample variance on the capped lists in Fraction arithmetic).
# ---------------------------------------------------------------------------


def _ref_winsorized(yt, yc, pct):
    """Reference: pooled lower-pct percentile cap by scan, upper-only
    capping, exact Fraction Welch t (or None when guarded)."""
    import math
    from fractions import Fraction

    pooled = sorted(yt + yc)
    n = len(pooled)
    cap = next(v for i, v in enumerate(pooled, 1) if 100 * i >= pct * n)
    ct = [min(v, cap) for v in yt]
    cc = [min(v, cap) for v in yc]

    def var(xs):
        m = Fraction(sum(xs), len(xs))
        return sum((Fraction(x) - m) ** 2 for x in xs) / (len(xs) - 1)

    theta = Fraction(sum(ct), len(ct)) - Fraction(sum(cc), len(cc))
    v = var(ct) / len(ct) + var(cc) / len(cc)
    t = None if v == 0 else float(theta) / math.sqrt(float(v))
    return cap, float(theta), t


@settings(max_examples=10, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(yt=arm_strategy, yc=arm_strategy)
def test_winsorized_welch_matches_first_principles(spark, yt, yc):
    from mysql_postgres_debezium_cdc_spark.operators.behavioral import (
        WINSOR_PCT,
        _winsorized_welch,
    )

    per_user = spark.createDataFrame(
        [(1, v) for v in yt] + [(0, v) for v in yc], "arm bigint, y bigint"
    )
    got = _winsorized_welch(per_user).collect()[0]
    cap, theta, t = _ref_winsorized(yt, yc, WINSOR_PCT)

    assert got.n_treat == len(yt) and got.n_ctrl == len(yc)
    assert got.winsor_cap_cents == cap, (got.winsor_cap_cents, cap)
    # half a 4dp grid step: the engine/oracle share half-away-from-zero
    # rounding (parity-checked); Python's banker's round may differ on
    # an exact .5-grid theta, so compare against the UNROUNDED reference
    assert abs(got.mean_diff - theta / 100.0) <= 5.01e-5
    if t is None:
        assert got.t_stat is None and got.significant_05 is None
    else:
        assert abs(got.t_stat - t) < 1e-3 + 1e-4 * abs(t), (got.t_stat, t)
        if abs(abs(round(t, 4)) - 1.96) > 1e-3:
            assert got.significant_05 == (abs(round(t, 4)) >= 1.96)


def test_winsorized_cap_tames_a_whale_user(spark):
    """The point of the operator: one 10^7-cent whale in treatment flips
    the RAW Welch verdict to noise (huge variance) while the winsorized
    readout still resolves the true small lift."""
    from mysql_postgres_debezium_cdc_spark.operators.behavioral import (
        _winsorized_welch,
    )

    treat = [105 + (i % 11) for i in range(99)] + [10_000_000]  # +10 lift, one whale
    ctrl = [95 + (i % 11) for i in range(100)]
    per_user = spark.createDataFrame(
        [(1, v) for v in treat] + [(0, v) for v in ctrl], "arm bigint, y bigint"
    )
    got = _winsorized_welch(per_user).collect()[0]
    assert got.winsor_cap_cents == 115  # p99 of the pooled multiset
    assert got.significant_05 is True  # capped: the lift resolves
    assert got.t_stat > 10
    # and the RAW (uncapped) Welch on the same data is noise — the
    # whale's variance swamps the lift
    import math
    from statistics import mean, variance

    v_raw = variance(treat) / len(treat) + variance(ctrl) / len(ctrl)
    assert abs(mean(treat) - mean(ctrl)) / math.sqrt(v_raw) < 1.96


def test_report_msprt_row_equals_standalone_key(spark):
    """The r11 msprt row of events_experiment_report must be the SAME
    statistic as the standalone events_effect_msprt key — identical
    (n, estimate, 6dp log-BF, verdict) on the same fixture — because
    both route through the one _msprt_cols fixed double tree over the
    same per-user sufficient statistics.  A divergence would mean the
    report grew its own variant of the test."""
    from mysql_postgres_debezium_cdc_spark.registry import all_queries

    qs = all_queries()
    sf = "/root/testdata/sf0.001"
    row = {
        r.metric: r for r in qs["events_experiment_report"].fn(spark, sf).collect()
    }["msprt"]
    ref = qs["events_effect_msprt"].fn(spark, sf).collect()[0]
    spark.catalog.clearCache()
    assert (row.n_treat, row.n_ctrl) == (ref.n_treat, ref.n_ctrl)
    assert row.estimate == ref.mean_diff
    assert row.stat == ref.log_bf
    assert row.significant == ref.effect_detected


def test_report_winsorized_row_equals_standalone_key(spark):
    """The r12 winsorized row of events_experiment_report must be the
    SAME statistic as the standalone events_experiment_winsorized key —
    identical (n, mean-diff, 4dp t, verdict) on the same fixture.  The
    report computes the winsorized power sums as grid-weighted sums
    over its distinct-value relation (Σ ca·LEAST(v, cap)) while the
    standalone caps per-user rows directly; both reduce to the same
    exact BIGINTs, so the downstream Welch fixed double trees must
    agree bit-for-bit.  A divergence would mean the grid-weighted
    rewrite changed the statistic."""
    from mysql_postgres_debezium_cdc_spark.registry import all_queries

    qs = all_queries()
    sf = "/root/testdata/sf0.001"
    row = {
        r.metric: r for r in qs["events_experiment_report"].fn(spark, sf).collect()
    }["winsorized"]
    ref = qs["events_experiment_winsorized"].fn(spark, sf).collect()[0]
    spark.catalog.clearCache()
    assert (row.n_treat, row.n_ctrl) == (ref.n_treat, ref.n_ctrl)
    assert row.estimate == ref.mean_diff
    assert row.stat == ref.t_stat
    assert row.significant == ref.significant_05
