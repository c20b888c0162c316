"""Property-based sessionization test: for ANY event timeline, the
gap-based session assignment (operators/behavioral.py) must satisfy the
session invariants a single-threaded scan would produce."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mysql_postgres_debezium_cdc_spark.operators import behavioral

GAP_US = behavioral._SESSION_GAP_US

# (user_id, t_us offsets): few users, gaps straddling the threshold
timeline_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=10 * GAP_US),
    ),
    min_size=1,
    max_size=30,
)


def oracle_sessions(rows):
    """Single-threaded scan: per user, ordered by time, split on gap."""
    by_user: dict[int, list[int]] = {}
    for u, t in rows:
        by_user.setdefault(u, []).append(t)
    out = {}
    for u, ts in by_user.items():
        ts.sort()
        sessions, cur = [], [ts[0]]
        for prev, t in zip(ts, ts[1:]):
            if t - prev > GAP_US:
                sessions.append(cur)
                cur = []
            cur.append(t)
        sessions.append(cur)
        out[u] = [(s[0], s[-1], len(s)) for s in sessions]
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=timeline_strategy)
def test_sessionize_matches_inorder_scan(spark, rows):
    # distinct timestamps per user: the window's (t_us, event_id) order
    # tie-break is covered by the oracle-parity test; properties focus
    # on the gap-splitting semantics
    rows = list({(u, t) for u, t in rows})
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(u, t, i) for i, (u, t) in enumerate(rows)], "user_id long, t_us long, event_id long"
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    prev = F.lag("t_us").over(w)
    flagged = df.withColumn(
        "is_new",
        F.when(prev.isNull() | ((F.col("t_us") - prev) > GAP_US), 1).otherwise(0),
    )
    run = Window.partitionBy("user_id").orderBy("t_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    got = (
        flagged.withColumn("session_idx", F.sum("is_new").over(run))
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("t_us").alias("start"),
            F.max("t_us").alias("end"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("user_id", "session_idx")
        .collect()
    )
    expected = oracle_sessions(rows)
    by_user: dict[int, list] = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append((r["start"], r["end"], r["n"]))
    assert by_user == expected


def test_chunked_sessionizer_equals_single_window(spark):
    """The skew-bounded chunk-merge sessionizer must be result-identical
    to the single-window formulation on the fixture (both also share
    one oracle text); any boundary-handling slip (first-row flag,
    ordinal offset, cross-chunk session continuation) breaks this."""
    from mysql_postgres_debezium_cdc_spark.registry import all_queries
    from tests.conftest import SF_DIR_ORACLE

    a = all_queries()["events_sessionize_gap"].fn(spark, SF_DIR_ORACLE)
    b = all_queries()["events_sessionize_gap_chunked"].fn(spark, SF_DIR_ORACLE)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_disorder_audit_measures_injected_lateness(spark, tmp_path):
    """events_disorder_audit on a synthesized DISORDERED arrival: user 1
    emits ts [0s, +300s, +120s, +1200s] in event_id order (event 2 is
    180s behind the frontier: 1-minute band only), user 2 emits [0s,
    +3600s, +900s] (2700s late: counts in both bands); user 3 is in
    order.  Counts and the max delay must match the hand computation,
    and the DuckDB oracle must agree on the same fixture."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysql_postgres_debezium_cdc_spark.registry import all_queries
    from mysql_postgres_debezium_cdc_spark.sources.parquet import TABLES
    from tests.conftest import SF_DIR_ORACLE
    from tests.parity import compare, duck_connection

    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)
    rows = [  # (event_id, user_id, offset_s)
        (0, 1, 0), (1, 1, 300), (2, 1, 120), (3, 1, 1200),
        (4, 2, 0), (5, 2, 3600), (6, 2, 900),
        (7, 3, 0), (8, 3, 60), (9, 3, 120),
    ]
    base = tmp_path / "disorder_sf"
    base.mkdir()
    for t in TABLES:
        schema = pq.read_schema(f"{SF_DIR_ORACLE}/{t}.parquet")
        if t == "events":
            tbl = pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [t0 + dt.timedelta(seconds=r[2]) for r in rows],
                        pa.timestamp("us"),
                    ),
                    "user_id": pa.array([r[1] for r in rows], pa.int64()),
                    "event_type": pa.array(["click"] * len(rows), pa.string()),
                    "value": pa.array([1.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ).cast(schema.remove_metadata())
        else:
            tbl = schema.empty_table()
        pq.write_table(tbl, str(base / f"{t}.parquet"))

    spec = all_queries()["events_disorder_audit"]
    sdf = spec.fn(spark, str(base))
    assert compare(sdf, duck_connection(str(base)).execute(spec.oracle).df()) == []
    r = {x["event_type"]: x for x in sdf.collect()}["click"]
    # user 1: event 2 is 180s late (>60s, not >600s); user 2: event 6 is
    # 2700s late (both bands); user 3 in order.
    assert r["n_events"] == 10
    assert r["n_late_1m"] == 2
    assert r["n_late_10m"] == 1
    assert r["max_delay_s"] == 2700
