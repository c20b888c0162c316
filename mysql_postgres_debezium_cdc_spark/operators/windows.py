"""Window-function surface: ranking, lag/lead, running frames, ntile.

Window functions shuffle once on PARTITION BY and sort within partitions.
Skew note for 100 TB: a hot partition key serializes into one task — for
running aggregates over a global order, prefer keyed partitions (as
here); never Window with no PARTITION BY (single-task sort) — the one
global-order requirement in this file (NTILE) is decomposed into
range-chunked local ranks + a prefix-sum over per-chunk counts, so no
operator ever sees the whole table in one task.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mysql_postgres_debezium_cdc_spark.operators.hints import maybe_broadcast
from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load


@register(
    "window_rank_dense_rownum",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_mktsegment, rn
    """,
    tags=("window", "rank"),
)
def window_rank_dense_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
        )
        .orderBy("c_mktsegment", "rn")
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           ROUND(value, 2) AS value,
           ROUND(LAG(value)  OVER w, 2) AS prev_value,
           ROUND(LEAD(value) OVER w, 2) AS next_value,
           ROUND(value - COALESCE(LAG(value) OVER w, value), 2) AS delta
    FROM events
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
    tags=("window", "lag"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_v = F.lag("value").over(w)
    return (
        ev.select(
            "event_id",
            "user_id",
            F.round("value", 2).alias("value"),
            F.round(lag_v, 2).alias("prev_value"),
            F.round(F.lead("value").over(w), 2).alias("next_value"),
            F.round(F.col("value") - F.coalesce(lag_v, F.col("value")), 2).alias("delta"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_total,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
             AS moving_avg_3
    FROM events
    WHERE user_id < 10
    ORDER BY user_id, event_id
    """,
    tags=("window", "frame"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 3-row moving average with explicit ROWS frames."""
    ev = load(spark, sf_dir, "events").where(F.col("user_id") < 10)
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = base.rowsBetween(-2, Window.currentRow)
    return (
        ev.select(
            "event_id",
            "user_id",
            F.round(F.sum("value").over(run), 2).alias("running_total"),
            F.round(F.avg("value").over(mov), 2).alias("moving_avg_3"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY EPOCH(o_orderdate)
                          RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)
             AS orders_past_90d
    FROM orders
    WHERE o_custkey < 100
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "range_frame"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time seconds: orders in trailing 90 days."""
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-90 * 24 * 3600, Window.currentRow)
    )
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.count(F.lit(1)).over(w).alias("orders_past_90d"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_ntile",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS bal_quartile
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("window", "ntile"),
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global NTILE(4) with NO unpartitioned window.

    ``Window.orderBy`` without PARTITION BY funnels the whole table
    through one task (the ``WindowExec: No Partition Defined`` warning)
    — fine on 60k rows, a serialization point at 100 TB since customer
    grows with SF.  Scale-safe decomposition with identical semantics:

    1. ``repartitionByRange`` on the NTILE order — a parallel global
       sort; chunk i holds rows strictly before chunk i+1 (the order
       key is total: c_custkey breaks acctbal ties).
    2. per-chunk ``row_number`` (keyed window, parallel).
    3. per-chunk counts (≤ n_chunks rows) cross-joined with themselves
       to get each chunk's prefix-sum offset AND the grand total in one
       tiny aggregation — no global window even over the counts.
    4. global rank = local rank + chunk offset; the NTILE bucket is then
       pure arithmetic: with n rows and k=4, the first n%4 buckets get
       ⌈n/4⌉ rows, the rest ⌊n/4⌋ — exactly DuckDB/ANSI NTILE, so the
       oracle stays a literal NTILE(4).
    """
    order = [F.desc("c_acctbal"), F.asc("c_custkey")]
    n_chunks = int(spark.conf.get("spark.sql.shuffle.partitions"))
    chunked = (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .repartitionByRange(n_chunks, *order)
        .withColumn("_pid", F.spark_partition_id())
    )
    local = chunked.withColumn(
        "_lrn",
        F.row_number().over(Window.partitionBy("_pid").orderBy(*order)).cast("bigint"),
    )
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    other = counts.select(F.col("_pid").alias("_pid2"), F.col("_cnt").alias("_cnt2"))
    stats = (
        counts.crossJoin(maybe_broadcast(other, bounded=True))  # ≤ n_chunks² rows
        .groupBy("_pid")
        .agg(
            F.sum(
                F.when(F.col("_pid2") < F.col("_pid"), F.col("_cnt2")).otherwise(F.lit(0))
            ).alias("_off"),
            F.sum("_cnt2").alias("_n"),
        )
    )
    rn = F.col("_lrn") + F.col("_off")
    q = F.floor(F.col("_n") / 4)
    r = F.col("_n") % 4
    big = r * (q + 1)  # rows living in the ⌈n/4⌉-sized buckets
    bucket = F.when(rn <= big, F.floor((rn - 1) / (q + 1)) + 1).otherwise(
        r + F.floor((rn - big - 1) / F.greatest(q, F.lit(1))) + 1
    )
    return (
        local.join(maybe_broadcast(stats, bounded=True), "_pid")
        .select("c_custkey", bucket.cast("bigint").alias("bal_quartile"))
        .orderBy("c_custkey")
    )


@register(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price,
           PERCENT_RANK() OVER w AS pr,
           ROUND(CUME_DIST() OVER w, 4) AS cd
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "first_last", "rank_dist"),
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value + percent_rank/cume_dist.  last_value needs
    the full-partition frame (the default frame stops at CURRENT ROW —
    the classic silent-wrong-answer; stated explicitly in both engines)."""
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.percent_rank().over(w).alias("pr"),
        F.round(F.cume_dist().over(w), 4).alias("cd"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_percent_rank_cume_dist",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 4) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)
    ORDER BY c_nationkey, c_custkey
    """,
    tags=("window", "rank"),
)
def window_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position ranking: PERCENT_RANK ((rank−1)/(n−1)) and
    CUME_DIST (rows ≤ current / n) per nation by account balance.

    Both are tie-stable — equal balances get equal values in both
    engines — so no tie-break column is needed for determinism, unlike
    ROW_NUMBER.  Partitioned by nationkey: the window shuffles once on
    a bounded-cardinality key and sorts within partitions; there is no
    global window here (the r3 NTILE lesson)."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    ).orderBy("c_nationkey", "c_custkey")


@register(
    "window_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    grp AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS anchor
      FROM days
    ),
    islands AS (
      SELECT user_id, anchor,
             CAST(COUNT(*) AS BIGINT) AS streak_days,
             MIN(d) AS streak_start
      FROM grp GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(streak_days) AS BIGINT) AS longest_streak,
           STRFTIME(MIN(streak_start) FILTER (
             WHERE streak_days = (SELECT MAX(i2.streak_days) FROM islands i2
                                  WHERE i2.user_id = islands.user_id)
           ), '%Y-%m-%d') AS longest_start
    FROM islands
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("window", "gaps-islands", "behavioral"),
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, group consecutive active DAYS into
    streaks via the classic date-minus-row_number anchor (consecutive
    days share an anchor; any gap shifts it), then report streak count,
    longest streak, and the earliest start date among longest streaks
    (deterministic tie-break).

    Scale shape: one shuffle on user_id serves BOTH the distinct-day
    dedup and the window sort (same partitioning key, so Catalyst
    reuses the exchange); everything after the anchor is a per-user
    aggregation over island rows, whose cardinality is bounded by
    active days per user, not events.  No global window — the r3 NTILE
    lesson holds."""
    days = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    islands = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).cast("bigint").alias("streak_days"),
        F.min("d").alias("streak_start"),
    )
    w_user = Window.partitionBy("user_id")
    return (
        islands.withColumn("max_streak", F.max("streak_days").over(w_user))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
            F.max("streak_days").cast("bigint").alias("longest_streak"),
            F.date_format(
                F.min(
                    F.when(
                        F.col("streak_days") == F.col("max_streak"),
                        F.col("streak_start"),
                    )
                ),
                "yyyy-MM-dd",
            ).alias("longest_start"),
        )
        .orderBy("user_id")
    )


@register(
    "window_moving_median",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
      FROM orders GROUP BY day
    ),
    framed AS (
      SELECT day, LIST_SORT(LIST(rev_cents) OVER w) AS vals
      FROM daily
      WINDOW w AS (ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                   AND CURRENT ROW)
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(LEN(vals) AS BIGINT) AS n_in_frame,
           ((vals[(LEN(vals) + 1) // 2] + vals[LEN(vals) // 2 + 1] + 1) // 2)
             / 100.0 AS moving_median_rev
    FROM framed ORDER BY day
    """,
    tags=("window", "stats"),
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving median of daily revenue.

    Spark has no MEDIAN window aggregate, so the engine builds it from
    primitives: collect the RANGE frame into an array (≤7 elements — a
    calendar frame, bounded by construction), sort it, and take the
    middle element (odd) or the even-count midpoint.  Revenue is
    pre-aggregated to exact integer cents per day and the midpoint is
    resolved ENTIRELY in integer space — (lo+hi+1)//2, half-up to whole
    cents — because an even frame's mean lands on a .5 cent, i.e. a
    .005 dollar, the exact double-rounding boundary the cross-scale
    sweep has caught before (PLANS.md).  The oracle mirrors the same
    list/sort/index arithmetic instead of DuckDB's MEDIAN.

    Scale shape: the fact-sized work is the daily pre-aggregation
    (map-side combined groupBy); the window runs over the CALENDAR-
    sized relation.  The global ORDER BY day window is a single task,
    acceptable only because |days| is calendar-bounded — the same
    justification as `events_changepoint_window`."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "rev_cents"
            )
        )
    )
    w = (
        Window.orderBy(F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-6, 0)
    )
    frame = daily.select(
        "day",
        F.array_sort(F.collect_list("rev_cents").over(w)).alias("vals"),
    )
    n = F.size("vals")
    mid_hi = F.element_at("vals", (n / 2 + 1).cast("int"))  # upper middle
    mid_lo = F.element_at("vals", ((n + 1) / 2).cast("int"))  # lower middle
    # exact integer half-up to whole cents, THEN one exact-input double
    # division for display — no .005 double boundary can form.  The
    # intermediate (lo+hi+1)/2 is double but exact: cents sums sit far
    # below 2^53, so floor() recovers the true integer.
    med_cents = F.floor((mid_lo + mid_hi + 1) / 2)
    return frame.select(
        F.col("day").cast("string").alias("day"),
        n.cast("bigint").alias("n_in_frame"),
        (med_cents / F.lit(100.0)).alias("moving_median_rev"),
    ).orderBy("day")
