"""Join operator surface: broadcast-hash, shuffle sort-merge, outer
(left/right/full), left-semi, left-anti, cross, range/theta, as-of.

Physical-strategy notes (verify with plans.explain_str):

- ``join_broadcast_dim``   → BroadcastHashJoin (dim side under threshold).
- ``join_sort_merge``      → SortMergeJoin forced via the ``merge`` hint —
  the shape the same query takes at 100 TB when neither side broadcasts;
  both sides co-shuffle on the key, AQE picks partition counts.
- Range/theta joins have no equi-key; Spark executes BroadcastNestedLoop.
  That is correct ONLY because the build side is a constant handful of
  rows.  The scale path for "assign value to bucket" is the closed-form
  ``floor()`` expression (see ``aggregates.agg_histogram``) — never an
  inequality join fact×fact.
- As-of join is expressed as a windowed running ``max`` over a union of
  the two streams partitioned by key — one shuffle by key, no point
  lookups, no driver loop; identical formulation runs in the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load


@register(
    "join_broadcast_dim",
    oracle="""
    SELECT n_name, COUNT(*) AS n_custs, ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("join", "broadcast"),
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("n_name")
    )


@register(
    "join_sort_merge",
    oracle="""
    SELECT o_orderkey, o_orderstatus, COUNT(*) AS n_lines,
           ROUND(SUM(l_extendedprice), 2) AS gross
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderkey, o_orderstatus
    HAVING COUNT(*) >= 5
    ORDER BY o_orderkey
    """,
    tags=("join", "smj", "having"),
    bench=True,
)
def join_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi join forced to SortMergeJoin (the 100 TB shape)."""
    orders = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderstatus")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    return (
        orders.hint("merge")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("gross"),
        )
        .where(F.col("n_lines") >= 5)
        .orderBy("o_orderkey")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
    tags=("join", "outer"),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer preserves order-less customers (COUNT of NULL key = 0)."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@register(
    "join_full_outer",
    oracle="""
    WITH bal AS (
      SELECT c_nationkey AS nk, ROUND(SUM(c_acctbal), 2) AS cust_bal
      FROM customer GROUP BY c_nationkey
    ), sup AS (
      SELECT s_nationkey AS nk, ROUND(SUM(s_acctbal), 2) AS supp_bal
      FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(bal.nk, sup.nk) AS nationkey, cust_bal, supp_bal
    FROM bal FULL OUTER JOIN sup ON bal.nk = sup.nk
    ORDER BY nationkey
    """,
    tags=("join", "outer"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-nation customer vs supplier balances."""
    bal = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.round(F.sum("c_acctbal"), 2).alias("cust_bal"))
    )
    sup = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.round(F.sum("s_acctbal"), 2).alias("supp_bal"))
    )
    return (
        bal.join(sup, bal.nk == sup.snk, "full")
        .select(
            F.coalesce(bal.nk, sup.snk).alias("nationkey"),
            "cust_bal",
            "supp_bal",
        )
        .orderBy("nationkey")
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    ORDER BY c_custkey
    """,
    tags=("join", "semi"),
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").orderBy("c_custkey")


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
    tags=("join", "anti"),
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no URGENT order.  (Every customer has SOME order
    in these fixtures — an unfiltered anti join would return 0 rows,
    and an empty-matches-empty oracle check proves nothing; the
    priority filter makes the anti semantics observable.)"""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").orderBy("c_custkey")


@register(
    "join_cross",
    oracle="""
    SELECT a.r_name AS from_region, b.r_name AS to_region
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey <> b.r_regionkey
    ORDER BY from_region, to_region
    """,
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("ak"), F.col("r_name").alias("from_region")
    )
    b = load(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("bk"), F.col("r_name").alias("to_region")
    )
    return (
        a.crossJoin(b)
        .where(F.col("ak") != F.col("bk"))
        .select("from_region", "to_region")
        .orderBy("from_region", "to_region")
    )


@register(
    "join_range_bucket",
    oracle="""
    SELECT b.bucket_name, COUNT(*) AS n_items, ROUND(SUM(l.l_extendedprice), 2) AS total_price
    FROM lineitem l
    JOIN (VALUES ('tiny', 0.0, 10.0), ('small', 10.0, 25.0),
                 ('medium', 25.0, 40.0), ('large', 40.0, 1e9)) AS b(bucket_name, lo, hi)
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.bucket_name
    ORDER BY b.bucket_name
    """,
    tags=("join", "range"),
)
def join_range_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join against a constant bucket relation.

    BroadcastNestedLoop is fine here because the build side is 4 rows; a
    fact-fact range join at scale is rewritten as floor() bucketing.
    """
    li = load(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    buckets = spark.createDataFrame(
        [("tiny", 0.0, 10.0), ("small", 10.0, 25.0), ("medium", 25.0, 40.0), ("large", 40.0, 1e9)],
        "bucket_name string, lo double, hi double",
    )
    return (
        li.join(
            F.broadcast(buckets),
            (li.l_quantity >= buckets.lo) & (li.l_quantity < buckets.hi),
        )
        .groupBy("bucket_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
        .orderBy("bucket_name")
    )


@register(
    "join_asof_last_click",
    oracle="""
    WITH tagged AS (
      SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
      FROM events
    )
    SELECT event_id, user_id,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS purchase_s,
           CAST(FLOOR(EPOCH(last_click_ts)) AS BIGINT) AS last_click_s
    FROM tagged
    WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
    tags=("join", "asof"),
)
def join_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase paired with the user's latest click ≤ ts.

    Expressed as a running MAX over the per-key event timeline — a single
    shuffle by user_id, streaming-friendly, skew-safe; the classic
    backward as-of join without any inequality join.  Timestamps are
    monotone within the window order, so MAX(click ts so far) IS the most
    recent click.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return (
        ev.withColumn("last_click_ts", F.max(click_ts).over(w))
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.floor(F.unix_timestamp("ts")).cast("bigint").alias("purchase_s"),
            F.floor(F.unix_timestamp("last_click_ts")).cast("bigint").alias("last_click_s"),
        )
        .orderBy("event_id")
    )


@register(
    "join_right_outer",
    oracle="""
    WITH urgent AS (
      SELECT o_custkey, COUNT(*) AS n_urgent
      FROM orders WHERE o_orderpriority = '1-URGENT'
      GROUP BY o_custkey
    )
    SELECT c.c_custkey, urgent.n_urgent
    FROM urgent RIGHT OUTER JOIN customer c ON urgent.o_custkey = c.c_custkey
    ORDER BY c.c_custkey
    """,
    tags=("join", "outer"),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every customer row survives, urgent-order
    counts attach where they exist (NULL elsewhere — the 203 customers
    join_left_anti isolates).  Catalyst plans this as the mirrored left
    outer with the preserved side streaming, so the same
    broadcast/shuffle selection rules apply."""
    urgent = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    return (
        urgent.join(cust, urgent.o_custkey == cust.c_custkey, "right_outer")
        .select("c_custkey", "n_urgent")
        .orderBy("c_custkey")
    )


ASOF_TOLERANCE_MIN = 30  # max staleness of the matched click, minutes


@register(
    "join_asof_tolerance",
    oracle=f"""
    WITH tagged AS (
      SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_click_ts
      FROM events
    )
    SELECT event_id, user_id,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS purchase_s,
           CASE WHEN last_click_ts >= ts - INTERVAL {ASOF_TOLERANCE_MIN} MINUTES
                THEN CAST(FLOOR(EPOCH(last_click_ts)) AS BIGINT)
                ELSE NULL END AS click_within_tol_s,
           CASE WHEN last_click_ts >= ts - INTERVAL {ASOF_TOLERANCE_MIN} MINUTES
                THEN 1 ELSE 0 END AS matched
    FROM tagged
    WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
    tags=("join", "asof", "tolerance"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE (pandas ``merge_asof(tolerance=...)``
    semantics): each purchase matches the user's latest preceding click
    ONLY if it is at most ASOF_TOLERANCE_MIN old — stale matches become
    NULL, not silently-attributed conversions.  The tolerance is what
    separates attribution ("the click that drove this purchase") from
    mere precedence ([[join_asof_last_click]]); both share the same
    single-shuffle running-MAX formulation, with the staleness bound
    applied as a residual predicate AFTER the as-of resolution — never
    as an inequality join.

    Scale shape: identical to the plain as-of — one shuffle by key, a
    keyed window, no nested loop; the tolerance costs one comparison
    per row."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    in_tol = F.col("last_click_ts") >= F.col("ts") - F.expr(
        f"INTERVAL {ASOF_TOLERANCE_MIN} MINUTES"
    )
    return (
        ev.withColumn("last_click_ts", F.max(click_ts).over(w))
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.floor(F.unix_timestamp("ts")).cast("bigint").alias("purchase_s"),
            F.when(
                in_tol,
                F.floor(F.unix_timestamp("last_click_ts")).cast("bigint"),
            ).alias("click_within_tol_s"),
            F.when(in_tol, 1).otherwise(0).alias("matched"),
        )
        .orderBy("event_id")
    )


RUNTIME_FILTER_NATION = "NATION_8"  # populated at every fixture scale
RUNTIME_FILTER_MAX_KEYS = 100_000  # IN-list budget; beyond it, plain join


@register(
    "join_runtime_filter_pushdown",
    oracle=f"""
    SELECT l.l_suppkey, s.s_name,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = '{RUNTIME_FILTER_NATION}'
    GROUP BY l.l_suppkey, s.s_name
    ORDER BY revenue_cents DESC, l_suppkey
    LIMIT 10
    """,
    tags=("join", "runtime-filter", "pushdown"),
)
def join_runtime_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-filtered fact join with an EXPLICIT runtime key filter — the
    manual form of the runtime-filter/bloom-join optimization (Spark's
    own spark.sql.optimizer.runtime.bloomFilter applies it only to
    shuffle joins): resolve the qualifying dimension keys FIRST (one
    dimension-sized collect, the scalar-probe precedent), then push
    them into the FACT SCAN as an IN predicate, so parquet row-group
    min/max stats skip fact data for a selective dim predicate — the
    fact rows for 24 of 25 nations are never decoded, instead of
    surviving until the join operator drops them.

    The result is definitionally identical to the plain
    dim-predicate join the oracle states — the filter is purely a
    physical optimization, which is exactly what the value hash
    certifies.  The plan audit (tests/test_plans.py) pins PushedFilters
    carrying In(l_suppkey, ...) on the lineitem scan and no
    sort-merge join.

    Scale guard: the IN-list is bounded by RUNTIME_FILTER_MAX_KEYS —
    a dimension slice past the budget falls back to the plain
    broadcast join rather than shipping a mega-literal plan (at that
    width the scan-skip win is gone anyway).  At 100 TB the collected
    keys are |suppliers-per-nation| ≈ |supplier|/25 — dimension-sized,
    never fact-sized."""
    nat = load(spark, sf_dir, "nation").where(
        F.col("n_name") == RUNTIME_FILTER_NATION
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    keys = [r.s_suppkey for r in supp.select("s_suppkey").collect()]
    li = load(spark, sf_dir, "lineitem")
    if keys and len(keys) <= RUNTIME_FILTER_MAX_KEYS:
        li = li.where(F.col("l_suppkey").isin(keys))
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_suppkey", "s_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .orderBy(F.desc("revenue_cents"), "l_suppkey")
        .limit(10)
    )
