"""TPC-H queries 2,4,8,9,11,13,15,16,17,20,21,22 — adapted to the fixture schema.

The synthetic star schema has no ``partsupp`` table and lineitem lacks
commit/receipt dates, so the queries that depend on them (2, 9, 11, 16,
20, 21) are *adapted*: the part↔supplier relationship is derived from
``lineitem`` (the shipped-by relation), supply cost from
``p_retailprice``, and lateness from ``l_shipdate`` vs ``o_orderdate``.
Join/agg/subquery shape — which is what exercises the engine — is
preserved query-for-query.

Scale notes: every dim join here broadcasts at bench SF — via the
threshold for SF-growing tables, via an explicit hint only for
scale-independent frames (nation/region, 1-row scalar aggregates; see
``operators/hints.py``); fact-side
aggregates are partial (map-side) before the shuffle; scalar subqueries
(q11, q15, q17, q22) become Catalyst ``ScalarSubquery`` reuse nodes, not
driver collects; the q21 exists/not-exists pair is formulated as ONE
per-order aggregation (n_suppliers, n_late_suppliers) instead of two
correlated passes over lineitem — one shuffle replaces two.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mysql_postgres_debezium_cdc_spark.operators.hints import maybe_broadcast
from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    eligible AS (
      SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, s_nationkey
      FROM part
      JOIN ps ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      WHERE p_size <= 10 AND p_type = 'LARGE'
    ),
    best AS (
      SELECT p_partkey, MIN(s_acctbal) AS min_bal FROM eligible GROUP BY p_partkey
    )
    SELECT ROUND(e.s_acctbal, 2) AS s_acctbal, e.s_name, n.n_name,
           e.p_partkey, e.p_brand
    FROM eligible e
    JOIN best b ON e.p_partkey = b.p_partkey AND e.s_acctbal = b.min_bal
    JOIN nation n ON e.s_nationkey = n.n_nationkey
    ORDER BY 1 DESC, n.n_name, e.s_name, e.p_partkey
    LIMIT 20
    """,
    tags=("tpch", "join", "subquery"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted): cheapest supplier per part — min-per-group
    subquery re-joined against the candidate set (partsupp derived from
    lineitem's shipped-by relation, cost proxied by s_acctbal)."""
    ps = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = load(spark, sf_dir, "part").where(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    eligible = (
        maybe_broadcast(p)
        .join(ps, F.col("p_partkey") == F.col("l_partkey"))
        .join(maybe_broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("p_partkey", "p_brand", "s_name", "s_acctbal", "s_nationkey")
    )
    best = eligible.groupBy("p_partkey").agg(F.min("s_acctbal").alias("min_bal"))
    return (
        eligible.join(
            best.withColumnRenamed("p_partkey", "bp"),
            (F.col("p_partkey") == F.col("bp")) & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .join(maybe_broadcast(n, bounded=True), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 20 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("tpch", "exists"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (adapted): priority counts for orders with at least one
    late line (ship > order + 20d standing in for commit < receipt).
    The EXISTS compiles to a left-semi join — no row duplication, and
    the lineitem side is pruned to two columns before the shuffle."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-07-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-10-01 00:00:00"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 20 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q8_market_share",
    oracle="""
    WITH all_sales AS (
      SELECT YEAR(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN part     ON l_partkey = p_partkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    )
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM all_sales
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("tpch", "join", "agg"),
    bench=True,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — 7-way join, all dimension sides
    broadcast, conditional aggregation for the share ratio."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = n.join(maybe_broadcast(r, bounded=True), F.col("n_regionkey") == F.col("r_regionkey")).select(
        F.col("n_nationkey").alias("c_nkey")
    )
    n2 = n.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sales = (
        li.join(maybe_broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(n1, bounded=True), F.col("c_nationkey") == F.col("c_nkey"))
        .join(maybe_broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(maybe_broadcast(n2, bounded=True), F.col("s_nationkey") == F.col("s_nkey"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
    )
    share = F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
    return (
        sales.groupBy("o_year")
        .agg(F.round(share / F.sum("volume"), 4).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity), 2) AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, YEAR(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    tags=("tpch", "join", "agg"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted): profit per supplier-nation per year; supply
    cost proxied as 0.6 × p_retailprice (no partsupp in fixtures)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(maybe_broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(maybe_broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(maybe_broadcast(n, bounded=True), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH pv AS (
      SELECT l_partkey, SUM(l_quantity * p_retailprice) AS value
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey < 6
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, ROUND(value, 2) AS value
    FROM pv
    WHERE value > (SELECT SUM(value) * 0.002 FROM pv)
    ORDER BY value DESC, p_partkey
    """,
    tags=("tpch", "agg", "subquery"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted): parts whose shipped value exceeds a fraction
    of the total — a global-scalar-subquery threshold.  The per-part agg
    (one row per part — small even when lineitem isn't) is persisted and
    consumed twice: once for the threshold, once for the output rows, so
    the lineitem join runs exactly once."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    s = load(spark, sf_dir, "supplier").where(F.col("s_nationkey") < 6).select("s_suppkey")
    pv = (
        li.join(maybe_broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(maybe_broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity") * F.col("p_retailprice")).alias("value"))
        .persist()
    )
    threshold = pv.agg((F.sum("value") * 0.002).alias("t"))
    return (
        # 1-row scalar aggregate: bounded at any SF, hint is safe + needed
        pv.join(maybe_broadcast(threshold, bounded=True))
        .where(F.col("value") > F.col("t"))
        .select(F.col("l_partkey").alias("p_partkey"), F.round("value", 2).alias("value"))
        .orderBy(F.desc("value"), "p_partkey")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "outer-join", "agg"),
    bench=True,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution — outer join with a
    join-side predicate (NOT a post-filter: customers with zero matching
    orders must survive with count 0), then a second aggregation."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("tpch", "subquery", "agg"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue — the revenue
    'view' is computed once; the MAX threshold is a scalar subquery over
    it (rounded pre-compare so both engines match ties identically)."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        maybe_broadcast(s)
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(maybe_broadcast(mx, bounded=True))
        .where(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_parts_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "anti-join", "distinct-agg"),
)
def q16_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted): distinct supplier counts per part attribute
    group; the NOT IN complaint-supplier exclusion is a broadcast
    anti-join (safe here: s_suppkey is non-null by construction)."""
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(maybe_broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(maybe_broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
    tags=("tpch", "correlated-subquery"),
    bench=True,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity-order revenue.  The correlated per-part
    average is decorrelated into one groupBy + broadcast join — the same
    rewrite Catalyst applies to the SQL form, stated explicitly."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3").select("p_partkey")
    pavg = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(maybe_broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(pavg, F.col("l_partkey") == F.col("ak"))
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q20_promo_part_suppliers",
    oracle="""
    SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 100
    )
    ORDER BY s_name
    """,
    tags=("tpch", "semi-join", "having"),
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted): suppliers who shipped >100 units of red
    parts in 1997 — aggregate-HAVING feeding a left-semi join."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("red%")).select("p_partkey")
    heavy = (
        li.join(maybe_broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 100)
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH flagged AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late,
             MIN(CASE WHEN late = 1 THEN l_suppkey END) AS blamed
      FROM flagged
      GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM per_order
    JOIN supplier ON blamed = s_suppkey
    WHERE n_supp > 1 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    tags=("tpch", "agg", "join"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted): suppliers who alone held up multi-supplier
    orders (lateness = shipped >60d after order date).  The classic
    EXISTS + NOT-EXISTS pair is folded into a single per-order
    aggregation (n_suppliers, n_late, blamed) — one lineitem shuffle
    instead of three correlated scans; identical semantics."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    ).cast("int")
    per_order = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", late.alias("late"))
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("n_late"),
            F.min(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("blamed"),
        )
        .where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(maybe_broadcast(s), F.col("blamed") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@register(
    "q22_global_sales",
    oracle="""
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_nationkey IN (0, 3, 7, 11, 17, 21)
      AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      )
    GROUP BY c_nationkey
    ORDER BY cntrycode
    """,
    tags=("tpch", "anti-join", "subquery"),
)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted): well-funded customers with no recent orders,
    by nation (standing in for phone country code).  Scalar-average
    threshold + anti-join against recent orders."""
    c = load(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(0, 3, 7, 11, 17, 21)
    )
    avg_bal = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("ab"))
    )
    recent = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= _ts("1999-01-01 00:00:00"))
        .select("o_custkey")
    )
    return (
        # 1-row scalar aggregate: bounded at any SF
        c.join(maybe_broadcast(avg_bal, bounded=True))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(F.count(F.lit(1)).alias("numcust"), F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
        .orderBy("cntrycode")
    )


_SQL_API_STMT = """
    SELECT n_name,
           COUNT(DISTINCT o_orderkey) AS n_orders,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
    GROUP BY n_name
    ORDER BY n_name
"""


@register(
    "sql_api_revenue_by_nation",
    oracle=_SQL_API_STMT,
    tags=("sql-api", "join", "agg"),
)
def sql_api_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql front-end: IDENTICAL SQL text runs on Spark and the
    DuckDB oracle (tables registered as temp views).  Proves the engine's
    SQL surface end-to-end — parser → Catalyst → same physical plans the
    DataFrame API gets; Catalyst broadcasts the dims here exactly as in
    the hand-built joins."""
    for t in ("lineitem", "orders", "customer", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_API_STMT)


_PIPE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_lines,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

_PIPE_STMT = """
FROM lineitem
|> WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
|> AGGREGATE COUNT(*) AS n_lines,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
   GROUP BY l_returnflag, l_linestatus
|> ORDER BY l_returnflag, l_linestatus
"""


@register(
    "sql_api_pipe_syntax",
    oracle=_PIPE_ORACLE,
    tags=("sql-api", "agg"),
)
def sql_api_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0+): the query is written as a linear
    ``FROM |> WHERE |> AGGREGATE |> ORDER BY`` dataflow instead of the
    inside-out SELECT nesting.  Pipe operators are pure parser surface —
    Catalyst receives the identical logical plan (filter pushed to the
    scan, partial+final hash agg), so the DuckDB oracle is simply the
    classic formulation of the same query.  Included because a user
    migrating pipelines to this engine gets the modern front-end too,
    not just ANSI SQL."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_PIPE_STMT)


@register(
    "sql_api_parameterized",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    WHERE o_totalprice BETWEEN 50000.0 AND 200000.0
      AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("sql-api", "agg"),
)
def sql_api_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter ``spark.sql`` (Spark 3.4+): values bind as literal
    expressions server-side (`:lo`/`:hi`/`:status` markers), which is the
    injection-safe way a service layer templates queries — no string
    interpolation, and Catalyst constant-folds the bound literals so the
    plan is byte-identical to the inlined query the oracle runs."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders
        WHERE o_totalprice BETWEEN :lo AND :hi
          AND o_orderstatus = :status
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"lo": 50000.0, "hi": 200000.0, "status": "F"},
    )


@register(
    "sql_recursive_cte_spine",
    oracle="""
    WITH RECURSIVE spine AS (
      SELECT CAST(date_trunc('month', (SELECT MIN(o_orderdate) FROM orders))
                  AS DATE) AS month_start
      UNION ALL
      SELECT CAST(month_start + INTERVAL 1 MONTH AS DATE) FROM spine
      WHERE month_start < (SELECT CAST(date_trunc('month', MAX(o_orderdate))
                                       AS DATE) FROM orders)
    ),
    monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
      FROM orders GROUP BY month_start
    )
    SELECT CAST(s.month_start AS VARCHAR) AS month,
           COALESCE(m.n_orders, 0) AS n_orders,
           COALESCE(m.rev_cents, 0) / CAST(100.0 AS DOUBLE) AS revenue,
           CAST(SUM(COALESCE(m.rev_cents, 0))
                OVER (ORDER BY s.month_start) AS BIGINT) / CAST(100.0 AS DOUBLE)
             AS cumulative_revenue
    FROM spine s LEFT JOIN monthly m ON m.month_start = s.month_start
    WHERE s.month_start IS NOT NULL
    ORDER BY month
    """,
    tags=("sql-api", "recursive-cte"),
)
def sql_recursive_cte_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free monthly revenue report via a RECURSIVE CTE date spine
    (Spark 4's `WITH RECURSIVE`) — the idiom that turns "no rows that
    month" into an explicit zero row, which a naive GROUP BY silently
    drops and every downstream chart/forecast then mis-reads.

    The recursion generates the month spine (bounded by the data's own
    min/max — ~80 rows for the 7-year order history, far under
    `spark.sql.cteRecursionLevelLimit`'s 100 default; a longer horizon
    would raise the conf or switch to `sequence()`), the fact-sized
    work is one ordinary monthly groupBy, and the spine⋈monthly join
    broadcasts the calendar side.  Revenue is exact integer cents; the
    cumulative window sums BIGINTs over the calendar-sized spine before
    a single display division, so parity is bit-exact.

    Engine-behavior finding (PLANS.md r6): Spark's UnionLoop
    re-evaluates a scalar subquery in the RECURSIVE member once per
    iteration — 80 iterations × an orders scan was 15 s of pure
    re-scanning (DuckDB caches the subquery).  The upper bound
    therefore binds as a named PARAMETER from a 1-row scalar probe
    (`sql_api_parameterized`'s device); the anchor's subquery runs
    once and stays inline.  Warm runtime fell 15 s → <1 s."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    max_month = (
        load(spark, sf_dir, "orders")
        .agg(F.date_trunc("month", F.max("o_orderdate")).cast("date").alias("m"))
        .collect()[0]["m"]
    )
    return spark.sql(
        """
        WITH RECURSIVE spine AS (
          SELECT CAST(date_trunc('month', (SELECT MIN(o_orderdate) FROM orders))
                      AS DATE) AS month_start
          UNION ALL
          SELECT add_months(month_start, 1) FROM spine
          WHERE month_start < :max_month
        ),
        monthly AS (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
          FROM orders GROUP BY month_start
        )
        SELECT CAST(s.month_start AS STRING) AS month,
               COALESCE(m.n_orders, 0) AS n_orders,
               COALESCE(m.rev_cents, 0) / CAST(100.0 AS DOUBLE) AS revenue,
               CAST(SUM(COALESCE(m.rev_cents, 0))
                    OVER (ORDER BY s.month_start) AS BIGINT)
                 / CAST(100.0 AS DOUBLE) AS cumulative_revenue
        FROM spine s LEFT JOIN monthly m ON m.month_start = s.month_start
        WHERE s.month_start IS NOT NULL
        ORDER BY month
        """,
        args={"max_month": max_month},
    )
