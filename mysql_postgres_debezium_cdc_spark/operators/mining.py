"""Data-mining analytics over the star schema: market-basket affinity
and skyline (Pareto-frontier) queries.

Reference parity: the reference engine's analytical surface is plain
scan/project/sort SQL (`/root/reference/consumer/src/main/resources/`
DDL + the verification query, SURVEY.md §2.1 Q1); these operators are
part of the §2.2 extension inventory — the mining primitives a
warehouse sitting downstream of the CDC pipeline is actually queried
with.

Scale notes live on each operator; the shared theme is that both avoid
the quadratic formulation their textbook definitions suggest (all-pairs
dominance for skyline, all-pairs item co-occurrence for baskets) in the
ENGINE while the DuckDB oracle runs the quadratic definition — the
value check is therefore a proof that the distributed algorithm equals
the definition, not just that two copies of the same code agree.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load

MIN_CO_ORDERS = 5  # minimum co-occurrence support (absolute orders)
TOP_PAIRS = 50


@register(
    "basket_affinity_pairs",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders FROM baskets),
    brand_cnt AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS cnt FROM baskets GROUP BY brand
    ),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(COUNT(*) AS BIGINT) AS co_orders
      FROM baskets a JOIN baskets b
        ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    )
    SELECT brand_a, brand_b, co_orders,
           ca.cnt AS cnt_a, cb.cnt AS cnt_b, n.n_orders,
           (co_orders * n.n_orders * 1000000) // (ca.cnt * cb.cnt) AS lift_ppm
    FROM pairs
    JOIN brand_cnt ca ON ca.brand = brand_a
    JOIN brand_cnt cb ON cb.brand = brand_b
    CROSS JOIN n
    WHERE co_orders >= {MIN_CO_ORDERS}
    ORDER BY lift_ppm DESC, brand_a, brand_b
    LIMIT {TOP_PAIRS}
    """,
    tags=("mining", "basket", "affinity"),
)
def basket_affinity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: brand pairs that co-occur in the same
    order, with exact lift = P(a,b) / (P(a)·P(b)) — the association-rule
    screen (which product families sell together) run as a relational
    plan.

    Scale shape: items roll up to BRAND before pairing, so the
    per-order pair expansion is bounded by (brands-per-order choose 2)
    — at most (25 choose 2) however many line items an order has — and
    the pair relation is at most |brands|² rows regardless of corpus
    size.  The self-join shuffles both sides on okey ONCE (same key ⇒
    one exchange each, co-partitioned SMJ); brand_cnt and the 1-row
    total broadcast.  At 100 TB the same plan holds because every
    post-join relation is brands²-sized.

    Exactness: lift is emitted in parts-per-million via pure BIGINT
    floor division — (co·N·10⁶) div (cnt_a·cnt_b) — so both engines
    compute the identical integer (no float quotient, no rounding-mode
    boundary).  Fits BIGINT while co·N·10⁶ < 2⁶³ (orders ≲ 3×10⁶ per
    engine run at this formulation; shift to DECIMAL(38) beyond)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    n = baskets.agg(F.countDistinct("okey").cast("bigint").alias("n_orders"))
    brand_cnt = baskets.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    a = baskets.select(F.col("okey"), F.col("brand").alias("brand_a"))
    b = baskets.select(F.col("okey"), F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, "okey")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("co_orders"))
        .where(F.col("co_orders") >= MIN_CO_ORDERS)
    )
    ca = brand_cnt.select(F.col("brand").alias("brand_a"), F.col("cnt").alias("cnt_a"))
    cb = brand_cnt.select(F.col("brand").alias("brand_b"), F.col("cnt").alias("cnt_b"))
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "lift_ppm",
            F.expr("co_orders * n_orders * 1000000 DIV (cnt_a * cnt_b)"),
        )
        .select(
            "brand_a", "brand_b", "co_orders", "cnt_a", "cnt_b", "n_orders", "lift_ppm"
        )
        .orderBy(F.desc("lift_ppm"), "brand_a", "brand_b")
        .limit(TOP_PAIRS)
    )


SKYLINE_BUCKET_CENTS = 1000  # $10-wide price buckets for the prefix-max pass


@register(
    "skyline_pareto_parts",
    oracle="""
    WITH pts AS (
      SELECT p_partkey,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
             p_size
      FROM part
    )
    SELECT a.p_partkey, a.price_cents, a.p_size
    FROM pts a
    WHERE NOT EXISTS (
      SELECT 1 FROM pts b
      WHERE b.price_cents <= a.price_cents AND b.p_size >= a.p_size
        AND (b.price_cents < a.price_cents OR b.p_size > a.p_size)
    )
    ORDER BY a.price_cents, a.p_partkey
    """,
    tags=("mining", "skyline", "window"),
)
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier of parts on (price ↓ better, size ↑
    better): every part not dominated by a cheaper-or-equal part of
    greater-or-equal size (strict in at least one) — the classic
    multi-criteria shortlist query.

    The ORACLE runs the quadratic textbook definition (NOT EXISTS over
    all pairs); the ENGINE runs the O(n log n) 2-D sweep, distributed:
    a point survives iff its size strictly exceeds the max size of all
    STRICTLY CHEAPER points and equals the max size at its own price.
    The running "max size of cheaper" is computed WITHOUT a global
    single-partition window (the r3 NTILE lesson): prices hash into
    $10 buckets, a bucket-level max-size relation (tiny — one row per
    non-empty bucket) gets an exclusive prefix max, broadcasts back,
    and the residual intra-bucket running max is a window PARTITIONED
    by bucket — every corpus-sized stage is hash-parallel.

    Exactness: prices are integer cents (round(double·100) — the
    fixture's 2dp doubles round identically in both engines), sizes are
    INTs; dominance compares integers only."""
    pts = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("price_cents"),
        "p_size",
    )
    pts = pts.withColumn(
        "bucket", F.expr(f"price_cents DIV {SKYLINE_BUCKET_CENTS}")
    )
    # Tiny relation: one row per non-empty price bucket.
    bucket_max = pts.groupBy("bucket").agg(F.max("p_size").alias("bmax"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefix = bucket_max.select(
        "bucket", F.max("bmax").over(wb).alias("prev_buckets_max")
    )
    w_cheaper = (
        Window.partitionBy("bucket")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_price = Window.partitionBy("price_cents")
    scored = (
        pts.join(F.broadcast(prefix), "bucket")
        .withColumn("intra_max", F.max("p_size").over(w_cheaper))
        .withColumn(
            "cheaper_max",
            F.greatest(
                F.coalesce(F.col("prev_buckets_max"), F.lit(-1)),
                F.coalesce(F.col("intra_max"), F.lit(-1)),
            ),
        )
        .withColumn("same_price_max", F.max("p_size").over(w_price))
    )
    return (
        scored.where(
            (F.col("p_size") > F.col("cheaper_max"))
            & (F.col("p_size") == F.col("same_price_max"))
        )
        .select("p_partkey", "price_cents", "p_size")
        .orderBy("price_cents", "p_partkey")
    )
