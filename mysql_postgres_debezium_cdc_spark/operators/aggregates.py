"""Aggregation surface: hash agg, count-distinct, approx sketches,
rollup/cube/grouping-sets, min_by/max_by, stats, histogram bucketing.

Every groupBy here compiles to partial (map-side) + final hash
aggregation — the shuffle moves only pre-aggregated groups, not rows.
``approx_count_distinct`` is the HLL sketch path: constant memory per
group at any scale, mergeable across partitions (the 100 TB answer to
COUNT(DISTINCT) — exact distinct needs a full shuffle of the keys).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load


@register(
    "agg_group_basic",
    oracle="""
    SELECT
      o_orderstatus,
      o_orderpriority,
      COUNT(*) AS n_orders,
      ROUND(SUM(o_totalprice), 2) AS sum_price,
      ROUND(AVG(o_totalprice), 2) AS avg_price,
      ROUND(MIN(o_totalprice), 2) AS min_price,
      ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, o_orderpriority
    """,
    tags=("agg",),
)
def agg_group_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_approx_count_distinct",
    # HLL estimates are engine-specific, so the RAW estimate can't hash-
    # match an oracle — instead the query is self-certifying: it computes
    # approx AND exact in one aggregation and emits the exact count plus
    # a bound flag the oracle pins to 1 (the stateful-twin device).  A
    # sketch regression (estimate off by >5%) flips the flag and fails
    # the value check, not just a local test.
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           1 AS approx_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL, rsd=2%) — the 100 TB COUNT(DISTINCT)
    path — certified in-plan against the exact count."""
    li = load(spark, sf_dir, "lineitem")
    approx = F.approx_count_distinct("l_partkey", 0.02)
    exact = F.count_distinct(F.col("l_partkey"))
    return (
        li.groupBy("l_returnflag")
        .agg(
            exact.alias("exact_parts"),
            F.when(
                F.abs(approx - exact).cast("double") / exact <= 0.05, 1
            )
            .otherwise(0)
            .alias("approx_within_5pct"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("agg", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("agg", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "agg_min_by_max_by",
    oracle="""
    -- composite (price, key) orderings: bare-price MIN_BY/MAX_BY pick
    -- arbitrary rows among tied prices (ties-fixture finding)
    SELECT o_orderstatus,
           MIN({'p': o_totalprice, 'k': o_orderkey}).k AS cheapest_order,
           MAX({'p': o_totalprice, 'k': o_orderkey}).k AS priciest_order,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("agg", "minmax_by"),
)
def agg_min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by — the primitive behind CDC last-write-wins
    compaction.  Ordering keys are COMPOSITE (price, orderkey): with a
    bare price, tied values let each engine return a different row
    (ties-fixture finding) — the same totality rule every ORDER BY in
    the registry already follows."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.min_by(
                "o_orderkey", F.struct("o_totalprice", "o_orderkey")
            ).alias("cheapest_order"),
            F.max_by(
                "o_orderkey", F.struct("o_totalprice", "o_orderkey")
            ).alias("priciest_order"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_stats",
    oracle="""
    SELECT c_mktsegment,
           ROUND(STDDEV_SAMP(c_acctbal), 2) AS sd_bal,
           ROUND(VAR_SAMP(c_acctbal), 1)    AS var_bal,
           ROUND(MEDIAN(c_acctbal), 2)      AS median_bal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("agg", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev / variance / exact median per group.

    Exact median needs the full value set per group (Spark sorts within
    the hash-agg buffer) — at 100 TB swap for approx_percentile, which is
    a mergeable sketch like HLL.
    """
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.round(F.stddev_samp("c_acctbal"), 2).alias("sd_bal"),
            F.round(F.var_samp("c_acctbal"), 1).alias("var_bal"),
            F.round(F.median("c_acctbal"), 2).alias("median_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "agg_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS price_bucket,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
    ORDER BY price_bucket
    """,
    tags=("agg", "histogram"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form bucketing — the scale-safe alternative to a range join."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("price_bucket")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("price_bucket")
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey,
           ARRAY_TO_STRING(LIST_SORT(LIST(n_name)), '|') AS nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    tags=("agg", "collect"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list + array_sort: deterministic ordered-list aggregation.

    The sorted list is serialized to a '|'-joined string: the driver's
    pandas canonicalizer cannot hash ndarray cells, so no registry query
    may emit array/map/struct output (enforced registry-wide by the
    complex_type_fields guard inside tests/test_oracle_parity.py).  The
    string form carries the identical information and is certifiable.
    """
    n = load(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias(
                "nations"
            )
        )
        .orderBy("n_regionkey")
    )


@register(
    "agg_percentiles",
    oracle="""
    -- Percentiles interpolate over INTEGER CENTS: interpolating raw
    -- 2-decimal doubles lands on .xx5 midpoints whose inexact doubles
    -- round differently across engines at small N (caught by the
    -- sf0.001 sweep); on integers the p50 midpoint is an exact .5 and
    -- FLOOR(x+0.5) is half-up in both engines.
    SELECT l_returnflag,
           FLOOR(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY CAST(ROUND(l_extendedprice * 100) AS BIGINT)) + 0.5) / 100.0 AS p50,
           FLOOR(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY CAST(ROUND(l_extendedprice * 100) AS BIGINT)) + 0.5) / 100.0 AS p90,
           FLOOR(PERCENTILE_CONT(0.99) WITHIN GROUP (ORDER BY CAST(ROUND(l_extendedprice * 100) AS BIGINT)) + 0.5) / 100.0 AS p99
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation) per group.  Exact
    percentile sorts within each group — at 100 TB prefer
    ``approx_percentile`` (t-digest-style sketch, mergeable, one pass);
    the exact form here is the oracle-checkable baseline."""
    li = load(spark, sf_dir, "lineitem")
    # Integer-cents domain (see oracle comment): interpolation midpoints
    # become exact halves, so rounding agrees bit-for-bit cross-engine
    # even on two-element groups.
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")

    def pct(q):
        return F.floor(F.percentile(cents, F.lit(q)) + F.lit(0.5)) / 100.0

    return (
        li.groupBy("l_returnflag")
        .agg(
            pct(0.5).alias("p50"),
            pct(0.9).alias("p90"),
            pct(0.99).alias("p99"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_hll_sketch_mergeable",
    # DataSketches HLL internals are engine-specific, so the query
    # certifies itself: the oracle pins the exact count plus two flags —
    # merged-estimate-within-5%-of-exact, and merge-of-group-sketches
    # agreeing with direct whole-column sketching (the associativity
    # property that makes sketches the 100 TB path: pre-aggregate per
    # partition / day / shard, union later, never rescan).
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS exact_global_parts,
           1 AS merged_within_5pct,
           1 AS merge_agrees_direct
    FROM lineitem
    """,
    tags=("agg", "approx", "sketch"),
)
def agg_hll_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Spark 4 DataSketches functions): per-group
    sketches unioned into a global distinct-count WITHOUT touching rows
    again, with the union path checked against both exact and direct."""
    li = load(spark, sf_dir, "lineitem")
    per_group = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sketch")
    )
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_merged")
    )
    whole = li.agg(
        F.count_distinct(F.col("l_partkey")).alias("exact_global_parts"),
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("est_direct"),
    )
    j = merged.crossJoin(whole)  # two 1-row frames
    exact = F.col("exact_global_parts")
    return j.select(
        exact,
        F.when(F.abs(F.col("est_merged") - exact).cast("double") / exact <= 0.05, 1)
        .otherwise(0)
        .alias("merged_within_5pct"),
        # union-of-sketches and direct sketching take different register
        # paths; both must land within the error bound of each other
        F.when(
            F.abs(F.col("est_merged") - F.col("est_direct")).cast("double") / exact
            <= 0.05,
            1,
        )
        .otherwise(0)
        .alias("merge_agrees_direct"),
    )


@register(
    "agg_approx_percentile",
    # GK-sketch quantiles are engine-specific (DuckDB's approx_quantile
    # is a different sketch), so the query certifies itself: the oracle
    # pins the EXACT percentiles plus a flag saying each approximate
    # value fell inside the exact [p−0.01, p+0.01] quantile band — 100×
    # looser than the sketch's guaranteed 1e-4 rank error at
    # accuracy=10000, so a pass means the sketch works and a flip means
    # it is badly broken.
    oracle="""
    SELECT l_returnflag,
           FLOOR(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY CAST(ROUND(l_extendedprice * 100) AS BIGINT)) + 0.5) / 100.0 AS p50,
           FLOOR(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY CAST(ROUND(l_extendedprice * 100) AS BIGINT)) + 0.5) / 100.0 AS p90,
           FLOOR(PERCENTILE_CONT(0.99) WITHIN GROUP (ORDER BY CAST(ROUND(l_extendedprice * 100) AS BIGINT)) + 0.5) / 100.0 AS p99,
           1 AS approx_in_band
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "approx", "percentile"),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 per group (single-pass, mergeable sketch).

    `percentile_approx` (Greenwald-Khanna) is THE quantile path at
    100 TB: exact percentiles need a full sort (or per-group collected
    arrays — memory-unbounded on a hot group), while the sketch is
    fixed-size per group, merges associatively across partitions, and
    its error is bounded by the accuracy knob (10000 ≈ 0.01%%-ile)."""
    li = load(spark, sf_dir, "lineitem")
    pcts = F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000)
    bands = F.percentile(
        F.col("l_extendedprice"),
        F.array(*[F.lit(x) for x in (0.49, 0.51, 0.89, 0.91, 0.98, 1.0)]),
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    exact = F.percentile(cents, F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    in_band = (
        pcts[0].between(bands[0], bands[1])
        & pcts[1].between(bands[2], bands[3])
        & pcts[2].between(bands[4], bands[5])
        # below 100 rows a ±0.01-quantile band spans no element while
        # the element-valued sketch answer is exact — the check abstains
        # (degenerate-fixture finding; real groups are far larger)
        | (F.count(F.lit(1)) < 100)
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            # same integer-cents device as agg_percentiles
            (F.floor(exact[0] + F.lit(0.5)) / 100.0).alias("p50"),
            (F.floor(exact[1] + F.lit(0.5)) / 100.0).alias("p90"),
            (F.floor(exact[2] + F.lit(0.5)) / 100.0).alias("p99"),
            F.when(in_band, 1).otherwise(0).alias("approx_in_band"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_mode_deterministic",
    oracle="""
    WITH counts AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
    ),
    ranked AS (
      SELECT o_orderstatus, o_orderpriority, cnt,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY cnt DESC, o_orderpriority) AS rk
      FROM counts
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS mode_count
    FROM ranked WHERE rk = 1
    ORDER BY o_orderstatus
    """,
    tags=("agg", "mode"),
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE: most frequent order priority per status,
    ties broken lexicographically.

    Built as count→rank rather than the built-in ``F.mode`` because
    mode's tie choice is engine- (and partition-order-) dependent — the
    explicit (cnt DESC, value ASC) rank is the only formulation two
    engines can agree on bit-for-bit.  Physical shape: the groupBy
    partially aggregates map-side, the rank window runs over
    |statuses|×|priorities| rows (tiny), so the table is read once and
    shuffled once on the composite key."""
    o = load(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("cnt"), F.asc("o_orderpriority"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").alias("mode_count"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_string_concat_ordered",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n,
           STRING_AGG(c_name, ',' ORDER BY c_name) AS names_sorted
    FROM customer
    WHERE c_custkey < 60
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("agg", "listagg"),
)
def agg_string_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG WITHIN GROUP).
    Spark's listagg/collect_list order is partition-arrival order —
    nondeterministic under shuffles — so the portable formulation
    sorts INSIDE the aggregated array before joining: identical output
    on any partitioning and any engine.  The key-bounded filter keeps
    the concatenated payload small; at scale, cap group width the same
    way (top-k per group) before concatenating."""
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") < 60)
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias(
                "names_sorted"
            ),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "agg_bool_and_or",
    oracle="""
    SELECT l_returnflag,
           BOOL_AND(l_quantity > 0)    AS all_positive_qty,
           BOOL_OR(l_discount > 0.09)  AS any_deep_discount,
           BOOL_AND(l_tax <= 0.08)     AS all_low_tax
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "boolean"),
)
def agg_bool_and_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/some): per-group invariant checks — the
    aggregation form of a data-quality assertion, short-circuitable and
    partial-aggregated like any other agg."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
            F.bool_and(F.col("l_tax") <= 0.08).alias("all_low_tax"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Heavy hitters: distributed Misra-Gries candidates + exact verification.
# ---------------------------------------------------------------------------

_MG_K = 50  # heavy-hitter threshold: count * K > N  (i.e. freq > N/K)


def _mg_candidates(batches):
    """Per-partition Misra-Gries summary (mergeable-summaries form,
    Agarwal et al. 2012): accumulate vectorized value_counts per Arrow
    batch; when more than K counters are live, subtract the (K+1)-th
    largest weight from all and drop non-positive ones.  Total
    underestimate per partition is <= N_p/(K+1), so every token with
    partition count > N_p/(K+1) keeps positive weight — and any GLOBAL
    heavy hitter (count > N/K > N/(K+1)) must beat that bound in at
    least one partition (else summing the per-partition bounds
    contradicts the global count).  The emitted candidate set therefore
    provably contains all true heavy hitters, in <= K rows per
    partition, regardless of data size.
    """
    import pandas as pd

    agg = None
    for pdf in batches:
        vc = pdf["token"].value_counts()
        agg = vc if agg is None else agg.add(vc, fill_value=0)
        if len(agg) > _MG_K:
            agg = agg.sort_values(ascending=False)
            agg = (agg - agg.iloc[_MG_K]).iloc[:_MG_K]
            agg = agg[agg > 0]
    yield pd.DataFrame({"token": [] if agg is None else agg.index.astype(str)})


@register(
    "agg_heavy_hitters_mg",
    bench=True,
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    t AS (SELECT token FROM toks WHERE token <> ''),
    tot AS (SELECT COUNT(*) AS n FROM t)
    SELECT token, COUNT(*) AS cnt
    FROM t CROSS JOIN tot
    GROUP BY token, n
    HAVING COUNT(*) * {_MG_K} > n
    ORDER BY token
    """,
    tags=("agg", "sketch", "llm"),
)
def agg_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent tokens (count > N/{K}) via the two-phase shape that is
    the 100 TB answer to heavy hitters: (1) one streaming pass builds a
    constant-memory Misra-Gries summary per partition — at most K
    candidate rows leave each partition, so the shuffle is O(K x
    partitions) no matter how many tokens exist; (2) an exact count of
    the candidates only (broadcast semi-join — the candidate relation is
    tiny by construction).  Because MG guarantees the candidate set is a
    superset of the true heavy hitters, phase 2's exact counts make the
    final answer EXACT and deterministic, which is why a plain SQL
    oracle can value-check a sketch-based plan.  The full-data pass
    crosses into Python via Arrow (vectorized value_counts per batch,
    batch-level decrements) — the sketch pass is the single pass over
    the data, everything after is candidate-sized.

    The plan reads documents three times (sketch pass, candidate count,
    total-N count), each scan pruned to the text column — deliberate: at
    100 TB, re-scanning one projected column twice more is cheaper than
    caching the exploded token stream, and the N-pass is a pure count
    that parquet metadata + codegen make near-free relative to the Arrow
    sketch pass.

    Reference parity: the reference has no sketch surface (SURVEY.md
    §2.2 aggregation gap); this pairs with agg_approx_count_distinct /
    agg_hll_sketch_mergeable as the mergeable-summary family.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda c: F.length(c) > 0)
        ).alias("token")
    )
    candidates = toks.mapInPandas(_mg_candidates, "token string").distinct()
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    return (
        toks.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") * _MG_K > F.col("n"))
        .select("token", "cnt")
        .orderBy("token")
    )


SKEW_TOP_N = 10


@register(
    "agg_skew_profile",
    oracle=f"""
    WITH per_key AS (
      SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_suppkey
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS total_rows,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt
      FROM per_key
    ),
    ranked AS (
      SELECT key, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rk,
             SUM(cnt) OVER (ORDER BY cnt DESC, key
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM per_key
    )
    SELECT r.rk, r.key, r.cnt,
           ROUND(r.cnt * 1.0 / s.total_rows, 6) AS share,
           ROUND(r.cum * 1.0 / s.total_rows, 6) AS cum_share,
           s.n_keys, s.total_rows,
           CAST(CEIL(s.max_cnt * s.n_keys * 1.0 / s.total_rows) AS BIGINT)
             AS salt_buckets
    FROM ranked r CROSS JOIN stats s
    WHERE r.rk <= {SKEW_TOP_N}
    ORDER BY r.rk
    """,
    tags=("agg", "skew", "diagnostics"),
)
def agg_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis — the operator you run BEFORE deciding
    whether a fact-fact join needs salting ([[join_salted_skew]]) or
    AQE's skew-join split suffices: per-key frequencies for a join key
    (l_suppkey), the top-N heaviest keys with their corpus share and
    cumulative share, and the standard salting recommendation
    ``ceil(max_cnt / avg_cnt)`` (how many buckets split the heaviest
    key down to the average).

    Scale shape: ONE map-side-combining count per key (the shuffle
    carries distinct keys, not rows); the stats relation is one row
    (broadcast); top-N comes from ``orderBy().limit(N)`` —
    TakeOrderedAndProject keeps an N-row heap per partition, so there
    is NO unpartitioned window over the |keys|-sized relation (the
    window_ntile lesson); rank and cumulative share then run on the
    constant N-row relation.  All shares are single divisions of
    exact integers (6dp round for presentation)."""
    li = load(spark, sf_dir, "lineitem").select("l_suppkey")
    per_key = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    top = per_key.orderBy(F.desc("cnt"), F.asc("key")).limit(SKEW_TOP_N)
    # Window over exactly SKEW_TOP_N rows — constant-size, not a scale
    # hazard (the kmeans-init precedent).
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    ranked = top.withColumn("rk", F.row_number().over(w).cast("bigint")).withColumn(
        "cum", F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        ranked.crossJoin(F.broadcast(stats))
        .select(
            "rk",
            "key",
            "cnt",
            F.round(F.col("cnt") * 1.0 / F.col("total_rows"), 6).alias("share"),
            F.round(F.col("cum") * 1.0 / F.col("total_rows"), 6).alias("cum_share"),
            "n_keys",
            "total_rows",
            F.ceil(F.col("max_cnt") * F.col("n_keys") * 1.0 / F.col("total_rows"))
            .cast("bigint")
            .alias("salt_buckets"),
        )
        .orderBy("rk")
    )


BITMAP_WORD = 32  # ids pack 32-per-word: 1<<31 stays positive in BIGINT


@register(
    "agg_bitmap_exact_distinct",
    oracle=f"""
    WITH words AS (
      SELECT event_type, user_id // {BITMAP_WORD} AS word,
             BIT_OR(1::BIGINT << CAST(user_id % {BITMAP_WORD} AS INT)) AS mask
      FROM events GROUP BY 1, 2
    ),
    bm AS (
      SELECT event_type,
             CAST(SUM(BIT_COUNT(mask)) AS BIGINT) AS n_distinct_bitmap
      FROM words GROUP BY event_type
    ),
    ex AS (
      SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_exact
      FROM events GROUP BY event_type
    )
    SELECT bm.event_type, n_distinct_bitmap, n_distinct_exact,
           CASE WHEN n_distinct_bitmap = n_distinct_exact THEN 1 ELSE 0 END
             AS bitmap_matches
    FROM bm JOIN ex ON ex.event_type = bm.event_type
    ORDER BY bm.event_type
    """,
    tags=("agg", "bitmap", "distinct"),
)
def agg_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via packed bitmaps — the roaring-bitmap
    trick for bounded-id domains, relational-style: ids pack 32-per-
    word, each (group, word) ORs its bits (map-side combining — the
    shuffle carries ≤ one BIGINT per word per map partition), and the
    distinct count is the bit_count sum.  Against COUNT(DISTINCT),
    which shuffles every distinct VALUE, the bitmap shuffles
    |id-domain|/32 words regardless of row count — the standard layout
    for distinct-user counting over dense integer keyspaces (what
    ClickHouse's groupBitmap and Druid's bitmap indexes do).  The
    output carries BOTH counts and pins their equality, so the value
    hash certifies the bitmap math itself.

    Scale note: for SPARSE or unbounded domains the words relation
    degenerates to one word per id — that regime belongs to HLL
    ([[agg_approx_count_distinct]]) or plain distinct; the op's
    contract is dense bounded ids (user ids, fixture: 0..2k)."""
    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    words = (
        ev.groupBy(
            "event_type",
            (F.col("user_id") / BITMAP_WORD).cast("long").alias("word"),
        )
        .agg(
            F.bit_or(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(user_id % {BITMAP_WORD} AS INT))")
            ).alias("mask")
        )
    )
    bm = words.groupBy("event_type").agg(
        F.sum(F.bit_count(F.col("mask"))).cast("bigint").alias("n_distinct_bitmap")
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_distinct_exact")
    )
    return (
        bm.join(ex, "event_type")
        .select(
            "event_type",
            "n_distinct_bitmap",
            "n_distinct_exact",
            F.when(
                F.col("n_distinct_bitmap") == F.col("n_distinct_exact"), 1
            ).otherwise(0).alias("bitmap_matches"),
        )
        .orderBy("event_type")
    )


# Count-Min sketch geometry: D independent hash rows x W counters.
# Hash_j(u) = ((a_j * u + b_j) % P) % W with P Mersenne-31 and a_j/b_j
# derived from the row index by the same Weyl-style mixed congruence the
# LSH hyperplanes use (llm/similarity.py) — pure BIGINT arithmetic both
# engines evaluate bit-identically, which is what makes a sketch plan
# value-checkable end-to-end.  u <= ~2^21 and a_j < 2^31 keep a_j*u
# inside BIGINT.
CMS_D = 4
CMS_W = 64
CMS_P = 2147483647
CMS_TOP = 10
_CMS_A = "((j * 8191 + 1) * 2654435761 % 2147483647)"
_CMS_B = "((j * 524287 + 97) % 2147483647)"
_CMS_CELL = f"(({_CMS_A} * user_id + {_CMS_B}) % {CMS_P}) % {CMS_W}"


@register(
    "agg_countmin_sketch",
    oracle=f"""
    WITH counts AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_cnt
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT c.user_id, c.true_cnt, j, {_CMS_CELL} AS cell
      FROM counts c CROSS JOIN (SELECT UNNEST(RANGE(0, {CMS_D})) AS j)
    ),
    sketch AS (
      SELECT j, cell, CAST(SUM(true_cnt) AS BIGINT) AS v
      FROM cells GROUP BY j, cell
    ),
    top AS (
      SELECT user_id, true_cnt FROM counts
      ORDER BY true_cnt DESC, user_id LIMIT {CMS_TOP}
    )
    SELECT t.user_id, t.true_cnt,
           CAST(MIN(s.v) AS BIGINT) AS cms_est,
           CASE WHEN MIN(s.v) >= t.true_cnt THEN 1 ELSE 0 END AS no_undercount
    FROM top t
    JOIN cells h ON h.user_id = t.user_id
    JOIN sketch s ON s.j = h.j AND s.cell = h.cell
    GROUP BY t.user_id, t.true_cnt
    ORDER BY t.true_cnt DESC, t.user_id
    """,
    tags=("agg", "sketch", "mergeable"),
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation, built as a MERGEABLE
    relational aggregate: per-key partial counts combine map-side, each
    key fans out to D (row, cell) coordinates, and the sketch is a
    groupBy(j, cell) SUM — cell-wise addition, which is exactly the CMS
    merge operator, so Spark's partial aggregation IS the distributed
    sketch union (one executor's sketch + another's = the sum the
    shuffle computes).  The sketch relation is D x W = {CMS_D}x{CMS_W}
    rows REGARDLESS of corpus size — at 100 TB the data pass is one
    map-side-combined count and an O(D·W) broadcastable summary, the
    same constant-memory contract as [[agg_heavy_hitters_mg]] and
    [[agg_hll_sketch_mergeable]].

    The output queries the sketch for the top-{CMS_TOP} true-frequency
    keys: estimate = min over the D cells (classic CMS point query),
    with the true count alongside and the CMS no-undercount guarantee
    (est >= true, always) pinned as a checked column.  Deterministic by
    construction — hash constants are engine-portable arithmetic, no
    RNG — so the DuckDB oracle rebuilds the identical sketch and the
    value hash certifies the whole estimate, not just its shape."""
    ev = load(spark, sf_dir, "events").select("user_id")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("true_cnt"))
    cells = counts.select(
        "user_id",
        "true_cnt",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("j"),
    ).withColumn("cell", F.expr(_CMS_CELL))
    sketch = cells.groupBy("j", "cell").agg(F.sum("true_cnt").cast("bigint").alias("v"))
    top = counts.orderBy(F.desc("true_cnt"), F.asc("user_id")).limit(CMS_TOP)
    return (
        top.join(cells.select("user_id", "j", "cell"), "user_id")
        .join(F.broadcast(sketch), ["j", "cell"])
        .groupBy("user_id", "true_cnt")
        .agg(
            F.min("v").cast("bigint").alias("cms_est"),
            F.when(F.min("v") >= F.first("true_cnt"), 1).otherwise(0).alias("no_undercount"),
        )
        .orderBy(F.desc("true_cnt"), F.asc("user_id"))
    )


# Equi-width histogram-quantile sketch geometry: $100-wide buckets over
# integer cents.  The bucket-count relation is the SKETCH — cell-wise
# SUM-mergeable exactly like [[agg_countmin_sketch]]'s rows, so Spark's
# partial aggregation is the distributed sketch union.
HQ_BUCKET_CENTS = 10000
HQ_QUANTILES = (25, 50, 90, 99)  # integer percents


@register(
    "agg_quantile_histogram_sketch",
    oracle=f"""
    WITH cents AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem
    ),
    hist AS (
      SELECT c // {HQ_BUCKET_CENTS} AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM cents GROUP BY 1
    ),
    cum AS (
      SELECT bucket, cnt,
             CAST(COALESCE(SUM(cnt) OVER (
               ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS cum_prev
      FROM hist
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cents),
    qs AS (SELECT UNNEST([{", ".join(str(q) for q in HQ_QUANTILES)}]) AS q_pct),
    targets AS (
      SELECT q_pct, n, (n * q_pct + 99) // 100 AS target_rank
      FROM qs CROSS JOIN n
    ),
    est AS (
      SELECT t.q_pct, t.n, t.target_rank, c.bucket,
             c.bucket * {HQ_BUCKET_CENTS} * 1000
               + ({HQ_BUCKET_CENTS} * 1000 * (t.target_rank - c.cum_prev)) // c.cnt
               AS est_millicents
      FROM targets t JOIN cum c
        ON c.cum_prev < t.target_rank AND c.cum_prev + c.cnt >= t.target_rank
    ),
    exact AS (
      SELECT 25 AS q_pct, QUANTILE_CONT(c, 0.25) AS exact_cents FROM cents
      UNION ALL SELECT 50, QUANTILE_CONT(c, 0.50) FROM cents
      UNION ALL SELECT 90, QUANTILE_CONT(c, 0.90) FROM cents
      UNION ALL SELECT 99, QUANTILE_CONT(c, 0.99) FROM cents
    )
    SELECT e.q_pct, e.n, e.target_rank, e.bucket, e.est_millicents,
           x.exact_cents,
           ROUND(ABS(e.est_millicents / 1000.0 - x.exact_cents), 4)
             AS err_cents
    FROM est e JOIN exact x ON x.q_pct = e.q_pct
    ORDER BY e.q_pct
    """,
    tags=("agg", "sketch", "percentile", "mergeable"),
)
def agg_quantile_histogram_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from an equi-width histogram SKETCH, with the
    exact percentile alongside as a self-evaluation — the
    fixed-memory-quantiles pattern for data whose range is known (money,
    latencies with a cap): bucket counts are one map-side-combined
    aggregate, the sketch is range/width rows however big the corpus,
    merging two sketches is cell-wise addition, and any quantile reads
    off the cumulative counts with within-bucket linear interpolation.
    Contrast with [[agg_approx_percentile]] (t-digest: unknown range,
    relative-accuracy) — the histogram wins when the domain is fixed
    because reads are exact-rank-bounded: the target ORDER STATISTIC
    provably lies in the chosen bucket, so error ≤ one bucket width
    plus interpolation-definition skew.

    Scale shape: ONE corpus pass (narrow map to bucket + partial agg);
    the cumulative window runs on the bucket relation (range/width ≈
    hundreds of rows — the [[skyline_pareto_parts]] tiny-relation
    pattern); quantile targets and the 1-row total broadcast.  The
    EXACT percentile column is the eval baseline (full per-group sort,
    same caveat as agg_percentiles) — production reads skip it and pay
    only the sketch.

    Exactness: counts/targets/interpolation are pure BIGINT arithmetic
    (floor-divided millicents); the exact percentile follows the
    established cross-engine interpolation contract (quarter-grid
    decimals at these q values), and err keeps every digit at 4dp."""
    li = load(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c")
    )
    hist = li.groupBy(F.expr(f"c DIV {HQ_BUCKET_CENTS}").alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.withColumn(
        "cum_prev", F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("bigint")
    )
    n = li.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    qs = spark.createDataFrame([(q,) for q in HQ_QUANTILES], "q_pct int")
    targets = qs.crossJoin(F.broadcast(n)).withColumn(
        "target_rank", F.expr("(n * q_pct + 99) DIV 100")
    )
    est = targets.join(
        F.broadcast(cum),
        (F.col("cum_prev") < F.col("target_rank"))
        & (F.col("cum_prev") + F.col("cnt") >= F.col("target_rank")),
    ).withColumn(
        "est_millicents",
        F.expr(
            f"bucket * {HQ_BUCKET_CENTS} * 1000"
            f" + ({HQ_BUCKET_CENTS} * 1000 * (target_rank - cum_prev)) DIV cnt"
        ),
    )
    exact_row = li.agg(
        *[
            F.percentile("c", F.lit(q / 100.0)).alias(f"x{q}")
            for q in HQ_QUANTILES
        ]
    )
    exact = exact_row.select(
        F.expr(
            "stack({}, {}) AS (q_pct, exact_cents)".format(
                len(HQ_QUANTILES),
                ", ".join(f"{q}, x{q}" for q in HQ_QUANTILES),
            )
        )
    )
    return (
        est.join(F.broadcast(exact), "q_pct")
        .select(
            "q_pct",
            "n",
            "target_rank",
            "bucket",
            "est_millicents",
            "exact_cents",
            F.round(
                F.abs(F.col("est_millicents") / 1000.0 - F.col("exact_cents")), 4
            ).alias("err_cents"),
        )
        .orderBy("q_pct")
    )
