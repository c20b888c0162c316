"""Data layout: Hive-style partitioned writes and partition-pruned scans.

The second big write-time lever after bucketing (plans/bucketing.py):
``partitionBy(col)`` lays files out as ``col=value/`` directories, so a
predicate on the partition column prunes whole directories at PLANNING
time — at 100 TB a scan for one event_type out of five touches 20% of
the files and reads zero bytes of the rest.  This is how the engine's
sink tables should be laid out for any column with bounded cardinality
that queries filter on (event type, date, tenant).

The registered query writes the `events` fixture partitioned by
`event_type` into a scratch directory (once per sf, reused after), then
answers an aggregate from two partitions.  The plan property — the scan
lists only the two matching directories — is asserted in
tests/test_plans.py::test_partitioned_scan_prunes_directories.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.scratch import materialize_once
from mysql_postgres_debezium_cdc_spark.sources.parquet import load

PARTITION_COL = "event_type"


def write_partitioned(df: DataFrame, path: str, partition_col: str = PARTITION_COL) -> None:
    """One-time layout shuffle: directory-partition ``df`` on a bounded-
    cardinality column every downstream query filters on."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def partitioned_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture version) the events fixture
    partitioned by event_type; return the path.  Staged + atomically
    renamed, keyed by sf and fixture fingerprint (see scratch.py)."""
    return materialize_once(
        sf_dir, "layout_events", lambda p: write_partitioned(load(spark, sf_dir, "events"), p)
    )


def read_partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the partitioned layout; ts comes back as micros timestamp
    (the write already normalized the fixture's nano timestamps)."""
    return spark.read.parquet(partitioned_events_path(spark, sf_dir))


@register(
    "layout_partition_pruned_scan",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("layout", "pruning"),
)
def layout_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over two of five event_type partitions.  The filter is
    a partition predicate, so the scan never opens the other three
    directories (PartitionFilters in the plan; pruning asserted in
    tests/test_plans.py)."""
    ev = read_partitioned_events(spark, sf_dir)
    return (
        ev.where(F.col(PARTITION_COL).isin("purchase", "signup"))
        .groupBy(PARTITION_COL)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy(PARTITION_COL)
    )


def compact_small_files(
    df: DataFrame, path: str, target_rows_per_file: int, total_rows: int | None = None
) -> None:
    """Small-file compaction: rewrite ``df`` into ~equal files of
    ``target_rows_per_file`` rows.

    The operational counterpart of streaming ingestion: every micro-batch
    writes a file per partition, and after a day a 100 TB table is
    millions of KB-sized files whose open/footer costs dominate scans.
    Compaction is one job: count (or reuse a known count), choose the
    file count, and rewrite via ``repartition(n)`` — a round-robin
    shuffle that yields uniform files regardless of input skew."""
    n = total_rows if total_rows is not None else df.count()
    n_files = max(1, -(-n // target_rows_per_file))  # ceil
    df.repartition(n_files).write.mode("overwrite").parquet(path)


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering: multi-dimensional data-skipping layout.
# ---------------------------------------------------------------------------

Z_BITS = 8  # bits per dimension after scaling into [0, 255]
Z_CELL_SHIFT = 8  # morton key >> this = cell id (top 4 bits of each dim)
Z_CUST_DIV = 64  # custkey units per grid step
Z_DAY_DIV = 8  # days per grid step
Z_EPOCH = "1995-01-01"  # precedes every fixture order date


def _morton_spark(x, y):
    """Interleave the low Z_BITS of two non-negative ints: bit i of x
    lands at 2i, bit i of y at 2i+1 — the Morton/Z-order curve key.
    Pure column bit-arithmetic (shift-mask-or terms, constant-folded
    into one codegen expression; no UDF)."""
    z = F.lit(0).cast("bigint")
    for i in range(Z_BITS):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


def _morton_sql(x: str, y: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@register(
    "layout_zorder_cells",
    oracle=f"""
    WITH dims AS (
      SELECT o_custkey,
             DATE_DIFF('day', DATE '{Z_EPOCH}', CAST(o_orderdate AS DATE)) AS day_n,
             LEAST(o_custkey // {Z_CUST_DIV}, 255) AS xd,
             LEAST(GREATEST(DATE_DIFF('day', DATE '{Z_EPOCH}',
                                       CAST(o_orderdate AS DATE)), 0)
                   // {Z_DAY_DIV}, 255) AS yd
      FROM orders
    ),
    keyed AS (
      SELECT o_custkey, day_n, ({_morton_sql('xd', 'yd')}) AS zkey
      FROM dims
    )
    SELECT CAST(zkey >> {Z_CELL_SHIFT} AS BIGINT) AS cell,
           COUNT(*) AS n_rows,
           MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
           MIN(day_n) AS min_day, MAX(day_n) AS max_day
    FROM keyed
    GROUP BY 1
    ORDER BY cell
    """,
    tags=("layout", "zorder"),
)
def layout_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering audit: scale (customer, order-day) onto a
    256x256 grid, Morton-interleave the grid coordinates, and report
    per-cell extent stats — the layout pass behind Delta OPTIMIZE
    ZORDER BY / Iceberg sort orders.  Writing files in zkey order
    bounds EVERY cell's (min,max) rectangle in BOTH dimensions at once,
    so file-level min/max stats prune scans filtered on either column
    (a single-column sort only bounds its own column; the interleave is
    what buys two-dimensional skipping).  The per-cell (min,max) pairs
    this query emits are exactly the skipping index a writer persists.

    The grid scaling (fixed units per step, clamped at 255) keeps the
    morton key monotone in each raw dimension, so cells are contiguous
    rectangles in RAW coordinate space — that is the property min/max
    skipping needs, and it holds at any scale factor (larger corpora
    saturate more of the grid; the production writer picks divisors
    from column stats the same way OPTIMIZE does).

    Plan shape at scale: the key is shift-mask-or terms fused into one
    whole-stage-codegen projection (no UDF, no shuffle); the cell
    rollup is a map-side-combining groupBy on a <=65536-key space.  The
    production writer inserts repartitionByRange(zkey) before writing
    so files tile the curve; the audit aggregate here is
    layout-independent (same cells whatever the partitioning), which is
    what makes it oracle-checkable."""
    o = load(spark, sf_dir, "orders")
    day_n = F.datediff(F.to_date("o_orderdate"), F.lit(Z_EPOCH).cast("date")).cast(
        "bigint"
    )
    dims = o.select(
        "o_custkey",
        day_n.alias("day_n"),
        F.least(F.expr(f"o_custkey DIV {Z_CUST_DIV}"), F.lit(255)).alias("xd"),
        F.least(
            F.greatest(day_n, F.lit(0)) / Z_DAY_DIV, F.lit(255.0)
        )
        .cast("bigint")
        .alias("yd"),
    )
    keyed = dims.select(
        "o_custkey", "day_n", _morton_spark(F.col("xd"), F.col("yd")).alias("zkey")
    )
    return (
        keyed.groupBy(
            F.shiftright(F.col("zkey"), Z_CELL_SHIFT).cast("bigint").alias("cell")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").alias("min_cust"),
            F.max("o_custkey").alias("max_cust"),
            F.min("day_n").alias("min_day"),
            F.max("day_n").alias("max_day"),
        )
        .orderBy("cell")
    )


@register(
    "layout_dpp_join_pruned_scan",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT event_type,
             CASE WHEN event_type IN ('purchase', 'signup')
                  THEN 'conversion' ELSE 'engagement' END AS type_class
      FROM events
    )
    SELECT e.event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events e
    JOIN dim d ON d.event_type = e.event_type
    WHERE d.type_class = 'conversion'
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    tags=("layout", "pruning", "dpp"),
)
def layout_dpp_join_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact scan's partition filter is
    discovered AT RUNTIME from the dim side of a join — the mechanism
    that makes star-schema queries over partitioned 100 TB fact tables
    feasible when the pruning predicate lives in a dimension attribute
    (here: type_class), not on the partition column itself.

    The dim is derived from data (a distinct scan + CASE), so Catalyst
    CANNOT constant-fold the filter into a static IN-list; instead the
    optimizer inserts a ``dynamicpruningexpression`` into the fact
    scan's PartitionFilters, reusing the broadcast dim as the filter —
    the fact side opens only the directories whose keys survived the
    dim filter.  Asserted in
    tests/test_plans.py::test_dpp_injects_runtime_partition_filter.

    Value sums ride as integer cents (per-group doubles here span
    thousands of rows, where cross-engine float ordering could flip a
    2-decimal rounding)."""
    ev = read_partitioned_events(spark, sf_dir)
    dim = (
        read_partitioned_events(spark, sf_dir)
        .select(PARTITION_COL)
        .distinct()
        .withColumn(
            "type_class",
            F.when(F.col(PARTITION_COL).isin("purchase", "signup"), "conversion").otherwise(
                "engagement"
            ),
        )
    )
    return (
        ev.select(PARTITION_COL, F.round(F.col("value") * 100).cast("bigint").alias("cents"))
        .join(dim.where(F.col("type_class") == "conversion"), PARTITION_COL)
        .groupBy(PARTITION_COL)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        .orderBy(PARTITION_COL)
    )


@register(
    "layout_bucketed_join_no_shuffle",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("layout", "bucketing", "join"),
)
def layout_bucketed_join_no_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketed-table join — the biggest single lever for a REPEATED
    fact⋈fact join at 100 TB: pay the hash shuffle ONCE at write time
    (``bucketBy(n, key).sortBy(key)``), and every subsequent join on
    the bucket key runs with ZERO exchanges and ZERO sorts (Spark
    trusts the on-disk HashPartitioning + sort order).  The reference's
    replica tables are keyed by PK — the natural bucket key — so a
    downstream consumer joins the replica shuffle-free.

    This registered form writes orders+lineitem bucketed by order key
    (once per session and fixture version; the write IS the amortized
    shuffle), joins the bucketed tables, and aggregates per priority.
    The answer is layout-independent — the oracle runs the plain join.
    At fixture scale AQE broadcasts the small orders side (also
    shuffle-free); at fact×fact scale, where neither side broadcasts,
    the bucketed SortMergeJoin with NO exchange on either side is the
    plan — pinned by tests/test_plans.py::test_bucketed_join_has_no_shuffle
    (merge-hinted) and test_bucketed_key_plan_never_shuffles_join_inputs
    on this very key.
    Values are exact integers, so the value hash certifies the
    bucket-file routing end to end (a row landing in the wrong bucket
    would vanish from the join)."""
    import tempfile

    from mysql_postgres_debezium_cdc_spark.plans.bucketing import write_bucketed
    from mysql_postgres_debezium_cdc_spark.scratch import fixture_fingerprint

    tag = fixture_fingerprint(sf_dir)
    tbl_o, tbl_l = f"orders_bkt_{tag}", f"lineitem_bkt_{tag}"
    # The write path is scoped per SESSION (applicationId), not just per
    # fixture fingerprint: catalog table names are session-local, so two
    # concurrent sessions would both see tableExists()=False and race
    # concurrent bucketed writes into a shared per-fingerprint path; a
    # session-scoped directory gives each its own, and stale directories
    # die with the application's temp space instead of accumulating
    # under one shared key (ADVICE r5).
    base = f"{tempfile.gettempdir()}/spark_graft_bkt_{spark.sparkContext.applicationId}"
    if not spark.catalog.tableExists(tbl_o):
        write_bucketed(
            load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
            tbl_o,
            f"{base}/bkt_orders_{tag}",
            "o_orderkey",
        )
    if not spark.catalog.tableExists(tbl_l):
        write_bucketed(
            load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
            tbl_l,
            f"{base}/bkt_lineitem_{tag}",
            "l_orderkey",
        )
    o = spark.table(tbl_o)
    li = spark.table(tbl_l)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Small-file compaction planning: the lake-maintenance pass that keeps a
# streaming-ingested table scannable.
# ---------------------------------------------------------------------------

COMPACT_TARGET_ROWS = 1000  # rows per compacted output file
COMPACT_BATCH_ROWS = 500  # modeled ingest micro-batch width (event_id range)


def compaction_plan(files: DataFrame, target_rows: int) -> DataFrame:
    """First-fit merge plan over a per-file inventory: ``files`` has
    (part, file_key, n_rows); within each partition, files are taken in
    file_key order and assigned to merge group floor(rows_before /
    target_rows) — contiguous groups of ~target_rows rows each, the
    standard bin-pack a compaction job (OPTIMIZE / rewriteDataFiles)
    executes.  Pure window arithmetic over the FILE INVENTORY (never
    the data): planning cost is O(files), so the plan for a million-file
    table is itself a small query.  Shared by the registered modeled-
    inventory key and the real input_file_name audit in
    tests/test_plans.py."""
    w = (
        Window.partitionBy("part")
        .orderBy("file_key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rows_before = F.coalesce(F.sum("n_rows").over(w), F.lit(0))
    return (
        files.withColumn("merge_group", F.floor(rows_before / target_rows))
        .groupBy("part", "merge_group")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )
        .orderBy("part", "merge_group")
    )


@register(
    "layout_compaction_plan",
    oracle=f"""
    WITH files AS (
      SELECT event_type AS part,
             event_id // {COMPACT_BATCH_ROWS} AS file_key,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM events
      GROUP BY 1, 2
    ),
    planned AS (
      SELECT part, file_key, n_rows,
             COALESCE(SUM(n_rows) OVER (
               PARTITION BY part ORDER BY file_key
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS rows_before
      FROM files
    )
    SELECT part AS event_type,
           CAST(FLOOR(rows_before / {COMPACT_TARGET_ROWS}) AS BIGINT)
             AS merge_group,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows
    FROM planned
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("layout", "compaction", "maintenance"),
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction PLAN — the maintenance query behind Delta
    OPTIMIZE / Iceberg rewriteDataFiles: given a per-file row inventory
    of a partitioned, streaming-ingested table, emit contiguous merge
    groups of ~COMPACT_TARGET_ROWS rows per partition.  A day of
    micro-batch ingest leaves one file per (batch, partition) — at
    100 TB that is millions of KB-files whose open/footer costs
    dominate scans; compaction planning is the query that decides what
    to rewrite, and it must cost O(files), not O(data).

    The registered form models the ingest inventory deterministically —
    one "file" per (event_type, event_id // COMPACT_BATCH_ROWS), i.e.
    one file per micro-batch per partition, with realistic skew because
    event types are uneven within each batch — so the full plan is
    DuckDB-value-checked at every scale.  The SAME planner runs over
    the real physical inventory (input_file_name() on the partitioned
    scratch layout) in tests/test_plans.py, where the assertions are
    the plan invariants rather than an oracle (physical file splits are
    engine-private).  [[compact_small_files]] is the execute half."""
    ev = load(spark, sf_dir, "events")
    files = (
        ev.select(
            F.col(PARTITION_COL).alias("part"),
            (F.col("event_id") / COMPACT_BATCH_ROWS).cast("bigint").alias("file_key"),
        )
        .groupBy("part", "file_key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
    return compaction_plan(files, COMPACT_TARGET_ROWS).select(
        F.col("part").alias("event_type"), "merge_group", "n_files", "n_rows"
    )


SKIP_LO, SKIP_HI = "1997-01-01", "1997-12-31"  # audit predicate: one mid-range ship year
SKIP_SHARDS = 32


@register(
    "layout_minmax_skipping_audit",
    oracle=f"""
    WITH facts AS (
      SELECT CAST(l_shipdate AS DATE) AS ship_day, l_orderkey FROM lineitem
    ),
    by_hash AS (
      SELECT 'hash_orderkey' AS layout, l_orderkey % {SKIP_SHARDS} AS shard,
             MIN(ship_day) AS lo, MAX(ship_day) AS hi
      FROM facts GROUP BY shard
    ),
    by_range AS (
      SELECT 'range_shipdate' AS layout,
             (YEAR(ship_day) * 4 + (MONTH(ship_day) - 1) // 3) % {SKIP_SHARDS}
               AS shard,
             MIN(ship_day) AS lo, MAX(ship_day) AS hi
      FROM facts GROUP BY shard
    ),
    shards AS (SELECT * FROM by_hash UNION ALL SELECT * FROM by_range)
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_shards,
           CAST(COUNT(CASE WHEN hi < DATE '{SKIP_LO}'
                             OR lo > DATE '{SKIP_HI}' THEN 1 END) AS BIGINT)
             AS n_skippable,
           ROUND(COUNT(CASE WHEN hi < DATE '{SKIP_LO}'
                              OR lo > DATE '{SKIP_HI}' THEN 1 END)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS skip_fraction
    FROM shards GROUP BY layout ORDER BY layout
    """,
    tags=("layout", "audit"),
)
def layout_minmax_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping effectiveness audit: per-shard min/max zone maps
    for two physical layouts of the same facts — key-hash sharding vs
    ship-date range sharding — scored against a representative year
    predicate.  This is the planning query run BEFORE committing to a
    table layout: hash layouts spread every date into every file
    (zone maps skip ~0%), date-clustered layouts skip all but the
    matching quarter-shards — the quantified version of the advice in
    `layout_partition_pruned_scan` / `layout_zorder_cells`.

    One groupBy per layout over the facts (both map-side combined),
    then arithmetic on the SHARD-sized relations.  Dates and shard ids
    are exact; the skip test is pure date comparison against literal
    bounds."""
    facts = load(spark, sf_dir, "lineitem").select(
        F.col("l_shipdate").cast("date").alias("ship_day"), "l_orderkey"
    )
    by_hash = facts.groupBy(
        (F.col("l_orderkey") % SKIP_SHARDS).alias("shard")
    ).agg(F.min("ship_day").alias("lo"), F.max("ship_day").alias("hi")).select(
        F.lit("hash_orderkey").alias("layout"), "shard", "lo", "hi"
    )
    quarter = (F.year("ship_day") * 4 + ((F.month("ship_day") - 1) / 3).cast("long"))
    by_range = facts.groupBy(
        (quarter % SKIP_SHARDS).alias("shard")
    ).agg(F.min("ship_day").alias("lo"), F.max("ship_day").alias("hi")).select(
        F.lit("range_shipdate").alias("layout"), "shard", "lo", "hi"
    )
    shards = by_hash.unionAll(by_range)
    skip = (F.col("hi") < F.lit(SKIP_LO).cast("date")) | (
        F.col("lo") > F.lit(SKIP_HI).cast("date")
    )
    return (
        shards.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shards"),
            F.count(F.when(skip, 1)).cast("bigint").alias("n_skippable"),
            F.round(
                F.count(F.when(skip, 1)) / F.count(F.lit(1)).cast("double"), 4
            ).alias("skip_fraction"),
        )
        .orderBy("layout")
    )
