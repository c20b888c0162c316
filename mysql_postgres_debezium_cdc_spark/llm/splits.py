"""Deterministic corpus partitioning: train/val/test splits and seeded
global shuffle + sharding.

Both ops need the SAME property: a pure function of the stable document
id decides placement, so the split/shuffle is reproducible across
engines, retries, and re-partitionings — `df.sample` / `rand()` cannot
give that (per-task RNG state changes with the physical plan).  The
portable Horner hash from the dedup family (`_feature_id`, property-
tested bit-identical across Python/Spark/DuckDB) is the decision
function; salting the hash input ("split:" / "shuffle:<seed>:") makes
the two assignments independent of each other and of the dedup feature
space.

Scale shape: hashing is a narrow per-row map.  The split aggregates to
3 rows (map-side combine, trivial shuffle).  The global shuffle is ONE
hash-partitioned exchange (shard = h % n) plus a per-shard sort — at
100 TB that's `repartition(n, h)` + `sortWithinPartitions(h)`, i.e. the
write path of a training-data sharder; there is deliberately NO global
order-by (a total sort would range-partition the whole corpus for an
ordering no data loader needs)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from mysql_postgres_debezium_cdc_spark.llm.dedup import MH_PRIME, _feature_id
from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load

TRAIN_PCT, VAL_PCT = 80, 10  # remainder = test
SHUFFLE_SEED = 42
N_SHARDS = 16


def _phash_sql(expr: str) -> str:
    """DuckDB twin of ``_feature_id`` over an arbitrary VARCHAR expr."""
    return (
        "LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), "
        f"[CAST(UNICODE(({expr})[i]) AS BIGINT) FOR i IN RANGE(1, LEN({expr})+1)]), "
        f"(acc, c) -> (acc * 31 + c) % {MH_PRIME})"
    )


def split_column(doc_id: Column) -> Column:
    """'train' | 'val' | 'test' as a pure function of the document id."""
    bucket = _feature_id(F.concat(F.lit("split:"), doc_id.cast("string"))) % 100
    return (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )


_SPLIT_SQL_BUCKET = _phash_sql("'split:' || CAST(doc_id AS VARCHAR)") + " % 100"


@register(
    "corpus_train_val_test_split",
    oracle=f"""
    WITH lab AS (
      SELECT doc_id, n_chars,
             CASE WHEN {_SPLIT_SQL_BUCKET} < {TRAIN_PCT} THEN 'train'
                  WHEN {_SPLIT_SQL_BUCKET} < {TRAIN_PCT + VAL_PCT} THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    agg AS (
      SELECT split, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      FROM lab GROUP BY split
    ),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM agg)
    SELECT split, n_docs, total_chars, first_doc, last_doc,
           ROUND(CAST(n_docs AS DOUBLE) / n_total, 4) AS frac
    FROM agg, tot
    ORDER BY split
    """,
    tags=("llm", "pipeline", "split"),
)
def corpus_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucketed 80/10/10 split with per-split size accounting.
    The total for the frac column comes from an unpartitioned window
    over the AGGREGATED frame — bounded at ≤3 rows regardless of SF
    (the one place a global window is scale-safe), so the corpus is
    scanned exactly once; a scalar re-aggregation of the source would
    scan it twice, and a collect() would serialize the driver in."""
    d = load(spark, sf_dir, "documents")
    lab = d.select("doc_id", "n_chars", split_column(F.col("doc_id")).alias("split"))
    agg = lab.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
    w_all = Window.partitionBy()
    return (
        agg.withColumn("n_total", F.sum("n_docs").over(w_all).cast("bigint"))
        .select(
            "split",
            "n_docs",
            "total_chars",
            "first_doc",
            "last_doc",
            F.round(F.col("n_docs").cast("double") / F.col("n_total"), 4).alias("frac"),
        )
        .orderBy("split")
    )


_SHUF_SQL_H = _phash_sql(f"'shuffle:{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)")


@register(
    "corpus_global_shuffle_shards",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, {_SHUF_SQL_H} AS h FROM documents
    ),
    pos AS (
      SELECT doc_id, h, h % {N_SHARDS} AS shard,
             ROW_NUMBER() OVER (PARTITION BY h % {N_SHARDS}
                                ORDER BY h, doc_id) AS pos
      FROM h
    )
    SELECT shard, COUNT(*) AS n_docs,
           MIN(h) AS min_h, MAX(h) AS max_h,
           CAST(SUM(pos * doc_id) AS BIGINT) AS order_checksum
    FROM pos
    GROUP BY shard
    ORDER BY shard
    """,
    tags=("llm", "pipeline", "shuffle"),
)
def corpus_global_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded global shuffle: every document gets a (shard, pos) that is
    a pure function of (seed, doc_id) — the order a data loader reads.
    ``order_checksum`` = Σ pos·doc_id pins the exact within-shard
    permutation into the value hash (two different orders cannot
    checksum equal except by collision), so the oracle certifies the
    permutation itself, not just shard sizes."""
    d = load(spark, sf_dir, "documents")
    h = _feature_id(
        F.concat(F.lit(f"shuffle:{SHUFFLE_SEED}:"), F.col("doc_id").cast("string"))
    )
    hashed = d.select("doc_id", h.alias("h"), (h % N_SHARDS).alias("shard"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    pos = hashed.withColumn("pos", F.row_number().over(w).cast("long"))
    return (
        pos.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("h").alias("min_h"),
            F.max("h").alias("max_h"),
            F.sum(F.col("pos") * F.col("doc_id")).cast("bigint").alias("order_checksum"),
        )
        .orderBy("shard")
    )


# Per-source acceptance rates (per-mille) for the mixture sampler.
MIXTURE_WEIGHTS = {"src0": 1000, "src1": 500, "src2": 250, "src3": 125}
MIXTURE_DEFAULT = 50  # unknown sources: heavy downsample, never silent drop


def _mix_case_sql() -> str:
    whens = " ".join(
        f"WHEN source = '{s}' THEN {w}" for s, w in MIXTURE_WEIGHTS.items()
    )
    return f"CASE {whens} ELSE {MIXTURE_DEFAULT} END"


@register(
    "corpus_mixture_weighted_sample",
    oracle=f"""
    WITH sampled AS (
      SELECT source, n_chars
      FROM documents
      WHERE {_phash_sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000
            < {_mix_case_sql()}
    )
    SELECT source, COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM sampled
    GROUP BY source
    ORDER BY source
    """,
    tags=("llm", "pipeline", "mixture"),
)
def corpus_mixture_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mixture sampling — the domain-reweighting pass every
    pretraining recipe runs (upweight curated sources, downsample the
    crawl): accept a document iff portable_hash(doc) mod 1000 falls
    under its source's per-mille rate.  Deterministic like the split —
    reproducible across engines, retries and epochs, and the predicate
    pushes into the scan so rejected documents never leave the reader.
    Unknown sources fall to a conservative default rate rather than
    silently vanishing."""
    d = load(spark, sf_dir, "documents")
    h = _feature_id(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % 1000
    expr = None
    for s, w in MIXTURE_WEIGHTS.items():
        cond = F.col("source") == s
        expr = F.when(cond, w) if expr is None else expr.when(cond, w)
    rate = expr.otherwise(MIXTURE_DEFAULT)
    return (
        d.where(h < rate)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("source")
    )


# Per-group reservoir size for the deterministic k-sample.
RESERVOIR_K = 25


@register(
    "corpus_reservoir_per_group",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang, n_chars,
             {_phash_sql("'reservoir:' || CAST(doc_id AS VARCHAR)")} AS h
      FROM documents
    ),
    ranked AS (
      SELECT lang, doc_id, n_chars, h,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
      FROM h
    ),
    sizes AS (SELECT lang, COUNT(*) AS n_in_group FROM documents GROUP BY lang)
    SELECT r.lang, r.doc_id, r.n_chars, CAST(r.rk AS BIGINT) AS rk,
           s.n_in_group
    FROM ranked r JOIN sizes s USING (lang)
    WHERE r.rk <= {RESERVOIR_K}
    ORDER BY r.lang, r.rk
    """,
    tags=("llm", "pipeline", "sample"),
)
def corpus_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k-per-group sample (the eval-set / inspection-set pass):
    exactly ``RESERVOIR_K`` documents per language, chosen uniformly by
    ranking on a portable hash of the document id and keeping the top k.

    This is the DETERMINISTIC analogue of distributed reservoir
    sampling, and it compiles to the same bounded-state plan: the
    ``row_number <= k`` filter becomes a ``WindowGroupLimit`` node
    (plan-asserted in tests/test_plans.py), so every map task keeps at
    most k rows per group BEFORE the exchange — the shuffle carries
    O(k * n_partitions * n_groups) rows no matter how large the corpus
    is, exactly the merge step of per-partition reservoirs.  Unlike
    ``df.sample``/``rand()`` the choice is a pure function of the
    stable id: reproducible across engines, retries, and re-partitions
    (same property as [[corpus_train_val_test_split]]'s hash bucketing).

    Group sizes ride in from a separate one-pass aggregate whose
    cardinality is the language domain (fixed, not SF-growing); the
    join is left to AQE, which sees a kilobyte-sized build side and
    broadcasts it — no hint needed, per the maybe_broadcast policy.
    """
    d = load(spark, sf_dir, "documents")
    h = _feature_id(F.concat(F.lit("reservoir:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    ranked = (
        d.select("doc_id", "lang", "n_chars", h.alias("h"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= RESERVOIR_K)
    )
    sizes = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_in_group"))
    return (
        ranked.join(sizes, "lang")
        .select("lang", "doc_id", "n_chars", "rk", "n_in_group")
        .orderBy("lang", "rk")
    )


CURRICULUM_PHASES = 4


@register(
    "corpus_curriculum_order",
    oracle="""
    WITH feats AS (
      SELECT doc_id,
             LIST_FILTER(STRING_SPLIT(text, ' '), t -> LEN(t) > 0) AS toks
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
             ROUND(
               0.5 * (LIST_SUM([LEN(t) FOR t IN toks]) * 1.0 / LEN(toks))
               + 2.0 * (1.0 - LEN(LIST_DISTINCT(toks)) * 1.0 / LEN(toks))
               + LOG2(LEN(toks) + 1), 4) AS difficulty
      FROM feats WHERE LEN(toks) > 0
    ),
    cuts AS (
      SELECT QUANTILE_CONT(difficulty, 0.25) AS p25,
             QUANTILE_CONT(difficulty, 0.50) AS p50,
             QUANTILE_CONT(difficulty, 0.75) AS p75
      FROM scored
    )
    SELECT s.doc_id, s.difficulty,
           1 + CAST(s.difficulty > c.p25 AS INT)
             + CAST(s.difficulty > c.p50 AS INT)
             + CAST(s.difficulty > c.p75 AS INT) AS phase,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY 1 + CAST(s.difficulty > c.p25 AS INT)
                          + CAST(s.difficulty > c.p50 AS INT)
                          + CAST(s.difficulty > c.p75 AS INT)
             ORDER BY s.difficulty, s.doc_id) AS BIGINT) AS curriculum_rank
    FROM scored s CROSS JOIN cuts c
    ORDER BY phase, curriculum_rank
    """,
    tags=("llm", "corpus", "curriculum"),
)
def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning order: score each document's difficulty from
    purely LOCAL features (mean word length, inverted type-token ratio,
    log doc length — longer, more repetitive, longer-worded docs rank
    harder), cut the corpus into quartile phases, and number documents
    within each phase easy-to-hard — the deterministic ordering pass a
    curriculum trainer feeds its sampler.

    Scale shape: the feature pass is a narrow map (higher-order array
    functions on the token list — NO explode, no shuffle); the quartile
    cuts are ONE exact-percentile aggregate collapsing to 3 broadcast
    scalars (the [[corpus_length_bucketed_batches]] device — bucket by
    precomputed boundaries instead of a global NTILE, which would
    single-partition the sort); the within-phase row_number is a 4-key
    window, partition-parallel after a 4-key exchange.  At 10^10 docs
    the phase window gets the same shard-prefix treatment documented on
    the batch op — the output contract (phase, rank) is unchanged.

    Determinism: difficulty rounds to 4dp BEFORE the quantile cuts and
    comparisons, so both engines interpolate the same values; rank ties
    break on unique doc_id; exact QUANTILE_CONT/percentile midpoints
    interpolate identically (the agg_percentiles contract)."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, v: a + v
    )
    n_toks = F.size(toks)
    difficulty = F.round(
        0.5 * (sum_len * 1.0 / n_toks)
        + 2.0 * (1.0 - F.size(F.array_distinct(toks)) * 1.0 / n_toks)
        + F.log2(n_toks + 1),
        4,
    )
    scored = d.select("doc_id", difficulty.alias("difficulty")).where(n_toks > 0)
    cuts = scored.agg(
        F.percentile("difficulty", 0.25).alias("p25"),
        F.percentile("difficulty", 0.50).alias("p50"),
        F.percentile("difficulty", 0.75).alias("p75"),
    )
    phase = (
        F.lit(1)
        + (F.col("difficulty") > F.col("p25")).cast("int")
        + (F.col("difficulty") > F.col("p50")).cast("int")
        + (F.col("difficulty") > F.col("p75")).cast("int")
    )
    w = Window.partitionBy("phase").orderBy("difficulty", "doc_id")
    return (
        scored.crossJoin(F.broadcast(cuts))
        .select("doc_id", "difficulty", phase.alias("phase"))
        .withColumn("curriculum_rank", F.row_number().over(w).cast("bigint"))
        .orderBy("phase", "curriculum_rank")
    )
