"""Corpus clustering: distributed Lloyd's k-means over embeddings, and
the SemDeDup-style cluster-scoped semantic dedup built on it.

K-means is the backbone of semantic corpus curation (SemDeDup's
cluster-then-compare, density-based pruning, IVF coarse quantizers —
llm/similarity.py's IVF index is one assignment pass of exactly this
loop).  The engine expresses each Lloyd iteration as two DataFrame
stages with no driver-side data movement:

  assign:  vectors ⨯ broadcast(centroids) → argmin distance   (k is a
           fixed constant, so the build side is bounded at any corpus
           scale — the one join in the engine where a hint is always
           safe)
  update:  posexplode members → groupBy (cluster, dim) mean → rebuild
           centroid arrays (map-side partial agg collapses the
           per-dimension sums before the k×dim-sized shuffle)

Iteration count is a fixed config constant, so the whole run is ONE
static Catalyst plan (no data-dependent driver loop; contrast
llm/dedup.py's connected components, which must iterate to
convergence and pays a per-round probe).

Determinism device (what makes k-means DuckDB-value-checkable at all):
all geometry runs in FIXED-POINT integers — embeddings quantize to
floor(x·1000) once, distances are exact int64 sums of squared diffs,
centroid updates are floor(sum/count) — so Spark and the oracle agree
bit-for-bit at every iteration and ties argmin to the lowest cluster
id.  Float k-means would diverge across engines at the first
near-equidistant point.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load, spread_small_scan

KM_K = 8  # clusters
KM_ITERS = 2  # assignment passes (1 centroid update between)
KM_SCALE = 1000  # fixed-point quantization: floor(x * KM_SCALE)
SEM_COS_MIN = 0.40  # similarity threshold: the fixture embeddings are
# synthetic (max within-cluster cosine ~0.51), so a production-style
# 0.95 dup threshold would make the output vacuously empty; 0.40 keeps
# the reported pair set non-trivial while exercising the identical
# cluster-scoped pipeline.  The threshold is config, not semantics.

# Quantized vectors + the shared CTE prefix every oracle below uses.
_Q_SQL = f"""
    q AS (
      SELECT vec_id,
             LIST_TRANSFORM(embedding::DOUBLE[],
                            x -> CAST(FLOOR(x * {KM_SCALE}) AS BIGINT)) AS qv
      FROM embeddings
    ),
    init AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, qv AS cv
      FROM q ORDER BY vec_id LIMIT {KM_K}
    ),
    assign1 AS (
      SELECT vec_id, cid, dist FROM (
        SELECT q.vec_id, init.cid,
               CAST(LIST_SUM(LIST_TRANSFORM(LIST_ZIP(q.qv, init.cv),
                    p -> (p[1] - p[2]) * (p[1] - p[2])))
                    AS BIGINT) AS dist
        FROM q CROSS JOIN init
      )
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
    ),
    longq AS (
      SELECT vec_id, i - 1 AS pos, qv[i] AS val
      FROM q, LATERAL (SELECT UNNEST(RANGE(1, LEN(qv) + 1)) AS i)
    ),
    cent2 AS (
      SELECT a.cid,
             LIST(CAST(FLOOR(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS cv
      FROM (
        SELECT a.cid, l.pos, SUM(l.val) AS s, COUNT(*) AS n
        FROM assign1 a JOIN longq l ON l.vec_id = a.vec_id
        GROUP BY a.cid, l.pos
      ) AS a
      GROUP BY a.cid
    ),
    assign2 AS (
      SELECT vec_id, cid, dist FROM (
        SELECT q.vec_id, cent2.cid,
               CAST(LIST_SUM(LIST_TRANSFORM(LIST_ZIP(q.qv, cent2.cv),
                    p -> (p[1] - p[2]) * (p[1] - p[2])))
                    AS BIGINT) AS dist
        FROM q CROSS JOIN cent2
      )
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
    )
"""


def _quantize(e: DataFrame) -> DataFrame:
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * KM_SCALE).cast("bigint"),
    )
    return e.select("vec_id", qv.alias("qv"))


def _dist2(a, b) -> "F.Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def _assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """One Lloyd assignment pass: argmin_c dist²(v, c), ties to the
    lowest cluster id via lexicographic struct-min."""
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "qv",
        F.struct(
            _dist2(F.col("qv"), F.col("cv")).alias("dist"), F.col("cid").alias("cid")
        ).alias("dc"),
    )
    best = scored.groupBy("vec_id").agg(
        F.min("dc").alias("best"), F.first("qv").alias("qv")
    )
    return best.select(
        "vec_id", "qv", F.col("best.cid").alias("cid"), F.col("best.dist").alias("dist")
    )


def _update(assigned: DataFrame) -> DataFrame:
    """Centroid update: per-(cluster, dim) integer mean, arrays rebuilt
    in dim order.  Empty clusters drop (standard Lloyd's)."""
    longq = assigned.select("cid", F.posexplode("qv").alias("pos", "val"))
    dims = longq.groupBy("cid", "pos").agg(
        F.floor(F.sum("val").cast("double") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("cval")
    )
    return dims.groupBy("cid").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "cval"))), lambda s: s.cval
        ).alias("cv")
    )


def _kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run KM_ITERS Lloyd passes; returns (vec_id, qv, cid, dist)."""
    e = spread_small_scan(load(spark, sf_dir, "embeddings"))
    # Persist the quantized working set: every iteration's assign pass and
    # the update pass all branch from `q`, and Catalyst does not dedupe
    # common subtrees across branches — without this the embeddings scan
    # + quantize reruns once per branch (the iterate-over-cached-working-
    # set shape every distributed k-means uses; at 100 TB this is a
    # serialized MEMORY_AND_DISK persist or a checkpoint per N rounds).
    q = _quantize(e).persist()
    init = (
        q.orderBy("vec_id")
        .limit(KM_K)
        .select(
            # Global window over exactly KM_K rows — constant-size, not a
            # scale hazard (cf. the percentile-cut rework of window_ntile).
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("cid"),
            F.col("qv").alias("cv"),
        )
    )
    assigned = _assign(q, init)
    for _ in range(KM_ITERS - 1):
        assigned = _assign(q, _update(assigned))
    return assigned


@register(
    "cluster_kmeans_embeddings",
    oracle=f"""
    WITH {_Q_SQL}
    SELECT vec_id, cid AS cluster, dist AS dist2
    FROM assign2
    ORDER BY vec_id
    """,
    tags=("llm", "clustering", "kmeans"),
)
def cluster_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (2 fixed-point Lloyd iterations, k=8): the
    corpus-curation workhorse (SemDeDup partitions, IVF coarse
    quantizers, density pruning).  Returns every vector's final cluster
    and exact integer distance² — a wrong assignment at EITHER
    iteration moves dist2, so the value hash certifies the full loop,
    not just the final labels.

    Scale shape: per iteration, assignment streams the corpus once
    against k broadcast centroids (k·dim ints — bounded at any scale),
    and the update shuffles k×dim partial sums, not vectors (map-side
    combine collapses each partition to ≤ k·dim rows).  Driver never
    sees data; iteration count is a static constant so the whole run
    is one Catalyst plan.  At 10¹⁰ docs the same two stages hold —
    k grows to ~√n for SemDeDup use, keeping both the broadcast (k·dim
    ≈ MBs) and the update shuffle (k·dim rows/partition) bounded."""
    return _kmeans(spark, sf_dir).select(
        "vec_id", F.col("cid").alias("cluster"), F.col("dist").alias("dist2")
    ).orderBy("vec_id")


@register(
    "corpus_semantic_dedup",
    oracle=f"""
    WITH {_Q_SQL},
    members AS (
      SELECT a.vec_id, a.cid, q.qv,
             CAST(LIST_SUM(LIST_TRANSFORM(q.qv, x -> x * x)) AS BIGINT) AS nrm2
      FROM assign2 a JOIN q ON q.vec_id = a.vec_id
    ),
    pairs AS (
      SELECT x.cid AS cluster, x.vec_id AS a_id, y.vec_id AS b_id,
             CAST(LIST_SUM(LIST_TRANSFORM(LIST_ZIP(x.qv, y.qv),
                  p -> p[1] * p[2])) AS BIGINT) AS dot,
             x.nrm2 AS na, y.nrm2 AS nb
      FROM members x JOIN members y
        ON x.cid = y.cid AND x.vec_id < y.vec_id
    )
    SELECT cluster, a_id, b_id,
           ROUND(CAST(dot AS DOUBLE) / (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE))), 6) AS cos
    FROM pairs
    WHERE CAST(dot AS DOUBLE) / (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE)))
          >= {SEM_COS_MIN}
    ORDER BY cluster, a_id, b_id
    """,
    tags=("llm", "clustering", "dedup"),
)
def corpus_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pairs found
    by comparing vectors ONLY within their k-means cluster — the
    observation that makes embedding dedup tractable at corpus scale.
    Global pairwise cosine is O(n²); cluster-scoped comparison is
    Σᵢ O(nᵢ²), and with k ~ √n-sized balanced cells that is ~O(n·n/k)
    — the same candidate-bounding role LSH buckets play in
    dedup_embedding_lsh, but driven by learned corpus geometry instead
    of random projections (SemDeDup's finding: cluster-scoped recall is
    near-exact for web corpora because near-dups co-assign).

    Plan shape: the cluster assignment reuses the k-means stages
    (broadcast centroids, corpus streamed); the pairwise stage is a
    self-join keyed on cluster id, so pair expansion is per-cell and a
    hot cell is capped the same way dedup buckets are
    (llm/dedup.py:_pairs_from_bucket's max_bucket_width — at fixture
    scale cells are hundreds wide and the cap is off).  Cosines are
    exact-integer dot products over the quantized vectors divided once
    in IEEE double — deterministic in both engines."""
    assigned = _kmeans(spark, sf_dir)
    nrm2 = F.aggregate(
        F.transform(F.col("qv"), lambda x: x * x),
        F.lit(0).cast("bigint"),
        lambda a, v: a + v,
    )
    # Persisted because both sides of the within-cluster self-join branch
    # from it — without this the whole k-means lineage runs twice.
    members = assigned.select("vec_id", "cid", "qv", nrm2.alias("nrm2")).persist()
    x = members.select(
        F.col("cid").alias("cluster"),
        F.col("vec_id").alias("a_id"),
        F.col("qv").alias("qa"),
        F.col("nrm2").alias("na"),
    )
    y = members.select(
        F.col("cid").alias("cluster"),
        F.col("vec_id").alias("b_id"),
        F.col("qv").alias("qb"),
        F.col("nrm2").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda a, v: a + v,
    )
    cos = dot.cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    return (
        x.join(y, "cluster")
        .where(F.col("a_id") < F.col("b_id"))
        .select("cluster", "a_id", "b_id", cos.alias("_cos"))
        .where(F.col("_cos") >= SEM_COS_MIN)
        .select("cluster", "a_id", "b_id", F.round("_cos", 6).alias("cos"))
        .orderBy("cluster", "a_id", "b_id")
    )
