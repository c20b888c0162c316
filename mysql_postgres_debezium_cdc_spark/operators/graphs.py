"""Graph analytics over relational data: damped PageRank on the
TPC-H nation trade graph.

The reference's surface has no graph operators; these extend the
engine the same way the LLM-data family does — real distributed
algorithms expressed Spark-first, value-checked against an unrolled
DuckDB oracle.  The companion triangle-counting op lives next to the
near-dup pair machinery it consumes (`llm/dedup.py`).

Scale doctrine (also in each docstring): the CORPUS-scale work is the
edge derivation (fact-fact joins + a map-side-combining aggregate);
the solve then runs on the aggregated GRAPH, whose size is bounded by
the key space, not the corpus.  When the key space itself is huge
(web graphs), the iteration stays distributed as repeated joins —
`graph_pagerank_distributed` below runs exactly that shape on the
corpus-scale near-dup document graph — but a nation-level graph is
≤ 25 nodes, so iterating it distributed would shuffle 625 rows three
times for nothing.  Both regimes are therefore implemented, each on
the graph whose size class demands it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load

PR_DAMP = 0.85
PR_ITERS = 3


def _pr_oracle() -> str:
    """Unrolled 3-iteration damped PageRank over the trade graph — the
    same CTE-chain device the BPE trainer oracle uses."""
    base = f"""
    WITH edges AS (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
             COUNT(*) AS w
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    outw AS (SELECT src, CAST(SUM(w) AS DOUBLE) AS tw FROM edges GROUP BY src),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes, nn)"""
    for k in range(PR_ITERS):
        base += f""",
    flow{k} AS (
      SELECT e.dst AS node, SUM(r.pr * e.w / ow.tw) AS m
      FROM edges e
      JOIN r{k} r ON r.node = e.src
      JOIN outw ow ON ow.src = e.src
      GROUP BY e.dst
    ),
    dang{k} AS (
      SELECT COALESCE(SUM(pr), 0.0) AS dm FROM r{k}
      WHERE node NOT IN (SELECT src FROM outw)
    ),
    r{k + 1} AS (
      SELECT n.node,
             (1.0 - {PR_DAMP}) / nn.n
               + {PR_DAMP} * (COALESCE(f.m, 0.0) + dg.dm / nn.n) AS pr
      FROM nodes n CROSS JOIN nn CROSS JOIN dang{k} dg
      LEFT JOIN flow{k} f ON f.node = n.node
    )"""
    return base + f"""
    SELECT na.n_name AS nation, ROUND(r.pr, 6) + 0.0 AS pagerank
    FROM r{PR_ITERS} r JOIN nation na ON na.n_nationkey = r.node
    ORDER BY pagerank DESC, nation
    """


@register(
    "graph_pagerank_trade",
    oracle=_pr_oracle(),
    tags=("graph", "pagerank", "iterative"),
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (d=0.85, 3 iterations) over the nation trade
    graph: edge src→dst = supplier nation ships to customer nation,
    weighted by lineitem count — "which nations does trade flow
    concentrate in" as a stationary-distribution question.

    Scale shape, in two regimes:

    - The CORPUS-scale stage is the edge derivation — lineitem⋈orders
      is the fact-fact SMJ (same join q7_volume_shipping runs),
      supplier/customer resolve nation keys, and the groupBy combines
      map-side down to ≤|nations|² rows.  That is the only stage that
      touches data proportional to the fixture.
    - The resulting GRAPH is bounded by the key space (25 nations →
      ≤625 weighted edges), so the solve collects it once — the same
      bounded-constant-artifact class as the PQ codebook
      (`llm/similarity.py`) — and the 3 damped iterations run on a
      local relation: no per-iteration shuffle of a 625-row table,
      no persisted generations to leak.  For a graph whose NODE SET
      scales with the corpus (web graphs), the iteration instead
      stays distributed as repeated edge⋈rank joins — the
      [[dedup_connected_components]] pointer-jumping shape — which
      this implementation deliberately does not pretend to need.

    Float parity: edge weights and out-degrees are exact integers;
    iteration arithmetic is IEEE double in both engines with identical
    expression shape, and only the FINAL rank rounds (6dp), the same
    contract as the kmeans/divergence family."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    edges_df = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # Bounded collect: ≤ |nations|² rows by construction (not by data).
    edges = [(r["src"], r["dst"], r["w"]) for r in edges_df.collect()]
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    if not nodes:  # zero-row corpus: no trade, no ranks
        return spark.createDataFrame([], "nation string, pagerank double")
    n = float(len(nodes))
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(PR_ITERS):
        flow = {}
        # per-node accumulation in sorted edge order; DuckDB's SUM may
        # visit in another order — the final 6dp rounding absorbs the
        # ~1e-16 reassociation drift (kmeans/divergence precedent)
        for s, d, w in sorted(edges):
            flow[d] = flow.get(d, 0.0) + pr[s] * w / outw[s]
        # dangling nodes (no out-edges — at sf0.001 most nations have no
        # suppliers) redistribute their mass uniformly: the standard
        # PageRank dangling fix, which keeps Σpr = 1 at every scale.
        dm = sum(pr[v] for v in nodes if v not in outw)
        pr = {
            v: (1.0 - PR_DAMP) / n + PR_DAMP * (flow.get(v, 0.0) + dm / n)
            for v in nodes
        }
    ranks = spark.createDataFrame(
        list(pr.items()), "node int, pr_raw double"
    )
    return (
        ranks.join(F.broadcast(nation), ranks.node == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            # round SPARK-side so tie behavior (half-up) matches the
            # oracle's ROUND, not Python's banker's rounding
            (F.round(F.col("pr_raw"), 6) + F.lit(0.0)).alias("pagerank"),
        )
        .orderBy(F.desc("pagerank"), F.asc("nation"))
    )


def _prd_oracle() -> str:
    """Unrolled fixed-iteration damped PageRank over the near-dup doc
    graph (same CTE-unroll device as the trade-graph oracle); the pair
    CTE embeds the certified near-dup pair SQL so the two keys cannot
    drift."""
    from mysql_postgres_debezium_cdc_spark.llm.dedup import _CC_PAIRS_SQL

    base = f"""
    WITH pairs AS ({_CC_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    outw AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes, nn)"""
    for k in range(PR_ITERS):
        base += f""",
    flow{k} AS (
      SELECT e.dst AS node, SUM(r.pr / ow.deg) AS m
      FROM edges e
      JOIN r{k} r ON r.node = e.src
      JOIN outw ow ON ow.src = e.src
      GROUP BY e.dst
    ),
    r{k + 1} AS (
      SELECT n.node,
             (1.0 - {PR_DAMP}) / nn.n + {PR_DAMP} * COALESCE(f.m, 0.0) AS pr
      FROM nodes n CROSS JOIN nn
      LEFT JOIN flow{k} f ON f.node = n.node
    )"""
    return base + f"""
    SELECT node AS doc_id, ROUND(pr, 6) + 0.0 AS pagerank
    FROM r{PR_ITERS}
    ORDER BY doc_id
    """


@register(
    "graph_pagerank_distributed",
    oracle=_prd_oracle(),
    tags=("graph", "pagerank", "iterative", "distributed"),
)
def graph_pagerank_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (d=0.85, PR_ITERS fixed iterations) over the
    CORPUS-SCALE near-dup document graph — the web-scale shape the
    trade-graph docstring promises: the node set grows with the corpus,
    so every iteration stays distributed as an edge⋈rank equi-join +
    map-side-combining aggregate; the rank relation is never collected.
    Within duplicate clusters, rank concentrates on the most-connected
    documents — the centrality signal a canonical-document picker can
    rank by (vs [[dedup_connected_components]]'s min-id convention).

    Iteration discipline is the pointer-jumping module's: edges, the
    per-edge out-degree denominators, and the node set materialize
    ONCE via eager localCheckpoint (reused every round, not recomputed
    from lineage); each round's rank relation eagerly checkpoints so
    plans stay constant-depth and superseded generations are reclaimed
    by the ContextCleaner.  The ONLY driver-side values are the 1-row
    node count (the teleport denominator — a scalar probe, not data
    collection; the rank relation itself never leaves the cluster).

    Graph contract: the pair list symmetrizes, so every node has
    out-degree ≥ 1 and the dangling-mass term is identically zero
    (unlike the trade graph, where supplier-less nations dangle) —
    Σpr = 1 at every iteration by construction.  Float parity: per-node
    flow sums are IEEE doubles whose in-group order may differ between
    engines; only the FINAL rank rounds (6dp), the kmeans/divergence
    contract."""
    from mysql_postgres_debezium_cdc_spark.llm.dedup import _jaccard_pairs

    pairs = _jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.union(
            pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .localCheckpoint(eager=True)
    )
    outw = edges.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    # Per-edge share denominators, materialized once and reused every
    # round (3 longs per edge).  MEASURED choice of materialization
    # (PLANS.md r6): with an eager localCheckpoint, AQE sees the true
    # rank-relation size each round and BROADCASTS it, so an iteration
    # streams the edge relation with NO shuffle at all (~0.6 s/iter at
    # the 501k-edge 10x probe) — beating the persist()+repartition(src)
    # alternative (~0.9 s/iter), whose InMemoryTableScan keeps its
    # partitioning for a shuffle-free SMJ build side but pays the cache
    # read + per-round sort.  When ranks outgrow the broadcast
    # threshold (true web scale), flip to that cached-repartition
    # shape: partitioning reuse makes the per-round shuffle O(|ranks|),
    # never O(|edges|).
    edges_w = edges.join(outw, "src").select("src", "dst", "deg").localCheckpoint(
        eager=True
    )
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    n = nodes.count()  # 1-row scalar probe (graph-sized aggregate, not data)
    if n == 0:
        return spark.createDataFrame([], "doc_id bigint, pagerank double")
    ranks = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    for _ in range(PR_ITERS):
        flow = (
            edges_w.join(ranks, edges_w.src == ranks.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("m"))
        )
        ranks = (
            nodes.join(flow, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - PR_DAMP) / n)
                    + PR_DAMP * F.coalesce(F.col("m"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        ranks.select(
            F.col("node").alias("doc_id"),
            (F.round(F.col("pr"), 6) + F.lit(0.0)).alias("pagerank"),
        )
        .orderBy("doc_id")
    )


LPA_ITERS = 3


def _lpa_oracle() -> str:
    """Unrolled fixed-iteration synchronous label propagation over the
    near-dup doc graph (same CTE-unroll + embedded certified pair SQL
    as the PageRank oracle)."""
    from mysql_postgres_debezium_cdc_spark.llm.dedup import _CC_PAIRS_SQL

    base = f"""
    WITH pairs AS ({_CC_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    l0 AS (SELECT node, node AS lbl FROM nodes)"""
    for k in range(LPA_ITERS):
        base += f""",
    votes{k} AS (
      SELECT e.dst AS node, l.lbl, COUNT(*) AS c
      FROM edges e JOIN l{k} l ON l.node = e.src
      GROUP BY e.dst, l.lbl
    ),
    l{k + 1} AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk
        FROM votes{k}
      ) WHERE rk = 1
    )"""
    return base + f"""
    SELECT l.node AS doc_id, CAST(l.lbl AS BIGINT) AS community,
           CAST(COUNT(*) OVER (PARTITION BY l.lbl) AS BIGINT) AS community_size
    FROM l{LPA_ITERS} l
    ORDER BY doc_id
    """


@register(
    "graph_label_propagation",
    oracle=_lpa_oracle(),
    tags=("graph", "community", "iterative", "distributed"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (LPA_ITERS fixed rounds) over the
    corpus-scale near-dup document graph — community detection as the
    canonical-group refinement over [[dedup_connected_components]]: CC
    answers "reachable at all", LPA's majority vote splits weakly
    bridged clusters into densely connected communities (the structure
    a canonical-doc picker or a per-cluster sampler actually wants).

    Deterministic variant: every node starts as its own label; each
    round every node adopts the MOST FREQUENT neighbor label, ties
    broken toward the smallest — no RNG, no asynchronous order
    dependence, so a fixed-round unrolled SQL oracle value-checks the
    distributed loop exactly.

    Scale shape mirrors [[graph_pagerank_distributed]]: the symmetrized
    edge relation materializes ONCE (eager localCheckpoint); each round
    is one edge⋈label equi-join + a (node, label) count that combines
    map-side + one argmax-by-struct aggregate — all relations are
    edge- or node-sized, never collected, and superseded label
    generations are released each round.  The vote argmax uses max_by
    over (count, -label): Spark computes it in one aggregate pass
    where the oracle needs a rank-and-filter window."""
    from mysql_postgres_debezium_cdc_spark.llm.dedup import _jaccard_pairs

    pairs = _jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.union(
            pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    ).localCheckpoint(eager=True)
    nodes = labels.select("node")
    for _ in range(LPA_ITERS):
        votes = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.max_by(
                    "lbl", F.struct(F.col("c"), (-F.col("lbl")).alias("neg"))
                ).alias("lbl")
            )
            .localCheckpoint(eager=True)
        )
    w = Window.partitionBy("lbl")
    return (
        labels.withColumn("community_size", F.count(F.lit(1)).over(w).cast("bigint"))
        .select(
            F.col("node").alias("doc_id"),
            F.col("lbl").cast("bigint").alias("community"),
            "community_size",
        )
        .orderBy("doc_id")
    )


BFS_MAX_HOPS = 3
BFS_SEED_MOD = 17  # doc_id % MOD == 0 → seed (deterministic, engine-agnostic)


def _bfs_oracle() -> str:
    """Recursive-CTE BFS over the near-dup doc graph: UNION (not UNION
    ALL) dedups (node, hop) rows each step, so the walk is frontier-
    sized — ≤ (hops+1)·|nodes| rows total — not path-enumerating
    (which would be exponential inside dup cliques)."""
    from mysql_postgres_debezium_cdc_spark.llm.dedup import _CC_PAIRS_SQL

    return f"""
    WITH RECURSIVE pairs AS ({_CC_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    walk AS (
      SELECT DISTINCT src AS node, 0 AS hop FROM edges
      WHERE src % {BFS_SEED_MOD} = 0
      UNION
      SELECT e.dst, w.hop + 1
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.hop < {BFS_MAX_HOPS}
    )
    SELECT node AS doc_id, CAST(MIN(hop) AS BIGINT) AS hops
    FROM walk GROUP BY node ORDER BY doc_id
    """


@register(
    "graph_bfs_reachability",
    oracle=_bfs_oracle(),
    tags=("graph", "bfs", "iterative", "distributed"),
)
def graph_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS (≤ BFS_MAX_HOPS hops) over the corpus-scale
    near-dup document graph: every node reachable from the seed set
    (doc_id ≡ 0 mod 17) with its hop distance — the "blast radius"
    query a contamination investigation runs when one document in a
    duplicate cluster is found tainted.

    Distributed shape: classic frontier iteration — each hop is ONE
    edge⋈frontier equi-join, an anti-join against the visited set, and
    a distinct; all relations stay keyed by node, nothing is collected.
    The visited set materializes per hop via eager localCheckpoint
    (the PageRank loop's iteration discipline: constant-depth plans,
    superseded generations reclaimed).  The oracle is a recursive CTE
    with UNION dedup — frontier-sized, not path-enumerating — so both
    sides compute min-hop BFS levels, and hop counts are exact ints
    (no float parity concerns at all)."""
    from mysql_postgres_debezium_cdc_spark.llm.dedup import _jaccard_pairs

    pairs = _jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.union(
            pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .localCheckpoint(eager=True)
    )
    frontier = (
        edges.select(F.col("src").alias("node"))
        .where(F.col("node") % BFS_SEED_MOD == 0)
        .distinct()
        .select("node", F.lit(0).cast("int").alias("hop"))
        .localCheckpoint(eager=True)
    )
    visited = frontier
    for k in range(1, BFS_MAX_HOPS + 1):
        nxt = (
            edges.join(frontier, edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(k).cast("int").alias("hop"))
            .localCheckpoint(eager=True)
        )
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited.select(
        F.col("node").alias("doc_id"), F.col("hop").cast("bigint").alias("hops")
    ).orderBy("doc_id")


def _degree_oracle() -> str:
    from mysql_postgres_debezium_cdc_spark.llm.dedup import _CC_PAIRS_SQL

    return f"""
    WITH pairs AS ({_CC_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS degree FROM edges GROUP BY src)
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree ORDER BY degree
    """


@register(
    "graph_degree_distribution",
    oracle=_degree_oracle(),
    tags=("graph", "agg"),
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the near-dup document graph — the first
    diagnostic run on any derived graph (is it a few giant cliques or
    many small ones?  does a skewed hub need salting downstream?).

    Two map-side-combining aggregates over the edge ENDPOINTS; the
    second input is node-sized, the output degree-sized.  Exact
    integers end to end.

    Degree needs endpoint multiplicity only, so the symmetrized-union
    formulation (pairs ∪ flipped pairs — two instances of the
    expensive pair-derivation subtree, deduped only as far as
    ReuseExchange reaches) is replaced by ONE explode of both
    endpoints per pair: a single pair-derivation pass, no union.
    A/B on the same corpus: 2.95 s → 2.23 s at 1×, 32.6 s → 28.1 s on
    a pathological 100×-pairs replica."""
    from mysql_postgres_debezium_cdc_spark.llm.dedup import _jaccard_pairs

    pairs = _jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.select(F.explode(F.array("doc_a", "doc_b")).alias("src"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .orderBy("degree")
    )
