"""Data-selection and corpus-profiling operators: DSIR importance
weights, a trained naive-Bayes classifier, lexical diversity, Zipf fit.

These extend the LLM-data family (SURVEY.md §2.2) with the *selection*
stage of a training-data pipeline: after dedup and quality filtering,
which documents should be kept/up-weighted to match a target domain
(DSIR, Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"), and the cheap supervised baseline
(multinomial naive Bayes) that pipelines like CCNet / GPT-3's
quality classifier train to score documents at corpus scale.

Shared shape: everything reduces to token-count relations —
(token)-keyed or (label, token)-keyed exact BIGINT counts aggregated
once from the token stream with map-side combine — and the models
(vocab-sized) broadcast back onto the stream.  No model ever collects
to the driver; the corpus is read a constant number of times.

Float-parity posture: counts are exact; LN / divisions are fixed
expression trees over exact ints (agree to <1 ulp between engines);
per-document SUMs of logs accumulate in engine order, so outputs round
(4-6dp) and every ranking orders by the ROUNDED value with a unique
tie-break — the same contract as `text_unigram_lm_score` and the
kmeans family.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load, spread_small_scan

DSIR_TARGET_LANG = "en"  # the "domain" the importance weights steer toward
DSIR_TOP_K = 25
NB_TEST_MOD = 5  # doc_id % 5 == 0 → held-out test split (deterministic)

# Whitespace tokenizer — the module-wide convention established by
# text_unigram_lm_score / the BPE trainer (llm/text.py): split on ' ',
# drop empties.
_TOKS_SQL = """
    SELECT doc_id, UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '),
                                      t -> LENGTH(t) > 0)) AS token
    FROM documents
"""


def _toks(spark: SparkSession, sf_dir: str, predicate=None) -> DataFrame:
    """(doc_id, token) stream; an optional predicate filters DOCUMENTS
    before the explode, so it pushes into the parquet scan."""
    d = load(spark, sf_dir, "documents")
    if predicate is not None:
        d = d.where(predicate)
    return spread_small_scan(d).select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda t: F.length(t) > 0)).alias(
            "token"
        ),
    )


@register(
    "corpus_dsir_importance",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    tgt_toks AS (
      SELECT t.token FROM toks t
      JOIN documents d ON d.doc_id = t.doc_id AND d.lang = '{DSIR_TARGET_LANG}'
    ),
    raw_cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c_r FROM toks GROUP BY token),
    tgt_cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c_t FROM tgt_toks GROUP BY token),
    consts AS (
      SELECT CAST((SELECT COUNT(*) FROM toks) AS BIGINT) AS n_r,
             CAST((SELECT COUNT(*) FROM tgt_toks) AS BIGINT) AS n_t,
             CAST((SELECT COUNT(*) FROM raw_cnt) AS BIGINT) AS v
    ),
    w AS (
      SELECT r.token,
             LN((COALESCE(t.c_t, 0) + 1) / CAST(c.n_t + c.v AS DOUBLE))
               - LN((r.c_r + 1) / CAST(c.n_r + c.v AS DOUBLE)) AS lw
      FROM raw_cnt r LEFT JOIN tgt_cnt t USING (token) CROSS JOIN consts c
    ),
    scored AS (
      SELECT tk.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             ROUND(AVG(w.lw), 6) AS avg_log_ratio
      FROM toks tk JOIN w USING (token)
      GROUP BY tk.doc_id
    )
    SELECT doc_id, n_tokens, avg_log_ratio
    FROM scored
    ORDER BY avg_log_ratio DESC, doc_id
    LIMIT {DSIR_TOP_K}
    """,
    tags=("llm", "selection", "dsir"),
    bench=True,  # headline: representative token-stream model-broadcast op
)
def corpus_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): score every document
    by its average unigram log-likelihood ratio between a TARGET
    distribution (here: the '{en}' slice) and the RAW corpus, both
    Laplace-smoothed over the raw vocabulary — the hashed-n-gram
    variant of the paper reduces to exactly this with whitespace
    features.  Top-weighted documents are the ones importance
    resampling keeps when steering a web crawl toward the target
    domain.

    Shape at 100 TB: two count aggregations over the token stream (raw
    and target — the target pass filters at the parquet scan, before
    the explode; it reads the target slice, not a second corpus), a
    vocab-sized weight relation broadcast back onto
    the stream, and one per-doc aggregate.  Ranking orders by the
    ROUNDED average (6dp) with doc_id tie-break on both engines, so
    log-sum accumulation order cannot reorder the cut."""
    toks = _toks(spark, sf_dir)
    # target pass: a SECOND scan with the lang predicate pushed into the
    # parquet reader (cheaper than joining the exploded token stream
    # against a doc-id list — the filter prunes before the explode)
    tgt_toks = _toks(spark, sf_dir, F.col("lang") == DSIR_TARGET_LANG)
    # r13: all three smoothing constants ride the joined VOCAB relation
    # as one unpartitioned window — n_t = Σ c_t works on the join output
    # because target tokens are a subset of the raw vocabulary (tgt_toks
    # ⊆ toks), so no tgt row is lost by the left join.  The r12 shape
    # persisted raw_cnt/tgt_cnt and aggregated a separate broadcast
    # consts branch off each: two cache materialization barriers plus a
    # serial broadcast chain, which the driver measured at 0.70× (and
    # 8 cores beat 32 at 2:1 — barrier cost scales with partition
    # count).  Now: exactly 3 corpus passes (raw explode, target-slice
    # explode, scoring pass), zero persists, and the window input is
    # vocab-bounded (never corpus-sized) — the same boundedness that
    # justified caching it justifies the single-partition window.
    gw = Window.partitionBy()
    raw_cnt = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_r")
    )
    tgt_cnt = tgt_toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_t")
    )
    joined = (
        raw_cnt.join(tgt_cnt, "token", "left")
        .withColumn("v", F.count(F.lit(1)).over(gw).cast("bigint"))
        .withColumn("n_r", F.sum("c_r").over(gw).cast("bigint"))
        .withColumn(
            # COALESCE before the sum: an empty target slice must give
            # n_t = 0 (the oracle's COUNT(*) semantics), not a NULL
            # that nulls every weight downstream
            "n_t",
            F.sum(F.coalesce(F.col("c_t"), F.lit(0))).over(gw).cast("bigint"),
        )
    )
    w = joined.select(
        "token",
        (
            F.log(
                (F.coalesce(F.col("c_t"), F.lit(0)) + 1)
                / (F.col("n_t") + F.col("v")).cast("double")
            )
            - F.log((F.col("c_r") + 1) / (F.col("n_r") + F.col("v")).cast("double"))
        ).alias("lw"),
    )
    scored = (
        toks.join(F.broadcast(w), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg("lw"), 6).alias("avg_log_ratio"),
        )
    )
    return scored.orderBy(F.desc("avg_log_ratio"), "doc_id").limit(DSIR_TOP_K)


@register(
    "ml_naive_bayes_lang",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    labeled AS (
      SELECT t.doc_id, t.token, d.lang,
             (t.doc_id % {NB_TEST_MOD} = 0) AS is_test
      FROM toks t JOIN documents d ON d.doc_id = t.doc_id
    ),
    langs AS (SELECT DISTINCT lang FROM documents),
    prior AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents WHERE doc_id % {NB_TEST_MOD} <> 0 GROUP BY lang
    ),
    prior_tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM prior),
    cnt AS (
      SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS c
      FROM labeled WHERE NOT is_test GROUP BY lang, token
    ),
    nl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_l FROM cnt GROUP BY lang),
    vocab AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v
              FROM labeled WHERE NOT is_test),
    test AS (SELECT doc_id, token FROM labeled WHERE is_test),
    scores AS (
      SELECT te.doc_id, lg.lang,
             SUM(LN((COALESCE(c.c, 0) + 1)
                    / CAST(nl.n_l + vocab.v AS DOUBLE))) AS loglik
      FROM test te
      CROSS JOIN langs lg
      LEFT JOIN cnt c ON c.lang = lg.lang AND c.token = te.token
      JOIN nl ON nl.lang = lg.lang
      CROSS JOIN vocab
      GROUP BY te.doc_id, lg.lang
    ),
    posterior AS (
      SELECT s.doc_id, s.lang,
             ROUND(s.loglik + LN(p.n_docs / CAST(pt.n AS DOUBLE)), 6) AS score
      FROM scores s JOIN prior p ON p.lang = s.lang CROSS JOIN prior_tot pt
    ),
    pred AS (
      SELECT doc_id, lang AS pred_lang,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang) AS rn
      FROM posterior
    )
    SELECT d.lang AS true_lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred p JOIN documents d ON d.doc_id = p.doc_id
    WHERE p.rn = 1
    GROUP BY true_lang, pred_lang
    ORDER BY true_lang, pred_lang
    """,
    tags=("llm", "ml", "classifier"),
)
def ml_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained multinomial naive Bayes: fit token likelihoods per lang
    on the 80% train split (doc_id mod 5 ≠ 0, Laplace α=1), predict the
    held-out 20%, output the confusion matrix — the cheap supervised
    scorer corpus pipelines train when a labeled slice exists (the
    fixture's langs share a vocabulary, so the matrix documents the
    honest near-chance outcome rather than a fake win; the PLUMBING —
    train/score/argmax at corpus scale — is the operator under test).

    Model relations: (lang, token) counts, per-lang totals, vocab size,
    doc priors — all label/vocab-sized and broadcast; the test token
    stream crosses only the 5-row lang relation (bounded 5× expansion).
    Argmax is ROW_NUMBER over (rounded score DESC, lang) — the rounded-
    argmax determinism contract — and the confusion matrix is exact
    counts."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    toks = _toks(spark, sf_dir)
    is_test = F.col("doc_id") % NB_TEST_MOD == 0
    train_toks = toks.where(~is_test).join(docs, "doc_id")
    cnt = train_toks.groupBy("lang", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    nl = cnt.groupBy("lang").agg(F.sum("c").cast("bigint").alias("n_l"))
    vocab = cnt.select("token").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    prior = (
        docs.where(~is_test)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    prior_tot = prior.agg(F.sum("n_docs").cast("bigint").alias("n"))
    langs = docs.select("lang").distinct()
    test = toks.where(is_test)
    scores = (
        test.crossJoin(F.broadcast(langs))
        .join(F.broadcast(cnt), ["lang", "token"], "left")
        .join(F.broadcast(nl), "lang")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1)
                    / (F.col("n_l") + F.col("v")).cast("double")
                )
            ).alias("loglik")
        )
    )
    posterior = (
        scores.join(F.broadcast(prior), "lang")
        .crossJoin(F.broadcast(prior_tot))
        .select(
            "doc_id",
            "lang",
            F.round(
                F.col("loglik") + F.log(F.col("n_docs") / F.col("n").cast("double")), 6
            ).alias("score"),
        )
    )
    pred = posterior.select(
        "doc_id",
        F.col("lang").alias("pred_lang"),
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy(F.desc("score"), "lang"))
        .alias("rn"),
    ).where(F.col("rn") == 1)
    return (
        pred.join(docs.select("doc_id", F.col("lang").alias("true_lang")), "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


@register(
    "corpus_token_type_ratio",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    per_doc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT token) AS BIGINT) AS n_types
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_types,
           ROUND(n_types / CAST(n_tokens AS DOUBLE), 6) AS ttr,
           ROUND(LN(n_types) / LN(n_tokens), 6) AS herdan_c
    FROM per_doc WHERE n_tokens >= 2
    ORDER BY doc_id
    """,
    tags=("llm", "text", "quality"),
)
def corpus_token_type_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per document: type-token ratio and Herdan's C
    (log-log TTR, the length-robust variant) — the repetitiveness
    signal quality filters threshold alongside `text_repetition_ratio`
    (which looks at n-gram repeats; this looks at vocabulary use).

    One groupBy over the token stream; both statistics are fixed
    expressions over two exact ints.  Docs with <2 tokens are excluded
    on BOTH sides — ln(1)=0 would put a literal zero in the Herdan
    denominator (the degenerate-doc lesson from
    `corpus_span_corruption_plan`, tests/test_short_doc_edges.py)."""
    per_doc = (
        _toks(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.countDistinct("token").cast("bigint").alias("n_types"),
        )
    )
    return (
        per_doc.where(F.col("n_tokens") >= 2)
        .select(
            "doc_id",
            "n_tokens",
            "n_types",
            F.round(F.col("n_types") / F.col("n_tokens").cast("double"), 6).alias(
                "ttr"
            ),
            F.round(F.log("n_types") / F.log("n_tokens"), 6).alias("herdan_c"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_zipf_fit",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    uni AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY token),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, token) AS rnk FROM uni
    ),
    pts AS (SELECT LN(rnk) AS x, LN(c) AS y FROM ranked),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
      FROM pts
    )
    -- degenerate-spectrum guards (NULL, both engines): a 1-token vocab
    -- zeroes the slope denominator; an all-equal-counts corpus zeroes r2's
    SELECT n AS n_vocab,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
           END AS zipf_slope,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             ROUND((sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx))) / n, 4)
           END AS intercept,
           CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0 THEN
             ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                   / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4)
           END AS r2
    FROM s
    """,
    tags=("llm", "text", "stats"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus frequency spectrum: OLS of
    ln(frequency) on ln(rank).  Natural text sits near slope −1;
    a large departure is the canary for boilerplate floods or
    synthetic/templated content — a whole-corpus health check next to
    the per-doc quality scores.

    The vocab aggregates once from the token stream (map-side combine);
    the rank window and the regression sums run over the VOCAB-sized
    relation.  Rank ties break by token, so ranks are identical across
    engines; the log-space regression sums are doubles accumulated in
    engine order over the vocabulary → 4dp rounding (the
    `text_source_divergence` contract).  Same closed-form normal
    equations as `stats_regression_by_group`."""
    uni = (
        _toks(spark, sf_dir)
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    ranked = uni.select(
        "c",
        F.row_number().over(Window.orderBy(F.desc("c"), "token")).alias("rnk"),
    )
    pts = ranked.select(F.log("rnk").alias("x"), F.log("c").alias("y"))
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    slope = (n * sxy - sx * sy) / varx_n
    # degenerate-spectrum guards mirror the oracle: NULL, never an ANSI
    # divide-by-zero crash (1-token vocab; all-equal token counts)
    return s.select(
        n.alias("n_vocab"),
        F.when(varx_n != 0, F.round(slope, 4)).alias("zipf_slope"),
        F.when(varx_n != 0, F.round((sy - sx * slope) / n, 4)).alias("intercept"),
        F.when(
            (varx_n != 0) & (vary_n != 0),
            F.round(
                ((n * sxy - sx * sy) * (n * sxy - sx * sy)) / (varx_n * vary_n), 4
            ),
        ).alias("r2"),
    )


TEMP_MIX_MAX_EPOCHS_MILLI = 4000  # >4 epochs of one source = overfit risk


@register(
    "corpus_temperature_mixture",
    oracle="""
    WITH tok AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                      t -> LENGTH(t) > 0))) AS BIGINT)
               AS n_tokens
      FROM documents
      WHERE text IS NOT NULL AND lang IS NOT NULL
      GROUP BY lang
      HAVING SUM(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                 t -> LENGTH(t) > 0))) > 0
    ),
    w AS (
      SELECT lang, n_docs, n_tokens,
             CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS wgt
      FROM tok
    ),
    tot AS (
      SELECT CAST(SUM(wgt) AS BIGINT) AS wsum,
             CAST(SUM(n_tokens) AS BIGINT) AS tsum
      FROM w
    )
    SELECT w.lang, w.n_docs, w.n_tokens,
           CAST(w.wgt * 1000000 // tot.wsum AS BIGINT) AS sample_ppm,
           CAST((CAST(2 AS HUGEINT) * tot.tsum * w.wgt * 1000)
                // (CAST(tot.wsum AS HUGEINT) * w.n_tokens) AS BIGINT)
             AS epochs_milli,
           (CAST(2 AS HUGEINT) * tot.tsum * w.wgt * 1000)
             // (CAST(tot.wsum AS HUGEINT) * w.n_tokens) > 4000
             AS overfit_risk
    FROM w CROSS JOIN tot
    ORDER BY lang
    """,
    tags=("llm", "selection", "mixture"),
)
def corpus_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture allocation (τ = 0.5) across languages —
    the multilingual sampling rule XLM-R/mT5 published: sampling
    probability ∝ tokens^τ flattens the head so low-resource slices
    are seen more often than their raw share.  Paired with the
    data-constrained-scaling epoch audit (Muennighoff et al. 2023):
    under a fixed training budget of 2× the corpus (B = 2·Σtokens),
    the expected epochs over slice i is B·p_i/tokens_i — slices pushed
    past ~4 epochs repeat enough to stop contributing, so the op flags
    them.  This is the allocation REPORT; [[corpus_mixture_weighted_sample]]
    is the hash-deterministic row-level sampler the ppm rates feed.

    Exactness device: τ = 0.5 makes the weight an integer square root
    — IEEE sqrt is correctly rounded (bit-identical across engines,
    unlike pow/exp), and FLOOR(SQRT(n)) is exact for n ≪ 2^52 — so
    weights, shares (ppm) and epochs (milli) are ALL integer
    arithmetic: no float ever crosses the engine boundary.

    Scale shape: one token-count aggregate over the corpus (map-side
    combined, |langs| rows out), then |langs|-sized arithmetic against
    a broadcast 1-row total.  Zero-token and NULL-lang slices are
    excluded identically on both sides (the divide guard rule)."""
    d = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    ntoks = F.size(
        F.filter(F.split(F.col("text"), " "), lambda t: F.length(t) > 0)
    ).cast("bigint")
    tok = (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(ntoks).cast("bigint").alias("n_tokens"),
        )
        .where(F.col("n_tokens") > 0)
    )
    w = tok.withColumn(
        "wgt", F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("bigint")
    )
    tot = w.agg(
        F.sum("wgt").cast("bigint").alias("wsum"),
        F.sum("n_tokens").cast("bigint").alias("tsum"),
    )
    # The epoch numerator 2·tsum·wgt·1000 reaches ~2.5e23 at a 100 TB
    # corpus (tsum ~ 2.5e13 tokens, wgt ~ 5e6) — past BIGINT.  DuckDB
    # BIGINT multiplication OVERFLOWS loudly rather than auto-promoting,
    # so the oracle casts its first factor to HUGEINT explicitly (the
    # r7 ADVICE finding); the Spark side widens to DECIMAL(38,0) the
    # same way (integer `div` is exact on decimals too), and only the
    # milli-epoch QUOTIENT — always small — casts back to BIGINT.
    epochs = F.expr(
        "(CAST(2 AS DECIMAL(38,0)) * tsum * wgt * 1000)"
        " div (CAST(wsum AS DECIMAL(38,0)) * n_tokens)"
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.expr("wgt * 1000000 div wsum").cast("bigint").alias("sample_ppm"),
            epochs.cast("bigint").alias("epochs_milli"),
            (epochs > TEMP_MIX_MAX_EPOCHS_MILLI).alias("overfit_risk"),
        )
        .orderBy("lang")
    )
