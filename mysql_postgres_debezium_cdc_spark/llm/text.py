"""Text analysis for LLM-data pipelines: stats/quality scoring, language
ID (stopword-profile heuristic), tokenizer-style counting, document
fingerprinting.

Everything is Catalyst built-ins over the ``documents`` table — per-row
narrow transformations (no shuffle at all until the final aggregate, if
any), so these scale embarrassingly: 100 TB of text is a pure map over
partitions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mysql_postgres_debezium_cdc_spark.registry import register
from mysql_postgres_debezium_cdc_spark.sources.parquet import load, spread_small_scan

# Tiny stopword profiles for the heuristic language scorer.  Word-match
# counts against each profile; argmax wins.  (A production lang-id uses
# char-n-gram profiles — same argmax-over-profile-scores shape.)
LANG_PROFILES = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

TOKEN_REGEX = "[a-z0-9]+|[^a-z0-9 ]"  # BPE-ish pre-tokenizer: words or single symbols


@register(
    "text_stats",
    oracle="""
    SELECT
      doc_id,
      LENGTH(text) AS n_chars,
      LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> LENGTH(t) > 0)) AS n_tokens,
      ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
            / LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> LENGTH(t) > 0)), 4)
        AS avg_token_len,
      LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                      t -> LIST_CONTAINS(['the','and','of','to','a'], t))) AS n_stopwords
    FROM documents
    ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document size/shape statistics."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: F.length(t) > 0)
    stop = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(toks),
            4,
        ).alias("avg_token_len"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
        .cast("bigint")
        .alias("n_stopwords"),
    ).orderBy("doc_id")


@register(
    "text_quality_score",
    oracle="""
    WITH s AS (
      SELECT doc_id, lang, n_chars,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> LENGTH(t) > 0)) AS n_tokens,
             LEN(LIST_DISTINCT(LIST_FILTER(STRING_SPLIT(text, ' '), t -> LENGTH(t) > 0)))
               AS n_unique
      FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           ROUND(CAST(n_unique AS DOUBLE) / n_tokens, 4) AS ttr,
           CASE WHEN n_tokens BETWEEN 20 AND 1000
                 AND CAST(n_unique AS DOUBLE) / n_tokens >= 0.3
                THEN 1 ELSE 0 END AS passes_quality
    FROM s
    ORDER BY doc_id
    """,
    tags=("llm", "text", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate: length window + type-token ratio — the shape of a
    Gopher/C4-style heuristic filter."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: F.length(t) > 0)
    n_tokens = F.size(toks).cast("bigint")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    return d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        F.round(ttr, 4).alias("ttr"),
        F.when(n_tokens.between(20, 1000) & (ttr >= 0.3), 1).otherwise(0).alias(
            "passes_quality"
        ),
    ).orderBy("doc_id")


GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3.0
GOPHER_MAX_MWL = 10.0
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in")
GOPHER_MIN_STOPWORDS = 2
GOPHER_MIN_DISTINCT_RATIO = 0.5

_GOPHER_STOP_SQL = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)


@register(
    "text_gopher_quality_flags",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(LEN(toks) AS BIGINT) AS n_words,
             LIST_REDUCE(LIST_PREPEND(0, [LENGTH(t) FOR t IN toks]),
                         (a, b) -> a + b) * 1.0 / LEN(toks) AS mwl,
             LEN(LIST_DISTINCT(toks)) * 1.0 / LEN(toks) AS dr,
             CAST(LEN(LIST_INTERSECT(LIST_DISTINCT(toks),
                                     [{_GOPHER_STOP_SQL}])) AS BIGINT) AS n_stop
      FROM d
    )
    SELECT doc_id, n_words,
           ROUND(mwl, 3) AS mean_word_len,
           ROUND(dr, 4) AS distinct_ratio,
           n_stop AS n_stopwords,
           CASE WHEN n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
                THEN 1 ELSE 0 END AS pass_word_count,
           CASE WHEN mwl BETWEEN {GOPHER_MIN_MWL} AND {GOPHER_MAX_MWL}
                THEN 1 ELSE 0 END AS pass_mean_len,
           CASE WHEN n_stop >= {GOPHER_MIN_STOPWORDS} THEN 1 ELSE 0 END
             AS pass_stopwords,
           CASE WHEN dr >= {GOPHER_MIN_DISTINCT_RATIO} THEN 1 ELSE 0 END
             AS pass_repetition,
           CASE WHEN n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
                 AND mwl BETWEEN {GOPHER_MIN_MWL} AND {GOPHER_MAX_MWL}
                 AND n_stop >= {GOPHER_MIN_STOPWORDS}
                 AND dr >= {GOPHER_MIN_DISTINCT_RATIO}
                THEN 1 ELSE 0 END AS pass_overall
    FROM m
    ORDER BY doc_id
    """,
    tags=("llm", "text", "quality", "gopher"),
)
def text_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule battery (Rae et al. 2021 §A1.1, adapted to the
    fixture's token soup): word-count window, mean-word-length window,
    minimum distinct-stopword presence, and a repetition gate
    (distinct-token ratio), each reported as its OWN flag plus the
    conjunction — a curation pipeline tunes and audits rules
    individually, which single-score gates ([[text_quality_score]])
    cannot support.  Rules the fixture cannot exercise (symbol-to-word
    ratio, bullet/ellipsis line fractions — the corpus has no symbols
    or line structure) are omitted rather than vacuously computed.

    Scale shape: one narrow pass — every metric is a per-row array
    fold (JVM higher-order functions, no explode, no shuffle); the
    output is corpus-sized with a sort for presentation only.  Rule
    thresholds compare UNROUNDED doubles that both engines derive from
    integers via one exactly-rounded division, so the flags are
    deterministic; only the reported metrics round (3/4dp)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = d.select("doc_id", toks.alias("toks"))
    n_words = F.size(F.col("toks")).cast("bigint")
    mwl = (
        F.aggregate(
            F.transform(F.col("toks"), F.length),
            F.lit(0),
            lambda a, b: a + b,
        )
        * F.lit(1.0)
        / F.size(F.col("toks"))
    )
    dr = F.size(F.array_distinct(F.col("toks"))) * F.lit(1.0) / F.size(F.col("toks"))
    n_stop = (
        F.size(
            F.array_intersect(
                F.array_distinct(F.col("toks")),
                F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            )
        )
        .cast("bigint")
    )
    m = base.select(
        "doc_id",
        n_words.alias("n_words"),
        mwl.alias("mwl"),
        dr.alias("dr"),
        n_stop.alias("n_stop"),
    )
    p_wc = F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    p_ml = F.col("mwl").between(GOPHER_MIN_MWL, GOPHER_MAX_MWL)
    p_st = F.col("n_stop") >= GOPHER_MIN_STOPWORDS
    p_rep = F.col("dr") >= GOPHER_MIN_DISTINCT_RATIO
    flag = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    return m.select(
        "doc_id",
        "n_words",
        F.round(F.col("mwl"), 3).alias("mean_word_len"),
        F.round(F.col("dr"), 4).alias("distinct_ratio"),
        F.col("n_stop").alias("n_stopwords"),
        flag(p_wc).alias("pass_word_count"),
        flag(p_ml).alias("pass_mean_len"),
        flag(p_st).alias("pass_stopwords"),
        flag(p_rep).alias("pass_repetition"),
        flag(p_wc & p_ml & p_st & p_rep).alias("pass_overall"),
    ).orderBy("doc_id")


def _lang_score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
    return (
        f"LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> LIST_CONTAINS([{words}], t)))"
    )


@register(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_lang_score_sql("en")} AS s_en,
             {_lang_score_sql("es")} AS s_es,
             {_lang_score_sql("fr")} AS s_fr,
             {_lang_score_sql("de")} AS s_de,
             {_lang_score_sql("zh")} AS s_zh
      FROM documents
    )
    SELECT doc_id, lang,
           CASE GREATEST(s_en, s_es, s_fr, s_de, s_zh)
             WHEN 0 THEN 'und'
             WHEN s_en THEN 'en'
             WHEN s_es THEN 'es'
             WHEN s_fr THEN 'fr'
             WHEN s_de THEN 'de'
             ELSE 'zh'
           END AS predicted_lang
    FROM scored
    ORDER BY doc_id
    """,
    tags=("llm", "text", "langid"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (argmax of per-language hit counts).

    Ambiguity resolution is a fixed language order (en>es>fr>de>zh),
    mirrored in the oracle's CASE; score 0 → 'und'."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")

    def score(ws: tuple[str, ...]):
        arr = F.array(*[F.lit(w) for w in ws])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("bigint")

    scores = {lang: score(ws) for lang, ws in LANG_PROFILES.items()}
    best = F.greatest(*scores.values())
    pred = (
        F.when(best == 0, "und")
        .when(scores["en"] == best, "en")
        .when(scores["es"] == best, "es")
        .when(scores["fr"] == best, "fr")
        .when(scores["de"] == best, "de")
        .otherwise("zh")
    )
    return d.select("doc_id", "lang", pred.alias("predicted_lang")).orderBy("doc_id")


@register(
    "text_token_count_regex",
    oracle=f"""
    SELECT doc_id,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{TOKEN_REGEX}')) AS BIGINT) AS n_bpe_tokens,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '[0-9]+')) AS BIGINT)       AS n_number_tokens
    FROM documents
    ORDER BY doc_id
    """,
    tags=("llm", "text", "tokenize"),
)
def text_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-style counting with a BPE-ish pre-tokenizer regex
    (ASCII-only pattern → identical under Java regex and RE2)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_REGEX), 0))
        .cast("bigint")
        .alias("n_bpe_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), 0))
        .cast("bigint")
        .alias("n_number_tokens"),
    ).orderBy("doc_id")


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(
               LIST_FILTER(STRING_SPLIT(text, ' '), t -> LENGTH(t) > 0))), ' '))
             AS content_fp,
           MD5(text) AS exact_fp
    FROM documents
    ORDER BY doc_id
    """,
    tags=("llm", "text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint (md5 of the sorted distinct
    token set) + exact fingerprint — the join keys for cheap exact /
    bag-of-words dedup at scale (8-byte-ish keys instead of documents)."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: F.length(t) > 0)
    return d.select(
        "doc_id",
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias("content_fp"),
        F.md5(F.col("text")).alias("exact_fp"),
    ).orderBy("doc_id")


@register(
    "corpus_preprocess_pipeline",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, source, text,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> LENGTH(t) > 0)) AS n_tokens,
             LEN(LIST_DISTINCT(LIST_FILTER(STRING_SPLIT(text, ' '), t -> LENGTH(t) > 0)))
               AS n_unique
      FROM documents
    ),
    filtered AS (
      SELECT * FROM scored
      WHERE n_tokens BETWEEN 20 AND 1000
        AND CAST(n_unique AS DOUBLE) / n_tokens >= 0.3
        AND lang IN ('en', 'es', 'de')
    ),
    deduped AS (
      SELECT text, MIN(doc_id) AS keep_doc_id,
             MIN_BY(lang, doc_id) AS lang,
             MIN_BY(n_tokens, doc_id) AS n_tokens
      FROM filtered
      GROUP BY text
    )
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM deduped
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("llm", "pipeline", "composition"),
)
def corpus_preprocess_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data preprocess: quality filter → language
    filter → exact dedup (keep lowest doc_id) → per-language token
    budget.  One declarative plan: Catalyst fuses the filters into the
    scan, the dedup is the only wide stage before the final (tiny)
    rollup — the 100 TB shape of a C4-style cleanup pass."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: F.length(t) > 0)
    n_tokens = F.size(toks).cast("bigint")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    filtered = (
        d.select("doc_id", "lang", "text", n_tokens.alias("n_tokens"))
        .where(
            F.col("n_tokens").between(20, 1000)
            & (ttr >= 0.3)
            & F.col("lang").isin("en", "es", "de")
        )
    )
    deduped = filtered.groupBy("text").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.min_by("lang", "doc_id").alias("lang"),
        F.min_by("n_tokens", "doc_id").alias("n_tokens"),
    )
    return (
        deduped.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("total_tokens"))
        .orderBy("lang")
    )


@register(
    "corpus_stratified_sample",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_sampled, MIN(doc_id) AS first_doc
    FROM documents
    WHERE doc_id % 10 < 3  -- deterministic 30% sample, same rows both engines
    GROUP BY lang, source
    ORDER BY lang, source
    """,
    tags=("llm", "pipeline", "sampling"),
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: a modulo predicate on the
    stable id picks the SAME 30% everywhere (re-runnable, resumable —
    what `df.sample`'s RNG can't give across engines/retries), counted
    per (lang, source) stratum.  At 100 TB the predicate pushes into the
    scan: the other 70% is never materialized past the reader."""
    d = load(spark, sf_dir, "documents")
    return (
        d.where(F.col("doc_id") % 10 < 3)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.min("doc_id").alias("first_doc"))
        .orderBy("lang", "source")
    )


_PACK_BUDGET = 512  # tokens per packed training sequence
_PACK_SHARDS = 8


@register(
    "corpus_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             doc_id % {_PACK_SHARDS} AS shard,
             LEN(STRING_SPLIT(text, ' ')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT shard, doc_id, n_tokens,
             CAST((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) - n_tokens)
                  // {_PACK_BUDGET} AS BIGINT) AS chunk_id
      FROM toks
    )
    SELECT shard, chunk_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM packed
    GROUP BY shard, chunk_id
    ORDER BY shard, chunk_id
    """,
    tags=("llm", "pipeline", "packing"),
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: assign documents (in stable doc_id
    order) to fixed token-budget chunks, per shard.

    chunk_id = floor(exclusive-prefix-sum(tokens) / budget) — the
    offset-based packing a data loader uses when documents may straddle
    chunk boundaries (the common case with BPE streams).  The prefix sum
    runs INSIDE each shard (`doc_id % {_PACK_SHARDS}`), never globally:
    a corpus-wide running sum would serialize into one partition, while
    per-shard packing is exactly how a real pipeline shards its output
    files — each shard's chunks are independent, so at 100 TB this is
    one shuffle by shard and embarrassingly parallel within."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = toks.withColumn(
        "chunk_id",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / _PACK_BUDGET).cast("bigint"),
    )
    return (
        packed.groupBy("shard", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard", "chunk_id")
    )


@register(
    "text_repetition_ratio",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '),
                                        t -> LENGTH(t) > 0)) AS token
      FROM documents
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
    ws AS (
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
             MAX(tf) AS max_tf,
             CAST(SUM(CASE WHEN tf > 1 THEN tf ELSE 0 END) AS BIGINT) AS dup_tokens
      FROM tf GROUP BY doc_id
    ),
    sh0 AS (
      SELECT doc_id,
             UNNEST([ARRAY_TO_STRING(toks[i:i+2], ' ')
                     FOR i IN RANGE(1, GREATEST(LEN(toks) - 1, 1))]) AS sh
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents)
    ),
    shf AS (SELECT doc_id, sh, COUNT(*) AS c FROM sh0 GROUP BY doc_id, sh),
    ss AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_sh,
             CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_sh
      FROM shf GROUP BY doc_id
    )
    SELECT ws.doc_id, n_tokens,
           ROUND(CAST(dup_tokens AS DOUBLE) / n_tokens, 4) AS dup_word_frac,
           ROUND(CAST(max_tf AS DOUBLE) / n_tokens, 4) AS top_word_frac,
           COALESCE(ROUND(CAST(dup_sh AS DOUBLE) / n_sh, 4), 0.0) AS dup_3gram_frac
    FROM ws LEFT JOIN ss ON ws.doc_id = ss.doc_id
    ORDER BY ws.doc_id
    """,
    tags=("llm", "text", "quality"),
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: fraction of tokens
    that are repeats (Rae et al. 2021 'duplicate word fraction'), the
    most-frequent-token share, and the duplicate-3-gram fraction —
    boilerplate and degenerate-generation detectors.

    Physical shape: token and 3-gram frequencies are explode→groupBy
    aggregations keyed by (doc_id, term) — map-side partial aggregation
    collapses within-partition repeats, and both relations then reduce
    to one row per doc before the doc-level join.  This deliberately
    AVOIDS the per-row array formulation (``transform`` + nested
    ``filter`` counting each distinct token inside the row), which is
    O(len²) per document — quadratic in the 1000-token docs a real
    corpus has, where the explode path stays O(len log len)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda t: F.length(t) > 0)).alias(
            "token"
        ),
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    ws = tf.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.max("tf").alias("max_tf"),
        F.sum(F.when(F.col("tf") > 1, F.col("tf")).otherwise(0))
        .cast("bigint")
        .alias("dup_tokens"),
    )
    # 3-gram stream: non-distinct shingles (counts matter here, unlike
    # the dedup family's distinct shingle sets).
    arr = F.split("text", " ")
    sh = F.when(
        F.size(arr) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - 2),
            lambda i: F.array_join(F.slice(arr, i, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    shf = (
        d.select("doc_id", F.explode(sh).alias("sh"))
        .groupBy("doc_id", "sh")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ss = shf.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_sh"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("dup_sh"),
    )
    return (
        ws.join(ss, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("dup_tokens").cast("double") / F.col("n_tokens"), 4).alias(
                "dup_word_frac"
            ),
            F.round(F.col("max_tf").cast("double") / F.col("n_tokens"), 4).alias(
                "top_word_frac"
            ),
            F.coalesce(
                F.round(F.col("dup_sh").cast("double") / F.col("n_sh"), 4), F.lit(0.0)
            ).alias("dup_3gram_frac"),
        )
        .orderBy("doc_id")
    )


_TFIDF_TOPK = 3


@register(
    "text_tfidf_topk",
    oracle=f"""
    WITH tokens AS (
      SELECT doc_id, UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '),
                                        t -> LENGTH(t) > 0)) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tokens GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, token, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, token) AS rk
      FROM scored
    )
    SELECT doc_id, token, tfidf, rk
    FROM ranked WHERE rk <= {_TFIDF_TOPK}
    ORDER BY doc_id, rk
    """,
    tags=("llm", "text", "tfidf"),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF — the classic
    corpus-analytics primitive (keyword extraction, quality filters,
    topic drift monitoring).

    Plan shape at scale: term frequencies are one groupBy over the
    exploded token stream (map-side partial aggregation collapses
    within-partition repeats before the shuffle); document frequencies
    aggregate the SAME tf relation (one row per (doc, token), far
    smaller than the token stream — no second pass over the corpus);
    the |vocab|-sized idf table then broadcasts back onto tf, and the
    per-doc top-k window is keyed by doc_id (WindowGroupLimit prunes to
    k rows per partition before the sort).  N (total docs) rides along
    as a broadcast scalar subquery, not a collected literal.

    Determinism: idf = LN(N/df) where N/df is an exact IEEE division in
    both engines; LN agrees to <1 ulp and scores are rounded to 4dp with
    a deterministic (tfidf DESC, token) tie-break, so the value hash is
    stable cross-engine."""
    d = spread_small_scan(load(spark, sf_dir, "documents"))
    tokens = d.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda t: F.length(t) > 0)).alias("token"),
    )
    tf = tokens.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= _TFIDF_TOPK)
        .orderBy("doc_id", "rk")
    )


@register(
    "text_edit_distance_pairs",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, text,
             ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT(text, ' ')[1:8]), ' ') AS fp
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           LEVENSHTEIN(a.text, b.text) AS edit_dist,
           CAST(GREATEST(LENGTH(a.text), LENGTH(b.text)) AS BIGINT) AS max_len
    FROM keyed a JOIN keyed b ON a.fp = b.fp AND a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
    """,
    tags=("llm", "text", "editdistance"),
)
def text_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit distance over fingerprint-blocked candidate pairs —
    the characterwise verification kernel fuzzy matching uses after a
    cheap blocking stage (same blocking-then-verify shape as the
    MinHash/SimHash families, with Levenshtein as the verifier).

    Levenshtein is O(len²) per pair, so it NEVER runs all-pairs: the
    fingerprint block bounds candidates, and both engines implement the
    same unit-cost dynamic program, so distances match exactly.  The
    fingerprint groupBy is the only wide stage; at 100 TB the block
    key's fan-out bound (cap group width) is the safety valve, exactly
    like bucket-width caps in the LSH families."""
    d = load(spark, sf_dir, "documents")
    fp = F.array_join(F.array_sort(F.slice(F.split(F.col("text"), " "), 1, 8)), " ")
    keyed = d.select("doc_id", "text", fp.alias("fp"))
    a = keyed.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"), "fp")
    b = keyed.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("text_a", "text_b").cast("bigint").alias("edit_dist"),
            F.greatest(F.length("text_a"), F.length("text_b")).cast("bigint").alias("max_len"),
        )
        .orderBy("doc_a", "doc_b")
    )


_BIGRAM_TOPK = 50


@register(
    "corpus_bigram_lm_counts",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
    ),
    bigrams AS (
      SELECT w[i] AS w1, w[i + 1] AS w2
      FROM toks, LATERAL (SELECT UNNEST(RANGE(1, GREATEST(LEN(w), 1))) AS i)
    ),
    counts AS (
      SELECT w1, w2, COUNT(*) AS cnt FROM bigrams GROUP BY w1, w2
    ),
    continuation AS (
      SELECT w2, COUNT(*) AS n_left_contexts FROM counts GROUP BY w2
    ),
    ranked AS (
      SELECT c.w1, c.w2, c.cnt, k.n_left_contexts,
             ROW_NUMBER() OVER (ORDER BY c.cnt DESC, c.w1, c.w2) AS rk
      FROM counts c JOIN continuation k ON c.w2 = k.w2
    )
    SELECT w1, w2, cnt, n_left_contexts
    FROM ranked WHERE rk <= {_BIGRAM_TOPK}
    ORDER BY cnt DESC, w1, w2
    """,
    tags=("llm", "text", "lm"),
)
def corpus_bigram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram statistics for n-gram language modeling: raw
    bigram counts plus each right-word's continuation count (distinct
    left contexts — the Kneser-Ney continuation numerator).

    Plan shape: bigrams explode once from the token arrays; the count
    groupBy partially aggregates map-side (the vocabulary² keyspace is
    far smaller than the token stream).  Continuation counts aggregate
    the COUNTS relation, not the corpus — the same two-level device as
    TF-IDF's document frequencies — and join back broadcast-sized
    (|vocab| rows).  The global top-k rank runs over the aggregated
    relation and WindowGroupLimit prunes it before the final sort."""
    d = spread_small_scan(load(spark, sf_dir, "documents"))
    w = F.split("text", " ")
    bigrams = d.select(
        F.explode(
            F.when(
                F.size(w) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - 1),
                    lambda i: F.struct(
                        F.element_at(w, i).alias("w1"),
                        F.element_at(w, i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("b")
    ).select("b.w1", "b.w2")
    counts = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    continuation = counts.groupBy("w2").agg(
        F.count(F.lit(1)).alias("n_left_contexts")
    )
    ranked = counts.join(F.broadcast(continuation), "w2").withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2"))
        ),
    )
    return (
        ranked.where(F.col("rk") <= _BIGRAM_TOPK)
        .select("w1", "w2", "cnt", "n_left_contexts")
        .orderBy(F.desc("cnt"), "w1", "w2")
    )


@register(
    "text_unigram_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '),
                                        t -> LENGTH(t) > 0)) AS token
      FROM documents
    ),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM toks),
    uni AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
    scored AS (
      SELECT t.doc_id, LN(tot.n / u.c) AS nlp
      FROM toks t JOIN uni u USING (token) CROSS JOIN tot
    )
    SELECT doc_id, COUNT(*) AS n_tokens, ROUND(AVG(nlp), 4) AS unigram_xent
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("llm", "text", "quality", "lm"),
)
def text_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram cross-entropy per document — the perplexity-proxy quality
    filter (CCNet ranks documents by LM perplexity; the unigram model is
    its degenerate, SQL-expressible form and the same plumbing carries a
    real LM's token scores).  Low score ⇒ common-word documents; high ⇒
    rare-token noise.

    Two-level shape (the TF-IDF device): unigram counts aggregate the
    token stream once (map-side partials), the |vocab| model broadcasts
    back onto the stream, and the corpus token total rides as a
    broadcast scalar — the corpus is read once, the model is never
    collected to the driver.  AVG of logs accumulates in engine order →
    rounded to 4dp (LN itself agrees to <1 ulp on exact quotients)."""
    d = spread_small_scan(load(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda t: F.length(t) > 0)).alias(
            "token"
        ),
    )
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = uni.agg(F.sum("c").cast("double").alias("n"))
    scored = (
        toks.join(F.broadcast(uni), "token")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.log(F.col("n") / F.col("c")).alias("nlp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("nlp"), 4).alias("unigram_xent"),
        )
        .orderBy("doc_id")
    )


_BPE_TOPK = 30


@register(
    "corpus_bpe_pair_counts",
    oracle=f"""
    WITH chars AS (
      SELECT doc_id, STRING_SPLIT(REPLACE(text, ' ', '_'), '') AS cs
      FROM documents
    ),
    pairs AS (
      SELECT cs[i] || cs[i + 1] AS pair
      FROM chars, LATERAL (SELECT UNNEST(RANGE(1, GREATEST(LEN(cs), 1))) AS i)
    ),
    counts AS (SELECT pair, COUNT(*) AS cnt FROM pairs GROUP BY pair),
    ranked AS (
      SELECT pair, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS rk
      FROM counts
    )
    SELECT pair, cnt FROM ranked WHERE rk <= {_BPE_TOPK}
    ORDER BY cnt DESC, pair
    """,
    tags=("llm", "text", "bpe"),
)
def corpus_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first iteration of BPE vocabulary training at corpus scale:
    adjacent symbol-pair frequencies (spaces folded to '_' so word
    boundaries count like any symbol, the GPT-2 convention), ranked to
    find the first merge.  A full BPE trainer loops merge→recount;
    each round is exactly this job over the re-tokenized corpus, so
    this IS the distributed kernel.

    Plan: chars explode once; the pair groupBy partially aggregates
    map-side (the symbol-pair keyspace is tiny vs the character
    stream); the global top-k ranks the aggregated relation only."""
    d = spread_small_scan(load(spark, sf_dir, "documents"))
    cs = F.split(F.replace(F.col("text"), F.lit(" "), F.lit("_")), "")
    cs = F.filter(cs, lambda c: F.length(c) > 0)
    pair_arr = F.when(
        F.size(cs) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(cs) - 1),
            lambda i: F.concat(F.element_at(cs, i), F.element_at(cs, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = d.select(F.explode(pair_arr).alias("pair"))
    counts = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("pair"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _BPE_TOPK)
        .select("pair", "cnt")
        .orderBy(F.desc("cnt"), "pair")
    )


# ---------------------------------------------------------------------------
# Document chunking: fixed-size overlapping token windows.
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 64  # chunk width in tokens
CHUNK_STRIDE = 48  # step between chunk starts (16-token overlap)


@register(
    "corpus_chunk_documents",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS toks, LEN(STRING_SPLIT(text, ' ')) AS n
      FROM documents
    ),
    c AS (
      SELECT doc_id, n,
             UNNEST(RANGE(0, CAST(CEIL(GREATEST(n - {CHUNK_TOKENS}, 0) / CAST({CHUNK_STRIDE} AS DOUBLE)) AS BIGINT) + 1)) AS chunk_id
      FROM d
    )
    SELECT c.doc_id, c.chunk_id,
           CAST(1 + c.chunk_id * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
           CAST(LEAST({CHUNK_TOKENS}, c.n - c.chunk_id * {CHUNK_STRIDE}) AS BIGINT) AS n_chunk_tokens,
           md5(ARRAY_TO_STRING(d.toks[(1 + c.chunk_id * {CHUNK_STRIDE}):(c.chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS})], ' ')) AS chunk_md5
    FROM c JOIN d ON c.doc_id = d.doc_id
    ORDER BY c.doc_id, c.chunk_id
    """,
    tags=("llm", "text", "chunk"),
)
def corpus_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width overlapping token chunks per document — the splitter
    side of the packing/chunking pair (`corpus_pack_sequences` packs
    short docs UP to a budget; this cuts long docs DOWN to one), the
    standard pre-step for context-window-bounded training and RAG
    indexing.  Chunk starts step by STRIDE (< WIDTH, so consecutive
    chunks overlap and no span falls on a boundary unseen); the final
    chunk is allowed to run short rather than re-anchoring to the tail,
    so chunk boundaries are a pure function of (doc length, constants) —
    deterministic across engines and re-runs.

    Scale shape: a single narrow generate per document (sequence →
    explode), no shuffle at all until the output sort — chunking is
    embarrassingly parallel and stays inside whole-stage codegen; the
    chunk text is emitted as MD5 so the certified fact is the exact
    byte content of every chunk without shipping the corpus twice.
    """
    return chunk_documents(load(spark, sf_dir, "documents")).orderBy(
        "doc_id", "chunk_id"
    )


def chunk_documents(
    docs: DataFrame, width: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """(doc_id, text) -> one row per (doc_id, chunk).  Boundary contract
    (property-tested in tests/test_chunking.py against a python oracle):
    starts at 1, 1+stride, …; n_chunks = ceil(max(n-width,0)/stride)+1;
    the final chunk runs short instead of re-anchoring, so every token
    is covered, chunk k covers tokens [1+k*stride, min(1+k*stride+width-1, n)],
    and boundaries depend only on (n, width, stride)."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    n_chunks = F.ceil(F.greatest(n - width, F.lit(0)) / F.lit(float(stride))) + 1
    d = docs.select("doc_id", toks.alias("toks"), n.alias("n"), n_chunks.alias("nc"))
    return d.select(
        "doc_id",
        "toks",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("chunk_id"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        (F.lit(1) + F.col("chunk_id") * stride).cast("bigint").alias("chunk_start"),
        F.least(F.lit(width), F.col("n") - F.col("chunk_id") * stride)
        .cast("bigint")
        .alias("n_chunk_tokens"),
        F.md5(
            F.array_join(
                F.slice(
                    F.col("toks"),
                    F.lit(1) + F.col("chunk_id") * stride,
                    F.lit(width),
                ),
                " ",
            ).cast("binary")
        ).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# PMI phrase mining: collocation scores over word bigrams.
# ---------------------------------------------------------------------------

PMI_MIN_COUNT = 5  # ignore bigrams rarer than this (PMI is noise at low n)
PMI_TOPK = 50


@register(
    "text_pmi_bigrams",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '), t -> LENGTH(t) > 0) AS ts
      FROM documents
    ),
    uni AS (
      SELECT u.t AS tok, COUNT(*) AS n
      FROM toks, UNNEST(ts) AS u(t)
      GROUP BY u.t
    ),
    bi AS (
      SELECT ts[i] AS w1, ts[i+1] AS w2, COUNT(*) AS n_xy
      FROM toks, UNNEST(RANGE(1, GREATEST(LEN(ts), 1))) AS r(i)
      GROUP BY ts[i], ts[i+1]
    ),
    tot AS (
      SELECT (SELECT SUM(n) FROM uni) AS n_uni,
             (SELECT SUM(n_xy) FROM bi) AS n_bi
    )
    SELECT w1, w2, n_xy,
           ROUND(LN(CAST(n_xy * n_uni * n_uni AS DOUBLE)
                    / CAST(u1.n * u2.n * n_bi AS DOUBLE)), 4) AS pmi
    FROM bi
    JOIN uni u1 ON u1.tok = bi.w1
    JOIN uni u2 ON u2.tok = bi.w2
    CROSS JOIN tot
    WHERE n_xy >= {PMI_MIN_COUNT}
    QUALIFY ROW_NUMBER() OVER (
      ORDER BY CAST(n_xy * n_uni * n_uni AS DOUBLE)
               / CAST(u1.n * u2.n * n_bi AS DOUBLE) DESC, w1, w2) <= {PMI_TOPK}
    ORDER BY pmi DESC, w1, w2
    """,
    tags=("llm", "text", "pmi"),
)
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocations: the classic phrase
    miner (Mikolov et al.'s word2vec phrases, quality-filter "glued
    words" detection).  PMI = ln(p(xy) / (p(x)·p(y))) over word bigrams,
    min-count-filtered, global top-k.

    Plan shape at scale: bigrams explode once from the token arrays and
    collapse in a map-side partial groupBy (the bigram keyspace ≪ the
    token stream); unigrams aggregate the same way; the two unigram
    joins attach to the AGGREGATED bigram relation (vocabulary-sized,
    not corpus-sized), and both are AQE-broadcast-eligible since a
    unigram table is tiny next to the corpus.  The totals ride as a
    broadcast 1-row relation — no collect.  Top-k ranks the filtered
    collocation table only.

    Determinism: the PMI argument is one exact-integer ratio evaluated
    in a single IEEE division (products stay < 2^63: n_xy·N_uni² at
    web scale needs the LN applied to the factored form instead — at
    fixture scale the direct product is exact and portable); ordering
    uses the unrounded ratio with a (w1, w2) tie-break, the reported
    score rounds LN to 4dp — same device text_tfidf_topk certifies."""
    d = spread_small_scan(load(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: F.length(t) > 0).alias("ts"),
    )
    uni = (
        toks.select(F.explode("ts").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pair_arr = F.when(
        F.size(F.col("ts")) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("ts")) - 1),
            lambda i: F.struct(
                F.element_at(F.col("ts"), i).alias("w1"),
                F.element_at(F.col("ts"), i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bi = (
        toks.select(F.explode(pair_arr).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .where(F.col("n_xy") >= PMI_MIN_COUNT)
    )
    tot = uni.agg(F.sum("n").alias("n_uni")).crossJoin(
        toks.select(
            F.greatest(F.size("ts") - 1, F.lit(0)).alias("nb")
        ).agg(F.sum("nb").alias("n_bi"))
    )
    u1 = uni.select(F.col("tok").alias("w1"), F.col("n").alias("n1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("n").alias("n2"))
    ratio = (F.col("n_xy") * F.col("n_uni") * F.col("n_uni")).cast("double") / (
        F.col("n1") * F.col("n2") * F.col("n_bi")
    ).cast("double")
    scored = (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "n_xy", ratio.alias("_ratio"))
    )
    w = Window.orderBy(F.desc("_ratio"), "w1", "w2")
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= PMI_TOPK)
        .select("w1", "w2", "n_xy", F.round(F.log("_ratio"), 4).alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
    )


# ---------------------------------------------------------------------------
# Length-bucketed training batches: padding-efficiency planning.
# ---------------------------------------------------------------------------

BATCH_SIZE = 8  # docs per training batch within a length bucket


@register(
    "corpus_length_bucketed_batches",
    oracle=f"""
    WITH lens AS (
      SELECT doc_id,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> LENGTH(t) > 0)) AS n_tokens
      FROM documents
    ),
    bucketed AS (
      SELECT doc_id, n_tokens,
             CASE WHEN n_tokens <= 16 THEN 16
                  WHEN n_tokens <= 32 THEN 32
                  WHEN n_tokens <= 64 THEN 64
                  WHEN n_tokens <= 128 THEN 128
                  WHEN n_tokens <= 256 THEN 256
                  WHEN n_tokens <= 512 THEN 512
                  ELSE 1024 END AS bucket
      FROM lens
    ),
    batches AS (
      SELECT bucket,
             CAST((ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) - 1)
                  AS BIGINT) // {BATCH_SIZE} AS batch_id,
             n_tokens
      FROM bucketed
    )
    SELECT bucket, batch_id,
           COUNT(*) AS n_docs,
           MAX(n_tokens) AS max_tokens,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(COUNT(*) * bucket - SUM(n_tokens) AS BIGINT) AS padding_waste
    FROM batches
    GROUP BY bucket, batch_id
    ORDER BY bucket, batch_id
    """,
    tags=("llm", "corpus", "batching"),
)
def corpus_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assembly: group documents into power-of-two
    token-length buckets, then fixed-size batches within each bucket,
    and report the padding waste per batch — the planning pass behind
    bucketed batching in every trainer (pad-to-bucket wastes far less
    compute than pad-to-global-max, and this query quantifies exactly
    how much).

    Plan shape at scale: token counts are a narrow map (no shuffle);
    the batch assignment is ONE window keyed by bucket — 7 fixed
    buckets at any corpus size, so each bucket's row_number runs
    partition-parallel after a 7-key hash exchange, and the per-batch
    aggregate collapses map-side.  With 10¹⁰ documents a 7-key window
    would skew; the production variant adds a shard prefix to the
    window key (doc_id % n_shards, batches numbered per shard) —
    same output contract, same plan shape, documented here because the
    fixture's bucket cardinality doesn't need it.

    Determinism: row_number ties are impossible (doc_id is unique per
    bucket partition), batch_id = (rn-1) div BATCH_SIZE is non-negative
    so truncating and flooring division agree, and all outputs are
    exact integers."""
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split("text", " "), lambda t: F.length(t) > 0))
    lens = d.select("doc_id", n_tokens.cast("bigint").alias("n_tokens"))
    bucket = (
        F.when(F.col("n_tokens") <= 16, 16)
        .when(F.col("n_tokens") <= 32, 32)
        .when(F.col("n_tokens") <= 64, 64)
        .when(F.col("n_tokens") <= 128, 128)
        .when(F.col("n_tokens") <= 256, 256)
        .when(F.col("n_tokens") <= 512, 512)
        .otherwise(1024)
    )
    bucketed = lens.select("doc_id", "n_tokens", bucket.cast("bigint").alias("bucket"))
    w = Window.partitionBy("bucket").orderBy("doc_id")
    batches = bucketed.select(
        "bucket",
        "n_tokens",
        ((F.row_number().over(w) - 1) / BATCH_SIZE).cast("bigint").alias("batch_id"),
    )
    return (
        batches.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .select(
            "bucket",
            "batch_id",
            "n_docs",
            "max_tokens",
            "sum_tokens",
            (F.col("n_docs") * F.col("bucket") - F.col("sum_tokens")).alias(
                "padding_waste"
            ),
        )
        .orderBy("bucket", "batch_id")
    )


# ---------------------------------------------------------------------------
# BPE encoding: apply a fixed merge table, count resulting tokens.
# ---------------------------------------------------------------------------

# Rank-ordered merge table (the artifact BPE *training* produces — see
# corpus_bpe_pair_counts for the training kernel; these ranks were mined
# from the fixture corpus and include a 3-level cascade t+a → ta+b →
# tab+le so the chain exercises merges-of-merges, not just char pairs).
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"),
    ("o", "w"),
    ("s", "t"),
    ("i", "n"),
    ("t", "a"),
    ("ta", "b"),
    ("l", "e"),
    ("tab", "le"),
)


def _bpe_replace_chain_sql(expr: str) -> str:
    """Wrap `expr` (a double-space symbol string) in the merge chain."""
    for x, y in BPE_MERGES:
        expr = f"REPLACE({expr}, ' {x}  {y} ', ' {x}{y} ')"
    return expr


_BPE_WORD_SQL = _bpe_replace_chain_sql(
    "'  ' || REGEXP_REPLACE(w, '(.)', '\\1  ', 'g')"
)


@register(
    "corpus_bpe_encode",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id,
             LIST_FILTER(STRING_SPLIT(text, ' '), w -> LENGTH(w) > 0) AS words
      FROM documents
    ),
    enc AS (
      SELECT doc_id,
             LEN(words) AS n_words,
             CAST(LIST_SUM(LIST_TRANSFORM(words, w -> LENGTH(w))) AS BIGINT)
               AS n_chars,
             CAST(LIST_SUM(LIST_TRANSFORM(words, w ->
               LEN(LIST_FILTER(STRING_SPLIT({_BPE_WORD_SQL}, '  '),
                               t -> LENGTH(t) > 0)))) AS BIGINT) AS n_tokens
      FROM docs
    )
    SELECT doc_id, n_words, n_chars, n_tokens,
           ROUND(CAST(n_chars AS DOUBLE) / n_tokens, 4) AS chars_per_token
    FROM enc
    ORDER BY doc_id
    """,
    tags=("llm", "corpus", "bpe"),
)
def corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenization (the APPLY half; corpus_bpe_pair_counts is the
    TRAIN half): encode every document against a fixed rank-ordered
    merge table and report exact per-document token counts — the number
    every data pipeline needs per document (packing budgets, length
    bucketing, billing) computed by the real merge-table algorithm, not
    a whitespace proxy.

    Algorithm device: a word is expanded to double-space-separated
    symbols ("  t  a  b  l  e  ") and each merge (x,y) of the ranked
    table is applied as one string REPLACE of " x  y " with " xy ".
    The double-space invariant makes the patterns boundary-safe (a
    symbol can never match inside a neighbor because each match
    requires a flanking space from BOTH adjacent separators and each
    replacement restores them), and left-to-right non-overlapping
    REPLACE is exactly BPE's leftmost-greedy application of one rank.
    Merges of merged symbols chain naturally (t+a, ta+b, tab+le turns
    'table' into one token).  Both engines implement REPLACE with
    identical scan semantics, which is what makes real tokenization
    DuckDB-value-checkable.

    Scale shape: pure narrow projection — no shuffle, no UDF, the whole
    merge chain fuses into one whole-stage-codegen expression over each
    partition; 100 TB of text tokenizes embarrassingly parallel.  (A
    50k-merge production vocabulary compiles the same way — the chain
    is just deeper; at that depth a mapInPandas tokenizer with a
    trie-based encoder wins on constant factors, but the per-partition,
    shuffle-free shape is identical.)"""
    d = spread_small_scan(load(spark, sf_dir, "documents"))
    words = F.filter(F.split("text", " "), lambda w: F.length(w) > 0)

    def encode(w):
        cur = F.concat(F.lit("  "), F.regexp_replace(w, "(.)", "$1  "))
        for x, y in BPE_MERGES:
            cur = F.replace(cur, F.lit(f" {x}  {y} "), F.lit(f" {x}{y} "))
        return cur

    def count_tokens(w):
        return F.size(
            F.filter(F.split(encode(w), "  "), lambda t: F.length(t) > 0)
        ).cast("bigint")

    enc = d.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda a, v: a + v,
        ).alias("n_chars"),
        F.aggregate(
            F.transform(words, count_tokens),
            F.lit(0).cast("bigint"),
            lambda a, v: a + v,
        ).alias("n_tokens"),
    )
    return enc.select(
        "doc_id",
        "n_words",
        "n_chars",
        "n_tokens",
        F.round(F.col("n_chars").cast("double") / F.col("n_tokens"), 4).alias(
            "chars_per_token"
        ),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Linear quality-classifier apply (fasttext-style filter, fixed weights).
# ---------------------------------------------------------------------------

# Trained-offline stand-in weights (a production quality filter ships a
# frozen linear/fasttext model exactly like this; the engine's job is the
# APPLY pass).  Chosen so the fixture corpus splits near-evenly.
QC_W_TTR = 3.0
QC_W_STOP = 10.0
QC_W_NTOK = 0.01
QC_BIAS = -2.5


@register(
    "text_quality_classifier",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> LENGTH(t) > 0)) AS n_tok,
             CAST(LEN(LIST_DISTINCT(LIST_FILTER(STRING_SPLIT(text, ' '),
                  t -> LENGTH(t) > 0))) AS DOUBLE)
               / LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> LENGTH(t) > 0)) AS ttr,
             CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                  t -> LIST_CONTAINS(['the','and','of','to','a'], t))) AS DOUBLE)
               / LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> LENGTH(t) > 0))
               AS stop_ratio
      FROM documents
    )
    SELECT doc_id, n_tok, ROUND(ttr, 4) AS ttr, ROUND(stop_ratio, 4) AS stop_ratio,
           ROUND({QC_W_TTR} * ttr + {QC_W_STOP} * stop_ratio
                 + {QC_W_NTOK} * n_tok + {QC_BIAS}, 6) AS logit,
           CASE WHEN {QC_W_TTR} * ttr + {QC_W_STOP} * stop_ratio
                     + {QC_W_NTOK} * n_tok + {QC_BIAS} >= 0
                THEN 1 ELSE 0 END AS keep
    FROM f
    ORDER BY doc_id
    """,
    tags=("llm", "text", "quality", "classifier"),
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen linear quality-classifier APPLY — the inference half of a
    fasttext/logistic quality filter (CCNet, Llama's wikipedia-ref
    filter): per-document features (type-token ratio, stopword ratio,
    length) dotted with shipped weights; documents keep when the logit
    clears the threshold.  The engine reports the logit, not a sigmoid
    probability: the decision is the SIGN, sigmoid is monotone, and
    exp() is the one place two engines' libm could disagree — skipping
    it keeps the score value-checkable with zero tolerance.

    Scale shape: a pure narrow projection (features and dot product
    fuse into one codegen stage over the text column — no shuffle, no
    UDF); 100 TB filters embarrassingly parallel.  A real fasttext
    model adds a hashed-bigram embedding lookup — the hashing-trick
    featurizer in corpus_rag_retrieval is exactly that plumbing.

    Determinism: each feature is one exact-operand IEEE division; the
    weighted sum evaluates in identical left-to-right order in both
    engines; both round the identical double."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
    stop = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tok
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("double")
        / n_tok
    )
    f = d.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tok"),
        ttr.alias("_ttr"),
        stop_ratio.alias("_stop"),
    )
    logit = (
        F.lit(QC_W_TTR) * F.col("_ttr")
        + F.lit(QC_W_STOP) * F.col("_stop")
        + F.lit(QC_W_NTOK) * F.col("n_tok")
        + F.lit(QC_BIAS)
    )
    return f.select(
        "doc_id",
        "n_tok",
        F.round("_ttr", 4).alias("ttr"),
        F.round("_stop", 4).alias("stop_ratio"),
        F.round(logit, 6).alias("logit"),
        F.when(logit >= 0, 1).otherwise(0).alias("keep"),
    ).orderBy("doc_id")


# Coverage thresholds for the vocabulary head-coverage curve.
VOCAB_COVERAGE_THRESHOLDS = (0.5, 0.9, 0.99)


@register(
    "text_vocab_head_coverage",
    oracle="""
    WITH toks AS (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents),
    tf AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
    ordered AS (
      SELECT tok, cnt,
             SUM(cnt) OVER (ORDER BY cnt DESC, tok ROWS UNBOUNDED PRECEDING) AS cum,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rk
      FROM tf
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM tf),
    thr AS (SELECT UNNEST([0.5, 0.9, 0.99]) AS threshold)
    SELECT threshold,
           CAST(MIN(rk) AS BIGINT) AS vocab_size,
           ROUND(CAST(MIN_BY(cum, rk) AS DOUBLE) / ANY_VALUE(total), 6) AS coverage
    FROM ordered, tot, thr
    WHERE cum >= threshold * total
    GROUP BY threshold
    ORDER BY threshold
    """,
    tags=("llm", "text", "tokenizer"),
)
def text_vocab_head_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head coverage — the tokenizer-sizing diagnostic: the
    smallest vocabulary (most-frequent-first) covering 50 / 90 / 99 % of
    all token occurrences.

    The oracle states it as a GLOBAL ordered prefix sum over the term
    frequencies; a literal translation would be an unpartitioned window
    over the whole vocabulary — the `window_ntile` single-partition-sort
    hazard, since vocabulary grows (sub-linearly) with the corpus.  The
    plan here is the scalable two-phase prefix sum:

    1. band each term by ``length(bin(cnt))`` = ⌊log₂ cnt⌋ + 1 —
       integer-exact, and bands partition the frequency axis into
       DISJOINT ranges, so (band DESC, cnt DESC, tok) equals the global
       (cnt DESC, tok) order by construction;
    2. within-band cumulative sums/ranks run under
       ``partitionBy(band)`` — distributed, ≤ 64 partitions of work;
    3. cross-band offsets come from an unpartitioned window over the
       ≤ 64-row BAND SUMMARY (the one place a global window is bounded
       at any corpus size — same argument as
       [[corpus_train_val_test_split]]), broadcast back by AQE.

    Global position = within-band position + band offset.  The corpus
    is scanned once (term counting); everything after operates on the
    vocabulary relation, never the corpus."""
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # Persist the VOCABULARY relation: both the within-band pass and the
    # band summary consume it, and without the cache each branch would
    # re-run the corpus scan + explode + count (the one corpus-sized
    # cost) — same justified-persist call as dedup_minhash_lsh's
    # signature profile.  The cached relation is heads-law small.
    banded = tf.withColumn("band", F.length(F.bin(F.col("cnt")))).persist()
    wb = Window.partitionBy("band").orderBy(F.desc("cnt"), F.asc("tok"))
    within = banded.withColumn(
        "wcum",
        F.sum("cnt").over(wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).withColumn("wrk", F.row_number().over(wb))
    bands = banded.groupBy("band").agg(
        F.sum("cnt").alias("bcnt"), F.count(F.lit(1)).alias("bn")
    )
    wband = Window.orderBy(F.desc("band")).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy()
    off = bands.select(
        "band",
        F.coalesce(F.sum("bcnt").over(wband), F.lit(0)).alias("cnt_off"),
        F.coalesce(F.sum("bn").over(wband), F.lit(0)).alias("rk_off"),
        F.sum("bcnt").over(w_all).cast("bigint").alias("total"),
    )
    cum = within.join(off, "band").select(
        (F.col("wcum") + F.col("cnt_off")).alias("cum"),
        (F.col("wrk") + F.col("rk_off")).alias("rk"),
        "total",
    )
    thr = spark.createDataFrame(
        [(float(t),) for t in VOCAB_COVERAGE_THRESHOLDS], "threshold double"
    )
    return (
        cum.crossJoin(F.broadcast(thr))
        .where(F.col("cum") >= F.col("threshold") * F.col("total"))
        .groupBy("threshold")
        .agg(
            F.min("rk").cast("bigint").alias("vocab_size"),
            F.min_by("cum", "rk").alias("cum_at"),
            F.any_value("total").alias("total_any"),
        )
        .select(
            "threshold",
            "vocab_size",
            F.round(F.col("cum_at").cast("double") / F.col("total_any"), 6).alias("coverage"),
        )
        .orderBy("threshold")
    )


@register(
    "corpus_dataset_card",
    oracle="""
    WITH agg AS (
      SELECT CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END AS source,
             CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END AS lang,
             COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS total_tokens
      FROM documents
      GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())
    ),
    tot AS (SELECT n_docs AS all_docs FROM agg WHERE source = 'ALL' AND lang = 'ALL')
    SELECT source, lang, n_docs, total_chars, total_tokens,
           ROUND(CAST(total_tokens AS DOUBLE) / n_docs, 2) AS avg_tokens,
           ROUND(CAST(n_docs AS DOUBLE) / all_docs, 4) AS doc_share
    FROM agg, tot
    ORDER BY source, lang
    """,
    tags=("llm", "pipeline", "governance"),
)
def corpus_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card / datasheet table: corpus composition by source,
    by language, by (source × language), and overall — document counts,
    character and token volumes, average document length, and each
    cell's share of the corpus.  This is the first table every
    training-data release publishes and the input to mixture-weight
    decisions ([[corpus_mixture_weighted_sample]]).

    One corpus scan: GROUPING SETS expands each row into its four
    grouping combinations BEFORE the partial aggregation, so all four
    granularities ride one Expand + one shuffle (same device as
    [[events_multi_granularity_rollup]]); margin labels are 'ALL'
    (source/lang never collide with it in the fixture domain).  The
    corpus-share denominator is read off the grand-total row with a
    window over the aggregated frame — bounded by the label domains,
    and crucially NOT a filtered self-join, which would recompute the
    aggregation and scan the corpus twice."""
    d = load(spark, sf_dir, "documents")
    base = d.select(
        "source", "lang", "n_chars", F.size(F.split(F.col("text"), " ")).alias("n_toks")
    )
    agg = (
        base.groupingSets([["source", "lang"], ["source"], ["lang"], []], "source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_toks").cast("bigint").alias("total_tokens"),
            # GROUPING() must ride the grouping-sets aggregate itself
            F.grouping("source").alias("g_src"),
            F.grouping("lang").alias("g_lang"),
        )
        .select(
            # GROUPING(), not COALESCE: a margin row and a genuine NULL
            # group are different things — the fixture has no NULL
            # sources, but the contract shouldn't depend on that.
            F.when(F.col("g_src") == 1, "ALL").otherwise(F.col("source")).alias("source"),
            F.when(F.col("g_lang") == 1, "ALL").otherwise(F.col("lang")).alias("lang"),
            "n_docs",
            "total_chars",
            "total_tokens",
        )
    )
    # Grand-total denominator via an unpartitioned window over the
    # AGGREGATED frame (≤ (sources+1)×(langs+1) rows — the bounded-
    # global-window device of corpus_train_val_test_split): a
    # re-derivation through a filtered self-join would recompute the
    # whole aggregation subtree and scan the corpus twice.
    w_all = Window.partitionBy()
    all_docs = F.max(
        F.when((F.col("source") == "ALL") & (F.col("lang") == "ALL"), F.col("n_docs"))
    ).over(w_all)
    return (
        agg.withColumn("all_docs", all_docs)
        .select(
            "source",
            "lang",
            "n_docs",
            "total_chars",
            "total_tokens",
            F.round(F.col("total_tokens").cast("double") / F.col("n_docs"), 2).alias("avg_tokens"),
            F.round(F.col("n_docs").cast("double") / F.col("all_docs"), 4).alias("doc_share"),
        )
        .orderBy("source", "lang")
    )


# Additive-smoothing constant for the source-divergence distributions.
_JS_ALPHA = 1


@register(
    "text_source_divergence",
    oracle=f"""
    WITH toks AS (
      SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
    ),
    counts AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY source, tok),
    vocab AS (SELECT DISTINCT tok FROM counts),
    sources AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY source),
    grid AS (
      SELECT s.source, s.n, v.tok, COALESCE(c.c, 0) AS c
      FROM sources s CROSS JOIN vocab v
      LEFT JOIN counts c ON c.source = s.source AND c.tok = v.tok
    ),
    nv AS (SELECT COUNT(*) AS v FROM vocab),
    probs AS (
      SELECT source, tok,
             (c + {_JS_ALPHA}) / (n + {_JS_ALPHA} * (SELECT v FROM nv)) AS p
      FROM grid
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b, a.tok,
             0.5 * a.p * LOG2(2 * a.p / (a.p + b.p))
             + 0.5 * b.p * LOG2(2 * b.p / (a.p + b.p)) AS term
      FROM probs a JOIN probs b ON a.tok = b.tok AND a.source < b.source
    )
    SELECT source_a, source_b,
           ROUND(SUM(term), 4) AS js_divergence,
           COUNT(*) AS n_vocab
    FROM pairs
    GROUP BY source_a, source_b
    ORDER BY source_a, source_b
    """,
    tags=("llm", "text", "divergence"),
)
def text_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the sources' unigram
    token distributions — the domain-shift diagnostic behind mixture
    reweighting ([[corpus_mixture_weighted_sample]]): a source whose
    distribution diverges from the others is a candidate for its own
    mixture weight (or for a closer look).

    Additive (+1) smoothing over the shared vocabulary keeps every
    probability strictly positive, so the JS terms are total functions
    and the divergence is symmetric and bounded by 1 bit.  Scale shape:
    ONE corpus pass builds the (source, token) counts; everything after
    — the zero-filled source×vocab grid, the pairwise term join, the
    per-pair sums — operates on vocabulary-sized relations (sources are
    a registry, vocab grows sub-linearly).  The per-pair sum is a
    float reduction whose cross-engine ordering differs, but JS terms
    are log-valued (never exact decimals), so rounding at 4dp sits
    ~1e10 ulps away from any boundary — unlike the exact-decimal sums
    that needed the integer-cents device ([[events_resample_ffill_1h]],
    PLANS.md's cross-scale sweep findings)."""
    d = load(spark, sf_dir, "documents")
    counts = (
        d.select("source", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()  # vocab-sized; feeds vocab, totals, and the grid
    )
    vocab = counts.select("tok").distinct()
    sources = counts.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    n_vocab = vocab.count()  # bounded scalar (vocabulary cardinality)
    grid = (
        sources.crossJoin(vocab)
        .join(counts, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            (
                (F.coalesce(F.col("c"), F.lit(0)) + _JS_ALPHA)
                / (F.col("n") + _JS_ALPHA * n_vocab)
            ).alias("p"),
        )
    )
    a = grid.select(
        F.col("source").alias("source_a"), "tok", F.col("p").alias("pa")
    )
    b = grid.select(
        F.col("source").alias("source_b"), "tok", F.col("p").alias("pb")
    )
    term = 0.5 * F.col("pa") * F.log2(2 * F.col("pa") / (F.col("pa") + F.col("pb"))) + (
        0.5 * F.col("pb") * F.log2(2 * F.col("pb") / (F.col("pa") + F.col("pb")))
    )
    return (
        a.join(b, "tok")
        .where(F.col("source_a") < F.col("source_b"))
        .select("source_a", "source_b", term.alias("term"))
        .groupBy("source_a", "source_b")
        .agg(
            F.round(F.sum("term"), 4).alias("js_divergence"),
            F.count(F.lit(1)).alias("n_vocab"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# BPE vocabulary TRAINING: learn the first K merges from the corpus.
# ---------------------------------------------------------------------------

BPE_TRAIN_MERGES = 5


def _bpe_train_oracle(k_iters: int) -> str:
    """Generate the unrolled K-iteration trainer as chained CTE stages —
    recursion-free SQL (recursive CTEs cannot aggregate per round), so
    DuckDB value-checks actual BPE TRAINING, not just one pair count."""
    sql = r"""
    WITH w0 AS (
      SELECT w AS word, COUNT(*) AS wcount,
             '  ' || REGEXP_REPLACE(w, '(.)', '\1  ', 'g') AS state
      FROM (SELECT UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '), x -> LENGTH(x) > 0)) AS w
            FROM documents)
      GROUP BY w
    )"""
    for k in range(k_iters):
        sql += f""",
    syms{k} AS (
      SELECT wcount,
             LIST_FILTER(STRING_SPLIT(state, '  '), t -> LENGTH(t) > 0) AS s
      FROM w{k}
    ),
    pc{k} AS (
      SELECT s[i] || ' ' || s[i + 1] AS pair, CAST(SUM(wcount) AS BIGINT) AS cnt
      FROM syms{k}, LATERAL (SELECT UNNEST(RANGE(1, GREATEST(LEN(s), 1))) AS i)
      GROUP BY 1
    ),
    best{k} AS (
      SELECT pair, cnt FROM pc{k} ORDER BY cnt DESC, pair LIMIT 1
    ),
    w{k + 1} AS (
      SELECT word, wcount,
             REPLACE(state,
                     ' ' || SPLIT_PART(b.pair, ' ', 1) || '  '
                         || SPLIT_PART(b.pair, ' ', 2) || ' ',
                     ' ' || REPLACE(b.pair, ' ', '') || ' ') AS state
      FROM w{k}, best{k} b
    )"""
    selects = "\n      UNION ALL ".join(
        f"SELECT {k + 1} AS merge_rank, SPLIT_PART(pair, ' ', 1) AS merge_left, "
        f"SPLIT_PART(pair, ' ', 2) AS merge_right, cnt AS pair_count FROM best{k}"
        for k in range(k_iters)
    )
    return sql + f"\n    SELECT * FROM ({selects})\n    ORDER BY merge_rank"


@register(
    "corpus_bpe_train_merges",
    oracle=_bpe_train_oracle(BPE_TRAIN_MERGES),
    tags=("llm", "text", "bpe", "train"),
)
def corpus_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary TRAINING — the actual merge-learning loop, not
    just its kernel: learn the first K merges (count adjacent symbol
    pairs → take the argmax → apply the merge → repeat), returning the
    ranked merge table (the artifact [[corpus_bpe_encode]] consumes;
    [[corpus_bpe_pair_counts]] is one un-applied round of this).

    The Sennrich word-count optimization makes training corpus-scale
    feasible: ONE corpus pass collapses the text to the (word, count)
    relation, and every round's pair counting, argmax, and merge
    application run on that vocabulary-sized relation — weighted by
    word counts, never re-touching documents.  Per round:

    - pair counts partial-aggregate map-side (symbol-pair keyspace);
    - the argmax lands at the driver as ONE row per round — the merge
      table IS the tokenizer artifact (K·bytes, the thing you ship),
      so materializing it is a bounds-probe-class collect, and it cuts
      the lineage that would otherwise pin every generation;
    - the merge applies via the boundary-safe double-space REPLACE
      device proven in [[corpus_bpe_encode]];
    - the word relation persists per round, and the SUPERSEDED
      generation unpersists as soon as its successor materializes —
      the trainer holds ≤2 cached generations for ANY K (pinned by
      tests/test_iterative_memory.py), where the r4 lazy-plan variant
      held all K.

    Training is within-word (original BPE), so merges never cross word
    boundaries; ties break to the lexicographically smallest pair in
    both engines.  The unrolled-CTE oracle value-checks all K learned
    (pair, count) rows — actual distributed tokenizer training under
    the same gate as every other query."""
    merges, _final = _bpe_train_states(spark, sf_dir, need_final=False)
    return merges.orderBy("merge_rank")


def _bpe_train_states(spark: SparkSession, sf_dir: str, need_final: bool = True):
    """Run the K-round trainer; return (merge table, final word states)
    — shared by corpus_bpe_train_merges (the merge table) and
    corpus_bpe_train_and_encode (corpus statistics under the learned
    vocabulary, ``need_final=True`` keeps the last generation cached
    for that consumer; ``need_final=False`` releases everything).

    Memory contract: at most TWO word-state generations are persisted
    at any instant — each round's argmax action materializes the
    current generation, after which its predecessor unpersists."""
    d = spread_small_scan(load(spark, sf_dir, "documents"))
    w = F.explode(F.filter(F.split("text", " "), lambda x: F.length(x) > 0)).alias("word")
    cur = (
        d.select(w)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
        .withColumn(
            "state",
            F.concat(F.lit("  "), F.regexp_replace(F.col("word"), "(.)", "$1  ")),
        )
        .persist()
    )
    prev = None
    merges: list[tuple[int, str, str, int]] = []
    for k in range(BPE_TRAIN_MERGES):
        s = F.filter(F.split("state", "  "), lambda t: F.length(t) > 0)
        pair_arr = F.when(
            F.size(s) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(s) - 1),
                lambda i: F.concat_ws(" ", F.element_at(s, i), F.element_at(s, i + 1)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        pc = (
            cur.select(F.explode(pair_arr).alias("pair"), "wcount")
            .groupBy("pair")
            .agg(F.sum("wcount").cast("bigint").alias("cnt"))
        )
        # argmax via global-sort LIMIT 1: TakeOrderedAndProject keeps a
        # 1-row heap per partition + a 1-row merge — no single-partition
        # WindowExec even on a huge pair keyspace.  The collect is the
        # round's action: it materializes `cur` into cache, so the
        # predecessor generation can be released RIGHT HERE.
        top = pc.orderBy(F.desc("cnt"), F.asc("pair")).limit(1).collect()
        if prev is not None:
            prev.unpersist()
        if not top:
            break  # pair space exhausted (degenerate corpus); oracle
            # rounds past exhaustion contribute zero rows too.
        pair, cnt = top[0]["pair"], int(top[0]["cnt"])
        left, _, right = pair.partition(" ")
        merges.append((k + 1, left, right, cnt))
        prev = cur
        cur = cur.select(
            "word",
            "wcount",
            F.replace(
                F.col("state"),
                F.lit(f" {left}  {right} "),
                F.lit(f" {left}{right} "),
            ).alias("state"),
        ).persist()
    merges_df = spark.createDataFrame(
        merges,
        "merge_rank int, merge_left string, merge_right string, pair_count bigint",
    )
    if need_final:
        cur.count()  # materialize the final generation, THEN release its
        # predecessor — the consumer reads the cache, not the lineage.
        if prev is not None:
            prev.unpersist()
    else:
        if prev is not None:
            prev.unpersist()
        cur.unpersist()
    return merges_df, cur


def _bpe_train_encode_oracle(k_iters: int) -> str:
    """Trainer CTE chain + a final corpus aggregate over w{K}: the
    statistics of the corpus re-tokenized under the K LEARNED merges."""
    train = _bpe_train_oracle(k_iters)
    # keep only the CTE chain (drop the trainer's SELECT tail)
    chain = train[: train.rindex("\n    SELECT * FROM (")]
    return (
        chain
        + f""",
    final AS (
      SELECT wcount,
             LIST_FILTER(STRING_SPLIT(state, '  '), t -> LENGTH(t) > 0) AS s,
             LENGTH(word) AS n_chars
      FROM w{k_iters}
    )
    SELECT {k_iters} AS n_merges, a.total_words, a.total_chars,
           a.total_tokens,
           ROUND(CAST(a.total_chars AS DOUBLE) / a.total_tokens, 4)
             AS chars_per_token,
           v.n_symbols
    FROM (SELECT CAST(SUM(wcount) AS BIGINT) AS total_words,
                 CAST(SUM(wcount * n_chars) AS BIGINT) AS total_chars,
                 CAST(SUM(wcount * LEN(s)) AS BIGINT) AS total_tokens
          FROM final) a,
         (SELECT CAST(COUNT(DISTINCT sym) AS BIGINT) AS n_symbols
          FROM final, UNNEST(s) AS u(sym)) v
    """
    )


@register(
    "corpus_bpe_train_and_encode",
    bench=True,
    oracle=_bpe_train_encode_oracle(BPE_TRAIN_MERGES),
    tags=("llm", "text", "bpe", "train"),
)
def corpus_bpe_train_and_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed tokenizer lifecycle in one query: TRAIN K merges on
    the corpus ([[corpus_bpe_train_merges]]'s loop), APPLY them, and
    report the corpus statistics a tokenizer evaluation tracks — total
    tokens under the learned vocabulary, compression (chars/token), and
    the resulting symbol-vocabulary size.  This is the number that
    tells you whether the next thousand merges are worth it.

    Everything runs on the word-count relation (one corpus pass, the
    Sennrich optimization), and the final statistics weight each word's
    token count by its corpus frequency, so the result is EXACTLY the
    corpus-wide tokenization the merge table would produce — certified
    by extending the trainer's unrolled-CTE oracle with the same final
    aggregate.

    Caveat the n_symbols column makes visible: UNNEST-per-word counts a
    symbol once per containing word, so the distinct-count relation is
    (words × avg-symbols) — vocabulary-sized, not corpus-sized, and the
    COUNT(DISTINCT) shuffles symbols once."""
    _merges, final = _bpe_train_states(spark, sf_dir)
    s = F.filter(F.split("state", "  "), lambda t: F.length(t) > 0)
    per_word = final.select(
        "wcount",
        F.length("word").alias("n_chars"),
        s.alias("s"),
    )
    sym = per_word.select(F.explode("s").alias("sym"))
    n_symbols = sym.agg(F.countDistinct("sym").cast("bigint").alias("n"))
    agg = per_word.agg(
        F.sum("wcount").cast("bigint").alias("total_words"),
        F.sum(F.col("wcount") * F.col("n_chars")).cast("bigint").alias("total_chars"),
        F.sum(F.col("wcount") * F.size("s")).cast("bigint").alias("total_tokens"),
    )
    return (
        agg.crossJoin(F.broadcast(n_symbols))
        .select(
            F.lit(BPE_TRAIN_MERGES).alias("n_merges"),
            "total_words",
            "total_chars",
            "total_tokens",
            F.round(
                F.col("total_chars").cast("double") / F.col("total_tokens"), 4
            ).alias("chars_per_token"),
            F.col("n").alias("n_symbols"),
        )
    )


NOVELTY_K = 3  # n-gram width for the novelty signal


@register(
    "text_ngram_novelty",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '),
                                 t -> LENGTH(t) > 0) AS toks
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id,
             ARRAY_TO_STRING(toks[i:(i + {NOVELTY_K} - 1)], ' ') AS gram
      FROM d, LATERAL (
        SELECT UNNEST(RANGE(1, GREATEST(LEN(toks) - {NOVELTY_K} + 2, 1))) AS i)
    ),
    firsts AS (
      SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY gram
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(*) FILTER (f.first_doc = g.doc_id) AS BIGINT)
             AS n_novel,
           ROUND(COUNT(*) FILTER (f.first_doc = g.doc_id) * 1.0
                 / COUNT(*), 4) AS novelty_ratio
    FROM grams g JOIN firsts f ON f.gram = g.gram
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """,
    tags=("llm", "text", "novelty"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY under the corpus's canonical order:
    the fraction of a document's distinct k-grams whose FIRST corpus
    occurrence is this document — the freshness/staleness signal a
    curriculum or crawl-recency policy ranks by, and the prefix form
    of incremental dedup ([[dedup_bloom_incremental]] asks "is this
    batch new vs the index"; novelty asks it per document against
    everything before it, in one batch pass).  A document full of
    grams first seen earlier is boilerplate-ish or near-duplicated
    even when no single pair crosses a dedup threshold.

    Scale shape: the gram stream is a narrow generate (per-doc
    DISTINCT inside the row's own explode keeps multiplicity out);
    first-occurrence is ONE map-side-combining MIN per gram key (the
    inverted-index shape); the flag join is equi on the gram key; the
    per-doc rollup shuffles doc keys once.  No window over the corpus,
    no ordering dependence beyond the stable doc_id axis."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: F.length(t) > 0)
    # Docs shorter than K tokens have NO complete k-grams and emit no
    # rows — the same semantic as the oracle's RANGE upper bound (which
    # collapses to an empty range for n < K).  Filtering BEFORE the
    # sequence also keeps sequence() ascending: sequence(1, n-K+1) with
    # n-K+1 < 1 would yield a descending array and phantom grams.
    base = d.select("doc_id", toks.alias("toks"), F.size(toks).alias("n")).filter(
        F.col("n") >= NOVELTY_K
    )
    n_grams = F.col("n") - NOVELTY_K + 1
    grams = (
        base.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), n_grams),
                        lambda i: F.concat_ws(
                            " ", F.slice(F.col("toks"), i, NOVELTY_K)
                        ),
                    )
                )
            ).alias("gram"),
        )
    )
    firsts = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    novel = F.col("first_doc") == F.col("doc_id")
    return (
        grams.join(firsts, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(novel, 1).otherwise(0)).cast("bigint").alias("n_novel"),
            F.round(
                F.sum(F.when(novel, 1).otherwise(0)) / F.count(F.lit(1)), 4
            ).alias("novelty_ratio"),
        )
        .orderBy("doc_id")
    )


SPAN_MASK_MOD = 13  # a span starts where the position hash hits 0 (≈1/13)
SPAN_MASK_LEN = 3  # tokens per corrupted span
_SPAN_HASH_A = 2654435761  # Weyl/Knuth multiplicative constants — exact
_SPAN_HASH_B = 40503  # in BIGINT for both engines
_SPAN_HASH_M = 2147483647


@register(
    "corpus_span_corruption_plan",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                             t -> LENGTH(t) > 0)) AS n_tokens
      FROM documents
    ),
    pos AS (
      SELECT doc_id, n_tokens, UNNEST(RANGE(0, n_tokens)) AS i
      FROM d
    ),
    flags AS (
      SELECT doc_id, n_tokens, i,
             CASE WHEN (doc_id * {_SPAN_HASH_A} + i * {_SPAN_HASH_B})
                       % {_SPAN_HASH_M} % {SPAN_MASK_MOD} = 0
                  THEN 1 ELSE 0 END AS is_start,
             CASE WHEN EXISTS (
               SELECT 1 FROM RANGE({SPAN_MASK_LEN}) r(k)
               WHERE i - k >= 0
                 AND (doc_id * {_SPAN_HASH_A} + (i - k) * {_SPAN_HASH_B})
                     % {_SPAN_HASH_M} % {SPAN_MASK_MOD} = 0
             ) THEN 1 ELSE 0 END AS is_masked
      FROM pos
    )
    SELECT doc_id,
           CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(is_start) AS BIGINT) AS n_spans,
           CAST(SUM(is_masked) AS BIGINT) AS n_masked,
           ROUND(SUM(is_masked) * 1.0 / MAX(n_tokens), 4) AS mask_ratio
    FROM flags
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("llm", "text", "objective"),
)
def corpus_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption PLANNING: deterministically choose
    corruption spans per document (a position is a span start when its
    (doc_id, position) Weyl hash lands on 0 mod SPAN_MASK_MOD; each
    start masks SPAN_MASK_LEN tokens, overlaps unioned) and report the
    span count, masked-token count, and realized mask ratio — the
    artifact a pretraining objective builder materializes BEFORE
    tokenizing, so the plan is reproducible across reshards and
    re-runs (no RNG state: the mask is a pure function of content
    position, the same seeding discipline corpus_train_val_test_split
    and corpus_global_shuffle_shards use).

    Scale shape: one narrow pass — positions explode per doc and every
    flag is integer hash arithmetic (JVM-side, exact in BIGINT for
    both engines); the rollup is one map-side-combining groupBy on
    doc_id.  The union-of-spans membership check is O(SPAN_MASK_LEN)
    hash evaluations per position, not a window or self-join."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: F.length(t) > 0)
    # Zero-token docs (a designed output of dedup_boilerplate_removal)
    # have no positions to corrupt and emit no row — the oracle's
    # RANGE(0, 0) semantic.  The filter must come BEFORE the explode:
    # sequence(0, -1) yields a DESCENDING [0, -1] array (phantom
    # positions) and max(n_tokens)=0 would divide by zero under ANSI.
    base = d.select("doc_id", F.size(toks).alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    pos = base.select(
        "doc_id",
        "n_tokens",
        F.explode(F.sequence(F.lit(0), F.col("n_tokens") - 1)).alias("i"),
    )

    def h(i_col):
        return (
            F.col("doc_id") * _SPAN_HASH_A + i_col * _SPAN_HASH_B
        ) % _SPAN_HASH_M % SPAN_MASK_MOD

    is_start = F.when(h(F.col("i")) == 0, 1).otherwise(0)
    masked = F.greatest(
        *[
            F.when((F.col("i") - k >= 0) & (h(F.col("i") - k) == 0), 1).otherwise(0)
            for k in range(SPAN_MASK_LEN)
        ]
    )
    flags = pos.select("doc_id", "n_tokens", is_start.alias("is_start"), masked.alias("is_masked"))
    return (
        flags.groupBy("doc_id")
        .agg(
            F.max("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("is_start").cast("bigint").alias("n_spans"),
            F.sum("is_masked").cast("bigint").alias("n_masked"),
            F.round(F.sum("is_masked") * 1.0 / F.max("n_tokens"), 4).alias("mask_ratio"),
        )
        .orderBy("doc_id")
    )


@register(
    "corpus_bpe_fertility_by_lang",
    oracle="""
    WITH enc AS ({ENC}),
    d AS (SELECT doc_id, lang FROM documents)
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(e.n_words) AS BIGINT) AS n_words,
           CAST(SUM(e.n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(e.n_tokens) AS BIGINT) AS n_tokens,
           ROUND(SUM(e.n_tokens) * 1.0 / NULLIF(SUM(e.n_words), 0), 4)
             AS fertility,
           ROUND(SUM(e.n_chars) * 1.0 / NULLIF(SUM(e.n_tokens), 0), 4)
             AS chars_per_token
    FROM enc e JOIN d ON d.doc_id = e.doc_id
    GROUP BY d.lang
    ORDER BY d.lang
    """,
    tags=("llm", "corpus", "bpe", "eval"),
)
def corpus_bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY evaluation per language: tokens-per-word and
    chars-per-token under the fixed BPE merge table, aggregated by
    document language — the standard multilingual-tokenizer health
    metric (a language with fertility far above the corpus mean is
    being shredded into bytes, inflating its effective sequence length
    and training cost; the signal that drives merge-table rebalancing
    or per-language sampling weights).  Composes the certified
    [[corpus_bpe_encode]] per-document counts (the oracle embeds that
    key's oracle SQL, so the eval cannot drift from the encoder) with
    the documents dimension.

    Scale shape: inherits the encoder's narrow per-doc pass; the join
    keys doc_id against a projection of the same table (self-join on
    the storage key — co-partitioned at write time in a real lake);
    the rollup is one map-side-combining groupBy on the bounded
    language key.  NULLIF/try_divide guards the degenerate
    all-empty-docs language instead of crashing the whole report."""
    enc = corpus_bpe_encode(spark, sf_dir)
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        enc.join(d, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(
                F.try_divide(F.sum("n_tokens") * 1.0, F.sum("n_words")), 4
            ).alias("fertility"),
            F.round(
                F.try_divide(F.sum("n_chars") * 1.0, F.sum("n_tokens")), 4
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


def _bind_fertility_oracle() -> None:
    from mysql_postgres_debezium_cdc_spark.registry import _REGISTRY

    spec = _REGISTRY["corpus_bpe_fertility_by_lang"]
    object.__setattr__(
        spec,
        "oracle",
        spec.oracle.replace("{ENC}", _REGISTRY["corpus_bpe_encode"].oracle),
    )


_bind_fertility_oracle()


# Classic UTF-8-decoded-as-Latin-1 marker sequences (the ftfy repair
# targets): 'Ã'/'Â' lead bytes, 'â€' punctuation family, 'ï¿' (U+FFFD
# mis-decoded).  Counted as substring occurrences via the length-diff
# device so both engines count identically with no regex dialect risk.
_MOJIBAKE_MARKERS = ("Ã", "Â", "â€", "ï¿")
_CTRL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"


@register(
    "text_encoding_quality",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, text,
             LEN(text) - LEN(REPLACE(text, chr(65533), '')) AS n_repl,
             {" + ".join(
                 f"(LEN(text) - LEN(REPLACE(text, '{m}', ''))) // {len(m)}"
                 for m in _MOJIBAKE_MARKERS
             )} AS n_moji,
             LEN(text) - LEN(REGEXP_REPLACE(text, '{_CTRL_RE}', '', 'g'))
               AS n_ctrl
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_repl + n_moji + n_ctrl > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_suspect,
           CAST(SUM(n_repl) AS BIGINT) AS n_replacement_chars,
           CAST(SUM(n_moji) AS BIGINT) AS n_mojibake_markers,
           CAST(SUM(n_ctrl) AS BIGINT) AS n_control_chars
    FROM d
    GROUP BY source
    ORDER BY source
    """,
    tags=("llm", "text", "quality", "encoding"),
)
def text_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODING-QUALITY audit per source: counts of U+FFFD replacement
    characters, classic UTF-8-as-Latin-1 mojibake marker sequences
    ('Ã'/'Â' lead bytes, 'â€' punctuation, 'ï¿'), and raw C0 control
    characters — the ftfy-style triage every web-scraped corpus runs
    before filtering, rolled up to the source level so a broken
    upstream decoder shows as one hot row.  (The clean synthetic
    fixture scores all-zero by construction; the injected-corruption
    fixture test in tests/test_short_doc_edges.py gives the counters
    teeth — each marker class detected, clean docs untouched.)

    Scale shape: one narrow scan — every counter is string arithmetic
    (substring length-diff, one anchored regex) inside whole-stage
    codegen, and the rollup is a map-side-combining groupBy on the
    bounded source key.  Marker counting uses the length-diff device
    instead of regex alternation so Spark's Java regex and DuckDB's
    RE2 cannot disagree on a dialect corner."""
    d = load(spark, sf_dir, "documents")

    def count_marker(m: str):
        return (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit(m))))
            / len(m)
        ).cast("bigint")

    n_moji = None
    for m in _MOJIBAKE_MARKERS:
        n_moji = count_marker(m) if n_moji is None else n_moji + count_marker(m)
    n_repl = F.length("text") - F.length(
        F.replace(F.col("text"), F.lit("�"))
    )
    n_ctrl = F.length("text") - F.length(
        F.regexp_replace("text", _CTRL_RE, "")
    )
    per_doc = d.select(
        "source",
        n_repl.cast("bigint").alias("n_repl"),
        n_moji.alias("n_moji"),
        n_ctrl.cast("bigint").alias("n_ctrl"),
    )
    suspect = F.when(
        F.col("n_repl") + F.col("n_moji") + F.col("n_ctrl") > 0, 1
    ).otherwise(0)
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(suspect).cast("bigint").alias("n_suspect"),
            F.sum("n_repl").cast("bigint").alias("n_replacement_chars"),
            F.sum("n_moji").cast("bigint").alias("n_mojibake_markers"),
            F.sum("n_ctrl").cast("bigint").alias("n_control_chars"),
        )
        .orderBy("source")
    )


@register(
    "text_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, '')) AS ch FROM documents
    ),
    counts AS (
      SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
      FROM chars GROUP BY doc_id, ch
    ),
    tot AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_unique_chars
      FROM counts GROUP BY doc_id
    )
    SELECT t.doc_id, t.n AS n_chars, t.n_unique_chars,
           ROUND(-SUM((c.c * 1.0 / t.n) * LOG2(c.c * 1.0 / t.n)), 4)
             AS char_entropy
    FROM counts c JOIN tot t ON t.doc_id = c.doc_id
    GROUP BY t.doc_id, t.n, t.n_unique_chars
    ORDER BY t.doc_id
    """,
    tags=("llm", "text", "quality"),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy — the cheap
    garbage/repetition signal the big corpus filters (CCNet, Gopher)
    cut on: natural prose sits around 4-4.5 bits/char, while
    binary-as-text, padding runs, and keyboard mash fall far outside
    the band in either direction.  Complements the token-level
    [[text_repetition_ratio]] and [[text_gopher_quality_flags]]:
    entropy sees sub-token junk those miss.

    Scale shape: ONE explode pass (narrow — no shuffle until the
    (doc, char) groupBy, which map-side-combines to at most
    |alphabet| rows per doc per partition), then doc-sized relations
    throughout.  The alphabet bound (~100 for ASCII corpora) means the
    per-doc state is constant-sized — this is the textbook case where
    the exploded groupBy beats carrying a per-doc map in memory.

    Float parity: counts and totals are exact BIGINTs; entropy terms
    are log-valued (never exact decimals), so the 4dp round sits far
    from any boundary — the [[text_source_divergence]] contract."""
    d = load(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id",
        F.explode(F.filter(F.split(F.col("text"), ""), lambda c: F.length(c) > 0)).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = counts.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_unique_chars"),
    )
    p = F.col("c") * 1.0 / F.col("n")
    return (
        counts.join(tot, "doc_id")
        .groupBy("doc_id", "n", "n_unique_chars")
        .agg(F.round(-F.sum(p * F.log2(p)), 4).alias("char_entropy"))
        .select(
            "doc_id",
            F.col("n").alias("n_chars"),
            "n_unique_chars",
            "char_entropy",
        )
        .orderBy("doc_id")
    )


# Literal substring patterns spanning three orders of selectivity at
# sf0.1 (270 / 298 / 11 / 8 matching docs) — the probe set for the
# trigram-index search below.
TRIGRAM_PATTERNS = (
    "merge batch",
    "window stream",
    "query big query",
    "sort table window",
)


def _pattern_values_sql() -> str:
    return ", ".join(f"('{p}')" for p in TRIGRAM_PATTERNS)


def _trigram_index_relation(d: DataFrame) -> DataFrame:
    """The trigram inverted index: one (doc_id, tg) row per DISTINCT
    character trigram per document — the expensive corpus pass (explode
    of |text| trigrams per doc) that a serving deployment pays once per
    corpus version and [[text_trigram_persisted_index]] persists."""
    n = F.length("text")
    return d.where(n >= 3).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, length(text) - 2),"
                    " i -> substring(text, i, 3))"
                )
            )
        ).alias("tg"),
    )


_TRIGRAM_ORACLE = f"""
    WITH pats(pattern) AS (VALUES {_pattern_values_sql()})
    SELECT p.pattern, d.doc_id,
           CAST(COUNT(*) OVER (PARTITION BY p.pattern) AS BIGINT)
             AS n_matching_docs
    FROM pats p JOIN documents d ON CONTAINS(d.text, p.pattern)
    ORDER BY pattern, doc_id
    """


@register(
    "text_trigram_substring_search",
    # The ORACLE is the textbook definition — a full-scan CONTAINS over
    # every (pattern, document) pair.  The ENGINE answers from a trigram
    # inverted index instead; the value hash proves index+verify equals
    # the definition.
    oracle=_TRIGRAM_ORACLE,
    tags=("llm", "text", "search", "index"),
)
def text_trigram_substring_search(
    spark: SparkSession, sf_dir: str, index_df: DataFrame | None = None
) -> DataFrame:
    """Substring search (`LIKE '%pattern%'`) answered from a TRIGRAM
    inverted index — the pg_trgm / code-search-index technique: a doc
    can contain the pattern only if it contains every one of the
    pattern's character trigrams, so the index join prunes the corpus
    to a candidate set and the expensive contains() verify touches
    candidates only.  At 100 TB a raw substring scan reads everything
    for every query; the trigram index is built once (this plan's
    distinct-explode stage — in production it persists, the
    [[rag_rrf_persisted_index]] pattern) and each query's cost is its
    posting-list intersection, sized by the RAREST trigram's postings.

    Scale shape: the index build is one narrow explode + distinct
    (map-side combined); pattern trigrams BROADCAST (patterns are a
    fixed query batch); the candidate intersection is a count-equality
    groupBy on (pattern, doc) — no corpus-sized shuffle carries text;
    only verified candidates rejoin the document table (doc_id
    equi-join) for the contains() check.

    The four registered patterns span 270 → 8 matching docs at sf0.1,
    so the value check certifies both the dense and the sparse end;
    false candidates (trigrams present, substring absent — possible
    because the index is a SET of trigrams with no positions) are
    killed by the verify, which the DuckDB full-scan oracle proves.

    ``index_df`` substitutes a PERSISTED (doc_id, tg) index relation
    for the inline build (see [[text_trigram_persisted_index]])."""
    d = load(spark, sf_dir, "documents")
    index = index_df if index_df is not None else _trigram_index_relation(d)
    pat_rows = []
    for p in TRIGRAM_PATTERNS:
        grams = sorted({p[i : i + 3] for i in range(len(p) - 2)})
        pat_rows.append((p, grams, len(grams)))
    pats = spark.createDataFrame(
        pat_rows, "pattern string, grams array<string>, n_grams int"
    )
    ptg = pats.select("pattern", "n_grams", F.explode("grams").alias("tg"))
    candidates = (
        index.join(F.broadcast(ptg), "tg")
        .groupBy("pattern", "doc_id", "n_grams")
        .agg(F.count(F.lit(1)).alias("n_present"))
        .where(F.col("n_present") == F.col("n_grams"))
        .select("pattern", "doc_id")
    )
    verified = (
        candidates.join(d.select("doc_id", "text"), "doc_id")
        .where(F.expr("contains(text, pattern)"))
        .select("pattern", "doc_id")
    )
    w = Window.partitionBy("pattern")
    return (
        verified.withColumn(
            "n_matching_docs", F.count(F.lit(1)).over(w).cast("bigint")
        )
        .orderBy("pattern", "doc_id")
    )


@register(
    "text_trigram_persisted_index",
    oracle=_TRIGRAM_ORACLE,
    tags=("llm", "text", "search", "index"),
    bench=True,  # headline: warm serving path over the persisted index
)
def text_trigram_persisted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring search over a PERSISTED trigram index — the serving
    tier for [[text_trigram_substring_search]]: the r6 10× probe showed
    that key's cost (31.9 s) IS the index build (the per-character
    trigram explode over the whole corpus), which a deployment pays
    once per corpus version, not per query batch.  The (doc_id, tg)
    index is written via materialize_once (staged write + atomic
    rename, keyed by fixture fingerprint — the
    [[rag_rrf_persisted_index]] device) and every subsequent query
    batch reads the index parquet; warm-path corpus work is the
    posting-list intersection of the QUERY's trigrams plus one
    broadcast-pruned (doc_id, text) scan for the contains() verify.

    Bit-identical to the inline key by construction: the index rows
    are exact (bigint, 3-char string) pairs that round-trip parquet
    unchanged, and the downstream intersection/verify is the same
    expression tree — the same oracle TEXT certifies both paths.  The
    plan audit (tests/test_plans.py) pins that the warm plan scans the
    index location and never re-runs the trigram explode."""
    from mysql_postgres_debezium_cdc_spark.scratch import materialize_once

    index_path = materialize_once(
        sf_dir,
        "trigram_index",
        lambda p: _trigram_index_relation(load(spark, sf_dir, "documents"))
        .write.mode("overwrite")
        .parquet(p),
    )
    return text_trigram_substring_search(
        spark, sf_dir, index_df=spark.read.parquet(index_path)
    )


_FUNNEL_ORACLE = f"""
    WITH g AS (
      SELECT doc_id, text,
             (text IS NOT NULL AND LENGTH(text) > 0) AS valid,
             CASE WHEN text IS NOT NULL AND LENGTH(text) > 0 THEN
               LEN(STRING_SPLIT(text, ' ')) END AS n_words,
             CASE WHEN text IS NOT NULL AND LENGTH(text) > 0 THEN
               LIST_REDUCE(LIST_PREPEND(0,
                 [LENGTH(t) FOR t IN STRING_SPLIT(text, ' ')]),
                 (a, b) -> a + b) * 1.0 / LEN(STRING_SPLIT(text, ' '))
             END AS mwl,
             CASE WHEN text IS NOT NULL AND LENGTH(text) > 0 THEN
               LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) * 1.0
                 / LEN(STRING_SPLIT(text, ' ')) END AS dr,
             CASE WHEN text IS NOT NULL AND LENGTH(text) > 0 THEN
               LEN(LIST_INTERSECT(LIST_DISTINCT(STRING_SPLIT(text, ' ')),
                                  [{_GOPHER_STOP_SQL}])) END AS n_stop,
             CASE WHEN text IS NOT NULL AND LENGTH(text) > 0 THEN
               {_lang_score_sql("en")} END AS s_en,
             CASE WHEN text IS NOT NULL AND LENGTH(text) > 0 THEN
               {_lang_score_sql("es")} END AS s_es,
             CASE WHEN text IS NOT NULL AND LENGTH(text) > 0 THEN
               {_lang_score_sql("fr")} END AS s_fr,
             CASE WHEN text IS NOT NULL AND LENGTH(text) > 0 THEN
               {_lang_score_sql("de")} END AS s_de,
             CASE WHEN text IS NOT NULL AND LENGTH(text) > 0 THEN
               {_lang_score_sql("zh")} END AS s_zh
      FROM documents
    ),
    f AS (
      SELECT doc_id, text, valid,
             valid AND n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
               AND mwl BETWEEN {GOPHER_MIN_MWL} AND {GOPHER_MAX_MWL}
               AND n_stop >= {GOPHER_MIN_STOPWORDS}
               AND dr >= {GOPHER_MIN_DISTINCT_RATIO} AS gopher,
             GREATEST(s_en, s_es, s_fr, s_de, s_zh) > 0
               AND s_en = GREATEST(s_en, s_es, s_fr, s_de, s_zh) AS is_en
      FROM g
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n0,
             CAST(COALESCE(SUM(CASE WHEN valid THEN 1 END), 0) AS BIGINT)
               AS n1,
             CAST(COALESCE(SUM(CASE WHEN valid AND gopher THEN 1 END), 0)
               AS BIGINT) AS n2,
             CAST(COALESCE(SUM(CASE WHEN valid AND gopher AND is_en THEN 1 END),
               0) AS BIGINT) AS n3,
             CAST((SELECT COUNT(DISTINCT text) FROM f
                   WHERE valid AND gopher AND is_en) AS BIGINT) AS n4
      FROM f
    )
    SELECT s.stage_no, s.stage, s.n_in, s.n_out,
           CASE WHEN s.n_in > 0
                THEN CAST(s.n_out * 1000000 // s.n_in AS BIGINT) END
             AS retained_ppm
    FROM (
      SELECT 1 AS stage_no, 'valid_text' AS stage, n0 AS n_in, n1 AS n_out
      FROM agg
      UNION ALL SELECT 2, 'gopher_rules', n1, n2 FROM agg
      UNION ALL SELECT 3, 'lang_en', n2, n3 FROM agg
      UNION ALL SELECT 4, 'exact_dedup', n3, n4 FROM agg
    ) s
    ORDER BY stage_no
    """


@register(
    "corpus_quality_prefilter_funnel",
    oracle=_FUNNEL_ORACLE,
    tags=("llm", "pipeline", "quality", "funnel"),
)
def corpus_quality_prefilter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation-funnel accounting report every corpus pipeline ships
    with its dataset card: how many documents survive each ordered
    prefilter stage — validity → the Gopher rule battery
    ([[text_gopher_quality_flags]]'s four-rule conjunction, same
    constants) → language ID == 'en' ([[text_lang_id]]'s argmax rule,
    same tie order) → exact dedup (distinct surviving texts) — with
    per-stage retention in EXACT integer ppm.  Funnel accounting is
    what makes a 99.7%-drop stage visible before a training run does.

    All stage predicates evaluate in ONE narrow pass (per-row JVM
    higher-order folds, no explode); the counts are one conditional
    aggregate, plus one distinct-text aggregate over stage-3 survivors
    (the only shuffle, survivor-sized).  The 4-row report assembles
    from the 1-row count relation — a driver-free pivot via explode of
    a literal stage array (scalar output columns only).

    NULL text is stage-1 fallout by definition — identical on both
    sides; every ratio is integer floor division (NULL when a stage
    sees zero input)."""
    d = load(spark, sf_dir, "documents")
    valid = F.col("text").isNotNull() & (F.length("text") > 0)
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks).cast("bigint")
    mwl = (
        F.aggregate(toks, F.lit(0), lambda a, b: a + F.length(b))
        * F.lit(1.0)
        / F.size(toks)
    )
    dr = F.size(F.array_distinct(toks)) * F.lit(1.0) / F.size(toks)
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
        )
    ).cast("bigint")

    def lang_score(ws):
        arr = F.array(*[F.lit(w) for w in ws])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast(
            "bigint"
        )

    scores = {lang: F.when(valid, lang_score(ws)) for lang, ws in LANG_PROFILES.items()}
    best = F.greatest(*scores.values())
    gopher = (
        valid
        & F.when(valid, n_words).between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & F.when(valid, mwl).between(GOPHER_MIN_MWL, GOPHER_MAX_MWL)
        & (F.when(valid, n_stop) >= GOPHER_MIN_STOPWORDS)
        & (F.when(valid, dr) >= GOPHER_MIN_DISTINCT_RATIO)
    )
    is_en = (best > 0) & (scores["en"] == best)
    f = d.select(
        "text",
        valid.alias("valid"),
        gopher.alias("gopher"),
        is_en.alias("is_en"),
    )
    survivors = f.where(F.col("valid") & F.col("gopher") & F.col("is_en"))
    agg = f.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.coalesce(F.sum(F.when(F.col("valid"), 1)), F.lit(0))
        .cast("bigint")
        .alias("n1"),
        F.coalesce(F.sum(F.when(F.col("valid") & F.col("gopher"), 1)), F.lit(0))
        .cast("bigint")
        .alias("n2"),
        F.coalesce(
            F.sum(F.when(F.col("valid") & F.col("gopher") & F.col("is_en"), 1)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n3"),
    ).crossJoin(
        F.broadcast(
            survivors.agg(
                F.count_distinct(F.col("text")).cast("bigint").alias("n4")
            )
        )
    )
    stages = agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("stage_no"),
                    F.lit("valid_text").alias("stage"),
                    F.col("n0").alias("n_in"),
                    F.col("n1").alias("n_out"),
                ),
                F.struct(
                    F.lit(2).alias("stage_no"),
                    F.lit("gopher_rules").alias("stage"),
                    F.col("n1").alias("n_in"),
                    F.col("n2").alias("n_out"),
                ),
                F.struct(
                    F.lit(3).alias("stage_no"),
                    F.lit("lang_en").alias("stage"),
                    F.col("n2").alias("n_in"),
                    F.col("n3").alias("n_out"),
                ),
                F.struct(
                    F.lit(4).alias("stage_no"),
                    F.lit("exact_dedup").alias("stage"),
                    F.col("n3").alias("n_in"),
                    F.col("n4").alias("n_out"),
                ),
            )
        ).alias("s")
    ).select("s.*")
    return stages.select(
        "stage_no",
        "stage",
        "n_in",
        "n_out",
        F.when(F.col("n_in") > 0, F.expr("(n_out * 1000000) div n_in"))
        .cast("bigint")
        .alias("retained_ppm"),
    ).orderBy("stage_no")
