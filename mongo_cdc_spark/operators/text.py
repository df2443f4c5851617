"""Text analysis operators (SURVEY.md §2.3): tokenization, quality
scoring, language-ID heuristic, document fingerprinting, term stats.

All hot-path logic is built-in Spark SQL functions (split/explode/
higher-order array ops/md5) — JVM-side, codegen'd, no Python. These run
on the `documents` fixture table; at 100 TB the same plans hold: the
only shuffles are the final small aggregations (per-lang/per-source
keys), and explode-based term stats do map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mongo_cdc_spark.io import load_table
from mongo_cdc_spark.operators import make_registry
from mongo_cdc_spark.operators._twophase import with_global_order

QUERIES, ORACLE, query = make_registry()

# Tokenizer shared by every query (and mirrored in each oracle):
# whitespace split of the raw text. The fixture corpus is bag-of-words
# single-space text, so this is exact; the BPE-ish pre-tokenizer below
# (`bpe_ish_tokens`) is the subword-aware variant.
def _tokens():
    return F.split(F.col("text"), r"\s+")


# GPT-2-style pre-tokenizer approximation: letter runs, digit runs, and
# punctuation runs become separate tokens (the split BPE merges operate
# within). Same RE dialect subset in Spark (Java regex) and DuckDB (RE2).
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_ish_tokens(col) -> "F.Column":
    """BPE-ish pre-tokenization of a string column (JVM-side regex —
    no Python in the hot path)."""
    return F.regexp_extract_all(col, F.lit(BPE_PATTERN), 0)

_STOPWORDS = ("the", "a", "of", "and")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@query("text_token_stats", sql="""
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(len(regexp_split_to_array(text, '\\s+'))), 4) AS avg_tokens,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           CAST(MAX(len(regexp_split_to_array(text, '\\s+'))) AS INT) AS max_tokens
    FROM documents
    GROUP BY lang
    ORDER BY lang
""")
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per language facet.

    The token array is materialized as its own projection before any
    consumer reads it (HOF-CSE discipline, see text_shingle_fingerprint)."""
    return (
        _docs(spark, sf_dir)
        .select("lang", _tokens().alias("w"), "n_chars")
        .select("lang", F.size("w").alias("n_tok"), "n_chars")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
             F.round(F.avg("n_chars"), 4).alias("avg_chars"),
             F.max("n_tok").alias("max_tokens"))
        .orderBy("lang")
    )


@query("text_quality_scores", sql="""
    WITH scored AS (
      SELECT source,
             len(regexp_split_to_array(text, '\\s+')) AS n_tok,
             len(list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x IN ('the', 'a', 'of', 'and'))) AS n_stop
      FROM documents
    )
    SELECT source,
           ROUND(AVG(n_stop * 1.0 / n_tok), 4) AS avg_stop_ratio,
           ROUND(AVG(0.6 * (n_stop * 1.0 / n_tok)
                     + 0.4 * LEAST(n_tok / 100.0, 1.0)), 4) AS avg_quality,
           COUNT(*) AS n_docs
    FROM scored
    GROUP BY source
    ORDER BY source
""")
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio + length saturation, averaged per
    source — the standard cheap pre-filter in LLM data pipelines.

    The token array (and then the two counts derived from it) are
    materialized as their own projections before the ratio/quality
    arithmetic reads them: codegen subexpression elimination does not
    reach inside higher-order-function lambdas, so the previous inlined
    form re-split the whole document several times per row (measured
    0.63 s -> 2.39 s regression at sf0.1; same bug class fixed 33x in
    dedup, see text_shingle_fingerprint)."""
    n_tok = F.col("n_tok")
    stop_ratio = F.col("n_stop") * F.lit(1.0) / n_tok
    quality = 0.6 * stop_ratio + 0.4 * F.least(n_tok / F.lit(100.0), F.lit(1.0))
    return (
        _docs(spark, sf_dir)
        .select("source", _tokens().alias("w"))
        .select("source", F.size("w").alias("n_tok"),
                F.size(F.filter("w", lambda t: t.isin(*_STOPWORDS)))
                .alias("n_stop"))
        .select("source", stop_ratio.alias("ratio"), quality.alias("q"))
        .groupBy("source")
        .agg(F.round(F.avg("ratio"), 4).alias("avg_stop_ratio"),
             F.round(F.avg("q"), 4).alias("avg_quality"),
             F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source")
    )


# Per-language marker lists for the n-gram/stopword language-ID heuristic.
# On the synthetic corpus (shared vocab across langs) most docs score as
# 'en' — the point is the *operator* (deterministic scored classification),
# evaluated against the labeled `lang` column.
_LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
    "zh": ("的", "是", "了", "在", "我"),
}


def _markers_sql(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])


@query("text_langid_confusion", sql=f"""
    WITH scored AS (
      SELECT lang,
             len(list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x IN ({_markers_sql('en')}))) AS s_en,
             len(list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x IN ({_markers_sql('de')}))) AS s_de,
             len(list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x IN ({_markers_sql('es')}))) AS s_es,
             len(list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x IN ({_markers_sql('fr')}))) AS s_fr,
             len(list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x IN ({_markers_sql('zh')}))) AS s_zh
      FROM documents
    ), pred AS (
      SELECT lang,
             CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr
                       AND s_en >= s_zh THEN 'en'
                  WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                  WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                  WHEN s_fr >= s_zh THEN 'fr'
                  ELSE 'zh' END AS pred_lang
      FROM scored
    )
    SELECT lang, pred_lang, COUNT(*) AS n
    FROM pred GROUP BY lang, pred_lang ORDER BY lang, pred_lang
""")
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (marker-word scoring, fixed-precedence
    argmax) → confusion matrix against the labeled lang column.

    The token array and the five marker scores are materialized as
    their own projections before the argmax CASE reads them: each score
    column is referenced 4-5 times in the CASE, and an inlined
    split+filter would re-run per reference (HOF-CSE bug class, see
    text_quality_scores)."""

    def _score(markers):
        # one-arg lambda required: a 2-arg lambda means (element, index)
        return F.size(F.filter("w", lambda t: t.isin(*markers)))

    score_cols = [_score(m).alias(f"s_{lang}")
                  for lang, m in _LANG_MARKERS.items()]
    scores = {lang: F.col(f"s_{lang}") for lang in _LANG_MARKERS}
    pred = (
        F.when((scores["en"] >= scores["de"]) & (scores["en"] >= scores["es"])
               & (scores["en"] >= scores["fr"]) & (scores["en"] >= scores["zh"]),
               "en")
        .when((scores["de"] >= scores["es"]) & (scores["de"] >= scores["fr"])
              & (scores["de"] >= scores["zh"]), "de")
        .when((scores["es"] >= scores["fr"]) & (scores["es"] >= scores["zh"]),
              "es")
        .when(scores["fr"] >= scores["zh"], "fr")
        .otherwise("zh")
    )
    return (
        _docs(spark, sf_dir)
        .select("lang", _tokens().alias("w"))
        .select("lang", *score_cols)
        .select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred_lang")
    )


@query("text_fingerprint_md5", sql="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT md5(lower(text))) AS BIGINT) AS n_fingerprints
    FROM documents
    GROUP BY source
    ORDER BY source
""")
def text_fingerprint_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document fingerprinting (normalize → md5); fingerprint
    cardinality per source = exact-dup detection at scale (the digest is
    what you shuffle, never the text)."""
    return (
        _docs(spark, sf_dir)
        .select("source", F.md5(F.lower("text").cast("binary")).alias("fp"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.countDistinct("fp").alias("n_fingerprints"))
        .orderBy("source")
    )


@query("text_shingle_fingerprint", sql="""
    WITH toks AS (
      SELECT doc_id, lang, regexp_split_to_array(text, '\\s+') AS w
      FROM documents
    ), sh AS (
      SELECT doc_id, lang,
             MIN(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS fp
      FROM (SELECT *, unnest(generate_series(1, len(w) - 2)) AS i
            FROM toks)
      GROUP BY doc_id, lang
    )
    SELECT lang, CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_distinct_fp,
           COUNT(*) AS n_docs
    FROM sh GROUP BY lang ORDER BY lang
""")
def text_shingle_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3-gram fingerprint: min-hash-of-shingles per document
    (the winnowing building block; full MinHash-LSH is in dedup.py).

    The token array is materialized as a column BEFORE the shingle
    lambda reads it: codegen CSE does not reach inside HOF lambdas, so
    an inlined split() expression would re-split the whole document 3×
    per shingle (see dedup._shingles_of_hashes for measurements)."""
    shingles = F.transform(
        F.sequence(F.lit(0), F.size("w") - 3),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("w"), i + 1),
            F.element_at(F.col("w"), i + 2),
            F.element_at(F.col("w"), i + 3)),
    )
    fp = F.array_min(F.transform(shingles, lambda s: F.md5(s.cast("binary"))))
    return (
        _docs(spark, sf_dir)
        .filter(F.size(_tokens()) >= 3)  # oracle's WHERE i <= len(w)-2 twin
        .select("lang", _tokens().alias("w"))
        .select("lang", fp.alias("fp"))
        .groupBy("lang")
        .agg(F.countDistinct("fp").alias("n_distinct_fp"),
             F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang")
    )


@query("text_bpe_token_count", sql=f"""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text,
               '{BPE_PATTERN}'))) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT)
             AS n_ws_tokens
    FROM documents GROUP BY lang ORDER BY lang
""")
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with the BPE-ish pre-tokenizer vs whitespace —
    the budget estimate every training-data pipeline runs first."""
    return (
        _docs(spark, sf_dir)
        .select("lang",
                F.size(bpe_ish_tokens(F.col("text"))).alias("n_bpe"),
                F.size(_tokens()).alias("n_ws"))
        .groupBy("lang")
        .agg(F.sum("n_bpe").alias("n_bpe_tokens"),
             F.sum("n_ws").alias("n_ws_tokens"))
        .orderBy("lang")
    )


@query("text_top_tokens", sql="""
    SELECT tok, COUNT(*) AS n
    FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS tok
          FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 10
""")
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency top-10 (explode → count → top-k).

    Scale: explode multiplies rows, but partial aggregation collapses
    each task to its distinct tokens before the shuffle, and the top-10
    is TakeOrderedAndProject — no global materialization.
    """
    return (
        _docs(spark, sf_dir)
        .select(F.explode(_tokens()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(10)
    )


@query("text_tfidf_top_terms", sql="""
    WITH tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
              FROM documents WHERE doc_id < 50)
        GROUP BY doc_id, tok
    ), df AS (
        SELECT tok, COUNT(DISTINCT doc_id) AS df
        FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
              FROM documents)
        GROUP BY tok
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.tok,
               ROUND(tf.tf * ln(n.n_docs * 1.0 / df.df), 4) AS tfidf
        FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rn
          FROM scored)
    WHERE rn <= 3
    ORDER BY doc_id, tfidf DESC, tok
""")
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: top-3 most characteristic terms per document (first 50
    docs), idf over the WHOLE corpus — the keyword-extraction /
    relevance-weighting primitive.

    Scale: tf is a (doc, term) aggregate of the probe slice only; df is
    a term aggregate of the full corpus (shuffle carries (term, count)
    partials, not positions); scoring joins tf against the df table on
    term — at 100 TB the df side is |vocab| rows and broadcasts. The
    per-doc top-3 is a bounded row_number window. Ordering and output
    round tfidf to 4dp so Spark and the oracle rank identical doubles
    (ln on identical doubles is bit-equal in practice; 4dp absorbs any
    libm ulp)."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(_tokens()).alias("tok"))
    tf = (toks.filter(F.col("doc_id") < 50)
          .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf")))
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()
    scored = (
        tf.join(F.broadcast(df), "tok")
        .select("doc_id", "tok",
                F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")),
                        4).alias("tfidf"))
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "tfidf")
        .orderBy("doc_id", F.desc("tfidf"), "tok")
    )


@query("text_repetition_signals", sql="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w FROM documents
    ), tok_counts AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(w) AS tok FROM toks)
      GROUP BY doc_id, tok
    ), per_tok AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             COUNT(*) AS n_types, MAX(c) AS top_c
      FROM tok_counts GROUP BY doc_id
    ), bigrams AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] AS bg
      FROM (SELECT *, unnest(generate_series(1, len(w) - 1)) AS i
            FROM toks)
    ), bg_stats AS (
      SELECT doc_id, COUNT(*) AS n_bg, COUNT(DISTINCT bg) AS n_bg_d
      FROM bigrams GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_tokens,
           ROUND(p.n_types * 1.0 / p.n_tokens, 4) AS type_token_ratio,
           ROUND(p.top_c * 1.0 / p.n_tokens, 4) AS top_token_frac,
           ROUND(1.0 - b.n_bg_d * 1.0 / b.n_bg, 4) AS dup_bigram_frac
    FROM per_tok p JOIN bg_stats b USING (doc_id)
    ORDER BY p.doc_id
""")
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition signals per document — the filters a
    training-data pipeline runs before anything expensive: type/token
    ratio, most-frequent-token fraction, and duplicate-bigram fraction
    (high values = boilerplate/spam/degenerate text to drop).

    Scale: token counts shuffle (doc_id, 8B token hash) pairs once; the
    bigram stats are fully narrow (size/array_distinct per row, no
    explode leaves the row). Both partial-aggregate map-side, so the
    shuffle carries one row per (doc, type), never per token.
    """
    toks = _tokens()
    docs = _docs(spark, sf_dir).select("doc_id", toks.alias("w"))
    per_tok = (
        docs.select("doc_id", F.explode("w").alias("tok"))
        .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_tokens"),
             F.count(F.lit(1)).alias("n_types"),
             F.max("c").alias("top_c"))
    )
    bg = F.transform(
        F.sequence(F.lit(0), F.size("w") - 2),
        lambda i: F.concat_ws(" ", F.element_at("w", i + 1),
                              F.element_at("w", i + 2)))
    # materialize the bigram array once — referencing the transform
    # expression from both size() and array_distinct() would build it
    # twice per row (top-level CSE stops at the projection boundary)
    bg_stats = (docs.select("doc_id", bg.alias("bg"))
                .select("doc_id", F.size("bg").alias("n_bg"),
                        F.size(F.array_distinct("bg")).alias("n_bg_d")))
    return (
        per_tok.join(bg_stats, "doc_id")
        .select(
            "doc_id", "n_tokens",
            F.round(F.col("n_types") / F.col("n_tokens"), 4)
             .alias("type_token_ratio"),
            F.round(F.col("top_c") / F.col("n_tokens"), 4)
             .alias("top_token_frac"),
            F.round(F.lit(1.0) - F.col("n_bg_d") / F.col("n_bg"), 4)
             .alias("dup_bigram_frac"))
        .orderBy("doc_id")
    )


@query("text_unigram_logprob", sql="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
      FROM documents
    ), freq AS (
      SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
    ), total AS (
      SELECT SUM(c) AS t FROM freq
    ), scored AS (
      SELECT doc_id, ln(c * 1.0 / t) AS lp
      FROM toks JOIN freq USING (tok) CROSS JOIN total
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           ROUND(AVG(lp), 4) AS logprob_mean
    FROM scored GROUP BY doc_id ORDER BY doc_id
""")
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram language-model proxy score (the CCNet/KenLM-style
    quality signal): each document's mean log-probability of its tokens
    under the corpus unigram distribution. Low scores flag rare-token
    gibberish; implausibly high scores flag boilerplate — the classic
    pre-filter before anything expensive in a training-data pipeline.

    Scale: token counts shuffle (8-byte-hashable token, count) pairs
    with map-side combine; the per-token probability join co-partitions
    both sides on `tok` (the frequency table at 100 TB is vocabulary-
    sized — too big to broadcast, right-sized for a shuffle join), and
    the per-doc mean partial-aggregates before the doc_id shuffle. The
    corpus total is a 1-row aggregate broadcast as a literal cross
    join. ROUND(·,4) absorbs libm last-ulp ln() differences and
    summation-order float drift between engines.
    """
    # tokens travel as 8-byte xxhash64 keys through the count and the
    # probability join (identical counts modulo ~|vocab|²/2⁶⁴ collisions,
    # far below the oracle's detection floor) — the shuffle carries
    # (doc_id, hash) pairs, never strings
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(_tokens()).alias("tok"))
        .select("doc_id", F.xxhash64("tok").alias("th"))
    )
    freq = toks.groupBy("th").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("t"))
    scored = (
        toks.join(freq, "th")
        .crossJoin(F.broadcast(total))
        .select("doc_id",
                F.log(F.col("c") * F.lit(1.0) / F.col("t")).alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.round(F.avg("lp"), 4).alias("logprob_mean"))
        .orderBy("doc_id")
    )


# --- retrieval: BM25 + reciprocal-rank fusion -------------------------------
# Probe query shared by the retrieval pair below (and mirrored as literals in
# the oracles): one rare discriminative term plus two common ones, so the
# ranking exercises both idf extremes of the fixture vocabulary.
_PROBE_TERMS = ("dup", "spark", "join")
_BM25_K1 = 1.2
_BM25_B = 0.75


def _probe_scores(spark: SparkSession, sf_dir: str):
    """Shared (doc_id, bm25, tfidf) scoring frame for the probe query.

    Determinism across engines: avgdl is SUM(int dl)/COUNT — an exact
    integer sum then one double division, bit-identical in Spark and
    DuckDB (never an engine-ordered double AVG); idf inputs are
    integers; scores round to 4dp before any ranking (the
    text_tfidf_top_terms convention — ln on identical doubles plus 4dp
    absorbs libm ulp)."""
    docs = _docs(spark, sf_dir)
    # Materialize the token array ONCE before size()/explode() use
    # (HOF-CSE: an inlined split would re-split per consumer).
    toks = docs.select("doc_id", _tokens().alias("w"))
    dl = toks.select("doc_id", F.size("w").alias("dl"))
    term = toks.select("doc_id", F.explode("w").alias("tok"))
    probe = term.filter(F.col("tok").isin(*_PROBE_TERMS))
    tf = probe.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = probe.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    corpus = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("dl").alias("sum_dl"))
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    avgdl = F.col("sum_dl") / F.col("n_docs")
    idf_bm25 = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                     / (F.col("df") + 0.5))
    idf_plain = F.log(F.col("n_docs") / F.col("df"))
    bm25_term = (idf_bm25 * F.col("tf") * (k1 + 1)
                 / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)))
    return (
        tf.join(F.broadcast(df), "tok")
        .join(F.broadcast(dl), "doc_id")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(F.round(F.sum(bm25_term), 4).alias("bm25"),
             F.round(F.sum(idf_plain * F.col("tf")), 4).alias("tfidf"))
    )


# Shared oracle CTE replaying _probe_scores in DuckDB (literals inlined).
_PROBE_SQL = """
    toks AS (
        SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
        FROM documents
    ), dl AS (SELECT doc_id, len(w) AS dl FROM toks),
    probe AS (
        SELECT doc_id, tok
        FROM (SELECT doc_id, unnest(w) AS tok FROM toks)
        WHERE tok IN ('dup', 'spark', 'join')
    ), tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM probe
              GROUP BY doc_id, tok),
    df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM probe GROUP BY tok),
    corpus AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
    scored AS (
        SELECT tf.doc_id,
               ROUND(SUM(ln(1.0 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
                         * tf.tf * (1.2 + 1)
                         / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                                           / (c.sum_dl * 1.0 / c.n_docs)))),
                     4) AS bm25,
               ROUND(SUM(ln(c.n_docs * 1.0 / df.df) * tf.tf), 4) AS tfidf
        FROM tf JOIN df USING (tok) JOIN dl USING (doc_id)
             CROSS JOIN corpus c
        GROUP BY tf.doc_id
    )
"""


@query("text_bm25_topk", sql=f"""
    WITH {_PROBE_SQL}
    SELECT doc_id, bm25, rn FROM (
        SELECT doc_id, bm25,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rn
        FROM scored)
    WHERE rn <= 20
    ORDER BY rn
""")
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (Robertson-Spärck Jones, k1=1.2 b=0.75) top-20 retrieval
    for a literal probe query — the lexical-search scoring standard.

    Scale: the probe filter lands BEFORE any aggregation, so the big
    explode collapses to |probe terms ∩ corpus| rows immediately; df
    and corpus stats are term-count and 1-row aggregates that
    broadcast; the only wide op over full data is the (doc, tok)
    partial-agg shuffle of probe hits, and the top-20 is
    TakeOrderedAndProject after the bounded window. At 100 TB the same
    plan serves any literal query: cost scales with posting-list size,
    not corpus size — the inverted-index access path expressed as
    DataFrame ops. The global top-20 is selected with orderBy+limit
    (TakeOrderedAndProject — per-partition heaps, no single-partition
    global window); the rank column is then assigned by a window over
    the already-20-row result, which is bounded by construction."""
    scored = _probe_scores(spark, sf_dir)
    top = scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(20)
    w = W.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (top.withColumn("rn", F.row_number().over(w))
            .select("doc_id", "bm25", "rn")
            .orderBy("rn"))


@query("search_rrf_fusion", sql=f"""
    WITH {_PROBE_SQL},
    a AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id)
                 AS rank_bm25 FROM scored QUALIFY rank_bm25 <= 100),
    b AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY tfidf DESC, doc_id)
                 AS rank_tfidf FROM scored QUALIFY rank_tfidf <= 100),
    fused AS (
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
               a.rank_bm25, b.rank_tfidf,
               ROUND(COALESCE(1.0 / (60 + a.rank_bm25), 0)
                     + COALESCE(1.0 / (60 + b.rank_tfidf), 0), 6) AS rrf
        FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    )
    SELECT doc_id, rank_bm25, rank_tfidf, rrf, rn FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rn
        FROM fused)
    WHERE rn <= 15
    ORDER BY rn
""")
def search_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009, k=60) of two
    rankers over the same probe query — BM25 and plain TF-IDF — the
    standard way hybrid search merges lexical and secondary rankings
    without score calibration.

    Scale: both rankers share ONE scoring frame (scored once, ranked
    twice), each list is truncated to its top-100 via
    TakeOrderedAndProject before fusing; the fusion itself is a
    union + groupBy over <=200 (doc, list, rank) rows — NOT a
    full-outer join, which Spark cannot broadcast (full-outer forces
    SortMergeJoin even on tiny sides); 1/(60+rank) on integer ranks is
    exact double arithmetic, bit-identical across engines (no libm in
    the fusion step)."""
    scored = _probe_scores(spark, sf_dir).persist()
    # Each list's top-100 is TakeOrderedAndProject (distributed heap
    # selection); the rank windows then run over <=100 rows each.
    a = (scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(100)
         .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.desc("bm25"), F.asc("doc_id"))))
         .select("doc_id", F.lit("bm25").alias("lst"), "rank"))
    b = (scored.orderBy(F.desc("tfidf"), F.asc("doc_id")).limit(100)
         .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.desc("tfidf"), F.asc("doc_id"))))
         .select("doc_id", F.lit("tfidf").alias("lst"), "rank"))
    fused = (
        a.unionByName(b)
        .groupBy("doc_id")
        .agg(F.max(F.when(F.col("lst") == "bm25", F.col("rank")))
             .alias("rank_bm25"),
             F.max(F.when(F.col("lst") == "tfidf", F.col("rank")))
             .alias("rank_tfidf"),
             F.round(F.sum(1.0 / (F.col("rank") + 60)), 6).alias("rrf")))
    w = W.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (fused.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 15)
            .select("doc_id", "rank_bm25", "rank_tfidf", "rrf", "rn")
            .orderBy("rn"))


# ------------------------------------------------------ PMI collocations

PMI_MIN_COUNT = 5
PMI_TOP = 20


@query("text_pmi_bigrams", sql=f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
      FROM documents
    ), uni AS (
      SELECT u.x AS tok, COUNT(*) AS c
      FROM toks, unnest(w) u(x) GROUP BY 1
    ), nu AS (SELECT SUM(c) AS n FROM uni),
    nb AS (
      SELECT SUM(GREATEST(len(w) - 1, 0)) AS n FROM toks
    ), big AS (
      SELECT z[1] AS w1, z[2] AS w2, COUNT(*) AS c
      FROM (SELECT unnest(list_zip(w[1:len(w) - 1], w[2:len(w)])) AS z
            FROM toks WHERE len(w) >= 2)
      GROUP BY 1, 2 HAVING COUNT(*) >= {PMI_MIN_COUNT}
    )
    SELECT * FROM (
      SELECT b.w1, b.w2, b.c AS n_pair,
             ROUND(LN((b.c / nb.n)
                      / ((u1.c / nu.n) * (u2.c / nu.n))), 6) AS pmi,
             CAST(ROW_NUMBER() OVER (
                 ORDER BY ROUND(LN((b.c / nb.n)
                     / ((u1.c / nu.n) * (u2.c / nu.n))), 6) DESC,
                 b.w1, b.w2) AS INT) AS rank
      FROM big b
      JOIN uni u1 ON u1.tok = b.w1
      JOIN uni u2 ON u2.tok = b.w2
      CROSS JOIN nu CROSS JOIN nb)
    WHERE rank <= {PMI_TOP} ORDER BY rank
""")
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining: the top-20
    adjacent-token bigrams by PMI = ln(P(xy) / (P(x)P(y))) with a
    min-support floor — the classic phrase/collocation detector
    (Church & Hanks 1990) used to pick merge candidates and protect
    multi-word entities in training-data tokenization.

    Tokens are materialized ONCE per doc (the HOF-CSE discipline:
    split runs once, then bigram generation is a transform over the
    materialized array — no re-split inside higher-order functions).
    Bigram slots come from a narrow generate (transform+explode),
    unigram and bigram counts are two map-side-combined hash aggs,
    and the two vocabulary joins are keyed on the token — genuinely
    big-big at web-corpus vocabulary sizes, so shuffle joins are the
    scale plan (AQE broadcasts when a side measures small). The
    min-support HAVING prunes the bigram table BEFORE the joins.
    Corpus totals ride along as broadcast 1-row frames. Top-k is
    orderBy+limit (TakeOrderedAndProject), rank window over 20 rows.

    Determinism: counts are exact integers; the PMI double is two
    IEEE divisions + ln of identical inputs on both engines, rounded
    to 6 dp; ties break on (w1, w2)."""
    toks = (_docs(spark, sf_dir)
            .select("doc_id", _tokens().alias("w")))
    uni = (toks.select(F.explode("w").alias("tok"))
           .groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    n_u = uni.agg(F.sum("c").alias("nu"))
    n_b = toks.agg(F.sum(F.greatest(F.size("w") - 1, F.lit(0)))
                   .alias("nb"))
    # zip_with over slices, NOT element_at(w, i) in the lambda:
    # InferFiltersFromGenerate clones this generator into a Filter
    # and pushdown inlines w = split(text) into the clone — an
    # indexing lambda then re-splits the document PER ELEMENT,
    # O(tokens^2) per doc (the round-10 bloom-decon root cause).
    big = (toks.filter(F.size("w") >= 2)
           .select(F.explode(F.expr(
               "zip_with(slice(w, 1, size(w) - 1), "
               "slice(w, 2, size(w) - 1), "
               "(a, b) -> struct(a AS w1, b AS w2))"
           )).alias("bg"))
           .select("bg.*")
           .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
           .filter(F.col("c") >= PMI_MIN_COUNT))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    pmi = F.round(F.log((F.col("c") / F.col("nb"))
                        / ((F.col("c1") / F.col("nu"))
                           * (F.col("c2") / F.col("nu")))), 6)
    scored = (big.join(u1, "w1").join(u2, "w2")
              .crossJoin(F.broadcast(n_u)).crossJoin(F.broadcast(n_b))
              .select("w1", "w2", F.col("c").alias("n_pair"),
                      pmi.alias("pmi")))
    top = scored.orderBy(F.desc("pmi"), "w1", "w2").limit(PMI_TOP)
    w = W.orderBy(F.desc("pmi"), "w1", "w2")
    return (top.withColumn("rank", F.row_number().over(w))
            .orderBy("rank"))


# ------------------------------------------------------------ Zipf fit

ZIPF_MIN_RANK_N = 20   # fit over the top-N ranks


@query("text_zipf_fit", sql=f"""
    WITH uni AS (
      SELECT u.x AS tok, COUNT(*) AS c
      FROM (SELECT regexp_split_to_array(text, '\\s+') AS w
            FROM documents), unnest(w) u(x)
      GROUP BY 1
    ), ranked AS (
      SELECT tok, c,
             ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r
      FROM uni
    ), top AS (
      SELECT LN(r) AS lr, LN(c) AS lc FROM ranked
      WHERE r <= {ZIPF_MIN_RANK_N}
    )
    SELECT CAST({ZIPF_MIN_RANK_N} AS INT) AS n_ranks,
           ROUND(REGR_SLOPE(lc, lr), 6) AS zipf_slope,
           ROUND(REGR_INTERCEPT(lc, lr), 6) AS log_c0,
           ROUND(REGR_R2(lc, lr), 6) AS r2
    FROM top
""")
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus token rank-frequency curve: OLS
    of ln(freq) on ln(rank) for the top ranks — natural text sits
    near slope -1, and large deviations are a corpus-pathology
    signal (boilerplate floods flatten the head, template spam
    steepens it). The r² says how Zipfian the corpus is at all.

    One token-count agg (map-side combined), a top-N rank selection
    (orderBy+limit shape via the row_number filter over the
    vocab-grain frame), then the built-in JVM regression aggregates
    over N rows. Determinism: ranks tie-break on token; ln/regr over
    identical doubles, rounded 6 dp."""
    uni = (_docs(spark, sf_dir)
           .select(F.explode(_tokens()).alias("tok"))
           .groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    top = (uni.orderBy(F.desc("c"), "tok").limit(ZIPF_MIN_RANK_N)
           .select(F.col("c"),
                   F.row_number().over(
                       W.orderBy(F.desc("c"), "tok")).alias("r")))
    lr, lc = F.log(F.col("r").cast("double")), F.log(F.col("c"))
    return top.agg(
        F.lit(ZIPF_MIN_RANK_N).cast("int").alias("n_ranks"),
        F.round(F.regr_slope(lc, lr), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(lc, lr), 6).alias("log_c0"),
        F.round(F.regr_r2(lc, lr), 6).alias("r2"))


# ------------------------------------------------------ readability


@query("text_readability_proxy", sql="""
    WITH toks AS (
      SELECT doc_id, lang, regexp_split_to_array(text, '\\s+') AS w
      FROM documents
    ), per_word AS (
      SELECT doc_id, lang, u.x AS word,
             GREATEST(len(regexp_extract_all(u.x, '[aeiouy]+')), 1)
               AS syl
      FROM toks, unnest(w) u(x) WHERE u.x <> ''
    ), per_doc AS (
      SELECT doc_id, lang, COUNT(*) AS n_words,
             SUM(syl) AS n_syl
      FROM per_word GROUP BY 1, 2
    )
    SELECT lang, COUNT(*) AS n_docs,
           ROUND(AVG(n_syl / (n_words * 1e0)), 6) AS avg_syl_per_word,
           ROUND(AVG(206.835 - 1.015 * n_words
                     - 84.6 * (n_syl / (n_words * 1e0))), 4)
             AS avg_flesch_proxy
    FROM per_doc GROUP BY lang ORDER BY lang
""")
def text_readability_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-reading-ease proxy per language: syllables approximated
    by vowel-group runs (the standard no-dictionary heuristic), each
    document treated as one sentence (the fixture is bag-of-words
    text with no sentence boundaries — the docstring caveat a real
    corpus run removes by splitting on terminators first).
    Readability gates are a stock filter in training-data quality
    stacks (C4 dropped pages by heuristic text statistics).

    Tokens materialize once; syllable counting is a JVM regex per
    token inside one explode → per-doc agg → per-lang agg, all
    map-side combined. GREATEST(…, 1) floors vowel-less tokens so a
    word never contributes zero syllables."""
    toks = (_docs(spark, sf_dir)
            .select("doc_id", "lang", _tokens().alias("w")))
    per_word = (toks.select(
        "doc_id", "lang", F.explode("w").alias("word"))
        .filter(F.col("word") != "")
        .select("doc_id", "lang",
                F.greatest(
                    F.size(F.regexp_extract_all(
                        F.col("word"), F.lit("[aeiouy]+"), 0)),
                    F.lit(1)).alias("syl")))
    per_doc = (per_word.groupBy("doc_id", "lang")
               .agg(F.count(F.lit(1)).alias("n_words"),
                    F.sum("syl").alias("n_syl")))
    spw = F.col("n_syl") / F.col("n_words")
    flesch = 206.835 - 1.015 * F.col("n_words") - 84.6 * spw
    return (per_doc.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg(spw), 6).alias("avg_syl_per_word"),
                 F.round(F.avg(flesch), 4).alias("avg_flesch_proxy"))
            .orderBy("lang"))


@query("text_bigram_logprob", sql="""
    WITH arr AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
      FROM documents
    ), uni AS (
      SELECT unnest(w) AS tok FROM arr
    ), vocab AS (
      SELECT COUNT(DISTINCT tok) AS v FROM uni
    ), bi AS (
      SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
      FROM (SELECT *, unnest(generate_series(1, len(w) - 1)) AS i
            FROM arr)
    ), c2 AS (
      SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY 1, 2
    ), c1 AS (
      SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY 1
    ), scored AS (
      SELECT b.doc_id,
             ln((c2.c2 + 1) * 1.0 / (c1.c1 + v.v)) AS lp
      FROM bi b
      JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
      JOIN c1 ON c1.w1 = b.w1
      CROSS JOIN vocab v
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(AVG(lp), 4) AS logprob_mean
    FROM scored GROUP BY doc_id ORDER BY doc_id
""")
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one-smoothed corpus BIGRAM language-model score per document
    — the next step up from `text_unigram_logprob`'s CCNet-style
    filter: P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V). Catches
    wrong-word-order gibberish that unigram scores cannot (same bag of
    words, broken sequence).

    Scale: bigrams come from ONE array transform over the materialized
    token array (HOF-CSE discipline — no self-join of exploded
    positions, no window over raw rows); counts and the probability
    joins shuffle 8-byte (h1, h2) hash pairs with map-side combine,
    co-partitioned on the bigram key; V is a 1-row broadcast. The
    smoothed-count join keys are vocabulary²-sized — far below data
    size — and per-doc means partial-aggregate before the doc shuffle.
    Token identity travels as xxhash64 (collision odds ~|V|²/2⁶⁴,
    below the oracle's detection floor), matching the unigram op."""
    arr = _docs(spark, sf_dir).select("doc_id", _tokens().alias("w"))
    # (h1, h2) bigram hash pairs from one pass over the token array
    # zip_with over slices, NOT element_at(w, i) in the lambda:
    # InferFiltersFromGenerate clones this generator into a Filter
    # and pushdown inlines w = split(text) into the clone — an
    # indexing lambda then re-splits the document PER ELEMENT,
    # O(tokens^2) per doc (the round-10 bloom-decon root cause).
    big = (arr.select(
        "doc_id",
        F.explode(F.expr(
            "zip_with(slice(w, 1, size(w) - 1), "
            "slice(w, 2, size(w) - 1), "
            "(a, b) -> struct(xxhash64(a) AS h1, "
            "xxhash64(b) AS h2))")).alias("b"))
        .select("doc_id", "b.h1", "b.h2"))
    uni = arr.select(F.explode("w").alias("tok"))
    vocab = uni.agg(F.countDistinct("tok").alias("v"))
    c2 = big.groupBy("h1", "h2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = big.groupBy("h1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (big.join(c2, ["h1", "h2"]).join(c1, "h1")
              .crossJoin(F.broadcast(vocab))
              .select("doc_id",
                      F.log((F.col("c2") + 1) * F.lit(1.0)
                            / (F.col("c1") + F.col("v"))).alias("lp")))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.avg("lp"), 4).alias("logprob_mean"))
            .orderBy("doc_id"))


@query("text_js_divergence_sources", sql="""
    WITH toks AS (
      SELECT source, unnest(regexp_split_to_array(text, '\\s+')) AS tok
      FROM documents
    ), src AS (
      SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2
    ), srctot AS (
      SELECT source, SUM(c) AS t FROM src GROUP BY 1
    ), corp AS (
      SELECT tok, SUM(c) AS cc FROM src GROUP BY 1
    ), corptot AS (
      SELECT SUM(cc) AS ct FROM corp
    ), parts AS (
      SELECT s.source,
             s.c / (st.t * 1e0) AS p,
             c2.cc / (ct.ct * 1e0) AS q
      FROM src s
      JOIN srctot st ON st.source = s.source
      JOIN corp c2 ON c2.tok = s.tok
      CROSS JOIN corptot ct
    )
    SELECT source,
           CAST(MAX(st2.t) AS BIGINT) AS n_tokens,
           ROUND(SUM(0.5 * p * ln(2 * p / (p + q))
                     + 0.5 * q * ln(2 * q / (p + q))), 6) AS jsd_nats
    FROM parts JOIN srctot st2 USING (source)
    GROUP BY source ORDER BY source
""")
def text_js_divergence_sources(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between each source's token
    distribution and the whole-corpus distribution — the symmetric,
    bounded domain-shift score training-mixture tooling uses to rank
    how far each data source sits from the blend it feeds. (Support
    note: JSD's q-only term is computed over the source's support,
    exact here because every fixture token occurs in every source;
    sources with partial support would add a constant measurable from
    the same frames.)

    Scale: one (source, token) count shuffle with map-side combine —
    the only data-sized stage; everything downstream runs on
    |sources| x |vocab| rows. The corpus marginal derives from the
    same counts (no second scan), and the tiny probability frames
    join on token, broadcast-sized at any corpus scale since they are
    vocabulary-grain."""
    toks = (_docs(spark, sf_dir)
            .select("source", F.explode(_tokens()).alias("tok")))
    # persisted: three consumers (per-source totals, corpus marginal,
    # the probability frame) would otherwise each re-run the data-sized
    # (source, token) count shuffle
    src = (toks.groupBy("source", "tok")
           .agg(F.count(F.lit(1)).alias("c"))).persist()
    srctot = src.groupBy("source").agg(F.sum("c").alias("t"))
    corp = src.groupBy("tok").agg(F.sum("c").alias("cc"))
    corptot = corp.agg(F.sum("cc").alias("ct"))
    p = F.col("c") / (F.col("t") * F.lit(1.0))
    q = F.col("cc") / (F.col("ct") * F.lit(1.0))
    parts = (src.join(F.broadcast(srctot), "source")
             .join(corp, "tok")
             .crossJoin(F.broadcast(corptot))
             .select("source", p.alias("p"), q.alias("q")))
    jsd = F.sum(0.5 * F.col("p")
                * F.log(2 * F.col("p") / (F.col("p") + F.col("q")))
                + 0.5 * F.col("q")
                * F.log(2 * F.col("q") / (F.col("p") + F.col("q"))))
    return (parts.join(F.broadcast(srctot), "source")
            .groupBy("source")
            .agg(F.max("t").cast("bigint").alias("n_tokens"),
                 F.round(jsd, 6).alias("jsd_nats"))
            .orderBy("source"))


@query("text_shingle_novelty", sql="""
    WITH arr AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS s
      FROM (SELECT *, unnest(generate_series(1, len(w) - 2)) AS i
            FROM arr)
    ), df AS (
      SELECT s, COUNT(*) AS df FROM sh GROUP BY 1
    )
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           ROUND(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END)
                 / (COUNT(*) * 1e0), 6) AS novelty
    FROM sh JOIN df ON df.s = sh.s
    GROUP BY sh.doc_id ORDER BY sh.doc_id
""")
def text_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle novelty score: the fraction of each document's distinct
    word 3-grams that appear NOWHERE else in the corpus — the inverse
    of the dedup family's overlap signals. High novelty marks unique
    content worth keeping; near-zero novelty marks boilerplate and
    template spam even when no single pair-wise duplicate exists
    (the N-to-N redundancy case MinHash pairs miss).

    Plan: the same materialized-token-array + distinct-shingle shape
    as the dedup inverted index (HOF-CSE discipline; the shuffle
    carries 8-byte shingle hashes, not strings), one document-
    frequency agg, one hash-keyed join back, one per-doc rollup —
    every stage partial-aggregatable."""
    arr = _docs(spark, sf_dir).select("doc_id", _tokens().alias("w"))
    # zip_with over slices, NOT element_at(w, i) in the lambda:
    # InferFiltersFromGenerate clones this generator into a Filter
    # and pushdown inlines w = split(text) into the clone — an
    # indexing lambda then re-splits the document PER ELEMENT,
    # O(tokens^2) per doc (the round-10 bloom-decon root cause).
    sh = (arr.select(
        "doc_id",
        F.explode(F.expr(
            "zip_with(zip_with(slice(w, 1, size(w) - 2), "
            "slice(w, 2, size(w) - 2), "
            "(a, b) -> concat_ws(' ', a, b)), "
            "slice(w, 3, size(w) - 2), "
            "(ab, c) -> xxhash64(concat_ws(' ', ab, c)))")).alias("sh"))
        .distinct())
    df = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    novel = F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
    return (sh.join(df, "sh")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 novel.cast("bigint").alias("n_novel"),
                 F.round(novel / (F.count(F.lit(1)) * F.lit(1.0)), 6)
                 .alias("novelty"))
            .orderBy("doc_id"))


@query("text_stopword_profile", sql="""
    WITH toks AS (
      SELECT doc_id, source,
             unnest(regexp_split_to_array(text, '\\s+')) AS tok
      FROM documents
    ), n_docs AS (
      SELECT COUNT(DISTINCT doc_id) AS nd FROM toks
    ), per_tok AS (
      SELECT tok,
             COUNT(*) AS tf,
             COUNT(DISTINCT doc_id) AS df
      FROM toks GROUP BY tok
    ), shares AS (
      SELECT tok, source, COUNT(*) AS c FROM toks GROUP BY 1, 2
    ), spread AS (
      SELECT tok,
             ROUND(stddev_samp(c * 1e0 / tot), 6) AS share_sd
      FROM (SELECT tok, source, c,
                   SUM(c) OVER (PARTITION BY tok) AS tot
            FROM shares)
      GROUP BY tok
    )
    SELECT p.tok,
           CAST(p.tf AS BIGINT) AS tf,
           CAST(p.df AS BIGINT) AS df,
           ROUND(p.df * 1e0 / n.nd, 6) AS doc_frac,
           ROUND(LN(n.nd * 1e0 / p.df), 6) AS idf,
           s.share_sd,
           (p.df * 1e0 / n.nd > 0.9) AS stopword_candidate
    FROM per_tok p
    JOIN spread s ON s.tok = p.tok
    CROSS JOIN n_docs n
    ORDER BY p.tf DESC, p.tok
""")
def text_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automatic stopword detection profile: per token — term
    frequency, document frequency, IDF, and the cross-source share
    spread. A token in >90% of documents with near-uniform
    distribution across sources carries no signal for retrieval or
    classification; this is how language-agnostic pipelines derive
    their stopword lists from the corpus itself instead of shipping
    per-language hand lists (the fixture's 31-token vocabulary makes
    the full profile small; at real vocabulary sizes the same plan
    emits the top-N by tf).

    One (doc, token) explode feeding three partial-aggregatable
    rollups — token grain everywhere after the scan; the per-source
    spread reuses the same counts via a window at (token, source)
    grain."""
    toks = (_docs(spark, sf_dir)
            .select("doc_id", "source", F.explode(_tokens()).alias("tok"))
            ).persist()
    nd = toks.agg(F.countDistinct("doc_id").alias("nd"))
    per_tok = (toks.groupBy("tok")
               .agg(F.count(F.lit(1)).alias("tf"),
                    F.countDistinct("doc_id").alias("df")))
    shares = toks.groupBy("tok", "source").agg(
        F.count(F.lit(1)).alias("c"))
    spread = (shares
              .withColumn("tot", F.sum("c").over(
                  W.partitionBy("tok")))
              .groupBy("tok")
              .agg(F.round(F.stddev_samp(
                  F.col("c") * F.lit(1.0) / F.col("tot")), 6)
                  .alias("share_sd")))
    return (per_tok.join(spread, "tok")
            .crossJoin(F.broadcast(nd))
            .select("tok",
                    F.col("tf").cast("bigint").alias("tf"),
                    F.col("df").cast("bigint").alias("df"),
                    F.round(F.col("df") * F.lit(1.0) / F.col("nd"), 6)
                    .alias("doc_frac"),
                    F.round(F.log(F.col("nd") * F.lit(1.0)
                                  / F.col("df")), 6).alias("idf"),
                    "share_sd",
                    (F.col("df") * F.lit(1.0) / F.col("nd") > 0.9)
                    .alias("stopword_candidate"))
            .orderBy(F.desc("tf"), "tok"))


_HEAPS_CHECKPOINTS = (500, 1000, 2000, 4000, 8000, 16000)


@query("text_heaps_law_fit", sql=f"""
    WITH arr AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
      FROM documents
    ), doclen AS (
      SELECT doc_id, len(w) AS n,
             SUM(len(w)) OVER (ORDER BY doc_id) - len(w) AS off
      FROM arr
    ), toks AS (
      SELECT a.doc_id, d.off + i AS gpos, a.w[i] AS tok
      FROM arr a
      JOIN doclen d ON d.doc_id = a.doc_id,
      unnest(generate_series(1, len(a.w))) AS t(i)
    ), firstpos AS (
      SELECT tok, MIN(gpos) AS fp FROM toks GROUP BY tok
    ), total AS (
      SELECT SUM(n) AS tt FROM doclen
    ), cp AS (
      SELECT unnest(ARRAY{list(_HEAPS_CHECKPOINTS)}) AS n
    ), growth AS (
      SELECT cp.n,
             (SELECT COUNT(*) FROM firstpos WHERE fp <= cp.n) AS v
      FROM cp CROSS JOIN total WHERE cp.n <= total.tt
    ), ols AS (
      SELECT COUNT(*) AS k,
             SUM(LN(n)) AS sx, SUM(LN(v)) AS sy,
             SUM(LN(n) * LN(n)) AS sxx,
             SUM(LN(n) * LN(v)) AS sxy,
             SUM(LN(v) * LN(v)) AS syy
      FROM growth
    )
    SELECT CAST(k AS INT) AS n_checkpoints,
           ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS beta,
           ROUND(EXP((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx)
                      * sx) / k), 6) AS k_coef,
           ROUND(POW(k * sxy - sx * sy, 2)
                 / ((k * sxx - sx * sx) * (k * syy - sy * sy)), 6)
             AS r2
    FROM ols
""")
def text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit: vocabulary growth V(n) ≈ K·n^beta measured at
    fixed token-count checkpoints over the doc-ordered stream, with
    OLS in log-log space — the companion corpus-pathology signal to
    `text_zipf_fit` (natural corpora: beta ≈ 0.4-0.6; a synthetic
    closed vocabulary like this fixture saturates early — beta near 0
    at the later checkpoints — and template spam shows the same
    signature, which is exactly why release pipelines chart it).

    Plan: global token positions come from a doc-grain prefix-sum via
    the two-phase plan (`_twophase.with_global_order`):
    repartitionByRange(doc_id), per-range-partition running sum,
    broadcast partition offsets — no single-task sort (an
    unpartitioned cumsum window would move the whole doc frame to one
    partition) — plus a narrow posexplode; no global per-token
    window; first-occurrence is one hash agg; V(n) evaluates all
    checkpoints against the tiny first-position frame; the OLS closed
    form runs on ≤6 rows. Integer positions make every comparison
    exact."""
    arr = _docs(spark, sf_dir).select("doc_id", _tokens().alias("w"))
    doclen = (with_global_order(
        arr.select("doc_id", F.size("w").alias("n")),
        [F.asc("doc_id")], cumsums={"n": "cum_n"})
        .withColumn("off", F.col("cum_n") - F.col("n"))
        .drop("cum_n"))
    toks = (arr.join(doclen, "doc_id")
            .select(F.posexplode("w").alias("i", "tok"), "off")
            .select((F.col("off") + F.col("i") + 1).alias("gpos"),
                    "tok"))
    firstpos = toks.groupBy("tok").agg(F.min("gpos").alias("fp"))
    total = doclen.agg(F.sum("n").alias("tt"))
    cp = (spark.range(len(_HEAPS_CHECKPOINTS))
          .select(F.element_at(
              F.array(*[F.lit(c) for c in _HEAPS_CHECKPOINTS]),
              (F.col("id") + 1).cast("int")).alias("n")))
    growth = (cp.crossJoin(F.broadcast(total))
              .where(F.col("n") <= F.col("tt"))
              .crossJoin(F.broadcast(firstpos))
              .groupBy("n")
              .agg(F.sum(F.when(F.col("fp") <= F.col("n"), 1)
                         .otherwise(0)).alias("v")))
    lx, ly = F.log("n"), F.log("v")
    ols = growth.agg(F.count(F.lit(1)).alias("k"),
                     F.sum(lx).alias("sx"), F.sum(ly).alias("sy"),
                     F.sum(lx * lx).alias("sxx"),
                     F.sum(lx * ly).alias("sxy"),
                     F.sum(ly * ly).alias("syy"))
    slope = ((F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")))
    return ols.select(
        F.col("k").cast("int").alias("n_checkpoints"),
        F.round(slope, 6).alias("beta"),
        F.round(F.exp((F.col("sy") - slope * F.col("sx"))
                      / F.col("k")), 6).alias("k_coef"),
        F.round(F.pow(F.col("k") * F.col("sxy")
                      - F.col("sx") * F.col("sy"), 2)
                / ((F.col("k") * F.col("sxx")
                    - F.col("sx") * F.col("sx"))
                   * (F.col("k") * F.col("syy")
                      - F.col("sy") * F.col("sy"))), 6).alias("r2"))


@query("text_vocab_coverage_curve", sql="""
    WITH tf AS (
      SELECT tok, COUNT(*) AS c
      FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS tok
            FROM documents)
      GROUP BY tok
    ), ranked AS (
      SELECT tok, c,
             ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rnk,
             SUM(c) OVER (ORDER BY c DESC, tok) AS cum,
             SUM(c) OVER () AS total
      FROM tf
    )
    SELECT CAST(rnk AS INT) AS vocab_size,
           tok AS last_token,
           CAST(cum AS BIGINT) AS tokens_covered,
           ROUND(cum * 1e0 / total, 6) AS coverage
    FROM ranked
    WHERE rnk IN (1, 2, 5, 10, 20, 31)
    ORDER BY rnk
""")
def text_vocab_coverage_curve(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: corpus token mass covered by the
    top-k most frequent types at fixed checkpoints — the table that
    sizes a tokenizer vocabulary (pick k where coverage crosses the
    OOV budget) and quantifies how head-heavy the distribution is
    (the integral view of the Zipf fit's slope).

    One token-count shuffle with map-side combine, then the rank and
    running sum come from the two-phase plan
    (`_twophase.with_global_order`) over the deterministic
    (count DESC, token) total order — vocabulary grain usually fits a
    single task, but web-scale corpora push distinct types to 10^8+,
    so the curve gets the same no-single-partition treatment as the
    data-grain windows; the grand total is a broadcast scalar.
    Cumulative sums are exact integers."""
    tf = (_docs(spark, sf_dir)
          .select(F.explode(_tokens()).alias("tok"))
          .groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    total = tf.agg(F.sum("c").alias("total"))
    ranked = (with_global_order(tf, [F.desc("c"), F.asc("tok")],
                                rank_col="rnk", cumsums={"c": "cum"})
              .crossJoin(F.broadcast(total)))
    return (ranked
            .where(F.col("rnk").isin(1, 2, 5, 10, 20, 31))
            .select(F.col("rnk").cast("int").alias("vocab_size"),
                    F.col("tok").alias("last_token"),
                    F.col("cum").cast("bigint").alias("tokens_covered"),
                    F.round(F.col("cum") * F.lit(1.0) / F.col("total"),
                            6).alias("coverage"))
            .orderBy("vocab_size"))


@query("feature_hashing_trick", sql="""
    WITH t AS (
      SELECT doc_id, tok,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS bucket
      FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(text, '\\s+')) AS tok
            FROM documents)
    ), tf AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS total_tf
      FROM t GROUP BY 1
    ), df AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS df
      FROM (SELECT DISTINCT bucket, doc_id FROM t) GROUP BY 1
    ), cl AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_collided_terms
      FROM (SELECT DISTINCT bucket, tok FROM t) GROUP BY 1
    )
    SELECT tf.bucket, tf.total_tf, df.df, cl.n_collided_terms
    FROM tf JOIN df ON df.bucket = tf.bucket
            JOIN cl ON cl.bucket = tf.bucket
    ORDER BY tf.bucket
""")
def feature_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurizer audit (Weinberger et al., ICML'09
    "Feature Hashing for Large Scale Multitask Learning"): every token
    maps to one of 64 buckets via a PORTABLE md5-derived hash (the
    conv(substr(md5,1,8),16,10) idiom both engines compute bit-
    identically), the fixed-width sparse encoding that replaces an
    unbounded vocabulary lookup at training time. Emits the per-bucket
    corpus profile a feature-store job pins: total term frequency,
    document frequency, and the collision load (distinct terms sharing
    the bucket) — the quantity that tells you whether 64 is too small.

    Plan: one explode, then THREE separate aggregates joined on the
    64-row bucket grain — never two countDistincts in one groupBy
    (Catalyst's distinct-rewrite Expand multiplies every row k ways;
    the round-3 scale-sweep pathology). Each distinct pre-collapses
    map-side to its (bucket, key) pairs; the final three-way join is
    64 rows a side, broadcast. At 100 TB the only data-grain shuffles
    are the two distincts, both on collapsed pair grains."""
    t = (_docs(spark, sf_dir)
         .select("doc_id", F.explode(_tokens()).alias("tok"))
         .withColumn("bucket",
                     F.conv(F.substring(
                         F.md5(F.col("tok").cast("binary")), 1, 8),
                         16, 10).cast("long") % 64))
    tf = (t.groupBy("bucket")
          .agg(F.count(F.lit(1)).cast("bigint").alias("total_tf")))
    df = (t.select("bucket", "doc_id").distinct().groupBy("bucket")
          .agg(F.count(F.lit(1)).cast("bigint").alias("df")))
    cl = (t.select("bucket", "tok").distinct().groupBy("bucket")
          .agg(F.count(F.lit(1)).cast("bigint")
               .alias("n_collided_terms")))
    return (tf.join(F.broadcast(df), "bucket")
            .join(F.broadcast(cl), "bucket")
            .orderBy("bucket"))


@query("search_phrase_match", sql="""
    WITH tk AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(text, '\\s+')) AS tok,
             unnest(range(1, len(regexp_split_to_array(text, '\\s+'))
                          + 1)) AS pos
      FROM documents
    ), nx AS (
      SELECT doc_id, tok,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS tok2
      FROM tk
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM nx WHERE tok = 'fast' AND tok2 = 'table'
    GROUP BY doc_id
    ORDER BY n_hits DESC, doc_id
    LIMIT 20
""")
def search_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase query ("fast table") via a POSITIONAL inverted
    index — the operator that separates a search engine from a
    bag-of-words ranker (text_bm25_topk scores terms independently;
    phrases need positions). Emits the top-20 matching docs by hit
    count.

    Plan: posexplode builds the (term -> doc, position) postings;
    the phrase probe then touches ONLY the two query terms' postings
    lists — each side is filtered BEFORE the join (predicate on the
    exploded term), so the adjacency equi-join on (doc_id, pos) is
    postings-bounded, never corpus-bounded, exactly how a distributed
    index serves phrase queries at 100 TB. The top-20 is
    TakeOrderedAndProject. The oracle states the same semantics as a
    lead() window over zipped-unnest positions; n-word phrases chain
    n-1 position-shifted joins of the same shape."""
    tk = (_docs(spark, sf_dir)
          .select("doc_id",
                  F.posexplode(_tokens()).alias("pos", "tok")))
    w1 = tk.where(F.col("tok") == "fast").select("doc_id", "pos")
    w2 = (tk.where(F.col("tok") == "table")
          .select("doc_id", (F.col("pos") - 1).alias("pos")))
    return (w1.join(w2, ["doc_id", "pos"])
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
            .orderBy(F.desc("n_hits"), F.asc("doc_id"))
            .limit(20))


# -------------------------------------------------- RAKE keyphrases

RAKE_TOP = 15
_RAKE_STOPS = "', '".join(_STOPWORDS)


@query("text_rake_keywords", sql=f"""
    WITH toks AS (
      SELECT d.doc_id, t.tok, t.pos
      FROM documents d,
           LATERAL (SELECT UNNEST(regexp_split_to_array(d.text,
                      '\\s+')) AS tok,
                    GENERATE_SUBSCRIPTS(regexp_split_to_array(d.text,
                      '\\s+'), 1) AS pos) t
    ), content AS (
      SELECT doc_id, tok, pos,
             pos - ROW_NUMBER() OVER (
                 PARTITION BY doc_id ORDER BY pos) AS grp
      FROM toks WHERE tok NOT IN ('{_RAKE_STOPS}') AND tok <> ''
    ), phrase AS (
      SELECT doc_id, grp,
             STRING_AGG(tok, ' ' ORDER BY pos) AS phrase,
             COUNT(*) AS plen
      FROM content GROUP BY 1, 2
    ), wordstat AS (
      SELECT c.tok, COUNT(*) AS freq, SUM(p.plen) AS deg
      FROM content c
      JOIN phrase p ON p.doc_id = c.doc_id AND p.grp = c.grp
      GROUP BY 1
    ), wscore AS (
      SELECT tok, ROUND(deg * 1.0 / freq, 6) AS ws FROM wordstat
    ), pscore AS (
      SELECT p.phrase,
             ROUND(SUM(w.ws), 4) AS score
      FROM content c
      JOIN phrase p ON p.doc_id = c.doc_id AND p.grp = c.grp
      JOIN wscore w ON w.tok = c.tok
      GROUP BY p.doc_id, p.grp, p.phrase
    )
    SELECT phrase,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           MAX(score) AS score
    FROM pscore
    GROUP BY phrase
    ORDER BY MAX(score) DESC, phrase
    LIMIT {RAKE_TOP}
""")
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate
    phrases are maximal stopword-free token runs (the
    islands-and-gaps trick: pos - row_number over kept tokens),
    word score = degree/frequency where degree sums the lengths of
    every phrase the word appears in, phrase score sums its words'
    scores — the zero-training keyword extractor content pipelines
    run before tagging/routing, and the cheap first pass before any
    neural keyphrase model.

    Plan: posexplode at token grain; the phrase segmentation window
    partitions PER DOCUMENT (bounded by doc length, never global);
    word stats collapse at vocabulary grain, phrase scores at
    phrase-occurrence grain — both map-side-combined count/sum
    shuffles; final top-k is TakeOrderedAndProject on the
    4-dp-rounded score with phrase-text tiebreak. Word scores round
    at 6 dp before the per-phrase sum (<= phrase-length terms) so
    cross-engine sum order can't flip the 4-dp phrase score."""
    from pyspark.sql import Window as W

    toks = (_docs(spark, sf_dir)
            .select("doc_id", F.posexplode(_tokens())
                    .alias("pos", "tok")))
    wdoc = W.partitionBy("doc_id").orderBy("pos")
    content = (toks.filter(~F.col("tok").isin(*_STOPWORDS)
                           & (F.col("tok") != ""))
               .withColumn("grp",
                           F.col("pos") - F.row_number().over(wdoc))
               .persist())
    phrase = (content.groupBy("doc_id", "grp")
              .agg(F.concat_ws(
                  " ", F.transform(
                      F.array_sort(F.collect_list(
                          F.struct("pos", "tok"))),
                      lambda s: s.tok)).alias("phrase"),
                   F.count(F.lit(1)).alias("plen")))
    cp = content.join(phrase, ["doc_id", "grp"])
    wscore = (cp.groupBy("tok")
              .agg(F.round(F.sum("plen") * 1.0 / F.count(F.lit(1)), 6)
                   .alias("ws")))
    pscore = (cp.join(wscore, "tok")
              .groupBy("doc_id", "grp", "phrase")
              .agg(F.round(F.sum("ws"), 4).alias("score")))
    return (pscore.groupBy("phrase")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
                 F.max("score").alias("score"))
            .orderBy(F.desc("score"), "phrase")
            .limit(RAKE_TOP))


# ---------------------------------------------- term burstiness

BURST_TOP = 20
BURST_VMR_HI = 2.0


@query("text_term_burstiness", sql=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(regexp_split_to_array(text, '\\s+')) AS tok
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS f
      FROM toks WHERE tok <> '' GROUP BY 1, 2
    ), nd AS (SELECT COUNT(*) AS d FROM documents),
    term AS (
      SELECT tok, SUM(f) AS cf, COUNT(*) AS df,
             SUM(f * f) AS sf2
      FROM tf GROUP BY 1
    ), scored AS (
      SELECT t.tok, t.cf, t.df,
             ROUND(t.cf * 1.0 / t.df, 6) AS burst_ewf,
             ROUND((t.sf2 * 1.0 / nd.d
                    - (t.cf * 1.0 / nd.d) * (t.cf * 1.0 / nd.d))
                   / (t.cf * 1.0 / nd.d), 6) AS vmr
      FROM term t, nd
    )
    SELECT tok,
           CAST(cf AS BIGINT) AS corpus_freq,
           CAST(df AS BIGINT) AS doc_freq,
           burst_ewf, vmr,
           CASE WHEN vmr > {BURST_VMR_HI} THEN 'bursty'
                ELSE 'uniform' END AS dispersion_class
    FROM scored
    ORDER BY corpus_freq DESC, tok LIMIT {BURST_TOP}
""")
def text_term_burstiness(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """Term burstiness / dispersion profiling (Church-Gale '95):
    for the top corpus terms, E[tf | tf>0] = cf/df (the burst size
    once a term shows up) and the variance-to-mean ratio of per-doc
    counts over ALL documents — Poisson scatter gives VMR ~= 1,
    content words clump (VMR >> 1), function words spread evenly.
    This separates topical terms from glue vocabulary without any
    stopword list — the signal behind keyword weighting, stopword
    induction and template-spam screens (a term bursting identically
    across docs flags boilerplate).

    Plan: token explode -> (doc, term) tf counts (map-side combined,
    the standard postings shuffle) -> vocabulary-grain moment agg
    (cf, df, sum tf² — exact integers); VMR algebra against the
    broadcast doc-count row; top-k via TakeOrderedAndProject.
    Python Counter parity in tests."""
    toks = (_docs(spark, sf_dir)
            .select("doc_id", F.explode(_tokens()).alias("tok"))
            .filter(F.col("tok") != ""))
    tf = (toks.groupBy("doc_id", "tok")
          .agg(F.count(F.lit(1)).alias("f")))
    nd = _docs(spark, sf_dir).agg(F.count(F.lit(1)).alias("d"))
    term = (tf.groupBy("tok")
            .agg(F.sum("f").alias("cf"), F.count(F.lit(1)).alias("df"),
                 F.sum(F.col("f") * F.col("f")).alias("sf2")))
    mean = F.col("cf") * 1.0 / F.col("d")
    vmr = (F.col("sf2") * 1.0 / F.col("d") - mean * mean) / mean
    return (term.crossJoin(F.broadcast(nd))
            .select("tok",
                    F.col("cf").cast("bigint").alias("corpus_freq"),
                    F.col("df").cast("bigint").alias("doc_freq"),
                    F.round(F.col("cf") * 1.0 / F.col("df"), 6)
                    .alias("burst_ewf"),
                    F.round(vmr, 6).alias("vmr"))
            .withColumn("dispersion_class",
                        F.when(F.col("vmr") > BURST_VMR_HI, "bursty")
                        .otherwise("uniform"))
            .orderBy(F.desc("corpus_freq"), "tok")
            .limit(BURST_TOP))


# ---------------------------------------------- Yule's K diversity

@query("text_yule_k", sql="""
    WITH toks AS (
      SELECT source, unnest(regexp_split_to_array(text, '\\s+')) AS w
      FROM documents
    ), tf AS (
      SELECT source, w, COUNT(*) AS m FROM toks GROUP BY 1, 2
    ), vm AS (
      SELECT source, m, COUNT(*) AS v FROM tf GROUP BY 1, 2
    ), agg AS (
      SELECT source,
             SUM(m * v) AS n_tokens,
             SUM(v) AS n_types,
             SUM(m * m * v) AS sum_m2v
      FROM vm GROUP BY 1
    )
    SELECT source,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_types AS BIGINT) AS n_types,
           ROUND(n_types * 1e0 / n_tokens, 6) AS ttr,
           ROUND(1e4 * (sum_m2v - n_tokens)
                 / (n_tokens * 1e0 * n_tokens), 6) AS yule_k
    FROM agg ORDER BY source
""")
def text_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's K lexical-diversity characteristic per source:
    K = 10^4 (sum m^2 V_m - N) / N^2 over the frequency-of-frequency
    spectrum V_m — the length-robust repetitiousness measure
    (unlike raw TTR, K barely moves as a corpus grows), the classic
    authorship/register statistic and a strong template-spam signal
    for corpus triage. Completes the lexical-statistics family next
    to text_zipf_fit (rank law) and text_heaps_law_fit (vocabulary
    growth); raw TTR rides along for contrast.

    Plan: one token explode to the (source, term) hash agg (the
    TF-IDF shuffle shape), then the frequency-of-frequency rollup at
    (source, m) grain and a closed-form row per source — vocabulary
    grain and below after the first pass; everything is exact
    integers until the final divisions."""
    d = _docs(spark, sf_dir)
    tf = (d.select("source", F.explode(_tokens()).alias("w"))
          .groupBy("source", "w")
          .agg(F.count(F.lit(1)).alias("m")))
    vm = (tf.groupBy("source", "m")
          .agg(F.count(F.lit(1)).alias("v")))
    agg = (vm.groupBy("source")
           .agg(F.sum(F.col("m") * F.col("v")).alias("n_tokens"),
                F.sum("v").alias("n_types"),
                F.sum(F.col("m") * F.col("m") * F.col("v"))
                .alias("sum_m2v")))
    n = F.col("n_tokens")
    return (agg.select(
        "source",
        n.cast("bigint").alias("n_tokens"),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.round(F.col("n_types") * F.lit(1.0) / n, 6).alias("ttr"),
        F.round(F.lit(1e4) * (F.col("sum_m2v") - n)
                / (n * F.lit(1.0) * n), 6).alias("yule_k"))
        .orderBy("source"))


# ------------------------------------------------- BM25 ranked search

_BM25_QUERY = ("spark", "hash", "join")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20
_BM25_Q_SQL = ", ".join(f"'{t}'" for t in _BM25_QUERY)


@query("search_bm25_topk", sql=f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w
      FROM documents
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY 1
    ), stats AS (
      SELECT COUNT(*) AS n_docs, AVG(dlen) AS avgdl FROM dl
    ), tf AS (
      SELECT doc_id, w, COUNT(*) AS tf FROM toks
      WHERE w IN ({_BM25_Q_SQL}) GROUP BY 1, 2
    ), df AS (
      SELECT w, COUNT(*) AS df FROM tf GROUP BY 1
    ), scored AS (
      SELECT t.doc_id,
             SUM(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
                 * t.tf * ({_BM25_K1} + 1)
                 / (t.tf + {_BM25_K1}
                    * (1 - {_BM25_B}
                       + {_BM25_B} * l.dlen / s.avgdl))) AS score,
             COUNT(*) AS n_terms
      FROM tf t
      JOIN dl l ON l.doc_id = t.doc_id
      JOIN df d ON d.w = t.w
      CROSS JOIN stats s
      GROUP BY t.doc_id
    )
    SELECT CAST(rnk AS INT) AS rank, doc_id,
           ROUND(score, 6) AS score,
           CAST(n_terms AS INT) AS n_terms_matched
    FROM (SELECT *, ROW_NUMBER() OVER (
              ORDER BY ROUND(score, 6) DESC, doc_id) AS rnk
          FROM scored) AS r
    WHERE rnk <= {_BM25_TOPK}
    ORDER BY rank
""")
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson-Sparck Jones, the Lucene
    `(1 + (N - df + 0.5)/(df + 0.5))` idf form) for the fixed query
    {' '.join(_BM25_QUERY)!r}: per-term tf with k1/b length
    normalization against the corpus average document length, summed
    per document, top-{_BM25_TOPK} by 6dp-rounded score with doc_id
    tie-break (pre-rounded so the cross-engine ordering is exact —
    same discipline as the Hill-tail log terms).

    Scale: the inverted-index shape — only postings for the query's
    terms survive the scan filter (predicate on the exploded token,
    pushable before any shuffle), so the tf frame is
    |query terms| x df grain, NOT corpus grain; doc lengths are one
    map-side-combined count; df and the (n_docs, avgdl) scalar are
    term-grain/1-row broadcasts. The rank window is a top-k over the
    already-aggregated scored frame — at 100 TB swap it for
    TakeOrdered via a LIMIT, which Catalyst already plans here."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.select("doc_id", _tokens().alias("w"))
            .select("doc_id", F.explode("w").alias("w")))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.avg("dlen").alias("avgdl"))
    tf = (toks.where(F.col("w").isin(*_BM25_QUERY))
          .groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf")))
    df = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1)
    norm = (F.col("tf") * (_BM25_K1 + 1)
            / (F.col("tf") + _BM25_K1
               * (1 - _BM25_B + _BM25_B * F.col("dlen") / F.col("avgdl"))))
    scored = (tf.join(dl, "doc_id")
              .join(F.broadcast(df), "w")
              .crossJoin(F.broadcast(stats))
              .groupBy("doc_id")
              .agg(F.sum(idf * norm).alias("score"),
                   F.count(F.lit(1)).alias("n_terms")))
    # top-k FIRST (TakeOrderedAndProject — per-partition heaps, no
    # global sort), THEN rank the k surviving rows (declared
    # rank-after-LIMIT window class, bounded at {_BM25_TOPK} rows)
    top = (scored
           .withColumn("score", F.round("score", 6))
           .orderBy(F.desc("score"), F.asc("doc_id"))
           .limit(_BM25_TOPK))
    rw = W.orderBy(F.desc("score"), F.asc("doc_id"))
    return (top
            .withColumn("rank", F.row_number().over(rw))
            .select(F.col("rank").cast("int").alias("rank"),
                    "doc_id",
                    "score",
                    F.col("n_terms").cast("int")
                    .alias("n_terms_matched"))
            .orderBy("rank"))


# ------------------------------------------------ TextRank keywords

_TR_DAMP = 0.85
_TR_ITERS = 3
_TR_TOPK = 20


def _textrank_oracle_sql() -> str:
    """Unrolled weighted TextRank as chained CTEs (pagerank's oracle
    pattern on the word co-occurrence graph)."""
    steps = []
    for k in range(1, _TR_ITERS + 1):
        steps.append(f"""s{k} AS (
      SELECT e.dst AS word,
             (1e0 - {_TR_DAMP}) + {_TR_DAMP} * SUM(
               e.wt * s.score / d.tot) AS score
      FROM edges e
      JOIN s{k - 1} s ON s.word = e.src
      JOIN wdeg d ON d.word = e.src
      GROUP BY e.dst
    )""")
    chain = ", ".join(steps)
    return f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
      FROM documents
    ), pairs AS (
      SELECT w[i] AS a, w[i + 1] AS b
      FROM (SELECT *, unnest(generate_series(1, len(w) - 1)) AS i
            FROM toks) AS t
      WHERE w[i] <> w[i + 1]
    ), edges AS (
      SELECT src, dst, COUNT(*) AS wt FROM (
        SELECT a AS src, b AS dst FROM pairs
        UNION ALL
        SELECT b AS src, a AS dst FROM pairs
      ) AS u GROUP BY 1, 2
    ), wdeg AS (
      SELECT src AS word, SUM(wt) AS tot FROM edges GROUP BY 1
    ), s0 AS (
      SELECT word, 1e0 AS score FROM wdeg
    ), {chain}
    SELECT CAST(rnk AS INT) AS rank, word,
           ROUND(score, 6) AS textrank
    FROM (SELECT *, ROW_NUMBER() OVER (
              ORDER BY ROUND(score, 6) DESC, word) AS rnk
          FROM s{_TR_ITERS}) AS r
    WHERE rnk <= {_TR_TOPK}
    ORDER BY rank
    """


@query("text_textrank_keywords", sql=_textrank_oracle_sql())
def text_textrank_keywords(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): damped
    PageRank ({_TR_ITERS} unrolled power steps, d = {_TR_DAMP}) on the
    adjacent-word co-occurrence graph, edge weight = corpus
    co-occurrence count, scores seeded at 1.0 — the graph-centrality
    complement to RAKE's stopword-island scoring (a word ranks high
    when its NEIGHBORS rank high, not merely when it is frequent).
    Adjacent duplicate tokens are not self-edges.

    Scale: ONE data-grain stage (the adjacent-pair explode, pairs =
    tokens - 1 per doc, map-side combined into vocabulary^2-bounded
    edge counts); every power step is then an edge-grain join +
    word-grain agg on the BOUNDED vocabulary graph — the pagerank
    superstep dataflow at vocabulary grain. Determinism: per-step
    inbound sums differ across engines only at ~1e-15 relative; 3
    steps then 6-dp rounding absorbs it (graph_pagerank_trade's
    argument), and the final order compares rounded values with a
    word tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("w"))
    pairs = (toks.select(F.explode(F.zip_with(
        F.slice("w", 1, F.size("w") - 1),
        F.slice("w", 2, F.size("w") - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b"))))
        .alias("p"))
        .where(F.col("p.a") != F.col("p.b")))
    edges = (pairs.select(F.col("p.a").alias("src"),
                          F.col("p.b").alias("dst"))
             .unionByName(pairs.select(F.col("p.b").alias("src"),
                                       F.col("p.a").alias("dst")))
             .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("wt"))
             .persist())
    wdeg = (edges.groupBy("src").agg(F.sum("wt").alias("tot"))
            .withColumnRenamed("src", "word"))
    score = wdeg.select("word", F.lit(1.0).alias("score"))
    for _ in range(_TR_ITERS):
        contrib = (edges
                   .join(score.withColumnRenamed("word", "src"), "src")
                   .join(wdeg.withColumnRenamed("word", "src")
                         .withColumnRenamed("tot", "tot"), "src"))
        score = (contrib
                 .groupBy(F.col("dst").alias("word"))
                 .agg((F.lit(1 - _TR_DAMP) + F.lit(_TR_DAMP)
                       * F.sum(F.col("wt") * F.col("score")
                               / F.col("tot"))).alias("score"))
                 # persist: _TR_ITERS fixed, score referenced once per
                 # round — linear plan, supersteps pipeline into the
                 # single consuming action (no per-round blocking job).
                 # Round-13 A/Bs KEEP every round cached: each round's
                 # broadcast build re-executes the uncached prefix, so
                 # no-persist ran 1.55 s vs 0.77 s and unpersist-
                 # behind-the-loop paid the cacheless columnar rebuild
                 # (+0.11 s). Long-lived callers reclaim the cached
                 # frames via clearCache (engine.py module doc).
                 .persist())
    top = (score.select("word", F.round("score", 6).alias("textrank"))
           .orderBy(F.desc("textrank"), "word")
           .limit(_TR_TOPK))
    rw = W.orderBy(F.desc("textrank"), "word")
    return (top.withColumn("rank", F.row_number().over(rw))
            .select(F.col("rank").cast("int").alias("rank"),
                    "word", "textrank")
            .orderBy("rank"))


# ------------------------------------- Dunning log-likelihood ratio

LLR_MIN_COUNT = 5   # min bigram support before scoring
LLR_TOP = 20


@query("text_llr_collocations", sql=f"""
    WITH toks AS (
      SELECT regexp_split_to_array(text, '\\s+') AS w FROM documents
    ), big AS (
      SELECT z[1] AS w1, z[2] AS w2, COUNT(*) AS c
      FROM (SELECT unnest(list_zip(w[1:len(w) - 1], w[2:len(w)])) AS z
            FROM toks WHERE len(w) >= 2)
      GROUP BY 1, 2
    ), firsts AS (
      SELECT w1, SUM(c) AS r1 FROM big GROUP BY 1
    ), seconds AS (
      SELECT w2, SUM(c) AS c1 FROM big GROUP BY 1
    ), tot AS (SELECT SUM(c) AS n FROM big),
    cells AS (
      SELECT b.w1, b.w2, b.c,
             b.c AS k11, f.r1 - b.c AS k12, s.c1 - b.c AS k21,
             t.n - f.r1 - s.c1 + b.c AS k22,
             f.r1 AS r1, t.n - f.r1 AS r2,
             s.c1 AS c1, t.n - s.c1 AS c2, t.n AS n
      FROM big b
      JOIN firsts f ON f.w1 = b.w1
      JOIN seconds s ON s.w2 = b.w2
      CROSS JOIN tot t
      WHERE b.c >= {LLR_MIN_COUNT}
    ), scored AS (
      SELECT w1, w2, c AS n_pair,
             ROUND(2 * (
               (CASE WHEN k11 > 0 THEN k11 * LN(k11 * 1e0) ELSE 0 END)
             + (CASE WHEN k12 > 0 THEN k12 * LN(k12 * 1e0) ELSE 0 END)
             + (CASE WHEN k21 > 0 THEN k21 * LN(k21 * 1e0) ELSE 0 END)
             + (CASE WHEN k22 > 0 THEN k22 * LN(k22 * 1e0) ELSE 0 END)
             - r1 * LN(r1 * 1e0) - r2 * LN(r2 * 1e0)
             - c1 * LN(c1 * 1e0) - c2 * LN(c2 * 1e0)
             + n * LN(n * 1e0)), 4) AS llr
      FROM cells
    )
    SELECT * FROM (
      SELECT w1, w2, n_pair, llr,
             CAST(ROW_NUMBER() OVER (ORDER BY llr DESC, w1, w2)
               AS INT) AS rank
      FROM scored)
    WHERE rank <= {LLR_TOP} ORDER BY rank
""")
def text_llr_collocations(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Dunning log-likelihood-ratio collocations: the top-20 adjacent
    bigrams by the G^2 statistic of the 2x2 (first-token = w1) x
    (second-token = w2) contingency over all bigram slots — the
    collocation test of record for SPARSE counts (Dunning 1993),
    where text_pmi_bigrams' PMI over-rewards rare pairs. Scored in
    the entropy form G^2 = 2(sum k ln k - sum row ln row - sum col
    ln col + N ln N) with 0 ln 0 = 0, which keeps every input an
    exact integer and the whole statistic one closed form of them.
    Marginals come from the UNPRUNED bigram table (position-aware:
    row = bigrams starting with w1, column = bigrams ending with w2 —
    not unigram counts, which double-count edge slots); the
    min-support floor prunes candidates only AFTER marginals exist.

    Scale: one narrow bigram generate from once-materialized token
    arrays (the HOF-CSE discipline), THREE map-side-combined hash
    aggs sharing the bigram frame (pairs, first-marginals,
    second-marginals), token-keyed marginal joins (AQE broadcasts
    when a vocabulary side is small), and the 1-row total broadcast;
    top-k is orderBy+limit. 6->4 dp rounding: G^2 sums ~8 n ln n
    terms, so 4 dp absorbs the wider ulp while staying far from any
    ranking tie."""
    toks = (_docs(spark, sf_dir)
            .select("doc_id", _tokens().alias("w")))
    # zip_with over slices, NOT element_at(w, i) in the lambda:
    # InferFiltersFromGenerate clones this generator into a Filter
    # and pushdown inlines w = split(text) into the clone — an
    # indexing lambda then re-splits the document PER ELEMENT,
    # O(tokens^2) per doc (the round-10 bloom-decon root cause).
    big = (toks.filter(F.size("w") >= 2)
           .select(F.explode(F.expr(
               "zip_with(slice(w, 1, size(w) - 1), "
               "slice(w, 2, size(w) - 1), "
               "(a, b) -> struct(a AS w1, b AS w2))"
           )).alias("bg"))
           .select("bg.*")
           .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
           .persist())
    firsts = big.groupBy("w1").agg(F.sum("c").alias("r1"))
    seconds = big.groupBy("w2").agg(F.sum("c").alias("c1"))
    tot = big.agg(F.sum("c").alias("n"))

    def xlx(col):
        return F.when(col > 0, col * F.log(col * F.lit(1.0))) \
                .otherwise(F.lit(0.0))

    cells = (big.filter(F.col("c") >= LLR_MIN_COUNT)
             .join(firsts, "w1").join(seconds, "w2")
             .crossJoin(F.broadcast(tot))
             .withColumn("k11", F.col("c"))
             .withColumn("k12", F.col("r1") - F.col("c"))
             .withColumn("k21", F.col("c1") - F.col("c"))
             .withColumn("k22", F.col("n") - F.col("r1")
                         - F.col("c1") + F.col("c"))
             .withColumn("r2", F.col("n") - F.col("r1"))
             .withColumn("c2", F.col("n") - F.col("c1")))
    llr = F.round(2 * (
        xlx(F.col("k11")) + xlx(F.col("k12"))
        + xlx(F.col("k21")) + xlx(F.col("k22"))
        - F.col("r1") * F.log(F.col("r1") * F.lit(1.0))
        - F.col("r2") * F.log(F.col("r2") * F.lit(1.0))
        - F.col("c1") * F.log(F.col("c1") * F.lit(1.0))
        - F.col("c2") * F.log(F.col("c2") * F.lit(1.0))
        + F.col("n") * F.log(F.col("n") * F.lit(1.0))), 4)
    scored = cells.select("w1", "w2", F.col("c").alias("n_pair"),
                          llr.alias("llr"))
    top = scored.orderBy(F.desc("llr"), "w1", "w2").limit(LLR_TOP)
    w = W.orderBy(F.desc("llr"), "w1", "w2")
    return (top.withColumn("rank", F.row_number().over(w))
            .orderBy("rank"))
