"""Training-data pipeline operators (SURVEY.md §2.3): the corpus-prep
steps an LLM pretraining pipeline runs after dedup/quality filtering —
benchmark decontamination, deterministic shard shuffling, context-window
sequence packing, PII-style regex redaction, and domain-mixture weights.

Reference parity: the reference (`/root/reference/main.go`) is a CDC
relay with no corpus tooling; these are the mandated north-star
extensions (BASELINE.json), built Spark-first.

Scale posture (100 TB):
- decontamination broadcasts the benchmark shingle set (eval suites are
  MBs even when the corpus is TBs) — corpus side is one explode + hash
  join + partial-agg shuffle on doc_id.
- shard assignment / packing shuffle ONCE on the shard key; all ordering
  is per-shard (no global sort). Shard count is a constant here (driver
  fixture) — at scale it is a parameter sized so a shard fits a worker.
- redaction and mixture weights are narrow scans + tiny aggregations.
All hot-path logic is built-in JVM expressions (xxhash64 shingles, md5
ordering keys, regexp_*) — no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mongo_cdc_spark.io import load_table
from mongo_cdc_spark.operators import make_registry
from mongo_cdc_spark.operators._twophase import with_global_order
from mongo_cdc_spark.operators.dedup import _tokens, shingle_sets

QUERIES, ORACLE, query = make_registry()

# Benchmark membership: every 19th doc_id is the held-out "eval set" we
# decontaminate against (deterministic, ~5% of the corpus).
_BENCH_MOD = 19
# A corpus doc sharing >= this fraction of its 3-gram shingles with the
# benchmark union is flagged contaminated (the usual n-gram-overlap rule,
# e.g. GPT-3 appendix C / PaLM's 13-gram variant, shrunk to the fixture's
# short docs).
_CONTAM_FRAC = 0.5


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# Portable deterministic permutation key: md5 of the decimal doc_id.
# Spark and DuckDB agree byte-for-byte, so shard / order / packing are
# bit-identical in the oracle replay.
def _perm_key():
    return F.md5(F.col("doc_id").cast("string").cast("binary"))


def _shard_of(key, n_shards: int):
    return (F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards)


_PERM_SQL = "md5(CAST(doc_id AS VARCHAR))"
_SHARD_SQL = "(('0x' || substr({k}, 1, 8))::BIGINT % {n})"


@query("train_decontaminate", sql=f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w FROM documents
    ), sh AS (
      SELECT doc_id,
             list(DISTINCT w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS s
      FROM (SELECT *, unnest(generate_series(1, len(w) - 2)) AS i
            FROM toks)
      GROUP BY doc_id
    ), bench AS (
      SELECT DISTINCT unnest(s) AS h FROM sh WHERE doc_id % {_BENCH_MOD} = 0
    ), corpus AS (
      SELECT doc_id, len(s) AS n_shingles, unnest(s) AS h
      FROM sh WHERE doc_id % {_BENCH_MOD} <> 0
    )
    SELECT doc_id,
           CAST(n_shingles AS INT) AS n_shingles,
           CAST(COUNT(*) AS INT) AS n_overlap,
           ROUND(COUNT(*) * 1.0 / n_shingles, 4) AS overlap_frac,
           COUNT(*) * 1.0 / n_shingles >= {_CONTAM_FRAC} AS contaminated
    FROM corpus JOIN bench USING (h)
    GROUP BY doc_id, n_shingles
    ORDER BY doc_id
""")
def train_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs whose 3-gram shingle
    sets overlap the held-out eval set's shingle union.

    The benchmark side is tiny by construction (eval suites), so its
    distinct shingle union is BROADCAST; the corpus side explodes its
    shingles, hash-joins the broadcast set, and partial-aggregates the
    overlap count per doc — one shuffle, map-side combined.

    The shingle sets come from dedup.shingle_sets — the PERSISTED shared
    frame — not a local projection: exploding an unpersisted two-step
    shingle projection lets the Generate pushdown collapse the
    projections and re-inline the token-hash transform per lambda
    reference (measured 21 s vs 2 s at sf0.1 — the cache is the barrier
    codegen CSE won't provide; see dedup._shingles_of_hashes).
    """
    sh = shingle_sets(spark, sf_dir)
    bench = (
        sh.where(F.col("doc_id") % _BENCH_MOD == 0)
        .select(F.explode("sh").alias("h"))
        .distinct()
    )
    corpus = (
        sh.where(F.col("doc_id") % _BENCH_MOD != 0)
        .select("doc_id", F.col("n_sh").alias("n_shingles"),
                F.explode("sh").alias("h"))
    )
    overlap_frac = F.col("n_overlap") * F.lit(1.0) / F.col("n_shingles")
    return (
        corpus.join(F.broadcast(bench), "h")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).cast("int").alias("n_overlap"))
        .select(
            "doc_id", F.col("n_shingles").cast("int").alias("n_shingles"),
            "n_overlap",
            F.round(overlap_frac, 4).alias("overlap_frac"),
            (overlap_frac >= _CONTAM_FRAC).alias("contaminated"))
        .orderBy("doc_id")
    )


_N_SHARDS = 16


@query("train_shard_assign", sql=f"""
    WITH keyed AS (
      SELECT doc_id, {_PERM_SQL} AS k,
             {_SHARD_SQL.format(k=_PERM_SQL, n=_N_SHARDS)} AS shard
      FROM documents
    )
    SELECT doc_id, CAST(shard AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k) AS INT)
             AS pos
    FROM keyed
    ORDER BY shard, pos
""")
def train_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding for training dataloaders:
    permutation key = md5(doc_id), shard = key prefix mod N, position =
    rank within shard by key. Reproducible across runs and engines (the
    oracle replays it bit-for-bit). One shuffle on the shard key; the
    within-shard sort is bounded by shard size (N is a parameter sized
    so a shard fits a worker at scale)."""
    k = _perm_key()
    keyed = _docs(spark, sf_dir).select(
        "doc_id", k.alias("k"), _shard_of(k, _N_SHARDS).cast("int").alias("shard"))
    return (
        keyed.select(
            "doc_id", "shard",
            F.row_number().over(
                W.partitionBy("shard").orderBy("k")).alias("pos"))
        .orderBy("shard", "pos")
    )


_PACK_BUDGET = 256  # tokens per training sequence
_PACK_SHARDS = 8


@query("train_sequence_pack", sql=f"""
    WITH keyed AS (
      SELECT doc_id, {_PERM_SQL} AS k,
             {_SHARD_SQL.format(k=_PERM_SQL, n=_PACK_SHARDS)} AS shard,
             len(regexp_split_to_array(text, '\\s+')) AS n_tok
      FROM documents
    ), packed AS (
      SELECT doc_id, shard, n_tok,
             SUM(n_tok) OVER (PARTITION BY shard ORDER BY k
                              ROWS UNBOUNDED PRECEDING) - n_tok AS start_off
      FROM keyed
    )
    SELECT doc_id, CAST(shard AS INT) AS shard, CAST(n_tok AS INT) AS n_tok,
           CAST(start_off // {_PACK_BUDGET} AS INT) AS seq_in_shard,
           CAST(start_off % {_PACK_BUDGET} AS INT) AS seq_off,
           (start_off % {_PACK_BUDGET}) + n_tok > {_PACK_BUDGET}
             AS spans_boundary
    FROM packed
    ORDER BY shard, start_off
""")
def train_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window sequence packing (concat-then-chunk): within each
    shard, documents are concatenated in permutation order and chunked
    into fixed {budget}-token training sequences; each doc reports its
    sequence index, offset, and whether it spans a chunk boundary.

    Packing is PER SHARD — the cumulative sum is a within-shard window,
    never a global sort, so the plan is one shuffle on the shard key
    regardless of corpus size (shard count is the scale knob).
    """
    k = _perm_key()
    keyed = _docs(spark, sf_dir).select(
        "doc_id", k.alias("k"),
        _shard_of(k, _PACK_SHARDS).cast("int").alias("shard"),
        F.size(_tokens()).alias("n_tok"))
    win = (W.partitionBy("shard").orderBy("k")
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    packed = keyed.withColumn(
        "start_off", F.sum("n_tok").over(win) - F.col("n_tok"))
    return (
        packed.select(
            "doc_id", "shard", F.col("n_tok").cast("int").alias("n_tok"),
            F.floor(F.col("start_off") / _PACK_BUDGET).cast("int")
             .alias("seq_in_shard"),
            (F.col("start_off") % _PACK_BUDGET).cast("int").alias("seq_off"),
            ((F.col("start_off") % _PACK_BUDGET) + F.col("n_tok")
             > _PACK_BUDGET).alias("spans_boundary"))
        .orderBy("shard", "seq_in_shard", "seq_off")
    )


# PII-style redaction pattern. The fixture corpus is a synthetic word
# soup with no real PII, so the "sensitive term" list stands in for the
# usual email/phone/SSN patterns — the operator (global regex mask +
# audit counts, same RE dialect subset in Java regex and RE2) is what's
# under test, and the pattern is a parameter.
_REDACT_PATTERN = r"\b(key|hash|value)\b"
_REDACT_TOKEN = "[MASK]"


@query("train_regex_redact", sql=f"""
    WITH r AS (
      SELECT source,
             len(regexp_split_to_array(text, '\\s+')) AS n_tok,
             len(regexp_extract_all(text, '{_REDACT_PATTERN}')) AS n_hit,
             length(regexp_replace(text, '{_REDACT_PATTERN}',
                                   '{_REDACT_TOKEN}', 'g'))
               - length(text) AS len_delta
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_hit) AS BIGINT) AS n_masked,
           ROUND(AVG(n_hit * 1.0 / n_tok), 4) AS avg_mask_ratio,
           ROUND(AVG(len_delta), 4) AS avg_len_delta
    FROM r
    GROUP BY source
    ORDER BY source
""")
def train_regex_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style regex redaction with audit counts: globally mask a
    sensitive-pattern set and report per-source mask counts, mask ratio,
    and length drift. Pure JVM regexp_* narrow scan + tiny aggregation;
    the pattern set is configurable (here a fixture-vocabulary stand-in
    for email/phone/ID patterns — see module docstring)."""
    n_tok = F.size(_tokens())
    n_hit = F.size(F.regexp_extract_all("text", F.lit(_REDACT_PATTERN), 0))
    len_delta = (F.length(F.regexp_replace("text", _REDACT_PATTERN,
                                           _REDACT_TOKEN))
                 - F.length("text"))
    return (
        _docs(spark, sf_dir)
        .select("source", n_tok.alias("n_tok"), n_hit.alias("n_hit"),
                len_delta.alias("len_delta"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_hit").alias("n_masked"),
             F.round(F.avg(F.col("n_hit") * F.lit(1.0) / F.col("n_tok")), 4)
              .alias("avg_mask_ratio"),
             F.round(F.avg("len_delta"), 4).alias("avg_len_delta"))
        .orderBy("source")
    )


@query("train_mixture_weights", sql="""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_docs,
             SUM(len(regexp_split_to_array(text, '\\s+'))) AS n_tokens
      FROM documents GROUP BY lang
    )
    SELECT lang, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(n_docs * 1.0 / SUM(n_docs) OVER (), 4) AS actual_share,
           ROUND((1.0 / COUNT(*) OVER ())
                 / (n_docs * 1.0 / SUM(n_docs) OVER ()), 4) AS weight
    FROM counts
    ORDER BY lang
""")
def train_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per-language doc/token counts, the
    corpus's actual share, and the up/down-sampling weight that flattens
    the mixture to uniform (target_share / actual_share) — the standard
    input to a mixture-balanced dataloader. One tiny aggregation; the
    window runs over |langs| rows on the driver-side result."""
    counts = (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(F.size(_tokens())).alias("n_tokens"))
    )
    total = W.partitionBy()
    share = F.col("n_docs") * F.lit(1.0) / F.sum("n_docs").over(total)
    target = F.lit(1.0) / F.count(F.lit(1)).over(total)
    return (
        counts.select(
            "lang", "n_docs", "n_tokens",
            F.round(share, 4).alias("actual_share"),
            F.round(target / share, 4).alias("weight"))
        .orderBy("lang")
    )


# Composite quality filter (C4/Gopher-style): per-document signals plus
# a first-failing-rule verdict. Thresholds are fixture-calibrated so the
# filter genuinely splits the corpus (each rule fires on real rows);
# in production they are the usual knobs (Gopher table A1).
_QF_MIN_TOK = 20
_QF_MAX_TOK = 90
_QF_WLEN_LO = 3.8
_QF_WLEN_HI = 5.2
# fixture-vocabulary stand-in for a natural-language stopword list (the
# corpus is a synthetic word soup; see train_regex_redact's note)
_QF_STOP = ("value", "row", "part", "a")
_QF_MIN_STOP_FRAC = 0.02

_QF_STOP_SQL = ", ".join(f"'{s}'" for s in _QF_STOP)


@query("train_quality_filter", sql=f"""
    WITH sig AS (
      SELECT doc_id,
             len(w) AS n_tok,
             ROUND(list_sum(list_transform(w, x -> length(x))) * 1.0
                   / len(w), 4) AS mean_wlen,
             ROUND(len(list_filter(w, x -> x IN ({_QF_STOP_SQL}))) * 1.0
                   / len(w), 4) AS stop_frac
      FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
            FROM documents)
    )
    SELECT doc_id, CAST(n_tok AS INT) AS n_tok, mean_wlen, stop_frac,
           CASE WHEN n_tok < {_QF_MIN_TOK} THEN 'too_short'
                WHEN n_tok > {_QF_MAX_TOK} THEN 'too_long'
                WHEN mean_wlen < {_QF_WLEN_LO}
                  OR mean_wlen > {_QF_WLEN_HI} THEN 'word_len'
                WHEN stop_frac < {_QF_MIN_STOP_FRAC} THEN 'low_stopword'
           END AS drop_reason,
           CASE WHEN n_tok < {_QF_MIN_TOK} THEN FALSE
                WHEN n_tok > {_QF_MAX_TOK} THEN FALSE
                WHEN mean_wlen < {_QF_WLEN_LO}
                  OR mean_wlen > {_QF_WLEN_HI} THEN FALSE
                WHEN stop_frac < {_QF_MIN_STOP_FRAC} THEN FALSE
                ELSE TRUE END AS keep
    FROM sig
    ORDER BY doc_id
""")
def train_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality filter (C4/Gopher-style): token count,
    mean word length, and stopword-fraction gates, reported per document
    with the FIRST failing rule as drop_reason (NULL = kept).

    Narrow scan, zero shuffles: every signal is one fold over the token
    array (built-in higher-order functions, JVM-side), so the filter
    runs at scan speed and its verdict column is available to downstream
    keep-list anti-joins without materializing a second pass.

    The token array — and then the raw counts read by more than one
    ratio — are materialized as their own projections before the
    ratio arithmetic (HOF-CSE discipline: codegen subexpression
    elimination does not reach inside higher-order-function lambdas,
    so the previous inlined form re-split the document ~5x per row;
    same bug class as the text_quality_scores regression).
    """
    toks = (_docs(spark, sf_dir)
            .select("doc_id", _tokens().alias("w"))
            .select(
                "doc_id", F.size("w").alias("n_tok"),
                F.aggregate("w", F.lit(0).cast("long"),
                            lambda acc, x: acc + F.length(x)).alias("chars"),
                F.size(F.filter("w", lambda x: x.isin(*_QF_STOP)))
                .alias("n_stop")))
    sig = toks.select(
        "doc_id", F.col("n_tok").cast("int").alias("n_tok"),
        F.round(F.col("chars") * F.lit(1.0) / F.col("n_tok"), 4)
         .alias("mean_wlen"),
        F.round(F.col("n_stop") * F.lit(1.0) / F.col("n_tok"), 4)
         .alias("stop_frac"))
    reason = (
        F.when(F.col("n_tok") < _QF_MIN_TOK, "too_short")
        .when(F.col("n_tok") > _QF_MAX_TOK, "too_long")
        .when((F.col("mean_wlen") < _QF_WLEN_LO)
              | (F.col("mean_wlen") > _QF_WLEN_HI), "word_len")
        .when(F.col("stop_frac") < _QF_MIN_STOP_FRAC, "low_stopword")
    )
    return (
        sig.withColumn("drop_reason", reason)
        .withColumn("keep", F.col("drop_reason").isNull())
        .orderBy("doc_id")
    )


# Token-budget selection: keep documents per language, in deterministic
# permutation order, until half the language's tokens are consumed.
_BUDGET_FRAC = 0.5


@query("train_token_budget", sql=f"""
    WITH keyed AS (
      SELECT doc_id, lang, {_PERM_SQL} AS k,
             len(regexp_split_to_array(text, '\\s+')) AS n_tok
      FROM documents
    ), cum AS (
      SELECT doc_id, lang, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang ORDER BY k
                              ROWS UNBOUNDED PRECEDING) AS cum_tok,
             CAST(ceil(SUM(n_tok) OVER (PARTITION BY lang)
                       * {_BUDGET_FRAC}) AS BIGINT) AS budget
      FROM keyed
    )
    SELECT lang, doc_id, CAST(n_tok AS INT) AS n_tok,
           CAST(cum_tok AS BIGINT) AS cum_tok
    FROM cum WHERE cum_tok <= budget
    ORDER BY lang, cum_tok
""")
def train_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain token-budget selection: walk each language's documents
    in deterministic md5-permutation order and keep them until the
    domain's token budget ({_BUDGET_FRAC:.0%} of its total) is spent —
    the downsampling half of mixture balancing, reproducible across
    runs and engines.

    The prefix sum is a per-domain window. On the fixture a domain fits
    one partition; at 100 TB a hot domain would not — the scale
    formulation is the standard two-pass distributed prefix sum
    (range-partition within domain by the permutation key, aggregate
    per-range partials, broadcast the tiny per-range offset table, add)
    which keeps the same deterministic semantics with no single-machine
    sort. The budget itself is one broadcast scalar per domain either
    way.
    """
    k = _perm_key()
    keyed = _docs(spark, sf_dir).select(
        "doc_id", "lang", k.alias("k"), F.size(_tokens()).alias("n_tok"))
    cum_win = (W.partitionBy("lang").orderBy("k")
               .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = keyed.select(
        "lang", "doc_id", F.col("n_tok").cast("int").alias("n_tok"),
        F.sum("n_tok").over(cum_win).alias("cum_tok"),
        F.ceil(F.sum("n_tok").over(W.partitionBy("lang")) * _BUDGET_FRAC)
         .alias("budget"))
    return (
        cum.filter(F.col("cum_tok") <= F.col("budget"))
        .select("lang", "doc_id", "n_tok", "cum_tok")
        .orderBy("lang", "cum_tok")
    )


# Curriculum: 4 phases, easy -> hard. "Difficulty" is the standard cheap
# proxy (length x lexical diversity); within a phase the order is the
# deterministic md5 permutation so dataloader order is reproducible.
_CURR_PHASES = 4


@query("train_curriculum_order", sql=f"""
    WITH scored AS (
      SELECT doc_id, {_PERM_SQL} AS k,
             len(regexp_split_to_array(text, '\\s+')) AS n_tok,
             len(list_distinct(regexp_split_to_array(text, '\\s+'))) * 1.0
               / len(regexp_split_to_array(text, '\\s+')) AS ttr
      FROM documents
    ), ranked AS (
      SELECT doc_id, n_tok,
             ROUND(n_tok * ttr, 4) AS difficulty, k
      FROM scored
    ), phased AS (
      SELECT doc_id, CAST(n_tok AS INT) AS n_tok, difficulty,
             CAST(ntile({_CURR_PHASES}) OVER (
               ORDER BY difficulty, doc_id) AS INT) AS phase, k
      FROM ranked
    )
    SELECT doc_id, n_tok, difficulty, phase,
           CAST(ROW_NUMBER() OVER (PARTITION BY phase ORDER BY k, doc_id)
                AS INT) AS order_in_phase
    FROM phased
    ORDER BY phase, order_in_phase
""")
def train_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: rank documents by a difficulty proxy
    (token count x type/token ratio — long, lexically diverse docs are
    'hard'), split into {_CURR_PHASES} curriculum phases with ntile,
    and fix a deterministic md5-permutation order within each phase —
    the reproducible easy-to-hard dataloader schedule.

    Scale: difficulty is a narrow projection; the phase cut is the
    two-phase global rank (`_twophase.with_global_order`):
    repartitionByRange on (difficulty, doc_id), per-range-partition
    row_number, broadcast partition offsets — then the ANSI-ntile
    bucket arithmetic (first n%P buckets get ceil(n/P) rows) applied
    to the exact rank against a broadcast row count. Bit-identical to
    a global ntile window with NO single-task sort; the within-phase
    window shuffles on the {_CURR_PHASES}-value phase key.
    Deterministic tie-breaks on doc_id everywhere, so the schedule is
    bit-stable across engines and runs.
    """
    toks = _tokens()
    scored = _docs(spark, sf_dir).select(
        "doc_id", _perm_key().alias("k"), toks.alias("w"))
    scored = scored.select(
        "doc_id", "k", F.size("w").cast("int").alias("n_tok"),
        (F.size(F.array_distinct("w")) * F.lit(1.0) / F.size("w"))
        .alias("ttr"))
    # persisted: the row count and the two-phase rank both read the
    # difficulty frame — without the shared cache each re-runs
    # tokenization
    ranked = scored.select(
        "doc_id", "k", "n_tok",
        F.round(F.col("n_tok") * F.col("ttr"), 4).alias("difficulty")) \
        .persist()
    pos = with_global_order(ranked,
                            [F.asc("difficulty"), F.asc("doc_id")],
                            rank_col="g")
    n_docs = ranked.agg(F.count(F.lit(1)).alias("n"))
    # ANSI ntile(P) over n rows: q = n div P, r = n mod P; buckets
    # 1..r hold q+1 rows, buckets r+1..P hold q (ceil(x/0) is never
    # evaluated: when n < P, r = n and every rank takes the first arm)
    q = F.floor(F.col("n") / _CURR_PHASES)
    r = F.col("n") % _CURR_PHASES
    g = F.col("g")
    phased = (pos.crossJoin(F.broadcast(n_docs))
              .withColumn("phase",
                          F.when(g <= (q + 1) * r,
                                 F.ceil(g / (q + 1)))
                          .otherwise(r + F.ceil((g - (q + 1) * r) / q))
                          .cast("int"))
              .drop("g", "n"))
    return (
        phased.withColumn(
            "order_in_phase",
            F.row_number().over(
                W.partitionBy("phase").orderBy("k", "doc_id")))
        .select("doc_id", "n_tok", "difficulty", "phase", "order_in_phase")
        .orderBy("phase", "order_in_phase")
    )


@query("train_dataset_card", sql="""
    WITH base AS (
      SELECT source, lang,
             len(regexp_split_to_array(text, '\\s+')) AS n_tok,
             md5(text) AS fp,
             regexp_split_to_array(text, '\\s+') AS w
      FROM documents
    ), card AS (
      SELECT source, lang,
             COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
             CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_exact_dup,
             ROUND(quantile_cont(n_tok, 0.5), 4) AS med_tokens
      FROM base GROUP BY source, lang
    ), voc AS (
      SELECT source, lang, COUNT(DISTINCT t.tok) AS n_vocab
      FROM base, unnest(w) AS t(tok)
      GROUP BY source, lang
    )
    SELECT c.source, c.lang, n_docs, total_tokens, n_vocab,
           n_exact_dup, med_tokens
    FROM card c JOIN voc v ON c.source = v.source AND c.lang = v.lang
    ORDER BY c.source, c.lang
""")
def train_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card: the per-(source, lang) release-report numbers every
    curated training corpus ships with — document and token volume,
    vocabulary size, exact-duplicate count, and median document length.

    Three SEPARATE small aggregations joined on the (source, lang) key
    instead of one: mixing COUNT(DISTINCT fp) with an exact percentile
    in a single agg triggers Spark's distinct-rewrite Expand, which
    drags the percentile state through a per-distinct-key PartialMerge
    (the 151 s -> 3 s pathology the round-3 sweep caught in
    agg_approx_sketches). Each agg here is map-side partial-combined
    and shuffles only (source, lang) keyed rows; the vocabulary agg
    shuffles (source, lang, token) once — the same per-token hash
    shuffle the TF-IDF query already pays. Joins are tiny-key
    (|sources| x |langs| rows) and AQE broadcasts them.
    """
    from mongo_cdc_spark.operators._twophase import exact_quantiles

    base = (_docs(spark, sf_dir)
            .select("source", "lang", "doc_id",
                    F.md5("text").alias("fp"),
                    _tokens().alias("w"))
            .select("source", "lang", "doc_id", "fp", "w",
                    F.size("w").alias("n_tok")))
    # median doc length via the grouped two-phase exact quantile —
    # never the exact-percentile aggregate whose merged buffer lands
    # each group's whole length column on one task:
    med = exact_quantiles(base, "n_tok", {"med": 0.5},
                          ["doc_id"], ["source", "lang"])
    card = (base.groupBy("source", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").cast("bigint").alias("total_tokens"))
            .join(F.broadcast(med), ["source", "lang"])
            .withColumn("med_tokens", F.round(F.col("med"), 4))
            .drop("med"))
    dups = (base.groupBy("source", "lang")
            .agg((F.count(F.lit(1)) - F.count_distinct("fp"))
                 .cast("bigint").alias("n_exact_dup")))
    voc = (base.select("source", "lang", F.explode("w").alias("tok"))
           .groupBy("source", "lang")
           .agg(F.count_distinct("tok").alias("n_vocab")))
    return (
        card.join(dups, ["source", "lang"]).join(voc, ["source", "lang"])
        .select("source", "lang", "n_docs", "total_tokens", "n_vocab",
                "n_exact_dup", "med_tokens")
        .orderBy("source", "lang")
    )


_WS_K = 10  # weighted sample size per language


@query("train_weighted_sample", sql=f"""
    WITH keyed AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(text, '\\s+')) AS n_tok,
             (('0x' || substr({_PERM_SQL}, 1, 8))::BIGINT + 0.5)
               / 4294967296.0 AS u
      FROM documents
    ), scored AS (
      SELECT doc_id, lang, n_tok,
             ROUND(ln(u) / n_tok, 6) AS es_key
      FROM keyed
    ), ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY lang
                ORDER BY es_key DESC, doc_id) AS INT) AS rank
      FROM scored
    )
    SELECT lang, doc_id, CAST(n_tok AS INT) AS n_tok, es_key, rank
    FROM ranked WHERE rank <= {_WS_K}
    ORDER BY lang, rank
""")
def train_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-proportional weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis reservoir keys): each document draws a
    deterministic uniform u from its md5 permutation key and is ranked
    by ln(u)/n_tok; the top-k per language IS a weighted sample where
    P(selection) ∝ token count. This is the one-pass mechanism that
    realizes `train_mixture_weights`' target proportions: sampling
    shards by token mass, not doc count, without materializing repeats.

    Scale: one narrow projection computes the key (md5 + ln, all
    JVM built-ins); the ONLY shuffle is the per-language top-k window,
    which WindowGroupLimit collapses to per-partition heaps carrying at
    most k rows per (partition, language) — a true distributed
    reservoir: O(k·|langs|) memory regardless of corpus size.

    Determinism: u is an exact dyadic rational from the hash prefix
    (identical in both engines); ln(u)/n_tok may differ in the last ulp
    between libm implementations, so the SELECTION key is rounded to
    6 dp on both sides with doc_id tie-break — the established
    rounded-sort-key convention (see knn_ivfpq_search)."""
    u = ((F.conv(F.substring(_perm_key(), 1, 8), 16, 10).cast("long")
          + F.lit(0.5)) / F.lit(4294967296.0))
    keyed = (_docs(spark, sf_dir)
             .select("doc_id", "lang", _tokens().alias("w"), u.alias("u"))
             .select("doc_id", "lang", F.size("w").alias("n_tok"), "u"))
    scored = keyed.select(
        "lang", "doc_id", F.col("n_tok").cast("int").alias("n_tok"),
        F.round(F.log("u") / F.col("n_tok"), 6).alias("es_key"))
    return (
        scored.withColumn(
            "rank", F.row_number().over(
                W.partitionBy("lang").orderBy(F.desc("es_key"),
                                              F.asc("doc_id"))))
        .filter(F.col("rank") <= _WS_K)
        .select("lang", "doc_id", "n_tok", "es_key", "rank")
        .orderBy("lang", "rank")
    )


@query("train_quality_calibrate", sql=r"""
    WITH scored AS (
      SELECT source, doc_id,
             len(regexp_split_to_array(text, '\s+')) AS n_tok,
             len(list_filter(regexp_split_to_array(text, '\s+'),
                             x -> x IN ('the', 'a', 'of', 'and'))) AS n_stop
      FROM documents
    ), q AS (
      SELECT source, doc_id,
             ROUND(0.6 * (n_stop * 1.0 / n_tok)
                   + 0.4 * LEAST(n_tok / 100.0, 1.0), 6) AS raw_q
      FROM scored
    ), cal AS (
      SELECT source, doc_id, raw_q,
             ROUND(percent_rank() OVER (
                 PARTITION BY source ORDER BY raw_q, doc_id), 6) AS cal_q,
             CAST(ntile(10) OVER (
                 PARTITION BY source ORDER BY raw_q, doc_id) AS INT)
                 AS decile
      FROM q
    )
    SELECT source, decile, COUNT(*) AS n_docs,
           MIN(raw_q) AS q_min, MAX(raw_q) AS q_max,
           MIN(cal_q) AS cal_min, MAX(cal_q) AS cal_max
    FROM cal GROUP BY source, decile
    ORDER BY source, decile
""")
def train_quality_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-score calibration: map each document's raw
    quality score (the text_quality_scores formula) onto its source's
    empirical CDF via percent_rank, plus ntile deciles — the
    standard normalization step before mixing heterogeneous sources
    (a raw 0.6 from a clean-wiki source and from a crawl source mean
    different things; percentiles within source are comparable, so
    mixture policies like "top-3-deciles per source" become
    well-defined). Output is the per-(source, decile) calibration
    table: counts plus the raw-score interval each decile maps from —
    the monotone bin edges a downstream filter would apply.

    Scale: ONE window shuffle partitioned by source (the natural
    calibration unit); percent_rank and ntile share a single (source,
    raw_q, doc_id) sort. Per-source partitions are corpus-sized — a
    skewed giant source would switch to the approx_percentile-based
    cut-point variant (sketch the CDF, broadcast the cuts) with the
    same output contract; the exact window form is the audit-grade
    reference. Determinism: raw_q rounds to 6 dp BEFORE ranking and
    the sort totalizes on doc_id, so both engines rank identically."""
    # text's helper splits the `text` column; dedup's module-level
    # _tokens (imported above for the shingle paths) takes a column —
    # alias to keep the two apart
    from mongo_cdc_spark.operators.text import _STOPWORDS
    from mongo_cdc_spark.operators.text import _tokens as _text_tokens

    w = W.partitionBy("source").orderBy("raw_q", "doc_id")
    raw = (
        load_table(spark, sf_dir, "documents")
        .select("source", "doc_id", _text_tokens().alias("toks"))
        .select("source", "doc_id", F.size("toks").alias("n_tok"),
                F.size(F.filter("toks", lambda t: t.isin(*_STOPWORDS)))
                .alias("n_stop"))
        .select("source", "doc_id",
                F.round(0.6 * (F.col("n_stop") * F.lit(1.0)
                               / F.col("n_tok"))
                        + 0.4 * F.least(F.col("n_tok") / F.lit(100.0),
                                        F.lit(1.0)), 6).alias("raw_q")))
    cal = raw.select(
        "source", "raw_q",
        F.round(F.percent_rank().over(w), 6).alias("cal_q"),
        F.ntile(10).over(w).alias("decile"))
    return (cal.groupBy("source", "decile")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("raw_q").alias("q_min"),
                 F.max("raw_q").alias("q_max"),
                 F.min("cal_q").alias("cal_min"),
                 F.max("cal_q").alias("cal_max"))
            .orderBy("source", "decile"))


# ------------------------------------------------------ BPE merge learning

# NOTE: both BPE loops persist state referenced twice per round — the
# multi-ref shape whose per-round .persist() plan-substitution cost
# grows superlinearly with depth (kcore with 2 refs never finished at
# 12 rounds, round-12 A/B). Safe only while this constant stays below
# the ~6-8-round cliff; raising it past ~6 requires reverting those
# loops to localCheckpoint(eager=True).
BPE_ROUNDS = 3


def _bpe_oracle_sql() -> str:
    """Unrolled BPE merge rounds as chained CTEs. Each round: split
    the symbol sequence, count adjacent pairs weighted by word
    frequency, pick the top pair, apply the merge via the
    doubled-space replace (fuzz-proven equivalent to greedy
    left-to-right BPE merging — see the operator docstring)."""
    ctes = ["""words AS (
      SELECT w AS word, COUNT(*) AS freq
      FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS w
            FROM documents)
      WHERE w <> '' GROUP BY 1
    ), s0 AS (
      SELECT word, freq,
             ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seq
      FROM words
    )"""]
    for k in range(1, BPE_ROUNDS + 1):
        ctes.append(f"""pr{k} AS (
      SELECT z[1] AS a, z[2] AS b, SUM(freq) AS cnt
      FROM (SELECT freq,
                   unnest(list_zip(w[1:len(w) - 1], w[2:len(w)])) AS z
            FROM (SELECT freq,
                         regexp_split_to_array(trim(seq), ' +') AS w
                  FROM s{k - 1})
            WHERE len(w) >= 2)
      GROUP BY 1, 2
    ), t{k} AS (
      SELECT a, b, a || b AS merged, cnt
      FROM pr{k} ORDER BY cnt DESC, a, b LIMIT 1
    ), s{k} AS (
      -- merge, then re-canonicalize to single spacing so the NEXT
      -- round's doubling starts from a uniform separator width
      SELECT word, freq,
             ' ' || array_to_string(regexp_split_to_array(trim(
                 replace(replace(seq, ' ', '  '),
                         ' ' || t{k}.a || '  ' || t{k}.b || ' ',
                         ' ' || t{k}.merged || ' ')), ' +'), ' ')
             || ' ' AS seq
      FROM s{k - 1} CROSS JOIN t{k}
    )""")
    unions = "\n      UNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS round, a AS sym1, b AS sym2, "
        f"merged, CAST(cnt AS BIGINT) AS cnt FROM t{k}"
        for k in range(1, BPE_ROUNDS + 1))
    return (f"WITH {', '.join(ctes)}\n    SELECT * FROM ({unions})"
            f"\n    ORDER BY round")


@query("train_bpe_merge_learn", sql=_bpe_oracle_sql())
def train_bpe_merge_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary learning (Sennrich et al. 2016):
    BPE_ROUNDS merge rounds over the corpus word-frequency table —
    each round counts adjacent symbol pairs (weighted by word
    frequency), promotes the most frequent pair to a new vocabulary
    symbol, and rewrites every word's symbol sequence. Returns the
    learned merge table (round, pair, merged symbol, support) — the
    artifact a tokenizer trainer ships.

    The merge step is the part Spark can't express as a window or
    join: greedy left-to-right non-overlapping pair substitution
    inside each sequence. It compiles to TWO string replaces — double
    every separator, then replace ' a  b ' with ' ab ' — which is
    exactly equivalent to the greedy merge (adjacent occurrences
    share a separator only in the single-spaced form; doubling makes
    every occurrence's context disjoint; 2000-case fuzz against a
    reference Python BPE in tests). No UDF, no per-row loop: the
    whole round is narrow JVM string work, and the only exchanges
    are the pair-count agg (map-side combined, symbol-pair keys) and
    the 1-row top-pair broadcast that parameterizes the rewrite.

    Scale: state is the WORD-frequency table (vocabulary grain —
    orders of magnitude smaller than the corpus; the corpus is
    scanned once to build it), so K merge rounds cost K bounded jobs
    on vocab-grain rows with per-round persist bounding the plan —
    the same fixed-round iterate discipline as PageRank/BFS. A
    fixed round count keeps the op oracle-expressible;
    production vocab sizes just raise K."""
    docs = _docs(spark, sf_dir)
    words = (docs.select(F.explode(_tokens()).alias("word"))
             .filter(F.col("word") != "")
             .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))
    state = words.select(
        "word", "freq",
        F.concat(F.lit(" "),
                 F.regexp_replace("word", "(.)", "$1 ")).alias("seq"))
    merge_rows = []
    for k in range(1, BPE_ROUNDS + 1):
        syms = (state.select(
            "freq", F.split(F.trim(F.col("seq")), " +").alias("w"))
            .filter(F.size("w") >= 2))
        pairs = (syms.select("freq", F.explode(F.expr(
            "transform(slice(w, 1, size(w) - 1), "
            "(x, i) -> struct(x AS a, element_at(w, i + 2) AS b))"
        )).alias("p"))
            .select("freq", "p.*")
            .groupBy("a", "b").agg(F.sum("freq").alias("cnt")))
        top = (pairs.orderBy(F.desc("cnt"), "a", "b").limit(1)
               .select("a", "b", F.concat("a", "b").alias("merged"),
                       "cnt"))
        merge_rows.append(top.select(
            F.lit(k).cast("int").alias("round"),
            F.col("a").alias("sym1"), F.col("b").alias("sym2"),
            "merged", "cnt"))
        # merge, then re-canonicalize to single spacing so the NEXT
        # round's doubling starts from a uniform separator width
        state = (state.crossJoin(F.broadcast(top))
                 .select("word", "freq", F.expr(
                     "concat(' ', array_join(split(trim("
                     "replace(replace(seq, ' ', '  '), "
                     "' ' || a || '  ' || b || ' ', "
                     "' ' || merged || ' ')), ' +'), ' '), ' ')")
                     .alias("seq"))
                 # persist: BPE_ROUNDS fixed; state referenced twice
                 # per round (via top + directly) but each round is
                 # cached, so planning substitutes InMemoryRelation and
                 # the rounds pipeline into one consuming action
                 .persist())
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out.orderBy("round")


# ------------------------------------------- semantic decontamination

SEM_DECON_BENCH_LABEL = 7   # label-7 vectors stand in for the benchmark
SEM_DECON_TAU = 0.92        # cosine threshold for contamination


@query("train_decontaminate_semantic", sql=f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ), bench AS (
      SELECT vec_id, v FROM e WHERE label = {SEM_DECON_BENCH_LABEL}
    ), corpus AS (
      SELECT vec_id, v FROM e WHERE label <> {SEM_DECON_BENCH_LABEL}
    ), hits AS (
      SELECT c.vec_id,
             b.vec_id AS bench_id,
             ROUND(list_dot_product(c.v, b.v)
                   / (sqrt(list_dot_product(c.v, c.v))
                      * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
      FROM corpus c JOIN bench b
        ON ROUND(list_dot_product(c.v, b.v)
                 / (sqrt(list_dot_product(c.v, c.v))
                    * sqrt(list_dot_product(b.v, b.v))), 6)
           >= {SEM_DECON_TAU}
    ), best AS (
      SELECT vec_id, bench_id, cos_sim FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY cos_sim DESC, bench_id) AS rn
        FROM hits)
      WHERE rn = 1
    )
    SELECT c.vec_id AS doc_vec_id,
           b.bench_id, b.cos_sim,
           b.bench_id IS NOT NULL AS contaminated
    FROM corpus c LEFT JOIN best b ON b.vec_id = c.vec_id
    ORDER BY doc_vec_id
""")
def train_decontaminate_semantic(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """SEMANTIC benchmark decontamination (the embedding-space sibling
    of train_decontaminate's n-gram overlap — the Phi/Llama-report
    method): flag every corpus vector whose cosine similarity to ANY
    benchmark vector reaches tau, reporting the closest benchmark hit
    per contaminated item and an explicit verdict column for every
    corpus row (silent drops are how eval leakage survives audits).

    Scale plan: the benchmark side is SMALL BY DEFINITION (eval sets
    are thousands of rows, the corpus is the 100 TB side), so the
    engine broadcasts the benchmark set and streams the corpus ONCE —
    no shuffle in the scoring stage at any corpus size, the same
    shape as knn_bruteforce's probe broadcast. The per-item argmax is
    a window over only the rows that crossed tau. The oracle states
    the same semantics as a declarative theta join."""
    from mongo_cdc_spark.operators.similarity import _emb, cosine

    e = _emb(spark, sf_dir)
    bench = (e.filter(F.col("label") == SEM_DECON_BENCH_LABEL)
             .select(F.col("vec_id").alias("bench_id"),
                     F.col("v").alias("bv"),
                     F.col("norm").alias("bnorm")))
    corpus = (e.filter(F.col("label") != SEM_DECON_BENCH_LABEL)
              .select("vec_id", "v", "norm"))
    scored = (corpus.crossJoin(F.broadcast(bench))
              .select("vec_id", "bench_id",
                      F.round(cosine(F.col("v"), F.col("bv"),
                                     F.col("norm"), F.col("bnorm")), 6)
                      .alias("cos_sim"))
              .filter(F.col("cos_sim") >= SEM_DECON_TAU))
    w = W.partitionBy("vec_id").orderBy(F.desc("cos_sim"), "bench_id")
    best = (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "bench_id", "cos_sim"))
    return (corpus.select("vec_id").join(best, "vec_id", "left")
            .select(F.col("vec_id").alias("doc_vec_id"), "bench_id",
                    "cos_sim",
                    F.col("bench_id").isNotNull().alias("contaminated"))
            .orderBy("doc_vec_id"))


def _bpe_apply_oracle_sql() -> str:
    """Re-learn the BPE_ROUNDS merges (same CTE chain as the learner),
    apply them to every word, and report per-language compression."""
    learn = _bpe_oracle_sql()
    # reuse the learner CTE chain up to its final SELECT: s{K} holds
    # every word's post-merge symbol sequence
    ctes = learn[len("WITH "):learn.index("\n    SELECT")]
    return f"""WITH {ctes},
    wordstats AS (
      SELECT word,
             len(regexp_split_to_array(trim(seq), ' +')) AS n_sym
      FROM s{BPE_ROUNDS}
    ), docs AS (
      SELECT lang, unnest(regexp_split_to_array(text, '\\s+')) AS word
      FROM documents
    )
    SELECT d.lang,
           CAST(SUM(len(d.word)) AS BIGINT) AS n_chars,
           CAST(SUM(w.n_sym) AS BIGINT) AS n_bpe_tokens,
           ROUND(SUM(len(d.word)) / (SUM(w.n_sym) * 1e0), 6)
             AS chars_per_token
    FROM docs d JOIN wordstats w ON w.word = d.word
    WHERE d.word <> ''
    GROUP BY d.lang ORDER BY d.lang"""


@query("train_bpe_tokenize_apply", sql=_bpe_apply_oracle_sql())
def train_bpe_tokenize_apply(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Apply the learned BPE merge table to tokenize the corpus and
    report per-language compression (chars per BPE token) — the
    tokenizer-efficiency metric (fertility's inverse) every
    multilingual tokenizer eval reports. Completes the
    learn-then-apply pair with train_bpe_merge_learn.

    The apply side runs at VOCABULARY grain: merges apply once per
    distinct word (the same doubled-space two-replace per learned
    rule), and the corpus pass is a token explode joined to the
    word->token-count map — a vocab-keyed shuffle join, exactly how
    production tokenizers cache per-word encodings. The corpus text
    is never string-rewritten row by row."""
    docs = _docs(spark, sf_dir)
    words = (docs.select(F.explode(_tokens()).alias("word"))
             .filter(F.col("word") != "")
             .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))
    state = words.select(
        "word", "freq",
        F.concat(F.lit(" "),
                 F.regexp_replace("word", "(.)", "$1 ")).alias("seq"))
    for _ in range(BPE_ROUNDS):
        syms = (state.select(
            "freq", F.split(F.trim(F.col("seq")), " +").alias("w"))
            .filter(F.size("w") >= 2))
        pairs = (syms.select("freq", F.explode(F.expr(
            "transform(slice(w, 1, size(w) - 1), "
            "(x, i) -> struct(x AS a, element_at(w, i + 2) AS b))"
        )).alias("p"))
            .select("freq", "p.*")
            .groupBy("a", "b").agg(F.sum("freq").alias("cnt")))
        top = (pairs.orderBy(F.desc("cnt"), "a", "b").limit(1)
               .select("a", "b", F.concat("a", "b").alias("merged")))
        state = (state.crossJoin(F.broadcast(top))
                 .select("word", "freq", F.expr(
                     "concat(' ', array_join(split(trim("
                     "replace(replace(seq, ' ', '  '), "
                     "' ' || a || '  ' || b || ' ', "
                     "' ' || merged || ' ')), ' +'), ' '), ' ')")
                     .alias("seq"))
                 # persist: BPE_ROUNDS fixed; state referenced twice
                 # per round (via top + directly) but each round is
                 # cached, so planning substitutes InMemoryRelation and
                 # the rounds pipeline into one consuming action
                 .persist())
    wordstats = state.select(
        "word", F.size(F.split(F.trim(F.col("seq")), " +")).alias("n_sym"))
    toks = (docs.select("lang", F.explode(_tokens()).alias("word"))
            .filter(F.col("word") != ""))
    return (toks.join(wordstats, "word")
            .groupBy("lang")
            .agg(F.sum(F.length("word")).alias("n_chars"),
                 F.sum("n_sym").alias("n_bpe_tokens"))
            .select("lang", "n_chars", "n_bpe_tokens",
                    F.round(F.col("n_chars")
                            / F.col("n_bpe_tokens"), 6)
                    .alias("chars_per_token"))
            .orderBy("lang"))


# RAG passage chunking: fixed-size sliding chunks with overlap.
_CHUNK = 10          # tokens per passage
_STRIDE = 8          # chunk - overlap(2)


@query("train_passage_chunks", sql=f"""
    WITH arr AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
      FROM documents
    ), chunks AS (
      SELECT doc_id, k AS chunk_idx,
             array_to_string(w[k * {_STRIDE} + 1 :
                               k * {_STRIDE} + {_CHUNK}], ' ')
               AS passage,
             LEAST({_CHUNK}, len(w) - k * {_STRIDE}) AS n_tokens
      FROM (SELECT *,
                   unnest(generate_series(
                       0, CAST(CEIL(len(w) / {_STRIDE}.0) AS BIGINT)
                          - 1)) AS k
            FROM arr)
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           passage, CAST(n_tokens AS INT) AS n_tokens
    FROM chunks
    WHERE doc_id < 50
    ORDER BY doc_id, chunk_idx
""")
def train_passage_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG passage chunking: each document splits into {c}-token
    passages with a {o}-token overlap (stride {s}) — the retrieval
    pre-processing every RAG/embedding pipeline runs before indexing.
    Graded on the first 50 docs to keep the oracle frame small; the
    plan is corpus-wide.

    The GRADED path is pure JVM array ops (one materialized token
    array, one sequence/explode, slice + concat_ws per chunk — a
    narrow generate, no Python). The package also ships the same
    chunker as a PYTHON UDTF (`PassageChunker`,
    `passage_chunks_udtf`) — the lateral-join extension point
    SURVEY §2.2 declares — and tests/test_training.py asserts the
    UDTF's output frame-equals this SQL formulation; the UDTF is the
    extensibility demo, the JVM path is what runs at 100 TB.""".format(
        c=_CHUNK, o=_CHUNK - _STRIDE, s=_STRIDE)
    arr = (_docs(spark, sf_dir)
           .where(F.col("doc_id") < 50)
           .select("doc_id", _tokens().alias("w")))
    chunks = (arr.select(
        "doc_id",
        F.explode(F.sequence(
            F.lit(0),
            F.ceil(F.size("w") / F.lit(float(_STRIDE))).cast("int")
            - 1)).alias("chunk_idx"),
        "w"))
    sl = F.slice(F.col("w"),
                 F.col("chunk_idx") * _STRIDE + 1, _CHUNK)
    return (chunks.select(
        "doc_id", F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join(sl, " ").alias("passage"),
        F.least(F.lit(_CHUNK),
                F.size("w") - F.col("chunk_idx") * _STRIDE)
        .cast("int").alias("n_tokens"))
        .orderBy("doc_id", "chunk_idx"))


def passage_chunks_udtf(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """The same chunker as a Python UDTF — the user-defined TABLE
    function extension point (one input row -> many output rows via
    LATERAL join). Row-at-a-time Python is the SLOW path; this exists
    to prove the extension mechanism end-to-end (registration, lateral
    SQL, schema contract), pinned frame-equal to the JVM formulation
    in tests. Use the JVM path for production chunking."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, passage string, n_tokens int")
    class PassageChunker:
        def eval(self, text: str):
            toks = text.split()
            n = len(toks)
            k = 0
            while k * _STRIDE < n:
                sl = toks[k * _STRIDE: k * _STRIDE + _CHUNK]
                yield k, " ".join(sl), len(sl)
                k += 1

    spark.udtf.register("passage_chunker", PassageChunker)
    docs.createOrReplaceTempView("udtf_docs_in")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.passage, c.n_tokens "
        "FROM udtf_docs_in d, LATERAL passage_chunker(d.text) c")


@query("train_shard_manifest", sql=f"""
    WITH keyed AS (
      SELECT doc_id, text, n_chars,
             {_SHARD_SQL.format(k=_PERM_SQL, n=_N_SHARDS)} AS shard,
             ('0x' || substr(md5(text), 1, 10))::BIGINT AS digest40,
             len(regexp_split_to_array(text, '\\s+')) AS n_tok
      FROM documents
    )
    SELECT CAST(shard AS INT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(digest40) AS BIGINT) AS content_digest,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM keyed GROUP BY shard ORDER BY shard
""")
def train_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release provenance manifest per training shard: document and
    token counts plus an ORDER-INDEPENDENT content digest (the sum of
    per-document 60-bit md5 prefixes — commutative, so any write
    order or partitioning yields the same digest). This is the
    reproducibility record shipped next to a dataset release: rerun
    the pipeline, compare manifests, and any dropped/duplicated/
    mutated document changes the digest; the per-shard grain localizes
    which shard to diff.

    One shard-keyed partial-aggregatable shuffle; the digest is the
    engine-portable md5-prefix idiom the SimHash family uses
    (conv(substr(md5,...),16,10) == ('0x'||substr)::BIGINT), sized at
    40 bits per document precisely so the SUM stays inside signed
    BIGINT for shards up to ~2^23 documents (a 60-bit prefix
    overflowed ANSI-mode long addition at fixture size — caught by
    the oracle gate; collision odds on 40 bits are irrelevant here
    because the digest detects corpus drift, not pairwise identity)."""
    k = _perm_key()
    keyed = _docs(spark, sf_dir).select(
        "doc_id", "n_chars",
        _shard_of(k, _N_SHARDS).cast("int").alias("shard"),
        F.conv(F.substring(F.md5("text"), 1, 10), 16, 10)
        .cast("bigint").alias("digest40"),
        F.size(_tokens()).alias("n_tok"))
    return (keyed.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").cast("bigint").alias("n_tokens"),
                 F.sum("n_chars").cast("bigint").alias("n_chars"),
                 F.sum("digest40").cast("bigint").alias("content_digest"),
                 F.min("doc_id").cast("bigint").alias("min_doc_id"),
                 F.max("doc_id").cast("bigint").alias("max_doc_id"))
            .orderBy("shard"))


@query("train_interleave_schedule", sql=f"""
    WITH shares AS (
      SELECT lang, COUNT(*) AS n,
             COUNT(*) * 1e0 / SUM(COUNT(*)) OVER () AS share
      FROM documents GROUP BY lang
    ), pos AS (
      SELECT d.doc_id, d.lang,
             ROW_NUMBER() OVER (PARTITION BY d.lang
                                ORDER BY {_PERM_SQL}) AS k,
             s.share
      FROM documents d JOIN shares s ON s.lang = d.lang
    )
    , sched AS (
      SELECT doc_id, lang,
             CAST(k AS INT) AS pos_in_source,
             ROUND((k - 0.5) / share, 6) AS vtime,
             CAST(ROW_NUMBER() OVER (ORDER BY (k - 0.5) / share, lang,
                                     doc_id) AS INT) AS global_pos
      FROM pos
    )
    SELECT * FROM sched WHERE doc_id < 100 ORDER BY global_pos
""")
def train_interleave_schedule(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Deterministic mixture-interleave schedule: each source's k-th
    document is assigned virtual time (k - 0.5)/share and the global
    training order merges by virtual time — the stride-scheduling
    recipe dataloaders use to realize mixture weights EXACTLY (after
    N steps every source has contributed ~share*N docs, bounded drift
    <1) with no RNG and bit-reproducible resume from any step.
    Within-source order is the md5 permutation shard_assign uses.
    Graded on doc_id<100 to bound the oracle frame; the plan is
    corpus-wide.

    Plan: per-source position = one window keyed by source; the
    global order is the two-phase rank over virtual time
    (`_twophase.with_global_order`): repartitionByRange(vtime, lang,
    doc_id), per-range-partition row_number, broadcast partition
    offsets — no single-task sort; ties (k - 0.5)/share are broken
    (lang, doc_id) identically on both engines. The share
    denominator is a broadcast scalar joined onto the |langs|-row
    frame."""
    docs = _docs(spark, sf_dir)
    n_total = docs.agg(F.count(F.lit(1)).alias("nt"))
    shares = (docs.groupBy("lang")
              .agg(F.count(F.lit(1)).alias("n"))
              .crossJoin(F.broadcast(n_total))
              .withColumn("share",
                          F.col("n") * F.lit(1.0) / F.col("nt"))
              .drop("nt"))
    pos = (docs.join(F.broadcast(shares), "lang")
           .select("doc_id", "lang", "share",
                   F.row_number().over(
                       W.partitionBy("lang").orderBy(_perm_key()))
                   .alias("k")))
    vtime = (F.col("k") - 0.5) / F.col("share")
    sched = with_global_order(
        pos.withColumn("_vt", vtime),
        [F.asc("_vt"), F.asc("lang"), F.asc("doc_id")],
        rank_col="gp")
    return (sched
            .withColumn("vtime", F.round(F.col("_vt"), 6))
            .where(F.col("doc_id") < 100)
            .select("doc_id", "lang",
                    F.col("k").cast("int").alias("pos_in_source"),
                    "vtime", F.col("gp").cast("int").alias("global_pos"))
            .orderBy("global_pos"))


@query("train_padding_waste", sql=f"""
    WITH keyed AS (
      SELECT doc_id,
             {_SHARD_SQL.format(k=_PERM_SQL, n=_PACK_SHARDS)} AS shard,
             len(regexp_split_to_array(text, '\\s+')) AS n_tok
      FROM documents
    ), per_shard AS (
      SELECT shard, SUM(n_tok) AS tok,
             CAST(CEIL(SUM(n_tok) / {_PACK_BUDGET}.0) AS BIGINT)
               AS n_seqs
      FROM keyed GROUP BY shard
    )
    SELECT CAST(shard AS INT) AS shard,
           CAST(tok AS BIGINT) AS n_tokens,
           CAST(n_seqs AS BIGINT) AS n_sequences,
           CAST(n_seqs * {_PACK_BUDGET} - tok AS BIGINT) AS pad_tokens,
           ROUND((n_seqs * {_PACK_BUDGET} - tok) * 1e0
                 / (n_seqs * {_PACK_BUDGET}), 6) AS pad_frac
    FROM per_shard ORDER BY shard
""")
def train_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit for the sequence packer: per shard, total
    tokens, sequences of {b} the concat-then-chunk packer emits, and
    the padding the LAST partial sequence burns — the compute-waste
    number (pad_frac of every training FLOP is spent on pad tokens)
    that justifies dense packing over per-document padding, and the
    regression metric to watch when the packing strategy changes.
    Arithmetic mirrors train_sequence_pack's shard/budget constants,
    so the two operators describe the same pack.

    One shard-keyed partial-aggregatable pass; pure integer
    arithmetic.""".format(b=_PACK_BUDGET)
    k = _perm_key()
    keyed = _docs(spark, sf_dir).select(
        _shard_of(k, _PACK_SHARDS).cast("int").alias("shard"),
        F.size(_tokens()).alias("n_tok"))
    per = (keyed.groupBy("shard")
           .agg(F.sum("n_tok").alias("tok")))
    n_seqs = F.ceil(F.col("tok") / F.lit(float(_PACK_BUDGET))).cast("bigint")
    return (per.select(
        "shard",
        F.col("tok").cast("bigint").alias("n_tokens"),
        n_seqs.alias("n_sequences"),
        (n_seqs * _PACK_BUDGET - F.col("tok")).cast("bigint")
        .alias("pad_tokens"),
        F.round((n_seqs * _PACK_BUDGET - F.col("tok")) * F.lit(1.0)
                / (n_seqs * _PACK_BUDGET), 6).alias("pad_frac"))
        .orderBy("shard"))


# ------------------------------------------------- split + leakage audit

# Deterministic 20-bucket hash split: buckets 0-17 train (90%), 18 val
# (5%), 19 test (5%) — the standard held-out carve, keyed on the same
# portable md5 permutation the shard assigner uses.
_SPLIT_BUCKETS = 20
_SPLIT_VAL, _SPLIT_TEST = 18, 19
_SPLIT_CASE_SQL = f"""CASE
        WHEN {_SHARD_SQL.format(k=_PERM_SQL, n=_SPLIT_BUCKETS)}
             = {_SPLIT_TEST} THEN 'test'
        WHEN {_SHARD_SQL.format(k=_PERM_SQL, n=_SPLIT_BUCKETS)}
             = {_SPLIT_VAL} THEN 'val'
        ELSE 'train' END"""


@query("train_split_leakage", sql=f"""
    WITH base AS (
      SELECT doc_id, md5(text) AS fp,
             len(regexp_split_to_array(text, '\\s+')) AS n_tok,
             {_SPLIT_CASE_SQL} AS split
      FROM documents
    ), leaked AS (
      SELECT fp FROM base GROUP BY fp
      HAVING COUNT(DISTINCT split) > 1
    ), tot AS (SELECT COUNT(*) AS n FROM base)
    SELECT bs.split AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(bs.n_tok) AS BIGINT) AS n_tokens,
           ROUND(COUNT(*) * 1e0 / MAX(tot.n), 6) AS doc_share,
           CAST(SUM(CASE WHEN l.fp IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_leaked_docs
    FROM base bs
    LEFT JOIN leaked l ON l.fp = bs.fp
    CROSS JOIN tot
    GROUP BY bs.split ORDER BY bs.split
""")
def train_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split assignment + cross-split leakage audit:
    every doc lands in a split via the deterministic md5 hash bucket
    (90/5/5 — the reproducible carve that survives re-runs and corpus
    appends, unlike random splits), and the audit counts docs whose
    exact-content fingerprint (md5 of text) ALSO appears in a
    different split — the train→test contamination that silently
    inflates eval numbers, the first check any release eval runs.

    Plan: one narrow projection (fingerprint, token count, bucket),
    ONE fingerprint-keyed agg to find multi-split fingerprints
    (map-side combined; the leaked set is duplicate-grain — tiny
    relative to the corpus, so the verdict join is hint-free and AQE
    broadcasts it when measured small), one split-keyed rollup (3
    groups). No window, no self-join; survives 100 TB because every
    shuffle is keyed on fingerprints or the 3-value split."""
    k = _perm_key()
    b = _shard_of(k, _SPLIT_BUCKETS)
    # persisted: the leak detection, the total, and the final
    # rollup all read this narrow doc-grain frame — without the
    # shared cache each re-runs the scan+tokenization
    base = _docs(spark, sf_dir).select(
        F.md5("text").alias("fp"),
        F.size(_tokens()).alias("n_tok"),
        F.when(b == _SPLIT_TEST, "test")
        .when(b == _SPLIT_VAL, "val")
        .otherwise("train").alias("split")).persist()
    leaked = (base.groupBy("fp")
              .agg(F.count_distinct("split").alias("ns"))
              .where(F.col("ns") > 1)
              .select("fp", F.lit(1).alias("is_leak")))
    tot = base.agg(F.count(F.lit(1)).alias("n"))
    return (base.join(leaked, "fp", "left")
            .crossJoin(F.broadcast(tot))
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").cast("bigint").alias("n_tokens"),
                 F.round(F.count(F.lit(1)) * F.lit(1.0) / F.max("n"), 6)
                 .alias("doc_share"),
                 F.sum(F.coalesce(F.col("is_leak"), F.lit(0)))
                 .cast("bigint").alias("n_leaked_docs"))
            .orderBy("split"))


# -------------------------------------------- contiguous-span contamination

# A contaminated RUN of >= this many consecutive overlapping 3-gram
# windows (i.e. run + 2 contiguous benchmark tokens) marks a doc for
# span-level scrubbing rather than whole-doc drop.
_SPAN_RUN_MIN = 3


@query("train_contamination_span", sql=f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
      FROM documents
    ), pos AS (
      SELECT doc_id, i, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s,
             len(w) - 2 AS n_win
      FROM toks, unnest(generate_series(1, len(w) - 2)) AS t(i)
      WHERE len(w) >= 3
    ), bench AS (
      SELECT DISTINCT s FROM pos WHERE doc_id % {_BENCH_MOD} = 0
    ), hits AS (
      SELECT p.doc_id, p.i, p.n_win,
             p.i - ROW_NUMBER() OVER (PARTITION BY p.doc_id
                                      ORDER BY p.i) AS grp
      FROM pos p JOIN bench b USING (s)
      WHERE p.doc_id % {_BENCH_MOD} <> 0
    ), runs AS (
      SELECT doc_id, MAX(n_win) AS n_win, grp,
             COUNT(*) AS run_len
      FROM hits GROUP BY doc_id, grp
    )
    SELECT doc_id,
           CAST(MAX(n_win) AS INT) AS n_windows,
           CAST(SUM(run_len) AS INT) AS n_hit_windows,
           CAST(MAX(run_len) AS INT) AS longest_run,
           CAST(MAX(run_len) + 2 AS INT) AS longest_span_tokens,
           MAX(run_len) >= {_SPAN_RUN_MIN} AS scrub_flag
    FROM runs GROUP BY doc_id ORDER BY doc_id
""")
def train_contamination_span(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Contiguous-span contamination: for each corpus doc that overlaps
    the held-out benchmark at all, the LONGEST consecutive run of
    benchmark-matching 3-gram windows (= longest verbatim shared span,
    in tokens) — the signal that separates a quoted sentence
    (long run → scrub the span) from scattered common phrases (many
    short runs → keep). `train_decontaminate` asks "how MUCH
    overlaps"; this asks "how CONTIGUOUS is it", which is what
    span-level scrubbing (Lee et al. suffix-array style) acts on.

    Plan: positional 3-gram hashes via posexplode (positions matter
    here, unlike the shingle SET ops), hash-joined against the
    broadcast benchmark shingle union; runs form with the classic
    islands-and-gaps trick (position − per-doc hit rank is constant
    within a run) — the rank window is PARTITIONED BY doc_id, so no
    global sort anywhere; per-run and per-doc rollups are map-side
    combinable. Shuffles carry (doc, position) hit rows only —
    benchmark-overlap grain, far below corpus grain."""
    from mongo_cdc_spark.operators.dedup import _token_hashes

    docs = (_docs(spark, sf_dir)
            .select("doc_id", _tokens().alias("w"))
            .filter(F.size("w") >= 3)
            .select("doc_id", F.size("w").alias("nw"),
                    _token_hashes(F.col("w")).alias("th")))
    tri = docs.select(
        "doc_id", (F.col("nw") - 2).alias("n_win"),
        F.posexplode(F.transform(
            F.sequence(F.lit(1), F.size("th") - 2),
            lambda i: F.xxhash64(F.element_at("th", i),
                                 F.element_at("th", i + 1),
                                 F.element_at("th", i + 2)))
        ).alias("i0", "h"))
    bench = (tri.where(F.col("doc_id") % _BENCH_MOD == 0)
             .select("h").distinct())
    hits = (tri.where(F.col("doc_id") % _BENCH_MOD != 0)
            .join(F.broadcast(bench), "h")
            .select("doc_id", "n_win", (F.col("i0") + 1).alias("i")))
    grp = (F.col("i") - F.row_number().over(
        W.partitionBy("doc_id").orderBy("i")))
    runs = (hits.withColumn("grp", grp)
            .groupBy("doc_id", "grp")
            .agg(F.max("n_win").alias("n_win"),
                 F.count(F.lit(1)).alias("run_len")))
    return (runs.groupBy("doc_id")
            .agg(F.max("n_win").cast("int").alias("n_windows"),
                 F.sum("run_len").cast("int").alias("n_hit_windows"),
                 F.max("run_len").cast("int").alias("longest_run"),
                 (F.max("run_len") + 2).cast("int")
                 .alias("longest_span_tokens"),
                 (F.max("run_len") >= _SPAN_RUN_MIN).alias("scrub_flag"))
            .orderBy("doc_id"))


@query("train_dedup_keep_best", sql="""
    WITH scored AS (
      SELECT doc_id,
             md5(array_to_string(
                 regexp_split_to_array(text, '\\s+')[1:10], ' ')) AS fp,
             len(list_distinct(regexp_split_to_array(text, '\\s+')))
               AS n_types,
             len(regexp_split_to_array(text, '\\s+')) AS n_tok
      FROM documents
    ), grp AS (
      SELECT fp, COUNT(*) AS group_size
      FROM scored GROUP BY fp HAVING COUNT(*) > 1
    ), ranked AS (
      SELECT s.fp, s.doc_id, s.n_types, s.n_tok, g.group_size,
             ROW_NUMBER() OVER (PARTITION BY s.fp
                                ORDER BY s.n_types DESC, s.n_tok DESC,
                                         s.doc_id) AS rn
      FROM scored s JOIN grp g ON g.fp = s.fp
    )
    SELECT fp, CAST(group_size AS INT) AS group_size,
           CAST(doc_id AS BIGINT) AS keeper_doc_id,
           CAST(n_types AS INT) AS keeper_types,
           CAST(n_tok AS INT) AS keeper_tokens,
           CAST(group_size - 1 AS INT) AS n_dropped
    FROM ranked WHERE rn = 1
    ORDER BY fp
""")
def train_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware keeper selection over HEAD-FINGERPRINT duplicate
    groups: block documents on the md5 of their first 10 tokens (the
    cheap prefix key crawl pipelines use — truncated/boilerplate-
    wrapped copies of one page share their head even when tails
    differ, which is exactly this fixture's near-dup shape), then
    within each multi-member group keep the richest copy — max
    distinct-token count, then max token count, then min doc_id —
    instead of dedup_exact's blind min-id rule. The kept copy is what
    trains; the (group, keeper, dropped-count) table is the dedup
    stage's provenance record.

    Plan: one narrow scoring projection, a fingerprint-keyed count to
    isolate multi-member groups (map-side combined; the group frame
    is duplicate-grain, hint-free so AQE broadcasts it when small),
    then per-GROUP argmax inside a fingerprint-PARTITIONED rank — no
    global window, shuffles keyed on fingerprints throughout. At
    100 TB this is exactly the dedup_exact plan plus one more
    fingerprint-grain pass."""
    toks = _tokens()
    scored = (_docs(spark, sf_dir)
              .select("doc_id", toks.alias("w"))
              .select(
                  "doc_id",
                  F.md5(F.concat_ws(" ", F.slice("w", 1, 10))).alias("fp"),
                  F.size(F.array_distinct("w")).cast("int")
                  .alias("n_types"),
                  F.size("w").cast("int").alias("n_tok")))
    grp = (scored.groupBy("fp")
           .agg(F.count(F.lit(1)).alias("group_size"))
           .where(F.col("group_size") > 1))
    w = W.partitionBy("fp").orderBy(F.desc("n_types"), F.desc("n_tok"),
                                    F.asc("doc_id"))
    return (scored.join(grp, "fp")
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("fp",
                    F.col("group_size").cast("int").alias("group_size"),
                    F.col("doc_id").cast("bigint").alias("keeper_doc_id"),
                    F.col("n_types").alias("keeper_types"),
                    F.col("n_tok").alias("keeper_tokens"),
                    (F.col("group_size") - 1).cast("int")
                    .alias("n_dropped"))
            .orderBy("fp"))


# ------------------------------------------------ length-bucket batching

_LEN_BUCKETS = 8
_LEN_FRACS = "[" + ", ".join(
    f"{i}/{_LEN_BUCKETS}.0" for i in range(1, _LEN_BUCKETS)) + "]"


@query("train_length_buckets", sql=f"""
    WITH toks AS (
      SELECT doc_id,
             len(regexp_split_to_array(text, '\\s+')) AS n_tok
      FROM documents
    ), samp AS (
      SELECT n_tok FROM toks
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
            % 10 = 0
    ), b AS (
      SELECT list_transform(quantile_cont(n_tok, {_LEN_FRACS}),
                            x -> ROUND(x, 4)) AS bounds
      FROM samp
    ), g AS (
      SELECT COUNT(*) AS gn, SUM(n_tok) AS gsum, MAX(n_tok) AS gmax
      FROM toks
    ), bucketed AS (
      SELECT len(list_filter(b.bounds, x -> t.n_tok > x)) AS bucket,
             t.n_tok
      FROM toks t CROSS JOIN b
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_tok) AS INT) AS min_tok,
           CAST(MAX(n_tok) AS INT) AS max_tok,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS BIGINT)
             AS pad_tokens,
           ROUND((COUNT(*) * MAX(n_tok) - SUM(n_tok)) * 1e0
                 / (COUNT(*) * MAX(n_tok)), 6) AS pad_frac,
           ROUND((g.gn * g.gmax - g.gsum) * 1e0 / (g.gn * g.gmax), 6)
             AS unbucketed_pad_frac
    FROM bucketed CROSS JOIN g
    GROUP BY bucket, g.gn, g.gsum, g.gmax
    ORDER BY bucket
""")
def train_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching planner: split documents into
    {_LEN_BUCKETS} token-length buckets at sampled octile boundaries
    and report the padding each bucket burns when its batches pad to
    the BUCKET max, against the unbucketed baseline (every batch pads
    to the global max) — the dataloader design table that justifies
    length-bucketed batching (pad_frac collapses because same-length
    docs batch together), sibling to train_padding_waste's
    concat-packer audit.

    Plan: boundaries come from a deterministic 10% md5 row-sample
    (layout_range_bounds' RangePartitioner recipe — bounds never need
    the full sort, and the sample replays bit-identically in DuckDB),
    whose octiles run through _twophase.exact_quantiles so even the
    sample never buffers on a single task (same values as the
    percentile aggregate, two-phase rank underneath); assignment
    probes the broadcast 7-element bound array with a JVM
    higher-order filter (no join, no shuffle); everything else is two
    partial-aggregatable rollups (bucket grain + one global row). No
    window anywhere."""
    from mongo_cdc_spark.operators._twophase import exact_quantiles

    toks = _docs(spark, sf_dir).select(
        "doc_id", F.size(_tokens()).alias("n_tok"))
    samp = toks.where(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")
                                 .cast("binary")), 1, 8), 16, 10)
        .cast("bigint") % 10 == 0)
    qs = exact_quantiles(
        samp, "n_tok",
        {f"b{i}": i / _LEN_BUCKETS for i in range(1, _LEN_BUCKETS)},
        ["doc_id"])
    bounds = qs.select(F.array(*[
        F.round(F.col(f"b{i}"), 4)
        for i in range(1, _LEN_BUCKETS)]).alias("bounds"))
    g = toks.agg(F.count(F.lit(1)).alias("gn"),
                 F.sum("n_tok").alias("gsum"),
                 F.max("n_tok").alias("gmax"))
    bucketed = (toks.crossJoin(F.broadcast(bounds))
                .select(F.size(F.filter(
                    "bounds", lambda x: F.col("n_tok") > x))
                    .cast("int").alias("bucket"), "n_tok"))
    pad = F.count(F.lit(1)) * F.max("n_tok") - F.sum("n_tok")
    gpad = (F.col("gn") * F.col("gmax") - F.col("gsum")) * F.lit(1.0) \
        / (F.col("gn") * F.col("gmax"))
    return (bucketed.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("n_tok").cast("int").alias("min_tok"),
                 F.max("n_tok").cast("int").alias("max_tok"),
                 F.sum("n_tok").cast("bigint").alias("n_tokens"),
                 pad.cast("bigint").alias("pad_tokens"),
                 F.round(pad * F.lit(1.0)
                         / (F.count(F.lit(1)) * F.max("n_tok")), 6)
                 .alias("pad_frac"))
            .crossJoin(F.broadcast(g))
            .select("bucket", "n_docs", "min_tok", "max_tok",
                    "n_tokens", "pad_tokens", "pad_frac",
                    F.round(gpad, 6).alias("unbucketed_pad_frac"))
            .orderBy("bucket"))


# --------------------------------------- temperature-scaled mixture

MIX_TEMPS = (0.3, 0.7)


@query("train_mixture_temperature", sql=f"""
    WITH counts AS (
      SELECT lang,
             COUNT(*) AS n_docs,
             SUM(len(regexp_split_to_array(text, '\\s+'))) AS n_tokens
      FROM documents GROUP BY 1
    ), tot AS (
      SELECT SUM(n_tokens) AS t FROM counts
    ), p AS (
      SELECT c.lang, c.n_docs, c.n_tokens,
             c.n_tokens * 1.0 / t.t AS p
      FROM counts c, tot t
    ), q AS (
      SELECT p.lang, p.n_docs, p.n_tokens, p.p, a.alpha,
             POWER(p.p, a.alpha)
               / SUM(POWER(p.p, a.alpha))
                   OVER (PARTITION BY a.alpha) AS q
      FROM p, (SELECT UNNEST(ARRAY[{MIX_TEMPS[0]}, {MIX_TEMPS[1]}])
                 AS alpha) a
    )
    SELECT alpha, lang,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(p, 6) AS p_raw,
           ROUND(q, 6) AS p_temp,
           ROUND(q / p, 6) AS boost
    FROM q ORDER BY alpha, lang
""")
def train_mixture_temperature(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling mixture (the XLM-R / mT5
    multilingual recipe, Conneau et al. '19): per language,
    q_i = p_i^alpha / sum_j p_j^alpha over token shares for
    alpha in {MIX_TEMPS} — alpha < 1 upsamples the tail languages
    without flattening to uniform, and boost = q/p is the per-source
    dataloader repetition factor. The generalization of
    train_mixture_weights' uniform target (alpha = 0 is uniform,
    alpha = 1 is proportional); shipping the alpha sweep as data is
    how a mixture ablation picks its operating point.

    Plan: ONE data-grain (lang, counts) partial agg; the temperature
    sweep is a |langs| x |alphas| grid with per-alpha normalization
    windows over that bounded grid. Shares are ratios of exact
    integer token counts; POWER/sum run in identical expression
    trees on both engines before the 6-dp round."""
    from pyspark.sql import Window as W

    counts = (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(F.size(_tokens())).alias("n_tokens")))
    tot = counts.agg(F.sum("n_tokens").alias("t"))
    p = (counts.crossJoin(F.broadcast(tot))
         .withColumn("p", F.col("n_tokens") * 1.0 / F.col("t")))
    alphas = F.explode(F.array(*[F.lit(a) for a in MIX_TEMPS]))
    g = p.select("lang", "n_docs", "n_tokens", "p",
                 alphas.alias("alpha"))
    wa = W.partitionBy("alpha")
    q = F.pow("p", F.col("alpha")) \
        / F.sum(F.pow("p", F.col("alpha"))).over(wa)
    return (g.select(
        "alpha", "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round("p", 6).alias("p_raw"),
        F.round(q, 6).alias("p_temp"),
        F.round(q / F.col("p"), 6).alias("boost"))
        .orderBy("alpha", "lang"))


# ------------------------------------------- epoch reshuffle audit

SHUF_EPOCHS = (1, 2)        # epochs compared against epoch 0


@query("train_epoch_shuffle_audit", sql=f"""
    WITH ranked AS (
      SELECT d.doc_id, e.e,
             ROW_NUMBER() OVER (
               PARTITION BY e.e
               ORDER BY md5(d.doc_id::VARCHAR || ':'
                            || e.e::VARCHAR), d.doc_id) AS rk
      FROM documents d,
           (SELECT UNNEST(ARRAY[0, {SHUF_EPOCHS[0]},
                                {SHUF_EPOCHS[1]}]) AS e) e
    ), base AS (
      SELECT doc_id, rk AS rk0 FROM ranked WHERE e = 0
    ), nn AS (SELECT COUNT(*) AS n FROM base),
    pairs AS (
      SELECT r.e, r.doc_id, r.rk, b.rk0,
             (r.rk - b.rk0) * (r.rk - b.rk0) AS d2,
             ABS(r.rk - b.rk0) AS shift,
             CASE WHEN (r.rk - 1) * 10 // nn.n
                       = (b.rk0 - 1) * 10 // nn.n
                  THEN 1 ELSE 0 END AS same_decile
      FROM ranked r JOIN base b ON b.doc_id = r.doc_id, nn
      WHERE r.e <> 0
    )
    SELECT p.e AS epoch,
           CAST(nn.n AS BIGINT) AS n_docs,
           ROUND(1.0 - 6.0 * SUM(p.d2)
                 / (nn.n * (CAST(nn.n AS DOUBLE) * nn.n - 1)), 6)
             AS spearman_rho,
           ROUND(AVG(p.shift * 1.0 / nn.n), 6) AS mean_shift_frac,
           CAST(MAX(p.shift) AS BIGINT) AS max_shift,
           ROUND(AVG(p.same_decile * 1.0), 6) AS frac_same_decile
    FROM pairs p, nn
    GROUP BY p.e, nn.n ORDER BY p.e
""")
def train_epoch_shuffle_audit(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Epoch-reshuffle decorrelation audit: each training epoch
    orders the corpus by md5(doc_id:epoch) — the deterministic,
    seedless, resumable shuffle train_shard_assign uses — and this
    operator PROVES successive epochs are genuinely decorrelated:
    Spearman rho between epoch-e and epoch-0 positions (exact
    integer-rank formula 1 - 6*sum(d^2)/(n(n^2-1)) ~ 0), the mean
    normalized position shift (-> 1/3 for independent permutations),
    max shift, and the fraction of docs stuck in their epoch-0
    decile (-> 0.1). A correlated reshuffle silently reorders
    gradient noise; this is the dataloader audit that catches it.

    Plan: ranks per epoch are exact global row_numbers via the
    two-phase range machinery (never a single-partition window at
    doc grain); the epoch frames join on doc_id and collapse in one
    agg. Every statistic is integer algebra (sum d^2 fits BIGINT to
    ~2M docs; the DOUBLE cast in n(n^2-1) dodges the bigint cube
    overflow, and a 100 TB run moves sum(d^2) to DECIMAL(38))."""
    from mongo_cdc_spark.operators._twophase import with_global_order

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    frames = {}
    for e in (0,) + SHUF_EPOCHS:
        key = F.md5(F.concat_ws(
            ":", F.col("doc_id").cast("string"), F.lit(str(e)))
            .cast("binary"))
        ranked = with_global_order(
            docs.select("doc_id", key.alias("k")),
            [F.col("k"), F.col("doc_id")], rank_col="rk")
        frames[e] = ranked.select(
            "doc_id", F.col("rk").alias(f"rk{e}"))
    base = frames[0]
    nn = docs.agg(F.count(F.lit(1)).alias("n"))
    outs = []
    for e in SHUF_EPOCHS:
        p = (frames[e].join(base, "doc_id")
             .crossJoin(F.broadcast(nn)))
        d = F.col(f"rk{e}") - F.col("rk0")
        dec_e = (F.col(f"rk{e}") - 1) * 10
        dec_0 = (F.col("rk0") - 1) * 10
        st = p.agg(
            F.sum(d * d).alias("sd2"),
            F.avg(F.abs(d) * 1.0 / F.col("n")).alias("msf"),
            F.max(F.abs(d)).alias("mx"),
            F.avg((F.floor(dec_e / F.col("n"))
                   == F.floor(dec_0 / F.col("n")))
                  .cast("double")).alias("fsd"),
            F.max("n").alias("n"))
        outs.append(st.select(
            F.lit(e).alias("epoch"),
            F.col("n").cast("bigint").alias("n_docs"),
            F.round(1.0 - 6.0 * F.col("sd2")
                    / (F.col("n") * (F.col("n").cast("double")
                                     * F.col("n") - 1)), 6)
            .alias("spearman_rho"),
            F.round("msf", 6).alias("mean_shift_frac"),
            F.col("mx").cast("bigint").alias("max_shift"),
            F.round("fsd", 6).alias("frac_same_decile")))
    res = outs[0]
    for more in outs[1:]:
        res = res.unionByName(more)
    return res.orderBy("epoch")


# ----------------------------------- cross-source duplicate overlap

@query("train_cross_source_overlap", sql="""
    WITH toks AS (
      SELECT source, regexp_split_to_array(text, '\\s+') AS w
      FROM documents
    ), sh AS (
      SELECT DISTINCT source,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
      FROM (SELECT *, unnest(generate_series(1, len(w) - 2)) AS i
            FROM toks)
    ), tot AS (
      SELECT source, COUNT(*) AS n_sh FROM sh GROUP BY 1
    ), pair AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS n_shared
      FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT p.source_a, p.source_b,
           CAST(ta.n_sh AS BIGINT) AS n_sh_a,
           CAST(tb.n_sh AS BIGINT) AS n_sh_b,
           CAST(p.n_shared AS BIGINT) AS n_shared,
           ROUND(p.n_shared * 1e0
                 / LEAST(ta.n_sh, tb.n_sh), 6) AS containment
    FROM pair p
    JOIN tot ta ON ta.source = p.source_a
    JOIN tot tb ON tb.source = p.source_b
    ORDER BY p.source_a, p.source_b
""")
def train_cross_source_overlap(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Cross-source lexical-overlap matrix: for every source pair,
    how many distinct word 3-gram shingles appear in BOTH corpora,
    with containment = shared / min(|A|, |B|) — the "is subcorpus B
    substantially a rescrape of A" audit that informs source-level
    mixture weights before per-document dedup runs (containment near
    1 means one source's phrase inventory is a subset of the
    other's); the source-grain companion to dedup_containment's
    document grain.

    Plan: ONE data-grain stage — tokenize + shingle-hash + distinct
    to (source, shingle) grain (the dedup module's materialize-
    token-hashes-first discipline; Spark joins 64-bit xxhash64
    shingles while the oracle joins the equivalent 3-gram strings —
    identical SET counts modulo 2^-64 collisions, the
    dedup_ngram_jaccard convention). The pair join runs on the
    DEDUPLICATED shingle frame, so per-shingle postings are bounded
    by |sources| (each shingle contributes at most C(20, 2) pairs)
    and the output is |sources|^2 grain."""
    from mongo_cdc_spark.operators.dedup import (
        _shingles_of_hashes, _token_hashes)

    d = _docs(spark, sf_dir)
    sh = (d.select("source", _tokens().alias("w"))
          .filter(F.size("w") >= 3)
          .select("source", _token_hashes(F.col("w")).alias("th"))
          .select("source", F.explode(
              _shingles_of_hashes("th")).alias("g"))
          .distinct()
          .persist())
    tot = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    pair = (a.join(b, (F.col("a.g") == F.col("b.g"))
                   & (F.col("a.source") < F.col("b.source")))
            .groupBy(F.col("a.source").alias("source_a"),
                     F.col("b.source").alias("source_b"))
            .agg(F.count(F.lit(1)).alias("n_shared")))
    ta = tot.select(F.col("source").alias("source_a"),
                    F.col("n_sh").alias("n_sh_a"))
    tb = tot.select(F.col("source").alias("source_b"),
                    F.col("n_sh").alias("n_sh_b"))
    return (pair.join(F.broadcast(ta), "source_a")
            .join(F.broadcast(tb), "source_b")
            .select("source_a", "source_b",
                    F.col("n_sh_a").cast("bigint").alias("n_sh_a"),
                    F.col("n_sh_b").cast("bigint").alias("n_sh_b"),
                    F.col("n_shared").cast("bigint").alias("n_shared"),
                    F.round(F.col("n_shared") * F.lit(1.0)
                            / F.least("n_sh_a", "n_sh_b"), 6)
                    .alias("containment"))
            .orderBy("source_a", "source_b"))


# ================================================== corpus release
# The end-to-end "corpus release" pipeline (VERDICT_r7 #8): dedup ->
# quality filter -> decontaminate -> shard, composed THROUGH the
# engine.pipeline lifecycle (engine.py) rather than called directly —
# each stage below is a reusable DataFrame->DataFrame transform the
# engine's TRANSFORMS registry exposes by name, so the §3c user API
# composes the same graded operator logic.


def corpus_dedup_keep_best(docs: DataFrame) -> DataFrame:
    """df->df stage twin of train_dedup_keep_best's keeper rule: block
    on the md5 head fingerprint (first 10 tokens) and keep the richest
    copy per group (max distinct tokens, then max tokens, then min
    doc_id) — singleton groups pass through. Preserves the input
    schema. One fingerprint-keyed shuffle; the rank window is
    PARTITIONED by fingerprint (bounded groups), never global."""
    feat = (docs
            .select("*", _tokens().alias("__cr_w"))
            .select("*",
                    F.md5(F.concat_ws(" ", F.slice("__cr_w", 1, 10)))
                    .alias("__cr_fp"),
                    F.size(F.array_distinct("__cr_w")).alias("__cr_ty"),
                    F.size("__cr_w").alias("__cr_nt"))
            .drop("__cr_w"))
    win = W.partitionBy("__cr_fp").orderBy(
        F.desc("__cr_ty"), F.desc("__cr_nt"), F.asc("doc_id"))
    return (feat.withColumn("__cr_rn", F.row_number().over(win))
            .where(F.col("__cr_rn") == 1)
            .drop("__cr_fp", "__cr_ty", "__cr_nt", "__cr_rn"))


def corpus_quality_keep(docs: DataFrame) -> DataFrame:
    """df->df stage twin of train_quality_filter's keep verdict: token
    count, mean word length, and stopword-fraction gates (C4/Gopher
    style); only kept rows survive. Narrow scan, zero shuffles; the
    token array and raw counts are materialized projections (HOF-CSE
    discipline). Preserves the input schema."""
    feat = (docs
            .select("*", _tokens().alias("__cr_w"))
            .select("*",
                    F.size("__cr_w").alias("__cr_nt"),
                    F.aggregate("__cr_w", F.lit(0).cast("long"),
                                lambda acc, x: acc + F.length(x))
                    .alias("__cr_ch"),
                    F.size(F.filter("__cr_w",
                                    lambda x: x.isin(*_QF_STOP)))
                    .alias("__cr_st"))
            .drop("__cr_w"))
    mean_wlen = F.round(F.col("__cr_ch") * F.lit(1.0) / F.col("__cr_nt"), 4)
    stop_frac = F.round(F.col("__cr_st") * F.lit(1.0) / F.col("__cr_nt"), 4)
    keep = ((F.col("__cr_nt") >= _QF_MIN_TOK)
            & (F.col("__cr_nt") <= _QF_MAX_TOK)
            & (mean_wlen >= _QF_WLEN_LO) & (mean_wlen <= _QF_WLEN_HI)
            & (stop_frac >= _QF_MIN_STOP_FRAC))
    return (feat.where(keep)
            .drop("__cr_nt", "__cr_ch", "__cr_st"))


def corpus_benchmark_shingles(docs: DataFrame) -> DataFrame:
    """The held-out eval set's distinct 3-gram shingle union (hashed),
    from the RAW documents frame — benchmark membership is defined on
    the corpus before any filtering, so contamination survives even if
    a bench doc would itself have been deduped or quality-dropped.
    Eval suites are tiny by definition: the result is broadcast."""
    from mongo_cdc_spark.operators.dedup import (_shingles_of_hashes,
                                                 _token_hashes)
    return (docs.where(F.col("doc_id") % _BENCH_MOD == 0)
            .select(_tokens().alias("w"))
            .filter(F.size("w") >= 3)
            .select(_token_hashes(F.col("w")).alias("th"))
            .select(F.explode(_shingles_of_hashes("th")).alias("h"))
            .distinct())


def corpus_decontaminate(bench: DataFrame):
    """Factory: df->df stage dropping (a) the benchmark docs
    themselves and (b) any corpus doc whose shingle overlap with the
    broadcast benchmark union is >= _CONTAM_FRAC (train_decontaminate's
    rule). The overlap join touches only shingles that HIT the
    benchmark set (broadcast hash join, map-side partial agg); the
    contaminated-id frame then anti-joins back on doc_id."""
    def stage(docs: DataFrame) -> DataFrame:
        from mongo_cdc_spark.operators.dedup import (_shingles_of_hashes,
                                                     _token_hashes)
        # barrier: the corpus frame feeds BOTH the shingle/overlap
        # branch and the anti-join's left side — without it the whole
        # upstream lineage (dedup window + quality gates + tokenize)
        # re-derives once per consumer (measured 3x at sf0.1,
        # 9.0 s -> 3.4 s for the full release chain)
        corpus = (docs.where(F.col("doc_id") % _BENCH_MOD != 0)
                  .persist())
        # second materialization BEFORE the explode: Generate pushdown
        # re-inlines the whole token-hash/shingle transform per
        # reference (size + explode = 2x) — the exact train_
        # decontaminate lesson; measured 7.3 s -> sub-second for this
        # stage at sf0.1 with the materialized shingle frame
        shf = (corpus
               .select("doc_id", _tokens().alias("w"))
               .filter(F.size("w") >= 3)
               .select("doc_id", _token_hashes(F.col("w")).alias("th"))
               .select("doc_id", _shingles_of_hashes("th").alias("sh"))
               .withColumn("n_sh", F.size("sh"))
               .persist())
        sh = shf.select("doc_id", "n_sh", F.explode("sh").alias("h"))
        contaminated = (sh.join(F.broadcast(bench), "h")
                        .groupBy("doc_id", "n_sh")
                        .agg(F.count(F.lit(1)).alias("n_ov"))
                        .where(F.col("n_ov") * F.lit(1.0) / F.col("n_sh")
                               >= _CONTAM_FRAC)
                        .select("doc_id"))
        return corpus.join(contaminated, "doc_id", "left_anti")
    return stage


def corpus_shard_assign(n_shards: int = _N_SHARDS):
    """Factory: df->df stage adding the deterministic `shard` column
    (md5 permutation-key prefix mod N — train_shard_assign's rule,
    bit-identical across engines). Pure projection, no shuffle."""
    def stage(docs: DataFrame) -> DataFrame:
        return docs.withColumn(
            "shard", _shard_of(_perm_key(), n_shards).cast("int"))
    return stage


_RELEASE_SHARD = _SHARD_SQL.format(k=_PERM_SQL, n=_N_SHARDS)

_RELEASE_SQL = f"""
    WITH feat AS (
      SELECT doc_id,
             md5(array_to_string(w[1:10], ' ')) AS fp,
             len(list_distinct(w)) AS n_types,
             len(w) AS n_tok,
             ROUND(list_sum(list_transform(w, x -> length(x))) * 1.0
                   / len(w), 4) AS mean_wlen,
             ROUND(len(list_filter(w, x -> x IN ({_QF_STOP_SQL}))) * 1.0
                   / len(w), 4) AS stop_frac,
             w
      FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
            FROM documents)
    ), dd AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp
                     ORDER BY n_types DESC, n_tok DESC, doc_id) AS rn
        FROM feat) AS r WHERE rn = 1
    ), q AS (
      SELECT doc_id, n_tok, w FROM dd
      WHERE n_tok >= {_QF_MIN_TOK} AND n_tok <= {_QF_MAX_TOK}
        AND mean_wlen >= {_QF_WLEN_LO} AND mean_wlen <= {_QF_WLEN_HI}
        AND stop_frac >= {_QF_MIN_STOP_FRAC}
    ), btoks AS (
      SELECT regexp_split_to_array(text, '\\s+') AS w
      FROM documents WHERE doc_id % {_BENCH_MOD} = 0
    ), bench AS (
      SELECT DISTINCT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS h
      FROM (SELECT *, unnest(generate_series(1, len(w) - 2)) AS i
            FROM btoks) AS b
    ), csh AS (
      SELECT doc_id,
             list(DISTINCT w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS s
      FROM (SELECT doc_id, w,
                   unnest(generate_series(1, len(w) - 2)) AS i
            FROM q WHERE doc_id % {_BENCH_MOD} <> 0) AS c0
      GROUP BY doc_id
    ), contam AS (
      SELECT c.doc_id
      FROM (SELECT doc_id, len(s) AS n_sh, unnest(s) AS h
            FROM csh) AS c
      JOIN bench USING (h)
      GROUP BY c.doc_id, c.n_sh
      HAVING COUNT(*) * 1.0 / n_sh >= {_CONTAM_FRAC}
    ), rel AS (
      SELECT doc_id, n_tok FROM q
      WHERE doc_id % {_BENCH_MOD} <> 0
        AND doc_id NOT IN (SELECT doc_id FROM contam)
    )
    SELECT CAST({_RELEASE_SHARD} AS INT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM rel
    GROUP BY 1
    ORDER BY shard
"""


@query("train_corpus_release", sql=_RELEASE_SQL)
def train_corpus_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-release pipeline composed through the §3c
    engine lifecycle: engine.pipeline(documents).transform(
    dedup keep-best -> quality filter -> decontaminate -> shard).run(),
    reported as the per-shard release manifest (doc and token counts).
    The dedup/quality stages are resolved BY NAME from the engine's
    TRANSFORMS registry; decontaminate and shard are parameterized
    factories. Every stage reuses the graded operators' exact rules
    (train_dedup_keep_best, train_quality_filter, train_decontaminate,
    train_shard_assign), so the oracle states the whole chain as one
    CTE pipeline.

    Scale: stage costs are the constituent operators' costs — one
    fingerprint-keyed shuffle + partitioned rank (dedup), a narrow
    scan (quality), a broadcast shingle join + doc-grain partial agg +
    anti-join (decon), a pure projection (shard), then the 16-row
    manifest agg. No global window, no Python, nothing quadratic."""
    from mongo_cdc_spark import engine
    raw = _docs(spark, sf_dir)
    bench = corpus_benchmark_shingles(raw)
    released = (engine.pipeline({"kind": "table", "sf_dir": sf_dir,
                                 "table": "documents"}, spark=spark)
                .transform("corpus_dedup_keep_best",
                           "corpus_quality_keep",
                           corpus_decontaminate(bench),
                           corpus_shard_assign(_N_SHARDS))
                .run())
    return (released
            .select("shard", F.size(_tokens()).alias("n_tok"))
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").cast("bigint").alias("n_tokens"))
            .orderBy("shard"))


# -------------------------------- weighted sampling (A-Res, ES 2006)

_ARES_K = 50
_ARES_DEN = 4503599627370496.0  # 16^13 = 2^52: 13-hex-digit space


@query("sample_weighted_ares", sql=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars AS w,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                ::BIGINT + 1) / ({_ARES_DEN} + 1) AS u
      FROM documents WHERE n_chars >= 1
    ), scored AS (
      SELECT doc_id, w, ROUND(ln(u) / w, 8) AS lnkey FROM keyed
    )
    SELECT CAST(rnk AS INT) AS rank, doc_id,
           CAST(w AS INT) AS weight, lnkey
    FROM (SELECT *, ROW_NUMBER() OVER (
              ORDER BY lnkey DESC, doc_id) AS rnk
          FROM scored) AS r
    WHERE rnk <= {_ARES_K}
    ORDER BY rank
""")
def sample_weighted_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted random sampling without replacement via A-Res
    (Efraimidis-Spirakis 2006): each item draws key u^(1/w) — here in
    log form ln(u)/w, largest {_ARES_K} win — which makes a
    SINGLE-PASS distributed weighted sample exact: inclusion follows
    the sequential weighted draw, yet the selection is just a top-k.
    The length-weighted document sample every training-data size
    study starts from (longer docs = proportionally more tokens =
    proportionally more likely sampled). u derives from md5(doc_id)'s
    first 13 hex digits (a 2^52-point grid, +1 so u > 0), so BOTH
    engines replay the same "randomness" bit-for-bit — the repo's
    deterministic-replay convention for probabilistic operators.

    Scale: one narrow scan projection (md5 + one ln + one divide per
    row), then TakeOrderedAndProject top-{_ARES_K} — per-partition
    heaps, no global sort, no shuffle beyond the k winners; the rank
    window runs over the k survivors (declared rank-after-LIMIT)."""
    docs = _docs(spark, sf_dir).where(F.col("n_chars") >= 1)
    u = ((F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                             1, 13), 16, 10).cast("long") + 1)
         / F.lit(_ARES_DEN + 1))
    scored = docs.select(
        "doc_id", F.col("n_chars").alias("w"),
        F.round(F.log(u) / F.col("n_chars"), 8).alias("lnkey"))
    top = (scored.orderBy(F.desc("lnkey"), F.asc("doc_id"))
           .limit(_ARES_K))
    from pyspark.sql import Window as _W
    rw = _W.orderBy(F.desc("lnkey"), F.asc("doc_id"))
    return (top.withColumn("rank", F.row_number().over(rw))
            .select(F.col("rank").cast("int").alias("rank"),
                    "doc_id",
                    F.col("w").cast("int").alias("weight"),
                    "lnkey")
            .orderBy("rank"))


_DSIR_BUCKETS = 64
_DSIR_TOPK = 20


@query("train_dsir_importance", sql=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT
               % {_DSIR_BUCKETS} AS b
      FROM (SELECT doc_id, lang,
                   unnest(regexp_split_to_array(text, '\\s+')) AS tok
            FROM documents)
    ), pdb AS (
      SELECT doc_id, lang, b, COUNT(*) AS c
      FROM toks GROUP BY 1, 2, 3
    ), tgt AS (
      SELECT b,
             SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS ct,
             SUM(c) AS cs
      FROM pdb GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(ct) AS DOUBLE) AS t,
             CAST(SUM(cs) AS DOUBLE) AS s
      FROM tgt
    ), li AS (
      SELECT g.b,
             CAST(ROUND((LN((CAST(COALESCE(tg.ct, 0) AS DOUBLE) + 1.0)
                            / (tot.t + {_DSIR_BUCKETS}))
                         - LN((CAST(COALESCE(tg.cs, 0) AS DOUBLE)
                               + 1.0)
                              / (tot.s + {_DSIR_BUCKETS}))) * 1e6)
                  AS BIGINT) AS li
      FROM generate_series(0, {_DSIR_BUCKETS - 1}) g(b)
      LEFT JOIN tgt tg ON tg.b = g.b
      CROSS JOIN tot
    ), scored AS (
      SELECT p.doc_id, MIN(p.lang) AS lang,
             CAST(SUM(p.c) AS BIGINT) AS n_tokens,
             CAST(SUM(p.c * li.li) AS BIGINT) AS score_micro
      FROM pdb p JOIN li ON li.b = p.b
      GROUP BY p.doc_id
    )
    SELECT s.doc_id, s.lang, d.source, s.n_tokens, s.score_micro,
           ROUND(CAST(s.score_micro AS DOUBLE) / 1e6, 6) AS score_nats
    FROM scored s JOIN documents d ON d.doc_id = s.doc_id
    ORDER BY s.score_micro DESC, s.doc_id
    LIMIT {_DSIR_TOPK}
""")
def train_dsir_importance(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """DSIR-style importance scoring for training-data selection
    (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): estimate target ('en' documents — the
    quality-domain proxy) and source (full pool) unigram
    distributions over {_DSIR_BUCKETS} hashed feature buckets with
    Laplace smoothing, then score every document by its hashed-ngram
    log importance ratio sum_b c_b(x) * [ln p_tgt(b) - ln p_src(b)]
    — the weight DSIR resamples by to shift a raw crawl toward a
    target domain. Emits the top-{_DSIR_TOPK} documents with exact
    micro-nat scores (the selection head; resampling = the
    sample_weighted_ares machinery applied to these weights).

    Determinism: bucket log-ratios are computed once on the bounded
    {_DSIR_BUCKETS}-row grid from EXACT integer counts and quantized
    to micro-nat BIGINTs, so every per-doc score is an exact integer
    dot product — no double summation order anywhere; md5-derived
    buckets hash identically on both engines.

    Scale: ONE data-grain shuffle — the (doc, bucket) count (tokens
    explode narrowly first, the classic shingle shape). Target/source
    bucket totals fold FROM that frame (bucket-grain, map-side
    combined); the {_DSIR_BUCKETS}-row ratio table broadcasts back;
    scoring is a broadcast join + per-doc sum; TakeOrdered serves the
    head. The frame is persisted for its three consumers — a cached
    frame takes no checkpoint lock, so concurrent broadcast-thread
    materialization cannot hit the round-9 deadlock class."""
    docs = load_table(spark, sf_dir, "documents")
    b = F.pmod(
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint"),
        F.lit(_DSIR_BUCKETS))
    pdb = (docs
           .select("doc_id", "lang",
                   F.explode(F.split("text", r"\s+")).alias("tok"))
           .select("doc_id", "lang", b.alias("b"))
           .groupBy("doc_id", "lang", "b")
           .agg(F.count(F.lit(1)).alias("c"))
           .persist())
    tgt = (pdb.groupBy("b")
           .agg(F.sum(F.when(F.col("lang") == "en", F.col("c"))
                      .otherwise(0)).alias("ct"),
                F.sum("c").alias("cs")))
    tot = tgt.agg(F.sum("ct").cast("double").alias("t"),
                  F.sum("cs").cast("double").alias("s"))
    spine = spark.range(_DSIR_BUCKETS).select(
        F.col("id").cast("bigint").alias("b"))
    li = (spine.join(tgt, "b", "left")
          .crossJoin(F.broadcast(tot))
          .select("b", F.round(
              (F.log((F.coalesce(F.col("ct"), F.lit(0))
                      .cast("double") + 1.0)
                     / (F.col("t") + _DSIR_BUCKETS))
               - F.log((F.coalesce(F.col("cs"), F.lit(0))
                        .cast("double") + 1.0)
                       / (F.col("s") + _DSIR_BUCKETS))) * 1e6)
              .cast("bigint").alias("li")))
    scored = (pdb.join(F.broadcast(li), "b")
              .groupBy("doc_id")
              .agg(F.min("lang").alias("lang"),
                   F.sum("c").cast("bigint").alias("n_tokens"),
                   F.sum(F.col("c") * F.col("li")).cast("bigint")
                   .alias("score_micro")))
    top = (scored
           .orderBy(F.desc("score_micro"), F.asc("doc_id"))
           .limit(_DSIR_TOPK))
    return (docs.select("doc_id", "source")
            .join(F.broadcast(top), "doc_id")
            .select("doc_id", "lang", "source", "n_tokens",
                    "score_micro",
                    F.round(F.col("score_micro").cast("double") / 1e6,
                            6).alias("score_nats"))
            .orderBy(F.desc("score_micro"), F.asc("doc_id")))


# -------------------- Bloom-prefilter decontamination (FPR audit)

_BLOOM_M = 4096   # filter bits
_BLOOM_K = 3      # hashes per shingle


@query("train_decontaminate_bloom", sql=f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list(DISTINCT w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS s
      FROM (SELECT *, unnest(generate_series(1, len(w) - 2)) AS i
            FROM toks)
      GROUP BY doc_id
    ), bench AS (
      SELECT DISTINCT unnest(s) AS h FROM sh
      WHERE doc_id % {_BENCH_MOD} = 0
    ), ks AS (SELECT unnest(generate_series(0, {_BLOOM_K - 1})) AS k),
    bits AS (
      SELECT DISTINCT
             ('0x' || substr(md5(h || ':' || CAST(k AS VARCHAR)),
                             1, 15))::BIGINT % {_BLOOM_M} AS pos
      FROM bench CROSS JOIN ks
    ), corpus AS (
      SELECT doc_id, unnest(s) AS h
      FROM sh WHERE doc_id % {_BENCH_MOD} <> 0
    ), probe AS (
      SELECT c.doc_id, c.h,
             SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)
               AS hits
      FROM corpus c CROSS JOIN ks
      LEFT JOIN bits b
        ON b.pos = ('0x' || substr(md5(c.h || ':'
                                       || CAST(ks.k AS VARCHAR)),
                                   1, 15))::BIGINT % {_BLOOM_M}
      GROUP BY c.doc_id, c.h
    ), truth AS (
      SELECT c.doc_id, c.h,
             MAX(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END)
               AS is_real
      FROM corpus c LEFT JOIN bench b ON b.h = c.h
      GROUP BY c.doc_id, c.h
    ), j AS (
      SELECT p.doc_id,
             CASE WHEN p.hits = {_BLOOM_K} THEN 1 ELSE 0 END
               AS flagged,
             t.is_real
      FROM probe p JOIN truth t
        ON t.doc_id = p.doc_id AND t.h = p.h
    ), doc AS (
      SELECT doc_id, MAX(flagged) AS doc_flagged,
             MAX(is_real) AS doc_real
      FROM j GROUP BY 1
    ), shingle_stats AS (
      SELECT SUM(CASE WHEN is_real = 0 THEN flagged ELSE 0 END)
               AS fp_shingles,
             SUM(CASE WHEN is_real = 0 THEN 1 ELSE 0 END)
               AS clean_shingles
      FROM j
    ), nb AS (SELECT COUNT(*) AS n_bench FROM bench),
    nbits AS (SELECT COUNT(*) AS n_bits FROM bits)
    SELECT CAST(nb.n_bench AS BIGINT) AS n_bench_shingles,
           CAST(nbits.n_bits AS BIGINT) AS n_bits_set,
           CAST(COUNT(*) AS BIGINT) AS n_corpus_docs,
           CAST(SUM(d.doc_flagged) AS BIGINT) AS flagged_docs,
           CAST(SUM(d.doc_real) AS BIGINT) AS true_overlap_docs,
           CAST(SUM(CASE WHEN d.doc_flagged = 1 AND d.doc_real = 0
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS false_positive_docs,
           ROUND(s.fp_shingles / (s.clean_shingles * 1e0), 6)
             AS shingle_fpr_measured,
           ROUND(POW(nbits.n_bits / ({_BLOOM_M} * 1e0),
                     {_BLOOM_K}), 6) AS shingle_fpr_bits
    FROM doc d CROSS JOIN shingle_stats s
    CROSS JOIN nb CROSS JOIN nbits
    GROUP BY nb.n_bench, nbits.n_bits, s.fp_shingles,
             s.clean_shingles
""")
def train_decontaminate_bloom(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Bloom-prefilter decontamination with its false-positive rate
    MEASURED against the exact answer: the benchmark shingle set
    compresses to a {_BLOOM_M}-bit / {_BLOOM_K}-hash Bloom filter
    (the structure a 100 TB decontamination pass ships to every
    executor instead of the full eval-shingle set), corpus shingles
    probe it, and the same query computes the exact-join truth so
    the report carries flagged vs truly-contaminated docs, the
    measured clean-shingle FPR, and the bits-occupancy prediction
    (set_bits/M)^K it should match. This is the audit that tells a
    pipeline whether its Bloom budget (bits per eval shingle) is
    spent right BEFORE trusting the prefilter at scale — the exact
    twin (train_decontaminate) stays the semantic baseline.

    Determinism: bit positions come from the engine-portable 60-bit
    md5 prefix (the Count-Min/SimHash convention), so DuckDB replays
    the ENTIRE filter bit-for-bit; every reported number is an exact
    integer ratio. Scale (VERDICT_r9 task #5 plan): the finished
    filter is materialized once on the driver — a bounded collect of
    <= {_BLOOM_M} positions, the DESIGN CONSTANT, i.e. exactly the
    512-byte bitmap a 100 TB pass broadcasts to every executor — and
    probed JVM-side via a constant-folded bitmap literal inside a
    `forall` over the {_BLOOM_K} hash positions: NO x{_BLOOM_K} row
    expansion, NO probe-side join, and ONE data-grain shuffle total
    (the doc-grain agg; the old plan shuffled the expanded shingles
    twice). The truth join broadcasts the (tiny by construction)
    bench shingle union exactly as the exact twin does. Shingles
    are raw 3-gram strings (not dedup.shingle_sets' cached int64
    form): the filter hashes the shingle TEXT."""
    # RAW STRING shingles (not dedup.shingle_sets' int64-hash form):
    # the Bloom positions are md5 digests of the shingle TEXT, which
    # both engines must compute from identical bytes — the form a
    # cross-system Bloom exchange would standardize on.
    # The fixture is one parquet file below maxPartitionBytes, so the
    # scan yields ONE partition and the md5-heavy probe map would run
    # on a single core; a doc-grain repartition buys the parallelism
    # a multi-file 100 TB layout has naturally (at scale this
    # exchange is unnecessary and can be dropped — the probe is
    # embarrassingly parallel over scan splits).
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text")

    def shingles(d: DataFrame) -> DataFrame:
        toks = (d.select("doc_id", _tokens().alias("w"))
                .filter(F.size("w") >= 3))
        # 3-grams via zip_with over three slices, NOT element_at(w, i)
        # inside the lambda: InferFiltersFromGenerate clones the
        # generator into a Filter and pushdown inlines w = split(text)
        # into that clone — a lambda that indexes w would then
        # re-split the whole document PER ELEMENT (measured 10x:
        # 5.7 s -> 0.5 s for the bench leg). With only lambda-local
        # references, the inlined split stays once-per-row.
        return toks.select(
            "doc_id",
            F.expr("array_distinct(zip_with("
                   "zip_with(slice(w, 1, size(w) - 2), "
                   "slice(w, 2, size(w) - 2), "
                   "(a, b) -> concat(a, ' ', b)), "
                   "slice(w, 3, size(w) - 2), "
                   "(ab, c) -> concat(ab, ' ', c)))").alias("sh"))

    # Split bench/corpus on the RAW docs before the (expensive)
    # tokenize+shingle projection: the bench side is 1/_BENCH_MOD of
    # the corpus and needs no exchange, while the corpus side gets a
    # doc-grain repartition — the fixture is one parquet file below
    # maxPartitionBytes, so without it the shingle construction runs
    # on a single core (a multi-file 100 TB layout parallelizes over
    # scan splits naturally and can drop this exchange).
    sh_bench = shingles(docs.where(F.col("doc_id") % _BENCH_MOD == 0))
    sh_corpus = shingles(
        docs.where(F.col("doc_id") % _BENCH_MOD != 0)
        .repartition(spark.sparkContext.defaultParallelism))
    ks = spark.range(_BLOOM_K).select(
        F.col("id").cast("int").alias("k"))

    def pos(h_col, k_col):
        hx = F.md5(F.concat_ws(":", h_col, k_col).cast("binary"))
        return (F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
                % _BLOOM_M)

    bench = (sh_bench.select(F.explode("sh").alias("h")).distinct()
             .persist())
    bits = (bench.crossJoin(F.broadcast(ks))
            .select(pos(F.col("h"), F.col("k")).alias("pos"))
            .distinct())
    # The filter itself: <= _BLOOM_M positions (4096 bits = 512
    # bytes) — the declared bounded-collect class, sized by a design
    # constant, never by the data. This IS the artifact a cluster
    # run ships; probing it is then pure map-side arithmetic.
    positions = sorted(r["pos"] for r in bits.collect())
    bitmap = bytearray(_BLOOM_M // 8)
    for p in positions:
        bitmap[p // 8] |= 1 << (p % 8)
    n_bits = len(positions)
    # JVM-side probe, zero row expansion: map the K hash slots to
    # their md5 positions, then test each against the constant
    # bitmap (unhex of a literal folds to a binary constant; the
    # byte probe is an O(1) slice + shift per hash).
    pos_sql = (f"cast(conv(substring(md5(cast(concat_ws(':', h, k) "
               f"as binary)), 1, 15), 16, 10) as bigint) "
               f"% {_BLOOM_M}")
    flag_sql = (
        f"forall(transform(sequence(0, {_BLOOM_K - 1}), "
        f"k -> {pos_sql}), "
        f"p -> ((shiftright(cast(conv(hex(substring("
        f"unhex('{bitmap.hex().upper()}'), "
        f"cast(p div 8 as int) + 1, 1)), 16, 10) as int), "
        f"cast(p % 8 as int)) & 1) = 1))")
    corpus = sh_corpus.select("doc_id", F.explode("sh").alias("h"))
    # ONE pass at shingle grain computes BOTH the Bloom verdict and
    # the exact truth (broadcast bench membership rides along), then
    # collapses straight to doc grain carrying the shingle-level FPR
    # partials — the old plan's (doc_id, h) regroup of the expanded
    # rows is gone entirely.
    j = (corpus
         .withColumn("flagged", F.expr(flag_sql).cast("int"))
         .join(F.broadcast(bench.withColumn("real", F.lit(1))),
               "h", "left")
         .select("doc_id", "flagged",
                 F.coalesce(F.col("real"), F.lit(0)).alias("is_real")))
    doc = (j.groupBy("doc_id")
           .agg(F.max("flagged").alias("doc_flagged"),
                F.max("is_real").alias("doc_real"),
                F.sum(F.when(F.col("is_real") == 0, F.col("flagged"))
                      .otherwise(F.lit(0))).alias("fp_sh"),
                F.sum((F.col("is_real") == 0).cast("int"))
                .alias("clean_sh")))
    nb = bench.agg(F.count(F.lit(1)).alias("n_bench"))
    out = (doc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_corpus_docs"),
        F.sum("doc_flagged").cast("bigint").alias("flagged_docs"),
        F.sum("doc_real").cast("bigint").alias("true_overlap_docs"),
        F.sum(F.when((F.col("doc_flagged") == 1)
                     & (F.col("doc_real") == 0), 1).otherwise(0))
        .cast("bigint").alias("false_positive_docs"),
        F.sum("fp_sh").alias("fp_shingles"),
        F.sum("clean_sh").alias("clean_shingles"))
        .crossJoin(F.broadcast(nb)))
    return out.select(
        F.col("n_bench").cast("bigint").alias("n_bench_shingles"),
        F.lit(n_bits).cast("bigint").alias("n_bits_set"),
        "n_corpus_docs", "flagged_docs", "true_overlap_docs",
        "false_positive_docs",
        F.round(F.col("fp_shingles")
                / (F.col("clean_shingles") * F.lit(1.0)), 6)
        .alias("shingle_fpr_measured"),
        F.round(F.pow(F.lit(n_bits) / (F.lit(_BLOOM_M) * F.lit(1.0)),
                      _BLOOM_K), 6).alias("shingle_fpr_bits"))
