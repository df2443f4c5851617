"""Text-analysis tests, including the BPE-ish regex pre-tokenizer."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from mongo_cdc_spark.operators import text


def test_bpe_pattern_splits_runs():
    """Python re, Java regex, and RE2 agree on this pattern subset —
    verify semantics once here in plain Python."""
    toks = re.findall(text.BPE_PATTERN, "don't 123 abc42!?  x")
    assert toks == ["don", "'", "t", "123", "abc", "42", "!?", "x"]


def test_bpe_ish_tokens_column(spark):
    df = spark.createDataFrame([("it's 2024, ok?",), ("",)], "text string")
    got = df.select(
        text.bpe_ish_tokens(F.col("text")).alias("t")).collect()
    assert got[0].t == ["it", "'", "s", "2024", ",", "ok", "?"]
    assert got[1].t == []


def test_langid_prefers_marker_language(spark, sf_dir):
    got = text.text_langid_confusion(spark, sf_dir).toPandas()
    # confusion matrix covers every labeled doc exactly once
    from mongo_cdc_spark.io import load_table
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert got.n.sum() == n_docs


def test_quality_scores_bounded(spark, sf_dir):
    got = text.text_quality_scores(spark, sf_dir).toPandas()
    assert got.avg_stop_ratio.between(0, 1).all()
    assert got.avg_quality.between(0, 1).all()


def test_repetition_signals_bounded(spark, sf_dir):
    got = text.text_repetition_signals(spark, sf_dir).toPandas()
    assert (got.type_token_ratio.between(0, 1)).all()
    assert (got.top_token_frac.between(0, 1)).all()
    assert (got.dup_bigram_frac.between(0, 1)).all()
    # word-soup corpus from a tiny vocabulary: repetition must register
    assert got.dup_bigram_frac.mean() > 0
    assert (got.n_tokens > 0).all()


def test_bm25_ranks_rare_term_docs_first(spark, sf_dir):
    """A doc containing the rare probe term 'dup' (df~5%) gets a large
    idf contribution, so the top of the BM25 list must be dominated by
    'dup'-containing docs; ranks must be contiguous from 1."""
    from mongo_cdc_spark.operators import text as T
    got = T.text_bm25_topk(spark, sf_dir).toPandas()
    assert list(got.rn) == list(range(1, len(got) + 1))
    assert got.bm25.is_monotonic_decreasing
    docs = T._docs(spark, sf_dir).toPandas().set_index("doc_id")
    top3_texts = [docs.loc[d, "text"] for d in got.doc_id.head(3)]
    assert all(" dup " in f" {t} " for t in top3_texts)


def test_rrf_fusion_scores_are_rank_sums(spark, sf_dir):
    """RRF score must equal the sum of 1/(60+rank) contributions of
    the lists the doc appears in (exact double arithmetic)."""
    from mongo_cdc_spark.operators import text as T
    got = T.search_rrf_fusion(spark, sf_dir).toPandas()
    assert list(got.rn) == list(range(1, len(got) + 1))
    for _, r in got.iterrows():
        want = 0.0
        if r.rank_bm25 == r.rank_bm25:  # not NaN
            want += 1.0 / (60 + r.rank_bm25)
        if r.rank_tfidf == r.rank_tfidf:
            want += 1.0 / (60 + r.rank_tfidf)
        assert abs(r.rrf - round(want, 6)) < 1e-9


# ------------------------------------------------------ PMI collocations


def test_pmi_bigrams_matches_python_counts(spark, sf_dir):
    import math
    from collections import Counter

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.text import (
        PMI_MIN_COUNT, PMI_TOP, text_pmi_bigrams)

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    uni: Counter = Counter()
    big: Counter = Counter()
    n_b = 0
    import re
    for r in docs:
        w = re.split(r"\s+", r.text)
        uni.update(w)
        big.update(zip(w, w[1:]))
        n_b += max(len(w) - 1, 0)
    n_u = sum(uni.values())
    scored = sorted(
        ((round(math.log((c / n_b) / ((uni[a] / n_u) * (uni[b] / n_u))),
                6), a, b, c)
         for (a, b), c in big.items() if c >= PMI_MIN_COUNT),
        key=lambda t: (-t[0], t[1], t[2]))
    got = text_pmi_bigrams(spark, sf_dir).toPandas()
    assert len(got) == min(PMI_TOP, len(scored))
    for row, (pmi, a, b, c) in zip(got.itertuples(), scored):
        assert (row.w1, row.w2, row.n_pair) == (a, b, c)
        assert abs(row.pmi - pmi) < 2e-6


def test_zipf_fit_matches_numpy_ols(spark, sf_dir):
    import re
    from collections import Counter

    import numpy as np

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.text import (
        ZIPF_MIN_RANK_N, text_zipf_fit)

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    cnt: Counter = Counter()
    for r in docs:
        cnt.update(re.split(r"\s+", r.text))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    top = ranked[:ZIPF_MIN_RANK_N]
    lr = np.log(np.arange(1, len(top) + 1))
    lc = np.log([c for _, c in top])
    slope, intercept = np.polyfit(lr, lc, 1)
    r2 = np.corrcoef(lr, lc)[0, 1] ** 2
    row = text_zipf_fit(spark, sf_dir).collect()[0]
    assert row.n_ranks == ZIPF_MIN_RANK_N
    assert abs(row.zipf_slope - round(slope, 6)) < 1e-4
    assert abs(row.log_c0 - round(intercept, 6)) < 1e-4
    assert abs(row.r2 - round(r2, 6)) < 1e-4
    assert row.zipf_slope < 0  # frequencies decay with rank


def test_readability_proxy_matches_python(spark, sf_dir):
    import re
    from collections import defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.text import text_readability_proxy

    docs = (load_table(spark, sf_dir, "documents")
            .select("lang", "text").collect())
    spw_sum = defaultdict(float)
    fl_sum = defaultdict(float)
    n_docs = defaultdict(int)
    for r in docs:
        words = [w for w in re.split(r"\s+", r.text) if w]
        syl = sum(max(len(re.findall(r"[aeiouy]+", w)), 1)
                  for w in words)
        spw = syl / len(words)
        spw_sum[r.lang] += spw
        fl_sum[r.lang] += 206.835 - 1.015 * len(words) - 84.6 * spw
        n_docs[r.lang] += 1
    got = text_readability_proxy(spark, sf_dir).toPandas()
    for row in got.itertuples():
        assert row.n_docs == n_docs[row.lang]
        assert abs(row.avg_syl_per_word
                   - round(spw_sum[row.lang] / row.n_docs, 6)) < 2e-6
        assert abs(row.avg_flesch_proxy
                   - round(fl_sum[row.lang] / row.n_docs, 4)) < 2e-3


def test_bigram_logprob_plausible_range(spark, sf_dir):
    got = text.text_bigram_logprob(spark, sf_dir).toPandas()
    from mongo_cdc_spark.io import load_table
    docs = load_table(spark, sf_dir, "documents").toPandas()
    assert len(got) == len(docs)
    # each doc contributes len-1 bigrams; re.split mirrors the
    # engine's F.split(text, r"\s+") including empty edge tokens
    import re
    ntok = docs.set_index("doc_id").text.map(
        lambda t: len(re.split(r"\s+", t)))
    assert (got.set_index("doc_id").n_bigrams == ntok - 1).all()
    # smoothed log-probs are strictly negative and bounded below by
    # ln(1/(max_context + V)) (the rarest possible smoothed bigram)
    assert (got.logprob_mean < 0).all()
    assert (got.logprob_mean > -20).all()


def test_jsd_sources_bounded_and_positive(spark, sf_dir):
    got = text.text_js_divergence_sources(spark, sf_dir).toPandas()
    assert len(got) > 0
    # JSD in nats is bounded by ln(2)
    assert (got.jsd_nats >= 0).all()
    assert (got.jsd_nats <= 0.6932).all()
    assert (got.n_tokens > 0).all()


def test_hashing_trick_conserves_tokens(spark, sf_dir, oracle):
    """Bucket totals must conserve the corpus: sum(total_tf) = token
    count, every bucket in [0, 64), df bounded by the doc count, and
    collision load bounded by the vocabulary."""
    from mongo_cdc_spark.operators import text

    got = text.feature_hashing_trick(spark, sf_dir).toPandas()
    n_tok, n_doc, n_vocab = oracle.sql("""
        SELECT COUNT(*), COUNT(DISTINCT doc_id), COUNT(DISTINCT tok)
        FROM (SELECT doc_id,
                     unnest(regexp_split_to_array(text, '\\s+')) AS tok
              FROM documents)""").fetchone()
    assert got.total_tf.sum() == n_tok
    assert got.bucket.between(0, 63).all()
    assert got.df.le(n_doc).all()
    assert got.n_collided_terms.sum() == n_vocab


def test_phrase_match_equals_token_adjacency(spark, sf_dir):
    """Postings-join hit counts must equal a direct per-doc adjacency
    scan of the token arrays."""
    from mongo_cdc_spark.operators import text

    import re

    got = (text.search_phrase_match(spark, sf_dir).toPandas()
           .set_index("doc_id").n_hits)
    docs = text._docs(spark, sf_dir).select("doc_id", "text").toPandas()
    want = {}
    for r in docs.itertuples():
        # mirror the engine's F.split(text, r"\s+") exactly (keeps
        # empty edge tokens, unlike str.split())
        toks = re.split(r"\s+", r.text)
        n = sum(1 for a, b in zip(toks, toks[1:])
                if a == "fast" and b == "table")
        if n:
            want[r.doc_id] = n
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert sorted(got.items()) == sorted(top)


def test_rake_keywords_match_python_reference(spark, sf_dir):
    """Pure-Python RAKE over the corpus: same stopword segmentation,
    same deg/freq scores, same rounded top-k."""
    import re
    from collections import Counter, defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.text import (
        _STOPWORDS, RAKE_TOP, text_rake_keywords)

    docs = load_table(spark, sf_dir, "documents").select(
        "text").collect()
    stops = set(_STOPWORDS)
    phrases = []
    for d in docs:
        run = []
        # re.split mirrors the engine's F.split(text, r"\s+"); the
        # `elif tok` arm already drops any empty edge tokens
        for tok in re.split(r"\s+", d.text):
            if tok in stops:
                if run:
                    phrases.append(tuple(run))
                run = []
            elif tok:
                run.append(tok)
        if run:
            phrases.append(tuple(run))
    freq, deg = Counter(), Counter()
    for ph in phrases:
        for w in ph:
            freq[w] += 1
            deg[w] += len(ph)
    ws = {w: round(deg[w] / freq[w], 6) for w in freq}
    occ = Counter(phrases)
    scored = {}
    for ph, n in occ.items():
        scored[" ".join(ph)] = (round(sum(ws[w] for w in ph), 4), n)
    want = sorted(((s, p, n) for p, (s, n) in scored.items()),
                  key=lambda t: (-t[0], t[1]))[:RAKE_TOP]
    got = text_rake_keywords(spark, sf_dir).toPandas()
    have = [(r.score, r.phrase, int(r.n_occurrences))
            for r in got.itertuples()]
    assert have == want


def test_term_burstiness_matches_python_counter(spark, sf_dir):
    """Counter-based recompute of cf/df/sum(f^2) and both dispersion
    statistics for the reported top terms."""
    from collections import Counter, defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.text import (
        BURST_TOP, BURST_VMR_HI, text_term_burstiness)

    docs = load_table(spark, sf_dir, "documents").select(
        "text").collect()
    d = len(docs)
    cf, df, sf2 = Counter(), Counter(), Counter()
    for doc in docs:
        c = Counter(t for t in re.split(r"\s+", doc.text) if t)
        for tok, f in c.items():
            cf[tok] += f
            df[tok] += 1
            sf2[tok] += f * f
    want_order = sorted(cf, key=lambda t: (-cf[t], t))[:BURST_TOP]
    got = text_term_burstiness(spark, sf_dir).toPandas()
    assert list(got.tok) == want_order
    for r in got.itertuples():
        t = r.tok
        assert (int(r.corpus_freq), int(r.doc_freq)) == (cf[t], df[t])
        assert abs(r.burst_ewf - round(cf[t] / df[t], 6)) < 2e-6
        mean = cf[t] / d
        vmr = (sf2[t] / d - mean * mean) / mean
        assert abs(r.vmr - round(vmr, 6)) < 2e-6
        assert r.dispersion_class == (
            "bursty" if vmr > BURST_VMR_HI else "uniform")
        # burst size is at least 1 by construction
        assert r.burst_ewf >= 1


def test_yule_k_matches_python_counter(spark, sf_dir):
    from collections import Counter
    import re

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.text import text_yule_k

    docs = load_table(spark, sf_dir, "documents").toPandas()
    got = text_yule_k(spark, sf_dir).toPandas().set_index("source")
    for src, grp in docs.groupby("source"):
        tf = Counter()
        for t in grp.text:
            tf.update(re.split(r"\s+", t))
        n = sum(tf.values())
        vtypes = len(tf)
        sum_m2v = sum(m * m for m in tf.values())
        k = 1e4 * (sum_m2v - n) / (n * n)
        row = got.loc[src]
        assert (int(row.n_tokens), int(row.n_types)) == (n, vtypes)
        assert abs(row.ttr - round(vtypes / n, 6)) < 1e-9
        assert abs(row.yule_k - round(k, 6)) < 1e-6


# ----------------------------------------------------------- BM25


def test_bm25_matches_python_reference(spark, sf_dir):
    """Independent recompute of the Lucene-form BM25 on the fixture:
    pure-Python tf/df/avgdl over the same tokenization must reproduce
    every top-k score and the ranking."""
    import math

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.text import (_BM25_B, _BM25_K1,
                                                _BM25_QUERY, _BM25_TOPK,
                                                search_bm25_topk)

    # re.split(r"\s+") WITHOUT filtering matches F.split semantics
    # (keeps empty edge tokens) — str.split() would silently diverge
    # on dlen/avgdl if the fixture ever gained edge whitespace.
    import re
    docs = {r["doc_id"]: re.split(r"\s+", r["text"])
            for r in load_table(spark, sf_dir, "documents").collect()}
    n_docs = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n_docs
    df = {t: sum(1 for w in docs.values() if t in w)
          for t in _BM25_QUERY}
    scores = {}
    for did, w in docs.items():
        s, n_terms = 0.0, 0
        for t in _BM25_QUERY:
            tf = w.count(t)
            if tf == 0:
                continue
            n_terms += 1
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1)
            s += idf * tf * (_BM25_K1 + 1) / (
                tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * len(w) / avgdl))
        if n_terms:
            scores[did] = (round(s, 6), n_terms)
    want = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))
    want = [(i + 1, did, s, nt)
            for i, (did, (s, nt)) in enumerate(want[:_BM25_TOPK])]
    got = [(r["rank"], r["doc_id"],
            round(r["score"], 6), r["n_terms_matched"])
           for r in search_bm25_topk(spark, sf_dir).collect()]
    assert got == want


def test_textrank_matches_python_reference(spark, sf_dir):
    """Pure-Python power iteration on the same co-occurrence graph."""
    from collections import defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.text import (_TR_DAMP, _TR_ITERS,
                                                _TR_TOPK,
                                                text_textrank_keywords)

    docs = load_table(spark, sf_dir, "documents").select(
        "text").collect()
    import re
    wt = defaultdict(int)
    for d in docs:
        # \s+ split keeping empty edge tokens = F.split semantics.
        w = re.split(r"\s+", d["text"])
        for a, b in zip(w, w[1:]):
            if a != b:
                wt[(a, b)] += 1
                wt[(b, a)] += 1
    tot = defaultdict(int)
    for (a, _), c in wt.items():
        tot[a] += c
    score = {v: 1.0 for v in tot}
    for _ in range(_TR_ITERS):
        new = {}
        for v in tot:
            s = sum(wt[(u, v)] * score[u] / tot[u]
                    for u in tot if (u, v) in wt)
            new[v] = (1 - _TR_DAMP) + _TR_DAMP * s
        score = new
    rows = sorted(((round(s, 6), v) for v, s in score.items()),
                  key=lambda t: (-t[0], t[1]))
    want = [(i + 1, v, s) for i, (s, v) in enumerate(rows[:_TR_TOPK])]
    got = [(r["rank"], r["word"], round(r["textrank"], 6))
           for r in text_textrank_keywords(spark, sf_dir).collect()]
    assert got == want


def test_llr_collocations_matches_python_reference(spark, sf_dir):
    """Entropy-form Dunning G^2 with position-aware marginals."""
    import math
    import re
    from collections import Counter

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.text import (
        LLR_MIN_COUNT, LLR_TOP, text_llr_collocations)

    docs = load_table(spark, sf_dir, "documents").select(
        "text").collect()
    big = Counter()
    for r in docs:
        # re.split(r"\s+") without filtering matches F.split semantics
        w = re.split(r"\s+", r["text"])
        for a, b in zip(w, w[1:]):
            big[(a, b)] += 1
    firsts = Counter()
    seconds = Counter()
    for (a, b), c in big.items():
        firsts[a] += c
        seconds[b] += c
    n = sum(big.values())

    def xlx(v):
        return v * math.log(v) if v > 0 else 0.0

    scored = []
    for (a, b), c in big.items():
        if c < LLR_MIN_COUNT:
            continue
        r1, c1 = firsts[a], seconds[b]
        g2 = 2 * (xlx(c) + xlx(r1 - c) + xlx(c1 - c)
                  + xlx(n - r1 - c1 + c)
                  - xlx(r1) - xlx(n - r1) - xlx(c1) - xlx(n - c1)
                  + xlx(n))
        scored.append((round(g2, 4), a, b, c))
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = scored[:LLR_TOP]

    got = text_llr_collocations(spark, sf_dir).collect()
    assert len(got) == LLR_TOP
    for i, r in enumerate(got):
        g2, a, b, c = want[i]
        assert r["rank"] == i + 1
        assert (r["w1"], r["w2"]) == (a, b)
        assert r["n_pair"] == c
        assert math.isclose(r["llr"], g2, abs_tol=2e-4)


def test_no_per_element_resplit_in_any_tokenizing_plan(spark, sf_dir):
    """Regression guard for the quadratic generator-clone class
    (round-10 root cause): InferFiltersFromGenerate clones a
    generator into a Filter and pushdown inlines w = split(text)
    into the clone — if the lambda indexes w via element_at, the
    document re-splits once PER ELEMENT (O(tokens^2) per doc,
    invisible on short fixture docs, fatal on real documents). The
    optimized plan of every text/dedup/training query must therefore
    contain zero element_at(split(...)) sites; n-gram builders use
    zip_with over slices or a materialization barrier instead."""
    from mongo_cdc_spark.operators import dedup, text, training

    offenders = {}
    for mod in (text, dedup, training):
        for name, fn in mod.QUERIES.items():
            plan = (fn(spark, sf_dir)._jdf.queryExecution()
                    .optimizedPlan().toString())
            n = plan.count("element_at(split(")
            if n:
                offenders[name] = n
    assert not offenders, offenders
