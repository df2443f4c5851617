"""Semantic invariants for the training-pipeline operator pack
(mongo_cdc_spark/operators/training.py) — properties the DuckDB oracle
compare can't express: packing arithmetic, contamination ground truth on
a constructed micro-corpus, shard determinism and balance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_cdc_spark.operators import training


def test_sequence_pack_arithmetic(spark, sf_dir):
    rows = training.train_sequence_pack(spark, sf_dir).collect()
    assert rows
    # every offset sits inside the budget, and spans_boundary is exactly
    # the "doc crosses a chunk edge" predicate
    for r in rows:
        assert 0 <= r.seq_off < training._PACK_BUDGET
        assert r.spans_boundary == (r.seq_off + r.n_tok
                                    > training._PACK_BUDGET)
    # within a shard, docs tile the concatenated stream with no gaps:
    # sorted start offsets are the running sum of token counts
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        start = 0
        for r in shard_rows:  # output is ordered (shard, seq, off)
            assert r.seq_in_shard * training._PACK_BUDGET + r.seq_off == start
            start += r.n_tok


def test_shard_assign_deterministic_and_balanced(spark, sf_dir):
    a = training.train_shard_assign(spark, sf_dir).collect()
    b = training.train_shard_assign(spark, sf_dir).collect()
    assert a == b  # bit-identical across runs
    n = len(a)
    sizes = [0] * training._N_SHARDS
    for r in a:
        sizes[r.shard] += 1
    # md5 spreads uniformly: no shard more than 3x the ideal share
    assert max(sizes) <= 3 * max(1, n // training._N_SHARDS)
    # positions are 1..size contiguous per shard
    for shard, size in enumerate(sizes):
        pos = sorted(r.pos for r in a if r.shard == shard)
        assert pos == list(range(1, size + 1))


def test_decontaminate_flags_planted_copy(spark, tmp_path):
    """A corpus doc that IS a benchmark doc's text must be flagged; a
    disjoint-vocabulary doc must not appear at all."""
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, bench_text, "en", "bench", len(bench_text)),   # benchmark (id%19==0)
        (1, bench_text, "en", "copy", len(bench_text)),    # verbatim leak
        (2, "uno dos tres cuatro cinco seis siete", "es", "clean", 37),
        (3, "alpha beta gamma something else entirely now", "en", "partial", 44),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in
           training.train_decontaminate(spark, str(tmp_path)).collect()}
    assert out[1].contaminated and out[1].overlap_frac == 1.0
    assert 2 not in out                      # zero overlap → not emitted
    assert 3 in out and not out[3].contaminated  # 2/6 shingles < 0.5


def test_mixture_weights_flatten_to_uniform(spark, sf_dir):
    rows = training.train_mixture_weights(spark, sf_dir).collect()
    n_langs = len(rows)
    assert n_langs >= 2
    assert abs(sum(r.actual_share for r in rows) - 1.0) < 1e-3
    # reweighted share = actual_share * weight ≈ 1/n_langs for every lang
    for r in rows:
        assert r.actual_share * r.weight == pytest.approx(1 / n_langs,
                                                          rel=5e-3)


def test_redact_masks_every_occurrence(spark, sf_dir):
    out = training.train_regex_redact(spark, sf_dir)
    total_masked = out.agg(F.sum("n_masked")).first()[0]
    # cross-check against a direct count of the pattern tokens
    from mongo_cdc_spark.io import load_table
    direct = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", r"\s+")).alias("t"))
        .where(F.col("t").isin("key", "hash", "value"))
        .count())
    assert total_masked == direct


def test_curriculum_phases_balanced_and_ordered(spark, sf_dir):
    from mongo_cdc_spark.operators.training import (
        _CURR_PHASES, train_curriculum_order)

    out = train_curriculum_order(spark, sf_dir).toPandas()
    assert out.doc_id.is_unique
    assert set(out.phase) == set(range(1, _CURR_PHASES + 1))
    sizes = out.groupby("phase").size()
    assert sizes.max() - sizes.min() <= 1  # ntile balance
    for _, g in out.groupby("phase"):
        assert sorted(g.order_in_phase) == list(range(1, len(g) + 1))
    # phases are ordered by difficulty: every phase-p max difficulty
    # <= phase-(p+1) min (ties split by doc_id may equalize bounds)
    bounds = out.groupby("phase").difficulty.agg(["min", "max"])
    for p in range(1, _CURR_PHASES):
        assert bounds.loc[p, "max"] <= bounds.loc[p + 1, "min"] + 1e-9


def test_weighted_sample_contract(spark, sf_dir):
    """k rows per language, ranks dense 1..k, keys non-increasing, and
    the sample favors token mass: the mean token count of sampled docs
    must exceed the corpus mean (P(select) ∝ n_tok)."""
    got = training.train_weighted_sample(spark, sf_dir).toPandas()
    corpus = training._docs(spark, sf_dir).select(
        F.size(F.split("text", r"\s+")).alias("n")).toPandas()
    for _, grp in got.groupby("lang"):
        assert list(grp.sort_values("rank")["rank"]) == list(
            range(1, training._WS_K + 1))
        assert (grp.sort_values("rank").es_key.diff().dropna()
                <= 1e-12).all()
    assert got.n_tok.mean() > corpus.n.mean()


def test_quality_calibrate_deciles_partition_each_source(spark, sf_dir):
    from mongo_cdc_spark.operators.training import train_quality_calibrate

    from mongo_cdc_spark.io import load_table

    got = train_quality_calibrate(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents")
    per_source = {r.source: r.n for r in docs.groupBy("source")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
    for src, g in got.groupby("source"):
        g = g.sort_values("decile")
        assert g.n_docs.sum() == per_source[src]
        assert list(g.decile) == list(range(1, 11))
        # deciles form a monotone partition of the raw-score axis
        assert (g.q_min <= g.q_max).all()
        assert (g.q_max.values[:-1] <= g.q_min.values[1:] + 1e-12).all()
        assert g.cal_min.min() == 0.0
        assert g.cal_max.max() <= 1.0
        assert (g.cal_min <= g.cal_max).all()


# ------------------------------------------------------ BPE merge learning


def _py_bpe_merges(words, rounds):
    """Reference Sennrich-style BPE trainer over a word-freq dict."""
    from collections import Counter

    state = {w: list(w) for w in words}
    merges = []
    for _ in range(rounds):
        cnt: Counter = Counter()
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                cnt[(a, b)] += words[w]
        (a, b), n = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, a + b, n))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    return merges


def test_bpe_merges_match_reference_trainer(spark, sf_dir):
    import re
    from collections import Counter

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.training import (
        BPE_ROUNDS, train_bpe_merge_learn)

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    freq: Counter = Counter()
    for r in docs:
        freq.update(w for w in re.split(r"\s+", r.text) if w)
    want = _py_bpe_merges(dict(freq), BPE_ROUNDS)
    got = train_bpe_merge_learn(spark, sf_dir).collect()
    assert [(r.sym1, r.sym2, r.merged, r.cnt) for r in got] == want
    assert [r.round for r in got] == list(range(1, BPE_ROUNDS + 1))


def test_bpe_doubled_space_replace_is_greedy_merge():
    """The two-replace trick == greedy left-to-right BPE merging."""
    import random

    def greedy(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    def via_replace(syms, a, b):
        s = " " + " ".join(syms) + " "
        d = s.replace(" ", "  ")
        return d.replace(f" {a}  {b} ", f" {a}{b} ").split()

    rng = random.Random(7)
    alphabet = ["a", "b", "c", "ab", "cd", "d"]
    for _ in range(3000):
        syms = [rng.choice(alphabet) for _ in range(rng.randint(0, 14))]
        a, b = rng.choice(alphabet), rng.choice(alphabet)
        assert greedy(syms, a, b) == via_replace(syms, a, b)


def test_semantic_decontamination_matches_numpy(spark, sf_dir):
    import numpy as np

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.training import (
        SEM_DECON_BENCH_LABEL, SEM_DECON_TAU, train_decontaminate_semantic)

    df = load_table(spark, sf_dir, "embeddings").toPandas()
    V = np.stack(df.embedding.map(np.asarray)).astype(np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    is_bench = (df.label == SEM_DECON_BENCH_LABEL).to_numpy()
    ids = df.vec_id.to_numpy()
    sims = np.round(Vn[~is_bench] @ Vn[is_bench].T, 6)
    got = (train_decontaminate_semantic(spark, sf_dir)
           .toPandas().set_index("doc_vec_id"))
    assert len(got) == (~is_bench).sum()
    bench_ids = ids[is_bench]
    for r, cid in enumerate(ids[~is_bench]):
        row = got.loc[cid]
        over = sims[r] >= SEM_DECON_TAU
        assert bool(row.contaminated) == bool(over.any())
        if over.any():
            best = max(zip(sims[r][over], -bench_ids[over]))
            assert (row.bench_id, round(float(row.cos_sim), 6)) == \
                (-best[1], best[0])


def test_bpe_apply_compression_matches_reference(spark, sf_dir):
    import re
    from collections import Counter

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.training import (
        BPE_ROUNDS, train_bpe_tokenize_apply)

    docs = (load_table(spark, sf_dir, "documents")
            .select("lang", "text").collect())
    freq: Counter = Counter()
    for r in docs:
        freq.update(w for w in re.split(r"\s+", r.text) if w)
    merges = _py_bpe_merges(dict(freq), BPE_ROUNDS)
    # tokenize each distinct word with the learned merges
    def encode(word):
        syms = list(word)
        for a, b, _, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    n_sym = {w: len(encode(w)) for w in freq}
    got = train_bpe_tokenize_apply(spark, sf_dir).toPandas()
    from collections import defaultdict
    chars = defaultdict(int)
    toks = defaultdict(int)
    for r in docs:
        for w in re.split(r"\s+", r.text):
            if w:
                chars[r.lang] += len(w)
                toks[r.lang] += n_sym[w]
    for row in got.itertuples():
        assert row.n_chars == chars[row.lang]
        assert row.n_bpe_tokens == toks[row.lang]
        assert abs(row.chars_per_token
                   - round(chars[row.lang] / toks[row.lang], 6)) < 2e-6
        # merging can only shrink: tokens <= chars
        assert row.n_bpe_tokens <= row.n_chars


def test_passage_chunker_udtf_matches_jvm_path(spark, sf_dir):
    """The Python UDTF extension point produces the exact frame the
    graded JVM array formulation does (the §2.2 UDTF checkbox)."""
    import pandas as pd
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators import training

    jvm = (training.train_passage_chunks(spark, sf_dir).toPandas()
           .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    docs = (load_table(spark, sf_dir, "documents")
            .where("doc_id < 50").select("doc_id", "text"))
    via_udtf = (training.passage_chunks_udtf(spark, docs).toPandas()
                .sort_values(["doc_id", "chunk_idx"])
                .reset_index(drop=True))
    pd.testing.assert_frame_equal(jvm, via_udtf, check_dtype=False)


def test_passage_chunks_cover_document_with_overlap(spark, sf_dir):
    from mongo_cdc_spark.operators import training
    got = training.train_passage_chunks(spark, sf_dir).toPandas()
    from mongo_cdc_spark.io import load_table
    docs = load_table(spark, sf_dir, "documents").toPandas()
    nlen = docs.set_index("doc_id").text.str.split().str.len()
    # stride 8, chunk 10: chunk k holds exactly min(10, n - 8k)
    # tokens (the tail can produce more than one short chunk), and
    # consecutive FULL chunks overlap by 2 tokens
    for doc_id, g in got.groupby("doc_id"):
        g = g.sort_values("chunk_idx")
        n = nlen[doc_id]
        assert (g.chunk_idx.values == range(len(g))).all()
        assert len(g) == -(-n // 8)
        expect = [min(10, n - 8 * k) for k in range(len(g))]
        assert list(g.n_tokens) == expect
        consec = list(zip(g.passage, g.passage[1:], g.n_tokens))
        for a, b, na in consec:
            if na == 10:
                assert a.split()[8:] == b.split()[: min(2, len(b.split()))]


def test_shard_manifest_partitions_corpus_and_detects_drift(spark, sf_dir):
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators import training

    got = training.train_shard_manifest(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents").toPandas()
    assert got.n_docs.sum() == len(docs)
    assert got.n_chars.sum() == docs.n_chars.sum()
    # digest is order-independent and content-sensitive: recompute it
    # from raw text with hashlib and match per shard
    import hashlib
    def d40(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:10], 16)
    def shard_of(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8],
                   16) % 16
    docs["shard"] = docs.doc_id.map(shard_of)
    docs["d40"] = docs.text.map(d40)
    ref = docs.groupby("shard").d40.sum()
    for _, r in got.iterrows():
        assert r.content_digest == ref[r.shard]


def test_split_leakage_shares_and_ground_truth(spark, sf_dir):
    rows = {r.split: r for r in
            training.train_split_leakage(spark, sf_dir).collect()}
    assert set(rows) == {"train", "val", "test"}
    total = sum(r.n_docs for r in rows.values())
    # 90/5/5 hash split within hash-uniformity tolerance
    assert 0.80 <= rows["train"].n_docs / total <= 0.97
    for s in ("val", "test"):
        assert 0.005 <= rows[s].n_docs / total <= 0.15
    assert abs(sum(r.doc_share for r in rows.values()) - 1.0) < 1e-4
    # ground truth: recompute leaked fingerprints driver-side
    import collections
    docs = training._docs(spark, sf_dir).select("doc_id", "text").collect()
    import hashlib
    by_fp = collections.defaultdict(set)
    for r in docs:
        b = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16) \
            % training._SPLIT_BUCKETS
        split = ("test" if b == training._SPLIT_TEST
                 else "val" if b == training._SPLIT_VAL else "train")
        by_fp[hashlib.md5(r.text.encode()).hexdigest()].add((r.doc_id, split))
    want = collections.Counter()
    for members in by_fp.values():
        splits = {s for _, s in members}
        if len(splits) > 1:
            for _, s in members:
                want[s] += 1
    for s, r in rows.items():
        assert r.n_leaked_docs == want.get(s, 0)


def test_contamination_span_runs_match_bruteforce(spark, sf_dir):
    got = {r.doc_id: r for r in
           training.train_contamination_span(spark, sf_dir).collect()}
    assert got  # fixture has contaminated docs
    docs = training._docs(spark, sf_dir).select("doc_id", "text").collect()
    tris = {}
    for r in docs:
        w = r.text.split()
        tris[r.doc_id] = [tuple(w[i:i + 3]) for i in range(len(w) - 2)]
    bench = {t for d, ts in tris.items()
             if d % training._BENCH_MOD == 0 for t in ts}
    for d, ts in tris.items():
        if d % training._BENCH_MOD == 0:
            continue
        flags = [t in bench for t in ts]
        if not any(flags):
            assert d not in got
            continue
        longest = run = 0
        for f in flags:
            run = run + 1 if f else 0
            longest = max(longest, run)
        r = got[d]
        assert r.n_windows == len(ts)
        assert r.n_hit_windows == sum(flags)
        assert r.longest_run == longest
        assert r.longest_span_tokens == longest + 2
        assert r.scrub_flag == (longest >= training._SPAN_RUN_MIN)


def test_dedup_keep_best_keeper_is_argmax_of_group(spark, sf_dir):
    rows = training.train_dedup_keep_best(spark, sf_dir).collect()
    assert rows  # the fixture's near-dups share 10-token heads
    import hashlib
    docs = training._docs(spark, sf_dir).select("doc_id", "text").collect()
    groups = {}
    for r in docs:
        w = r.text.split()
        fp = hashlib.md5(" ".join(w[:10]).encode()).hexdigest()
        groups.setdefault(fp, []).append(
            (len(set(w)), len(w), r.doc_id))
    want = {}
    for fp, members in groups.items():
        if len(members) > 1:
            best = max(members, key=lambda m: (m[0], m[1], -m[2]))
            want[fp] = (len(members), best[2], best[0], best[1])
    got = {r.fp: (r.group_size, r.keeper_doc_id, r.keeper_types,
                  r.keeper_tokens) for r in rows}
    assert got == want
    assert all(r.n_dropped == r.group_size - 1 for r in rows)


def test_length_buckets_pad_arithmetic_and_savings(spark, sf_dir):
    rows = training.train_length_buckets(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.pad_tokens == r.n_docs * r.max_tok - r.n_tokens
        assert r.min_tok <= r.max_tok
        assert 0.0 <= r.pad_frac < 1.0
    # buckets partition the corpus and are ordered by length
    n_total = sum(r.n_docs for r in rows)
    docs = training._docs(spark, sf_dir).count()
    assert n_total == docs
    for a, b in zip(rows, rows[1:]):
        assert a.max_tok <= b.min_tok or a.max_tok <= b.max_tok
    # bucketed padding beats (or ties) padding to the global max
    bucket_pad = sum(r.pad_tokens for r in rows)
    gmax = max(r.max_tok for r in rows)
    global_pad = n_total * gmax - sum(r.n_tokens for r in rows)
    assert bucket_pad <= global_pad
    assert rows[0].unbucketed_pad_frac == round(
        global_pad / (n_total * gmax), 6)


def test_mixture_temperature_matches_numpy(spark, sf_dir):
    """Temperature identities: q sums to 1 per alpha, tail languages
    get boost > 1 and head languages < 1 (for alpha < 1), and every
    value matches a numpy recompute from raw token counts."""
    import numpy as np

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.training import (
        MIX_TEMPS, train_mixture_temperature)
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.size(F.split("text", r"\s+")).alias("n")).toPandas()
    cnt = docs.groupby("lang").n.sum()
    p = cnt / cnt.sum()
    got = train_mixture_temperature(spark, sf_dir).toPandas()
    for alpha in MIX_TEMPS:
        g = got[got.alpha == alpha].set_index("lang")
        q = p ** alpha / (p ** alpha).sum()
        for lang in p.index:
            assert int(g.loc[lang, "n_tokens"]) == int(cnt[lang])
            assert abs(g.loc[lang, "p_raw"] - round(p[lang], 6)) < 2e-6
            assert abs(g.loc[lang, "p_temp"] - round(q[lang], 6)) < 2e-6
            assert abs(g.loc[lang, "boost"]
                       - round(q[lang] / p[lang], 6)) < 2e-6
        assert abs(g.p_temp.sum() - 1.0) < 1e-4
        # alpha < 1 compresses: below-average shares boost up,
        # above-average shares boost down
        mean_p = 1.0 / len(p)
        for lang in p.index:
            if p[lang] < mean_p * 0.8:
                assert g.loc[lang, "boost"] > 1
            if p[lang] > mean_p * 1.25:
                assert g.loc[lang, "boost"] < 1


def test_epoch_shuffle_audit_matches_python(spark, sf_dir):
    """Python rebuild of the three md5 epoch orders; exact Spearman,
    shifts and decile stats — plus the decorrelation guarantees."""
    import hashlib

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.training import (
        SHUF_EPOCHS, train_epoch_shuffle_audit)

    ids = [r.doc_id for r in
           load_table(spark, sf_dir, "documents")
           .select("doc_id").collect()]
    n = len(ids)

    def ranks(e):
        order = sorted(
            ids, key=lambda d: (hashlib.md5(
                f"{d}:{e}".encode()).hexdigest(), d))
        return {d: i + 1 for i, d in enumerate(order)}

    r0 = ranks(0)
    got = train_epoch_shuffle_audit(spark, sf_dir).toPandas() \
        .set_index("epoch")
    for e in SHUF_EPOCHS:
        re_ = ranks(e)
        d2 = sum((re_[d] - r0[d]) ** 2 for d in ids)
        rho = 1 - 6 * d2 / (n * (n * n - 1))
        msf = sum(abs(re_[d] - r0[d]) for d in ids) / (n * n)
        mx = max(abs(re_[d] - r0[d]) for d in ids)
        fsd = sum(1 for d in ids
                  if (re_[d] - 1) * 10 // n == (r0[d] - 1) * 10 // n
                  ) / n
        g = got.loc[e]
        assert int(g.n_docs) == n
        assert abs(g.spearman_rho - round(rho, 6)) < 2e-6
        assert abs(g.mean_shift_frac - round(msf, 6)) < 2e-6
        assert int(g.max_shift) == mx
        assert abs(g.frac_same_decile - round(fsd, 6)) < 2e-6
        # independent permutations: rho ~ 0, mean shift ~ 1/3,
        # decile retention ~ 0.1 (loose bands for small fixtures)
        assert abs(g.spearman_rho) < 0.25
        assert 0.2 < g.mean_shift_frac < 0.45
        assert g.frac_same_decile < 0.3


def test_cross_source_overlap_matches_python_sets(spark, sf_dir):
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.training import (
        train_cross_source_overlap)
    import re

    docs = load_table(spark, sf_dir, "documents").toPandas()
    sets = {}
    for src, grp in docs.groupby("source"):
        sh = set()
        for t in grp.text:
            w = re.split(r"\s+", t)
            sh |= {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        sets[src] = sh
    got = train_cross_source_overlap(spark, sf_dir).toPandas()
    assert len(got) > 0
    seen = set()
    for r in got.itertuples():
        inter = len(sets[r.source_a] & sets[r.source_b])
        assert r.n_shared == inter and inter > 0
        assert r.n_sh_a == len(sets[r.source_a])
        assert r.n_sh_b == len(sets[r.source_b])
        assert abs(r.containment - round(
            inter / min(r.n_sh_a, r.n_sh_b), 6)) < 1e-9
        seen.add((r.source_a, r.source_b))
    # every overlapping pair is reported — none silently dropped
    for a in sets:
        for b in sets:
            if a < b and sets[a] & sets[b]:
                assert (a, b) in seen


def test_weighted_ares_matches_python_reference(spark, sf_dir):
    """Pure-Python A-Res replay: same md5-derived uniforms, same
    ln(u)/w keys, same top-k."""
    import hashlib
    import math

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.training import (_ARES_DEN, _ARES_K,
                                                    sample_weighted_ares)

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars").collect()
    rows = []
    for d in docs:
        if d["n_chars"] < 1:
            continue
        h = hashlib.md5(str(d["doc_id"]).encode()).hexdigest()
        u = (int(h[:13], 16) + 1) / (_ARES_DEN + 1)
        rows.append((round(math.log(u) / d["n_chars"], 8),
                     d["doc_id"], d["n_chars"]))
    rows.sort(key=lambda t: (-t[0], t[1]))
    want = [(i + 1, did, w, k)
            for i, (k, did, w) in enumerate(rows[:_ARES_K])]
    got = [(r["rank"], r["doc_id"], r["weight"], round(r["lnkey"], 8))
           for r in sample_weighted_ares(spark, sf_dir).collect()]
    assert got == want
    # sample is distinct and exactly k (corpus is larger than k)
    assert len({g[1] for g in got}) == _ARES_K
    # heavier docs should be overrepresented: the sampled mean weight
    # exceeds the corpus mean (property of w-weighted inclusion)
    corpus_mean = sum(w for _, _, w in rows) / len(rows)
    sample_mean = sum(g[2] for g in got) / len(got)
    assert sample_mean > corpus_mean


def test_dsir_importance_matches_python_reference(spark, sf_dir):
    """Pure-Python DSIR replay: md5 bucket hashing, Laplace-smoothed
    target/source distributions, exact micro-nat dot products, and
    the same top-k by (score, doc_id)."""
    import hashlib
    import math
    import re
    from collections import Counter, defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.training import (_DSIR_BUCKETS,
                                                    _DSIR_TOPK,
                                                    train_dsir_importance)

    rows = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source").collect()

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8],
                   16) % _DSIR_BUCKETS

    per_doc: dict = {}
    ct: Counter = Counter()
    cs: Counter = Counter()
    meta = {}
    for r in rows:
        # \s+ split keeping empty edge tokens = F.split semantics
        toks = re.split(r"\s+", r["text"])
        cb = Counter(bucket(t) for t in toks)
        per_doc[r["doc_id"]] = cb
        meta[r["doc_id"]] = (r["lang"], r["source"])
        cs.update(cb)
        if r["lang"] == "en":
            ct.update(cb)
    t_tot, s_tot = sum(ct.values()), sum(cs.values())
    li = {b: round((math.log((ct.get(b, 0) + 1.0)
                             / (t_tot + _DSIR_BUCKETS))
                    - math.log((cs.get(b, 0) + 1.0)
                               / (s_tot + _DSIR_BUCKETS))) * 1e6)
          for b in range(_DSIR_BUCKETS)}
    scores = {d: sum(c * li[b] for b, c in cb.items())
              for d, cb in per_doc.items()}
    want = sorted(scores, key=lambda d: (-scores[d], d))[:_DSIR_TOPK]

    got = train_dsir_importance(spark, sf_dir).collect()
    assert [r["doc_id"] for r in got] == want
    for r in got:
        assert r["score_micro"] == scores[r["doc_id"]]
        assert r["n_tokens"] == sum(per_doc[r["doc_id"]].values())
        assert (r["lang"], r["source"]) == meta[r["doc_id"]]
        assert r["score_nats"] == round(r["score_micro"] / 1e6, 6)
    # 'en' documents should dominate the selection head — the whole
    # point of the importance weight
    en = sum(1 for r in got if r["lang"] == "en")
    assert en >= _DSIR_TOPK // 2


def test_bloom_decontaminate_matches_python_reference(spark, sf_dir):
    """Bit-for-bit Bloom replay + exact truth from raw shingles."""
    import hashlib
    import math
    import re
    from collections import defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.training import (
        _BENCH_MOD, _BLOOM_K, _BLOOM_M, train_decontaminate_bloom)

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text").collect()
    sh = {}
    for r in docs:
        w = re.split(r"\s+", r["text"])
        if len(w) < 3:
            continue
        sh[r["doc_id"]] = {" ".join(w[i:i + 3])
                           for i in range(len(w) - 2)}

    def pos(h, k):
        d = hashlib.md5(f"{h}:{k}".encode()).hexdigest()
        return int(d[:15], 16) % _BLOOM_M

    bench = set()
    for d, ss in sh.items():
        if d % _BENCH_MOD == 0:
            bench |= ss
    bits = {pos(h, k) for h in bench for k in range(_BLOOM_K)}
    flagged_docs = real_docs = fp_docs = n_docs = 0
    fp_sh = clean_sh = 0
    for d, ss in sh.items():
        if d % _BENCH_MOD == 0:
            continue
        n_docs += 1
        flag = real = False
        for h in ss:
            hit = all(pos(h, k) in bits for k in range(_BLOOM_K))
            if h in bench:
                real = True
            else:
                clean_sh += 1
                if hit:
                    fp_sh += 1
            flag = flag or hit
        flagged_docs += flag
        real_docs += real
        fp_docs += flag and not real
    row = train_decontaminate_bloom(spark, sf_dir).collect()[0]
    assert row["n_bench_shingles"] == len(bench)
    assert row["n_bits_set"] == len(bits)
    assert row["n_corpus_docs"] == n_docs
    assert row["flagged_docs"] == flagged_docs
    assert row["true_overlap_docs"] == real_docs
    assert row["false_positive_docs"] == fp_docs
    assert math.isclose(row["shingle_fpr_measured"],
                        fp_sh / clean_sh, abs_tol=1e-6)
    assert math.isclose(row["shingle_fpr_bits"],
                        (len(bits) / _BLOOM_M) ** _BLOOM_K,
                        abs_tol=1e-6)
    # the audit's invariant: a Bloom filter never false-negatives
    assert row["flagged_docs"] >= row["true_overlap_docs"]
