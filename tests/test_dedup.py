"""Dedup operator tests: the approximate scale paths (MinHash-LSH,
SimHash) are measured against the exact queries they approximate."""

from __future__ import annotations

from mongo_cdc_spark.operators import dedup


def _pairs(df):
    return {(r.doc1, r.doc2) for r in df.collect()}


def test_exact_dedup_keeper_invariants(spark, sf_dir, oracle):
    got = dedup.dedup_exact(spark, sf_dir).toPandas()
    n_docs = oracle.sql("SELECT COUNT(*) FROM documents").fetchone()[0]
    # every document is accounted for exactly once
    assert got.n_copies.sum() == n_docs
    # keeper ids are distinct and keepers exist in the corpus
    assert got.keeper_id.is_unique
    assert (got.n_copies >= 1).all()


def test_minhash_lsh_recall_equals_exact(spark, sf_dir):
    """At fixture scale near-dups sit at s≥0.8, where 16 bands × 4 rows
    has recall 1-(1-0.8^4)^16 ≈ 0.9998 — LSH must find the same pairs
    the exact inverted-index join finds (both verify with exact Jaccard,
    so precision is 1 by construction)."""
    exact = _pairs(dedup.dedup_ngram_jaccard(spark, sf_dir))
    lsh = _pairs(dedup.dedup_minhash_lsh(spark, sf_dir))
    assert lsh == exact
    assert len(exact) > 0, "fixture must contain near-dup pairs"


def test_minhash_verify_join_is_bounded(spark, sf_dir):
    """Scale guard (VERDICT_r3 task #4): the candidate-verify step must
    not carry an unconditional broadcast hint — a 100 TB dup rate can
    make the candidate pair list arbitrarily large, so its join
    strategy must be left to AQE's size-measured runtime selection
    (broadcast small, shuffle big). A ResolvedHint in the plan would
    mean someone reintroduced the hint."""
    df = dedup.dedup_minhash_lsh(spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in optimized
    assert "broadcast" not in optimized.lower()


def test_jaccard_values_bounded_and_ordered(spark, sf_dir):
    rows = dedup.dedup_ngram_jaccard(spark, sf_dir).collect()
    for r in rows:
        assert dedup.JACCARD_THRESHOLD <= r.jaccard <= 1.0
        assert r.doc1 < r.doc2


def test_simhash_pairs_valid(spark, sf_dir):
    rows = dedup.dedup_simhash(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.doc1 < r.doc2
        assert 0 <= r.hamming <= dedup._HAMMING_MAX


def test_simhash_finds_exact_duplicates(spark, sf_dir):
    """Identical texts have identical signatures → Hamming 0; every
    exact-dup pair must appear in the SimHash output."""
    from pyspark.sql import functions as F
    from mongo_cdc_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.lower("text").cast("binary")).alias("fp"))
    a, b = docs.alias("a"), docs.alias("b")
    exact_dups = {
        (r.doc1, r.doc2)
        for r in a.join(b, (F.col("a.fp") == F.col("b.fp"))
                        & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc1"),
                F.col("b.doc_id").alias("doc2")).collect()
    }
    sim = _pairs(dedup.dedup_simhash(spark, sf_dir))
    assert exact_dups <= sim


def test_fixture_tokens_within_oracle_series_cap(spark, sf_dir):
    """DuckDB can't bound generate_series laterally, so the shingle
    oracles expand a fixed 1..1000 position range; the engine computes
    ALL shingles, so oracle parity requires every document to fit."""
    from pyspark.sql import functions as F

    from mongo_cdc_spark.io import load_table

    mx = (load_table(spark, sf_dir, "documents")
          .agg(F.max(F.size(F.split("text", r"\s+")))).first()[0])
    assert mx <= 998


def test_span_kgram_exact_dups_fully_covered(spark, sf_dir):
    """Documents with an identical twin (exact dups) consist entirely of
    duplicated windows — their dup_frac must be exactly 1.0; all rows
    must satisfy 0 < dup_windows <= n_windows."""
    spans = dedup.dedup_span_kgram(spark, sf_dir).toPandas()
    assert (spans.dup_windows > 0).all()
    assert (spans.dup_windows <= spans.n_windows).all()
    got = dedup.dedup_exact(spark, sf_dir).toPandas()
    if (got.n_copies >= 2).any():
        from mongo_cdc_spark.io import load_table
        from pyspark.sql import functions as F
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5(F.lower("text").cast("binary")).alias("fp"),
            F.size(F.split("text", r"\s+")).alias("n_tok"))
        dup_fps = docs.groupBy("fp").count().filter("count >= 2")
        dup_ids = {r.doc_id for r in
                   docs.join(dup_fps, "fp")
                       .filter(F.col("n_tok") >= dedup.SPAN_K).collect()}
        assert dup_ids, "fixture has exact dups long enough to span"
        covered = spans.set_index("doc_id").dup_frac
        for i in dup_ids:
            assert covered.get(i) == 1.0, f"doc {i} not fully duplicated"


def test_containment_dominates_jaccard(spark, sf_dir):
    """C(A,B) = |I|/min >= |I|/union = J(A,B), so every pair at
    J >= CONTAINMENT_THRESHOLD must also be a containment pair."""
    jac = dedup.dedup_ngram_jaccard(spark, sf_dir).toPandas()
    cont = dedup.dedup_containment(spark, sf_dir).toPandas()
    assert ((cont.containment >= dedup.CONTAINMENT_THRESHOLD)
            & (cont.containment <= 1.0)).all()
    cpairs = set(zip(cont.doc1, cont.doc2))
    strong = jac[jac.jaccard >= dedup.CONTAINMENT_THRESHOLD]
    for p in zip(strong.doc1, strong.doc2):
        assert p in cpairs


def test_incremental_dedup_respects_split(spark, sf_dir, oracle):
    """Every reported row pairs a NEW doc with an OLD doc relative to
    the 80% doc_id cut, at jaccard >= threshold, one row per new doc."""
    rows = dedup.dedup_incremental_new_batch(spark, sf_dir).collect()
    assert len(rows) > 0, "fixture must contain cross-split near-dups"
    cut = oracle.sql(
        "SELECT CAST(FLOOR(0.8 * (MAX(doc_id) + 1)) AS BIGINT)"
        " FROM documents").fetchone()[0]
    new_docs = [r.new_doc for r in rows]
    assert len(new_docs) == len(set(new_docs)), "one best match per new doc"
    for r in rows:
        assert r.new_doc >= cut and r.dup_of < cut
        assert dedup.JACCARD_THRESHOLD <= r.jaccard <= 1.0


def test_semdedup_keeper_invariants(spark, sf_dir):
    """SemDeDup: every vector appears once; keeper_id <= vec_id; a
    keeper is always in the same cell as the vector it replaces."""
    out = dedup.dedup_semantic_semdedup(spark, sf_dir).toPandas()
    from mongo_cdc_spark.io import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    assert len(out) == n
    assert out.vec_id.is_unique
    assert (out.keeper_id <= out.vec_id).all()
    cell_of = dict(zip(out.vec_id, out.cell))
    dropped = out[out.keeper_id < out.vec_id]
    assert len(dropped) > 0, "fixture must contain semantic dups"
    for _, r in dropped.iterrows():
        assert cell_of[r.keeper_id] == r.cell, \
            "keeper must share the vector's cell (within-cell dedup)"


def test_jaro_winkler_matches_duckdb_exactly(spark, sf_dir, oracle):
    """The Python scorer must agree with DuckDB's native
    jaro_winkler_similarity on EVERY fixture name pair (the oracle's
    scorer) plus the textbook record-linkage examples."""
    from mongo_cdc_spark.operators.dedup import _jaro_winkler

    assert round(_jaro_winkler("martha", "marhta"), 6) == 0.961111
    assert round(_jaro_winkler("dixon", "dicksonx"), 6) == 0.813333
    names = [r[0] for r in oracle.sql(
        "SELECT DISTINCT p_name FROM part ORDER BY 1").fetchall()]
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            want = oracle.sql(
                "SELECT jaro_winkler_similarity(?, ?)",
                params=[a, b]).fetchone()[0]
            assert abs(_jaro_winkler(a, b) - want) < 1e-12, (a, b)


def test_jaro_winkler_pairs_are_vocab_grain(spark, sf_dir):
    """Scale guard: the pair frame the Python scorer sees is the
    name-vocabulary self-join, so its size must be bounded by
    vocab*(vocab-1)/2 — not by the part count."""
    from mongo_cdc_spark.operators import dedup

    got = dedup.dedup_jaro_winkler(spark, sf_dir).toPandas()
    n_vocab = (dedup.load_table(spark, sf_dir, "part")
               .select("p_name").distinct().count())
    assert len(got) <= n_vocab * (n_vocab - 1) // 2
    assert (got.jw >= 0.8).all() and (got.jw <= 1.0).all()
    assert (got.n_part_pairs >= 1).all()


def test_sample_rate_estimate_designs_and_bias(spark, sf_dir):
    """Python set recompute of all four samples; content-bucket
    sampling keeps duplicate groups intact (every copy of a sampled
    fingerprint is in the sample), row sampling need not."""
    import hashlib

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.dedup import (
        dedup_sample_rate_estimate)

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text").collect()
    fp = [(d.doc_id,
           hashlib.md5(d.text.encode("utf-8")).hexdigest())
          for d in docs]
    true_rate = 1 - len({h for _, h in fp}) / len(fp)
    got = dedup_sample_rate_estimate(spark, sf_dir).toPandas()
    for r in got.itertuples():
        cut = format(int(round(r.fraction * 16)), "x")
        if r.design == "by_row":
            samp = [h for i, h in fp if hashlib.md5(
                str(i).encode()).hexdigest()[0] < cut]
        else:
            samp = [h for _, h in fp if h[0] < cut]
        assert int(r.n_sampled) == len(samp)
        assert int(r.n_distinct) == len(set(samp))
        est = 1 - len(set(samp)) / len(samp)
        assert abs(r.est_dup_rate - round(est, 6)) < 2e-6
        assert abs(r.true_dup_rate - round(true_rate, 6)) < 2e-6
        assert abs(r.bias - round(est - true_rate, 6)) < 3e-6
    # content-coherent sampling never splits a duplicate group:
    # every copy of each sampled hash is inside the sample
    all_h = [h for _, h in fp]
    for cut in ("1", "4"):
        samp = [h for h in all_h if h[0] < cut]
        from collections import Counter
        full_c, samp_c = Counter(all_h), Counter(samp)
        for h, c in samp_c.items():
            assert full_c[h] == c
