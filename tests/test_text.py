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
