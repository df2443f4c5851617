"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query (TPC-H Q1 shape) on sf0.001.
queries()       — every implemented operator from SURVEY.md §2
                  (relational surface + LLM-pipeline extensions).
oracle_sql()    — DuckDB-equivalent SQL for each hash-checkable query;
                  omitted only for genuinely non-SQL ops (LSH banding,
                  SimHash, mapInPandas stubs) → rows-only check.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from mongo_cdc_spark.operators import (  # noqa: E402
    cdc_batch, dedup, graph, layout, multimodal, quality, relational,
    similarity, skew, text, timeseries, tpch_full, training,
)

_MODULES = (cdc_batch, relational, tpch_full, dedup, similarity, text,
            multimodal, training, skew, layout, quality, timeseries, graph)

# The driver grades the first 50 dict entries (round-1 CORRECTNESS truncated at
# exactly 50, in insertion order).  Round 1 graded cdc_batch + the first 48
# relational queries, leaving every tpch_full / dedup / similarity / text /
# multimodal query without a hard correctness row.  _GRADE_FIRST puts all
# previously-ungraded queries — plus the repaired agg_approx_sketches and a
# representative spread of each already-passing category — inside the window.
# Everything not listed follows in module order, so the full registry is intact.
_GRADE_FIRST = (
    # Round-5 window (VERDICT_r4 task #1: drain the grading backlog).
    # After round 4, 79 registered queries have NEVER had a driver
    # CORRECTNESS row (the window holds 50/round; rounds 3-4 each added
    # 30+ operators). Priority rule: never-graded outranks stale-green
    # and outranks locally-re-verified-changed. So the round-5 window
    # is EXACTLY the 50 oldest never-graded entries, in the order they
    # landed (oldest session first) — computed against the union of
    # CORRECTNESS_r01..r04 keys, zero new operators added this round.
    # Slots 1-50: never graded, oldest first.
    "streaming_interval_left_join_replay", "multimodal_audio_resample",
    "agg_mode_per_segment", "quality_benford_digits",
    "ts_hourly_entropy", "train_decontaminate_semantic",
    "events_funnel_steps", "train_bpe_tokenize_apply",
    "text_zipf_fit", "cdc_topic_regex_router",
    "events_survival_km", "basket_rules_lift",
    "text_readability_proxy", "cdc_op_mix_stats",
    "events_revenue_concentration", "kmeans_silhouette_eval",
    "ts_ohlc_bars", "ts_time_weighted_avg",
    "stats_chi_square_independence", "stats_jackknife_mean",
    "ab_test_proportions", "events_dau_wau_stickiness",
    "customer_ltv_curve", "feature_winsorized_scale",
    "text_bigram_logprob", "text_js_divergence_sources",
    "streaming_ohlc_replay", "graph_supplier_similarity",
    "window_cume_dist_spend", "events_rate_ci",
    "layout_range_bounds", "sketch_accuracy_eval",
    "multimodal_image_phash", "events_user_lifecycle",
    "events_peak_concurrency", "events_watermark_lag_profile",
    "join_hint_merge", "events_hour_dow_heatmap",
    "multimodal_audio_vad", "events_bot_score",
    "ts_seasonal_strength", "ts_bollinger_bands",
    "parts_abc_classification", "customer_tier_migration",
    "text_shingle_novelty", "train_passage_chunks",
    "ts_theilsen_trend", "knn_ivf_balance_report",
    "events_incident_windows", "train_shard_manifest",
    # ---- 50-slot window cut (round 5 grades exactly the above) ----
    # Round-6 queue, in priority order: the remaining 29 never-graded
    # entries (oldest first), then the changed-since-last-row cohort.
    "cdc_resume_gap_audit", "events_decay_engagement_score",
    "train_interleave_schedule", "graph_degree_assortativity",
    "text_stopword_profile", "events_wow_growth",
    "ab_test_cuped", "stats_mutual_information",
    "ab_test_power_analysis", "events_burstiness_index",
    "text_heaps_law_fit", "multimodal_phash_near_pairs",
    "events_littles_law_audit", "ts_snaive_backtest",
    "events_transition_entropy", "events_session_stats",
    "train_padding_waste", "embedding_quality_gate",
    "events_cross_type_lift", "events_weekend_welch_test",
    "dedup_lsh_scurve_tuning", "orders_aging_buckets",
    "parts_supplier_hhi", "discount_quantity_elasticity",
    "events_error_budget", "nation_trade_balance",
    "text_vocab_coverage_curve", "multimodal_real_decode",
    "layout_compaction_plan",
    # Changed-after-their-last-driver-row cohort (r4 changes:
    # text_quality_scores, text_langid_confusion, dedup_minhash_lsh,
    # dedup_ngram_jaccard, dedup_span_kgram, dedup_containment,
    # train_quality_filter, train_decontaminate, multimodal_fake_decode,
    # sessions_interval_overlap, knn_ivfpq_search, text_token_stats,
    # events_sessionization; r5 changes: train_curriculum_order — the
    # two-phase ntile fix landed after its r4 green row). Each change
    # is hash-verified locally at sf0.001+sf0.01 via tools/oracle_check
    # and pytest-pinned; they take round-6 slots 30-43.
    "text_quality_scores", "text_langid_confusion",
    "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_span_kgram", "dedup_containment",
    "train_quality_filter", "train_decontaminate",
    "multimodal_fake_decode", "sessions_interval_overlap",
    "knn_ivfpq_search", "text_token_stats",
    "events_sessionization", "train_curriculum_order",
)


def _ordered(merged: dict) -> dict:
    front = {k: merged[k] for k in _GRADE_FIRST if k in merged}
    front.update(merged)
    return front


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    return _ordered(merged)


def oracle_sql() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE)
    return _ordered(merged)
