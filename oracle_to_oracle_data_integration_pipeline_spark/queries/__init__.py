"""Query registry — every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable with (where SQL-expressible) a
DuckDB oracle twin. This is the engine's correctness surface
(SURVEY.md §5): the driver hash-compares each pair at sf0.01.
"""

from __future__ import annotations

from oracle_to_oracle_data_integration_pipeline_spark.queries import (
    analytics_queries,
    catalog_queries,
    clustering_queries,
    corpus_queries,
    format_queries,
    graph_queries,
    cdc_queries,
    io_queries,
    llm_queries,
    llm_queries2,
    llm_queries3,
    llm_queries4,
    quality_queries,
    retrieval_queries,
    timeseries_queries,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    partition_queries,
    streaming_queries,
)

_MODULES = [
    cdc_queries,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    partition_queries,
    catalog_queries,
    io_queries,
    format_queries,
    llm_queries,
    llm_queries2,
    llm_queries3,
    llm_queries4,
    quality_queries,
    retrieval_queries,
    timeseries_queries,
    clustering_queries,
    graph_queries,
    corpus_queries,
    analytics_queries,
    streaming_queries,
]

# The driver's correctness gate evaluates qids in registry (dict) order
# and stops after ~50. Round 1 verified the first 50; round 2's window
# covered the LLM/streaming/format/catalog/io front. This ROUND-3
# window re-verifies the round-2 reds (events.ts type bug, fixed)
# FIRST, then every never-driver-checked qid ordered riskiest-first:
# the first 50 entries are exactly the operators with novel or
# numerically-delicate oracles; the tail (low-risk compositions of
# already-driver-proven machinery, plus the 8 owed TPC-H shapes — plain
# relational SQL, locally green since round 2) absorbs the window
# cutoff. Every registered qid is green in the local
# differential suite (tests/test_queries_vs_duckdb.py, plus
# tools/parity_sweep.py at sf0.001/sf0.1) each round regardless.
#
# ROUND-4 ROTATION TODO: put any round-3 CORRECTNESS reds first, then
# the round-3 late additions that never saw a driver window (the
# analytics_queries batch: rolling_median regression_per_key
# mad_outliers chi2_independence part_cooccurrence bigram_freq
# char_entropy bloom_join embed_normalize triangle_count bpe_train
# robust_scale sql_interface time_weighted_avg counter_agg
# state_durations minmax_downsample histogram_fixed fuzzy_dedup
# window_percentiles minhash_estimate_audit bloom_fpr_audit
# bfs_levels sql_ddl_roundtrip join_size_estimate
# session_window_batch neardup_resolve bpe_encode
# mixture_temperature pmi_bigrams langid_confusion catalog_columns
# ab_test_lift funnel_time_window pareto_revenue spearman_corr
# impute_median one_hot_encode target_encode hashing_trick
# class_weights group_split kmv_distinct dau_wau_ratio anomaly_days),
# then
# whatever tail of this
# list fell outside round 3's window, then rotate long-unchecked greens
# (r1-era rows: the cdc/relational front) back through so every qid's
# driver row stays fresh.
_VERIFY_FIRST = [
    # round-2 failures (one shared root cause: TIMESTAMP_NTZ events.ts),
    # fixed via _util.normalize_events_ts — re-verify before anything else
    "sessionize",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_join",
    "stream_dedup",
    # simhash_neardup was rows-only (no_oracle) in r1/r2; now carries a
    # portable-hash DuckDB oracle — treat as never-verified
    "simhash_neardup",
    # owed a driver row after rounds 1-2 (novel-oracle subset)
    "watermark_store",
    "delta_count",
    "embed_quantize",
    "scd2_history",
    "rollup_refresh",
    "chunk_docs",
    "pack_sequences",
    "passage_dedup",
    "semantic_dedup",
    "dedup_incremental",
    "mixture_sample",
    "budget_select",
    "profile_docs",
    "dq_checks",
    "dq_unique",
    # round-3 additions with novel/numerically-delicate oracles
    "gap_fill",
    "gap_fill_interp",
    "hll_distinct",
    "approx_quantiles",
    "kmeans_assign",
    "stream_incremental",
    "media_decode_bmp",
    "media_decode_wav",
    "media_decode_png",
    "media_resize_real",
    "media_frames_real",
    "media_features_real",
    "ts_zscore",
    "feature_bins",
    "stream_stateful",
    "feature_bins_sketch",
    "pysource_changefeed",
    "stream_pysource",
    "stream_cdc_feed",
    "approx_heavy_hitters",
    "bm25_topk",
    "lm_perplexity",
    "skew_profile",
    "zorder_cluster",
    "pagerank",
    "source_divergence",
    "winsorize",
    "pit_join",
    # ---- ~50-entry window cutoff lands here ----
    # low-risk tail: compositions of driver-proven machinery (cosine
    # top-k, integer levenshtein, count+row_number, fake-kernel batch
    # shapes) and the owed TPC-H shapes
    "knn_classify",
    "fuzzy_match",
    "vocab_build",
    "cohort_retention",
    "event_transitions",
    "minhash_incremental",
    "media_resize",
    "media_frames",
    "media_features",
    "q11_important_parts",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_counts",
    "q17_small_quantity",
    "q18_large_orders",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
    # round-3 late additions (after the round-3 window was laid out):
    # behind the owed list, ahead of long-verified r1-era greens, so a
    # wider-than-expected driver window reaches them first
    "rolling_median",
    "regression_per_key",
    "mad_outliers",
    "chi2_independence",
    "part_cooccurrence",
    "bigram_freq",
    "char_entropy",
    "bloom_join",
    "embed_normalize",
    "triangle_count",
    "bpe_train",
    "robust_scale",
    "sql_interface",
    "time_weighted_avg",
    "counter_agg",
    "state_durations",
    "minmax_downsample",
    "histogram_fixed",
    "fuzzy_dedup",
    "window_percentiles",
    "minhash_estimate_audit",
    "bloom_fpr_audit",
    "bfs_levels",
    "sql_ddl_roundtrip",
    "join_size_estimate",
    "session_window_batch",
    "neardup_resolve",
    "bpe_encode",
    "mixture_temperature",
    "pmi_bigrams",
    "langid_confusion",
    "catalog_columns",
    "ab_test_lift",
    "funnel_time_window",
    "pareto_revenue",
    "spearman_corr",
    "impute_median",
    "one_hot_encode",
    "target_encode",
    "hashing_trick",
    "class_weights",
    "group_split",
    "kmv_distinct",
    "dau_wau_ratio",
    "anomaly_days",
]


def _prioritize(d: dict) -> dict:
    front = {k: d[k] for k in _VERIFY_FIRST if k in d}
    back = {k: v for k, v in d.items() if k not in front}
    return {**front, **back}


def all_queries():
    out = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate qids: {overlap}")
        out.update(m.QUERIES)
    return _prioritize(out)


def all_oracle_sql():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLE_SQL)
    return _prioritize(out)
