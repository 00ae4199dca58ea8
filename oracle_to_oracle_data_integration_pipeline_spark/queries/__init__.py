"""Query registry — every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable with (where SQL-expressible) a
DuckDB oracle twin. This is the engine's correctness surface
(SURVEY.md §5): the driver hash-compares each pair at sf0.01.
"""

from __future__ import annotations

from oracle_to_oracle_data_integration_pipeline_spark.queries import (
    catalog_queries,
    format_queries,
    cdc_queries,
    io_queries,
    llm_queries,
    llm_queries2,
    llm_queries3,
    llm_queries4,
    quality_queries,
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
    streaming_queries,
]

# The driver's correctness gate evaluates qids in registry (dict) order
# and stops after ~50; round 1 verified the first 50 and never reached
# the LLM/streaming/format/partition/catalog/io modules. This list puts
# the not-yet-driver-verified qids (plus the three round-1 reds, now
# fixed) in the front window; qids already green in CORRECTNESS_r01.json
# go last — they stay covered by tests/test_queries_vs_duckdb.py.
# Rotate per round until every qid has a driver CORRECTNESS row.
#
# ROUND-3 ROTATION TODO: the round-2 window (slots 1-50) ends at
# sink_append; still owed a driver row after round 2: watermark_store,
# delta_count, q11_important_parts, q13_customer_distribution,
# q15_top_supplier, q16_supplier_counts, q17_small_quantity,
# q18_large_orders, q20_excess_shippers, q21_waiting_suppliers,
# media_resize, media_frames, media_features, profile_docs, dq_checks,
# dq_unique, embed_quantize, scd2_history, rollup_refresh, chunk_docs,
# pack_sequences, passage_dedup, semantic_dedup, mixture_sample,
# budget_select, dedup_incremental — put those (plus any round-2
# reds) first next round.
_VERIFY_FIRST = [
    # round-1 failures, fixed — re-verify before anything else
    "json_extract",
    "q12_priority_class",
    "array_agg",
    # never-checked modules, highest-value first (every LLM-data op)
    *llm_queries.QUERIES,
    *llm_queries2.QUERIES,
    *streaming_queries.QUERIES,
    *format_queries.QUERIES,
    *partition_queries.QUERIES,
    *catalog_queries.QUERIES,
    *io_queries.QUERIES,
    # relational6 qids outside round 1's window (first 4 were checked)
    "q11_important_parts",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_counts",
    "q17_small_quantity",
    "q18_large_orders",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
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
