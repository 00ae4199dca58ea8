"""Contract: every qid planned in SURVEY.md §2 exists in the registry,
and registry invariants hold (unique qids, oracle keys ⊆ query keys,
rows-only set is the documented hash-dependent pair)."""

from oracle_to_oracle_data_integration_pipeline_spark import queries as q

SURVEY_QIDS = {
    # §2.1 scans/sources/sinks
    "scan_full", "sink_append", "catalog_tables", "schema_clone",
    "empty_clone", "watermark_store",
    # §2.2 projections/filters
    "change_ts", "delta_filter", "project_order",
    # §2.3 joins
    "cdc_merge",
    # §2.4 aggregations
    "delta_count", "merge_stats", "watermark_max",
    # §2.5 windows
    "latest_per_key",
    # §2.6 sorts
    "order_by", "topo_order",
    # §2.7 set ops
    "set_ops",
    # §2.8 scalar functions
    "json_extract", "date_buckets", "array_math",
    # §2.9 streaming
    "stream_tumbling", "stream_session",
    # §2.10 UDF surface / LLM-data
    "cosine_topk", "minhash_dedup", "text_stats",
}


def test_survey_qids_all_registered():
    missing = SURVEY_QIDS - set(q.all_queries())
    assert not missing, f"SURVEY.md §2 qids not implemented: {sorted(missing)}"


def test_oracles_subset_of_queries():
    extra = set(q.all_oracle_sql()) - set(q.all_queries())
    assert not extra, f"oracle_sql without queries(): {sorted(extra)}"


def test_every_qid_has_an_oracle():
    # round 3 closed the last rows-only hole: simhash_neardup now uses
    # the portable md5-based token hash with an exact DuckDB twin
    rows_only = set(q.all_queries()) - set(q.all_oracle_sql())
    assert not rows_only, f"qids without oracles: {sorted(rows_only)}"


def test_readme_qid_count_matches_registry():
    """The README's 'N qids' line went stale twice (fixed at 288 in
    9135b98, stale again at 291 by round 6) — derive it so it can't
    drift a third time."""
    import os
    import re

    readme = os.path.join(os.path.dirname(__file__), "..", "README.md")
    text = open(readme).read()
    m = re.search(r"(\d+) qids, all with DuckDB oracles", text)
    assert m, "README qid-count line missing"
    assert int(m.group(1)) == len(q.all_queries()), (
        f"README says {m.group(1)} qids; registry holds {len(q.all_queries())}"
    )


def test_verify_first_entries_are_registered():
    """A typo in _VERIFY_FIRST silently drops a qid from the driver's
    priority window — every entry must be a registered qid, and none
    duplicated."""
    from oracle_to_oracle_data_integration_pipeline_spark.queries import _VERIFY_FIRST, all_queries

    reg = set(all_queries())
    missing = [q for q in _VERIFY_FIRST if q not in reg]
    assert not missing, f"_VERIFY_FIRST names unregistered qids: {missing}"
    assert len(_VERIFY_FIRST) == len(set(_VERIFY_FIRST)), "duplicate _VERIFY_FIRST entries"
