"""Behavioral unit tests for the round-5 additions: byte-budget shard
planning, URL canonicalization, and the change-feed sequence audit
(tiny in-memory inputs with hand-checkable answers; the sf0.01
differential suite covers the fixture-scale oracles)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.curation import shard_plan
from oracle_to_oracle_data_integration_pipeline_spark.operators.reconcile import (
    offset_gap_audit,
)
from oracle_to_oracle_data_integration_pipeline_spark.operators.text import (
    normalize_url_col,
)


def test_shard_plan_matches_sequential_packing(spark):
    sizes = {i: (i + 1) * 10 for i in range(20)}  # 10..200 bytes
    df = spark.createDataFrame(list(sizes.items()), "doc_id long, n_chars long")
    out = {r.doc_id: r for r in shard_plan(df, budget=100, buckets=16).collect()}
    # reference: single-threaded greedy packing in md5(doc_id) order
    order = sorted(sizes, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cum = 0
    for i in order:
        assert out[i].cum_before == cum, i
        assert out[i].shard == cum // 100
        assert out[i].offset_in_shard == cum % 100
        cum += sizes[i]
    assert len(out) == 20


def test_shard_plan_bucket_count_invariance(spark):
    df = spark.createDataFrame(
        [(i, 7 + (i * 13) % 50) for i in range(50)], "doc_id long, n_chars long"
    )
    a = {r.doc_id: (r.shard, r.cum_before) for r in shard_plan(df, 64).collect()}
    for buckets in (1, 4096):
        b = {
            r.doc_id: (r.shard, r.cum_before)
            for r in shard_plan(df, 64, buckets=buckets).collect()
        }
        assert a == b, buckets


def test_shard_plan_drops_sizeless_rows(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 0), (4, -5), (5, 30)],
        "doc_id long, n_chars long",
    )
    out = shard_plan(df, budget=100).collect()
    assert sorted(r.doc_id for r in out) == [1, 5]


def test_normalize_url_col_rules(spark):
    cases = [
        # scheme+host lowercased, www stripped, fragment dropped
        ("HTTPS://WWW.Site.COM/A/b#frag", "https://site.com/A/b"),
        # tracking params dropped, survivors sorted, '?' kept
        ("http://x.org/p?utm_source=a&z=2&id=1&ref=r", "http://x.org/p?id=1&z=2"),
        # all params tracking -> '?' dropped entirely
        ("http://x.org/p?utm_a=1&gclid=2&fbclid=3", "http://x.org/p"),
        # path case preserved; www only stripped once and only as prefix
        ("https://www.www.example.com/Path", "https://www.example.com/Path"),
        # malformed: no scheme -> NULL quarantine
        ("not a url", None),
        ("doc:123", None),
    ]
    df = spark.createDataFrame([(raw,) for raw, _ in cases], "raw string")
    got = [r.n for r in df.select(normalize_url_col(F.col("raw")).alias("n")).collect()]
    assert got == [want for _, want in cases]


def test_offset_gap_audit_dupes_gaps_and_rollup(spark):
    # p1: 1,2,2,3 -> 1 dupe, 0 gaps; p2: 10,13 -> 0 dupes, 2 gaps
    rows = [("p1", 1), ("p1", 2), ("p1", 2), ("p1", 3), ("p2", 10), ("p2", 13)]
    df = spark.createDataFrame(rows, "part_key string, seq long")
    out = {
        (r.part, r.is_total): r
        for r in offset_gap_audit(df, "seq", "part_key").collect()
    }
    p1, p2 = out[("p1", 0)], out[("p2", 0)]
    assert p1.n_dupes == 1 and p1.n_gaps == 0
    assert not p1.is_contiguous  # dupes break contiguity too
    assert p2.n_dupes == 0 and p2.n_gaps == 2
    total = out[(None, 1)]  # rollup row spans seq 1..13
    assert total.n_events == 6 and total.n_distinct == 5
    assert total.n_gaps == (13 - 1 + 1) - 5


def test_offset_gap_audit_null_seq_and_null_partition(spark):
    # NULL offsets must surface as n_null_seq, NOT as duplicates; a
    # genuine NULL partition value must stay distinguishable from the
    # rollup total via is_total
    rows = [("p1", 1), ("p1", None), ("p1", 2), (None, 5)]
    df = spark.createDataFrame(rows, "part_key string, seq long")
    out = {
        (r.part, r.is_total): r
        for r in offset_gap_audit(df, "seq", "part_key").collect()
    }
    p1 = out[("p1", 0)]
    assert p1.n_null_seq == 1 and p1.n_dupes == 0 and p1.n_gaps == 0
    assert not p1.is_contiguous  # a NULL offset is unauditable, not green
    null_group = out[(None, 0)]
    assert null_group.n_events == 1 and null_group.seq_min == 5
    total = out[(None, 1)]
    assert total.n_events == 4 and total.n_null_seq == 1
    assert len(out) == 3  # p1 group, NULL group, rollup total — all distinct keys


def test_offset_gap_audit_contiguous_feed(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "seq long")
    rows = offset_gap_audit(df, "seq").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.is_total == 1 and r.part is None
    assert r.is_contiguous and r.n_dupes == 0 and r.n_gaps == 0
    assert r.seq_min == 0 and r.seq_max == 99


def test_grouped_topk_salted_equals_direct_and_salt_invariant(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import (
        grouped_topk_salted,
    )

    rows = [(i, "hot" if i % 10 else "cold", (i * 37) % 101) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, score long")
    w = Window.partitionBy("grp").orderBy(F.col("score").desc(), F.col("doc_id"))
    direct = {
        (r.grp, r.rnk): r.doc_id
        for r in df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .collect()
    }
    for n_salts in (1, 3, 16):
        got = {
            (r.grp, r.group_rank): r.doc_id
            for r in grouped_topk_salted(
                df, "grp", "score", 5, "doc_id", n_salts=n_salts
            ).collect()
        }
        assert got == direct, n_salts
