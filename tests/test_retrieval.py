"""Behavioral unit tests for the retrieval operators (tiny in-memory
inputs with hand-checkable answers; the sf0.01 differential suite
covers the fixture-scale oracles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.retrieval import (
    bm25_topk,
    fuzzy_lookup,
    knn_classify,
    unigram_nll,
)


def test_bm25_tf_and_rarity_ordering(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple pie"),   # 3x common term
            (2, "apple pie crust sugar"),   # 1x common term
            (3, "banana pie crust sugar"),  # 1x rare term
            (4, "crust sugar flour salt"),  # no query terms
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["apple", "banana"], k=4)
    rows = {r.doc_id: r for r in out.collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    # rank is the dense 1..k ordering of (bm25 desc, doc_id)
    by_rank = sorted(rows, key=lambda d: rows[d].rank)
    assert [rows[d].rank for d in by_rank] == [1, 2, 3, 4]
    assert by_rank == sorted(rows, key=lambda d: (-rows[d].bm25, d))
    # higher tf at equal dl beats lower tf; rarer term (df=1) outranks
    # a single common-term hit (df=2); absent terms score exactly 0
    assert rows[1].bm25 > rows[2].bm25
    assert rows[3].bm25 > rows[2].bm25
    assert rows[4].bm25 == 0.0
    assert rows[4].rank == 4


def test_unigram_nll_flags_rare_vocab(spark):
    docs = spark.createDataFrame(
        [
            (1, "the the the the"),  # most common token only
            (2, "the the zyx qwv"),  # half rare tokens
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_nll(docs).collect()}
    assert out[1].n_tokens == 4 and out[2].n_tokens == 4
    # rare-vocabulary doc must carry strictly higher average NLL
    assert out[2].avg_nll > out[1].avg_nll >= 0.0


def test_knn_majority_label(spark):
    # query 0 sits on the +x axis; labeled pool: three +x vectors with
    # label 7, two -x with label 1 -> k=3 majority must be 7
    rows = [
        (0, [1.0, 0.0], 7),
        (10, [0.9, 0.1], 7),
        (11, [0.8, 0.05], 7),
        (12, [0.95, 0.0], 7),
        (13, [-1.0, 0.0], 1),
        (14, [-0.9, 0.1], 1),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = knn_classify(emb, n_queries=1, k=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.query_id, r.predicted_label, r.votes, r.true_label) == (0, 7, 3, 7)


def test_fuzzy_lookup_exact_and_near(spark):
    cat = spark.createDataFrame(
        [(1, "red widget"), (2, "blue bolt"), (3, "green cog")],
        "p_partkey long, p_name string",
    )
    probes = spark.createDataFrame(
        [("red widget",), ("blu bolt",)], "probe string"
    )
    out = {r.probe: r for r in fuzzy_lookup(cat, probes, "p_partkey", "p_name").collect()}
    assert out["red widget"].dist == 0 and out["red widget"].p_partkey == 1
    assert out["blu bolt"].p_partkey == 2 and out["blu bolt"].dist == 1
