"""Behavioral unit tests for the second-wave retrieval operators
(tiny in-memory inputs with hand-checkable answers; the sf0.01
differential suite covers the fixture-scale oracles)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.retrieval2 import (
    bigram_nll,
    inverted_index,
    oov_rate,
    rrf_fuse,
)
from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import embed_gram
from oracle_to_oracle_data_integration_pipeline_spark.operators.text import (
    normalize_text_col,
)


def test_inverted_index_postings_and_stats(spark):
    docs = spark.createDataFrame(
        [
            (1, "cat cat dog"),
            (2, "cat fish"),
            (3, "dog dog dog cat"),
            (4, "heron"),  # hapax: dropped by min_df=2
        ],
        "doc_id long, text string",
    )
    out = {r.term: r for r in inverted_index(docs, top_postings=2, min_df=2).collect()}
    assert sorted(out) == ["cat", "dog"]
    assert out["cat"].df == 3 and out["cat"].total_tf == 4
    # tf desc: doc 1 (tf 2) then doc 2/3 (tf 1, doc_id tiebreak) — head of 2
    assert out["cat"].postings == "1,2"
    assert out["dog"].df == 2 and out["dog"].total_tf == 4
    assert out["dog"].postings == "3,1"


def test_rrf_fuse_scores_and_absence(spark):
    a = spark.createDataFrame([(10, 1), (20, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(20, 1), (30, 2)], "doc_id long, rank int")
    rows = {r.doc_id: r for r in rrf_fuse(a, b, k_out=3, k_rrf=60).collect()}
    # doc 20 is in both lists: 1/62 + 1/61 — must rank first
    assert rows[20].fused_rank == 1
    assert abs(rows[20].rrf - (1 / 62 + 1 / 61)) < 1e-6
    # docs 10/30 each appear once; absence contributes 0, not 1/60
    assert abs(rows[10].rrf - 1 / 61) < 1e-6
    assert abs(rows[30].rrf - 1 / 62) < 1e-6
    assert rows[10].rank_b is None and rows[30].rank_a is None


def test_oov_rate_bounds(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "z q"), (3, "a b")],
        "doc_id long, text string",
    )
    # vocab_size=2 -> vocab {a, b}; doc 2 fully OOV, docs 1/3 fully in
    rows = {r.doc_id: r for r in oov_rate(docs, vocab_size=2).collect()}
    assert rows[1].oov_rate == 0.0 and rows[1].n_tokens == 4
    assert rows[2].oov_rate == 1.0 and rows[2].n_oov == 2
    assert rows[3].oov_rate == 0.0


def test_bigram_nll_short_docs_absent_and_value(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "solo")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in bigram_nll(docs, alpha=0.5).collect()}
    assert 2 not in rows  # <2 tokens: no bigrams, absent by definition
    # corpus: one bigram "a b"; c12=1, c1=1, V=3 (a, b, solo)
    expected = -math.log((1 + 0.5) / (1 + 0.5 * 3))
    assert abs(rows[1].avg_nll - expected) < 1e-6
    assert rows[1].n_bigrams == 1


def test_normalize_text_col_canonical_and_idempotent(spark):
    df = spark.createDataFrame(
        [("Customer#000000042",), ("  Already clean  ",), ("A1B2, c-3!",)],
        "s string",
    )
    once = df.select(normalize_text_col(F.col("s")).alias("n"))
    vals = [r.n for r in once.collect()]
    assert vals == ["customer 0", "already clean", "a0b0 c 0"]
    # idempotent: normalizing the normalized form is a fixpoint
    twice = once.select(normalize_text_col(F.col("n")).alias("n2"))
    assert [r.n2 for r in twice.collect()] == vals


def test_embed_gram_matches_numpy(spark):
    import numpy as np

    rng = [[0.5, -0.25, 0.125], [1.0, 0.0, -0.5], [0.75, 0.5, 0.25]]
    df = spark.createDataFrame([(v,) for v in rng], "embedding array<float>")
    out = {(r.i, r.j): r for r in embed_gram(df, dim=3).collect()}
    x = np.array(rng, dtype=np.float64)
    for i in range(3):
        for j in range(i, 3):
            q = int(sum(math.floor(a * b * 1e9 + 0.5) for a, b in zip(x[:, i], x[:, j])))
            assert out[(i, j)].gram_q9 == q, (i, j)
    assert len(out) == 6  # upper triangle only
