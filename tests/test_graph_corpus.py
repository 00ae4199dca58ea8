"""Unit tests for PageRank and the corpus-distribution qids (tiny
hand-checkable graphs/corpora; sf0.01 oracles live in the
differential suite)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.graph import pagerank
from oracle_to_oracle_data_integration_pipeline_spark.queries.corpus_queries import (
    q_source_divergence,
    q_vocab_build,
    q_winsorize,
)


def test_pagerank_star_graph(spark):
    # symmetric star: hub h <-> leaves a,b,c. The hub must hold the
    # highest rank; with no dangling nodes total mass stays ~1.
    edges = [("h", x) for x in "abc"] + [(x, "h") for x in "abc"]
    df = spark.createDataFrame(edges, "src string, dst string")
    ranks = {r.node: r.rank for r in pagerank(df, iters=5).collect()}
    assert set(ranks) == {"h", "a", "b", "c"}
    assert ranks["h"] == max(ranks.values())
    assert abs(sum(ranks.values()) - 1.0) < 1e-6
    # leaves are symmetric -> identical ranks
    assert ranks["a"] == ranks["b"] == ranks["c"]


def test_pagerank_deterministic_across_runs(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(40)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = sorted(map(tuple, pagerank(df, iters=4).collect()))
    b = sorted(map(tuple, pagerank(df, iters=4).collect()))
    assert a == b


def test_source_divergence_skewed_source_scores_higher(spark, sf_dir):
    rows = {r.source: r.kl for r in q_source_divergence(spark, sf_dir).collect()}
    assert rows
    # KL(p_s || corpus) over full support is non-negative
    assert all(v >= 0.0 for v in rows.values()), rows


def test_vocab_build_ids_follow_frequency(spark, sf_dir):
    rows = q_vocab_build(spark, sf_dir).orderBy("token_id").collect()
    assert rows[0].token_id == 0
    counts = [r.n_occurrences for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert len({r.token_id for r in rows}) == len(rows)


def test_winsorize_bounds(spark, sf_dir):
    rows = q_winsorize(spark, sf_dir).collect()
    assert any(r.was_clipped for r in rows)
    for r in rows:
        if r.was_clipped:
            # clipped value replaces an out-of-band length
            assert r.clipped != float(r.n_chars)
            assert (r.n_chars < r.clipped) or (r.n_chars > r.clipped)
        else:
            assert r.clipped == float(r.n_chars)
