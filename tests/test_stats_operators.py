"""Semantic invariants for the statistical-analytics operators
(operators/stats.py, bloom_semi_join, l2_normalize) — ground-truth
checks on constructed inputs, independent of the DuckDB differential
suite."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import bloom_semi_join
from oracle_to_oracle_data_integration_pipeline_spark.operators.similarity import l2_normalize
from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import (
    bigram_topk,
    char_entropy,
    chi2_independence,
    cooccurrence_pairs,
    mad_outlier_summary,
    ols_per_key,
    rolling_median,
)


def test_rolling_median_odd_and_even_frames(spark):
    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate([10, 2, 8, 4, 6])],
        "k int, seq int, v double",
    )
    out = {
        r["seq"]: r["rolling_median"]
        for r in rolling_median(df, "k", ["seq"], "v", n=3).collect()
    }
    assert out[0] == 10.0          # frame [10]
    assert out[1] == 6.0           # frame [2,10] -> interpolated
    assert out[2] == 8.0           # frame [2,8,10] -> middle
    assert out[3] == 4.0           # frame [2,4,8]
    assert out[4] == 6.0           # frame [4,6,8]


def test_ols_recovers_exact_line(spark):
    # y = 3x + 7 exactly; slope/intercept must come back bit-clean
    rows = [(1, x, 3.0 * x + 7.0) for x in range(10)]
    df = spark.createDataFrame(rows, "k int, x int, y double")
    r = ols_per_key(df, "k", F.col("x"), F.col("y")).collect()[0]
    assert r["n"] == 10
    assert abs(r["slope"] - 3.0) < 1e-6
    assert abs(r["intercept"] - 7.0) < 1e-6


def test_ols_skips_degenerate_groups(spark):
    # a single point and a zero-variance group produce no fit
    df = spark.createDataFrame(
        [(1, 5, 2.0), (2, 3, 1.0), (2, 3, 9.0)], "k int, x int, y double"
    )
    assert ols_per_key(df, "k", F.col("x"), F.col("y")).count() == 0


def test_mad_summary_flags_the_planted_outlier(spark):
    vals = [10.0] * 9 + [1000.0]
    df = spark.createDataFrame([("a", v) for v in vals], "g string, v double")
    r = mad_outlier_summary(df, "g", "v", k_mad=3.0).collect()[0]
    assert r["med"] == 10.0
    assert r["mad"] == 0.0
    assert r["n"] == 10
    assert r["n_outliers"] == 1  # 1000 deviates, everything else is exactly med


def test_chi2_zero_for_perfectly_independent_table(spark):
    # uniform 2x2 with identical margins -> chi2 == 0, dof == 1
    rows = [(r, c) for r in ["a", "b"] for c in ["x", "y"] for _ in range(5)]
    df = spark.createDataFrame(rows, "r string, c string")
    out = chi2_independence(df, "r", "c").collect()[0]
    assert out["n"] == 20
    assert out["dof"] == 1
    assert out["chi2"] == 0.0


def test_chi2_positive_for_dependent_table(spark):
    # perfect association: a->x, b->y
    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, "r string, c string")
    out = chi2_independence(df, "r", "c").collect()[0]
    assert out["dof"] == 1
    assert out["chi2"] > 19.0  # exact chi2 for this table is n = 20


def test_cooccurrence_counts_and_ordering(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "a"), (3, "b")],
        "g int, i string",
    )
    rows = cooccurrence_pairs(df, "g", "i", top_k=10).collect()
    top = rows[0]
    assert (top["item_a"], top["item_b"], top["n_groups"]) == ("a", "b", 3)
    as_dict = {(r["item_a"], r["item_b"]): r["n_groups"] for r in rows}
    assert as_dict[("a", "c")] == 1 and as_dict[("b", "c")] == 1


def test_bigram_topk_counts(spark):
    df = spark.createDataFrame(
        [("the cat sat",), ("the cat ran",), ("a dog",)], "text string"
    )
    rows = bigram_topk(df, "text", top_k=5).collect()
    as_dict = {r["bigram"]: r["n"] for r in rows}
    assert as_dict["the cat"] == 2
    assert as_dict["cat sat"] == 1
    assert rows[0]["bigram"] == "the cat"  # highest count first


def test_char_entropy_bounds(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in char_entropy(df, "doc_id", "text").collect()}
    assert out[1]["entropy"] == 0.0                      # single symbol
    assert abs(out[2]["entropy"] - math.log(2)) < 1e-5   # two equal symbols
    assert out[1]["n_chars"] == 4 and out[2]["n_chars"] == 4


def test_bloom_semi_join_matches_plain_semi_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = spark.createDataFrame([(k,) for k in (3, 17, 42, 99)], "s_suppkey long")
    got = bloom_semi_join(li, keys, "l_suppkey", "s_suppkey")
    want = li.join(
        keys.withColumnRenamed("s_suppkey", "l_suppkey"), "l_suppkey", "left_semi"
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_semi_join_empty_keys(spark):
    big = spark.createDataFrame([(1,), (2,)], "k long")
    keys = spark.createDataFrame([], "k long")
    assert bloom_semi_join(big, keys, "k", "k").count() == 0


def test_l2_normalize_unit_norm_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id int, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in l2_normalize(df, "vec_id", "embedding").collect()}
    assert out[1]["norm"] == 5.0
    assert out[1]["unit_vec"] == [0.6, 0.8]
    assert out[2]["norm"] == 0.0
    assert out[2]["unit_vec"] == [0.0, 0.0]  # zero vector passes through


def test_triangle_count_known_graph(spark):
    # K4 minus edge (3,4): triangles (1,2,3) and (1,2,4); wedges = 8
    from oracle_to_oracle_data_integration_pipeline_spark.operators.graph import (
        triangle_count,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "a int, b int"
    )
    r = triangle_count(edges).collect()[0]
    assert r["n_nodes"] == 4
    assert r["n_edges"] == 5
    assert r["n_wedges"] == 8
    assert r["n_triangles"] == 2
    assert abs(r["clustering"] - 0.75) < 1e-9


def test_bpe_train_learns_expected_merges(spark):
    from oracle_to_oracle_data_integration_pipeline_spark.operators.text import bpe_train

    df = spark.createDataFrame([("aaab aaab ab",)], "text string")
    rows = bpe_train(df, "text", n_merges=3).collect()
    got = [(r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"]) for r in rows]
    # vocab: aaab x2, ab x1
    # r1: 'a a' appears twice per aaab -> 4 beats 'a b' (3)
    # r2: after |aa||a||b|: 'a b' -> 3 beats 'aa a' (2)
    # r3: after |aa||ab| / |ab|: 'aa ab' -> 2
    assert got == [(1, "a", "a", 4), (2, "a", "b", 3), (3, "aa", "ab", 2)]


def test_bloom_semi_join_mixed_key_widths(spark):
    # xxhash64 is type-width sensitive; the operator must canonicalize
    # both sides before hashing or every true match fails the bitmap
    big = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    keys = spark.createDataFrame([(1,), (3,)], "kk int")
    got = sorted(r["k"] for r in bloom_semi_join(big, keys, "k", "kk").collect())
    assert got == [1, 3]


def test_bloom_semi_join_non_multiple_of_64_bits(spark):
    big = spark.createDataFrame([(i,) for i in range(200)], "k long")
    keys = spark.createDataFrame([(i,) for i in range(0, 200, 7)], "k long")
    got = bloom_semi_join(big, keys, "k", "k", m_bits=1000)
    assert got.count() == len(range(0, 200, 7))


def test_char_entropy_drops_empty_text(spark):
    # sequence(1, 0) enumerates DESCENDING in Spark; empty docs must be
    # dropped, not given phantom characters
    df = spark.createDataFrame([(1, ""), (2, "ab")], "doc_id int, text string")
    out = {r["doc_id"]: r for r in char_entropy(df, "doc_id", "text").collect()}
    assert 1 not in out
    assert out[2]["n_chars"] == 2


def test_bfs_levels_path_graph(spark):
    from oracle_to_oracle_data_integration_pipeline_spark.operators.graph import bfs_levels

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        "src string, dst string",
    )
    out = {r["dist"]: r["n_nodes"] for r in bfs_levels(edges, "a", max_iters=4).collect()}
    # one node per hop along the path; the x->y component is unreached
    assert out == {0: 1, 1: 1, 2: 1, 3: 1, 4: 1}
    shallow = {r["dist"]: r["n_nodes"] for r in bfs_levels(edges, "a", max_iters=2).collect()}
    assert shallow == {0: 1, 1: 1, 2: 1}


def test_join_size_exact_matches_real_join(spark):
    from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import (
        join_size_exact,
    )

    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k long")
    b = spark.createDataFrame([(1,), (2,), (2,), (9,)], "k long")
    predicted = join_size_exact(a, b, "k", "k").collect()[0]["join_size"]
    actual = a.join(b, "k").count()
    assert predicted == actual == 4  # 2*1 (k=1) + 1*2 (k=2)


def test_join_size_sampled_string_keys_not_degenerate(spark):
    # rate_inv=1 keeps every row: the estimate must equal the exact
    # size even for string keys (a long-cast would hash NULL for all)
    from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import (
        join_size_exact,
        join_size_sampled,
    )

    a = spark.createDataFrame([(f"key_{i}",) for i in range(50)], "k string")
    ex = join_size_exact(a, a, "k", "k").collect()[0]["join_size"]
    est = join_size_sampled(a, a, "k", "k", rate_inv=1).collect()[0]["est_size"]
    assert ex == est == 50


def test_join_size_sampled_caches_are_releasable(spark):
    # each call persists two count tables; release_estimator_caches
    # frees them so long sessions don't accumulate cached plans
    from oracle_to_oracle_data_integration_pipeline_spark.operators import scale

    from oracle_to_oracle_data_integration_pipeline_spark.operators import cache_registry

    scale.release_estimator_caches()  # drain any prior test's leftovers
    a = spark.createDataFrame([(i % 5,) for i in range(40)], "k long")
    est = scale.join_size_sampled(a, a, "k", "k", rate_inv=1)
    assert est.collect()[0]["est_size"] == 8 * 8 * 5
    assert cache_registry.registered_groups().get(scale._ESTIMATOR_GROUP) == 2
    assert scale.release_estimator_caches() == 2
    assert scale._ESTIMATOR_GROUP not in cache_registry.registered_groups()
    # the estimate plan still works after release (recompute path)
    assert est.collect()[0]["est_size"] == 8 * 8 * 5


def test_bfs_levels_tolerates_colliding_column_names(spark):
    from oracle_to_oracle_data_integration_pipeline_spark.operators.graph import bfs_levels

    edges = spark.createDataFrame(
        [("a", "b", 9, "x"), ("b", "c", 9, "x")],
        "src string, dst string, dist int, node string",
    )
    out = {r["dist"]: r["n_nodes"] for r in bfs_levels(edges, "a", max_iters=3).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_mixture_temperature_rates_and_smallest_kept_whole(spark):
    from oracle_to_oracle_data_integration_pipeline_spark.operators.curation import (
        mixture_temperature,
    )

    rows = [(i, "small") for i in range(100)] + [(1000 + i, "big") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r["source"]: r for r in mixture_temperature(df).collect()}
    assert out["small"]["rate_ppm"] == 1_000_000
    assert out["small"]["n_kept"] == 100          # smallest source kept whole
    assert out["big"]["rate_ppm"] == 500_000      # sqrt(100/400) = 0.5
    assert 0 < out["big"]["n_kept"] < 400


def test_bpe_apply_counts_with_known_merges(spark):
    from oracle_to_oracle_data_integration_pipeline_spark.operators.text import bpe_apply

    df = spark.createDataFrame([(1, "aaab ab")], "doc_id int, text string")
    r = bpe_apply(df, [("a", "a"), ("a", "b")]).collect()[0]
    # aaab -> |aa||a||b| -> |aa||ab| (2 tokens); ab -> |ab| (1 token)
    assert r["n_words"] == 2
    assert r["n_bpe_tokens"] == 3


def test_pmi_ranks_collocation_above_independent_pair(spark):
    from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import pmi_bigrams

    # 'new york' always co-occurs; 'a the' pairs two tokens that each
    # appear in many unrelated contexts -> PMI(new york) must be
    # strictly higher even though 'a the' is more frequent overall
    docs = [("new york " * 4).strip()] * 3 + ["the a the b the c a the d a e"] * 3
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    rows = pmi_bigrams(df, "text", min_count=3, top_k=10).collect()
    pmis = {r["bigram"]: r["pmi"] for r in rows}
    assert pmis["new york"] > pmis["a the"]
    assert all(r["n"] >= 3 for r in rows)  # min_count respected


def test_ab_test_lift_known_rates(spark):
    import datetime as dt

    from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import ab_test_lift
    from oracle_to_oracle_data_integration_pipeline_spark.operators.sampling import (
        hash_bucket_col,
    )
    from pyspark.sql import functions as F2

    # construct events so every arm-0 user converts and no arm-1 user does
    ids = spark.createDataFrame([(i,) for i in range(200)], "user_id long")
    arms = {r["user_id"]: r["arm"] for r in ids.select(
        "user_id", hash_bucket_col(F2.col("user_id"), 2).alias("arm")).collect()}
    rows = [
        (u, "purchase" if arms[u] == 0 else "view", dt.datetime(2024, 1, 1))
        for u in arms
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    r = ab_test_lift(ev).collect()[0]
    assert r["n_a"] + r["n_b"] == 200
    assert r["rate_a"] == 1.0 and r["rate_b"] == 0.0
    assert r["lift"] == 1.0
    assert r["z_score"] > 10  # perfectly separated arms


def test_ab_test_lift_degenerate_single_arm_still_one_row(spark):
    import datetime as dt

    from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import ab_test_lift

    # a single user: one arm is empty; the readout must still be one
    # row with NULL stats, not an empty frame
    ev = spark.createDataFrame(
        [(7, "purchase", dt.datetime(2024, 1, 1))],
        "user_id long, event_type string, ts timestamp",
    )
    rows = ab_test_lift(ev).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_a"] or 0) + (r["n_b"] or 0) == 1
    assert r["lift"] is None and r["z_score"] is None


def test_spearman_perfect_monotone_and_ties(spark):
    from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import (
        spearman_corr,
    )

    # y strictly increasing with x -> spearman exactly 1
    up = spark.createDataFrame([(i, i * 10) for i in range(20)], "x int, y int")
    assert spearman_corr(up, "x", "y").collect()[0]["spearman"] == 1.0
    # y strictly decreasing -> -1
    dn = spark.createDataFrame([(i, -i) for i in range(20)], "x int, y int")
    assert spearman_corr(dn, "x", "y").collect()[0]["spearman"] == -1.0
    # constant y -> zero variance -> NULL (den == 0 guard)
    flat = spark.createDataFrame([(i, 7) for i in range(5)], "x int, y int")
    assert spearman_corr(flat, "x", "y").collect()[0]["spearman"] is None
    # real tie: x=[1,2,2,3] avg-ranks to [1, 2.5, 2.5, 4]; scipy
    # spearmanr against y=[1,2,3,4] is 0.9486832...
    tied = spark.createDataFrame(
        [(1, 1), (2, 2), (2, 3), (3, 4)], "x int, y int"
    )
    assert abs(spearman_corr(tied, "x", "y").collect()[0]["spearman"] - 0.948683) < 1e-6
    # null in one column must drop the PAIR entirely: remaining pairs
    # are perfectly monotone -> exactly 1.0
    with_null = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (None, 15)], "x int, y int"
    )
    r = spearman_corr(with_null, "x", "y").collect()[0]
    assert r["n"] == 3 and r["spearman"] == 1.0


def test_kmv_estimate_accuracy_against_exact(spark, sf_dir):
    # the KMV estimate (k=64) should land within 35% of the exact
    # per-type distinct user count: true σ is ~1/sqrt(k-2) ≈ 12.7%, so
    # the gate is ~2.8σ — the fixed md5 draw at sf0.1 sits at 29.6%
    from oracle_to_oracle_data_integration_pipeline_spark.queries.analytics_queries import (
        q_kmv_distinct,
    )
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load
    from pyspark.sql import functions as F2

    est = {r["event_type"]: r["distinct_estimate"]
           for r in q_kmv_distinct(spark, sf_dir).collect()}
    exact = {r["event_type"]: r["n"]
             for r in load(spark, sf_dir, "events")
             .groupBy("event_type").agg(F2.countDistinct("user_id").alias("n"))
             .collect()}
    for et, n in exact.items():
        assert abs(est[et] - n) / n < 0.35, (et, est[et], n)


def test_chi2_null_categories_dropped(spark):
    """NULL categories must not poison the statistic: a NULL group
    would pass the observed groupBy but fail the cross-product
    equality join, yielding a 0/0 expected count (NaN chi2). Rows
    null in either column are excluded up front — the result equals
    the statistic over the complete pairs only."""
    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")] * 5
    clean = spark.createDataFrame(rows, "r string, c string")
    dirty = clean.unionAll(
        spark.createDataFrame(
            [(None, "x"), ("a", None), (None, None)], "r string, c string"
        )
    )
    got = chi2_independence(dirty, "r", "c").collect()[0]
    want = chi2_independence(clean, "r", "c").collect()[0]
    assert got["n"] == want["n"] == 20
    assert got["dof"] == want["dof"]
    assert got["chi2"] == want["chi2"]
    assert got["chi2"] == got["chi2"]  # not NaN


def test_spearman_high_cardinality_shuffle_fallback(spark):
    """With the broadcast threshold disabled, the (unhinted) rank-table
    joins must degrade to shuffle joins — the guard that prevents
    force-shipping an unbounded |distinct| table to the driver — and
    the statistic must be unchanged from the broadcast plan."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import (
        spearman_corr,
    )

    # near-unique x (high cardinality), correlated y
    df = spark.range(0, 5000).select(
        (F.col("id") * 7919 % 4999).cast("double").alias("x"),
        ((F.col("id") * 7919 % 4999) * 2 + (F.col("id") % 13)).cast("double").alias("y"),
    )
    base = spearman_corr(df, "x", "y").collect()[0]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out_df = spearman_corr(df, "x", "y")
        plan = out_df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, "hint must not override the threshold"
        out = out_df.collect()[0]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert out["n"] == base["n"] == 5000
    assert out["spearman"] == base["spearman"]
    assert out["spearman"] > 0.99  # strongly monotone by construction
