"""Curation operators (operators/curation.py): passage dedup keeps
canonical occurrences, SemDeDup matches a within-cell brute force,
mixture rates hit their targets, budget selection respects the budget,
incremental dedup is a true anti join."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.curation import (
    budget_select,
    dedup_incremental,
    domain_cap,
    global_order_index,
    mixture_sample,
    passage_dedup,
    semantic_dedup,
)


def _docs(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


# -- passage_dedup ----------------------------------------------------

def test_passage_dedup_removes_repeat_keeps_first(spark):
    # doc 0 and doc 1 share the block "a b"; doc 0 holds the canonical copy
    out = {
        r["doc_id"]: r
        for r in passage_dedup(
            _docs(spark, [(0, "a b x y"), (1, "a b p q")]), block_tokens=2
        ).collect()
    }
    assert (out[0]["n_blocks"], out[0]["n_kept"], out[0]["clean_text"]) == (2, 2, "a b x y")
    assert (out[1]["n_blocks"], out[1]["n_kept"], out[1]["clean_text"]) == (2, 1, "p q")


def test_passage_dedup_fully_duplicated_doc_survives_empty(spark):
    out = {
        r["doc_id"]: r
        for r in passage_dedup(
            _docs(spark, [(0, "a b"), (1, "a b")]), block_tokens=2
        ).collect()
    }
    assert (out[1]["n_kept"], out[1]["clean_text"]) == (0, "")


def test_passage_dedup_within_doc_repeat_collapses(spark):
    out = passage_dedup(_docs(spark, [(0, "a b a b")]), block_tokens=2).collect()[0]
    assert (out["n_blocks"], out["n_kept"], out["clean_text"]) == (2, 1, "a b")


# -- semantic_dedup ---------------------------------------------------

def test_semantic_dedup_matches_within_cell_bruteforce(spark, sf_smoke):
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load

    e = load(spark, sf_smoke, "embeddings")
    out = semantic_dedup(e, 0.4, n_cells=4)
    dropped = {r["vec_id"] for r in out.filter(~F.col("kept")).collect()}
    # brute-force reference: same centroid convention, pure python
    import math

    rows = [(r["vec_id"], list(r["embedding"])) for r in e.collect()]
    rows.sort()
    cents = rows[:4]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))), 6)

    cell = {vid: max(cents, key=lambda c: (cos(v, c[1]), -c[0]))[0] for vid, v in rows}
    expect = set()
    for i, (vid, v) in enumerate(rows):
        for wid, wv in rows[:i]:
            if cell[wid] == cell[vid] and cos(v, wv) >= 0.4:
                expect.add(vid)
                break
    assert dropped == expect


def test_semantic_dedup_keeps_lowest_id_of_identical_pair(spark):
    e = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(3)] + [(3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r["kept"] for r in semantic_dedup(e, 0.99, n_cells=2).collect()}
    assert out == {0: True, 1: False, 2: False, 3: True}


# -- mixture_sample ---------------------------------------------------

def test_mixture_sample_rates_and_determinism(spark):
    rows = [(i, "a" if i % 2 == 0 else "b", 10) for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    out = mixture_sample(d, {"a": 3.0}, token_budget=800)
    got = out.select("source", "rate_ppm").distinct().collect()
    rates = {r["source"]: r["rate_ppm"] for r in got}
    # shares: a=3/4, b=1/4 of 800 -> a: 600/1000=60%, b: 200/1000=20%
    assert rates == {"a": 600_000, "b": 200_000}
    # deterministic on rerun
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in mixture_sample(d, {"a": 3.0}, token_budget=800).collect()
    )


def test_mixture_sample_rate_capped_at_one(spark):
    d = spark.createDataFrame(
        [(i, "a", 10) for i in range(10)], "doc_id long, source string, n_tokens int"
    )
    out = mixture_sample(d, {}, token_budget=10_000)
    assert out.count() == 10  # rate clamps to 1e6 ppm: keep everything
    assert out.select("rate_ppm").distinct().collect()[0][0] == 1_000_000


# -- budget_select ----------------------------------------------------

def test_budget_select_respects_budget_and_rank_order(spark):
    rows = [(i, i / 10.0, 100) for i in range(10)]  # scores 0.0 .. 0.9
    d = spark.createDataFrame(rows, "doc_id long, score double, n_tokens int")
    out = budget_select(d, "score", token_budget=350, tokens_col="n_tokens")
    kept = sorted(r["doc_id"] for r in out.collect())
    # best-first whole buckets: 0.9, 0.8, 0.7 fit (300); adding 0.6 would overflow
    assert kept == [7, 8, 9]
    assert out.agg(F.sum("n_tokens")).first()[0] <= 350


def test_budget_select_never_splits_a_bucket(spark):
    d = spark.createDataFrame(
        [(1, 0.5, 100), (2, 0.5, 100), (3, 0.4, 50)],
        "doc_id long, score double, n_tokens int",
    )
    out = budget_select(d, "score", token_budget=150, tokens_col="n_tokens")
    # 0.5-bucket holds 200 tokens > budget -> dropped whole; 0.4 alone would
    # fit but sits below the overflowing bucket in the cumulative order
    assert out.count() == 0


# -- dedup_incremental ------------------------------------------------

def test_dedup_incremental_drops_seen_text_only(spark):
    new = _docs(spark, [(0, "alpha"), (1, "beta"), (2, "gamma")])
    seen = _docs(spark, [(10, "beta"), (11, "delta")])
    out = sorted(r["doc_id"] for r in dedup_incremental(new, seen).collect())
    assert out == [0, 2]


def test_dedup_incremental_plan_is_anti_join(spark):
    new = _docs(spark, [(0, "alpha")])
    seen = _docs(spark, [(1, "beta")])
    plan = dedup_incremental(new, seen)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan


# -- domain_cap -------------------------------------------------------

def test_domain_cap_keeps_best_per_source(spark):
    rows = [(i, "s" + str(i % 2), float(i)) for i in range(10)]
    d = spark.createDataFrame(rows, "doc_id long, source string, quality double")
    out = domain_cap(d, cap=2)
    kept = sorted(r["doc_id"] for r in out.collect())
    # per source: the two highest-quality (largest doc_id) rows survive
    assert kept == [6, 7, 8, 9]
    assert out.filter(F.col("domain_rank") > 2).count() == 0


def test_domain_cap_tiebreak_is_deterministic(spark):
    d = spark.createDataFrame(
        [(3, "s", 1.0), (1, "s", 1.0), (2, "s", 1.0)],
        "doc_id long, source string, quality double",
    )
    kept = sorted(r["doc_id"] for r in domain_cap(d, cap=2).collect())
    assert kept == [1, 2]  # equal quality -> lowest ids win


# -- global_order_index -----------------------------------------------

def test_global_order_index_is_exact_permutation(spark):
    d = spark.createDataFrame([(i,) for i in range(97)], "doc_id long")
    out = global_order_index(d, buckets=16)
    pos = sorted(r["position"] for r in out.collect())
    assert pos == list(range(97))


def test_global_order_index_bucket_count_invariant(spark):
    """The index must equal row_number() OVER (ORDER BY md5(id), id)-1
    regardless of how many histogram buckets the two-pass form uses —
    the bucket is a PREFIX of the sort key, so any bucketing yields
    the same global rank."""
    d = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    a = {r["doc_id"]: r["position"] for r in global_order_index(d, buckets=1).collect()}
    b = {r["doc_id"]: r["position"] for r in global_order_index(d, buckets=256).collect()}
    c = {r["doc_id"]: r["position"] for r in global_order_index(d, buckets=4096).collect()}
    assert a == b == c
