"""Deterministic sampling operators (operators/sampling.py): split
stability, quota exactness, portability of the hash bucket."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.sampling import (
    hash_bucket_col,
    split_assign,
    stratified_topk,
)


def _py_bucket(key: int, buckets: int = 100) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:4], 16) % buckets


def test_hash_bucket_matches_python_md5(spark):
    rows = spark.range(0, 200).select(
        "id", hash_bucket_col(F.col("id")).alias("b")
    ).collect()
    for r in rows:
        assert r["b"] == _py_bucket(r["id"])


def test_split_assign_stable_and_partitioning_invariant(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"]: r["split"] for r in split_assign(df).collect()}
    s2 = {
        r["doc_id"]: r["split"]
        for r in split_assign(df.repartition(17, "doc_id")).collect()
    }
    assert s1 == s2
    counts = {}
    for v in s1.values():
        counts[v] = counts.get(v, 0) + 1
    # 90/5/5 within binomial slack on 1000 rows
    assert 850 <= counts["train"] <= 950
    assert counts["val"] + counts["test"] <= 150


def test_stratified_topk_exact_quota_and_stability(spark):
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).cast("string").alias("lang")
    )
    out = stratified_topk(df, "lang", k=5)
    per = {r["lang"]: r["cnt"] for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert set(per.values()) == {5}
    a = {tuple(r) for r in out.collect()}
    b = {tuple(r) for r in stratified_topk(df.repartition(13), "lang", k=5).collect()}
    assert a == b
