"""Data-quality operators (operators/dq.py): single-pass profile
semantics, rule violation counts, uniqueness."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.dq import (
    check_rules,
    check_unique,
    profile_columns,
)


def test_profile_columns_nulls_and_distinct(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (None, "b")], "k int, v string"
    )
    out = {r["column"]: (r["n_nulls"], r["n_distinct"]) for r in profile_columns(df).collect()}
    assert out == {"k": (1, 3), "v": (1, 2)}


def test_profile_single_job(spark):
    """The profile must be ONE aggregation pass: exactly one result row
    pre-explode, and the plan contains no join/union of per-column
    subplans."""
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    plan = profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Union" not in plan


def test_check_rules_counts(spark):
    df = spark.createDataFrame([(1,), (0,), (-3,), (None,)], "x int")
    out = {r["rule"]: r["n_violations"] for r in check_rules(
        df, {"nonpositive": F.col("x") <= 0, "is_null": F.col("x").isNull()}
    ).collect()}
    assert out == {"nonpositive": 2, "is_null": 1}


def test_check_rules_empty_input_zero_not_null(spark):
    """sum() over zero rows is NULL — an empty table (routine for a
    delta/partition validation pass) must report 0 violations so a
    `== 0` gate passes."""
    df = spark.createDataFrame([], "x int")
    out = {r["rule"]: r["n_violations"] for r in check_rules(
        df, {"nonpositive": F.col("x") <= 0}
    ).collect()}
    assert out == {"nonpositive": 0}


def test_check_unique_empty_when_unique(spark):
    df = spark.createDataFrame([(1, 1), (1, 2), (2, 1)], "a int, b int")
    assert check_unique(df, ["a", "b"]).count() == 0
    dup = df.union(spark.createDataFrame([(1, 2)], "a int, b int"))
    rows = check_unique(dup, ["a", "b"]).collect()
    assert [(r["a"], r["b"], r["n_rows"]) for r in rows] == [(1, 2, 2)]


def test_k_anonymity_flags_only_small_classes(spark):
    from oracle_to_oracle_data_integration_pipeline_spark.operators.dq import k_anonymity

    rows = [("en", "a")] * 3 + [("en", "b")] * 2 + [("fr", "a")]
    df = spark.createDataFrame(rows, "lang string, src string")
    out = {(r["lang"], r["src"]): r["n_rows"]
           for r in k_anonymity(df, ["lang", "src"], k=3).collect()}
    assert out == {("en", "b"): 2, ("fr", "a"): 1}


def test_k_anonymity_rejects_vacuous_k(spark):
    import pytest as _pytest

    from oracle_to_oracle_data_integration_pipeline_spark.operators.dq import k_anonymity

    df = spark.createDataFrame([("en",)], "lang string")
    with _pytest.raises(ValueError):
        k_anonymity(df, ["lang"], k=1)
