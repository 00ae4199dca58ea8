"""Approximate-aggregate operators (the 100 TB path for distinct
counts and quantiles). No DuckDB oracle — sketch outputs are
engine-specific — so these are bound-based tests against exact values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    exact = o.select(F.countDistinct("o_custkey")).collect()[0][0]
    approx = o.select(F.approx_count_distinct("o_custkey", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.06  # 3x the configured rsd


def test_percentile_approx_close_to_exact(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    exact, approx = o.select(
        F.expr("percentile(o_totalprice, 0.5)"),
        F.expr("percentile_approx(o_totalprice, 0.5, 10000)"),
    ).collect()[0]
    assert abs(approx - exact) / exact < 0.01


def test_approx_quantiles_monotone(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    qs = li.stat.approxQuantile("l_extendedprice", [0.1, 0.5, 0.9], 0.01)
    assert qs == sorted(qs) and len(qs) == 3
