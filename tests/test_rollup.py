"""Incremental rollup maintenance (operators/rollup.py): refresh over
any batch split equals the full rebuild."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.rollup import (
    rollup_build,
    rollup_refresh,
)


def _canon(df):
    return sorted((r["k"], str(r["sum_v"]), r["n_rows"]) for r in df.collect())


def test_refresh_equals_rebuild_any_split(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 0.01 + 0.001).alias("v")
    )
    full = rollup_build(df, ["k"], ["v"])
    for frac in (1, 3333, 9999):
        base = df.filter(F.col("id") < frac)
        delta = df.filter(F.col("id") >= frac)
        inc = rollup_refresh(rollup_build(base, ["k"], ["v"]), delta, ["k"], ["v"])
        inc = inc.withColumnRenamed("sum_v", "sum_v")
        assert _canon(inc) == _canon(full), f"split at {frac} diverged"


def test_refresh_chains_and_new_keys(spark):
    b1 = spark.createDataFrame([(1, 2.0), (1, 3.0)], "k long, v double")
    b2 = spark.createDataFrame([(1, 1.5), (9, 10.0)], "k long, v double")
    b3 = spark.createDataFrame([(9, -4.0)], "k long, v double")
    state = rollup_build(b1, ["k"], ["v"])
    state = rollup_refresh(state, b2, ["k"], ["v"])
    state = rollup_refresh(state, b3, ["k"], ["v"])
    out = {r["k"]: (float(r["sum_v"]), r["n_rows"]) for r in state.collect()}
    assert out == {1: (6.5, 3), 9: (6.0, 2)}
