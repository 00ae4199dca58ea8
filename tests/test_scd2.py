"""SCD Type-2 operators (operators/scd.py): interval correctness and
the incremental-equals-rebuild invariant."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.scd import (
    scd2_apply,
    scd2_from_versions,
)


def _ts(d):
    return datetime.datetime(2024, 1, d)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ts timestamp")


def _canon(df):
    return sorted(
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in df.collect()
    )


def test_scd2_from_versions_intervals(spark):
    df = _mk(spark, [(1, "a", _ts(1)), (1, "b", _ts(5)), (2, "x", _ts(3))])
    out = {(r["k"], r["v"]): r for r in scd2_from_versions(df, ["k"], "ts").collect()}
    assert out[(1, "a")]["valid_to"] == _ts(5) and not out[(1, "a")]["is_current"]
    assert out[(1, "b")]["valid_to"] is None and out[(1, "b")]["is_current"]
    assert out[(2, "x")]["is_current"]


def test_scd2_apply_equals_rebuild(spark):
    """The invariant: applying batches incrementally == rebuilding from
    the union of all versions."""
    b1 = _mk(spark, [(1, "a", _ts(1)), (2, "x", _ts(2)), (3, "m", _ts(1))])
    b2 = _mk(spark, [(1, "b", _ts(5)), (4, "new", _ts(6))])
    b3 = _mk(spark, [(1, "c", _ts(9)), (2, "y", _ts(9))])

    inc = scd2_from_versions(b1, ["k"], "ts")
    inc = scd2_apply(inc, b2, ["k"], "ts")
    inc = scd2_apply(inc, b3, ["k"], "ts")

    rebuild = scd2_from_versions(b1.union(b2).union(b3), ["k"], "ts")
    assert _canon(inc) == _canon(rebuild)


def test_scd2_apply_rejects_stale_delta(spark):
    b1 = _mk(spark, [(1, "a", _ts(5))])
    hist = scd2_from_versions(b1, ["k"], "ts")
    stale = _mk(spark, [(1, "old", _ts(3))])
    with pytest.raises(ValueError, match="forward"):
        scd2_apply(hist, stale, ["k"], "ts")


def test_scd2_apply_rejects_null_ts_delta(spark):
    """A NULL-ts delta row would slip past the stale guard and leave
    TWO current rows for the key — it must raise instead."""
    b1 = _mk(spark, [(1, "a", _ts(5))])
    hist = scd2_from_versions(b1, ["k"], "ts")
    bad = _mk(spark, [(1, "b", None)])
    with pytest.raises(ValueError, match="NULL-ts"):
        scd2_apply(hist, bad, ["k"], "ts")
