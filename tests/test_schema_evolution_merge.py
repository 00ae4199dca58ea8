"""Schema evolution through the merge: source gains or drops columns
between runs and the merge absorbs it (operators/cdc.py _align_schemas)."""

from __future__ import annotations

import datetime

import pytest

from oracle_to_oracle_data_integration_pipeline_spark.operators.cdc import merge_soft_delete

TS = datetime.datetime
T1, T2 = TS(2024, 1, 1), TS(2024, 1, 2)

BASE = "id long, val string, created_at timestamp, updated_at timestamp, is_deleted string"
WITH_EXTRA = "id long, val string, extra string, created_at timestamp, updated_at timestamp, is_deleted string"


@pytest.mark.parametrize("strategy", ["shuffle", "broadcast_delta"])
def test_source_added_column(spark, strategy):
    target = spark.createDataFrame([(1, "a", T1, None, "N"), (2, "b", T1, None, "N")], BASE)
    delta = spark.createDataFrame([(1, "a2", "NEW", T1, T2, "N"), (3, "c", "X", T2, None, "N")], WITH_EXTRA)
    out = merge_soft_delete(target, delta, ["id"], strategy=strategy).df
    rows = {r["id"]: (r["val"], r["extra"]) for r in out.collect()}
    assert rows == {1: ("a2", "NEW"), 2: ("b", None), 3: ("c", "X")}
    assert "extra" in out.columns


@pytest.mark.parametrize("strategy", ["shuffle", "broadcast_delta"])
def test_source_dropped_column(spark, strategy):
    target = spark.createDataFrame([(1, "a", "OLD", T1, None, "N")], WITH_EXTRA)
    delta = spark.createDataFrame([(1, "a2", T1, T2, "N"), (2, "b", T2, None, "N")], BASE)
    out = merge_soft_delete(target, delta, ["id"], strategy=strategy).df
    rows = {r["id"]: (r["val"], r["extra"]) for r in out.collect()}
    # the delta doesn't stage `extra`, so the matched row PRESERVES the
    # target's value — the reference MERGE SET list covers only staged
    # columns (03_cdc_etl.py:145-157); inserts get NULL (never had one)
    assert rows == {1: ("a2", "OLD"), 2: ("b", None)}


def test_column_order_target_first(spark):
    target = spark.createDataFrame([(1, "a", T1, None, "N")], BASE)
    delta = spark.createDataFrame([(2, "b", "X", T2, None, "N")], WITH_EXTRA)
    out = merge_soft_delete(target, delta, ["id"]).df
    assert out.columns == ["id", "val", "created_at", "updated_at", "is_deleted", "extra"]
