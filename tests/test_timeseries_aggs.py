"""Ground-truth invariants for the time-series aggregate operators
(time_weighted_avg, counter_agg, state_durations, minmax_downsample)
plus histogram_fixed and fuzzy_dedup_pairs — hand-computed expected
values on constructed inputs."""

from __future__ import annotations

import datetime as dt

from oracle_to_oracle_data_integration_pipeline_spark.operators.dedup import (
    fuzzy_dedup_pairs,
)
from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import (
    histogram_fixed,
)
from oracle_to_oracle_data_integration_pipeline_spark.operators.timeseries import (
    counter_agg,
    minmax_downsample,
    state_durations,
    time_weighted_avg,
)


def _ts(sec: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def test_time_weighted_avg_hand_computed(spark):
    # v=10 held 10s, v=20 held 20s, final point open -> (100+400)/30
    df = spark.createDataFrame(
        [(1, _ts(0), 10.0), (1, _ts(10), 20.0), (1, _ts(30), 99.0)],
        "user_id int, ts timestamp, value double",
    )
    r = time_weighted_avg(df, "user_id").collect()[0]
    assert r["n_intervals"] == 2
    assert r["total_seconds"] == 30
    assert abs(r["twa"] - 500.0 / 30.0) < 1e-5


def test_counter_agg_detects_reset(spark):
    # 1 -> 5 (+4), 5 -> 2 (reset, contributes 2), 2 -> 7 (+5) = 11
    df = spark.createDataFrame(
        [(1, _ts(i * 10), v) for i, v in enumerate([1.0, 5.0, 2.0, 7.0])],
        "user_id int, ts timestamp, value double",
    )
    r = counter_agg(df, "user_id").collect()[0]
    assert r["n_steps"] == 3
    assert r["n_resets"] == 1
    assert abs(r["total_increase"] - 11.0) < 1e-9


def test_state_durations_closes_intervals(spark):
    # A open 0-10 (10s), B open 10-30 (20s), final A interval open
    df = spark.createDataFrame(
        [(1, "A", _ts(0)), (1, "B", _ts(10)), (1, "A", _ts(30))],
        "user_id int, event_type string, ts timestamp",
    )
    out = {r["state"]: r for r in state_durations(df, "user_id", "event_type").collect()}
    assert out["A"]["total_seconds"] == 10
    assert out["B"]["total_seconds"] == 20
    assert out["A"]["n_intervals"] == 1 and out["B"]["n_intervals"] == 1


def test_minmax_downsample_witnesses_and_tiebreak(spark):
    # same bucket; tie on min value 1.0 between ids 1 and 3 -> min id 1,
    # max value 9.0 at id 2
    df = spark.createDataFrame(
        [(1, 1, _ts(0), 1.0), (1, 2, _ts(10), 9.0), (1, 3, _ts(20), 1.0)],
        "user_id int, event_id int, ts timestamp, value double",
    )
    r = minmax_downsample(df, "user_id", bucket_seconds=3600).collect()[0]
    assert r["n_points"] == 3
    assert r["min_value"] == 1.0 and r["max_value"] == 9.0
    assert r["min_point_id"] == 1
    assert r["max_point_id"] == 2


def test_histogram_fixed_bins_and_range_filter(spark):
    df = spark.createDataFrame(
        [("a", v) for v in [0.0, 4.9, 5.0, 9.9, 10.0, -1.0]],
        "g string, v double",
    )
    rows = {r["bin"]: r for r in histogram_fixed(df, "g", "v", 0.0, 10.0, 2).collect()}
    assert rows[0]["n"] == 2 and rows[0]["bin_lo"] == 0.0 and rows[0]["bin_hi"] == 5.0
    assert rows[1]["n"] == 2
    # 10.0 (== hi) and -1.0 (< lo) dropped
    assert sum(r["n"] for r in rows.values()) == 4


def test_fuzzy_dedup_blocks_and_verifies(spark):
    df = spark.createDataFrame(
        [("red bolt",), ("rad bolt",), ("blue bolt",), ("red widget",), ("red bolt",)],
        "p_name string",
    )
    rows = fuzzy_dedup_pairs(df, "p_name", max_dist=2).collect()
    got = {(r["name_a"], r["name_b"]): r["dist"] for r in rows}
    # only the 1-edit pair survives; 'blue bolt' is 3 edits from both,
    # 'red widget' sits in another block, duplicates don't inflate
    assert got == {("rad bolt", "red bolt"): 1}


def test_seq_tiebreak_is_deterministic_under_null_value_ties(spark):
    """Duplicate timestamps whose value column is NULL made the
    interval order an engine coin flip (NULLS FIRST vs LAST); with
    seq= the sequence is pinned by the never-null unique id
    (eventstorm fuzz find, DIVERGENCES.md 13a). Hand-computed: order
    by (ts, event_id) gives intervals v=NULL(10s), v=30(0s), v=5(20s)
    for twa; counter deltas NULL->30->5; states a(10s), b(0s), c(20s)."""
    df = spark.createDataFrame(
        [(1, 1, _ts(0), None, "a"),
         (2, 1, _ts(10), 30.0, "b"),   # same-instant pair: event_id orders it
         (3, 1, _ts(10), 5.0, "c"),
         (4, 1, _ts(30), 7.0, "d")],
        "event_id int, user_id int, ts timestamp, value double, event_type string",
    )
    twa = time_weighted_avg(df, "user_id", seq="event_id").collect()[0]
    assert twa["n_intervals"] == 3 and twa["total_seconds"] == 30
    # terms: NULL*10 (null), 30*0, 5*20 -> 100 / 30
    assert abs(twa["twa"] - round(100.0 / 30, 6)) < 1e-9
    ca = counter_agg(df, "user_id", seq="event_id").collect()[0]
    # deltas: 30-NULL (null, dropped by lag null), 5-30=-25 (reset,
    # contributes v=5), 7-5=2 -> n_steps counts non-null deltas = 2
    assert ca["n_resets"] == 1 and ca["total_increase"] == 7.0
    sd = {r["state"]: r["total_seconds"]
          for r in state_durations(df, "user_id", "event_type", seq="event_id").collect()}
    assert sd == {"a": 10, "b": 0, "c": 20}
