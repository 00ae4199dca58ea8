"""As-of join operator semantics: <= matching, tie handling, no-prior
rows, outer mode (operators/asof.py)."""

import datetime

from oracle_to_oracle_data_integration_pipeline_spark.operators.asof import asof_join

TS = datetime.datetime


def test_asof_basic_and_ties(spark):
    left = spark.createDataFrame(
        [(1, 100, TS(2024, 1, 1, 10)), (2, 100, TS(2024, 1, 1, 12)), (3, 200, TS(2024, 1, 1, 9))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, TS(2024, 1, 1, 9), 1.0),
            (100, TS(2024, 1, 1, 12), 2.0),  # equal-ts: must match row 2 (<=)
            (200, TS(2024, 1, 1, 11), 3.0),  # after left row 3: no match
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {r["event_id"]: (r["ts_asof"], r["value_asof"]) for r in
           asof_join(left, right, on="user_id", ts="ts").collect()}
    assert out[1] == (TS(2024, 1, 1, 9), 1.0)
    assert out[2] == (TS(2024, 1, 1, 12), 2.0)  # tie matches
    assert 3 not in out  # inner mode drops no-prior rows


def test_asof_outer_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, 5, TS(2024, 1, 1))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(5, TS(2024, 2, 1), 9.0)], "user_id long, ts timestamp, value double")
    rows = asof_join(left, right, on="user_id", ts="ts", inner=False).collect()
    assert len(rows) == 1 and rows[0]["ts_asof"] is None and rows[0]["value_asof"] is None


def test_asof_null_columns_do_not_tear_rows(spark):
    """A NULL in a carried right column must NOT pull a value from an
    older right row — the whole matched right row is carried atomically
    (regression: per-column last(ignorenulls) tore composite rows)."""
    left = spark.createDataFrame([(1, 5, TS(2024, 1, 30))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(5, TS(2024, 1, 10), 7.0), (5, TS(2024, 1, 20), None)],
        "user_id long, ts timestamp, value double",
    )
    [row] = asof_join(left, right, on="user_id", ts="ts").collect()
    assert row["ts_asof"] == TS(2024, 1, 20)
    assert row["value_asof"] is None  # from the SAME (newest) right row


def test_asof_latest_wins_among_many(spark):
    left = spark.createDataFrame([(1, 7, TS(2024, 1, 10))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(7, TS(2024, 1, d), float(d)) for d in range(1, 9)],
        "user_id long, ts timestamp, value double",
    )
    [row] = asof_join(left, right, on="user_id", ts="ts").collect()
    assert row["value_asof"] == 8.0


def test_asof_null_keys_never_match(spark):
    """SQL join equality: a NULL key matches nothing — neither a
    NULL-key right row (filtered from the fill side) nor another
    NULL-key left row (its partition has no right rows to carry).
    Eventstorm fuzz find, round 8 (DIVERGENCES.md 13b)."""
    left = spark.createDataFrame(
        [(1, None, TS(2024, 1, 2)), (2, 5, TS(2024, 1, 2))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(None, TS(2024, 1, 1), 1.0), (5, TS(2024, 1, 1), 2.0)],
        "user_id long, ts timestamp, value double",
    )
    inner = {r["event_id"] for r in
             asof_join(left, right, on="user_id", ts="ts").collect()}
    assert inner == {2}, "NULL-key left row must not match the NULL-key right row"
    outer = {r["event_id"]: r["value_asof"] for r in
             asof_join(left, right, on="user_id", ts="ts", inner=False).collect()}
    assert outer == {1: None, 2: 2.0}


def test_asof_tie_contract_greatest_wins(spark):
    """With tie=, multiple right rows at the same (key, ts) resolve to
    the GREATEST tie value deterministically — including when the
    winning row's payload is NULL (DIVERGENCES.md 13c)."""
    left = spark.createDataFrame(
        [(1, 5, TS(2024, 1, 2))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, 5, TS(2024, 1, 1), 1.0),
         (30, 5, TS(2024, 1, 1), None),   # greatest tie: must win, NULL and all
         (20, 5, TS(2024, 1, 1), 2.0)],
        "rid long, user_id long, ts timestamp, value double",
    )
    [row] = asof_join(
        left, right, on="user_id", ts="ts",
        right_cols=["ts", "value"], tie="rid",
    ).collect()
    assert row["value_asof"] is None  # rid=30's payload, not 1.0/2.0
    assert "rid_asof" not in row.asDict() and "__tie__" not in row.asDict()
