"""Unit tests for the reconciliation operators
(operators/reconcile.py) and the EWMA stateful kernel
(operators/timeseries.py ewma)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.reconcile import (
    bucket_row_diff,
    checksum_drill,
    resolve_op_conflicts,
    schema_diff,
    table_checksum_diff,
)


def _pair(spark):
    src = spark.createDataFrame(
        [(i, f"v{i}") for i in range(200)], "k long, payload string"
    )
    # target: key 7 missing, key 13 changed, key 500 extra
    tgt = spark.createDataFrame(
        [(i, "CHANGED" if i == 13 else f"v{i}") for i in range(200) if i != 7]
        + [(500, "extra")],
        "k long, payload string",
    )
    return src, tgt


def test_checksum_diff_flags_only_drifted_buckets(spark):
    src, tgt = _pair(spark)
    out = table_checksum_diff(src, tgt, ["k"], ["payload"], n_buckets=16).collect()
    assert sum(r["n_source"] for r in out) == 200
    assert sum(r["n_target"] for r in out) == 200  # -1 missing +1 extra
    bad = [r for r in out if r["digests_match"] == 0]
    # the three drifted keys hit at most 3 buckets, at least 1
    assert 1 <= len(bad) <= 3
    ok = [r for r in out if r["digests_match"] == 1]
    assert ok, "clean buckets must verify"


def test_checksum_diff_identical_tables_all_match(spark):
    src, _ = _pair(spark)
    out = table_checksum_diff(src, src, ["k"], ["payload"], n_buckets=16).collect()
    assert all(r["digests_match"] == 1 for r in out)
    assert all(r["n_source"] == r["n_target"] for r in out)


def test_checksum_drill_composed_matches_manual(spark):
    """The composed operator (owned, cached level-1) and the
    caller-supplied-level1 path must both equal the manual
    level1→flagged→bucket_row_diff composition."""
    src, tgt = _pair(spark)
    expected = {(7, "source_only"), (13, "changed"), (500, "target_only")}

    owned = {
        (r["k"], r["status"])
        for r in checksum_drill(src, tgt, ["k"], ["payload"], n_buckets=16).collect()
    }
    assert owned == expected

    level1 = table_checksum_diff(src, tgt, ["k"], ["payload"], n_buckets=16).cache()
    try:
        supplied = {
            (r["k"], r["status"])
            for r in checksum_drill(
                src, tgt, ["k"], ["payload"], n_buckets=16, level1=level1
            ).collect()
        }
    finally:
        level1.unpersist()
    assert supplied == expected


def test_checksum_drill_clean_tables_empty(spark):
    """All-clean level-1 ⇒ the drill scans nothing and returns no
    rows (the common case at scale)."""
    src, _ = _pair(spark)
    assert checksum_drill(src, src, ["k"], ["payload"], n_buckets=16).count() == 0


def test_bucket_row_diff_attributes_each_drift(spark):
    src, tgt = _pair(spark)
    flagged = [
        r["bucket"]
        for r in table_checksum_diff(src, tgt, ["k"], ["payload"], n_buckets=16)
        .where(F.col("digests_match") == 0)
        .collect()
    ]
    rows = {
        r["k"]: r["status"]
        for r in bucket_row_diff(
            src, tgt, ["k"], ["payload"], buckets=flagged, n_buckets=16
        ).collect()
    }
    assert rows == {7: "source_only", 13: "changed", 500: "target_only"}


def test_bucket_row_diff_all_clean_is_empty_and_scan_free(spark):
    """The common production case: level-1 flags nothing, so the
    drill-down gets buckets=[] and must return zero rows WITHOUT
    touching the tables (Catalyst folds the empty IN to false and
    prunes the scans — the 'in the all-clean case, nothing at all'
    contract)."""
    src, _ = _pair(spark)
    out = bucket_row_diff(src, src, ["k"], ["payload"], buckets=[], n_buckets=16)
    assert out.count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan


def test_resolve_op_conflicts_priority_and_ts(spark):
    delta = spark.createDataFrame(
        [
            # key 1: later ts wins regardless of priority
            (1, 10, "D", "old"),
            (1, 20, "I", "new"),
            # key 2: same ts -> D beats U beats I
            (2, 10, "I", "i"),
            (2, 10, "U", "u"),
            (2, 10, "D", "d"),
            # key 3: same ts and op -> tiebreak column (desc) decides
            (3, 10, "U", "a"),
            (3, 10, "U", "b"),
        ],
        "k long, op_ts long, op string, payload string",
    )
    out = {
        r["k"]: (r["op"], r["payload"], r["n_conflicts"])
        for r in resolve_op_conflicts(
            delta, ["k"], ts_col="op_ts", op_col="op", tiebreak=["payload"]
        ).collect()
    }
    assert out[1] == ("I", "new", 2)
    assert out[2] == ("D", "d", 3)
    assert out[3] == ("U", "b", 2)


def test_schema_diff_all_statuses(spark):
    src = spark.createDataFrame([(1, 1.0, "x")], "a long, b double, c string")
    tgt = src.drop("c").withColumn("b", F.col("b").cast("string")).withColumn(
        "d", F.lit(1)
    )
    rows = {r["column_name"]: r["status"] for r in schema_diff(spark, src, tgt).collect()}
    assert rows == {"a": "common", "b": "type_change", "c": "add", "d": "drop"}


def test_ewma_matches_pandas_ewm(spark):
    """Independent check: the recursion equals pandas
    ewm(alpha, adjust=False).mean()'s last value per key."""
    import pandas as pd

    from oracle_to_oracle_data_integration_pipeline_spark.operators.timeseries import ewma

    pdf = pd.DataFrame(
        {
            "k": [1] * 5 + [2] * 3,
            "ts": list(range(5)) + list(range(3)),
            "v": [3.14, 2.71, 6.55, 0.001, 123.456, 1.0, 2.0, 4.0],
        }
    )
    df = spark.createDataFrame(pdf, "k long, ts long, v double")
    got = {
        r["k"]: (r["n_points"], r["ewma"])
        for r in ewma(df, "k", "ts", "v", alpha=0.2).collect()
    }
    want = {
        int(k): (len(g), g.sort_values("ts")["v"].ewm(alpha=0.2, adjust=False).mean().iloc[-1])
        for k, g in pdf.groupby("k")
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=0.0)


def test_ewma_null_values_excluded(spark):
    from oracle_to_oracle_data_integration_pipeline_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [(1, 1, 2.0), (1, 2, None), (1, 3, 4.0)], "k long, ts long, v double"
    )
    out = ewma(df, "k", "ts", "v", alpha=0.5).collect()[0]
    assert out["n_points"] == 2
    assert out["ewma"] == 0.5 * 4.0 + 0.5 * 2.0


# -- property: the digest pass finds exactly the drifted buckets ------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

drift_st = st.fixed_dictionaries(
    {
        "dropped": st.sets(st.integers(min_value=0, max_value=99), max_size=5),
        "changed": st.sets(st.integers(min_value=0, max_value=99), max_size=5),
        "extra": st.sets(st.integers(min_value=100, max_value=120), max_size=3),
    }
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(drift=drift_st)
def test_checksum_diff_detects_any_drift(spark, drift):
    """For ANY drift pattern (drops, changes, extras), the level-1
    digest pass flags a bucket iff the bucket contains a drifted key,
    and the drill-down attributes every drifted key exactly."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.reconcile import (
        _bucket_col,
    )

    n_buckets = 8
    src_rows = [(i, f"v{i}") for i in range(100)]
    tgt_rows = [
        (i, "X" if i in drift["changed"] else f"v{i}")
        for i in range(100)
        if i not in drift["dropped"]
    ] + [(i, "extra") for i in drift["extra"]]
    src = spark.createDataFrame(src_rows, "k long, payload string")
    tgt = spark.createDataFrame(tgt_rows, "k long, payload string")

    out = table_checksum_diff(src, tgt, ["k"], ["payload"], n_buckets=n_buckets).collect()
    # effective drift: a key both dropped and changed counts as dropped
    drifted_keys = (drift["dropped"] | (drift["changed"] - drift["dropped"])
                    | drift["extra"])
    drifted_buckets = set()
    if drifted_keys:
        probe = spark.createDataFrame([(k,) for k in drifted_keys], "k long")
        drifted_buckets = {
            r["b"] for r in probe.select(_bucket_col(["k"], n_buckets).alias("b")).collect()
        }
    assert {r["bucket"] for r in out if not r["digests_match"]} == drifted_buckets

    got = {
        (r["k"], r["status"])
        for r in bucket_row_diff(
            src, tgt, ["k"], ["payload"], buckets=sorted(drifted_buckets),
            n_buckets=n_buckets,
        ).collect()
    }
    want = (
        {(k, "source_only") for k in drift["dropped"]}
        | {(k, "changed") for k in drift["changed"] - drift["dropped"]}
        | {(k, "target_only") for k in drift["extra"]}
    )
    assert got == want


def test_ewma_string_keyed_series(spark):
    """The operator is generic over the key type: the output schema
    must follow the input key's type, not assume bigint."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [("aapl", 1, 1.0), ("aapl", 2, 3.0), ("msft", 1, 2.0)],
        "symbol string, ts int, px double",
    )
    rows = {r["symbol"]: (r["n_points"], r["ewma"])
            for r in ewma(df, "symbol", "ts", "px", alpha=0.5).collect()}
    assert rows == {"aapl": (2, 2.0), "msft": (1, 2.0)}


def test_row_digest_is_delimiter_injection_proof(spark):
    """('x|','y') and ('x','|y') concat identically under a bare '|'
    join; the length prefix must keep their digests distinct so drift
    in either row stays visible."""
    a = spark.createDataFrame([(1, "x|", "y")], "k long, c1 string, c2 string")
    b = spark.createDataFrame([(1, "x", "|y")], "k long, c1 string, c2 string")
    out = table_checksum_diff(a, b, ["k"], ["c1", "c2"], n_buckets=4).collect()
    assert any(r["digests_match"] == 0 for r in out)


def test_ewma_null_key_group_retained(spark):
    """A NULL key forms its own group — Spark groupBy and the SQL
    oracle's GROUP BY both keep it; pandas' default dropna=True would
    silently lose those rows inside the partition kernel."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [(None, 1, 5.0), (None, 2, 7.0), (1, 1, 3.0)], "k long, ts int, v double"
    )
    rows = {r["k"]: (r["n_points"], round(r["ewma"], 4))
            for r in ewma(df, "k", "ts", "v", alpha=0.2).collect()}
    assert rows == {1: (1, 3.0), None: (2, 5.4)}
