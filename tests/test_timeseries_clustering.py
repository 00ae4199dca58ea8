"""Operator-level tests for timeseries (resample/gap-fill) and
clustering (k-means) — edge cases the differential qid suite doesn't
isolate: the grid-explosion guard, hand-checked LOCF/interp values,
iteration effectiveness and determinism."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.clustering import (
    kmeans_fit_assign,
)
from oracle_to_oracle_data_integration_pipeline_spark.operators.timeseries import (
    gap_fill_interp,
    gap_fill_locf,
    resample,
)

TS = datetime.datetime


def _series(spark, rows):
    return spark.createDataFrame(rows, "user_id long, bucket timestamp, v double")


def test_locf_fills_and_flags_gaps(spark):
    s = _series(
        spark,
        [
            (1, TS(2024, 1, 1, 0), 10.0),
            (1, TS(2024, 1, 1, 3), 40.0),  # 2 missing hours between
            (2, TS(2024, 1, 1, 5), 7.0),   # singleton key: no gaps
        ],
    )
    got = {
        (r.user_id, r.bucket): (r.v, r.is_gap)
        for r in gap_fill_locf(s, "1 hour").collect()
    }
    assert got == {
        (1, TS(2024, 1, 1, 0)): (10.0, 0),
        (1, TS(2024, 1, 1, 1)): (10.0, 1),
        (1, TS(2024, 1, 1, 2)): (10.0, 1),
        (1, TS(2024, 1, 1, 3)): (40.0, 0),
        (2, TS(2024, 1, 1, 5)): (7.0, 0),
    }


def test_interp_linear_values_and_locf_tail(spark):
    s = _series(
        spark,
        [
            (1, TS(2024, 1, 1, 0), 10.0),
            (1, TS(2024, 1, 1, 3), 40.0),
            (1, TS(2024, 1, 1, 4), 0.0),
        ],
    )
    got = {r.bucket: (r.v, r.is_gap) for r in gap_fill_interp(s, "1 hour").collect()}
    assert got[TS(2024, 1, 1, 1)] == (20.0, 1)   # 10 + (40-10)*1/3
    assert got[TS(2024, 1, 1, 2)] == (30.0, 1)
    assert got[TS(2024, 1, 1, 4)] == (0.0, 0)


def test_grid_explosion_guard_drops_oversized_key(spark):
    s = _series(
        spark,
        [
            (1, TS(2024, 1, 1, 0), 1.0),
            (1, TS(2024, 1, 1, 5), 2.0),       # span 5 buckets: kept
            (2, TS(2024, 1, 1, 0), 1.0),
            (2, TS(2024, 3, 1, 0), 2.0),       # span ~1440 buckets: dropped
        ],
    )
    out = gap_fill_locf(s, "1 hour", max_buckets_per_key=100)
    keys = {r.user_id for r in out.select("user_id").distinct().collect()}
    assert keys == {1}


def test_resample_epoch_aligned_multi_unit_step(spark):
    e = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 0, 10), 1.0), (1, TS(2024, 1, 1, 1, 50), 2.0),
         (1, TS(2024, 1, 1, 2, 5), 4.0)],
        "user_id long, ts timestamp, value double",
    )
    # 2-hour buckets: 00:10 and 01:50 share bucket 00:00; 02:05 -> 02:00
    got = {
        r.bucket: r.v
        for r in resample(e, "2 hours", agg=F.sum("value")).collect()
    }
    assert got == {TS(2024, 1, 1, 0): 3.0, TS(2024, 1, 1, 2): 4.0}


def test_kmeans_deterministic_and_iterating(spark, sf_dir):
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load

    e = load(spark, sf_dir, "embeddings")
    a = kmeans_fit_assign(e, k=4, n_iter=2)
    b = kmeans_fit_assign(e, k=4, n_iter=2)
    rows_a = sorted(map(tuple, a.collect()))
    assert rows_a == sorted(map(tuple, b.collect()))  # run-to-run identical
    assert {r[1] for r in rows_a} == {0, 1, 2, 3}     # all clusters live
    # the second Lloyd iteration must actually move assignments
    one = dict((r[0], r[1]) for r in kmeans_fit_assign(e, k=4, n_iter=1).collect())
    moved = sum(1 for vid, cid, _ in rows_a if one[vid] != cid)
    assert moved > 0


def test_cohort_retention_first_week_is_full(spark, sf_dir):
    """Every cohort is 100% 'retained' in its own first week, and no
    activity week precedes its cohort week."""
    from oracle_to_oracle_data_integration_pipeline_spark.queries.timeseries_queries import (
        q_cohort_retention,
    )

    rows = q_cohort_retention(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.activity_wk >= r.cohort_wk
        if r.activity_wk == r.cohort_wk:
            assert r.retention == 1.0
        assert 0.0 < r.retention <= 1.0


def test_event_transitions_conserve_events(spark, sf_dir):
    """Total transitions = total events minus one per active user (each
    user's stream has exactly len-1 lag pairs)."""
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load
    from oracle_to_oracle_data_integration_pipeline_spark.queries.timeseries_queries import (
        q_event_transitions,
    )

    total = sum(r.n_transitions for r in q_event_transitions(spark, sf_dir).collect())
    e = load(spark, sf_dir, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert total == n_events - n_users
