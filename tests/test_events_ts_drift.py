"""Fixture-schema drift guard for events.ts (SURVEY.md §7 risk 6,
VERDICT r2 item 8): the driver has shipped the events fixture with
``ts`` as parquet TIMESTAMP(NANOS) (bigint under nanosAsLong) and as
timestamp[us] (TIMESTAMP_NTZ). Both forms must flow through ONE
normalizer — ``queries._util.normalize_events_ts`` — and come out as
plain TIMESTAMP, batch and streaming alike, so the r2 class of bug
(6 qids red on one dtype assumption) can't recur silently.
"""

from __future__ import annotations

import datetime
import os
import uuid

import pytest
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import (
    load,
    normalize_events_ts,
    tune,
)

_ROWS = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 10), 7, "signup", 1.5, "{}"),
    (2, datetime.datetime(2024, 1, 1, 0, 30, 0), 7, "purchase", 2.5, "{}"),
    (3, datetime.datetime(2024, 1, 1, 9, 0, 0), 8, "click", 0.5, "{}"),
]
_EPOCHS = [1704067210, 1704069000, 1704099600]


def _write_events(spark, path: str, flavor: str) -> None:
    if flavor == "bigint_nanos":
        df = spark.createDataFrame(
            [(i, int(e * 1_000_000_000), u, t, v, p) for (i, _, u, t, v, p), e in zip(_ROWS, _EPOCHS)],
            "event_id long, ts long, user_id long, event_type string, value double, props string",
        )
    elif flavor == "timestamp_ntz":
        df = spark.createDataFrame(
            _ROWS,
            "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
        )
    else:  # already plain timestamp — normalizer must be a no-op
        df = spark.createDataFrame(
            _ROWS,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )
    df.coalesce(1).write.mode("overwrite").parquet(path)


@pytest.mark.parametrize("flavor", ["bigint_nanos", "timestamp_ntz", "timestamp"])
def test_normalize_batch(spark, tmp_path, flavor):
    tune(spark)
    path = str(tmp_path / "events.parquet")
    _write_events(spark, path, flavor)
    df = normalize_events_ts(spark.read.parquet(path))
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {r.event_id: r.sec for r in df.select("event_id", F.unix_timestamp("ts").alias("sec")).collect()}
    assert got == {i + 1: e for i, e in enumerate(_EPOCHS)}


@pytest.mark.parametrize("flavor", ["bigint_nanos", "timestamp_ntz"])
def test_normalize_streaming_with_watermark(spark, tmp_path, flavor):
    """The streaming path is the one that broke in r2: the normalized
    column must be watermarkable (TIMESTAMP, not NTZ) and the drained
    windowed agg must match the batch one."""
    tune(spark)
    sf_dir = str(tmp_path / flavor)
    os.makedirs(sf_dir)
    _write_events(spark, os.path.join(sf_dir, "events.parquet"), flavor)

    events_path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(events_path).schema
    stream = normalize_events_ts(spark.readStream.schema(schema).parquet(events_path))
    assert dict(stream.dtypes)["ts"] == "timestamp"
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"drift_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        got = {r["w"]["start"]: r["n"] for r in spark.table(name).collect()}
    finally:
        spark.catalog.dropTempView(name)
    assert got == {
        datetime.datetime(2024, 1, 1, 0, 0): 2,
        datetime.datetime(2024, 1, 1, 9, 0): 1,
    }


def test_load_routes_events_through_normalizer(spark, sf_dir):
    """Whatever vintage /root/testdata currently is, load() must yield
    plain TIMESTAMP — every batch consumer depends on this contract."""
    assert dict(load(spark, sf_dir, "events").dtypes)["ts"] == "timestamp"
