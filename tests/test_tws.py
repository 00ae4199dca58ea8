"""transformWithStateInPandas (Spark 4 StatefulProcessor API) —
gated on the public protobuf package the TWS Python worker needs
(streaming/tws.py docstring). In environments without it the
streaming test SKIPS and the gate test proves the probe + the
ImportError contract; where protobuf imports, the full
micro-batched run must match the batch aggregation decimal-exactly.
"""

from __future__ import annotations

import uuid

import pytest

from oracle_to_oracle_data_integration_pipeline_spark.streaming.tws import (
    ROCKSDB_PROVIDER,
    running_profile,
    tws_available,
)


def test_tws_running_profile_subprocess_vendored(tmp_path):
    """The REAL micro-batch differential, in this sandbox, without pip:
    a vendored pure-Python google.protobuf runtime (found on disk by
    vendored_protobuf_path) is shipped to the subprocess — and through
    it to the pyspark WORKERS, which is where the TWS protocol client
    actually imports the StateMessage stubs — via PYTHONPATH plus a
    sitecustomize shim (tools/tws_probe.py docstring). Decimal-exact
    state folds across 4 micro-batches must match the batch groupBy;
    a protocol break from the one-minor protobuf skew would corrupt
    state and fail the compare, so green here certifies the shim."""
    import os
    import subprocess
    import sys

    from oracle_to_oracle_data_integration_pipeline_spark.streaming.tws import (
        vendored_protobuf_path,
    )

    if tws_available():
        pytest.skip("protobuf importable in-process — in-process test covers the run")
    runtime = vendored_protobuf_path()
    if runtime is None:
        pytest.skip("no vendored protobuf runtime on this host")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        from tws_probe import build_shim
    finally:
        sys.path.pop(0)
    env = dict(os.environ)
    env["PYTHONPATH"] = build_shim(str(tmp_path / "shim"), runtime)
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "tws_probe.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "TWS_DIFFERENTIAL_PASS" in proc.stdout, proc.stdout[-2000:]
    # the event-time-timer processor (session_close): registerTimer /
    # deleteTimer / handleExpiredTimer, closes via watermark passage
    assert "TWS_SESSION_TIMER_PASS" in proc.stdout, proc.stdout[-2000:]
    # the ListState+TTL processor (recent_events): bounded per-key list
    # across 3 query restarts, idle-key eviction observable via
    # had_state after sleeping past the TTL (round 10, VERDICT r9 #5)
    assert "TWS_LIST_TTL_PASS" in proc.stdout, proc.stdout[-2000:]


def test_tws_gate_contract(spark):
    """The availability probe and the operator's failure mode must
    agree: when protobuf is absent, running_profile raises ImportError
    BEFORE building a plan (not a mid-query worker crash)."""
    if tws_available():
        pytest.skip("protobuf present — gate arm exercised by the run test")
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value AS user_id", "'a' AS event_type", "1.0 AS value")
    )
    with pytest.raises(ImportError, match="protobuf"):
        running_profile(stream)
    from oracle_to_oracle_data_integration_pipeline_spark.streaming.tws import (
        recent_events,
    )

    with pytest.raises(ImportError, match="protobuf"):
        recent_events(stream.selectExpr("user_id", "user_id AS event_id"))


@pytest.mark.skipif(not tws_available(), reason="protobuf not installed")
def test_tws_running_profile_matches_batch(spark, tmp_path):
    """Per-key state folded across 4 real micro-batches
    (maxFilesPerTrigger=1) must equal the batch groupBy: count,
    distinct event types, and the decimal-exact total."""
    from pyspark.sql import functions as F

    src = f"{tmp_path}/tws_src"
    schema = "user_id bigint, event_type string, value double"
    rows = [
        (i % 5, "abcd"[i % 4], float(i) * 1.015 + 0.005) for i in range(200)
    ]
    batch = spark.createDataFrame(rows, schema)
    batch.repartition(4).write.mode("overwrite").parquet(src)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    name = f"tws_{uuid.uuid4().hex[:8]}"
    try:
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            running_profile(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", f"{tmp_path}/tws_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        emissions = spark.table(name)
        # final state per key = emission with the highest n_events
        final = {}
        for r in emissions.collect():
            cur = final.get(r["user_id"])
            if cur is None or r["n_events"] > cur["n_events"]:
                final[r["user_id"]] = r
        expected = {
            r["user_id"]: r
            for r in batch.groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.countDistinct("event_type").alias("n_event_types"),
                F.round(F.sum(F.col("value").cast("decimal(24,6)")), 2)
                .cast("double")
                .alias("total_value"),
            )
            .collect()
        }
        assert set(final) == set(expected)
        for uid, exp in expected.items():
            got = final[uid]
            assert got["n_events"] == exp["n_events"], uid
            assert got["n_event_types"] == exp["n_event_types"], uid
            assert got["total_value"] == exp["total_value"], uid
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass
