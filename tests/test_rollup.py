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


def test_streaming_foreachbatch_rollup_equals_rebuild(spark, tmp_path):
    """The rollup composes with Structured Streaming: a foreachBatch
    sink maintaining rollup state over micro-batches ends exactly equal
    to the batch rebuild over all the data."""
    import shutil

    src = str(tmp_path / "stream_src")
    df = spark.range(0, 5000).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 0.5).alias("v")
    )
    # three separate files -> up to three micro-batches
    for i in range(3):
        df.filter(F.col("id") % 3 == i).coalesce(1).write.mode("append").parquet(src)

    state = {"df": None}

    def fold(batch_df, batch_id):
        batch = batch_df.localCheckpoint(eager=True)
        if state["df"] is None:
            state["df"] = rollup_build(batch, ["k"], ["v"]).localCheckpoint(eager=True)
        else:
            state["df"] = rollup_refresh(
                state["df"], batch, ["k"], ["v"]
            ).localCheckpoint(eager=True)

    q = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
        shutil.rmtree(str(tmp_path / "ckpt"), ignore_errors=True)

    got = _canon(state["df"].withColumnRenamed("sum_v", "sum_v"))
    want = _canon(rollup_build(df, ["k"], ["v"]))
    assert got == want
