"""applyInPandasWithState operator: state must persist across
micro-batches (streaming/stateful.py)."""

from __future__ import annotations

import datetime
import uuid

from oracle_to_oracle_data_integration_pipeline_spark.streaming.stateful import running_totals

TS = datetime.datetime


def test_running_totals_across_batches(spark, tmp_path):
    src = f"{tmp_path}/ev"
    schema = "user_id long, ts timestamp, value double"
    b1 = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 10), 1.0), (1, TS(2024, 1, 1, 11), 2.0), (2, TS(2024, 1, 1, 10), 5.0)],
        schema,
    )
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    b2 = spark.createDataFrame([(1, TS(2024, 1, 2, 10), 4.0)], schema)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1).parquet(src)
    name = f"rt_{uuid.uuid4().hex[:8]}"
    q = (
        running_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    # update mode appends one row per key per batch to the memory sink;
    # the LAST row per key carries the final running totals
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    assert final[1] == (3, 7.0), f"state did not carry across batches: {rows}"
    assert final[2] == (1, 5.0)
    # user 1 must have emitted at least twice (once per batch it appeared in)
    assert sum(1 for r in rows if r["user_id"] == 1) >= 2
