"""Stateful streaming dedup: dropDuplicatesWithinWatermark — the
streaming analog of latest_per_key for at-least-once sources
(duplicate event deliveries collapse while state stays bounded by the
watermark)."""

from __future__ import annotations

import datetime
import uuid

from pyspark.sql import functions as F

TS = datetime.datetime


def test_stream_dedup_within_watermark(spark, tmp_path):
    src = f"{tmp_path}/dup_src"
    schema = "event_id long, ts timestamp, v long"
    batch = spark.createDataFrame(
        [
            (1, TS(2024, 1, 1, 10, 0), 10),
            (1, TS(2024, 1, 1, 10, 0), 10),   # exact duplicate delivery
            (2, TS(2024, 1, 1, 10, 5), 20),
            (2, TS(2024, 1, 1, 10, 6), 21),   # same id, later ts: still dup by key
            (3, TS(2024, 1, 1, 11, 0), 30),
        ],
        schema,
    )
    batch.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])
    name = f"dd_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["event_id"], []).append(r["v"])
    assert set(by_id) == {1, 2, 3}
    assert all(len(v) == 1 for v in by_id.values()), f"duplicates survived: {by_id}"
