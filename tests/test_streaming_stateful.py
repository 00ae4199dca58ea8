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


def test_ewma_fold_batch_chunk_order_invariant():
    """A key's batch slice can span multiple Arrow chunks delivered in
    shuffle order; the fold must concat+sort across ALL chunks before
    running the recursion — per-chunk sorting would fold later
    timestamps first and corrupt the order-sensitive state."""
    import pandas as pd

    from oracle_to_oracle_data_integration_pipeline_spark.streaming.stateful import _ewma_fold_batch

    rows = [(i, 100 + i, float(i * 7 % 13)) for i in range(10)]
    whole = pd.DataFrame(rows, columns=["ts", "event_id", "value"])
    # chunk A carries the LATER half, chunk B the earlier half
    chunks_shuffled = [whole.iloc[5:].reset_index(drop=True),
                       whole.iloc[:5].reset_index(drop=True)]
    s_ref, n_ref = _ewma_fold_batch([whole], None, 0, 0.2)
    s_out, n_out = _ewma_fold_batch(chunks_shuffled, None, 0, 0.2)
    assert (s_out, n_out) == (s_ref, n_ref)


def test_ewma_fold_batch_continues_prior_state_exactly():
    """Folding [x1..xn] in two calls (state carried between) must be
    bit-identical to one call over the whole series — the cross-batch
    recursion contract the stream_ewma qid's batch oracle depends on."""
    import pandas as pd

    from oracle_to_oracle_data_integration_pipeline_spark.streaming.stateful import _ewma_fold_batch

    rows = [(i, i, float((i * 11) % 17) / 3.0) for i in range(20)]
    whole = pd.DataFrame(rows, columns=["ts", "event_id", "value"])
    s1, n1 = _ewma_fold_batch([whole.iloc[:8]], None, 0, 0.3)
    s2, n2 = _ewma_fold_batch([whole.iloc[8:]], s1, n1, 0.3)
    s_ref, n_ref = _ewma_fold_batch([whole], None, 0, 0.3)
    assert (s2, n2) == (s_ref, n_ref)  # exact, no tolerance
