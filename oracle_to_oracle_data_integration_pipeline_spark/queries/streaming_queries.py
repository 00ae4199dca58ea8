"""Streaming qids (SURVEY.md §2.9): tumbling / sliding / session
window aggregations over the events fixture, batch-SQL-checkable.

``stream_tumbling`` executes as a REAL Structured Streaming query
(readStream → windowed agg → memory sink, drained synchronously) so the
driver exercises the streaming engine itself; sliding/session run the
same window builders in batch mode (`F.window`/`F.session_window` are
mode-agnostic). All three have exact DuckDB oracles: epoch-aligned
buckets ≙ time_bucket/date_trunc; session windows ≙ the lag/gap-islands
pattern.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load, tune
from oracle_to_oracle_data_integration_pipeline_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)

_SUM_SQL = "CAST(round(sum(CAST(value AS DECIMAL(24,6))), 2) AS DOUBLE)"


# -- qid: stream_tumbling (true readStream execution) -----------------

def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    path = os.path.join(sf_dir, "events.parquet")
    # The file stream source needs a directory; expose the read-only
    # fixture file through a symlinked temp dir.
    import tempfile

    stream_dir = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(path, os.path.join(stream_dir, "events.parquet"))
    schema = spark.read.parquet(path).schema  # bigint ts (nanos)
    stream = (
        spark.readStream.schema(schema)
        .parquet(stream_dir)
        .withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
    )
    agg = tumbling_agg(stream, "1 hour", by="event_type")
    name = f"tumbling_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


SQL_TUMBLING = f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*) AS n_events,
       {_SUM_SQL} AS sum_value
FROM events GROUP BY 1, 2, 3
"""


# -- qid: stream_sliding ----------------------------------------------

def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(load(spark, sf_dir, "events"), "2 hours", "1 hour")


SQL_SLIDING = f"""
WITH exploded AS (
  SELECT date_trunc('hour', ts) AS ws, value FROM events
  UNION ALL
  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, value FROM events
)
SELECT ws AS window_start, ws + INTERVAL 2 HOUR AS window_end,
       count(*) AS n_events, {_SUM_SQL} AS sum_value
FROM exploded GROUP BY ws
"""


# -- qid: stream_session ----------------------------------------------

def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_agg(load(spark, sf_dir, "events"), "6 hours", key="user_id")


SQL_SESSION = f"""
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 6 HOUR
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL 6 HOUR AS session_end,
       user_id,
       count(*) AS n_events,
       {_SUM_SQL} AS sum_value
FROM sess GROUP BY user_id, sid
"""


QUERIES = {
    "stream_tumbling": q_stream_tumbling,
    "stream_sliding": q_stream_sliding,
    "stream_session": q_stream_session,
}

ORACLE_SQL = {
    "stream_tumbling": SQL_TUMBLING,
    "stream_sliding": SQL_SLIDING,
    "stream_session": SQL_SESSION,
}
