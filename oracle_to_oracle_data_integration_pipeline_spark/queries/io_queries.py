"""I/O & state qids (SURVEY.md §2.1 S2/S11, §2.4 A1): the sink append
path, the watermark store round-trip, and the delta-count gate.

These exercise real writes: each call uses a fresh temp directory, so
repeated driver runs are isolated.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.watermark import WatermarkStore
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load, tune
from oracle_to_oracle_data_integration_pipeline_spark.queries.cdc_queries import CDC_SRC_SQL, WM, cdc_orders
from oracle_to_oracle_data_integration_pipeline_spark.operators.cdc import change_ts_col, delta_predicate


# -- qid: sink_append (S2: batched append write path) -----------------

def q_sink_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the recent-orders slice in two append batches (the
    reference's staging write, `/root/reference/scripts/03_cdc_etl.py:309-319`),
    read it back. The oracle is the logical content — proving the sink
    neither drops nor duplicates rows across appends."""
    tune(spark)
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    out = tempfile.mkdtemp(prefix="sink_append_")
    first = o.filter(F.col("o_orderkey") % 2 == 0)
    second = o.filter(F.col("o_orderkey") % 2 == 1)
    first.write.mode("append").parquet(out)
    second.write.mode("append").parquet(out)
    return spark.read.parquet(out)


SQL_SINK_APPEND = """
SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
"""


# -- qid: watermark_store (S11: keyed persistent state) ---------------

def q_watermark_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get/upsert round-trip incl. an overwriting upsert — MERGE
    semantics of the reference's ETL_WATERMARKS
    (`/root/reference/scripts/03_cdc_etl.py:56-96`)."""
    tune(spark)
    import datetime

    store = WatermarkStore(spark, tempfile.mkdtemp(prefix="wm_") + "/state")
    store.upsert("orders", datetime.datetime(2001, 1, 1))
    store.upsert("lineitem", datetime.datetime(2001, 2, 2))
    store.upsert("orders", datetime.datetime(2001, 3, 3))  # upsert overwrites
    assert store.get("missing") is None  # NULL watermark → full load
    rows = [(k, v) for k, v in sorted(store.all().items())]
    return spark.createDataFrame(rows, "table_name string, last_ts timestamp")


SQL_WATERMARK_STORE = """
SELECT * FROM (VALUES
  ('LINEITEM', TIMESTAMP '2001-02-02'),
  ('ORDERS',   TIMESTAMP '2001-03-03')
) AS t(table_name, last_ts)
"""


# -- qid: delta_count (A1: empty-delta gate) --------------------------

def q_delta_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's cardinality gate
    (`/root/reference/scripts/03_cdc_etl.py:296-301`); in-engine the
    pipeline uses isEmpty() instead of a full count, but the count
    itself is the checkable contract."""
    import datetime

    wm = datetime.datetime.fromisoformat(WM)
    delta = cdc_orders(spark, sf_dir).filter(delta_predicate(wm))
    return delta.agg(F.count(F.lit(1)).alias("delta_rows"))


SQL_DELTA_COUNT = f"""
WITH {CDC_SRC_SQL}
SELECT count(*) AS delta_rows FROM cdc_src
WHERE created_at > TIMESTAMP '{WM}' OR updated_at > TIMESTAMP '{WM}'
"""


QUERIES = {
    "sink_append": q_sink_append,
    "watermark_store": q_watermark_store,
    "delta_count": q_delta_count,
}

ORACLE_SQL = {
    "sink_append": SQL_SINK_APPEND,
    "watermark_store": SQL_WATERMARK_STORE,
    "delta_count": SQL_DELTA_COUNT,
}
