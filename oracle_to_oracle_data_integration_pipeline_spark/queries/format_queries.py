"""Multi-format source/sink round-trips (SURVEY.md §2.1 source
breadth): JSON and CSV with explicit schemas (never inferSchema in a
pipeline — inference is a full extra pass and nondeterministic under
schema drift).

Timestamps are ISO-formatted on write and parsed back with an explicit
format so both engines agree on the wire representation.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load, tune


def _subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 101 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    )


SQL_ROUNDTRIP = """
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
FROM orders WHERE o_orderkey % 101 = 0
"""


# -- qid: json_roundtrip ----------------------------------------------

def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    out = tempfile.mkdtemp(prefix="json_rt_")
    df = _subset(spark, sf_dir)
    df.write.mode("overwrite").json(out)
    back = spark.read.schema(df.schema).json(out)
    return back


# -- qid: csv_roundtrip -----------------------------------------------

def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    out = tempfile.mkdtemp(prefix="csv_rt_")
    df = _subset(spark, sf_dir)
    df.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(df.schema).option("header", True).csv(out)
    return back


# -- qid: orc_roundtrip -----------------------------------------------

def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC columnar round-trip. Unlike the text formats, ORC carries
    its own typed schema and min/max stripe statistics, so the read
    back gets predicate pushdown and column pruning like parquet."""
    tune(spark)
    out = tempfile.mkdtemp(prefix="orc_rt_")
    df = _subset(spark, sf_dir)
    df.write.mode("overwrite").orc(out)
    return spark.read.orc(out)


# -- qid: sql_ddl_roundtrip -------------------------------------------

def q_sql_ddl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL DDL surface end-to-end — the reference's DDL
    extract/replay pattern (scripts/02_clone_schema_structure.py)
    driven entirely through spark.sql: CREATE TABLE (parquet-backed
    table at an explicit fresh LOCATION — a default-location managed
    table would land in $PWD/spark-warehouse and accrete rows across
    executions), ALTER TABLE ADD COLUMNS (the CDC-column evolution
    step, scripts/01_prepare_cdc_columns:20-38), INSERT INTO ... SELECT
    from a registered view, then read back through the catalog.

    The readback is materialized EAGERLY (nation is 25 rows — catalog
    metadata scale) so the table can be dropped and its location
    removed in the ``finally`` before returning: no tempdir survives
    the call, no table stays registered, no module-global state — the
    qid is hermetic under repetition and concurrent sessions. The
    distributed-write plan under test (CTAS + INSERT INTO) is
    unaffected; only the 25-row verification readback is local."""
    tune(spark)
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_src")
    spark.sql("DROP TABLE IF EXISTS ddl_rt_nation")
    loc = tempfile.mkdtemp(prefix="ddl_rt_")
    try:
        spark.sql(
            f"""CREATE TABLE ddl_rt_nation (
                   n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT
               ) USING parquet LOCATION '{loc}'"""
        )
        spark.sql("ALTER TABLE ddl_rt_nation ADD COLUMNS (load_tag STRING)")
        spark.sql(
            """INSERT INTO ddl_rt_nation
               SELECT n_nationkey, n_name, n_regionkey, 'batch1' AS load_tag
               FROM nation_src"""
        )
        readback = spark.sql(
            "SELECT n_nationkey, n_name, n_regionkey, load_tag FROM ddl_rt_nation"
        )
        rows = readback.collect()
        return spark.createDataFrame(rows, schema=readback.schema)
    finally:
        spark.sql("DROP TABLE IF EXISTS ddl_rt_nation")
        shutil.rmtree(loc, ignore_errors=True)


SQL_SQL_DDL_ROUNDTRIP = """
SELECT n_nationkey, n_name, n_regionkey, 'batch1' AS load_tag FROM nation
"""


QUERIES = {
    "sql_ddl_roundtrip": q_sql_ddl_roundtrip,
    "json_roundtrip": q_json_roundtrip,
    "csv_roundtrip": q_csv_roundtrip,
    "orc_roundtrip": q_orc_roundtrip,
}

ORACLE_SQL = {
    "sql_ddl_roundtrip": SQL_SQL_DDL_ROUNDTRIP,
    "json_roundtrip": SQL_ROUNDTRIP,
    "csv_roundtrip": SQL_ROUNDTRIP,
    "orc_roundtrip": SQL_ROUNDTRIP,
}
