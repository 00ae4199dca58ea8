"""Live JDBC roundtrip against embedded Derby (the JDBC-capable jar
Spark bundles for its Hive metastore) — pins the option plumbing of
sources/jdbc.py end-to-end: sink write, full load, stride-partitioned
load, and remote predicate pushdown via the dbtable subquery.

Derby stands in for the reference's Oracle transport
(`/root/reference/scripts/03_cdc_etl.py:281-319`): same Spark JDBC
relation, different dialect. Skip-gated on the jar so the suite stays
green in environments without it.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.sources.jdbc import (
    JdbcSink,
    JdbcSource,
    partition_options,
    pushdown_subquery,
)

try:
    import pyspark

    _JARS = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    HAVE_DERBY = bool(glob.glob(os.path.join(_JARS, "derby-*.jar")))
except Exception:  # pragma: no cover
    HAVE_DERBY = False

pytestmark = pytest.mark.skipif(
    not HAVE_DERBY, reason="no embedded JDBC driver jar available"
)

DRIVER = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derby") / "smokedb"
    return f"jdbc:derby:{db_dir};create=true"


@pytest.fixture(scope="module")
def seeded(spark, derby_url):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("row_"), F.col("id")).alias("payload"),
    )
    JdbcSink(derby_url, properties=DRIVER, batchsize=200).write(
        df, "smoke", mode="overwrite"
    )
    return derby_url


def test_full_load_roundtrip(spark, seeded):
    src = JdbcSource(spark, seeded, properties=DRIVER)
    got = src.load("smoke")
    assert got.count() == 1000
    assert {c.lower() for c in got.columns} == {"k", "grp", "payload"}


def test_partitioned_load_strides(spark, seeded):
    src = JdbcSource(spark, seeded, properties=DRIVER)
    got = src.load_partitioned("smoke", "k", 0, 999, num_partitions=8)
    # stride partitioning must not drop or duplicate rows — including
    # the open-ended edge strides
    assert got.count() == 1000
    assert got.rdd.getNumPartitions() == 8


def test_partitioned_load_with_pushdown(spark, seeded):
    src = JdbcSource(spark, seeded, properties=DRIVER)
    got = src.load_partitioned(
        "smoke", "k", 0, 999, num_partitions=4, predicate_sql='"grp" = 3'  # Derby: Spark created quoted lowercase identifiers
    )
    rows = got.collect()
    assert len(rows) == len([i for i in range(1000) if i % 7 == 3])
    assert all(r["grp"] == 3 for r in rows)


def test_load_where_remote_predicate(spark, seeded):
    src = JdbcSource(spark, seeded, properties=DRIVER)
    got = src.load_where("smoke", None, predicate_sql='"k" >= 990')
    assert sorted(r["k"] for r in got.collect()) == list(range(990, 1000))


def test_pushdown_subquery_shape():
    # alias without AS — Oracle rejects `AS` on table aliases
    assert (
        pushdown_subquery("s.t", "x > 1")
        == "(SELECT * FROM s.t WHERE x > 1) spark_pushdown"
    )
    opts = partition_options("t", "k", 0, 10, 4, predicate_sql="x > 1")
    assert opts["numPartitions"] == "4"
    assert opts["dbtable"].startswith("(SELECT * FROM t WHERE x > 1)")


def test_cdc_delta_predicate_lands_in_jdbc_relation(spark, derby_url, tmp_path):
    """The pipeline's own rewritten base-column delta predicate
    (operators/cdc.py delta_predicate_sql — SURVEY §3/§4: the
    reference filters a derived column AFTER a full-table JDBC read)
    must land INSIDE the pushed JDBC subquery, and the JDBC delta must
    row-match the parquet path running the Column twin of the same
    predicate. This is the end-to-end proof on a real JDBC relation,
    not just the option-dict unit test."""
    import datetime

    from oracle_to_oracle_data_integration_pipeline_spark.operators.cdc import (
        delta_predicate,
        delta_predicate_sql,
    )

    TS = datetime.datetime
    df = spark.createDataFrame(
        [
            # (k, created_at, updated_at): 2 rows before the watermark,
            # 1 created-after, 1 updated-after with old created (the
            # case the OR rewrite exists for), 1 NULL updated_at after
            (1, TS(2024, 1, 1), None),
            (2, TS(2024, 1, 2), TS(2024, 1, 3)),
            (3, TS(2024, 2, 1), None),
            (4, TS(2024, 1, 1), TS(2024, 2, 2)),
            (5, TS(2024, 2, 5), None),
        ],
        "k long, created_at timestamp, updated_at timestamp",
    )
    JdbcSink(derby_url, properties=DRIVER).write(df, "cdc_src", mode="overwrite")
    wm = "2024-01-15 00:00:00"

    # Spark's JDBC writer created quoted lowercase identifiers; render
    # the predicate against those (Oracle would take bare/upper names).
    # Derby takes TIMESTAMP('...') function form, not the ANSI literal
    # Oracle takes — delta_predicate_sql passes a pre-rendered literal
    # through untouched (the dialect hook).
    psql = delta_predicate_sql(
        f"TIMESTAMP('{wm}')", created='"created_at"', updated='"updated_at"'
    )
    src = JdbcSource(spark, derby_url, properties=DRIVER)
    remote = src.load_where("cdc_src", None, predicate_sql=psql)

    plan = remote._jdf.queryExecution().executedPlan().toString()
    assert "spark_pushdown" in plan, plan           # subquery is the relation
    assert '"created_at" > TIMESTAMP' in plan, plan  # predicate inside it
    assert '"updated_at" > TIMESTAMP' in plan, plan

    parquet_path = str(tmp_path / "cdc_src_parquet")
    df.write.parquet(parquet_path)
    local = spark.read.parquet(parquet_path).filter(delta_predicate(wm))

    got = sorted(r["k"] for r in remote.collect())
    want = sorted(r["k"] for r in local.collect())
    assert got == want == [3, 4, 5]
