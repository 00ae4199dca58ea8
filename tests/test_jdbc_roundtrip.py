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
