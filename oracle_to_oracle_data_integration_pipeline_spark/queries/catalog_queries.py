"""Catalog / scan / control-plane queries (SURVEY.md §2.1, §2.6).

These exercise the engine's registry (`catalog.Catalog`), the topo-sort
load planner (`plans.topo`), schema clone, and the pushdown-friendly
scan shapes. Oracles for driver-side algorithms (topo order, catalog
listing, schema DDL) are pinned VALUES literals — deterministic by
construction, so any algorithm drift fails the diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oracle_to_oracle_data_integration_pipeline_spark.catalog import Catalog
from oracle_to_oracle_data_integration_pipeline_spark.plans.topo import topo_sort_tables
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load, local_result, tune


# -- qid: scan_full (S1: projection+filter pushdown) ------------------

def q_scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-column projection + range filter — both reach the parquet
    reader (PushedFilters + ReadSchema pruning; verified in tests)."""
    o = load(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


SQL_SCAN_FULL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
"""


# -- qid: project_order (P4: explicit column-order projection) --------

def q_project_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference builds explicit insert column lists in table order
    (`/root/reference/scripts/03_cdc_etl.py:138-139`)."""
    li = load(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_returnflag"]
    return li.filter(F.col("l_orderkey") % 100 == 0).select(*cols)


SQL_PROJECT_ORDER = """
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_returnflag
FROM lineitem WHERE l_orderkey % 100 = 0
"""


# -- qid: order_by (O1) -----------------------------------------------

def q_order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    return n.orderBy(F.col("n_name").desc(), F.col("n_nationkey")).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


SQL_ORDER_BY = """
SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_name DESC, n_nationkey
"""


# -- qid: catalog_tables (S3: runtime discovery) ----------------------

def q_catalog_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog.from_parquet_dir(tune(spark), sf_dir)
    rows = [(t, len(cat.get_pk_columns(t)), cat.table_exists(t)) for t in cat.list_tables()]
    schema = T.StructType(
        [
            T.StructField("table_name", T.StringType(), False),
            T.StructField("n_pk_cols", T.IntegerType(), False),
            T.StructField("exists", T.BooleanType(), False),
        ]
    )
    return local_result(spark, rows, schema)


SQL_CATALOG_TABLES = """
SELECT * FROM (VALUES
  ('customer', 1, true), ('documents', 1, true), ('embeddings', 1, true),
  ('events', 1, true), ('lineitem', 2, true), ('nation', 1, true),
  ('orders', 1, true), ('part', 1, true), ('region', 1, true), ('supplier', 1, true)
) AS t(table_name, n_pk_cols, "exists")
"""


# -- qid: catalog_columns (S4: per-table column discovery) ------------

def q_catalog_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level catalog discovery — the Spark twin of the
    reference's get_table_columns (utils/database.py: all_tab_columns
    query): every fixture table's (column, ordinal, type). The oracle
    reads DuckDB's information_schema over the same registered views,
    so the two engines' type systems are compared head-on via a
    normalizing map (INTEGER->int, VARCHAR->string, FLOAT[]->
    array<float>, ...)."""
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import (
        TABLES,
        load,
    )

    rows = []
    for t in sorted(TABLES):
        for i, (c, dt) in enumerate(load(spark, sf_dir, t).dtypes, start=1):
            # Spark 4 reads parquet timestamps as TIMESTAMP_NTZ; the
            # engine pins the session to UTC (queries/_util.tune) and
            # treats them as instants, so the catalog reports the
            # logical type — matching DuckDB's TIMESTAMP
            rows.append((t, c, i, "timestamp" if dt == "timestamp_ntz" else dt))
    return local_result(
        spark, rows, "table_name string, column_name string, ordinal int, data_type string"
    )


from oracle_to_oracle_data_integration_pipeline_spark.queries._util import TABLES as _TABLES

_TABLES_IN = ", ".join(f"'{t}'" for t in sorted(_TABLES))

SQL_CATALOG_COLUMNS = f"""
SELECT table_name, column_name,
       CAST(ordinal_position AS INT) AS ordinal,
       CASE data_type
         WHEN 'INTEGER' THEN 'int'
         WHEN 'BIGINT' THEN 'bigint'
         WHEN 'VARCHAR' THEN 'string'
         WHEN 'DOUBLE' THEN 'double'
         WHEN 'FLOAT' THEN 'float'
         WHEN 'TIMESTAMP' THEN 'timestamp'
         WHEN 'FLOAT[]' THEN 'array<float>'
         WHEN 'DOUBLE[]' THEN 'array<double>'
         ELSE lower(data_type)
       END AS data_type
FROM information_schema.columns
WHERE table_name IN ({_TABLES_IN})
"""


# -- qid: topo_order (O2: FK-aware load order) ------------------------

def q_topo_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kahn's algorithm over the discovered FK graph; deterministic
    lexicographic tie-break. Oracle pins the expected order."""
    cat = Catalog.from_parquet_dir(tune(spark), sf_dir)
    ordered, leftovers = topo_sort_tables(cat.list_tables(), cat.get_fk_relationships())
    rows = [(t, i + 1) for i, t in enumerate(ordered + leftovers)]
    schema = T.StructType(
        [
            T.StructField("table_name", T.StringType(), False),
            T.StructField("load_pos", T.IntegerType(), False),
        ]
    )
    return local_result(spark, rows, schema)


SQL_TOPO_ORDER = """
SELECT * FROM (VALUES
  ('documents', 1), ('embeddings', 2), ('events', 3), ('part', 4), ('region', 5),
  ('nation', 6), ('customer', 7), ('orders', 8), ('supplier', 9), ('lineitem', 10)
) AS t(table_name, load_pos)
"""


# -- qid: empty_clone (S10: schema-only clone, CTAS WHERE 1=2) --------

def q_empty_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`df.limit(0)` ≙ the reference's CTAS `WHERE 1=2` staging clone
    (`/root/reference/scripts/03_cdc_etl.py:98-120`). Driver compares
    schema + zero rows."""
    return load(spark, sf_dir, "orders").limit(0)


SQL_EMPTY_CLONE = "SELECT * FROM orders WHERE 1 = 2"


# -- qid: schema_clone (S8/S9: DDL extraction as data) ----------------

def q_schema_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema serialization — the engine's DBMS_METADATA.GET_DDL analog
    (`/root/reference/utils/database.py:49-55`): ordered (position,
    name, type) rows from the StructType."""
    df = load(spark, sf_dir, "orders")
    rows = [
        (i + 1, f.name, f.dataType.simpleString()) for i, f in enumerate(df.schema.fields)
    ]
    schema = T.StructType(
        [
            T.StructField("pos", T.IntegerType(), False),
            T.StructField("col_name", T.StringType(), False),
            T.StructField("col_type", T.StringType(), False),
        ]
    )
    return local_result(spark, rows, schema)


SQL_SCHEMA_CLONE = """
SELECT * FROM (VALUES
  (1, 'o_orderkey', 'bigint'), (2, 'o_custkey', 'bigint'), (3, 'o_orderstatus', 'string'),
  (4, 'o_totalprice', 'double'), (5, 'o_orderdate', 'timestamp_ntz'), (6, 'o_orderpriority', 'string')
) AS t(pos, col_name, col_type)
"""


QUERIES = {
    "scan_full": q_scan_full,
    "project_order": q_project_order,
    "order_by": q_order_by,
    "catalog_tables": q_catalog_tables,
    "catalog_columns": q_catalog_columns,
    "topo_order": q_topo_order,
    "empty_clone": q_empty_clone,
    "schema_clone": q_schema_clone,
}

ORACLE_SQL = {
    "scan_full": SQL_SCAN_FULL,
    "project_order": SQL_PROJECT_ORDER,
    "order_by": SQL_ORDER_BY,
    "catalog_tables": SQL_CATALOG_TABLES,
    "catalog_columns": SQL_CATALOG_COLUMNS,
    "topo_order": SQL_TOPO_ORDER,
    "empty_clone": SQL_EMPTY_CLONE,
    "schema_clone": SQL_SCHEMA_CLONE,
}
