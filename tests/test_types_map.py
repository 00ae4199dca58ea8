from pyspark.sql import types as T

import pytest

from oracle_to_oracle_data_integration_pipeline_spark.sources.types_map import (
    db_number_to_spark,
    schema_to_db_ddl,
    spark_field_to_db,
)


def test_schema_to_db_ddl_roundtrip_shape():
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("amount", T.DecimalType(12, 2), True),
            T.StructField("created_at", T.TimestampType(), True),
            T.StructField("is_deleted", T.StringType(), False),
        ]
    )
    ddl = schema_to_db_ddl(schema, "t")
    assert ddl == (
        "CREATE TABLE t (id NUMBER(19) NOT NULL, name VARCHAR2(4000), "
        "amount NUMBER(12,2), created_at TIMESTAMP(6), is_deleted VARCHAR2(4000) NOT NULL)"
    )


def test_unmappable_type_raises():
    f = T.StructField("arr", T.ArrayType(T.IntegerType()), True)
    with pytest.raises(ValueError, match="no DB DDL mapping"):
        spark_field_to_db(f)


def test_db_number_inference():
    assert isinstance(db_number_to_spark(10, 0), T.LongType)
    assert isinstance(db_number_to_spark(9, 0), T.IntegerType)
    assert isinstance(db_number_to_spark(4, 0), T.ShortType)
    assert db_number_to_spark(12, 2) == T.DecimalType(12, 2)
    assert db_number_to_spark(None, None) == T.DecimalType(38, 10)


def test_jdbc_partition_options_strides():
    from oracle_to_oracle_data_integration_pipeline_spark.sources.jdbc import partition_options

    opts = partition_options("SRC.ORDERS", "O_ORDERKEY", 1, 1_000_000, 32)
    assert opts["dbtable"] == "SRC.ORDERS"
    assert opts["partitionColumn"] == "O_ORDERKEY"
    assert (opts["lowerBound"], opts["upperBound"], opts["numPartitions"]) == ("1", "1000000", "32")


def test_jdbc_partition_options_pushdown_subquery():
    from oracle_to_oracle_data_integration_pipeline_spark.sources.jdbc import partition_options

    opts = partition_options(
        "SRC.ORDERS", "O_ORDERKEY", 1, 100, 4,
        predicate_sql="UPDATED_AT > TIMESTAMP '2024-01-01 00:00:00' OR CREATED_AT > TIMESTAMP '2024-01-01 00:00:00'",
    )
    assert opts["dbtable"].startswith("(SELECT * FROM SRC.ORDERS WHERE UPDATED_AT")
    assert opts["dbtable"].endswith(") spark_pushdown")


def test_jdbc_partition_options_rejects_bad_count():
    import pytest as _pytest

    from oracle_to_oracle_data_integration_pipeline_spark.sources.jdbc import partition_options

    with _pytest.raises(ValueError):
        partition_options("T", "id", 0, 1, 0)
