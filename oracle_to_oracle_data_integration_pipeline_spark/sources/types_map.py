"""Database ↔ Spark type mapping for the JDBC path.

The reference relies entirely on Spark's JDBC dialect inference
(`/root/reference/scripts/03_cdc_etl.py:282`, SURVEY.md §1.2). This
module makes the mapping explicit and testable, for schema cloning to
a database target (`get_table_ddl` rendering) and for validating what
inference produced. Mappings follow Spark's documented Oracle dialect
defaults (public Spark source: `OracleDialect.scala`) — not any
private system.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Spark type -> portable ANSI/Oracle-style DDL type name
SPARK_TO_DB_DDL: list[tuple[type, str]] = [
    (T.LongType, "NUMBER(19)"),
    (T.IntegerType, "NUMBER(10)"),
    (T.ShortType, "NUMBER(5)"),
    (T.ByteType, "NUMBER(3)"),
    (T.DoubleType, "BINARY_DOUBLE"),
    (T.FloatType, "BINARY_FLOAT"),
    (T.BooleanType, "NUMBER(1)"),
    (T.StringType, "VARCHAR2(4000)"),
    (T.BinaryType, "BLOB"),
    (T.DateType, "DATE"),
    (T.TimestampType, "TIMESTAMP(6)"),
    (T.TimestampNTZType, "TIMESTAMP(6)"),
]


def spark_field_to_db(field: T.StructField) -> str:
    for spark_t, ddl in SPARK_TO_DB_DDL:
        if isinstance(field.dataType, spark_t):
            null = "" if field.nullable else " NOT NULL"
            return f"{field.name} {ddl}{null}"
    if isinstance(field.dataType, T.DecimalType):
        d = field.dataType
        return f"{field.name} NUMBER({d.precision},{d.scale})"
    raise ValueError(f"no DB DDL mapping for {field.dataType} (column {field.name})")


def schema_to_db_ddl(schema: T.StructType, table: str) -> str:
    """CREATE TABLE DDL for a database target — the engine-side
    counterpart of the reference's DDL replay
    (`/root/reference/scripts/02_clone_schema_structure.py:42-53`);
    no storage clauses to strip because none are generated."""
    cols = ", ".join(spark_field_to_db(f) for f in schema.fields)
    return f"CREATE TABLE {table} ({cols})"


# DB numeric metadata -> Spark type (inference validation): what
# Spark's Oracle dialect produces for NUMBER(p,s)
def db_number_to_spark(precision: int | None, scale: int | None) -> T.DataType:
    if precision is None:  # unbounded NUMBER
        return T.DecimalType(38, 10)
    if (scale or 0) == 0:
        if precision <= 2:
            return T.ByteType()
        if precision <= 4:
            return T.ShortType()
        if precision <= 9:
            return T.IntegerType()
        if precision <= 18:
            return T.LongType()
    return T.DecimalType(min(precision, 38), min(scale or 0, 38))
