"""local_result fidelity: the Arrow-backed rebuild (round 11) must be
value-identical to the pickled-RDD path for every type family the
engine collects — and must FALL BACK for NaN, which Arrow's
from_pandas would silently fold into NULL."""

from __future__ import annotations

import datetime
import decimal

from pyspark.sql import Row
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import (
    _any_nan,
    local_result,
)

HOSTILE_SCHEMA = (
    "a long, b double, c decimal(24,6), d string, e timestamp, "
    "f array<double>, g binary"
)
BIG = (1 << 62) + 12345  # would lose precision through a float64 round-trip


def _hostile_rows():
    return [
        Row(a=BIG, b=-0.0, c=decimal.Decimal("123456.654321"), d=None,
            e=datetime.datetime(2024, 1, 1, 12, 30, 15, 123456),
            f=[1.5, None, 2.25], g=bytearray(b"\x00\xff")),
        Row(a=None, b=1e308, c=None, d="x", e=None, f=None, g=None),
        Row(a=-BIG, b=5e-324, c=decimal.Decimal("-0.000001"), d="",
            e=datetime.datetime(1970, 1, 1), f=[], g=bytearray(b"")),
    ]


def _norm(rows):
    return sorted(tuple(repr(v) for v in r) for r in rows)


def test_local_result_matches_pickled_path_bit_for_bit(spark):
    rows = _hostile_rows()
    ref = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), HOSTILE_SCHEMA
    ).collect()
    got = local_result(spark, rows, HOSTILE_SCHEMA).collect()
    assert _norm(got) == _norm(ref)


def test_local_result_struct_column_roundtrip(spark):
    """Window-shaped struct columns (the streaming sink schema)."""
    src = spark.range(5).select(
        F.struct(
            F.col("id").cast("timestamp").alias("start"),
            (F.col("id") + 3600).cast("timestamp").alias("end"),
        ).alias("window"),
        (F.col("id") * 2).alias("n"),
    )
    rows, schema = src.collect(), src.schema
    got = local_result(spark, rows, schema).collect()
    assert _norm(got) == _norm(rows)


def test_local_result_nan_preserved_via_fallback(spark):
    rows = [Row(x=float("nan"), y=1.0), Row(x=2.0, y=None)]
    got = local_result(spark, rows, "x double, y double").collect()
    by_y = {r["y"]: r["x"] for r in got}
    assert by_y[1.0] != by_y[1.0]  # NaN stayed NaN, not NULL
    assert by_y[None] == 2.0


def test_any_nan_recurses_into_arrays_and_structs():
    assert _any_nan([Row(a=[1.0, float("nan")])])
    assert _any_nan([(1, {"k": float("nan")})])
    assert not _any_nan([Row(a=[1.0, None], b="nan")])


def test_local_result_empty(spark):
    assert local_result(spark, [], "a long, b string").count() == 0
