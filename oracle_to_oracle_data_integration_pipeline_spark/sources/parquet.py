"""Parquet source/sink — the engine's default storage.

Columnar, splittable, min/max-statistics-bearing: filters on base
columns prune row groups, projections prune columns, and a 100 TB table
becomes ~100k independent scan tasks. This is the property the engine's
delta predicate is designed around (see operators/cdc.py:
``delta_predicate`` rewrites the derived-column filter onto base columns
so pushdown survives).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession


class ParquetSource:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, table: str) -> str:
        # Fixture layout: one file per table; production layout: a
        # directory of part files (both read identically).
        p = os.path.join(self.root, f"{table}.parquet")
        return p if os.path.exists(p) else os.path.join(self.root, table)

    def load(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def load_where(self, table: str, predicate: Column | None) -> DataFrame:
        df = self.load(table)
        return df.filter(predicate) if predicate is not None else df


class ParquetSink:
    def __init__(self, root: str):
        self.root = root

    def write(self, df: DataFrame, table: str, mode: str = "append") -> None:
        df.write.mode(mode).parquet(os.path.join(self.root, table))
