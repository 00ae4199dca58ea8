"""Source/sink protocols.

A Source yields DataFrames per table and can attempt predicate pushdown;
a Sink persists a DataFrame with a write mode. Both are deliberately
minimal: the engine's operators work on DataFrames, never on sources
directly, so any Spark-readable format slots in.
"""

from __future__ import annotations

from typing import Protocol

from pyspark.sql import Column, DataFrame


class Source(Protocol):
    def load(self, table: str) -> DataFrame:  # pragma: no cover - protocol
        ...

    def load_where(self, table: str, predicate: Column | None) -> DataFrame:
        """Load with a pushdown-eligible predicate applied at the scan.

        For parquet, applying ``.filter`` on the scan is enough — Catalyst
        pushes comparisons on base columns into the reader (row-group
        min/max pruning). For JDBC the predicate must be rendered into the
        pushed query (the reference instead filtered after a full-table
        read because its predicate used a derived column — see
        /root/reference/scripts/03_cdc_etl.py:282-294 and SURVEY.md §4).
        """
        ...  # pragma: no cover - protocol


class Sink(Protocol):
    def write(self, df: DataFrame, table: str, mode: str = "append") -> None:  # pragma: no cover
        ...
