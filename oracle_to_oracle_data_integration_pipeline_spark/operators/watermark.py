"""Per-table high-water-mark store — the engine's only persistent state.

Parity with the reference's ``ETL_WATERMARKS`` table and its access
protocol (`/root/reference/scripts/03_cdc_etl.py:56-96`):

- keyed by upper-cased table name (reference normalizes at
  `/root/reference/scripts/03_cdc_etl.py:81,94`);
- point lookup per table before the delta read;
- upsert AFTER a successful merge only — at-least-once delivery, safe
  because the merge is idempotent last-writer-wins
  (`/root/reference/scripts/03_cdc_etl.py:324-334`, `README.md:287`).

Storage is a single small parquet dataset (hundreds of rows at most —
one per table). Reads/writes are driver-cheap; this is control-plane
state, exactly like Structured Streaming checkpoint offsets, and is NOT
on the data path. Writes go through a temp-dir + atomic rename so a
crashed writer never leaves a half-written state visible.
"""

from __future__ import annotations

import os
import shutil
import threading
import uuid
from datetime import datetime

from pyspark.sql import SparkSession
from pyspark.sql import types as T

_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType(), False),
        T.StructField("last_ts", T.TimestampType(), True),
    ]
)


class WatermarkStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        # upsert is read-modify-write of the whole (tiny) state; the
        # pipeline replicates independent tables from driver threads,
        # so serialize mutations or concurrent upserts lose updates
        # (observed: a parallel wave dropped a table's watermark and
        # the next run re-replicated it).
        self._lock = threading.Lock()

    def _read_all(self) -> dict[str, datetime]:
        if not os.path.exists(self.path):
            return {}
        rows = self.spark.read.schema(_SCHEMA).parquet(self.path).collect()
        return {r["table_name"]: r["last_ts"] for r in rows}

    def get(self, table: str) -> datetime | None:
        """``get_last_watermark`` parity
        (`/root/reference/scripts/03_cdc_etl.py:77-83`): None → full load.

        Takes the store lock: an unlocked read can land in an upsert's
        rename window (path briefly absent between the two renames) and
        either fail or silently report "no watermark" → spurious full
        reload. Same-process only; multi-driver deployments need
        per-table state files."""
        with self._lock:
            return self._read_all().get(table.upper())

    def upsert(self, table: str, ts: datetime) -> None:
        """``upsert_watermark`` parity
        (`/root/reference/scripts/03_cdc_etl.py:85-96`)."""
        with self._lock:
            state = self._read_all()
            state[table.upper()] = ts
            self._write_all(state)

    def _write_all(self, state: dict[str, datetime]) -> None:
        df = self.spark.createDataFrame(
            [(k, v) for k, v in sorted(state.items())], schema=_SCHEMA
        ).coalesce(1)
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}.old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def all(self) -> dict[str, datetime]:
        with self._lock:
            return self._read_all()
