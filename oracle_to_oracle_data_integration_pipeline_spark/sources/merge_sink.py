"""Transactional MERGE INTO sink — the table-format twin of
``operators.cdc.merge_soft_delete``.

The reference's production merge is atomic because it happens INSIDE
Oracle (`/root/reference/scripts/03_cdc_etl.py:129-172`: one MERGE
statement, one transaction). The engine's default target is plain
parquet, where ``plans.pipeline.ParquetTargetStore`` emulates
replacement with a lock + rename swap — correct for a single writer
pipeline, but not atomic under concurrent writers and briefly ENOENT
for readers mid-swap. ACID table formats (Delta Lake, Apache Iceberg)
close that gap: their ``MERGE INTO`` is a single optimistic-concurrency
commit — readers always see a complete snapshot, concurrent writers
conflict-detect instead of corrupting.

This module is deliberately thin:

- :func:`build_merge_into_sql` renders the reference's soft-delete
  merge semantics as ONE standard ``MERGE INTO`` statement (the same
  text runs on Delta, Iceberg, or Oracle itself — the dialect overlap
  is exactly the subset used). Tested unconditionally.
- :class:`DeltaMergeSink` executes it against a Delta table via
  ``spark.sql`` and satisfies the ``Sink`` protocol
  (sources/base.py:33). Constructed only when delta-spark is on the
  classpath (:func:`delta_available`); tests skip otherwise, per the
  no-install environment contract.

Semantics pinned equal to ``merge_soft_delete`` (both derive from
scripts/03_cdc_etl.py:145-161):

- MATCHED → row takes every non-PK delta column (including
  ``is_deleted`` — a soft delete of an existing row is an update).
- NOT MATCHED → insert only when ``delta.is_deleted = 'N'``; a soft
  delete for a key the target never saw is dropped, so tombstones
  never materialize phantom rows.
- Target rows without a delta match pass through untouched (MERGE
  leaves them in place — no WHEN NOT MATCHED BY SOURCE clause).

The delta batch must carry AT MOST ONE row per key — exactly the
contract Oracle's MERGE enforces with ORA-30926. Resolve multi-op
batches first with ``operators.cdc.latest_per_key`` or
``operators.reconcile.resolve_op_conflicts``; Delta raises a
DELTA_MULTIPLE_SOURCE_ROW_MATCHING error otherwise, same failure
shape.

At 100 TB: the MERGE plan Delta/Iceberg produce is the same shape as
``merge_soft_delete(strategy=...)`` — a join of target files against
the delta, rewriting ONLY files containing matched keys (file-level
skipping via min/max stats plays the role of the broadcast_delta
anti/semi decomposition). The atomicity is free; the physical work is
not worse.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from oracle_to_oracle_data_integration_pipeline_spark.operators.cdc import DELETED


def _q(ident: str) -> str:
    """Backtick-quote an identifier (Spark/Delta/Iceberg quoting; the
    doubled-backtick escape guards the degenerate name)."""
    return "`" + ident.replace("`", "``") + "`"


def build_merge_into_sql(
    target_table: str,
    delta_view: str,
    pk: list[str],
    columns: list[str],
    deleted_col: str = DELETED,
) -> str:
    """Render the soft-delete upsert as one MERGE INTO statement.

    ``columns`` is the full ordered column list of both sides (PK
    columns included); the SET list is every non-PK column, the INSERT
    list is every column. ``target_table`` and ``delta_view`` are
    trusted SQL identifiers supplied by the pipeline author (table
    name / registered temp view), not data.
    """
    if not pk:
        raise ValueError("MERGE requires at least one key column")
    missing = [c for c in list(pk) + [deleted_col] if c not in columns]
    if missing:
        raise ValueError(f"columns list is missing {missing}")
    on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in pk)
    set_cols = [c for c in columns if c not in pk]
    sets = ", ".join(f"t.{_q(c)} = s.{_q(c)}" for c in set_cols)
    ins_cols = ", ".join(_q(c) for c in columns)
    ins_vals = ", ".join(f"s.{_q(c)}" for c in columns)
    return (
        f"MERGE INTO {target_table} t\n"
        f"USING {delta_view} s\n"
        f"ON {on}\n"
        f"WHEN MATCHED THEN UPDATE SET {sets}\n"
        f"WHEN NOT MATCHED AND s.{_q(deleted_col)} = 'N'\n"
        f"  THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def delta_available(spark: SparkSession) -> bool:
    """True when the delta-spark bindings AND the Delta SQL extension
    are live in this session (both are required for MERGE INTO to
    parse and commit)."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    return "DeltaSparkSessionExtension" in ext


@dataclass
class DeltaMergeStats:
    """Attribution for one merge commit. Primary source: the metrics
    DataFrame Delta's SQL MERGE returns for its OWN commit (race-free
    by construction — unlike the reference's table-count deltas, which
    any concurrent writer skews). History-based fallback for older
    Delta pins to the first post-merge MERGE version, which a
    concurrent MERGE in the same window could still own — best
    effort, documented at the read site."""

    updated: int
    inserted: int

    @property
    def staged(self) -> int:
        return self.updated + self.inserted


class DeltaMergeSink:
    """``Sink`` implementation whose upsert path is a transactional
    Delta ``MERGE INTO``. ``write`` covers the protocol's append /
    overwrite modes; ``merge`` is the CDC path that replaces
    ParquetTargetStore's read → merge_soft_delete → rename-swap with
    one ACID commit.
    """

    def __init__(self, spark: SparkSession, root: str):
        if not delta_available(spark):
            raise RuntimeError(
                "delta-spark is not available in this session; use "
                "ParquetSink/ParquetTargetStore (see docstring) or start "
                "the session with the Delta extension + catalog confs"
            )
        self.spark = spark
        self.root = root.rstrip("/")

    def path(self, table: str) -> str:
        return f"{self.root}/{table}"

    def exists(self, table: str) -> bool:
        from delta.tables import DeltaTable

        return DeltaTable.isDeltaTable(self.spark, self.path(table))

    def read(self, table: str) -> DataFrame:
        return self.spark.read.format("delta").load(self.path(table))

    def write(self, df: DataFrame, table: str, mode: str = "append") -> None:
        df.write.format("delta").mode(mode).save(self.path(table))

    def merge(
        self,
        delta_df: DataFrame,
        table: str,
        pk: list[str],
        deleted_col: str = DELETED,
    ) -> DeltaMergeStats:
        """Soft-delete upsert of one resolved delta batch (one row per
        key) into ``table``; creates the table from the batch's
        insertable rows when absent (create-if-absent parity with
        ParquetTargetStore's first-run path)."""
        from pyspark.sql import functions as F

        if not self.exists(table):
            self.write(
                delta_df.where(F.col(deleted_col) == "N"), table, mode="overwrite"
            )
            n = self.read(table).count()
            return DeltaMergeStats(updated=0, inserted=n)

        pre = (
            self.spark.sql(f"DESCRIBE HISTORY delta.`{self.path(table)}` LIMIT 1")
            .select("version")
            .first()
        )
        pre_version = int(pre[0]) if pre is not None else -1
        view = f"_merge_src_{table}"
        delta_df.createOrReplaceTempView(view)
        try:
            sql = build_merge_into_sql(
                f"delta.`{self.path(table)}`",
                view,
                pk,
                delta_df.columns,
                deleted_col=deleted_col,
            )
            res = self.spark.sql(sql)
        finally:
            self.spark.catalog.dropTempView(view)
        # Attribution must be pinned to THIS merge's commit, not the
        # head of the log — under concurrent writers the latest history
        # entry can be someone else's commit. Delta's SQL MERGE returns
        # its own metrics as the command output (num_updated_rows /
        # num_inserted_rows), which is race-free; use it when present.
        if "num_updated_rows" in res.columns:
            row = res.first()
            return DeltaMergeStats(
                updated=int(row["num_updated_rows"] or 0),
                inserted=int(row["num_inserted_rows"] or 0),
            )
        # Fallback (older Delta): the FIRST MERGE commit after the
        # pre-merge version is ours unless a concurrent MERGE landed in
        # the same window — best effort, and strictly tighter than
        # head-of-log.
        hist = (
            self.spark.sql(f"DESCRIBE HISTORY delta.`{self.path(table)}`")
            .where(f"version > {pre_version} AND operation = 'MERGE'")
            .orderBy("version")
            .select("operationMetrics")
            .first()
        )
        metrics = (hist[0] if hist is not None else None) or {}
        return DeltaMergeStats(
            updated=int(metrics.get("numTargetRowsUpdated", 0)),
            inserted=int(metrics.get("numTargetRowsInserted", 0)),
        )
