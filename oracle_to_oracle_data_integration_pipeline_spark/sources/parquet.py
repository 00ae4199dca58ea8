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

    def write_sized(
        self,
        df: DataFrame,
        table: str,
        mode: str = "append",
        target_files: int | None = None,
        max_records_per_file: int | None = None,
        partition_by: list[str] | None = None,
        sort_within_by: list[str] | None = None,
    ) -> None:
        """Size-aware write — the knobs that keep a 100 TB table from
        degenerating into millions of tiny files (every incremental
        run appending shuffle-partition-count files) or a few
        unsplittable giants:

        - ``target_files``: explicit output file count via repartition
          (hash on the partition columns so each directory gets whole
          files, round-robin otherwise);
        - ``max_records_per_file``: row cap per file, Spark splits
          oversized tasks at write time;
        - ``partition_by``: hive-style directory partitioning (enables
          partition pruning on read — see `partitioned_scan` qid);
        - ``sort_within_by``: per-file ordering so parquet min/max
          row-group stats become selective for range predicates.
        """
        out = df
        if target_files:
            out = (
                out.repartition(target_files, *[out[c] for c in partition_by])
                if partition_by
                else out.repartition(target_files)
            )
        if sort_within_by:
            out = out.sortWithinPartitions(*sort_within_by)
        writer = out.write.mode(mode)
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(os.path.join(self.root, table))

    def compact(
        self,
        spark: SparkSession,
        table: str,
        target_files: int,
        sort_within_by: list[str] | None = None,
        cluster_by: list[str] | None = None,
    ) -> int:
        """Rewrite a table directory to ``target_files`` right-sized
        files (the maintenance job every append-heavy pipeline needs).

        Writes to a sibling temp dir, then swaps via two renames under
        the table's write lock (sources/locking.py). Single-WRITER is
        enforced — a concurrent append between the renames would land in
        the old directory and be rmtree'd. Readers are not locked: one
        landing between the renames can see a briefly missing directory
        (ENOENT — retry); a truly atomic dir swap needs
        renameat2(RENAME_EXCHANGE) or manifest indirection (what a table
        format's metadata commit provides). Returns the file count
        before compaction.
        """
        from oracle_to_oracle_data_integration_pipeline_spark.sources.locking import (
            table_write_lock,
        )

        path = os.path.join(self.root, table)
        part_dirs = [
            d for d in os.listdir(path)
            if "=" in d and os.path.isdir(os.path.join(path, d))
        ]
        if part_dirs:
            # a flat rewrite would silently DROP the hive partitioning
            # (and with it partition pruning on every future read)
            raise ValueError(
                f"{table} is hive-partitioned ({part_dirs[0]}, ...); "
                "compact per partition or rewrite with "
                "write_sized(partition_by=...) instead"
            )
        before = [
            f for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        tmp = path + "__compact_tmp"
        with table_write_lock(path):
            # read INSIDE the lock: a merge swapping the directory after
            # this file listing would leave the compact writing from a
            # stale (rmtree'd) file index
            df = spark.read.parquet(path)
            if cluster_by:
                # recluster while rewriting: footer min/max ranges come
                # out narrow/disjoint so future selective scans prune
                # row groups (operators/scale.py cluster_by_range)
                from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import (
                    cluster_by_range,
                )

                df = cluster_by_range(df, cluster_by, num_files=target_files)
            else:
                df = df.repartition(target_files)
            if sort_within_by:
                # keep the cluster columns as the sort prefix: a bare
                # sortWithinPartitions(sort_within_by) would REPLACE the
                # range-cluster's in-partition order and widen the
                # per-row-group min/max stats the clustering exists to
                # narrow — secondary keys sort within each cluster key
                df = df.sortWithinPartitions(*(cluster_by or []), *sort_within_by)
            df.write.mode("overwrite").parquet(tmp)
            old = path + "__compact_old"
            os.rename(path, old)
            try:
                os.rename(tmp, path)
            except Exception:
                os.rename(old, path)  # roll back: the original stays live
                raise
            import shutil

            shutil.rmtree(old)
        return len(before)
