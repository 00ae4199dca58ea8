"""Scale techniques as first-class operators: key salting for skew
joins, bucketed co-located joins.

These address the two shuffle pathologies a 100 TB deployment hits
(SURVEY.md §4 / pyspark guide "Partitioning & shuffle"):

- **Skew**: one hot key makes one reducer process most of the data.
  AQE's skew-join splitting handles *sort-merge* skew at runtime;
  salting is the explicit fallback for aggregations and for joins AQE
  can't split (e.g. when the skewed side must broadcast-expand).
- **Repeated shuffles on a stable key**: fact tables joined on the
  same key every run should be bucketed once at write time; a join of
  two tables bucketed on the key with the same bucket count needs NO
  exchange at read time — at 100 TB this converts the dominant
  shuffle into a free co-located merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-proof equi-join: the skewed side gets a random-ish salt
    derived from a stable row hash (deterministic, unlike rand() —
    replays identically); the small side is exploded ×salt_buckets so
    every (key, salt) pair finds its match.

    Shuffle keys become (key, salt): the hot key's rows spread over
    ``salt_buckets`` reducers. The small side grows by the factor —
    use only when `small` is genuinely small (it usually also
    broadcasts, making the salt moot; this operator is for the
    mid-size case where broadcast is too big but skew still bites).

    ``salt_cols`` names the columns hashed for the salt. Default is ALL
    of ``skewed``'s columns — always deterministic, but it blocks scan
    column pruning (every column becomes referenced): on a wide fact
    table pass the few columns that vary within a key so the scan stays
    pruned to what the query needs.
    """
    if how in ("right", "rightouter", "right_outer", "full", "fullouter", "full_outer", "outer"):
        # exploding the small side x salt_buckets would emit each
        # unmatched right row salt_buckets times under these join types
        raise ValueError(f"salted_join does not support how={how!r}; use inner/left/semi/anti")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in (salt_cols or skewed.columns)]), F.lit(salt_buckets)
    )
    left = skewed.withColumn("__salt__", salt.cast("int"))
    right = small.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = left.join(right, [key, "__salt__"], how)
    return out.drop("__salt__")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: list[str],
    num_buckets: int = 8,
    sort_by: list[str] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by the join
    key. Requires a session with a warehouse dir + Hive-less catalog
    (default local works). Reading it back joins co-located."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name)


def bucketed_join_ready(spark: SparkSession, a: str, b: str) -> DataFrame:
    """Read two bucketed tables for a co-located join (no exchange on
    either side when bucket specs match)."""
    return spark.table(a), spark.table(b)  # type: ignore[return-value]


def cluster_by_range(df: DataFrame, cols: list[str], num_files: int = 8) -> DataFrame:
    """Range-cluster rows so each output file's parquet footer carries
    a NARROW, mostly-disjoint min/max range on ``cols`` — the data
    layout that makes selective filters skip whole row groups/files at
    scan time (the open-table-format "OPTIMIZE ZORDER/cluster by"
    effect, for the single-dimension case, with nothing but Spark
    built-ins).

    One range exchange (Spark samples the columns to build balanced
    range bounds) + an in-partition sort; write the result with
    ``.write.parquet``. At 100 TB this is the difference between a
    timestamp-predicate scan touching every file and touching the few
    files whose range overlaps — row groups elsewhere are skipped from
    footer stats alone, before any column data is read. For multi-
    column locality use an interleaved key or a space-filling curve;
    range clustering on the dominant filter column is the 80% win.
    """
    return df.repartitionByRange(num_files, *[F.col(c) for c in cols]).sortWithinPartitions(
        *cols
    )
