"""Incremental aggregate maintenance: refresh a stored group-by
rollup from an append-only delta without rescanning the base table
(the hypertable/continuous-aggregate pattern).

The reference reruns full queries on a cron cadence; Structured
Streaming covers the push model (streaming_queries); this operator is
the batch pull model: ``agg(base ∪ delta) == merge(agg(base),
agg(delta))`` for ADDITIVE measures. At 100 TB the stored rollup is
orders of magnitude smaller than the base, so a refresh costs
one aggregation of the (small) delta plus one merge shuffle keyed by
the group key — the base is never read again.

Scope: additive measures only (sum, count — avg derives as sum/count
at read time). Min/max are NOT mergeable under updates/deletes
(retraction needs the full history); refusing them here is what keeps
the refresh O(|delta|). Soft-deleted rows must be filtered (or sign-
flipped into retractions) by the caller before refresh.

Invariant (tests/test_rollup.py): incremental refresh over any batch
split equals the full rebuild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_build(df: DataFrame, keys: list[str], sums: list[str]) -> DataFrame:
    """Initial rollup state: per-key additive sums + row count.
    Sums are kept in DECIMAL(38,6) — exact and associative, so any
    merge tree (and any executor count) produces identical bits."""
    aggs = [
        F.sum(F.col(c).cast("decimal(38,6)")).alias(f"sum_{c}") for c in sums
    ] + [F.count(F.lit(1)).alias("n_rows")]
    return df.groupBy(*keys).agg(*aggs)


def rollup_refresh(state: DataFrame, delta: DataFrame, keys: list[str], sums: list[str]) -> DataFrame:
    """Merge the delta's partial rollup into the stored state: one
    aggregation of the delta + one key-keyed merge. New keys appear,
    existing keys accumulate; the base table is never touched."""
    d = rollup_build(delta, keys, sums)
    merged = state.unionByName(d)
    aggs = [
        F.sum(F.col(f"sum_{c}")).alias(f"sum_{c}") for c in sums
    ] + [F.sum(F.col("n_rows")).cast("bigint").alias("n_rows")]
    return merged.groupBy(*keys).agg(*aggs)
