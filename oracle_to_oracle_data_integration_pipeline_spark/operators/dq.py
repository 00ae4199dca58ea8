"""Data-quality operators: one-pass column profiling and rule checks.

The reference's only validation is a per-table row-count reconcile
(`/root/reference/scripts/03_cdc_etl.py:336-346`, exposed here as
`cli.py validate`); real pipelines also need column-level profiles
(null rates, cardinalities) and declarative constraint checks (PK
unique, value ranges) before trusting a replicated or curated table.

Scale design:
- ``profile_columns`` computes EVERY column's metrics in ONE
  aggregation pass over the data (no per-column jobs, no driver loop
  over rows — the driver only pivots the single result row into the
  long output). Exact ``count(DISTINCT)`` per column expands the plan
  (one shuffle per distinct column internally); at 100 TB swap
  ``exact_distinct=False`` for HLL ``approx_count_distinct`` — same
  single-pass shape, no expansion.
- ``check_rules`` folds every rule into one ``sum(CASE)`` aggregate:
  one scan, map-side combined, regardless of rule count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column profile: (column, n_nulls, n_distinct), one row per
    column, computed in a single aggregation pass. ``n_distinct``
    excludes NULLs (SQL ``count(DISTINCT col)`` semantics on both
    engines)."""
    cols = cols or df.columns
    distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = []
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__n_{c}"))
        aggs.append(distinct(c).alias(f"__d_{c}"))
    row = df.agg(*aggs)
    # pivot the single metrics row into long form: a driver-side loop
    # over COLUMN NAMES (metadata), never over data
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__n_{c}").alias("n_nulls"),
                F.col(f"__d_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return (
        row.select(F.explode(pairs).alias("p"))
        .select("p.column", "p.n_nulls", "p.n_distinct")
    )


def check_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Declarative constraint check: ``rules`` maps rule name to a
    VIOLATION predicate (true = row violates). Returns (rule,
    n_violations) with every rule evaluated in the same single
    aggregation pass."""
    aggs = [
        # coalesce: sum() over zero rows is NULL — an empty table has 0
        # violations, and a gate asserting n_violations == 0 must pass
        F.coalesce(F.sum(F.when(pred, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias(name)
        for name, pred in rules.items()
    ]
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(F.lit(name).alias("rule"), F.col(name).alias("n_violations"))
            for name in rules
        ]
    )
    return row.select(F.explode(pairs).alias("p")).select("p.rule", "p.n_violations")


def k_anonymity(df: DataFrame, quasi_cols: list[str], k: int) -> DataFrame:
    """Privacy gate: a released dataset is k-anonymous when every
    combination of quasi-identifier values is shared by at least ``k``
    rows. Returns the VIOLATING equivalence classes — quasi-identifier
    tuples with fewer than ``k`` rows, each a re-identification risk —
    so an empty result is the pass and the rows name exactly what to
    suppress or generalize.

    Scale: one map-combinable count shuffle keyed by the
    quasi-identifier tuple (identical cost profile to
    ``check_unique``); the output is bounded by the number of rare
    classes, never the corpus.

    Output: quasi_cols + (n_rows BIGINT), n_rows in [1, k).
    """
    if k < 2:
        raise ValueError("k must be >= 2 (k=1 is vacuous)")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .filter(F.col("n_rows") < k)
    )


def check_unique(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Uniqueness check for a (composite) key: returns the duplicated
    key values with their multiplicities — one hash aggregation on the
    key, the same shuffle a dedup would pay."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )
