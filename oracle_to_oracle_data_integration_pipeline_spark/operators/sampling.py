"""Deterministic sampling / split assignment for dataset curation.

A training-data pipeline needs reproducible subsetting: train/val/test
splits that never move when the pipeline reruns, and per-stratum
(language, source, domain) quotas for balanced corpora. Both are
expressed as pure column algebra over a content-stable hash — no
``rand()`` (not replayable), no driver-side sampling state.

Reference scope note: the reference (a CDC replicator) has no sampling
surface; this is part of the LLM-data extension (SURVEY.md §2.12).

Scale design:
- ``hash_bucket_col`` is an expression — evaluated inside whole-stage
  codegen at scan time, prunable, pushdown-friendly. Filtering a split
  is `WHERE bucket < 90`: no shuffle at all.
- ``stratified_topk`` is one window over ``partitionBy(stratum)`` —
  a single shuffle keyed by the stratum; with thousands of strata the
  key is well-spread. For k ≪ stratum size at extreme scale, swap the
  full sort for a per-partition heap (``groupBy + min_by(k)``-style
  agg); the window form is exact and is the right default.

md5 (not xxhash64) is used for the hash: it is bit-identical across
engines (Spark, DuckDB, Python, SQL engines generally), which keeps
split assignment portable — a row's split survives an engine change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket_col(key: Column, buckets: int = 100) -> Column:
    """Deterministic, engine-portable bucket in [0, buckets): first 16
    bits of md5 of the key's string form, mod buckets. DuckDB twin:
    ``CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 4)) AS INTEGER)
    % buckets``.
    """
    h16 = F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("long")
    return (h16 % buckets).cast("int")


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
    out_col: str = "split",
) -> DataFrame:
    """Assign train/val/test by hash bucket of the id: stable under
    reruns, re-partitioning, and engine changes; remaining percent is
    test."""
    b = hash_bucket_col(F.col(id_col), 100)
    split = (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(out_col, split)


def stratified_topk(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rows ranked within
    each stratum by (md5(id), id) — a stable pseudo-random order — and
    the first k kept. Unlike ``sampleBy`` this is exact (no binomial
    variance) and replayable."""
    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    w = Window.partitionBy(strata_col).orderBy(*order)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    key_round: int = 12,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k items, inclusion
    probability proportional to weight — the Efraimidis–Spirakis
    exponential-sort scheme as pure column algebra: each row draws
    e = −ln(u)/w (an Exp(w) variate from a deterministic md5 uniform),
    and the k SMALLEST exponentials are the sample. One global top-k
    (TakeOrderedAndProject — per-partition heaps, k rows per partition
    cross the wire, never a global sort), replayable across reruns and
    engines because u comes from md5, not rand().

    Determinism across engines: ln() is libm-dependent at the last
    ulp, so the key is rounded half-up at ``key_round`` decimals (the
    floor idiom) BEFORE ranking and ties break on the id — both
    engines then rank identical (key, id) tuples. The uniform is
    (h52 + 0.5)/16^13: strictly inside (0,1), so ln never sees 0.

    Weights must be > 0; rows with NULL or non-positive weight are
    excluded (they have no defined inclusion probability).
    SQL twin per row:
    ``floor(-ln((h52 + 0.5)/16^13) / w * 1e12 + 0.5) / 1e12``.
    """
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import md5_h52

    w = F.col(weight_col).cast("double")
    u = (md5_h52(F.col(id_col)) + F.lit(0.5)) / F.lit(float(16**13))
    scale = float(10**key_round)
    key = F.floor(-F.log(u) / w * scale + F.lit(0.5)) / scale
    return (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("sample_key", key)
        .orderBy(F.col("sample_key").asc(), F.col(id_col).asc())
        .limit(k)
    )
