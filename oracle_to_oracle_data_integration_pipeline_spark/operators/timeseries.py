"""Time-series operators over event streams: resample to a fixed grid,
gap-fill (LOCF / linear interpolation) — the hypertable-rollup
companion surface (continuous aggregates live in operators/rollup.py).

Reference scope note: the reference (a CDC replication pipeline) has no
time-series surface; this extends the engine for the events table the
same way the LLM-data operators extend it for documents (SURVEY.md
§2.12).

100 TB design:
- ``resample`` is the only full-data shuffle (groupBy key+bucket with
  map-side combine) — everything after it runs on the reduced series.
- The fill pass adds exactly one more hash exchange, keyed by the key
  alone, and the bounds aggregate, grid ``sequence``+explode synthesis,
  grid↔series join, and LOCF window ALL ride that one partitioning
  (verified by tests/test_plans.py: 2 hash exchanges total; the join
  side broadcasts at small scale via AQE).
- Grid explosion is the operator's real scale hazard: a key spanning a
  year at 1-second steps synthesizes 31M rows. ``max_buckets_per_key``
  guards it — keys whose span/step exceeds the cap are dropped (with a
  count available via the ``gap_fill_guard`` helper) rather than
  silently OOMing an executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}


def _step_seconds(step: str) -> int:
    """'2 hours' → 7200. Calendar steps only (no months/years — those
    are not fixed-width and need date arithmetic, not a grid)."""
    n, unit = step.split(" ", 1)
    return int(n) * _UNIT_SECONDS[unit.rstrip("s")]


def resample(
    df: DataFrame,
    step: str = "1 hour",
    key: str = "user_id",
    ts: str = "ts",
    agg: Column | None = None,
    agg_name: str = "v",
) -> DataFrame:
    """Aggregate events onto a fixed (key, bucket) grid. Buckets are
    epoch-aligned (floor(epoch/step)·step — DuckDB ``time_bucket``
    semantics), so any step width works, not just 1-unit calendar
    truncations. One shuffle, partial-agg combined map-side."""
    sec = _step_seconds(step)
    bucket = F.timestamp_seconds(
        (F.floor(F.unix_timestamp(F.col(ts)) / sec) * sec).cast("long")
    )
    agg = agg if agg is not None else F.count(F.lit(1)).cast("long")
    return df.groupBy(F.col(key), bucket.alias("bucket")).agg(agg.alias(agg_name))


def gap_fill_locf(
    sampled: DataFrame,
    step: str = "1 hour",
    key: str = "user_id",
    value: str = "v",
    max_buckets_per_key: int | None = 100_000,
) -> DataFrame:
    """Densify a resampled series to every step between each key's
    first and last bucket, forward-filling missing values (LOCF — last
    observation carried forward, the TimescaleDB ``locf()`` /
    InfluxDB ``fill(previous)`` semantics).

    Output: key, bucket, <value> (filled), is_gap (1 for synthesized
    rows). The leading row per key is never a gap (grid starts at the
    key's own min bucket), so LOCF never emits nulls.
    """
    bounds = sampled.groupBy(key).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    if max_buckets_per_key is not None:
        n_buckets = (
            F.unix_timestamp("__hi") - F.unix_timestamp("__lo")
        ) / F.lit(_step_seconds(step))
        bounds = bounds.filter(n_buckets <= F.lit(max_buckets_per_key))
    grid = bounds.select(
        key,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {step}"))
        ).alias("bucket"),
    )
    joined = grid.join(sampled, [key, "bucket"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key,
        "bucket",
        F.last(value, ignorenulls=True).over(w).alias(value),
        F.when(F.col(value).isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
    )


def gap_fill_interp(
    sampled: DataFrame,
    step: str = "1 hour",
    key: str = "user_id",
    value: str = "v",
    max_buckets_per_key: int | None = 100_000,
) -> DataFrame:
    """Linear interpolation across gaps (TimescaleDB ``interpolate()``):
    synthesized buckets get prev + (next - prev) · frac, where frac is
    the bucket's position inside its gap. Trailing rows after the last
    observation keep LOCF (no next anchor). Same single-exchange shape
    as LOCF — the extra window functions ride the same sort.
    ``max_buckets_per_key`` guards grid explosion exactly as in
    ``gap_fill_locf``."""
    bounds = sampled.groupBy(key).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    if max_buckets_per_key is not None:
        n_buckets = (
            F.unix_timestamp("__hi") - F.unix_timestamp("__lo")
        ) / F.lit(_step_seconds(step))
        bounds = bounds.filter(n_buckets <= F.lit(max_buckets_per_key))
    grid = bounds.select(
        key,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {step}"))
        ).alias("bucket"),
    )
    joined = grid.join(sampled, [key, "bucket"], "left")
    back = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last(value, ignorenulls=True).over(back)
    next_v = F.first(value, ignorenulls=True).over(fwd)
    prev_t = F.last(F.when(F.col(value).isNotNull(), F.col("bucket")), ignorenulls=True).over(back)
    next_t = F.first(F.when(F.col(value).isNotNull(), F.col("bucket")), ignorenulls=True).over(fwd)
    span = F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
    frac = (F.unix_timestamp("bucket") - F.unix_timestamp(prev_t)) / span
    interp = F.when(F.col(value).isNotNull(), F.col(value)).otherwise(
        F.when(next_v.isNull(), prev_v).otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return joined.select(
        key,
        "bucket",
        interp.alias(value),
        F.when(F.col(value).isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
    )


def time_weighted_avg(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    value: str = "value",
    seq: str | None = None,
) -> DataFrame:
    """Per-key time-weighted average: Σ vᵢ·Δtᵢ / ΣΔtᵢ where Δtᵢ is the
    gap to the next observation (the last point carries no duration) —
    the irregular-sampling-correct mean (TimescaleDB ``time_weight``
    shape). One key-partitioned window (the lead) and the aggregation
    rides the same partitioning; Δt is exact integer seconds, the v·Δt
    terms go through the portable-round + exact-decimal-sum path so the
    result is partial-agg-order independent.

    ``seq``: a NEVER-NULL unique column that breaks timestamp ties
    deterministically. Without it the window tie-breaks on ``value`` —
    nullable, and Spark's ASC NULLS FIRST vs DuckDB's NULLS LAST makes
    every null-valued tie a cross-engine coin flip (eventstorm fuzz
    find, round 8). Pass the event/row id whenever the source can
    carry duplicate timestamps per key.
    """
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import (
        dsum,
        pround,
    )

    tie = F.col(seq) if seq else F.col(value)
    w = Window.partitionBy(key).orderBy(F.col(ts), tie)
    sec = F.unix_timestamp(F.col(ts))
    dt = (F.lead(sec).over(w) - sec).alias("dt")
    terms = (
        df.select(F.col(key), F.col(value).cast("double").alias("v"), dt)
        .where(F.col("dt").isNotNull())
    )
    return terms.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dt").alias("total_seconds"),
        pround(
            dsum(pround(F.col("v") * F.col("dt"), 6), 6)
            / F.sum("dt").cast("double"),
            6,
        ).alias("twa"),
    )


def counter_agg(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    value: str = "value",
    seq: str | None = None,
) -> DataFrame:
    """Monotonic-counter delta aggregation with reset detection
    (Prometheus ``increase`` / TimescaleDB ``counter_agg`` shape): a
    negative step means the counter restarted, contributing the new
    reading instead of the (negative) delta. One key-partitioned lag
    window; the reduction rides the same exchange. ``seq``: never-null
    unique tie-break for duplicate timestamps (see time_weighted_avg).
    """
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import (
        dsum,
        pround,
    )

    tie = F.col(seq) if seq else F.col(value)
    w = Window.partitionBy(key).orderBy(F.col(ts), tie)
    v = F.col(value).cast("double")
    delta = (v - F.lag(v).over(w)).alias("delta")
    steps = df.select(F.col(key), v.alias("v"), delta).where(
        F.col("delta").isNotNull()
    )
    contrib = F.when(F.col("delta") >= 0, F.col("delta")).otherwise(F.col("v"))
    return steps.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_steps"),
        F.sum(F.when(F.col("delta") < 0, 1).otherwise(0)).alias("n_resets"),
        dsum(pround(contrib, 6), 6).alias("total_increase"),
    )


def state_durations(
    df: DataFrame,
    key: str,
    state: str,
    ts: str = "ts",
    seq: str | None = None,
) -> DataFrame:
    """Total seconds spent in each state across all keys: each event
    opens an interval in its state that the key's next event closes
    (the final open interval is excluded). The per-key lead window and
    the (state) rollup are the only exchanges; durations are exact
    integer seconds so no rounding discipline is needed. ``seq``:
    never-null unique tie-break for duplicate timestamps (see
    time_weighted_avg).
    """
    tie = F.col(seq) if seq else F.col(state)
    w = Window.partitionBy(key).orderBy(F.col(ts), tie)
    sec = F.unix_timestamp(F.col(ts))
    iv = df.select(
        F.col(state).alias("state"),
        (F.lead(sec).over(w) - sec).alias("dur"),
    ).where(F.col("dur").isNotNull())
    return iv.groupBy("state").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dur").alias("total_seconds"),
    )


def minmax_downsample(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    value: str = "value",
    id_col: str = "event_id",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Per (key, time-bucket) min/max witness points — the
    plot-preserving downsample (keep the extremes, drop the middle).
    A single groupBy with ``min_by``/``max_by`` on a (value, id)
    struct: one map-side-combinable shuffle, deterministic under value
    ties via the id tiebreak, no window sort over the full series.

    NULL measurements are excluded explicitly: they are not plottable
    witness points, and Spark's struct ordering ranks a NULL field
    SMALLEST, so an unfiltered NULL row would win ``min_by`` and
    report a witness id whose value is not the reported min (fuzz
    find, tools/fuzz_parity.py nulls profile).
    """
    sec = F.unix_timestamp(F.col(ts))
    bucket = (sec - (sec % F.lit(bucket_seconds))).alias("bucket_start")
    v = F.col(value).cast("double")
    return (
        df.filter(F.col(value).isNotNull())
        .select(F.col(key), bucket, v.alias("v"), F.col(id_col).alias("pid"))
        .groupBy(key, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("v").alias("min_value"),
            F.max("v").alias("max_value"),
            F.expr("min_by(pid, struct(v, pid))").alias("min_point_id"),
            F.expr("max_by(pid, struct(v, pid))").alias("max_point_id"),
        )
    )


def ewma(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    alpha: float = 0.2,
    tiebreak: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-key exponentially weighted moving average — the recursive
    smoother (s₀ = x₀; sₜ = α·xₜ + (1−α)·sₜ₋₁) no window frame can
    express: every prefix weight changes with t, so this is the
    canonical custom STATEFUL kernel. Runs as ``mapInPandas`` over
    key-partitioned data with pandas' GROUPED ewm kernel: one hash
    shuffle on the key, then ONE Python kernel invocation per
    PARTITION — not per key. (The earlier ``applyInPandas`` form paid
    a per-group pandas-frame + kernel-call overhead; at billions of
    keys that per-key Python cost dominates, while the grouped-ewm C
    kernel amortizes it to ~nothing.) Returns one row per key:
    (key, n_points, ewma).

    Cross-engine exactness: the recursion is a fixed sequence of IEEE
    double ops (α·x + (1−α)·s, in that operand order), so any engine
    replaying the same ordered series produces bit-identical doubles —
    DuckDB's ``list_reduce(list(v ORDER BY ts), (acc, x) -> α*x +
    (1-α)*acc)`` is the oracle twin, no rounding tolerance needed.
    pandas' grouped ``ewm(adjust=False)`` runs the same recursion in C
    per group: y = ((1-a)·y + a·x) / ((1-a) + a) — the divisor is
    exactly 1.0 and IEEE addition is commutative, so it's
    bit-identical to the explicit fold (pinned by
    tests/test_reconcile.py::test_ewma_matches_pandas_ewm, abs=0.0).

    Determinism: the kernel concatenates every Arrow chunk of its
    partition and sorts by (key, ts, tiebreak) itself — it never
    relies on shuffle arrival order or on chunk boundaries (a key's
    rows may span chunks; repartition guarantees they share a
    partition).

    At 100 TB: state is one double per key; memory is O(partition)
    inside the kernel (the pd.concat materializes the whole shuffle
    partition, like any sort-based operator). ``num_partitions``
    overrides spark.sql.shuffle.partitions for exactly this reason:
    size it so rows_per_partition × row_width fits executor memory —
    with skewed key frequencies, raise it until the hottest partition
    fits (the kernel is per-partition, so more partitions = smaller
    pandas frames at the cost of smaller C-kernel batches). For
    unbounded series,
    feed pre-resampled buckets (``resample``) or the Structured
    Streaming twin (applyInPandasWithState keeps s across
    micro-batches instead of re-reading history).
    """
    import pandas as pd

    order_cols = [ts] + ([tiebreak] if tiebreak else [])
    a = float(alpha)

    def kernel(it):
        chunks = [c for c in it if len(c)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values([key, *order_cols], kind="mergesort")
        # dropna=False: a NULL key forms its own group exactly as
        # Spark's groupBy and the SQL oracle's GROUP BY treat it —
        # pandas' default would silently drop those rows
        g = pdf.groupby(key, sort=False, dropna=False)
        sizes = g[value].size()  # group-appearance (= key-sorted) order
        # grouped ewm preserves row order within each group block, so
        # each group's final smoothed value sits at its block's last
        # position — positional take, no NaN-skipping .last() semantics
        ew = g[value].ewm(alpha=a, adjust=False).mean().to_numpy()
        ends = sizes.to_numpy().cumsum() - 1
        yield pd.DataFrame(
            {
                key: sizes.index.to_numpy(),
                "n_points": sizes.to_numpy(),
                "ewma": ew[ends],
            }
        )

    base = df.where(F.col(value).isNotNull()).select(key, *order_cols, value)
    # key type follows the input (a string- or int-keyed series must
    # not be forced through a bigint schema)
    key_type = df.schema[key].dataType.simpleString()
    out_schema = f"{key} {key_type}, n_points long, ewma double"
    part = (
        base.repartition(num_partitions, F.col(key))
        if num_partitions
        else base.repartition(F.col(key))
    )
    return part.mapInPandas(kernel, schema=out_schema)
