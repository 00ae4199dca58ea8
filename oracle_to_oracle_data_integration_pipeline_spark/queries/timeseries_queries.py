"""Time-series + sketch qids (SURVEY.md §2.12): resample/gap-fill over
the events table (operators/timeseries.py) and accuracy-gated sketch
aggregates (HLL distinct, quantile sketch).

Sketch verification pattern: a sketch's output is engine-specific, so
the qid emits the EXACT value plus a boolean asserting the sketch
landed within its guaranteed error bound — computed entirely Spark-side
— and the oracle recomputes the exact value with a literal-true flag.
A sketch drifting out of bounds flips the flag and fails the hash
compare; the exact columns keep the comparison meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.timeseries import (
    gap_fill_interp,
    gap_fill_locf,
    resample,
)
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import dsum, load, pround


# -- qid: gap_fill (resample + LOCF densify) --------------------------

def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user activity densified to a full grid with LOCF —
    the TimescaleDB locf()/InfluxDB fill(previous) shape (operator
    docstrings in operators/timeseries.py for the 100 TB layout)."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    hourly = resample(e, "1 hour", agg=dsum(F.col("value")))
    # guard disabled: the DuckDB twin builds the grid unconditionally,
    # and a silently-dropped key would read as an operator bug in the
    # differential compare (the guard is exercised by unit tests)
    return gap_fill_locf(hourly, "1 hour", max_buckets_per_key=None)


SQL_GAP_FILL = """
WITH hourly AS (
  SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket,
         CAST(round(sum(CAST(value AS DECIMAL(24,6))), 2) AS DOUBLE) AS v0
  FROM events WHERE user_id < 20 GROUP BY 1, 2
),
bounds AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
  FROM bounds
),
j AS (
  SELECT g.user_id, g.bucket, h.v0
  FROM grid g LEFT JOIN hourly h ON h.user_id = g.user_id AND h.bucket = g.bucket
)
SELECT user_id, bucket,
       last_value(v0 IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
       CASE WHEN v0 IS NULL THEN 1 ELSE 0 END AS is_gap
FROM j
"""


# -- qid: gap_fill_interp (linear interpolation across gaps) ----------

def q_gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation variant (TimescaleDB interpolate()):
    synthesized buckets get prev + (next-prev)·frac; trailing rows fall
    back to LOCF. Rounded via the portable floor formula on both sides
    so float tie behavior can't flip the hash."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    hourly = resample(e, "1 hour", agg=dsum(F.col("value")))
    filled = gap_fill_interp(hourly, "1 hour", max_buckets_per_key=None)
    return filled.select(
        "user_id", "bucket", pround(F.col("v")).alias("v"), "is_gap"
    )


SQL_GAP_FILL_INTERP = """
WITH hourly AS (
  SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket,
         CAST(round(sum(CAST(value AS DECIMAL(24,6))), 2) AS DOUBLE) AS v0
  FROM events WHERE user_id < 20 GROUP BY 1, 2
),
bounds AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
  FROM bounds
),
j AS (
  SELECT g.user_id, g.bucket, h.v0
  FROM grid g LEFT JOIN hourly h ON h.user_id = g.user_id AND h.bucket = g.bucket
),
anch AS (
  SELECT user_id, bucket, v0,
         last_value(v0 IGNORE NULLS) OVER w_back AS prev_v,
         first_value(v0 IGNORE NULLS) OVER w_fwd AS next_v,
         last_value(CASE WHEN v0 IS NOT NULL THEN bucket END IGNORE NULLS) OVER w_back AS prev_t,
         first_value(CASE WHEN v0 IS NOT NULL THEN bucket END IGNORE NULLS) OVER w_fwd AS next_t
  FROM j
  WINDOW
    w_back AS (PARTITION BY user_id ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_fwd  AS (PARTITION BY user_id ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, bucket,
       floor((CASE WHEN v0 IS NOT NULL THEN v0
                   WHEN next_v IS NULL THEN prev_v
                   ELSE prev_v + (next_v - prev_v)
                        * (CAST(epoch(bucket) - epoch(prev_t) AS DOUBLE)
                           / CAST(epoch(next_t) - epoch(prev_t) AS DOUBLE))
              END) * 1e6 + 0.5) / 1e6 AS v,
       CASE WHEN v0 IS NULL THEN 1 ELSE 0 END AS is_gap
FROM anch
"""


# -- qid: ts_zscore (rolling anomaly detection) -----------------------

def q_ts_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score outlier flags over the densified hourly series:
    each bucket scored against the trailing 12-hour window (excluding
    itself) using decimal-exact power sums — the stats_moments pattern
    inside a window frame, so any partial-agg tree at 100 TB produces
    identical bits. Windows with <6 trailing points emit no score.
    The frame rides the same per-key exchange the gap-fill already
    created: no additional shuffle."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    hourly = resample(e, "1 hour", agg=dsum(F.col("value")))
    filled = gap_fill_locf(hourly, "1 hour", max_buckets_per_key=None)
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(-12, -1)
    )
    dec = F.col("v").cast("decimal(24,6)")
    n = F.count(F.lit(1)).over(w).cast("double")
    sx = F.sum(dec).over(w).cast("double")
    sxx = F.sum((dec * dec).cast("decimal(30,6)")).over(w).cast("double")
    var = F.greatest((sxx - sx * sx / n) / n, F.lit(0.0))
    z = (F.col("v") - sx / n) / F.sqrt(var)
    z_ok = F.when((n >= 6) & (var > 0), pround(z)).otherwise(F.lit(None))
    return filled.select(
        "user_id",
        "bucket",
        "v",
        z_ok.alias("z"),
        F.when(F.abs(z_ok) > 2.0, 1).otherwise(0).alias("is_outlier"),
    )


SQL_TS_ZSCORE = """
WITH hourly AS (
  SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket,
         CAST(round(sum(CAST(value AS DECIMAL(24,6))), 2) AS DOUBLE) AS v0
  FROM events WHERE user_id < 20 GROUP BY 1, 2
),
bounds AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
  FROM bounds
),
filled AS (
  SELECT g.user_id, g.bucket,
         last_value(h.v0 IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
  FROM grid g LEFT JOIN hourly h ON h.user_id = g.user_id AND h.bucket = g.bucket
),
stats AS (
  SELECT user_id, bucket, v,
         CAST(count(*) OVER w AS DOUBLE) AS n,
         CAST(sum(CAST(v AS DECIMAL(24,6))) OVER w AS DOUBLE) AS sx,
         CAST(sum(CAST(CAST(v AS DECIMAL(24,6)) * CAST(v AS DECIMAL(24,6)) AS DECIMAL(30,6))) OVER w AS DOUBLE) AS sxx
  FROM filled
  WINDOW w AS (PARTITION BY user_id ORDER BY bucket ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, bucket, v,
       CASE WHEN n >= 6 AND greatest((sxx - sx * sx / n) / n, 0.0) > 0
            THEN floor((v - sx / n) / sqrt(greatest((sxx - sx * sx / n) / n, 0.0)) * 1e6 + 0.5) / 1e6
       END AS z,
       CASE WHEN n >= 6 AND greatest((sxx - sx * sx / n) / n, 0.0) > 0
                 AND abs(floor((v - sx / n) / sqrt(greatest((sxx - sx * sx / n) / n, 0.0)) * 1e6 + 0.5) / 1e6) > 2.0
            THEN 1 ELSE 0 END AS is_outlier
FROM stats
"""


# -- qid: hll_distinct (HLL sketch, accuracy-gated) -------------------

def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) vs exact per event_type.
    At 100 TB the HLL path is the only sane one — fixed ~kilobytes of
    state per group, mergeable across partials, vs a full shuffle of
    distinct keys for the exact count. rsd=0.02 → flag checks ±5%."""
    e = load(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_hll"),
    )
    ok = (
        F.abs(F.col("n_hll") - F.col("n_exact"))
        <= F.col("n_exact") * F.lit(0.05)
    )
    return per.select("event_type", "n_exact", ok.cast("int").alias("hll_within_5pct"))


SQL_HLL_DISTINCT = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       CAST(1 AS INT) AS hll_within_5pct
FROM events GROUP BY event_type
"""


# -- qid: approx_quantiles (quantile sketch, accuracy-gated) ----------

def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna sketch) vs exact per
    event_type. accuracy=10000 guarantees rank error ≤ 1e-4; the flag
    checks the sketch value lies inside the exact [p-0.01, p+0.01]
    rank envelope — a guaranteed-true bound that still catches a broken
    sketch. Exact values are the hash-compared payload.

    The envelope claim needs the ±0.01 rank band to span at least one
    data element: the sketch returns an ELEMENT while percentile()
    interpolates, so for a group of n non-null values the band is only
    guaranteed to contain the element once 0.01·n ≥ ~1 (fuzz find,
    tools/fuzz_parity.py nulls profile: a ~30-row NULL-type group put
    the interpolated lower bound above the returned element). Small
    groups assert trivially true — stated, not hidden: the envelope is
    a LARGE-group sketch guarantee."""
    e = load(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.expr(
            "percentile(value, array(0.49, 0.5, 0.51, 0.94, 0.95, 0.96))"
        ).alias("ex"),
        F.expr("percentile_approx(value, array(0.5, 0.95), 10000)").alias("ap"),
        F.count("value").alias("nv"),
    )
    in_env = (
        (F.col("ap")[0] >= F.col("ex")[0]) & (F.col("ap")[0] <= F.col("ex")[2])
        & (F.col("ap")[1] >= F.col("ex")[3]) & (F.col("ap")[1] <= F.col("ex")[5])
    ) | (F.col("nv") < 1000)
    return per.select(
        "event_type",
        pround(F.col("ex")[1]).alias("p50"),
        pround(F.col("ex")[4]).alias("p95"),
        in_env.cast("int").alias("sketch_in_envelope"),
    )


SQL_APPROX_QUANTILES = """
SELECT event_type,
       floor(quantile_cont(value, 0.5) * 1e6 + 0.5) / 1e6 AS p50,
       floor(quantile_cont(value, 0.95) * 1e6 + 0.5) / 1e6 AS p95,
       CAST(1 AS INT) AS sketch_in_envelope
FROM events GROUP BY event_type
"""


# -- qid: approx_heavy_hitters (frequent-items sketch) ----------------

def q_approx_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via approx_top_k — the third sketch family
    (HLL distinct, quantile, frequent items). At 100 TB this is the
    only sane top-k-by-frequency: fixed maxItemsTracked state per
    partial, mergeable, no full group-by materialization. The fixture
    has 5 distinct event types against 10000 tracked slots, so the
    sketch counts are provably EXACT and hash-compare directly against
    the exact GROUP BY — stronger than the gated pattern where
    exactness is attainable.

    NULL items: approx_top_k counts non-null items only (sketch
    semantics — a NULL is not an item), so the exact twin excludes the
    NULL group explicitly; the filter is stated on both sides rather
    than left to the fixture's accidental null-freeness (fuzz find,
    tools/fuzz_parity.py nulls profile)."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    sk = e.agg(F.expr("approx_top_k(event_type, 5)").alias("tk")).select(
        F.explode("tk").alias("s")
    )
    return sk.select(
        F.col("s.item").alias("event_type"),
        F.col("s.count").cast("long").alias("n_events"),
    )


SQL_APPROX_HEAVY_HITTERS = """
SELECT event_type, count(*) AS n_events FROM events
WHERE event_type IS NOT NULL GROUP BY event_type
"""


# -- qid: cohort_retention --------------------------------------------

def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week
    (ISO Monday truncation — identical in both engines), then the
    share of each cohort active in every subsequent week. Two keyed
    shuffles (per-user first week, cohort×week distinct count) — the
    standard product-analytics rollup, no self-join explosion."""
    e = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    first = e.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    act = e.distinct()
    sizes = first.groupBy("cohort_wk").agg(F.countDistinct("user_id").alias("cohort_n"))
    ret = (
        act.join(first, "user_id")
        .groupBy("cohort_wk", "wk")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return (
        ret.join(F.broadcast(sizes), "cohort_wk")
        .select(
            "cohort_wk",
            F.col("wk").alias("activity_wk"),
            "n_active",
            "cohort_n",
            pround(F.col("n_active") / F.col("cohort_n"), 6).alias("retention"),
        )
    )


SQL_COHORT_RETENTION = """
WITH e AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
first AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id),
act AS (SELECT DISTINCT user_id, wk FROM e),
sizes AS (SELECT cohort_wk, count(DISTINCT user_id) AS cohort_n FROM first GROUP BY 1),
ret AS (
  SELECT cohort_wk, wk, count(DISTINCT act.user_id) AS n_active
  FROM act JOIN first USING (user_id) GROUP BY 1, 2
)
SELECT cohort_wk, wk AS activity_wk, n_active, cohort_n,
       floor(n_active / cohort_n * 1000000.0 + 0.5) / 1000000.0 AS retention
FROM ret JOIN sizes USING (cohort_wk)
"""


# -- qid: event_transitions -------------------------------------------

def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: per-user event streams ordered by
    (ts, event_id), lag pairs counted by (from, to) — the Markov/path
    analysis staple. One window shuffle keyed by user, one small
    (|types|²) aggregate."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    return t.groupBy(
        F.col("prev_type").alias("from_type"), F.col("event_type").alias("to_type")
    ).agg(F.count("*").alias("n_transitions"))


SQL_EVENT_TRANSITIONS = """
WITH t AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n_transitions
FROM t WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


# -- qid: time_weighted_avg --------------------------------------------

def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted mean of `value` — the
    irregular-sampling-correct average (each reading weighted by how
    long it was current)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.timeseries import (
        time_weighted_avg,
    )

    return time_weighted_avg(load(spark, sf_dir, "events"), "user_id", seq="event_id")


SQL_TIME_WEIGHTED_AVG = """
WITH e AS (
  SELECT user_id, event_id, ts, CAST(value AS DOUBLE) AS v,
         date_diff('second', TIMESTAMP '1970-01-01', ts) AS sec
  FROM events
),
iv AS (
  -- order by the full-precision ts (the truncated sec would reorder
  -- same-second events relative to the Spark window); event_id is the
  -- never-null unique tie-break (nullable v would flip on the
  -- engines' opposite NULL-order defaults — eventstorm fuzz find)
  SELECT user_id, v,
         lead(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id) - sec AS dt
  FROM e
)
SELECT user_id,
       count(*) AS n_intervals,
       CAST(sum(dt) AS BIGINT) AS total_seconds,
       floor(CAST(round(sum(CAST(floor(v * dt * 1000000.0 + 0.5) / 1000000.0
                                 AS DECIMAL(24,6))), 6) AS DOUBLE)
             / CAST(sum(dt) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS twa
FROM iv WHERE dt IS NOT NULL
GROUP BY user_id
"""


# -- qid: counter_agg --------------------------------------------------

def q_counter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user monotonic-counter increase with reset detection
    (Prometheus `increase` semantics over the value column)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.timeseries import (
        counter_agg,
    )

    return counter_agg(load(spark, sf_dir, "events"), "user_id", seq="event_id")


SQL_COUNTER_AGG = """
WITH e AS (
  SELECT user_id, event_id, ts, CAST(value AS DOUBLE) AS v
  FROM events
),
d AS (
  -- event_id tie-break: never-null, unique (eventstorm fuzz find)
  SELECT user_id, v,
         v - lag(v) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
  FROM e
)
SELECT user_id,
       count(*) AS n_steps,
       CAST(sum(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
       CAST(round(sum(CAST(floor((CASE WHEN delta >= 0 THEN delta ELSE v END)
                                 * 1000000.0 + 0.5) / 1000000.0
                           AS DECIMAL(24,6))), 6) AS DOUBLE) AS total_increase
FROM d WHERE delta IS NOT NULL
GROUP BY user_id
"""


# -- qid: state_durations ----------------------------------------------

def q_state_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seconds spent in each event_type state across all users — each
    event opens an interval its user's next event closes."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.timeseries import (
        state_durations,
    )

    return state_durations(load(spark, sf_dir, "events"), "user_id", "event_type", seq="event_id")


SQL_STATE_DURATIONS = """
WITH e AS (
  SELECT user_id, event_id, event_type, ts,
         date_diff('second', TIMESTAMP '1970-01-01', ts) AS sec
  FROM events
),
iv AS (
  -- event_id tie-break: never-null, unique (eventstorm fuzz find)
  SELECT event_type AS state,
         lead(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id) - sec AS dur
  FROM e
)
SELECT state, count(*) AS n_intervals, CAST(sum(dur) AS BIGINT) AS total_seconds
FROM iv WHERE dur IS NOT NULL
GROUP BY state
"""


# -- qid: minmax_downsample --------------------------------------------

DOWNSAMPLE_USERS = 50
DOWNSAMPLE_BUCKET = 86400


def q_minmax_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily min/max witness points per user — the plot-preserving
    downsample (extremes kept, middle dropped)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.timeseries import (
        minmax_downsample,
    )

    ev = load(spark, sf_dir, "events").where(F.col("user_id") < DOWNSAMPLE_USERS)
    return minmax_downsample(ev, "user_id", bucket_seconds=DOWNSAMPLE_BUCKET)


SQL_MINMAX_DOWNSAMPLE = f"""
WITH e AS (
  SELECT user_id, event_id, CAST(value AS DOUBLE) AS v,
         date_diff('second', TIMESTAMP '1970-01-01', ts) AS sec
  FROM events WHERE user_id < {DOWNSAMPLE_USERS} AND value IS NOT NULL
),
b AS (
  SELECT user_id, event_id, v, sec - (sec % {DOWNSAMPLE_BUCKET}) AS bucket_start
  FROM e
),
r AS (
  SELECT user_id, bucket_start, event_id, v,
         row_number() OVER (PARTITION BY user_id, bucket_start ORDER BY v, event_id) AS rlo,
         row_number() OVER (PARTITION BY user_id, bucket_start ORDER BY v DESC, event_id DESC) AS rhi
  FROM b
)
SELECT user_id, bucket_start,
       count(*) AS n_points,
       min(v) AS min_value,
       max(v) AS max_value,
       max(CASE WHEN rlo = 1 THEN event_id END) AS min_point_id,
       max(CASE WHEN rhi = 1 THEN event_id END) AS max_point_id
FROM r
GROUP BY user_id, bucket_start
"""


# -- qid: ewma_smooth --------------------------------------------------

EWMA_ALPHA = 0.2


def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values (α=0.2) — the recursive smoother
    no window frame expresses (every prefix weight changes with t),
    run as an Arrow ``mapInPandas`` kernel over key-partitioned data
    with pandas' grouped-ewm C path — one Python invocation per
    PARTITION, not per key (operators/timeseries.py ``ewma``). The
    recursion is a fixed sequence of IEEE double ops, so the oracle's
    ``list_reduce`` twin reproduces it BIT-IDENTICALLY: a stateful
    Python kernel whose output is exact-hash-compared, not
    bounds-gated."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.timeseries import (
        ewma,
    )

    e = load(spark, sf_dir, "events")
    return ewma(
        e, key="user_id", ts="ts", value="value",
        alpha=EWMA_ALPHA, tiebreak="event_id",
    )


SQL_EWMA_SMOOTH = f"""
SELECT user_id,
       count(*) AS n_points,
       list_reduce(
         list(CAST(value AS DOUBLE) ORDER BY ts, event_id),
         (acc, x) -> {EWMA_ALPHA} * x + (1.0 - {EWMA_ALPHA}) * acc
       ) AS ewma
FROM events
WHERE value IS NOT NULL
GROUP BY user_id
"""


QUERIES = {
    "ewma_smooth": q_ewma_smooth,
    "time_weighted_avg": q_time_weighted_avg,
    "counter_agg": q_counter_agg,
    "state_durations": q_state_durations,
    "minmax_downsample": q_minmax_downsample,
    "gap_fill": q_gap_fill,
    "gap_fill_interp": q_gap_fill_interp,
    "ts_zscore": q_ts_zscore,
    "hll_distinct": q_hll_distinct,
    "approx_quantiles": q_approx_quantiles,
    "approx_heavy_hitters": q_approx_heavy_hitters,
    "cohort_retention": q_cohort_retention,
    "event_transitions": q_event_transitions,
}

ORACLE_SQL = {
    "ewma_smooth": SQL_EWMA_SMOOTH,
    "time_weighted_avg": SQL_TIME_WEIGHTED_AVG,
    "counter_agg": SQL_COUNTER_AGG,
    "state_durations": SQL_STATE_DURATIONS,
    "minmax_downsample": SQL_MINMAX_DOWNSAMPLE,
    "gap_fill": SQL_GAP_FILL,
    "gap_fill_interp": SQL_GAP_FILL_INTERP,
    "ts_zscore": SQL_TS_ZSCORE,
    "hll_distinct": SQL_HLL_DISTINCT,
    "approx_quantiles": SQL_APPROX_QUANTILES,
    "approx_heavy_hitters": SQL_APPROX_HEAVY_HITTERS,
    "cohort_retention": SQL_COHORT_RETENTION,
    "event_transitions": SQL_EVENT_TRANSITIONS,
}


# -- qid: rolling_distinct --------------------------------------------

RD_WINDOW_DAYS = 7


def q_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing {RD_WINDOW_DAYS}-day distinct users per day (rolling
    WAU) — the metric SQL cannot express distributively, because
    ``COUNT(DISTINCT) OVER (RANGE ...)`` is unsupported (and would be
    a per-frame re-scan if it weren't). The distributed reformulation:

      1. reduce events to DAY-PARTIALS (distinct (day, user) pairs) —
         one combinable hash-distinct, the only pass over raw events;
      2. each partial contributes to the {RD_WINDOW_DAYS} as-of days
         it is visible from (a sequence explode — ×{RD_WINDOW_DAYS}
         on the PARTIAL table, never on raw events);
      3. count distinct users per as-of day; u1 (same-day actives)
         rides the SAME aggregation as a conditional distinct over
         the off=0 rows. The ghost tail the explode fabricates past
         the last real day is pruned by an explicit asof_day <=
         max(day) bound (1-row aggregate broadcast — the in-repo
         scalar-bound idiom), NOT by u1>0: filtering on u1 would also
         drop interior zero-activity days, which must still report
         their trailing u7 (with u1=0). A day whose entire trailing
         window is empty contributes no grid rows at all and is
         absent from the output — inherent to the partial-explode
         formulation; a calendar spine join would densify it if a
         consumer needs explicit zeros.

    At 100 TB step 1 bounds everything downstream: the explode and
    final distinct run over |days|×|daily actives|, independent of
    event volume. Swapping step 3's exact distinct for merged HLL
    partials (the hll_distinct sketch) turns the same plan into the
    sublinear production variant — the plan SHAPE is the operator.
    Emits (asof_day, u1, u7): same-day and trailing distinct counts.
    """
    e = load(spark, sf_dir, "events")
    dp = e.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    grid = dp.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(RD_WINDOW_DAYS - 1))
        ).alias("off"),
        "day",
        "user_id",
    ).select(
        F.date_add("day", F.col("off")).alias("asof_day"),
        "off",
        "user_id",
    )
    last_day = dp.agg(F.max("day").alias("max_day"))
    counts = grid.groupBy("asof_day").agg(
        F.countDistinct(
            F.when(F.col("off") == 0, F.col("user_id"))
        ).alias("u1"),
        F.countDistinct("user_id").alias("u7"),
    )
    # ghost-tail prune: the explode fabricates as-of days past the
    # last real day; bound by the 1-row max broadcast so interior
    # zero-activity days keep their trailing u7 (u1=0)
    return counts.join(
        F.broadcast(last_day), counts["asof_day"] <= last_day["max_day"]
    ).select("asof_day", "u1", "u7")


SQL_ROLLING_DISTINCT = f"""
WITH dp AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
grid AS (
  SELECT day + CAST(off AS INTEGER) AS asof_day, off, user_id
  FROM dp, unnest(generate_series(0, {RD_WINDOW_DAYS - 1})) AS t(off)
)
SELECT asof_day,
       count(DISTINCT CASE WHEN off = 0 THEN user_id END) AS u1,
       count(DISTINCT user_id) AS u7
FROM grid
WHERE asof_day <= (SELECT max(day) FROM dp)
GROUP BY 1
"""

QUERIES["rolling_distinct"] = q_rolling_distinct
ORACLE_SQL["rolling_distinct"] = SQL_ROLLING_DISTINCT
