"""Round-5 analytics wave 2: distributed skyline (Pareto frontier),
Benford first-digit forensics, Gini revenue concentration by
distributed rank, per-key autocorrelation, seasonal decomposition,
Kaplan-Meier survival, and a day-bucketed sweep-line concurrency peak.

These are analytics surfaces the reference (an Oracle→Oracle CDC
replicator) delegates to the warehouse entirely; each is re-expressed
as a Spark plan whose expensive phase is combinable or key-partitioned
and whose only global windows run over provably bounded inputs (the
bound stated per-qid in tools/window_audit.py's whitelist).

Determinism contract: doubles sum through the DECIMAL(24,6)/(38,6)
path (``_util.dsum`` idiom — exact, associative, any partial-agg tree
bit-agrees), presentation rounding is the portable floor formula
(``_util.pround``), and every window ordering carries a total
tiebreak. Benford's first digit comes from the DECIMAL STRING form,
never floor(log10(x)) — log10 of a power-of-ten boundary value is
engine-ulp territory; the decimal string is format-stable in both.

Scale notes per qid live on the functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import (
    distributed_rank,
    signed_log_bucket,
)
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import (
    dsum,
    load,
    pround,
)


# -- qid: skyline_frontier ----------------------------------------------

def q_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline over part: the Pareto frontier of (minimize
    p_retailprice, maximize p_size) — every (price, size) point no
    other part weakly dominates. The operator every "best tradeoff"
    query (cheapest-per-capability, fastest-per-cost) reduces to.

    Algorithm: collapse to one row per distinct price with its best
    size (combinable groupBy), then the staircase rule — a point
    survives iff its size strictly exceeds the running max over all
    strictly-cheaper points (rows-frame over the price-sorted distinct
    table; "strictly cheaper" is exact because prices are distinct
    after the collapse).

    Scale: the classic two-phase distributed skyline — each partition
    first drops its LOCALLY dominated points with the same staircase
    rule keyed by spark_partition_id (no local point dominated within
    a partition can be on the global frontier, so the filter is
    lossless), and only the union of local frontiers reaches the
    global merge window. Worst case (input already a staircase) is
    O(n) like every skyline algorithm; typical inputs collapse by
    orders of magnitude before the merge. The oracle runs the
    single-window form — the local pre-filter must not change the
    answer, which IS the differential check.

    NULL contract (fuzz find, tools/fuzz_parity.py nulls profile):
    dominance is undefined for a point missing either coordinate —
    incomplete tuples are excluded explicitly on both sides (the
    standard skyline convention); otherwise each engine's null sort
    order decides whether the NULL-price point "wins" the staircase.
    """
    per_price = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull())
        .groupBy("p_retailprice")
        .agg(F.max("p_size").alias("best_size"))
    )
    # phase 1: partition-local staircase (keyed window — no exchange
    # of the full distinct-price table into one task)
    w_loc = (
        Window.partitionBy("__pid__")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = (
        per_price.withColumn("__pid__", F.spark_partition_id())
        .withColumn("__lmax__", F.max("best_size").over(w_loc))
        .where(F.col("__lmax__").isNull() | (F.col("best_size") > F.col("__lmax__")))
        .drop("__pid__", "__lmax__")
    )
    # phase 2: global merge over the union of local frontiers (the
    # bounded input the window_audit whitelist states)
    w_glob = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        local.withColumn("__gmax__", F.max("best_size").over(w_glob))
        .where(F.col("__gmax__").isNull() | (F.col("best_size") > F.col("__gmax__")))
        .select("p_retailprice", "best_size")
    )


SQL_SKYLINE_FRONTIER = """
WITH per_price AS (
  SELECT p_retailprice, max(p_size) AS best_size
  FROM part
  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
  GROUP BY p_retailprice
),
st AS (
  SELECT p_retailprice, best_size,
         max(best_size) OVER (ORDER BY p_retailprice
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS prev_max
  FROM per_price
)
SELECT p_retailprice, best_size
FROM st WHERE prev_max IS NULL OR best_size > prev_max
"""


# -- qid: benford_audit --------------------------------------------------

def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit forensics over o_totalprice: observed vs
    expected leading-digit shares (P(d) = log10(1 + 1/d)) with the
    per-digit chi-square contribution — the standard screen for
    fabricated or truncated monetary data in an ingested feed.

    The first digit is char 1 of the DECIMAL(18,2) STRING form (every
    totalprice ≥ 1), never floor(log10(x)): log10 at a power-of-ten
    boundary is 1-ulp engine territory, the decimal string is
    format-stable in both engines.

    Scale: one combinable 9-group aggregation + a broadcast of the
    1-row total — map-side partial all the way; nothing global.
    """
    o = load(spark, sf_dir, "orders")
    d = o.select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    per = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    tot = per.agg(F.sum("n_obs").alias("n_total"))
    exp_share = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    exp_n = exp_share * F.col("n_total").cast("double")
    chi2 = (F.col("n_obs").cast("double") - exp_n) * (
        F.col("n_obs").cast("double") - exp_n
    ) / exp_n
    return per.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_obs",
        pround(F.col("n_obs").cast("double") / F.col("n_total").cast("double")).alias(
            "obs_share"
        ),
        pround(exp_share).alias("exp_share"),
        pround(chi2).alias("chi2_part"),
    )


SQL_BENFORD_AUDIT = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
              AS INT) AS digit
  FROM orders
),
per AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit),
tot AS (SELECT sum(n_obs) AS n_total FROM per),
x AS (
  SELECT digit, n_obs, n_total,
         log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS exp_p,
         log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * CAST(n_total AS DOUBLE) AS exp_n
  FROM per CROSS JOIN tot
)
SELECT digit, n_obs,
       floor(CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS obs_share,
       floor(exp_p * 1e6 + 0.5) / 1e6 AS exp_share,
       floor((CAST(n_obs AS DOUBLE) - exp_n) * (CAST(n_obs AS DOUBLE) - exp_n)
             / exp_n * 1e6 + 0.5) / 1e6 AS chi2_part
FROM x
"""


# -- qid: gini_concentration ----------------------------------------------

def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration via the
    rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over revenue sorted
    ascending — the one-number inequality measure behind every
    "whale analysis" (the Lorenz-curve sibling of pareto_revenue's
    cumulative 80/20 cut).

    The rank is `operators.scale.distributed_rank` — the two-pass
    (monotonic log-bucket histogram → offset prefix-sum → keyed local
    rank) exact global rank, because row_number() over a bare ORDER BY
    single-partitions the per-customer table at 100 TB. Σ(i·xᵢ) runs
    in DECIMAL(38,6) (rank·revenue products summed exactly —
    associative, partial-agg safe); only the final G divides into a
    rounded double.
    """
    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(dsum(F.col("o_totalprice")).alias("revenue"))
        # a customer whose every order carries a NULL price has no
        # revenue to rank — excluded by contract on BOTH sides (the
        # engines would otherwise also rank the NULL oppositely;
        # DIVERGENCES.md class 8, found by the sf0.1 nulls sweep)
        .filter(F.col("revenue").isNotNull())
    )
    # monotonic bucket of the sort value, total over every real
    # (sign·log1p handles the 0-revenue customers boundary fuzz
    # creates; clean data is always ≥ ~900); ~400 live cells
    ranked = distributed_rank(
        rev,
        order_col="revenue",
        id_col="o_custkey",
        bucket=signed_log_bucket(F.col("revenue")),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("revenue").cast("decimal(24,6)")).alias("_tot"),
        F.sum(
            F.col("value_rank").cast("decimal(38,6)")
            * F.col("revenue").cast("decimal(38,6)")
        ).alias("_iwx"),
    )
    n = F.col("n_customers").cast("double")
    gini = (
        F.lit(2.0) * F.col("_iwx").cast("double")
        / (n * F.col("_tot").cast("double"))
        - (n + F.lit(1.0)) / n
    )
    return agg.select(
        "n_customers",
        F.round(F.col("_tot"), 2).cast("double").alias("total_revenue"),
        pround(gini).alias("gini"),
    )


SQL_GINI_CONCENTRATION = """
WITH rev AS (
  SELECT o_custkey,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(24,6))), 2) AS DOUBLE)
           AS revenue
  FROM orders GROUP BY o_custkey
),
rk AS (
  SELECT revenue,
         row_number() OVER (ORDER BY revenue, o_custkey) AS i
  FROM rev
  WHERE revenue IS NOT NULL
),
a AS (
  SELECT count(*) AS n_customers,
         sum(CAST(revenue AS DECIMAL(24,6))) AS tot,
         sum(CAST(i AS DECIMAL(38,6)) * CAST(revenue AS DECIMAL(38,6))) AS iwx
  FROM rk
)
SELECT n_customers,
       CAST(round(tot, 2) AS DOUBLE) AS total_revenue,
       floor((2.0 * CAST(iwx AS DOUBLE) / (CAST(n_customers AS DOUBLE) * CAST(tot AS DOUBLE))
              - (CAST(n_customers AS DOUBLE) + 1.0) / CAST(n_customers AS DOUBLE))
             * 1e6 + 0.5) / 1e6 AS gini
FROM a
"""


# -- qid: acf_lags --------------------------------------------------------

ACF_MAX_LAG = 3


def q_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sample autocorrelation of the event value series at
    lags 1..{ACF_MAX_LAG} — Pearson correlation of (vₜ, vₜ₋ₖ) pairs,
    the standard seasonality/memory screen run before fitting any
    per-key forecast.

    All three lag columns come from ONE window spec (same (user,
    ORDER BY ts, event_id) sort — one exchange feeds every lag), the
    lag dimension unpivots via stack (pure projection), and the corr
    reduces to the six moment sums computed exactly in DECIMAL(38,6)
    (products of doubles are single IEEE multiplies — deterministic —
    and the decimal SUM is associative, so any 100 TB partial-agg tree
    bit-agrees with the oracle's scan order). Only the final
    correlation divides into a rounded double.
    """
    e = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "value")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = e.select(
        "user_id",
        "value",
        *[F.lag("value", k).over(w).alias(f"_lag{k}") for k in range(1, ACF_MAX_LAG + 1)],
    )
    stack_args = ", ".join(f"{k}, _lag{k}" for k in range(1, ACF_MAX_LAG + 1))
    pairs = lagged.selectExpr(
        "user_id",
        "value AS x",
        f"stack({ACF_MAX_LAG}, {stack_args}) AS (lag, y)",
    ).where(F.col("y").isNotNull())
    d38 = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    agg = pairs.groupBy("user_id", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(d38(F.col("x"))).alias("_sx"),
        F.sum(d38(F.col("y"))).alias("_sy"),
        F.sum(d38(F.col("x") * F.col("y"))).alias("_sxy"),
        F.sum(d38(F.col("x") * F.col("x"))).alias("_sxx"),
        F.sum(d38(F.col("y") * F.col("y"))).alias("_syy"),
    )
    n = F.col("n_pairs").cast("double")
    cov = n * F.col("_sxy").cast("double") - F.col("_sx").cast("double") * F.col(
        "_sy"
    ).cast("double")
    vx = n * F.col("_sxx").cast("double") - F.col("_sx").cast("double") * F.col(
        "_sx"
    ).cast("double")
    vy = n * F.col("_syy").cast("double") - F.col("_sy").cast("double") * F.col(
        "_sy"
    ).cast("double")
    return (
        agg.where((F.col("n_pairs") >= 3) & (vx > 0) & (vy > 0))
        .select(
            "user_id",
            "lag",
            "n_pairs",
            pround(cov / F.sqrt(vx * vy)).alias("acf"),
        )
    )


SQL_ACF_LAGS = f"""
WITH e AS (
  SELECT user_id, ts, event_id, value FROM events WHERE value IS NOT NULL
),
lagged AS (
  SELECT user_id, value AS x,
         lag(value, 1) OVER w AS _lag1,
         lag(value, 2) OVER w AS _lag2,
         lag(value, 3) OVER w AS _lag3
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
pairs AS (
  SELECT user_id, 1 AS lag, x, _lag1 AS y FROM lagged WHERE _lag1 IS NOT NULL
  UNION ALL
  SELECT user_id, 2, x, _lag2 FROM lagged WHERE _lag2 IS NOT NULL
  UNION ALL
  SELECT user_id, 3, x, _lag3 FROM lagged WHERE _lag3 IS NOT NULL
),
a AS (
  SELECT user_id, lag, count(*) AS n_pairs,
         sum(CAST(x AS DECIMAL(38,6))) AS sx,
         sum(CAST(y AS DECIMAL(38,6))) AS sy,
         sum(CAST(x * y AS DECIMAL(38,6))) AS sxy,
         sum(CAST(x * x AS DECIMAL(38,6))) AS sxx,
         sum(CAST(y * y AS DECIMAL(38,6))) AS syy
  FROM pairs GROUP BY user_id, lag
),
f AS (
  SELECT user_id, lag, n_pairs,
         CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
         CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
         CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
  FROM a
)
SELECT user_id, lag, n_pairs,
       floor(cov / sqrt(vx * vy) * 1e6 + 0.5) / 1e6 AS acf
FROM f WHERE n_pairs >= 3 AND vx > 0 AND vy > 0
"""


# -- qid: seasonal_decompose ----------------------------------------------

def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily event
    total: trend = centered 7-day moving average (full windows only),
    seasonal = day-of-week mean of the detrended series, residual =
    the rest — the moving-average core of STL, the first diagnostic
    any telemetry series gets.

    Day-of-week is epoch-day arithmetic (days since Monday 1970-01-05
    mod 7), NOT dayofweek(): Spark numbers Sunday=1, DuckDB Sunday=0 —
    the portable form is the one both engines compute identically.

    Scale: the raw scan reduces to ONE row per day (combinable dsum);
    every window after that runs over the daily aggregate — ≤|days|
    rows (the window_audit bound) — and the 7-row seasonal index
    broadcasts back. The moving average sums DECIMAL over the frame
    and divides once (frame-order double summation is not associative;
    the decimal path bit-agrees under any evaluation order).
    """
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(dsum(F.col("value")).alias("y"))
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    with_trend = daily.select(
        "day",
        (F.datediff(F.col("day"), F.lit("1970-01-05").cast("date")) % 7).alias("dow"),
        "y",
        F.when(
            F.count(F.lit(1)).over(w7) == 7,
            pround(
                F.sum(F.col("y").cast("decimal(24,6)")).over(w7).cast("double")
                / F.lit(7.0)
            ),
        ).alias("trend"),
    ).withColumn("detr", pround(F.col("y") - F.col("trend")))
    seasonal = (
        with_trend.where(F.col("detr").isNotNull())
        .groupBy("dow")
        .agg(
            pround(
                F.sum(F.col("detr").cast("decimal(24,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("seasonal")
        )
    )
    return (
        with_trend.join(F.broadcast(seasonal), "dow", "left")
        .select(
            "day",
            "dow",
            "y",
            "trend",
            "seasonal",
            pround(F.col("detr") - F.col("seasonal")).alias("residual"),
        )
    )


SQL_SEASONAL_DECOMPOSE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(round(sum(CAST(value AS DECIMAL(24,6))), 2) AS DOUBLE) AS y
  FROM events GROUP BY 1
),
t AS (
  SELECT day,
         date_diff('day', DATE '1970-01-05', day) % 7 AS dow,
         y,
         CASE WHEN count(*) OVER w7 = 7 THEN
           floor(CAST(sum(CAST(y AS DECIMAL(24,6))) OVER w7 AS DOUBLE) / 7.0
                 * 1e6 + 0.5) / 1e6
         END AS trend
  FROM daily
  WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
d AS (
  SELECT *, floor((y - trend) * 1e6 + 0.5) / 1e6 AS detr FROM t
),
s AS (
  SELECT dow,
         floor(CAST(sum(CAST(detr AS DECIMAL(24,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS seasonal
  FROM d WHERE detr IS NOT NULL GROUP BY dow
)
SELECT d.day, d.dow, d.y, d.trend, s.seasonal,
       floor((d.detr - s.seasonal) * 1e6 + 0.5) / 1e6 AS residual
FROM d LEFT JOIN s ON d.dow = s.dow
"""


# -- qid: survival_km -------------------------------------------------------

KM_CHURN_GAP_DAYS = 7


def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimate of user lifetime: duration =
    days between a user's first and last event; a user whose last
    event predates the corpus end by > {KM_CHURN_GAP_DAYS} days is an
    observed churn, otherwise right-censored (still alive at cutoff —
    the censoring KM exists to handle; a naive churn-rate-by-duration
    silently treats them as churned). S(t) = Π_{{s≤t}} (1 − dₛ/nₛ)
    with the standard convention that subjects censored at s leave the
    risk set AFTER s.

    Determinism: each step's ln(1 − d/n) quantizes to integer 1e-12
    units the moment it is computed (the naive_bayes contract) — the
    cumulative sum is exact integer arithmetic, associative under any
    partial order, and only the final exp·round is floating point.

    Scale: per-user first/last is one combinable shuffle; the corpus
    cutoff is a global MAX that pass depends on, so the qid is
    two-pass by nature (the checksum_drill level-1/level-2 shape —
    pass 1 is an already-aggregated tiny branch). The user total is
    NOT a third pass: it falls out of the duration histogram itself
    (full-frame sum over ≤|distinct day-spans| rows — the
    window_audit bound, where every later window also runs).
    """
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
    )
    cutoff = u.agg(F.max("last_ts").alias("max_ts"))
    per_user = u.crossJoin(F.broadcast(cutoff)).select(
        F.datediff(F.to_date("last_ts"), F.to_date("first_ts")).alias("dur_days"),
        F.when(
            F.col("last_ts")
            < F.col("max_ts") - F.expr(f"INTERVAL {KM_CHURN_GAP_DAYS} DAYS"),
            1,
        )
        .otherwise(0)
        .alias("churned"),
    )
    hist = per_user.groupBy("dur_days").agg(
        F.sum("churned").alias("n_event"),
        F.sum(F.lit(1) - F.col("churned")).alias("n_censored"),
    )
    w_all = Window.orderBy("dur_days").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("dur_days").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("dur_days").rowsBetween(Window.unboundedPreceding, 0)
    at_risk = (
        hist.withColumn(
            "n_total", F.sum(F.col("n_event") + F.col("n_censored")).over(w_all)
        )
        .withColumn(
            "n_risk",
            F.col("n_total")
            - F.coalesce(
                F.sum(F.col("n_event") + F.col("n_censored")).over(w_prev), F.lit(0)
            ),
        )
        .withColumn(
            "_lnq",
            F.floor(
                F.log(
                    (F.col("n_risk") - F.col("n_event")).cast("double")
                    / F.col("n_risk").cast("double")
                )
                * 1e12
                + F.lit(0.5)
            ).cast("bigint"),
        )
    )
    return at_risk.select(
        "dur_days",
        "n_risk",
        "n_event",
        "n_censored",
        pround(F.exp(F.sum("_lnq").over(w_cum).cast("double") / F.lit(1e12))).alias(
            "survival"
        ),
    )


SQL_SURVIVAL_KM = f"""
WITH u AS (
  SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
  FROM events GROUP BY user_id
),
cutoff AS (SELECT max(last_ts) AS max_ts FROM u),
per_user AS (
  SELECT date_diff('day', CAST(first_ts AS DATE), CAST(last_ts AS DATE))
           AS dur_days,
         CASE WHEN last_ts < max_ts - INTERVAL {KM_CHURN_GAP_DAYS} DAY
              THEN 1 ELSE 0 END AS churned
  FROM u CROSS JOIN cutoff
),
hist AS (
  SELECT dur_days, sum(churned) AS n_event,
         sum(1 - churned) AS n_censored
  FROM per_user GROUP BY dur_days
),
r AS (
  SELECT dur_days, n_event, n_censored,
         sum(n_event + n_censored) OVER
           (ORDER BY dur_days ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND UNBOUNDED FOLLOWING)
         - coalesce(sum(n_event + n_censored) OVER
           (ORDER BY dur_days ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS n_risk
  FROM hist
),
q AS (
  SELECT *,
         CAST(floor(ln(CAST(n_risk - n_event AS DOUBLE)
                       / CAST(n_risk AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) AS lnq
  FROM r
)
SELECT dur_days, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(n_event AS BIGINT) AS n_event,
       CAST(n_censored AS BIGINT) AS n_censored,
       floor(exp(CAST(sum(lnq) OVER (ORDER BY dur_days
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW) AS DOUBLE)
                 / 1e12) * 1e6 + 0.5) / 1e6 AS survival
FROM q
"""


# -- qid: concurrency_peak ---------------------------------------------------

def q_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type by distributed sweep line: each
    event is an interval [ts, ts + (⌊value⌋ mod 3600 + 60)s) — closed-
    open — and the answer is the maximum number of simultaneously open
    intervals, with the earliest instant it is reached. The classic
    capacity question (max simultaneous sessions / connections /
    streams) that a groupBy can't answer.

    Scale: a naive sweep partitions by event_type alone — one task
    replays a whole type's timeline at 100 TB. Instead intervals are
    CLIPPED to calendar-day buckets (a bounded ≤2-element explode:
    intervals last <61.1 min, so they span at most one midnight);
    within a (type, day) bucket the clipped pieces preserve coverage
    exactly, so the within-bucket sweep (one keyed window, ordered by
    (t, delta, event_id) — ends before starts at equal t = closed-open)
    is exact, and the per-type peak is the max over its bucketed peaks.
    The argmax travels as one BIGINT code = running·10¹⁰ + (10¹⁰ − t)
    (t = epoch seconds < 10¹⁰): integer max ⇒ max concurrency, ties ⇒
    earliest instant — exact, associative, no max_by tie ambiguity.
    Valid for peaks < ~9·10⁸ (bigint headroom); document-bound, not
    data-plane-checked.
    """
    e = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.unix_timestamp("ts").alias("t0"),
            (F.pmod(F.floor("value"), F.lit(3600)) + F.lit(60)).alias("dur_s"),
        )
        .withColumn("t1", F.col("t0") + F.col("dur_s"))
    )
    pieces = (
        e.withColumn(
            "day",
            F.explode(
                F.sequence(
                    F.floor(F.col("t0") / 86400),
                    F.floor((F.col("t1") - 1) / 86400),
                )
            ),
        )
        .select(
            "event_id",
            "event_type",
            "day",
            F.greatest(F.col("t0"), F.col("day") * 86400).alias("ps"),
            F.least(F.col("t1"), (F.col("day") + 1) * 86400).alias("pe"),
            # first-piece marker: only the piece that begins at the
            # interval's true start carries it — summing the marker on
            # the +1 points counts INTERVALS (not clipped pieces)
            # inside the same pass, so the qid never rescans events
            (F.col("t0") >= F.col("day") * 86400).cast("int").alias("is_first"),
        )
    )
    points = pieces.select(
        "event_id",
        "event_type",
        "day",
        F.explode(
            F.array(
                F.struct(
                    F.col("ps").alias("t"),
                    F.lit(1).alias("delta"),
                    F.col("is_first").alias("niv"),
                ),
                F.struct(
                    F.col("pe").alias("t"),
                    F.lit(-1).alias("delta"),
                    F.lit(0).alias("niv"),
                ),
            )
        ).alias("p"),
    ).select("event_id", "event_type", "day", "p.t", "p.delta", "p.niv")
    w = (
        Window.partitionBy("event_type", "day")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    coded = points.withColumn(
        "code",
        F.sum("delta").over(w).cast("bigint") * F.lit(10_000_000_000).cast("bigint")
        + (F.lit(10_000_000_000).cast("bigint") - F.col("t")),
    )
    return coded.groupBy("event_type").agg(
        F.max("code").alias("peak_code"),
        F.sum("niv").cast("bigint").alias("n_intervals"),
    ).select(
        "event_type",
        "n_intervals",
        (F.col("peak_code") / F.lit(10_000_000_000))
        .cast("bigint")
        .alias("peak_concurrency"),
        (
            F.lit(10_000_000_000).cast("bigint")
            - F.pmod(F.col("peak_code"), F.lit(10_000_000_000))
        ).alias("peak_at_epoch_s"),
    )


SQL_CONCURRENCY_PEAK = """
WITH e AS (
  SELECT event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS t0,
         -- pmod twin: Spark's pmod is always non-negative while SQL %
         -- follows the dividend's sign, so a negative event value gave
         -- the two engines different durations (fuzz find, boundary
         -- profile)
         ((CAST(floor(value) AS BIGINT) % 3600) + 3600) % 3600 + 60 AS dur_s
  FROM events WHERE value IS NOT NULL
),
iv AS (SELECT *, t0 + dur_s AS t1 FROM e),
pieces AS (
  SELECT event_id, event_type, d.day,
         greatest(t0, d.day * 86400) AS ps,
         least(t1, (d.day + 1) * 86400) AS pe,
         CASE WHEN t0 >= d.day * 86400 THEN 1 ELSE 0 END AS is_first
  FROM iv,
       LATERAL (SELECT unnest(generate_series(t0 // 86400, (t1 - 1) // 86400))
                AS day) d
),
points AS (
  SELECT event_id, event_type, day, ps AS t, 1 AS delta, is_first AS niv
  FROM pieces
  UNION ALL
  SELECT event_id, event_type, day, pe AS t, -1 AS delta, 0 AS niv FROM pieces
),
run AS (
  SELECT event_type, niv,
         sum(delta) OVER (PARTITION BY event_type, day
                          ORDER BY t, delta, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           * 10000000000 + (10000000000 - t) AS code
  FROM points
)
SELECT event_type,
       CAST(sum(niv) AS BIGINT) AS n_intervals,
       CAST(max(code) // 10000000000 AS BIGINT) AS peak_concurrency,
       CAST(10000000000 - (max(code) % 10000000000) AS BIGINT) AS peak_at_epoch_s
FROM run GROUP BY event_type
"""


QUERIES = {
    "skyline_frontier": q_skyline_frontier,
    "benford_audit": q_benford_audit,
    "gini_concentration": q_gini_concentration,
    "acf_lags": q_acf_lags,
    "seasonal_decompose": q_seasonal_decompose,
    "survival_km": q_survival_km,
    "concurrency_peak": q_concurrency_peak,
}

ORACLE_SQL = {
    "skyline_frontier": SQL_SKYLINE_FRONTIER,
    "benford_audit": SQL_BENFORD_AUDIT,
    "gini_concentration": SQL_GINI_CONCENTRATION,
    "acf_lags": SQL_ACF_LAGS,
    "seasonal_decompose": SQL_SEASONAL_DECOMPOSE,
    "survival_km": SQL_SURVIVAL_KM,
    "concurrency_peak": SQL_CONCURRENCY_PEAK,
}


# -- qid: mix_shift --------------------------------------------------------

MS_Y0, MS_Y1 = 1996, 1997


def q_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix-shift decomposition of a period-over-period change: the
    revenue-per-order change from {MS_Y0} to {MS_Y1} splits, per
    order-priority segment, into a RATE effect (the segment's own
    per-order revenue moved, at baseline mix) and a MIX effect (the
    segment's share of orders moved, at baseline rate):

        Δ = Σ_s [ w₀(s)·(r₁(s) − r₀(s))  +  (w₁(s) − w₀(s))·r₁(s) ]

    — the Laspeyres/Paasche split every "why did the average move"
    analysis needs; without it a metric can fall while every segment
    improves (Simpson's paradox, which this surfaces directly).

    Determinism: rates and weights are pround-quantized before the
    effect products (single IEEE multiplies thereafter); the identity
    rate+mix = Δ then holds bit-for-bit in both engines.

    Scale: one combinable (year, segment) aggregate + a ≤2×|segments|
    pivot via conditional aggregation — nothing beyond the first
    shuffle touches data.
    """
    o = load(spark, sf_dir, "orders").where(
        F.year("o_orderdate").isin(MS_Y0, MS_Y1)
    )
    per = o.groupBy(
        F.year("o_orderdate").alias("yr"), F.col("o_orderpriority").alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(24,6)")).alias("_rev"),
    )
    tot = per.groupBy("yr").agg(F.sum("n").alias("n_tot"))
    j = per.join(F.broadcast(tot), "yr").select(
        "segment",
        "yr",
        pround(F.col("_rev").cast("double") / F.col("n").cast("double")).alias("rate"),
        pround(F.col("n").cast("double") / F.col("n_tot").cast("double")).alias("w"),
    )
    wide = j.groupBy("segment").agg(
        F.max(F.when(F.col("yr") == MS_Y0, F.col("rate"))).alias("r0"),
        F.max(F.when(F.col("yr") == MS_Y1, F.col("rate"))).alias("r1"),
        F.max(F.when(F.col("yr") == MS_Y0, F.col("w"))).alias("w0"),
        F.max(F.when(F.col("yr") == MS_Y1, F.col("w"))).alias("w1"),
    )
    return wide.select(
        "segment",
        "r0",
        "r1",
        "w0",
        "w1",
        pround(F.col("w0") * (F.col("r1") - F.col("r0"))).alias("rate_effect"),
        pround((F.col("w1") - F.col("w0")) * F.col("r1")).alias("mix_effect"),
    )


SQL_MIX_SHIFT = f"""
WITH per AS (
  SELECT year(o_orderdate) AS yr, o_orderpriority AS segment,
         count(*) AS n,
         sum(CAST(o_totalprice AS DECIMAL(24,6))) AS rev
  FROM orders WHERE year(o_orderdate) IN ({MS_Y0}, {MS_Y1})
  GROUP BY 1, 2
),
tot AS (SELECT yr, sum(n) AS n_tot FROM per GROUP BY yr),
j AS (
  SELECT segment, per.yr,
         floor(CAST(rev AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6
           AS rate,
         floor(CAST(n AS DOUBLE) / CAST(n_tot AS DOUBLE) * 1e6 + 0.5) / 1e6
           AS w
  FROM per JOIN tot ON per.yr = tot.yr
),
wide AS (
  SELECT segment,
         max(CASE WHEN yr = {MS_Y0} THEN rate END) AS r0,
         max(CASE WHEN yr = {MS_Y1} THEN rate END) AS r1,
         max(CASE WHEN yr = {MS_Y0} THEN w END) AS w0,
         max(CASE WHEN yr = {MS_Y1} THEN w END) AS w1
  FROM j GROUP BY segment
)
SELECT segment, r0, r1, w0, w1,
       floor(w0 * (r1 - r0) * 1e6 + 0.5) / 1e6 AS rate_effect,
       floor((w1 - w0) * r1 * 1e6 + 0.5) / 1e6 AS mix_effect
FROM wide
"""


# -- qid: proration_allocate ---------------------------------------------------

def q_proration_allocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-proration: each order's value allocates across the
    calendar months its fulfillment interval [orderdate, orderdate+90d)
    overlaps, weighted by days of overlap — revenue recognition /
    cost amortization, the finance-warehouse allocation every ERP
    extract needs. Exactness: per-month shares are computed as exact
    integer day counts; the money split is DECIMAL cents × days /
    span_days rounded half-up per slice, with the LAST slice taking
    the rounding remainder so every order's slices sum to the original
    amount EXACTLY (the conservation property; pinned by the oracle
    which implements the identical remainder rule).

    Scale: the explode is bounded (≤4 month slices per 90-day span);
    the monthly rollup is one combinable shuffle. Same day-clip
    pattern as concurrency_peak.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("d0"),
        F.date_add(F.to_date("o_orderdate"), 90).alias("d1"),  # exclusive
        F.col("o_totalprice").cast("decimal(18,2)").alias("amt"),
    )
    sliced = (
        o.withColumn(
            "m",
            F.explode(
                F.sequence(
                    F.trunc("d0", "month"),
                    F.trunc(F.date_sub("d1", 1), "month"),
                    F.expr("INTERVAL 1 MONTH"),
                )
            ),
        )
        .withColumn("ms", F.greatest("d0", "m"))
        .withColumn(
            "me", F.least("d1", F.add_months(F.col("m"), 1))
        )
        .withColumn("days", F.datediff("me", "ms"))
        .withColumn("span", F.datediff("d1", "d0"))
    )
    # cents-exact proration with last-slice remainder
    w = Window.partitionBy("o_orderkey").orderBy("m")
    alloc = (
        sliced.withColumn(
            "cents", (F.col("amt") * 100).cast("bigint")
        )
        .withColumn(
            "slice_cents",
            F.floor(
                (F.col("cents") * F.col("days")).cast("double")
                / F.col("span").cast("double")
                + F.lit(0.5)
            ).cast("bigint"),
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_slices", F.count(F.lit(1)).over(Window.partitionBy("o_orderkey")))
        .withColumn(
            "final_cents",
            F.when(
                F.col("rn") == F.col("n_slices"),
                F.col("cents")
                - F.coalesce(
                    F.sum(F.when(F.col("rn") < F.col("n_slices"), F.col("slice_cents"))).over(
                        Window.partitionBy("o_orderkey")
                    ),
                    F.lit(0),
                ),
            ).otherwise(F.col("slice_cents")),
        )
    )
    return alloc.groupBy(F.col("m").alias("month")).agg(
        F.count(F.lit(1)).alias("n_slices"),
        (F.sum("final_cents").cast("decimal(24,0)") / 100)
        .cast("double")
        .alias("allocated"),
    )


SQL_PRORATION_ALLOCATE = """
WITH o AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d0,
         CAST(o_orderdate AS DATE) + 90 AS d1,
         CAST(o_totalprice AS DECIMAL(18,2)) AS amt
  FROM orders
),
sliced AS (
  SELECT o.*, CAST(mm.m AS DATE) AS m,
         greatest(d0, CAST(mm.m AS DATE)) AS ms,
         least(d1, CAST(mm.m AS DATE) + INTERVAL 1 MONTH) AS me
  FROM o,
       LATERAL (SELECT unnest(generate_series(date_trunc('month', d0),
                                              date_trunc('month', d1 - 1),
                                              INTERVAL 1 MONTH)) AS m) mm
),
calc AS (
  SELECT o_orderkey, m,
         date_diff('day', ms, me) AS days,
         date_diff('day', d0, d1) AS span,
         CAST(amt * 100 AS BIGINT) AS cents
  FROM sliced
),
sl AS (
  SELECT *,
         CAST(floor(CAST(cents * days AS DOUBLE) / CAST(span AS DOUBLE) + 0.5)
              AS BIGINT) AS slice_cents,
         row_number() OVER (PARTITION BY o_orderkey ORDER BY m) AS rn,
         count(*) OVER (PARTITION BY o_orderkey) AS n_slices
  FROM calc
),
fin AS (
  SELECT *,
         CASE WHEN rn = n_slices THEN
           cents - coalesce(sum(CASE WHEN rn < n_slices THEN slice_cents END)
                            OVER (PARTITION BY o_orderkey), 0)
         ELSE slice_cents END AS final_cents
  FROM sl
)
SELECT m AS month, count(*) AS n_slices,
       CAST(CAST(sum(final_cents) AS DECIMAL(24,0)) / 100 AS DOUBLE)
         AS allocated
FROM fin GROUP BY m
"""


QUERIES["mix_shift"] = q_mix_shift
QUERIES["proration_allocate"] = q_proration_allocate
ORACLE_SQL["mix_shift"] = SQL_MIX_SHIFT
ORACLE_SQL["proration_allocate"] = SQL_PRORATION_ALLOCATE
