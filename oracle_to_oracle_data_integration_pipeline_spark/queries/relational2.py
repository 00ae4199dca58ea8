"""Second breadth batch: as-of join, range join, exact percentiles,
moment statistics, grouping sets, math and date scalar functions.

Determinism conventions as in relational.py; moment statistics
(variance/correlation) are computed from decimal-domain power sums in
BOTH engines rather than the engines' internal accumulators, whose
floating-point update order differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.asof import asof_join
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load


# -- qid: asof_join ---------------------------------------------------

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each click, the user's most recent purchase at or before
    the click (classic point-in-time semantics). Purchases tied on
    (user, ts) resolve to the greatest event_id (the operator's
    deterministic tie contract); NULL user_ids match nothing —
    both per SQL join semantics (eventstorm fuzz finds)."""
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"), "user_id", "ts", "value"
    )
    out = asof_join(
        clicks, purchases, on="user_id", ts="ts",
        right_cols=["ts", "value"], tie="p_event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_asof").alias("purchase_ts"),
        F.col("value_asof").alias("purchase_value"),
    )


# p1 collapses (user_id, ts) purchase ties to the max-event_id row
# BEFORE the ASOF JOIN — DuckDB's ASOF picks an arbitrary row among
# equal timestamps, the engine's tie contract picks the greatest
# event_id; the row_number form (not max_by) is deliberate: max_by
# skips NULL values, this must carry the winning row's value even
# when it is NULL. ASOF's equality key already drops NULL user_ids.
SQL_ASOF = """
WITH p1 AS (
  SELECT user_id, ts, value FROM (
    SELECT user_id, ts, value,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
)
SELECT c.event_id, c.user_id, c.ts, p.ts AS purchase_ts, p.value AS purchase_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
ASOF JOIN p1 p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


# -- qid: range_join --------------------------------------------------

def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (interval) join: orders classified into price bands. The
    band table is tiny → broadcast nested-loop, which is exactly right:
    the big side streams once, no shuffle."""
    o = load(spark, sf_dir, "orders")
    bands = o.sparkSession.createDataFrame(
        [(0.0, 100_000.0, "small"), (100_000.0, 300_000.0, "medium"), (300_000.0, 1e9, "large")],
        "lo double, hi double, band string",
    )
    j = o.join(
        F.broadcast(bands), (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi"))
    )
    return j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(24,6)")), 2).cast("double").alias("sum_price"),
    )


SQL_RANGE_JOIN = """
WITH bands(lo, hi, band) AS (VALUES (0.0, 100000.0, 'small'), (100000.0, 300000.0, 'medium'), (300000.0, 1e9, 'large'))
SELECT band, count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_price
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
"""


# -- qid: percentiles -------------------------------------------------

def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) per group — the
    order-statistics path (full sort within group), vs
    approx_percentile's sketch path for 100 TB (not oracle-comparable,
    exercised in tests)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.min("o_totalprice"), 4).alias("pmin"),
        F.round(F.max("o_totalprice"), 4).alias("pmax"),
    )


SQL_PERCENTILES = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(min(o_totalprice), 4) AS pmin,
       round(max(o_totalprice), 4) AS pmax
FROM orders GROUP BY o_orderstatus
"""


# -- qid: stats_moments -----------------------------------------------

def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population variance/stddev and Pearson correlation from
    decimal power sums — identical bits in any engine and any
    aggregation tree (the native stddev/corr accumulators are
    float-order-dependent)."""
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(24,6)")
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(dec("l_quantity")).cast("double")
    sy = F.sum(dec("l_extendedprice")).cast("double")
    sxx = F.sum((dec("l_quantity") * dec("l_quantity")).cast("decimal(30,6)")).cast("double")
    syy = F.sum((dec("l_extendedprice") * dec("l_extendedprice")).cast("decimal(30,6)")).cast("double")
    sxy = F.sum((dec("l_quantity") * dec("l_extendedprice")).cast("decimal(30,6)")).cast("double")
    var_x = (sxx - sx * sx / n) / n
    var_y = (syy - sy * sy / n) / n
    corr = (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    return li.groupBy("l_returnflag").agg(
        n.cast("long").alias("n"),
        F.round(var_x, 4).alias("var_qty"),
        F.round(F.sqrt(var_y), 4).alias("std_price"),
        F.round(corr, 6).alias("corr_qty_price"),
    )


SQL_STATS_MOMENTS = """
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       round((sxx - sx * sx / n) / n, 4) AS var_qty,
       round(sqrt((syy - sy * sy / n) / n), 4) AS std_price,
       round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price
FROM (
  SELECT l_returnflag,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(24,6)) * CAST(l_quantity AS DECIMAL(24,6)) AS DECIMAL(30,6))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(24,6)) * CAST(l_extendedprice AS DECIMAL(24,6)) AS DECIMAL(30,6))) AS DOUBLE) AS syy,
         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(24,6)) * CAST(l_extendedprice AS DECIMAL(24,6)) AS DECIMAL(30,6))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
"""


# -- qid: grouping_sets (SQL API surface) -----------------------------

def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


SQL_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# -- qid: math_funcs (IEEE-exact scalar math only) --------------------

def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/ceil/floor/sqrt/x² — all IEEE-correctly-rounded, so raw
    doubles compare bit-identically (transcendentals like ln/exp are
    libm-dependent and deliberately excluded from the oracle set)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.abs(p - 250_000).alias("abs_dev"),
        F.ceil(p).alias("ceil_price"),
        F.floor(p / 1000).alias("floor_k"),
        F.sqrt(p).alias("sqrt_price"),
        (p * p).alias("price_sq"),
        F.greatest(p, F.lit(200_000.0)).alias("floored_price"),
        F.pmod(F.col("o_orderkey"), F.lit(97)).alias("key_mod"),
    )


SQL_MATH_FUNCS = """
SELECT o_orderkey,
       abs(o_totalprice - 250000) AS abs_dev,
       CAST(ceil(o_totalprice) AS BIGINT) AS ceil_price,
       CAST(floor(o_totalprice / 1000) AS BIGINT) AS floor_k,
       sqrt(o_totalprice) AS sqrt_price,
       o_totalprice * o_totalprice AS price_sq,
       greatest(o_totalprice, 200000.0) AS floored_price,
       o_orderkey % 97 AS key_mod
FROM orders WHERE o_orderkey % 7 = 0
"""


# -- qid: date_parts --------------------------------------------------

def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mon"),
        F.dayofmonth(d).alias("dom"),
        F.dayofweek(d).alias("dow"),  # 1=Sunday..7=Saturday
        F.date_add(d.cast("date"), 90).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")).alias("age_days"),
        F.last_day(d).alias("month_end"),
    )


SQL_DATE_PARTS = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(month(o_orderdate) AS INT) AS mon,
       CAST(dayofmonth(o_orderdate) AS INT) AS dom,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
       CAST(o_orderdate AS DATE) + 90 AS due_date,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS age_days,
       last_day(CAST(o_orderdate AS DATE)) AS month_end
FROM orders WHERE o_orderkey % 11 = 0
"""


# -- qid: feature_bins (equi-depth binning, ntile) --------------------

def q_feature_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) binning of a numeric feature — the ML
    feature-prep step that turns a skewed continuous column into
    balanced categorical buckets. ntile(10) over a TOTAL order (price
    with orderkey tiebreak, so bin boundaries are deterministic across
    engines and runs); one bin summary row each.

    Scale note: ntile needs a total order — a single-partition sort at
    the extreme. For 100 TB binning use approx_quantiles' sketch cut
    points + a map-only bucket assignment instead; this operator is
    the exact small/medium-cardinality path.

    NULL contract (fuzz find, tools/fuzz_parity.py nulls profile): a
    NULL feature value has no quantile — rows are excluded explicitly
    on both sides rather than letting each engine's null sort order
    pick a bin for them (Spark would put them in bin 1, DuckDB in bin
    10)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    w = Window.orderBy("o_totalprice", "o_orderkey")
    binned = o.select(
        "o_totalprice", F.ntile(10).over(w).alias("bin")
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


SQL_FEATURE_BINS = """
SELECT bin, count(*) AS n,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM (
  SELECT o_totalprice, ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
  FROM orders WHERE o_totalprice IS NOT NULL
)
GROUP BY bin
"""


# -- qid: feature_bins_sketch (the 100 TB binning path) ---------------

def q_feature_bins_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth binning WITHOUT a total order — the scale path the
    exact ``feature_bins`` docstring promises: percentile_approx cut
    points (one pass, mergeable sketch state), collected to the driver
    (9 doubles — control plane), then a MAP-ONLY bucket assignment.
    No sort, no single-partition stage; at 100 TB this is one scan +
    one k-row aggregation.

    Sketch cut points are engine-specific, so the oracle uses the
    accuracy-gated pattern (timeseries_queries module docstring): the
    hash-compared payload is per-bin (bin id, total row count — exact
    conservation check) plus a flag that the bin's share lands within
    ±2% of the ideal decile (rank error ≤1e-4 at accuracy=10000, so
    the flag is guaranteed unless the sketch breaks).

    Same NULL contract as feature_bins: null feature values are
    excluded explicitly — the sketch ignores them anyway, and the
    map-only assignment would otherwise silently dump them into bin 1
    (fuzz find, tools/fuzz_parity.py nulls profile)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    cuts = o.select(
        F.expr(
            "percentile_approx(o_totalprice, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9), 10000)"
        ).alias("c")
    ).collect()[0]["c"]
    bin_col = sum(
        (F.when(F.col("o_totalprice") > F.lit(float(c)), 1).otherwise(0) for c in cuts),
        F.lit(1),
    )
    n_total = o.count()
    per = o.select(bin_col.alias("bin")).groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
    ok = (F.abs(F.col("n") - F.lit(n_total) / 10) <= F.lit(n_total) * 0.02).cast("int")
    return per.select(
        "bin",
        F.lit(n_total).cast("long").alias("n_total"),
        ok.alias("share_within_2pct"),
    )


SQL_FEATURE_BINS_SKETCH = """
SELECT CAST(b AS INT) AS bin,
       (SELECT count(*) FROM orders WHERE o_totalprice IS NOT NULL) AS n_total,
       CAST(1 AS INT) AS share_within_2pct
FROM (SELECT unnest(generate_series(1, 10)) AS b)
"""


QUERIES = {
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "percentiles": q_percentiles,
    "stats_moments": q_stats_moments,
    "grouping_sets": q_grouping_sets,
    "math_funcs": q_math_funcs,
    "date_parts": q_date_parts,
    "feature_bins": q_feature_bins,
    "feature_bins_sketch": q_feature_bins_sketch,
}

ORACLE_SQL = {
    "asof_join": SQL_ASOF,
    "range_join": SQL_RANGE_JOIN,
    "percentiles": SQL_PERCENTILES,
    "stats_moments": SQL_STATS_MOMENTS,
    "grouping_sets": SQL_GROUPING_SETS,
    "math_funcs": SQL_MATH_FUNCS,
    "date_parts": SQL_DATE_PARTS,
    "feature_bins": SQL_FEATURE_BINS,
    "feature_bins_sketch": SQL_FEATURE_BINS_SKETCH,
}


# -- qid: weighted_median ----------------------------------------------

def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median price per return flag, weighted by
    quantity — the volume-weighted order statistic (e.g. the price at
    which half the shipped units were cheaper) that plain
    percentile() cannot express. No engine has a weighted-median
    aggregate, so both sides compute the definition itself: order
    values, accumulate weights, take the first value whose cumulative
    weight reaches half the total (the lower weighted median).

    Determinism contract: prices quantize to integer cents and
    weights to integer units BEFORE anything else, the cumulative
    order is by cents alone (unique after the histogram fold), and
    the threshold test is integer (2*cum >= total) — no doubles
    anywhere until the final cents/100 emission.

    Scale: the partition key has only 3 distinct values, so a
    row-level cumulative window would sort 1/3 of lineitem in each of
    3 tasks — a hard parallelism ceiling that grows with SF. Instead
    the weight mass is pre-aggregated into a (flag, cents)
    value-frequency histogram (combinable, map-side partial — the
    spearman_corr idiom): the cumulative window's input is bounded by
    the integer-cents DOMAIN (measured 10.4M values in this data —
    round(l_extendedprice*100) spans [90_068, 10_499_991]), not by
    SF. Honest caveat: below ~sf1 cents are near-unique
    (sf0.1: 583k distinct / 600k rows) so shuffle_records doesn't
    visibly drop yet; the bound bites exactly where it matters — at
    100 TB the window sorts <=10.4M histogram rows per flag instead
    of hundreds of billions of raw rows, and the raw table never
    shuffles on the 3-value key at any SF. The result is identical
    because the row-level cumulative at the last row of a cents group
    equals the histogram cumulative at that cents, and min(cents)
    over qualifying rows only ever selects group boundaries.
    """
    from pyspark.sql import Window

    # NULL contract (fuzz find, tools/fuzz_parity.py nulls profile): a
    # NULL price cannot take a place in the value order (each engine
    # would pick its own NULLS FIRST/LAST side) and a NULL quantity
    # carries no weight — both are excluded EXPLICITLY on both sides
    # instead of leaking engine null-ordering into the median.
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_extendedprice").isNotNull() & F.col("l_quantity").isNotNull()
        )
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
            F.col("l_quantity").cast("long").alias("w"),
        )
    )
    hist = li.groupBy("l_returnflag", "cents").agg(F.sum("w").alias("hw"))
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "cents",
        F.sum("hw").over(wcum).alias("cum_w"),
        F.sum("hw").over(wtot).alias("tot_w"),
    )
    qual = cum.filter(F.lit(2) * F.col("cum_w") >= F.col("tot_w"))
    return qual.groupBy("l_returnflag").agg(
        (F.min("cents") / F.lit(100.0)).alias("weighted_median_price"),
        F.max("tot_w").alias("total_weight"),
    )


SQL_WEIGHTED_MEDIAN = """
WITH li AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
),
hist AS (
  SELECT l_returnflag, cents, sum(w) AS hw
  FROM li GROUP BY l_returnflag, cents
),
cum AS (
  SELECT l_returnflag, cents,
         sum(hw) OVER (PARTITION BY l_returnflag
                       ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_w,
         sum(hw) OVER (PARTITION BY l_returnflag) AS tot_w
  FROM hist
)
SELECT l_returnflag,
       CAST(min(cents) AS DOUBLE) / CAST(100.0 AS DOUBLE)
         AS weighted_median_price,
       CAST(max(tot_w) AS BIGINT) AS total_weight
FROM cum
WHERE 2 * cum_w >= tot_w
GROUP BY l_returnflag
"""

QUERIES["weighted_median"] = q_weighted_median
ORACLE_SQL["weighted_median"] = SQL_WEIGHTED_MEDIAN
