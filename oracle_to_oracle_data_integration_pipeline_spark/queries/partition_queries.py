"""Partitioned-layout queries: hive-style partitioned writes, partition
pruning at read, plus full-outer join and range window frames.

Partition pruning is THE 100 TB lever: a year/month-partitioned fact
table turns a time-range query into a directory listing — files outside
the range are never opened. The qid writes orders partitioned by year
to a temp dir, reads back with a year filter, and the plan test pins
``PartitionFilters`` being applied.
"""

from __future__ import annotations

import atexit
import hashlib
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import dsum, load, tune


_PART_DIR_CACHE: dict[tuple[int, str], str] = {}


def partitioned_orders_dir(spark: SparkSession, sf_dir: str) -> str:
    """Write orders hive-partitioned by order year, once per
    (session, sf_dir). A module-level dict — NOT SparkContext local
    properties, which are thread-local and leak into scheduler job
    properties."""
    key = (id(spark), sf_dir)
    if key in _PART_DIR_CACHE:
        return _PART_DIR_CACHE[key]
    out = tempfile.mkdtemp(prefix="orders_by_year_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    o = load(spark, sf_dir, "orders").withColumn("o_year", F.year("o_orderdate"))
    o.write.mode("overwrite").partitionBy("o_year").parquet(out)
    _PART_DIR_CACHE[key] = out
    return out


# -- qid: partitioned_scan --------------------------------------------

def q_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the partitioned layout with a partition-key filter: only
    the 1997/1998 directories are listed and scanned."""
    tune(spark)
    path = partitioned_orders_dir(spark, sf_dir)
    o = spark.read.parquet(path)
    return (
        o.filter(F.col("o_year").isin(1997, 1998))
        .groupBy("o_year", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum(F.col("o_totalprice")).alias("sum_price"))
        .withColumn("o_year", F.col("o_year").cast("int"))
    )


SQL_PARTITIONED_SCAN = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderstatus,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_price
FROM orders
WHERE year(o_orderdate) IN (1997, 1998)
GROUP BY 1, 2
"""


# -- qid: join_outer --------------------------------------------------

def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: per-nation customer counts vs supplier counts
    (nations can lack suppliers in the fixture)."""
    c = load(spark, sf_dir, "customer").groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_cust"))
    s = load(spark, sf_dir, "supplier").groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("n_supp"))
    j = c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
    return j.select(
        F.coalesce(F.col("c_nationkey"), F.col("s_nationkey")).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


SQL_JOIN_OUTER = """
SELECT coalesce(c.k, s.k) AS nationkey,
       coalesce(c.n_cust, 0) AS n_cust,
       coalesce(s.n_supp, 0) AS n_supp
FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
FULL OUTER JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
ON c.k = s.k
"""


# -- qid: window_range_frame ------------------------------------------

def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): count of a customer's
    own orders within ±50000 of each order's price (round 7: re-keyed
    from o_orderstatus — a 3-value key put 1/3 of orders in each of 3
    window tasks, the low-cardinality hazard tools/window_audit.py
    matcher 3 now flags; o_custkey scales with SF)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 37 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-50_000, 50_000)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_near_price"),
    )


SQL_WINDOW_RANGE_FRAME = """
SELECT o_orderkey, o_custkey,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 50000 PRECEDING AND 50000 FOLLOWING) AS n_near_price
FROM orders WHERE o_orderkey % 37 = 0
"""


# -- qid: window_time_range (trailing-interval frame over event time) -

def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue per customer order — the time-interval
    RANGE frame (Spark's rangeBetween is numeric-only, so the frame
    rides epoch seconds; the session timezone is pinned UTC). Frame
    sums go through the decimal path: RANGE frames include peer rows,
    and double summation order over ties differs between engines."""
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import epoch_seconds

    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 11 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch_seconds(F.col("o_orderdate")))
        .rangeBetween(-7 * 86400, 0)
    )
    rev = F.round(F.sum(F.col("o_totalprice").cast("decimal(24,6)")).over(w), 2)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        rev.cast("double").alias("rev_7d"),
    )


SQL_WINDOW_TIME_RANGE = """
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(24,6))) OVER (
         PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS rev_7d
FROM orders WHERE o_custkey % 11 = 0
"""


# -- qid: salted_join (skew-proof equi-join, same result set) ---------

def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order status through the salted join operator
    (operators/scale.salted_join): the skewed fact side spreads each
    hot key over 8 (key, salt) reducers; the small side explodes ×8.
    Semantics are byte-identical to the plain join — which is exactly
    what the oracle checks.
    """
    from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import salted_join

    # project BEFORE salting: the salt hash references its columns, so
    # salting the full 16-column fact table would block scan pruning
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    # strategy opted in EXPLICITLY (the operator default is planner
    # choice, ADVICE round 10): orders×8 is mid-size — too big to want
    # a driver-serialized broadcast, small enough per partition for a
    # shuffled-hash build (guide §3.1; round 10 measured broadcast ~3×
    # slower here because it defeats the salt)
    joined = salted_join(
        li, o, key="l_orderkey", salt_buckets=8,
        salt_cols=["l_orderkey", "l_linenumber"],
        strategy="shuffle_hash",
    )
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )


SQL_SALTED_JOIN = """
SELECT o_orderstatus, count(*) AS n_lines,
       CAST(round(sum(CAST((CASE WHEN (l_extendedprice * (1 - l_discount)) < 0 THEN -floor(-(l_extendedprice * (1 - l_discount))*1e6 + 0.5) ELSE floor((l_extendedprice * (1 - l_discount))*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# -- qid: skew_profile (per-key distribution diagnostics) -------------

def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-per-key distribution of lineitem on l_orderkey — the
    pre-flight stats a 100 TB deployment reads before picking
    broadcast/salt/AQE-skew strategies (operators/scale.skew_profile)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import skew_profile

    return skew_profile(load(spark, sf_dir, "lineitem").select("l_orderkey"), "l_orderkey")


SQL_SKEW_PROFILE = """
WITH c AS (SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey)
SELECT count(*) AS n_keys,
       CAST(sum(n) AS BIGINT) AS n_rows,
       max(n) AS max_per_key,
       floor(avg(n) * 1000000.0 + 0.5) / 1000000.0 AS avg_per_key,
       floor(quantile_cont(n, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS p50_per_key,
       floor(quantile_cont(n, 0.99) * 1000000.0 + 0.5) / 1000000.0 AS p99_per_key,
       floor((max(n) / avg(n)) * 1000000.0 + 0.5) / 1000000.0 AS skew_ratio
FROM c
"""


# -- qid: zorder_cluster (Morton-key multi-dim locality) --------------

ZBITS = 16


def q_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order bucket locality summary: quantize (l_orderkey,
    l_partkey) to 16 bits each against global min/max (one-row
    broadcast stats), Morton-interleave, bucket on the top 4 z-bits,
    and report each bucket's row count and min/max envelope on BOTH
    dimensions — the per-file footer stats a zorder-clustered write
    would produce (operators/scale.zorder_key). Narrow envelopes on
    both columns are what make two-column predicates skip files."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import with_zorder_key

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    keyed = with_zorder_key(li, ["l_orderkey", "l_partkey"], ZBITS)
    return (
        keyed.select(
            F.shiftright(F.col("__z"), 2 * ZBITS - 4).alias("bucket"),
            "l_orderkey",
            "l_partkey",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_orderkey").alias("x_min"), F.max("l_orderkey").alias("x_max"),
            F.min("l_partkey").alias("y_min"), F.max("l_partkey").alias("y_max"),
        )
    )


def _zorder_sql() -> str:
    terms = []
    for i in range(ZBITS):
        terms.append(f"(((qx >> {i}) & 1) << {2 * i})")
        terms.append(f"(((qy >> {i}) & 1) << {2 * i + 1})")
    zexpr = " + ".join(terms)
    m = (1 << ZBITS) - 1
    return f"""
WITH s AS (
  SELECT min(l_orderkey) AS minx, max(l_orderkey) AS maxx,
         min(l_partkey) AS miny, max(l_partkey) AS maxy
  FROM lineitem
),
q AS (
  SELECT l_orderkey, l_partkey,
         CASE WHEN maxx > minx
              THEN CAST(floor((l_orderkey - minx) * {m} / CAST(maxx - minx AS DOUBLE)) AS BIGINT)
              ELSE 0 END AS qx,
         CASE WHEN maxy > miny
              THEN CAST(floor((l_partkey - miny) * {m} / CAST(maxy - miny AS DOUBLE)) AS BIGINT)
              ELSE 0 END AS qy
  FROM lineitem, s
),
z AS (SELECT l_orderkey, l_partkey, ({zexpr}) AS zv FROM q)
SELECT zv >> {2 * ZBITS - 4} AS bucket, count(*) AS n_rows,
       min(l_orderkey) AS x_min, max(l_orderkey) AS x_max,
       min(l_partkey) AS y_min, max(l_partkey) AS y_max
FROM z GROUP BY bucket
"""


SQL_ZORDER_CLUSTER = _zorder_sql()


# -- qid: bucketed_join -----------------------------------------------

_BKT_CACHE: dict[tuple[int, str], bool] = {}
BKT_BUCKETS = 8


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders and lineitem as BUCKETED tables (8 buckets on the
    order key each), once per (session, sf_dir). Bucketing is the
    ahead-of-time co-location contract: both tables' files are already
    hash-partitioned by the join key ON DISK, so every future join on
    that key starts from compatible partitioning and the exchange
    disappears — at 100 TB this converts the recurring fact-to-fact
    shuffle (the single most expensive stage of a star-join pipeline)
    into a one-time write-side cost, amortized over every downstream
    run. Tables live in temp LOCATIONs (nothing persists in
    spark-warehouse) under this session's in-memory catalog.

    The table NAMES carry an sf_dir-derived suffix so the cache key
    and the catalog content can never disagree: with fixed names, a
    second sf_dir would overwrite the tables while the first sf_dir's
    cache entry still said "built" — and silently serve the wrong
    dataset. Returns the (orders, lineitem) table names."""
    suffix = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    names = (f"o2o_bkt_orders_{suffix}", f"o2o_bkt_lineitem_{suffix}")
    key = (id(spark), sf_dir)
    if key in _BKT_CACHE:
        return names
    for tbl, src, col in (
        (names[0], "orders", "o_orderkey"),
        (names[1], "lineitem", "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        loc = tempfile.mkdtemp(prefix=f"{tbl}_")
        atexit.register(shutil.rmtree, loc, ignore_errors=True)
        (
            load(spark, sf_dir, src)
            .write.mode("overwrite")
            .bucketBy(BKT_BUCKETS, col)
            .sortBy(col)
            .option("path", loc)
            .saveAsTable(tbl)
        )
    _BKT_CACHE[key] = True
    return names


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-exchange fact-to-fact join off bucketed layouts: orders ⋈
    lineitem on the order key with BOTH sides bucketed by it — NO
    Exchange feeds the SortMergeJoin (each of the 8 bucket pairs joins
    independently); the ONLY exchange in the plan is the compact
    re-aggregation on o_orderpriority, a different key (pinned by
    tests/test_plans.py::test_bucketed_join_no_join_exchange). The
    merge hint keeps the small fixture off the broadcast path so the
    plan under test is the one a 100 TB fact pair would get."""
    tune(spark)
    t_orders, t_lineitem = _bucketed_tables(spark, sf_dir)
    o = spark.table(t_orders)
    l = spark.table(t_lineitem)
    j = o.hint("merge").join(
        l, o["o_orderkey"] == l["l_orderkey"], "inner"
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice")).alias("sum_price"),
        )
    )


SQL_BUCKETED_JOIN = """
SELECT o_orderpriority,
       count(*) AS n_lines,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(24,6))), 2) AS DOUBLE)
         AS sum_price
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


# -- qid: grouped_topk -------------------------------------------------

GT_K = 5
GT_SALTS = 8


def q_grouped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe per-group top-k: top-5 documents by n_chars per lang
    via the two-phase salted decomposition (operators/scale.
    grouped_topk_salted). lang is the engine's hottest grouping key
    (a handful of values over the whole corpus) — exactly the shape
    where a single rank window straggles at scale. The result is
    salt-invariant and equals the direct single-window form, which is
    what the oracle computes."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import grouped_topk_salted

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return grouped_topk_salted(
        d, group_col="lang", order_col="n_chars", k=GT_K,
        id_col="doc_id", n_salts=GT_SALTS,
    )


SQL_GROUPED_TOPK = f"""
SELECT doc_id, lang, n_chars, CAST(rnk AS INT) AS group_rank
FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (
           PARTITION BY lang ORDER BY n_chars DESC, doc_id
         ) AS rnk
  FROM documents
)
WHERE rnk <= {GT_K}
"""


QUERIES = {
    "partitioned_scan": q_partitioned_scan,
    "bucketed_join": q_bucketed_join,
    "grouped_topk": q_grouped_topk,
    "join_outer": q_join_outer,
    "window_range_frame": q_window_range_frame,
    "window_time_range": q_window_time_range,
    "salted_join": q_salted_join,
    "skew_profile": q_skew_profile,
    "zorder_cluster": q_zorder_cluster,
}

ORACLE_SQL = {
    "partitioned_scan": SQL_PARTITIONED_SCAN,
    "bucketed_join": SQL_BUCKETED_JOIN,
    "grouped_topk": SQL_GROUPED_TOPK,
    "join_outer": SQL_JOIN_OUTER,
    "window_range_frame": SQL_WINDOW_RANGE_FRAME,
    "window_time_range": SQL_WINDOW_TIME_RANGE,
    "salted_join": SQL_SALTED_JOIN,
    "skew_profile": SQL_SKEW_PROFILE,
    "zorder_cluster": SQL_ZORDER_CLUSTER,
}
