"""Relational operator breadth: aggregations, joins, windows, set ops,
scalar/JSON/date functions (SURVEY.md §2.4-§2.8 "absent in reference"
categories — the engine's native operator surface).

Every query is declarative DataFrame/SQL so Catalyst owns the physical
plan. Scale design notes per query in docstrings. Broadcast policy
(round 7, tools/broadcast_audit.py): only SF-CONSTANT sides (region,
nation, 1-row bounds) carry explicit broadcast() hints — a hint is a
promise the side never grows. SF-growing dims (customer, supplier,
part) are hint-free: the stats-based planner broadcasts them at
fixture scale (plan gates unchanged) and demotes them to shuffles at
the scale where a forced broadcast would OOM executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import davg, dsum, load


# -- qid: q1_pricing_summary (flagship; TPC-H Q1 shape) ---------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → filter → 2-key hash agg with 8 aggregates.

    Scale: map-side partial aggregation collapses 100 TB of lineitem to
    4 groups per partition before the (tiny) shuffle; the shipdate filter
    and 7-column projection push into the parquet scan.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST((CASE WHEN (l_extendedprice * (1 - l_discount)) < 0 THEN -floor(-(l_extendedprice * (1 - l_discount))*1e6 + 0.5) ELSE floor((l_extendedprice * (1 - l_discount))*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST((CASE WHEN (l_extendedprice * (1 - l_discount) * (1 + l_tax)) < 0 THEN -floor(-(l_extendedprice * (1 - l_discount) * (1 + l_tax))*1e6 + 0.5) ELSE floor((l_extendedprice * (1 - l_discount) * (1 + l_tax))*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) / count(l_quantity), 6) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) / count(l_extendedprice), 6) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(24,6))) AS DOUBLE) / count(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# -- qid: q3_shipping_priority (join + agg; TPC-H Q3 shape) -----------

def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem with selective filters.

    Scale: customer (filtered on segment) joins hint-free — stats
    broadcast it at fixture scale, AQE re-decides when it outgrows
    the threshold; orders ⋈ lineitem is the one real shuffle, on
    l_orderkey — both sides filter before the join so AQE sizes the
    exchange from post-filter stats.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp"))
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


SQL_Q3 = """
SELECT o_orderkey,
       CAST(round(sum(CAST((CASE WHEN (l_extendedprice * (1 - l_discount)) < 0 THEN -floor(-(l_extendedprice * (1 - l_discount))*1e6 + 0.5) ELSE floor((l_extendedprice * (1 - l_discount))*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))), 2) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15'
  AND l_shipdate  > TIMESTAMP '1997-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
"""


# -- qid: q5_local_supplier (multi-join star; TPC-H Q5 shape) ---------

def q_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table star join.

    Scale: region/nation are SF-CONSTANT dims → hinted broadcast (a
    hint is a promise the side never grows — safe only for true
    constants). supplier/customer GROW with SF, so they carry NO hint
    (round 7, tools/broadcast_audit.py find): at fixture scale the
    stats-based planner still broadcasts them (plan gate unchanged —
    5 BroadcastHashJoin), and at 100 TB stats/AQE demote exactly
    these two joins to shuffles instead of OOMing every executor on a
    forced 1.5 B-row customer broadcast. The only always-large
    shuffle is lineitem ⋈ orders on orderkey. Join order written
    fact-first; Catalyst/AQE reorder freely.
    """
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


SQL_Q5 = """
SELECT n_name,
       CAST(round(sum(CAST((CASE WHEN (l_extendedprice * (1 - l_discount)) < 0 THEN -floor(-(l_extendedprice * (1 - l_discount))*1e6 + 0.5) ELSE floor((l_extendedprice * (1 - l_discount))*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))), 2) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# -- qid: agg_rollup --------------------------------------------------

def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum(F.col("c_acctbal")).alias("sum_acctbal"),
    )


SQL_ROLLUP = """
SELECT r_name, n_name, count(*) AS n_customers, CAST(round(sum(CAST(c_acctbal AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# -- qid: agg_cube ----------------------------------------------------

def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("sum_price"),
    )


SQL_CUBE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders, CAST(round(sum(CAST(o_totalprice AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# -- qid: distinct_agg ------------------------------------------------

def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand+two-phase in Spark)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


SQL_DISTINCT = """
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(DISTINCT o_orderpriority) AS n_priorities,
       count(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


# -- qid: window_topk -------------------------------------------------

def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment by price; rank shuffles once on
    the partition key. Deterministic tiebreak on o_orderkey."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    j = o.join(c, o.o_custkey == c.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "rnk", "o_orderkey", "o_totalprice")
    )


SQL_WINDOW_TOPK = """
SELECT c_mktsegment, rnk, o_orderkey, o_totalprice FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rnk <= 3
"""


# -- qid: window_running ----------------------------------------------

def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue + lag per customer — analytic frame windows.
    Cumulative sums add left-to-right in window order in both engines,
    so the doubles match bit-for-bit; rounded anyway.

    The oracle pins NULLS FIRST on the date sort key: Spark's ASC
    default is NULLS FIRST, DuckDB's is NULLS LAST, and an unpinned
    NULL order date would give the two engines different running
    prefixes (fuzz find, tools/fuzz_parity.py nulls profile)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias("running_total"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.row_number().over(w).alias("order_seq"),
    )


SQL_WINDOW_RUNNING = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate NULLS FIRST, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       lag(o_totalprice, 1) OVER w AS prev_price,
       row_number() OVER w AS order_seq
FROM orders WHERE o_custkey % 10 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
"""


# -- qid: join_semi / join_anti ---------------------------------------

def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS: orders having at least one late-shipped line. Semi join
    never duplicates and only ships the join key — at scale the probe
    side short-circuits on first match."""
    o = load(spark, sf_dir, "orders")
    late = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2001-06-01").cast("timestamp")
    )
    return o.join(late, o.o_orderkey == late.l_orderkey, "left_semi").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


SQL_JOIN_SEMI = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders WHERE EXISTS (
  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '2001-06-01'
)
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS: customers with no orders in the last fixture year
    (every customer has *some* order, so the anti join is filtered to
    stay non-vacuous)."""
    c = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return c.join(recent, c.c_custkey == recent.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


SQL_JOIN_ANTI = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01'
)
"""


# -- qid: set_ops -----------------------------------------------------

def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION in one labeled result."""
    c = load(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return (
        building.intersect(rich).withColumn("op", F.lit("both"))
        .unionByName(building.exceptAll(rich).withColumn("op", F.lit("building_only")))
        .unionByName(building.union(rich).distinct().withColumn("op", F.lit("either")))
        .select("op", "c_custkey")
    )


SQL_SET_OPS = """
SELECT 'both' AS op, c_custkey FROM
  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
   INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
UNION ALL
SELECT 'building_only', c_custkey FROM
  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
   EXCEPT ALL SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
UNION ALL
SELECT 'either', c_custkey FROM
  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
   UNION SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
"""


# -- qid: pivot_qty ---------------------------------------------------

def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(24,6)")), 2).cast("double"))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
    )


SQL_PIVOT = """
SELECT l_returnflag,
       CAST(round(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(24,6)) END), 2) AS DOUBLE) AS qty_open,
       CAST(round(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(24,6)) END), 2) AS DOUBLE) AS qty_filled
FROM lineitem GROUP BY l_returnflag
"""


# -- qid: json_extract ------------------------------------------------

def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction on events.props — JVM-side get_json_object,
    no UDF."""
    e = load(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.round(F.sum("k").cast("double") / F.count(F.lit(1)), 6).alias("avg_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# json_valid guard: Spark's get_json_object returns NULL on malformed
# JSON, DuckDB's ->> raises — the guard pins the oracle to Spark's
# null-on-malformed semantics (fuzz find, unicode profile; verified
# the guard also mirrors the '{"k": "12"}' string-number coercion)
SQL_JSON_EXTRACT = """
WITH e AS (
  SELECT event_type,
         CAST(CASE WHEN json_valid(props) THEN props ->> '$.k' END AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(sum(k) AS BIGINT) AS sum_k,
       round(CAST(sum(k) AS DOUBLE) / count(*), 6) AS avg_k,
       count(*) AS n
FROM e GROUP BY event_type
"""


# -- qid: date_buckets ------------------------------------------------

def q_date_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.withColumn("month", F.date_trunc("month", F.col("o_orderdate")))
        .groupBy("month")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum(F.col("o_totalprice")).alias("sum_price"))
    )


SQL_DATE_BUCKETS = """
SELECT date_trunc('month', o_orderdate) AS month,
       count(*) AS n_orders, CAST(round(sum(CAST(o_totalprice AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_price
FROM orders GROUP BY 1
"""


# -- qid: string_funcs ------------------------------------------------

def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").like("PRO%") | F.col("p_type").like("%DARD"))
        .select(
            "p_partkey",
            F.upper(F.col("p_brand")).alias("brand_upper"),
            F.substring(F.col("p_type"), 1, 6).alias("type_prefix"),
            F.length(F.col("p_name")).alias("name_len"),
            F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        )
    )


SQL_STRING_FUNCS = """
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       substring(p_type, 1, 6) AS type_prefix,
       CAST(length(p_name) AS INT) AS name_len,
       concat_ws('|', p_brand, p_type) AS brand_type
FROM part
WHERE p_type LIKE 'PRO%' OR p_type LIKE '%DARD'
"""


# -- qid: array_math --------------------------------------------------

def q_array_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array expression math on embeddings — F.aggregate/F.transform,
    JVM-side (no UDF). Double-cast before multiply so both engines do
    identical float64 arithmetic left-to-right."""
    e = load(spark, sf_dir, "embeddings")
    sq = F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double"))
    ssum = F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(ssum), 6).alias("l2_norm"),
        F.round(F.aggregate(F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x.cast("double")), 6).alias("vec_sum"),
    )


SQL_ARRAY_MATH = """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm,
       round(list_sum(CAST(embedding AS DOUBLE[])), 6) AS vec_sum
FROM embeddings
"""


QUERIES = {
    "q1_pricing_summary": q_pricing_summary,
    "q3_shipping_priority": q_shipping_priority,
    "q5_local_supplier": q_local_supplier,
    "agg_rollup": q_agg_rollup,
    "agg_cube": q_agg_cube,
    "distinct_agg": q_distinct_agg,
    "window_topk": q_window_topk,
    "window_running": q_window_running,
    "join_semi": q_join_semi,
    "join_anti": q_join_anti,
    "set_ops": q_set_ops,
    "pivot_qty": q_pivot,
    "json_extract": q_json_extract,
    "date_buckets": q_date_buckets,
    "string_funcs": q_string_funcs,
    "array_math": q_array_math,
}

ORACLE_SQL = {
    "q1_pricing_summary": SQL_PRICING,
    "q3_shipping_priority": SQL_Q3,
    "q5_local_supplier": SQL_Q5,
    "agg_rollup": SQL_ROLLUP,
    "agg_cube": SQL_CUBE,
    "distinct_agg": SQL_DISTINCT,
    "window_topk": SQL_WINDOW_TOPK,
    "window_running": SQL_WINDOW_RUNNING,
    "join_semi": SQL_JOIN_SEMI,
    "join_anti": SQL_JOIN_ANTI,
    "set_ops": SQL_SET_OPS,
    "pivot_qty": SQL_PIVOT,
    "json_extract": SQL_JSON_EXTRACT,
    "date_buckets": SQL_DATE_BUCKETS,
    "string_funcs": SQL_STRING_FUNCS,
    "array_math": SQL_ARRAY_MATH,
}
