"""Sixth breadth batch — the remaining classic TPC-H query shapes,
adapted to the fixture schema (no partsupp table exists, no
l_commitdate/l_receiptdate columns; Q2/Q9/Q11/Q16/Q20/Q21 use the
documented adaptations below, keeping each query's *plan shape* —
the joins, subqueries, and aggregation structure that exercise the
engine — intact).

Scale notes apply to every query here: dimension tables (region,
nation, supplier, customer, part at fixture ratios) are explicitly
broadcast, so the 100 TB fact side (lineitem/orders) never shuffles
for those joins; multi-key aggregations rely on map-side partial
aggregation; all double sums go through the exact DECIMAL(24,6) path
(queries/_util.dsum) so cluster partial-agg trees are
order-insensitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import dsum, load, pround


# -- qid: q7_volume_shipping (TPC-H Q7) -------------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue shipped between two nations, by direction and year.

    Plan: lineitem⋈orders (fact-fact, shuffle on orderkey) with both
    nation lookups broadcast; the symmetric nation-pair predicate is a
    residual filter on the broadcast joins.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(round(sum(CAST((CASE WHEN (l_extendedprice * (1 - l_discount)) < 0 THEN -floor(-(l_extendedprice * (1 - l_discount))*1e6 + 0.5) ELSE floor((l_extendedprice * (1 - l_discount))*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# -- qid: q8_market_share (TPC-H Q8) ----------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share of NATION_3 suppliers within EUROPE customers for
    ECONOMY parts, by order year: conditional-sum / total-sum ratio.

    The share division happens on doubles derived from exact decimal
    sums — bit-identical across engines regardless of plan.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)).cast("decimal(24,6)")).cast("double")
                / F.sum(vol.cast("decimal(24,6)")).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


SQL_Q8 = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(CAST(sum(CAST((CASE WHEN (CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) < 0 THEN -floor(-(CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)*1e6 + 0.5) ELSE floor((CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))) AS DOUBLE)
             / CAST(sum(CAST((CASE WHEN (l_extendedprice * (1 - l_discount)) < 0 THEN -floor(-(l_extendedprice * (1 - l_discount))*1e6 + 0.5) ELSE floor((l_extendedprice * (1 - l_discount))*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))) AS DOUBLE),
             6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
GROUP BY o_year
ORDER BY o_year
"""


# -- qid: q9_product_profit (TPC-H Q9 shape; no partsupp) -------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and year for parts matching a name
    pattern. Adaptation: the fixture schema has no partsupp, so
    supply cost is modeled as 60% of p_retailprice (same join/agg
    shape as TPC-H Q9: fact ⋈ part ⋈ supplier ⋈ nation ⋈ orders,
    multi-term profit expression, 2-key agg).
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    n = load(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


SQL_Q9 = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(round(sum(CAST((CASE WHEN (l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity) < 0 THEN -floor(-(l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity)*1e6 + 0.5) ELSE floor((l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity)*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
"""


# -- qid: q13_customer_distribution (TPC-H Q13) -----------------------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of orders-per-customer, counting customers with zero
    orders: left outer join with an extra join-side predicate, two
    stacked aggregations.

    Scale: the outer join shuffles on custkey; the second agg's domain
    (distinct order counts) is tiny, so the final shuffle is trivial.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


SQL_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# -- qid: q15_top_supplier (TPC-H Q15) --------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with maximum revenue in a quarter: revenue view +
    scalar-max subquery. The scalar max is a 1-row AGGREGATE broadcast
    back over the per-supplier revenues — not a window: an
    unpartitioned window max would funnel the whole (unbounded
    |suppliers|) revenue table through one partition, whereas the
    aggregate reduces tree-wise and the filter stays map-side.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_rev"))
    top = rev.crossJoin(F.broadcast(max_rev)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    return (
        top.join(s, top.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


SQL_Q15 = """
WITH revenue AS (
    SELECT l_suppkey,
           CAST(round(sum(CAST((CASE WHEN (l_extendedprice * (1 - l_discount)) < 0 THEN -floor(-(l_extendedprice * (1 - l_discount))*1e6 + 0.5) ELSE floor((l_extendedprice * (1 - l_discount))*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))), 2) AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# -- qid: q17_small_quantity (TPC-H Q17) ------------------------------

def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost if small-quantity orders (below 20%
    of the part's average quantity) were not taken: correlated scalar
    aggregate, decorrelated into a per-part aggregate + broadcast join.

    Cross-engine exactness: quantities are compared via the equivalent
    integer-domain predicate 5·qty·cnt < Σqty (multiplying both sides
    of qty < 0.2·Σqty/cnt by 5·cnt) evaluated in DECIMAL — no
    division, no representability edge.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum(F.col("l_quantity").cast("decimal(24,6)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_qty"),
    )
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("pp_key"))
        .filter(
            F.col("l_quantity").cast("decimal(24,6)") * F.col("cnt_qty") * F.lit(5)
            < F.col("sum_qty")
        )
    )
    return j.agg(
        (
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(24,6)")), 2).cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly")
    )


SQL_Q17 = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(24,6))), 2) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN (
    SELECT l_partkey AS pp_key,
           sum(CAST(l_quantity AS DECIMAL(24,6))) AS sum_qty,
           count(*) AS cnt_qty
    FROM lineitem GROUP BY l_partkey
) pq ON l_partkey = pp_key
WHERE p_brand = 'Brand#3'
  AND CAST(l_quantity AS DECIMAL(24,6)) * cnt_qty * 5 < sum_qty
"""


# -- qid: q18_large_orders (TPC-H Q18) --------------------------------

def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with orders totalling > 300 units: HAVING subquery as
    a semi-join against the grouped fact, then re-aggregation.

    Quantities are integers ≤ 50 — double sums are exact at any
    association order, so no decimal path is needed for the predicate
    or output.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select(F.col("l_orderkey").alias("big_okey"))
    )
    return (
        li.join(big, li.l_orderkey == F.col("big_okey"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


SQL_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum(l_quantity) AS sum_qty
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# -- qid: q21_waiting_suppliers (TPC-H Q21 shape; no receiptdate) -----

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the sole source of returned items in
    multi-supplier finalized orders. Adaptation: 'kept waiting' =
    l_returnflag = 'R' (the fixture has no commit/receipt dates); the
    plan shape — EXISTS (semi join) + NOT EXISTS (anti join) against
    differently-filtered self-scans of the fact — is Q21's.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    cand = (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("k2")) & (F.col("l1.l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("k3")) & (F.col("l1.l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return (
        cand.join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


SQL_Q21 = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


# -- qid: q2_min_cost_supplier (TPC-H Q2 shape; no partsupp) ----------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each small part, the supplier offering the minimum observed
    unit price. Adaptation: unit price = l_extendedprice / l_quantity
    from lineitem history (no partsupp); the correlated-min subquery
    shape of Q2 becomes a per-part window minimum with a deterministic
    suppkey tie-break.

    The output price rounds through the portable floor path (pround):
    plain round() diverges between engines when a price sits at the
    half-way point of the 4th decimal — a real flip surfaced at sf0.1.
    Ordering ties broken by s_suppkey.

    Lineitems with a NULL price or quantity — or a ZERO quantity —
    carry no observable unit price and are excluded explicitly: both
    engines evaluate double division by zero to NULL, so a qty-0 row
    re-creates the all-NULL offer AFTER the null filter, and that
    offer would win the min under Spark's ASC NULLS FIRST and lose it
    under DuckDB's NULLS LAST (fuzz finds: nulls profile for the NULL
    inputs, boundary profile for the zero-quantity division).
    """
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
        & F.col("l_quantity").isNotNull()
        & (F.col("l_quantity") != 0)
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    offer = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    )
    w = Window.partitionBy("p_partkey").orderBy(F.col("unit_price"), F.col("l_suppkey"))
    best = offer.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(s, best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("n_name").alias("supp_nation"),
            pround(F.col("unit_price"), 4).alias("unit_price_r"),
        )
        .orderBy("p_partkey")
    )


SQL_Q2 = """
WITH offer AS (
    SELECT p_partkey, p_name, l_suppkey,
           min(l_extendedprice / l_quantity) AS unit_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 5
      AND l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
      AND l_quantity <> 0
    GROUP BY p_partkey, p_name, l_suppkey
), best AS (
    SELECT *, row_number() OVER (PARTITION BY p_partkey ORDER BY unit_price, l_suppkey) AS rn
    FROM offer
)
SELECT p_partkey, p_name, s_name, n_name AS supp_nation,
       floor(unit_price * 10000.0 + 0.5) / 10000.0 AS unit_price_r
FROM best
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE rn = 1
ORDER BY p_partkey
"""


# -- qid: q11_important_parts (TPC-H Q11 shape; no partsupp) ----------

def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part/nation combinations whose traded value exceeds 3× the
    average group value: grouped value + scalar-stats subquery
    (broadcast 1-row cross join), HAVING on the ratio.

    The threshold is *relative* (vs TPC-H Q11's fixed fraction) so the
    selectivity is scale-free: at any SF the query returns the heavy
    tail above 3× mean, rather than degenerating to 0 or all rows.
    """
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    val = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    grouped = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "l_partkey")
        .agg(F.sum(val.cast("decimal(24,6)")).alias("value_d"))
    )
    stats = grouped.agg(
        (F.sum("value_d").cast("double") / F.count(F.lit(1))).alias("avg_value")
    )
    return (
        grouped.join(F.broadcast(stats))
        .filter(F.col("value_d").cast("double") > F.col("avg_value") * 3.0)
        .select(
            "n_name",
            "l_partkey",
            F.round(F.col("value_d"), 2).cast("double").alias("value"),
        )
        .orderBy(F.col("value").desc(), F.col("n_name"), F.col("l_partkey"))
    )


SQL_Q11 = """
WITH grouped AS (
    SELECT n_name, l_partkey,
           sum(CAST((CASE WHEN (l_extendedprice * (1 - l_discount)) < 0 THEN -floor(-(l_extendedprice * (1 - l_discount))*1e6 + 0.5) ELSE floor((l_extendedprice * (1 - l_discount))*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))) AS value_d
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name, l_partkey
), stats AS (
    SELECT CAST(sum(value_d) AS DOUBLE) / count(*) AS avg_value FROM grouped
)
SELECT n_name, l_partkey, CAST(round(value_d, 2) AS DOUBLE) AS value
FROM grouped, stats
WHERE CAST(value_d AS DOUBLE) > avg_value * 3.0
ORDER BY value DESC, n_name, l_partkey
"""


# -- qid: q16_supplier_counts (TPC-H Q16 shape; no partsupp) ----------

def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier count per part attribute group, with brand /
    type exclusions and a NOT-IN supplier blocklist (anti join).
    Adaptation: supplier-part relationships come from lineitem; the
    'complaints' blocklist is suppliers with negative account balance.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (~F.col("p_type").like("PROMO%"))
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_key"))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(bad, li.l_suppkey == F.col("bad_key"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(40)
    )


SQL_Q16 = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 40
"""


# -- qid: q20_excess_shippers (TPC-H Q20 shape; no partsupp) ----------

def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers shipping more than 3× their fair share of a tracked
    part's volume (share > 3 · total/n_suppliers for that part):
    per-(supplier, part) sums compared against per-part window totals,
    then a semi join back to supplier. The fair-share threshold is
    scale-free — a fixed fraction (TPC-H Q20 uses 50%) degenerates to
    zero rows as supplier counts grow with SF.

    Exactness: quantities are small integers and supplier counts are
    ints — sp_qty·n_sup and 3·part_qty are exact in double, so the
    predicate is engine-independent.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    s = load(spark, sf_dir, "supplier")
    per_sp = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    heavy = (
        per_sp.withColumn("part_qty", F.sum("sp_qty").over(w))
        .withColumn("n_sup", F.count(F.lit(1)).over(w))
        .filter(F.col("sp_qty") * F.col("n_sup") > F.col("part_qty") * 3.0)
        .select(F.col("l_suppkey").alias("heavy_key"))
        .distinct()
    )
    return (
        s.join(heavy, s.s_suppkey == F.col("heavy_key"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


SQL_Q20 = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
    WITH per_sp AS (
        SELECT l_suppkey, l_partkey, sum(l_quantity) AS sp_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE '%blue%'
        GROUP BY l_suppkey, l_partkey
    )
    SELECT l_suppkey
    FROM (SELECT l_suppkey, sp_qty,
                 sum(sp_qty)  OVER (PARTITION BY l_partkey) AS part_qty,
                 count(*)     OVER (PARTITION BY l_partkey) AS n_sup
          FROM per_sp) t
    WHERE sp_qty * n_sup > part_qty * 3.0
)
ORDER BY s_suppkey
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_counts": q16_supplier_counts,
    "q17_small_quantity": q17_small_quantity,
    "q18_large_orders": q18_large_orders,
    "q20_excess_shippers": q20_excess_shippers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
}

ORACLE_SQL = {
    "q2_min_cost_supplier": SQL_Q2,
    "q7_volume_shipping": SQL_Q7,
    "q8_market_share": SQL_Q8,
    "q9_product_profit": SQL_Q9,
    "q11_important_parts": SQL_Q11,
    "q13_customer_distribution": SQL_Q13,
    "q15_top_supplier": SQL_Q15,
    "q16_supplier_counts": SQL_Q16,
    "q17_small_quantity": SQL_Q17,
    "q18_large_orders": SQL_Q18,
    "q20_excess_shippers": SQL_Q20,
    "q21_waiting_suppliers": SQL_Q21,
}
