"""Fourth breadth batch — classic TPC-H query shapes adapted to the
fixture schema: returned-customer ranking (Q10), conditional
aggregation (Q12 shape), promo revenue share (Q14), disjunctive
multi-predicate join (Q19 shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import dsum, load


# -- qid: q10_returned_customers --------------------------------------

def q10_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 customers by revenue of returned items. Deterministic
    top-k: decimal-sum revenue (exact → identical ordering in both
    engines) with custkey tiebreak."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


SQL_Q10 = """
SELECT c_custkey, c_name, n_name,
       CAST(round(sum(CAST((CASE WHEN (l_extendedprice * (1 - l_discount)) < 0 THEN -floor(-(l_extendedprice * (1 - l_discount))*1e6 + 0.5) ELSE floor((l_extendedprice * (1 - l_discount))*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# -- qid: q12_priority_class (conditional aggregation) ----------------

def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


SQL_Q12 = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


# -- qid: q14_promo_share ---------------------------------------------

def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = lambda c: c.cast("decimal(24,6)")
    j = li.join(p, li.l_partkey == p.p_partkey)
    return j.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", dec(rev)).otherwise(F.lit(0).cast("decimal(24,6)"))).cast("double")
            / F.sum(dec(rev)).cast("double"),
            6,
        ).alias("promo_share_pct")
    )


SQL_Q14 = """
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                   THEN CAST((CASE WHEN (l_extendedprice * (1 - l_discount)) < 0 THEN -floor(-(l_extendedprice * (1 - l_discount))*1e6 + 0.5) ELSE floor((l_extendedprice * (1 - l_discount))*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))
                                   ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
             / CAST(sum(CAST((CASE WHEN (l_extendedprice * (1 - l_discount)) < 0 THEN -floor(-(l_extendedprice * (1 - l_discount))*1e6 + 0.5) ELSE floor((l_extendedprice * (1 - l_discount))*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))) AS DOUBLE), 6) AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-07-01'
"""


# -- qid: q19_disjunctive (OR-of-ANDs predicate join) -----------------

def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive predicates spanning both join sides — the planner
    must keep the equi-key join and evaluate the residual OR."""
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    j = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 10))
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 25))
    )
    return j.filter(cond).agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


SQL_Q19 = """
SELECT count(*) AS n_lines,
       CAST(round(sum(CAST((CASE WHEN (l_extendedprice * (1 - l_discount)) < 0 THEN -floor(-(l_extendedprice * (1 - l_discount))*1e6 + 0.5) ELSE floor((l_extendedprice * (1 - l_discount))*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 5)
   OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity >= 10)
   OR (p_type = 'PROMO' AND l_quantity >= 25)
"""


QUERIES = {
    "q10_returned_customers": q10_returned_customers,
    "q12_priority_class": q12_priority_class,
    "q14_promo_share": q14_promo_share,
    "q19_disjunctive": q19_disjunctive,
}

ORACLE_SQL = {
    "q10_returned_customers": SQL_Q10,
    "q12_priority_class": SQL_Q12,
    "q14_promo_share": SQL_Q14,
    "q19_disjunctive": SQL_Q19,
}
