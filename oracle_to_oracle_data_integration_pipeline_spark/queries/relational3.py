"""Third breadth batch: unpivot, null handling, regex, array/map
operations, positional explode, advanced window analytics, correlated
and HAVING subqueries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import dsum, load


# -- qid: unpivot -----------------------------------------------------

def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long via stack() on a per-flag aggregate."""
    li = load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum(F.col("l_quantity")).alias("qty"),
        dsum(F.col("l_tax")).alias("tax"),
        dsum(F.col("l_discount")).alias("disc"),
    )
    return wide.selectExpr(
        "l_returnflag",
        "stack(3, 'qty', qty, 'tax', tax, 'disc', disc) AS (metric, metric_value)",
    )


SQL_UNPIVOT = """
WITH wide AS (
  SELECT l_returnflag,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(24,6))), 2) AS DOUBLE) AS qty,
         CAST(round(sum(CAST(l_tax AS DECIMAL(24,6))), 2) AS DOUBLE) AS tax,
         CAST(round(sum(CAST(l_discount AS DECIMAL(24,6))), 2) AS DOUBLE) AS disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'qty' AS metric, qty AS metric_value FROM wide
UNION ALL SELECT l_returnflag, 'tax', tax FROM wide
UNION ALL SELECT l_returnflag, 'disc', disc FROM wide
"""


# -- qid: null_handling -----------------------------------------------

def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nullif/coalesce/ifnull/isNull/fill semantics on derived NULLs."""
    c = load(spark, sf_dir, "customer")
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg_or_null.alias("seg_nullable"),
        F.coalesce(seg_or_null, F.lit("(redacted)")).alias("seg_filled"),
        seg_or_null.isNull().alias("was_building"),
        F.when(seg_or_null.isNull(), F.lit(0.0)).otherwise(F.col("c_acctbal")).alias("bal_masked"),
    )


SQL_NULL_HANDLING = """
SELECT c_custkey,
       nullif(c_mktsegment, 'BUILDING') AS seg_nullable,
       coalesce(nullif(c_mktsegment, 'BUILDING'), '(redacted)') AS seg_filled,
       nullif(c_mktsegment, 'BUILDING') IS NULL AS was_building,
       CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NULL THEN 0.0 ELSE c_acctbal END AS bal_masked
FROM customer
"""


# -- qid: regex_funcs -------------------------------------------------

def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Java regex and RE2 agree on this conservative syntax subset
    (literal classes, groups, no backrefs)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract(F.col("p_name"), r"^([a-z]+) ", 1).alias("first_word"),
        F.regexp_replace(F.col("p_name"), r"[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike(r"widget|gear").alias("is_mech"),
    )


SQL_REGEX_FUNCS = """
SELECT p_partkey,
       regexp_extract(p_name, '^([a-z]+) ', 1) AS first_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       regexp_matches(p_name, 'widget|gear') AS is_mech
FROM part
"""


# -- qid: array_agg ---------------------------------------------------

def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped array construction — sort_array makes the
    nondeterministic collect order canonical (collect_list order is
    partition-arrival order in any engine)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 25 == 0)
    return c.groupBy("c_nationkey").agg(
        # Join the sorted array to a scalar string: raw array columns are
        # unhashable in the driver's pandas canonicalizer. Numeric sort
        # FIRST, then element-wise cast, so order is 25,50,100 not
        # lexicographic.
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("c_custkey")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("custkeys"),
        F.size(F.collect_set("c_mktsegment")).alias("n_segments"),
        F.count(F.lit(1)).alias("n_customers"),
    )


SQL_ARRAY_AGG = """
SELECT c_nationkey,
       array_to_string(list_sort(list(c_custkey)), ',') AS custkeys,
       CAST(count(DISTINCT c_mktsegment) AS INT) AS n_segments,
       count(*) AS n_customers
FROM customer WHERE c_custkey % 25 = 0
GROUP BY c_nationkey
"""


# -- qid: map_funcs ---------------------------------------------------

def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + explosion back to rows (map output itself is
    kept out of the compared schema — engines disagree on map
    rendering; entries are the portable form)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 503 == 0)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return o.select("o_orderkey", F.explode(m).alias("k", "v"))


SQL_MAP_FUNCS = """
SELECT o_orderkey, 'status' AS k, o_orderstatus AS v FROM orders WHERE o_orderkey % 503 = 0
UNION ALL
SELECT o_orderkey, 'priority', o_orderpriority FROM orders WHERE o_orderkey % 503 = 0
"""


# -- qid: explode_pos -------------------------------------------------

def q_explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 5)
    return e.select("vec_id", F.posexplode("embedding").alias("pos", "val")).withColumn(
        "pos", F.col("pos") + 1  # 1-based, matching SQL subscripts
    )


SQL_EXPLODE_POS = """
SELECT vec_id, CAST(pos AS INT) AS pos, embedding[pos] AS val
FROM (
  SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS pos
  FROM embeddings WHERE vec_id < 5
)
"""


# -- qid: window_analytics2 -------------------------------------------

def q_window_analytics2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist/first_value/lead in one pass, per
    CUSTOMER (round 7: re-keyed from o_orderstatus — a 3-value key
    put 1/3 of orders in each of 3 window tasks, the low-cardinality
    hazard tools/window_audit.py matcher 3 now flags; o_custkey
    scales with SF, so per-key input is each customer's own order
    history). The oracle pins NULLS FIRST on the price sort key —
    Spark ASC defaults NULLS FIRST, DuckDB NULLS LAST (fuzz find,
    tools/fuzz_parity.py nulls profile)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 20 == 0)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice"), F.col("o_orderkey"))
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first_value(F.col("o_orderkey")).over(frame).alias("cheapest_key"),
        F.lead(F.col("o_orderkey"), 1).over(w).alias("next_key"),
    )


SQL_WINDOW_ANALYTICS2 = """
SELECT o_orderkey, o_custkey,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       first_value(o_orderkey) OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice NULLS FIRST, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cheapest_key,
       lead(o_orderkey, 1) OVER w AS next_key
FROM orders WHERE o_custkey % 20 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice NULLS FIRST, o_orderkey)
"""


# -- qid: correlated_subquery (Q17 shape) -----------------------------

_CORRELATED_SQL = """
SELECT l1.l_partkey,
       count(*) AS n_small,
       CAST(round(sum(CAST(l1.l_extendedprice AS DECIMAL(24,6))), 2) AS DOUBLE) AS small_revenue
FROM lineitem l1
WHERE l1.l_quantity < (
  SELECT 0.5 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(24,6))) AS DOUBLE) / count(*))
  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
)
GROUP BY l1.l_partkey
"""


def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join (one shuffle on partkey), which is exactly the
    hand-written plan; identical SQL text runs on both engines."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_CORRELATED_SQL)


# -- qid: having_subquery (Q18 shape) ---------------------------------

def q_having_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(24,6)")), 2).cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return o.join(big, o.o_orderkey == big.l_orderkey).select(
        "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
    )


SQL_HAVING_SUBQUERY = """
SELECT o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders JOIN (
  SELECT l_orderkey, CAST(round(sum(CAST(l_quantity AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(round(sum(CAST(l_quantity AS DECIMAL(24,6))), 2) AS DOUBLE) > 150
) ON o_orderkey = l_orderkey
"""


QUERIES = {
    "unpivot": q_unpivot,
    "null_handling": q_null_handling,
    "regex_funcs": q_regex_funcs,
    "array_agg": q_array_agg,
    "map_funcs": q_map_funcs,
    "explode_pos": q_explode_pos,
    "window_analytics2": q_window_analytics2,
    "correlated_subquery": q_correlated_subquery,
    "having_subquery": q_having_subquery,
}

ORACLE_SQL = {
    "unpivot": SQL_UNPIVOT,
    "null_handling": SQL_NULL_HANDLING,
    "regex_funcs": SQL_REGEX_FUNCS,
    "array_agg": SQL_ARRAY_AGG,
    "map_funcs": SQL_MAP_FUNCS,
    "explode_pos": SQL_EXPLODE_POS,
    "window_analytics2": SQL_WINDOW_ANALYTICS2,
    "correlated_subquery": _CORRELATED_SQL,
    "having_subquery": SQL_HAVING_SUBQUERY,
}
