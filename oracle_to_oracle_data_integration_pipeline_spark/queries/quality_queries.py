"""Data-quality qids: column profiling and declarative rule checks
(operators/dq.py) — the validation surface a replication target or a
curated corpus is gated on.

Registered behind the round-2 verify window; rotates into the driver
gate next round (oracle-tested locally by test_queries_vs_duckdb).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.dq import (
    check_rules,
    check_unique,
    k_anonymity,
    profile_columns,
)
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load, md5_frac52, pround


# -- qid: profile_docs ------------------------------------------------

def q_profile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of the documents table."""
    return profile_columns(
        load(spark, sf_dir, "documents"),
        cols=["doc_id", "lang", "source", "n_chars"],
    )


SQL_PROFILE_DOCS = """
SELECT 'doc_id' AS column, CAST(count(CASE WHEN doc_id IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct FROM documents
UNION ALL
SELECT 'lang', CAST(count(CASE WHEN lang IS NULL THEN 1 END) AS BIGINT),
       CAST(count(DISTINCT lang) AS BIGINT) FROM documents
UNION ALL
SELECT 'source', CAST(count(CASE WHEN source IS NULL THEN 1 END) AS BIGINT),
       CAST(count(DISTINCT source) AS BIGINT) FROM documents
UNION ALL
SELECT 'n_chars', CAST(count(CASE WHEN n_chars IS NULL THEN 1 END) AS BIGINT),
       CAST(count(DISTINCT n_chars) AS BIGINT) FROM documents
"""


# -- qid: dq_checks ---------------------------------------------------

def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint rules over orders, all in one aggregation pass:
    violation counts per rule."""
    o = load(spark, sf_dir, "orders")
    return check_rules(
        o,
        {
            "orderkey_null": F.col("o_orderkey").isNull(),
            "totalprice_nonpositive": F.col("o_totalprice") <= 0,
            "status_unknown": ~F.col("o_orderstatus").isin("O", "F", "P"),
            "date_null": F.col("o_orderdate").isNull(),
        },
    )


SQL_DQ_CHECKS = """
SELECT 'orderkey_null' AS rule,
       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'totalprice_nonpositive',
       CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'status_unknown',
       CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'date_null',
       CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
"""


# -- qid: dq_unique ---------------------------------------------------

def q_dq_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key uniqueness: lineitem (l_orderkey, l_linenumber)
    must have no duplicates — the check returns the offenders, so an
    empty result is the pass. To keep the differential compare
    non-vacuous the input plants one duplicated key."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    first = li.orderBy("l_orderkey", "l_linenumber").limit(1)
    return check_unique(li.union(first), ["l_orderkey", "l_linenumber"])


SQL_DQ_UNIQUE = """
WITH planted AS (
  SELECT l_orderkey, l_linenumber FROM lineitem
  ORDER BY l_orderkey, l_linenumber LIMIT 1
),
both_rows AS (
  SELECT l_orderkey, l_linenumber FROM lineitem
  UNION ALL SELECT * FROM planted
)
SELECT l_orderkey, l_linenumber, CAST(count(*) AS BIGINT) AS n_rows
FROM both_rows GROUP BY 1, 2 HAVING count(*) > 1
"""


# -- qid: k_anonymity -------------------------------------------------

K_ANON_K = 3  # minimum equivalence-class size for release


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the documents table under the
    quasi-identifier tuple (lang, source, n_chars-century bucket):
    every combination shared by fewer than K_ANON_K docs is a
    re-identification risk and comes back as a violation row. The
    extension of the reference's count-only validate to a release
    gate (privacy counterpart of ``pii_scrub``'s content screen)."""
    d = load(spark, sf_dir, "documents").withColumn(
        "size_bucket", F.floor(F.col("n_chars") / 100).cast("int")
    )
    return k_anonymity(d, ["lang", "source", "size_bucket"], k=K_ANON_K)


SQL_K_ANONYMITY = f"""
SELECT lang, source, CAST(n_chars // 100 AS INT) AS size_bucket,
       CAST(count(*) AS BIGINT) AS n_rows
FROM documents
GROUP BY 1, 2, 3
HAVING count(*) < {K_ANON_K}
"""


QUERIES = {
    "profile_docs": q_profile_docs,
    "dq_checks": q_dq_checks,
    "dq_unique": q_dq_unique,
    "k_anonymity": q_k_anonymity,
}

ORACLE_SQL = {
    "profile_docs": SQL_PROFILE_DOCS,
    "dq_checks": SQL_DQ_CHECKS,
    "dq_unique": SQL_DQ_UNIQUE,
    "k_anonymity": SQL_K_ANONYMITY,
}


# -- qid: k_generalize ---------------------------------------------------------

KG_K = 25


def q_k_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity GENERALIZATION (the fix, where `k_anonymity` is the
    audit): walk a fixed generalization ladder over the quasi-
    identifiers — level 0 (nation, balance/1000 band) → level 1
    (nation, balance sign) → level 2 (region-of-5 nations, balance
    sign) → level 3 (suppress all) — and report, per level, the
    equivalence-class profile (classes, min/max class size) plus
    which level is the MINIMAL one satisfying k={KG_K}. The standard
    privacy-engineering decision table: publish at the chosen level,
    anything finer re-identifies.

    Scale: all ladder levels evaluate in ONE pass — the per-level
    class profiles are unioned aggregates over the same scan (AQE
    reuses the exchange), each a combinable count shuffle; the
    chosen-level rule is a window over ≤4 rows.
    """
    from pyspark.sql import Window

    cu = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    levels = {
        0: [F.col("c_nationkey"), F.floor(F.col("c_acctbal") / 1000)],
        1: [F.col("c_nationkey"), (F.col("c_acctbal") >= 0).cast("int")],
        2: [F.floor(F.col("c_nationkey") / 5), (F.col("c_acctbal") >= 0).cast("int")],
        3: [F.lit(0), F.lit(0)],
    }
    profs = None
    for lvl, (q1, q2) in levels.items():
        p = (
            cu.groupBy(q1.alias("_q1"), q2.alias("_q2"))
            .agg(F.count(F.lit(1)).alias("sz"))
            .agg(
                F.lit(lvl).alias("level"),
                F.count(F.lit(1)).alias("n_classes"),
                F.min("sz").alias("min_class"),
                F.max("sz").alias("max_class"),
            )
        )
        profs = p if profs is None else profs.unionByName(p)
    w = Window.orderBy("level").rowsBetween(Window.unboundedPreceding, -1)
    return (
        profs.withColumn("satisfies_k", (F.col("min_class") >= KG_K).cast("int"))
        .withColumn(
            "chosen",
            (
                (F.col("min_class") >= KG_K)
                & F.coalesce(
                    F.max(
                        (F.col("min_class") >= KG_K).cast("int")
                    ).over(w)
                    == 0,
                    F.lit(True),
                )
            ).cast("int"),
        )
    )


SQL_K_GENERALIZE = f"""
WITH l0 AS (
  SELECT 0 AS level, count(*) AS n_classes, min(sz) AS min_class,
         max(sz) AS max_class
  FROM (SELECT count(*) AS sz FROM customer
        GROUP BY c_nationkey, CAST(floor(c_acctbal / 1000) AS BIGINT))
),
-- the sign bucket keeps NULL balances as their OWN equivalence class
-- (three-valued: 1 / 0 / NULL): a missing quasi-identifier is still an
-- attacker-observable value and must not silently merge into the
-- negative class — and Spark's (x >= 0)::int is NULL for NULL anyway
-- (fuzz find, tools/fuzz_parity.py nulls profile)
l1 AS (
  SELECT 1, count(*), min(sz), max(sz)
  FROM (SELECT count(*) AS sz FROM customer
        GROUP BY c_nationkey,
                 CASE WHEN c_acctbal >= 0 THEN 1
                      WHEN c_acctbal < 0 THEN 0 END)
),
l2 AS (
  SELECT 2, count(*), min(sz), max(sz)
  FROM (SELECT count(*) AS sz FROM customer
        GROUP BY CAST(floor(c_nationkey / 5) AS BIGINT),
                 CASE WHEN c_acctbal >= 0 THEN 1
                      WHEN c_acctbal < 0 THEN 0 END)
),
l3 AS (
  SELECT 3, count(*), min(sz), max(sz)
  FROM (SELECT count(*) AS sz FROM customer GROUP BY 'all', 'all')
),
profs AS (
  SELECT * FROM l0 UNION ALL SELECT * FROM l1
  UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3
)
SELECT level, n_classes, min_class, max_class,
       CAST(CASE WHEN min_class >= {KG_K} THEN 1 ELSE 0 END AS INT)
         AS satisfies_k,
       CAST(CASE WHEN min_class >= {KG_K}
                  AND coalesce(max(CASE WHEN min_class >= {KG_K} THEN 1 ELSE 0 END)
                      OVER (ORDER BY level ROWS BETWEEN UNBOUNDED PRECEDING
                                                    AND 1 PRECEDING), 0) = 0
            THEN 1 ELSE 0 END AS INT) AS chosen
FROM profs
"""


# -- qid: dp_counts -------------------------------------------------------------

DP_EPSILON = 1.0


def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy release mechanism: per-segment counts with
    Laplace(1/ε) noise, ε={DP_EPSILON} — the ε-DP counting query. The
    HARNESS substitutes the md5_frac52 uniform for the RNG (inverse-
    CDF Laplace: −b·sign(u−½)·ln(1−2|u−½|)), which keeps the
    mechanism's exact arithmetic checkable cross-engine; production
    swaps ONE column for a secure-random uniform and everything else
    — sensitivity-1 counting, the inverse CDF, the ε accounting —
    is already the released shape. A production RELEASE must also (a)
    DROP the true_count and noise columns — co-releasing them (as this
    checkable harness shape does) reveals the exact count, voiding the
    DP guarantee — and (b) draw a FRESH secure-random uniform per
    release: the md5-of-segment-name uniform here is deterministic, so
    re-running would replay identical noise (an averaging attack needs
    only the column swap to be per-release, not just cryptographic).
    Complements the privacy surface's k_anonymity/k_generalize
    (syntactic) and erasure_sweep (deletion) with the
    statistical-release leg.

    Scale: one combinable count shuffle; the noise is a per-GROUP
    scalar expression (|segments| evaluations, not per-row).
    """
    o = load(spark, sf_dir, "orders")
    per = o.groupBy(F.col("o_orderpriority").alias("segment")).agg(
        F.count(F.lit(1)).alias("true_count")
    )
    b = 1.0 / DP_EPSILON
    u = md5_frac52(F.concat(F.lit("dp:"), F.col("segment")))
    centered = u - F.lit(0.5)
    noise = (
        F.lit(-b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return per.select(
        "segment",
        "true_count",
        pround(noise).alias("noise"),
        pround(F.col("true_count") + noise).alias("released_count"),
        F.lit(DP_EPSILON).alias("epsilon"),
    )


SQL_DP_COUNTS = f"""
WITH per AS (
  SELECT o_orderpriority AS segment, count(*) AS true_count
  FROM orders GROUP BY 1
),
n AS (
  SELECT *,
         CAST(('0x' || substr(md5('dp:' || segment), 1, 13)) AS BIGINT)
           / CAST(power(16, 13) AS DOUBLE) - 0.5 AS c
  FROM per
)
SELECT segment, true_count,
       floor((-{1.0 / DP_EPSILON!r} * sign(c) * ln(1.0 - 2.0 * abs(c)))
             * 1e6 + 0.5) / 1e6 AS noise,
       floor((true_count + (-{1.0 / DP_EPSILON!r} * sign(c)
              * ln(1.0 - 2.0 * abs(c)))) * 1e6 + 0.5) / 1e6
         AS released_count,
       CAST({DP_EPSILON!r} AS DOUBLE) AS epsilon
FROM n
"""

QUERIES["k_generalize"] = q_k_generalize
QUERIES["dp_counts"] = q_dp_counts
ORACLE_SQL["k_generalize"] = SQL_K_GENERALIZE
ORACLE_SQL["dp_counts"] = SQL_DP_COUNTS
