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
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load


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
