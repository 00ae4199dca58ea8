"""Fifth breadth batch: remaining classic shapes (Q4 correlated
EXISTS, Q6 pure scan-aggregate, Q22 anti-join with scalar subquery)
plus the grouped-map Pandas-UDF surface (applyInPandas) with an
integer-exact oracle.

Q4/Q22 run identical SQL text on both engines (temp views on the
Spark side) — the engine's SQL API surface is part of the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import dsum, load


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


# -- qid: q6_forecast_revenue (pure scan-agg; max pushdown) -----------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No join at all: filter + single agg. The entire query should
    collapse to a pruned parquet scan with pushed range filters and a
    2-phase aggregate — the canonical 'is pushdown working' probe."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


SQL_Q6 = """
SELECT CAST(round(sum(CAST((CASE WHEN (l_extendedprice * l_discount) < 0 THEN -floor(-(l_extendedprice * l_discount)*1e6 + 0.5) ELSE floor((l_extendedprice * l_discount)*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


# -- qid: q4_order_priority (correlated EXISTS) -----------------------

SQL_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(SQL_Q4)


# -- qid: q22_dormant_customers (scalar subquery + NOT EXISTS) --------

SQL_Q22 = """
SELECT substring(c_name, 1, 1) AS initial,
       count(*) AS n_customers,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(24,6))), 2) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE) / count(*)
    FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01'
  )
GROUP BY substring(c_name, 1, 1)
"""


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(SQL_Q22)


# -- qid: grouped_rank_pandas (applyInPandas grouped-map surface) -----

def q_grouped_rank_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label ranking computed in pandas (grouped-map Arrow path,
    SURVEY.md §2.10) — integer-exact output so the oracle is a plain
    window row_number. The pandas boundary is the operator under test;
    the logic is deliberately oracle-checkable."""
    import pandas as pd

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.element_at("embedding", 1).alias("comp0")
    )

    def rank_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["comp0", "vec_id"]).reset_index(drop=True)
        pdf["rnk"] = range(1, len(pdf) + 1)
        return pdf

    return e.groupBy("label").applyInPandas(
        rank_group, schema="vec_id long, label int, comp0 float, rnk long"
    )


SQL_GROUPED_RANK = """
SELECT vec_id, label, embedding[1] AS comp0,
       row_number() OVER (PARTITION BY label ORDER BY embedding[1], vec_id) AS rnk
FROM embeddings
"""


# -- qid: scalar_pandas_udf (vectorized Arrow scalar UDF surface) -----

def q_scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALAR half of the §2.10 UDF surface: an Arrow-vectorized
    ``@pandas_udf`` normalizing document whitespace (collapse runs,
    trim) and counting words — one Python invocation per Arrow batch,
    never per row (the 10-100x lever over row-at-a-time UDFs). Logic
    is deliberately oracle-expressible so the Arrow boundary itself is
    what the differential compare certifies."""
    from pyspark.sql.functions import pandas_udf

    # annotation-free form: the module's `from __future__ import
    # annotations` stringifies type hints, which the pandas_udf
    # eval-type inference rejects; without hints the default is the
    # scalar (Series -> Series) Arrow UDF, exactly what we want.
    # Tokenize on RE2's \s class ([\t\n\f\r ]) explicitly: pandas'
    # bare .str.split() splits on ALL Unicode whitespace ( ,
    # 　, ...) where the DuckDB twin's regexp \s+ is ASCII-only —
    # findall of the complement also drops empty tokens, matching the
    # oracle's list_filter. Nullable Int32 keeps a NULL text row as a
    # NULL count instead of crashing the cast.
    toks = r"[^\t\n\f\r ]+"
    norm_ws = pandas_udf(lambda s: s.str.findall(toks).str.join(" "), "string")
    n_words = pandas_udf(lambda s: s.str.findall(toks).str.len().astype("Int32"), "int")

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.select(
        "doc_id",
        norm_ws(F.col("text")).alias("clean_text"),
        n_words(F.col("text")).alias("n_words"),
    )


SQL_SCALAR_PANDAS_UDF = r"""
SELECT doc_id,
       array_to_string(
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''), ' '
       ) AS clean_text,
       CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))
            AS INT) AS n_words
FROM documents
"""


# -- qid: python_udtf (table-function surface, lateral join) ----------

UDTF_MAX_ID = 200  # bounded input slice for the surface demo


def q_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDTF third of the §2.10 surface: a Python user-defined
    TABLE function (Spark 4 ``@udtf``) exploding each document into
    (word, pos) rows through a SQL LATERAL join — the 1:N row
    generator that scalar UDFs can't express. Arrow-optimized UDTF
    execution is enabled when available; the input is a bounded
    document slice (this qid certifies the surface, not bulk text
    throughput — that's ``chunk_docs``/``token_freq`` territory)."""
    from pyspark.sql.functions import udtf

    class SplitWords:
        def eval(self, text: str):
            import re

            # RE2's \s class ([\t\n\f\r ]) to match the DuckDB twin;
            # Python's bare str.split() would split on all Unicode
            # whitespace (see scalar_pandas_udf)
            for i, w in enumerate(re.findall(r"[^\t\n\f\r ]+", text or "")):
                yield i + 1, w

    try:  # Arrow-optimized UDTF execution where the runtime supports it
        split_words = udtf(SplitWords, returnType="pos int, word string",
                           useArrow=True)
    except TypeError:  # older runtime without the useArrow kwarg
        split_words = udtf(SplitWords, returnType="pos int, word string")
    spark.udtf.register("split_words_udtf", split_words)
    load(spark, sf_dir, "documents").where(
        F.col("doc_id") < UDTF_MAX_ID
    ).select("doc_id", "text").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """SELECT d.doc_id, s.pos, s.word
           FROM udtf_docs d, LATERAL split_words_udtf(d.text) s"""
    )


SQL_PYTHON_UDTF = rf"""
WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
  FROM documents WHERE doc_id < {UDTF_MAX_ID}
)
SELECT doc_id, CAST(pos AS INT) AS pos, ws[pos] AS word
FROM words, unnest(generate_series(1, len(ws))) AS t(pos)
"""


# -- qid: pandas_grouped_agg (Arrow grouped-AGGREGATE UDAF surface) ----

def q_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grouped-AGGREGATE quarter of the §2.10 pandas surface (the
    others: scalar_pandas_udf, grouped_rank_pandas/applyInPandas,
    ewma_smooth/mapInPandas): a ``pandas_udf`` UDAF — whole group in
    as Series, ONE scalar out — computing the 10%-trimmed mean
    account balance per market segment, a fold builtins can't express
    (the trim boundary needs the group's own order statistics).

    Determinism contract: balances quantize to exact integer CENTS
    before anything else (the integer-quantization idiom), the trim
    selects by (cents, custkey) total order, and the only double op is
    the final single IEEE division of two exact integers — bit-equal
    on any engine. Type hints are attached via ``__annotations__``
    (the module's ``from __future__ import annotations`` stringifies
    inline hints, which pandas_udf eval-type inference can't resolve
    for function-local imports).

    Scale shape — BOUNDED-GROUP-CARDINALITY CONTRACT: this qid exists
    to demonstrate the §2.10 grouped-aggregate surface, and that API
    ships each whole group to ONE reducer with NO partial aggregation
    (the API's inherent cost, unlike combinable builtins). It is
    therefore only legitimate when |rows per group| is bounded — here
    it deliberately is NOT (each of the 5 segments holds ~1/5 of
    customers, i.e. one reducer sees 20 TB of a 100 TB table), which
    makes this the documented ANTI-PATTERN arm of the pair. Do not
    copy this shape onto data that scales: the exact trimmed mean is
    expressible with the distributed two-pass rank idiom
    (operators/scale.distributed_rank — bucket histogram + per-bucket
    offsets, every stage combinable), which is how gini_concentration
    and rfm_segments compute order statistics over unbounded groups.
    The window-audit lint (tools/window_audit.py matcher 3) flags
    sub-32-cardinality WINDOW keys for exactly this hazard; grouped
    pandas UDAFs sit outside Window nodes, so this docstring is the
    guard."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _trimmed_mean(cents, key):
        df = pd.DataFrame({"c": cents, "k": key}).sort_values(["c", "k"])
        n = len(df)
        k = n // 10
        sel = df["c"].iloc[k : n - k]
        return float(int(sel.sum())) / len(sel)

    _trimmed_mean.__annotations__ = {
        "cents": pd.Series, "key": pd.Series, "return": float,
    }

    def _group_size(cents):
        return len(cents)

    _group_size.__annotations__ = {"cents": pd.Series, "return": int}

    trimmed_mean = pandas_udf(_trimmed_mean, "double")
    group_size = pandas_udf(_group_size, "long")

    c = load(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    # GUARD: 5-value group key -> whole-table-into-5-reducers. Kept
    # ONLY as the §2.10 API demonstration (see docstring contract);
    # scale-safe exact order statistics use distributed_rank instead.
    return c.groupBy("c_mktsegment").agg(
        group_size(F.col("cents")).alias("n_customers"),
        trimmed_mean(F.col("cents"), F.col("c_custkey")).alias(
            "trimmed_mean_bal"
        ),
    )


SQL_PANDAS_GROUPED_AGG = """
WITH c AS (
  SELECT c_mktsegment AS seg, c_custkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY seg ORDER BY cents, c_custkey) AS rn,
         count(*) OVER (PARTITION BY seg) AS n
  FROM c
),
t AS (
  SELECT seg, n, cents FROM r
  WHERE rn > n // 10 AND rn <= n - n // 10
)
SELECT seg AS c_mktsegment,
       CAST(max(n) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS DOUBLE) / count(*) AS trimmed_mean_bal
FROM t GROUP BY 1
"""


QUERIES = {
    "q6_forecast_revenue": q6_forecast_revenue,
    "q4_order_priority": q4_order_priority,
    "q22_dormant_customers": q22_dormant_customers,
    "grouped_rank_pandas": q_grouped_rank_pandas,
    "scalar_pandas_udf": q_scalar_pandas_udf,
    "python_udtf": q_python_udtf,
    "pandas_grouped_agg": q_pandas_grouped_agg,
}

ORACLE_SQL = {
    "q6_forecast_revenue": SQL_Q6,
    "q4_order_priority": SQL_Q4,
    "q22_dormant_customers": SQL_Q22,
    "grouped_rank_pandas": SQL_GROUPED_RANK,
    "scalar_pandas_udf": SQL_SCALAR_PANDAS_UDF,
    "python_udtf": SQL_PYTHON_UDTF,
    "pandas_grouped_agg": SQL_PANDAS_GROUPED_AGG,
}
