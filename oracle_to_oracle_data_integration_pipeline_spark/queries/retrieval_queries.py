"""Retrieval/scoring qids: BM25 ranking, unigram-LM quality scoring,
kNN label classification, fuzzy entity lookup (operators/retrieval.py).

Oracle twins mirror the Spark expressions token for token — same
association order, same `floor(x*1e6+0.5)/1e6` portable rounding on
every ln-derived value, same tiebreaks — so the driver's value-hash
compare is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load

# -- qid: bm25_topk ----------------------------------------------------

BM25_TERMS = ["spark", "join", "window", "fast"]
BM25_K = 10


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 for a fixed query over the documents corpus;
    corpus stats via one-row broadcast, top-k via TakeOrderedAndProject
    (no global sort)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.retrieval import bm25_topk

    return bm25_topk(load(spark, sf_dir, "documents"), BM25_TERMS, k=BM25_K)


def bm25_ctes(src: str = "documents") -> str:
    """The base/stats/scored CTE bodies of the BM25 oracle,
    parameterized on the corpus source so composed oracles
    (retrieval_release) score EXACTLY the arithmetic this qid pins —
    one text, two consumers, no drift possible."""
    tf_defs = ",\n         ".join(
        f"len(list_filter(string_split(text, ' '), x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df_defs = ",\n         ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(BM25_TERMS))
    )
    contribs = "\n           + ".join(
        f"floor(ln((n_docs - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0) * 1000000.0 + 0.5) / 1000000.0"
        f" * (CAST(tf_{i} AS DOUBLE) * (1.2 + 1.0)"
        f" / (CAST(tf_{i} AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))"
        for i in range(len(BM25_TERMS))
    )
    return f"""base AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS dl,
         {tf_defs}
  FROM {src}
),
stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl,
         {df_defs}
  FROM base
),
scored AS (
  SELECT doc_id,
         floor(({contribs}) * 1000000.0 + 0.5) / 1000000.0 AS bm25
  FROM base, stats
)"""


def _bm25_sql() -> str:
    return f"""
WITH {bm25_ctes()}
SELECT doc_id, bm25,
       CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS rank
FROM scored ORDER BY bm25 DESC, doc_id LIMIT {BM25_K}
"""


SQL_BM25_TOPK = _bm25_sql()


# -- qid: lm_perplexity ------------------------------------------------

def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log-likelihood under the corpus
    unigram LM — the cheap perplexity-style quality filter."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.retrieval import unigram_nll

    return unigram_nll(load(spark, sf_dir, "documents"))


SQL_LM_PERPLEXITY = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
vocab AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
tot AS (SELECT sum(c) AS t_total FROM vocab),
scored AS (
  SELECT t.doc_id,
         ln(CAST(t_total AS DOUBLE)) - ln(CAST(c AS DOUBLE)) AS nll
  FROM tok t JOIN vocab USING (tok), tot
)
SELECT doc_id, count(*) AS n_tokens,
       round(CAST(sum(CAST(nll AS DECIMAL(24,6))) AS DOUBLE) / count(*), 6) AS avg_nll
FROM scored GROUP BY doc_id
"""


# -- qid: knn_classify -------------------------------------------------

KNN_QUERIES = 10
KNN_K = 10


def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-label kNN over embeddings: first 10 vectors are
    queries, the rest the labeled pool; k=10 cosine neighbors."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.retrieval import knn_classify

    return knn_classify(load(spark, sf_dir, "embeddings"), KNN_QUERIES, KNN_K)


SQL_KNN_CLASSIFY = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
q AS (
  SELECT vec_id AS query_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn,
         label AS true_label
  FROM e WHERE vec_id < {KNN_QUERIES}
),
c AS (
  -- unlabeled candidates are not in the pool (see operators/retrieval
  -- knn_classify: a NULL-label vote group flips winners between the
  -- engines' NULL orderings)
  SELECT vec_id AS neighbor_id, v AS cv, sqrt(list_dot_product(v, v)) AS cn, label
  FROM e WHERE vec_id >= {KNN_QUERIES} AND label IS NOT NULL
),
scored AS (
  SELECT query_id, neighbor_id, label,
         round(list_dot_product(qv, cv) / (qn * cn), 6) AS cosine
  FROM q, c
),
topk AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS r
    FROM scored
  ) WHERE r <= {KNN_K}
),
votes AS (SELECT query_id, label, count(*) AS votes FROM topk GROUP BY query_id, label),
pred AS (
  SELECT * FROM (
    SELECT query_id, label AS predicted_label, votes,
           row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS r
    FROM votes
  ) WHERE r = 1
)
SELECT p.query_id, p.predicted_label, p.votes, q.true_label
FROM pred p JOIN q USING (query_id)
"""


# -- qid: fuzzy_match --------------------------------------------------

FUZZY_PROBES = ["rde widget", "blu bolt", "smal gizmo", "hot gaer", "grene cog"]


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-catalog entity resolution: each misspelled probe name maps
    to its levenshtein-closest part (probe set broadcast, distance
    map-only over the catalog)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.retrieval import fuzzy_lookup

    probes = spark.createDataFrame([(p,) for p in FUZZY_PROBES], "probe string")
    return fuzzy_lookup(load(spark, sf_dir, "part"), probes, "p_partkey", "p_name")


_PROBE_VALUES = ", ".join(f"('{p}')" for p in FUZZY_PROBES)

SQL_FUZZY_MATCH = f"""
WITH probes(probe) AS (VALUES {_PROBE_VALUES}),
scored AS (
  SELECT probe, p_partkey, p_name,
         CAST(levenshtein(probe, p_name) AS INT) AS dist,
         row_number() OVER (PARTITION BY probe ORDER BY levenshtein(probe, p_name), p_partkey) AS r
  FROM probes, part
)
SELECT probe, p_partkey, p_name, dist FROM scored WHERE r = 1
"""


QUERIES = {
    "bm25_topk": q_bm25_topk,
    "lm_perplexity": q_lm_perplexity,
    "knn_classify": q_knn_classify,
    "fuzzy_match": q_fuzzy_match,
}

ORACLE_SQL = {
    "bm25_topk": SQL_BM25_TOPK,
    "lm_perplexity": SQL_LM_PERPLEXITY,
    "knn_classify": SQL_KNN_CLASSIFY,
    "fuzzy_match": SQL_FUZZY_MATCH,
}
