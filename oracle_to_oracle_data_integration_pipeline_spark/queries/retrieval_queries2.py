"""Second-wave retrieval/corpus qids: inverted-index build, reciprocal
rank fusion, OOV-rate scoring, bigram-LM scoring, text normalization,
and the distributed embedding Gram matrix
(operators/retrieval2.py, operators/stats.py, operators/text.py).

Oracle twins mirror the Spark expressions token for token — identical
association order, identical ``floor(x·10^r + 0.5)`` portable rounding
on every ln-derived value, identical tiebreaks — so the driver's
value-hash compare is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.text import (
    sql_ascii_lower,
    sql_ascii_upper,
)
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load

# -- qid: inverted_index -----------------------------------------------

INV_TOP_POSTINGS = 8
INV_MIN_DF = 2


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postings-list head per term (top-8 docs by tf, doc_id tiebreak)
    plus full-corpus df/total_tf; hapax terms (df < 2) dropped. The
    per-term head window compiles to WindowGroupLimit — partial top-N
    per partition BEFORE the shuffle — pinned by
    tests/test_plans.py::test_inverted_index_window_group_limit."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.retrieval2 import inverted_index

    return inverted_index(
        load(spark, sf_dir, "documents"),
        top_postings=INV_TOP_POSTINGS,
        min_df=INV_MIN_DF,
    )


SQL_INVERTED_INDEX = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
stats AS (
  SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
  FROM tf GROUP BY term
),
head AS (
  SELECT term, doc_id, rn FROM (
    SELECT term, doc_id,
           row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rn
    FROM tf
  ) WHERE rn <= {INV_TOP_POSTINGS}
),
post AS (
  SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rn) AS postings
  FROM head GROUP BY term
)
SELECT s.term, s.df, s.total_tf, p.postings
FROM stats s JOIN post p USING (term)
WHERE s.df >= {INV_MIN_DF}
"""


# -- qid: rank_fusion --------------------------------------------------

RF_TERM_A = "spark"
RF_TERM_B = "join"
RF_POOL = 50
RF_K = 10
RF_KRRF = 60


def _tf_ranking(docs: DataFrame, term: str, pool: int) -> DataFrame:
    """Top-``pool`` docs by raw tf of one term (tf desc, doc_id
    tiebreak) with ranks — a deliberately simple scorer so the fusion
    operator, not BM25 again, is the thing under test. The truncation
    is TakeOrderedAndProject; the rank window runs post-limit over
    ``pool`` rows only."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.text import tokens_col

    tf = F.size(F.filter(tokens_col("text"), lambda x: x == F.lit(term)))
    scored = docs.select("doc_id", tf.alias("tf"))
    top = scored.orderBy(F.col("tf").desc(), F.col("doc_id").asc()).limit(pool)
    w = Window.orderBy(F.col("tf").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select("doc_id", "rank")


def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two single-term tf rankings (pool 50
    each, k_rrf=60, top-10 out). Ranks are coalesced to 0 (= absent
    from that list) AFTER fusion so the output carries no NULL ints —
    the driver's pandas canonicalizer keeps integer dtype on both
    engines."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.retrieval2 import rrf_fuse

    docs = load(spark, sf_dir, "documents")
    a = _tf_ranking(docs, RF_TERM_A, RF_POOL)
    b = _tf_ranking(docs, RF_TERM_B, RF_POOL)
    fused = rrf_fuse(a, b, k_out=RF_K, k_rrf=RF_KRRF)
    return fused.select(
        "doc_id",
        F.coalesce("rank_a", F.lit(0)).alias("rank_a"),
        F.coalesce("rank_b", F.lit(0)).alias("rank_b"),
        "rrf",
        "fused_rank",
    )


def _rf_ranking_sql(term: str) -> str:
    return f"""
  SELECT doc_id, rank FROM (
    SELECT doc_id,
           row_number() OVER (
             ORDER BY len(list_filter(string_split(text, ' '), x -> x = '{term}')) DESC,
                      doc_id
           ) AS rank
    FROM documents
  ) WHERE rank <= {RF_POOL}
"""


SQL_RANK_FUSION = f"""
WITH ra AS ({_rf_ranking_sql(RF_TERM_A)}),
rb AS ({_rf_ranking_sql(RF_TERM_B)}),
f AS (
  SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
         ra.rank AS rank_a, rb.rank AS rank_b,
         floor(((CASE WHEN ra.rank IS NOT NULL
                      THEN 1.0 / ({RF_KRRF}.0 + ra.rank) ELSE 0.0 END)
              + (CASE WHEN rb.rank IS NOT NULL
                      THEN 1.0 / ({RF_KRRF}.0 + rb.rank) ELSE 0.0 END))
               * 1000000.0 + 0.5) / 1000000.0 AS rrf
  FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
),
top AS (SELECT * FROM f ORDER BY rrf DESC, doc_id LIMIT {RF_K})
SELECT doc_id,
       CAST(COALESCE(rank_a, 0) AS INT) AS rank_a,
       CAST(COALESCE(rank_b, 0) AS INT) AS rank_b,
       rrf,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS fused_rank
FROM top
"""


# -- qid: oov_rate -----------------------------------------------------

OOV_VOCAB = 16


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc out-of-vocabulary rate against the corpus top-16
    vocabulary (fixture vocabulary is 31 tokens, so roughly half the
    token stream is OOV — the flag is live, not vacuous)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.retrieval2 import oov_rate

    return oov_rate(load(spark, sf_dir, "documents"), vocab_size=OOV_VOCAB)


SQL_OOV_RATE = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
vocab AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS c FROM tok GROUP BY tok
    ORDER BY c DESC, tok LIMIT {OOV_VOCAB}
  )
),
j AS (
  SELECT t.doc_id, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
  FROM tok t LEFT JOIN vocab v USING (tok)
)
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(oov) AS BIGINT) AS n_oov,
       floor(CAST(CAST(sum(oov) AS BIGINT) AS DOUBLE) / count(*)
             * 1000000.0 + 0.5) / 1000000.0 AS oov_rate
FROM j GROUP BY doc_id
"""


# -- qid: bigram_lm_score ----------------------------------------------

BLM_ALPHA = 0.5


def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc average NLL under the corpus's own add-0.5 bigram LM —
    the bigram upgrade of lm_perplexity (retrieval_queries)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.retrieval2 import bigram_nll

    return bigram_nll(load(spark, sf_dir, "documents"), alpha=BLM_ALPHA)


SQL_BIGRAM_LM_SCORE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk)),
                               i -> tk[i] || ' ' || tk[i + 1])) AS bg
  FROM t
),
c12 AS (SELECT bg, count(*) AS c12 FROM big GROUP BY bg),
c1 AS (SELECT split_part(bg, ' ', 1) AS w1, count(*) AS c1 FROM big GROUP BY 1),
v AS (
  SELECT count(DISTINCT tok) AS v_size
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
),
occ AS (
  SELECT b.doc_id,
         CAST(floor(-ln((c12 + {BLM_ALPHA}) / (c1 + {BLM_ALPHA} * v_size))
                    * 1e12 + 0.5) AS BIGINT) AS q
  FROM big b
  JOIN c12 USING (bg)
  JOIN c1 ON split_part(b.bg, ' ', 1) = c1.w1, v
)
SELECT doc_id, count(*) AS n_bigrams,
       floor(CAST(sum(q) AS DOUBLE) / 1e12 / count(*) * 1000000.0 + 0.5)
         / 1000000.0 AS avg_nll
FROM occ GROUP BY doc_id
"""


# -- qid: text_normalize -----------------------------------------------

def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalization over customer (the fixture's only
    mixed-case/digit/punctuation text): 'Customer#000000042' →
    'customer 0'. Map-only, whole-stage-codegen regex chain — the
    pre-dedup canonicalizer at corpus scale."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.text import normalize_text_col

    c = load(spark, sf_dir, "customer")
    norm_name = normalize_text_col(F.col("c_name"))
    return c.select(
        "c_custkey",
        norm_name.alias("norm_name"),
        normalize_text_col(F.col("c_mktsegment")).alias("norm_segment"),
        F.length(norm_name).alias("n_chars_norm"),
    )


# strip-then-lower mirrors normalize_text_col: the case fold only ever
# sees ASCII (full-vs-simple Unicode case mapping diverges, see
# operators/text.ascii_lower_col)
_NORM = (
    "trim(regexp_replace(regexp_replace(lower(regexp_replace({col},"
    " '[^a-zA-Z0-9 ]', ' ', 'g')), '[0-9]+', '0', 'g'), ' +', ' ', 'g'))"
)

SQL_TEXT_NORMALIZE = f"""
SELECT c_custkey,
       {_NORM.format(col='c_name')} AS norm_name,
       {_NORM.format(col='c_mktsegment')} AS norm_segment,
       CAST(length({_NORM.format(col='c_name')}) AS INT) AS n_chars_norm
FROM customer
"""


# -- qid: embed_gram ---------------------------------------------------

EG_DIM = 64


def q_embed_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle Gram matrix XᵀX of the 64-dim embedding corpus
    via per-partition numpy partials (mapInPandas) + one tiny
    cell-keyed reduce — never an explode
    (tests/test_plans.py::test_embed_gram_no_generate)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import embed_gram

    return embed_gram(load(spark, sf_dir, "embeddings"), dim=EG_DIM)


SQL_EMBED_GRAM = f"""
WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
p AS (
  SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
         CAST(floor(v[CAST(i + 1 AS INT)] * v[CAST(j + 1 AS INT)]
                    * 1000000000.0 + 0.5) AS BIGINT) AS pq
  FROM e, range(0, {EG_DIM}) t1(i), range(0, {EG_DIM}) t2(j)
  WHERE j >= i
)
SELECT i, j, CAST(sum(pq) AS BIGINT) AS gram_q9,
       CAST(CAST(sum(pq) AS BIGINT) AS DOUBLE) / 1000000000.0 AS gram
FROM p GROUP BY i, j
"""


# -- qid: url_normalize ------------------------------------------------

def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization over a deterministically constructed
    crawl-style URL column (scheme/www/host case, tracking params, a
    fragment, and a malformed arm all exercised — every normalization
    rule is live, and the malformed arm proves the NULL-quarantine
    path). Map-only whole-stage-codegen regex/array algebra
    (operators/text.normalize_url_col)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.text import (
        ascii_upper_col,
        normalize_url_col,
    )

    d = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    raw = F.when(
        did % 7 == 0, F.concat(F.lit("doc:"), did.cast("string"))
    ).otherwise(
        F.concat(
            F.when(did % 3 == 0, F.lit("HTTPS"))
            .when(did % 3 == 1, F.lit("http"))
            .otherwise(F.lit("https")),
            F.lit("://"),
            F.when(did % 2 == 0, F.lit("WWW.")).otherwise(F.lit("")),
            # ASCII fold, not upper(): Java full-maps 'ß' to 'SS'
            # where utf8proc keeps it — the synthesized URL itself
            # must be engine-identical (fuzz find, unicode profile)
            ascii_upper_col(F.col("source")),
            F.lit(".Example.COM/"),
            F.col("lang"),
            F.lit("/doc/"),
            did.cast("string"),
            F.lit("?utm_source=feed&z="),
            F.col("lang"),
            F.lit("&id="),
            did.cast("string"),
            F.when(did % 2 == 0, F.lit("&ref=rss")).otherwise(F.lit("")),
            F.lit("#sec"),
        )
    )
    return d.select(
        "doc_id",
        raw.alias("raw_url"),
        normalize_url_col(raw).alias("norm_url"),
    )


_RAW_URL = f"""CASE WHEN doc_id % 7 = 0 THEN 'doc:' || CAST(doc_id AS VARCHAR)
  ELSE (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS'
             WHEN doc_id % 3 = 1 THEN 'http' ELSE 'https' END)
    || '://' || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END)
    || {sql_ascii_upper('source')} || '.Example.COM/' || lang || '/doc/'
    || CAST(doc_id AS VARCHAR) || '?utm_source=feed&z=' || lang
    || '&id=' || CAST(doc_id AS VARCHAR)
    || (CASE WHEN doc_id % 2 = 0 THEN '&ref=rss' ELSE '' END) || '#sec'
  END"""

SQL_URL_NORMALIZE = f"""
WITH r AS (SELECT doc_id, {_RAW_URL} AS raw_url FROM documents),
s1 AS (SELECT doc_id, raw_url,
              regexp_replace(raw_url, '#.*$', '') AS no_frag FROM r),
s2 AS (
  SELECT doc_id, raw_url, no_frag,
         {sql_ascii_lower("regexp_extract(no_frag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)")} AS scheme,
         regexp_replace(
           {sql_ascii_lower("regexp_extract(no_frag, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)")},
           '^www\\.', '') AS host,
         regexp_extract(no_frag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
         regexp_extract(no_frag, '\\?([^#]*)', 1) AS query
  FROM s1
),
s3 AS (
  SELECT doc_id, raw_url, scheme, host, path,
         array_to_string(list_sort(list_filter(string_split(query, '&'),
           x -> x <> '' AND NOT (starts_with(x, 'utm_') OR starts_with(x, 'ref=')
                OR starts_with(x, 'fbclid=') OR starts_with(x, 'gclid=')
                OR starts_with(x, 'mc_cid=') OR starts_with(x, 'mc_eid=')))), '&') AS q
  FROM s2
)
SELECT doc_id, raw_url,
       CASE WHEN scheme <> ''
            THEN scheme || '://' || host || path
                 || (CASE WHEN q <> '' THEN '?' || q ELSE '' END)
            ELSE NULL END AS norm_url
FROM s3
"""


QUERIES = {
    "inverted_index": q_inverted_index,
    "rank_fusion": q_rank_fusion,
    "oov_rate": q_oov_rate,
    "bigram_lm_score": q_bigram_lm_score,
    "text_normalize": q_text_normalize,
    "embed_gram": q_embed_gram,
    "url_normalize": q_url_normalize,
}

ORACLE_SQL = {
    "inverted_index": SQL_INVERTED_INDEX,
    "rank_fusion": SQL_RANK_FUSION,
    "oov_rate": SQL_OOV_RATE,
    "bigram_lm_score": SQL_BIGRAM_LM_SCORE,
    "text_normalize": SQL_TEXT_NORMALIZE,
    "embed_gram": SQL_EMBED_GRAM,
    "url_normalize": SQL_URL_NORMALIZE,
}


# -- qid: retrieval_release (dedup → BM25 ⊕ LM-fluency → RRF, ONE plan) --

RET_POOL = 50
RET_K = 10
RET_KRRF = 60


def q_retrieval_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third composition qid (round 9; twins: curation_release for
    corpus curation, replication_audit for CDC): the search-index
    release pipeline as ONE Spark plan — exact dedup (lowest doc_id
    per distinct text) → Okapi BM25 ranking of the DEDUPED corpus for
    the fixed query terms (operators/retrieval.bm25_topk, pool
    {RET_POOL}) ⊕ unigram-LM fluency ranking (lowest avg-NLL first —
    operators/retrieval.unigram_nll, same pool) → reciprocal-rank
    fusion (operators/retrieval2.rrf_fuse, k_rrf {RET_KRRF}) → top
    {RET_K} with source metadata re-attached. The lexical ranker and
    the fluency prior see the SAME deduplicated corpus — the
    composition property a live search release depends on (scoring the
    raw corpus would double-count duplicate texts in df/vocabulary
    statistics; the oracle would catch exactly that drift).

    Oracle: the entire composition in DuckDB, with the BM25 CTEs
    emitted by the SAME builder the bm25_topk oracle uses
    (retrieval_queries.bm25_ctes — one text, two consumers) and the
    NLL/RRF arithmetic mirrored from the lm_perplexity / rank_fusion
    twins token for token.

    Scale shape: one text-keyed shuffle (dedup window), then corpus
    statistics via the operators' existing broadcast paths; both
    rankers truncate to {RET_POOL} rows before fusion, so the fusion
    join and the final metadata join are constant-sized (the metadata
    join is ≤{RET_K} rows against the corpus — a broadcast-able probe).
    The deduped stage persists (MEMORY_AND_DISK): BM25 references it
    for stats + scores, the LM ranker for vocabulary + per-doc NLL,
    the release for metadata — Catalyst would otherwise re-run the
    dedup window once per consumer (the curation_release lesson)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.cache_registry import (
        persist_tracked,
    )
    from oracle_to_oracle_data_integration_pipeline_spark.operators.retrieval import (
        bm25_topk,
        unigram_nll,
    )
    from oracle_to_oracle_data_integration_pipeline_spark.operators.retrieval2 import (
        rrf_fuse,
    )
    from oracle_to_oracle_data_integration_pipeline_spark.queries.retrieval_queries import (
        BM25_TERMS,
    )

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    deduped = persist_tracked(
        docs.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__"),
        "retrieval_release",
    )
    a = bm25_topk(deduped, BM25_TERMS, k=RET_POOL).select("doc_id", "rank")
    wb = Window.orderBy(F.col("avg_nll").asc(), F.col("doc_id").asc())
    b = (
        unigram_nll(deduped)
        .orderBy(F.col("avg_nll").asc(), F.col("doc_id").asc())
        .limit(RET_POOL)
        .withColumn("rank", F.row_number().over(wb))
        .select("doc_id", "rank")
    )
    fused = rrf_fuse(a, b, k_out=RET_K, k_rrf=RET_KRRF)
    # fused is ≤RET_K rows; hint it explicitly so the metadata
    # re-attach is a broadcast probe even with AQE disabled or on a
    # conservative cluster (VERDICT r9: relying on AQE to discover the
    # tiny side shuffles the full deduped corpus when AQE is off)
    return (
        F.broadcast(fused).join(deduped.select("doc_id", "source", "n_chars"), "doc_id")
        .select(
            "doc_id",
            F.coalesce("rank_a", F.lit(0)).alias("rank_a"),
            F.coalesce("rank_b", F.lit(0)).alias("rank_b"),
            "rrf",
            "fused_rank",
            "source",
            "n_chars",
        )
    )


def _retrieval_release_sql() -> str:
    from oracle_to_oracle_data_integration_pipeline_spark.queries.retrieval_queries import (
        bm25_ctes,
    )

    return f"""
WITH deduped AS (
  SELECT doc_id, text, source, n_chars FROM (
    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn = 1
),
{bm25_ctes("deduped")},
ra AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS rank
    FROM scored
  ) WHERE rank <= {RET_POOL}
),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM deduped),
vocab AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
tot AS (SELECT sum(c) AS t_total FROM vocab),
nscored AS (
  SELECT t.doc_id,
         ln(CAST(t_total AS DOUBLE)) - ln(CAST(c AS DOUBLE)) AS nll
  FROM tok t JOIN vocab USING (tok), tot
),
nll AS (
  SELECT doc_id,
         round(CAST(sum(CAST(nll AS DECIMAL(24,6))) AS DOUBLE) / count(*), 6)
           AS avg_nll
  FROM nscored GROUP BY doc_id
),
rb AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY avg_nll ASC, doc_id) AS INT) AS rank
    FROM nll
  ) WHERE rank <= {RET_POOL}
),
f AS (
  SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
         ra.rank AS rank_a, rb.rank AS rank_b,
         floor(((CASE WHEN ra.rank IS NOT NULL
                      THEN 1.0 / ({RET_KRRF}.0 + ra.rank) ELSE 0.0 END)
              + (CASE WHEN rb.rank IS NOT NULL
                      THEN 1.0 / ({RET_KRRF}.0 + rb.rank) ELSE 0.0 END))
               * 1000000.0 + 0.5) / 1000000.0 AS rrf
  FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
),
top AS (SELECT * FROM f ORDER BY rrf DESC, doc_id LIMIT {RET_K})
SELECT t.doc_id,
       CAST(COALESCE(t.rank_a, 0) AS INT) AS rank_a,
       CAST(COALESCE(t.rank_b, 0) AS INT) AS rank_b,
       t.rrf,
       CAST(row_number() OVER (ORDER BY t.rrf DESC, t.doc_id) AS INT)
         AS fused_rank,
       d.source, d.n_chars
FROM top t JOIN deduped d USING (doc_id)
"""


SQL_RETRIEVAL_RELEASE = _retrieval_release_sql()

QUERIES["retrieval_release"] = q_retrieval_release
ORACLE_SQL["retrieval_release"] = SQL_RETRIEVAL_RELEASE
