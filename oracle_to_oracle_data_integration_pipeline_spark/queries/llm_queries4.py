"""Corpus-curation qids: passage dedup, semantic dedup, mixture
sampling, budget selection, incremental dedup (operators/curation.py).

Each qid has a DuckDB oracle twin that mirrors the algorithm step for
step (same block quantization, same centroid convention, same md5
bucketing, same rounding points) so the driver's value-hash compare is
exact, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load, local_result
from oracle_to_oracle_data_integration_pipeline_spark.queries.llm_queries import _STOPWORDS_SQL


# -- qid: passage_dedup -----------------------------------------------

def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide repeated-passage removal at 8-token block
    granularity (Lee et al. 2022 shape); canonical first occurrence
    wins."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.curation import passage_dedup

    return passage_dedup(load(spark, sf_dir, "documents"), block_tokens=8)


SQL_PASSAGE_DEDUP = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents WHERE trim(text) <> ''
),
n AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) <= 8 THEN 1
              ELSE CAST(ceil((len(toks) - 8) / 8.0) AS INT) + 1 END AS n_chunks
  FROM t
),
c AS (
  SELECT doc_id, toks, unnest(generate_series(0, n_chunks - 1)) AS chunk_id
  FROM n
),
b AS (
  SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
         array_to_string(list_slice(toks, chunk_id * 8 + 1, chunk_id * 8 + 8), ' ') AS chunk_text
  FROM c
),
f AS (
  SELECT *, row_number() OVER (PARTITION BY chunk_text ORDER BY doc_id, chunk_id) AS occ
  FROM b
)
SELECT doc_id,
       CAST(count(*) AS INT) AS n_blocks,
       CAST(count(*) FILTER (occ = 1) AS INT) AS n_kept,
       coalesce(string_agg(chunk_text, ' ' ORDER BY chunk_id) FILTER (occ = 1), '') AS clean_text
FROM f GROUP BY doc_id
"""


# -- qid: semantic_dedup ----------------------------------------------

SEMDEDUP_COS = 0.4  # same fixture-calibrated threshold as embed_neardup
SEMDEDUP_CELLS = 8


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: within-centroid-cell near-duplicate marking — pair
    scoring never leaves a cell, so it cannot go quadratic in the
    corpus."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.curation import semantic_dedup

    return semantic_dedup(
        load(spark, sf_dir, "embeddings"), SEMDEDUP_COS, n_cells=SEMDEDUP_CELLS
    )


SQL_SEMANTIC_DEDUP = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (
  SELECT vec_id AS cid, v AS cv, sqrt(list_dot_product(v, v)) AS cn
  FROM e ORDER BY vec_id LIMIT {SEMDEDUP_CELLS}
),
assign AS (
  SELECT vec_id, v, vn, cid FROM (
    SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS vn, cent.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_dot_product(e.v, cent.cv)
                            / (sqrt(list_dot_product(e.v, e.v)) * cent.cn), 6) DESC,
                      cent.cid
           ) AS r
    FROM e, cent
  ) WHERE r = 1
),
dups AS (
  SELECT DISTINCT b.vec_id
  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.v, b.v) / (a.vn * b.vn), 6) >= {SEMDEDUP_COS}
)
SELECT a.vec_id, a.cid,
       (a.vec_id NOT IN (SELECT vec_id FROM dups)) AS kept
FROM assign a
"""


# -- qid: mixture_sample ----------------------------------------------

MIXTURE_BUDGET = 8000  # ~30% of the sf0.01 corpus token total
_UPWEIGHTED = ("src0", "src1", "src2", "src3", "src4")


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: five upweighted (3×) sources, the
    rest at weight 1, deterministic md5-ppm Bernoulli per doc."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.curation import mixture_sample

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        # nullif(-1): size(NULL)=-1 would poison per-source token sums
        # (fuzz find, nulls profile); the SQL twin yields NULL naturally
        F.nullif(F.size(F.split(F.trim("text"), r"\s+")), F.lit(-1)).alias("n_tokens")
    )
    out = mixture_sample(
        d, {s: 3.0 for s in _UPWEIGHTED}, MIXTURE_BUDGET
    )
    return out.select("doc_id", "source", "n_tokens", "rate_ppm")


SQL_MIXTURE_SAMPLE = f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_tokens
  FROM documents
),
a AS (
  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS avail,
         CASE WHEN source IN {_UPWEIGHTED} THEN 3.0 ELSE 1.0 END AS w
  FROM t GROUP BY source
),
r AS (
  SELECT source,
         least(CAST(1000000 AS BIGINT),
               CAST(floor((w / (SELECT sum(w) FROM a)) * {MIXTURE_BUDGET}.0
                          * 1000000.0 / avail) AS BIGINT)) AS rate_ppm
  FROM a
)
SELECT t.doc_id, t.source, t.n_tokens, r.rate_ppm
FROM t JOIN r USING (source)
WHERE CAST(('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000
      < r.rate_ppm
"""


# -- qid: mixture_temperature -----------------------------------------

def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-0.5 source rebalancing: keep-rate √(n_min/n_s) per
    source (the T5/mBERT alpha-sampling schedule at the largest size
    needing no upsampling), applied via the deterministic md5-ppm
    gate. One summary row per source."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.curation import (
        mixture_temperature,
    )

    return mixture_temperature(load(spark, sf_dir, "documents"))


SQL_MIXTURE_TEMPERATURE = """
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
m AS (SELECT min(n) AS nmin FROM c),
r AS (
  SELECT source, n AS n_docs,
         CAST(floor(sqrt(CAST(nmin AS DOUBLE) / CAST(n AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS rate_ppm
  FROM c, m
),
k AS (
  SELECT d.source, count(*) AS n_kept
  FROM documents d JOIN r ON d.source = r.source
  WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        % 1000000 < r.rate_ppm
  GROUP BY d.source
)
SELECT r.source, r.n_docs, r.rate_ppm,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
FROM r LEFT JOIN k ON r.source = k.source
"""


# -- qid: budget_select -----------------------------------------------

SELECT_BUDGET = 8000


def q_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-threshold selection to a token budget via score
    histogram — no global sort of the corpus."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.curation import budget_select
    from oracle_to_oracle_data_integration_pipeline_spark.operators.text import quality_score

    scored = quality_score(load(spark, sf_dir, "documents"))
    out = budget_select(scored, "quality", SELECT_BUDGET)
    return out.select("doc_id", "n_tokens", "quality", "score_bucket", "bucket_tokens")


SQL_BUDGET_SELECT = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
feat AS (
  SELECT doc_id,
         CAST(len(ts) AS INT) AS n_tokens,
         CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) AS diversity,
         CAST(len(list_filter(ts, t -> t IN {_STOPWORDS_SQL})) AS DOUBLE) / len(ts) AS sw_ratio,
         CASE WHEN len(ts) BETWEEN 20 AND 400 THEN 1.0 ELSE 0.0 END AS length_ok
  FROM toks
),
q AS (
  SELECT doc_id, n_tokens,
         round((length_ok + diversity + (1.0 - least(sw_ratio * 2, 1.0))) / 3, 6) AS quality
  FROM feat
),
withb AS (
  SELECT *, CAST(floor(quality * 1000) AS INT) AS score_bucket FROM q
),
agg AS (
  SELECT score_bucket, CAST(sum(n_tokens) AS BIGINT) AS bucket_tokens
  FROM withb GROUP BY score_bucket
),
kept AS (
  SELECT score_bucket, bucket_tokens FROM (
    SELECT *, sum(bucket_tokens) OVER (ORDER BY score_bucket DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM agg
  ) WHERE cum <= {SELECT_BUDGET}
)
SELECT w.doc_id, w.n_tokens, w.quality, w.score_bucket, k.bucket_tokens
FROM withb w JOIN kept k USING (score_bucket)
"""


# -- qid: dedup_incremental -------------------------------------------

def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch-vs-seen-corpus exact dedup (left-anti on content):
    overlapping id slices make the anti join non-vacuous on the
    fixture (docs 200-249 exist in both slices)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.curation import dedup_incremental

    d = load(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") < 250)
    seen = d.filter(F.col("doc_id") >= 200)
    return dedup_incremental(new, seen).select("doc_id", "source", "n_chars")


SQL_DEDUP_INCREMENTAL = """
SELECT doc_id, source, n_chars
FROM documents n
WHERE doc_id < 250
  AND NOT EXISTS (
    SELECT 1 FROM documents s WHERE s.doc_id >= 200 AND s.text = n.text
  )
"""


# -- qid: minhash_incremental -----------------------------------------

INCREMENTAL_CUT = 100  # new batch = doc_id < cut, seen corpus = the rest


def q_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup: new batch LSH-probed against the seen
    corpus's band index, cross-side candidates exact-verified at
    Jaccard ≥ JACCARD_THRESHOLD — the seen corpus never self-joins
    (operators/dedup.minhash_probe_pairs). The oracle is the exact
    cross-side Jaccard join, so any LSH recall loss on a true pair
    would surface as a row-count mismatch."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.dedup import (
        minhash_probe_pairs,
    )
    from oracle_to_oracle_data_integration_pipeline_spark.queries.llm_queries import (
        JACCARD_THRESHOLD,
    )

    d = load(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") < INCREMENTAL_CUT)
    seen = d.filter(F.col("doc_id") >= INCREMENTAL_CUT)
    return minhash_probe_pairs(new, seen, JACCARD_THRESHOLD, pin="driver")


def _minhash_incremental_sql() -> str:
    from oracle_to_oracle_data_integration_pipeline_spark.queries.llm_queries import (
        JACCARD_THRESHOLD,
        SHINGLE_BASE_SQL,
    )

    return f"""
WITH {SHINGLE_BASE_SQL.rstrip()},
inter AS (
  SELECT a.doc_id AS new_id, b.doc_id AS seen_id, count(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh
   AND a.doc_id < {INCREMENTAL_CUT} AND b.doc_id >= {INCREMENTAL_CUT}
  GROUP BY 1, 2
)
SELECT new_id, seen_id,
       round(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 6) AS jaccard
FROM inter
JOIN sizes s1 ON s1.doc_id = new_id
JOIN sizes s2 ON s2.doc_id = seen_id
WHERE round(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 6) >= {JACCARD_THRESHOLD}
"""


SQL_MINHASH_INCREMENTAL = _minhash_incremental_sql()


# -- qid: domain_cap --------------------------------------------------

DOMAIN_CAP_N = 15  # hard per-source ceiling (fixture: 25 docs/source)


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain frequency cap: keep at most DOMAIN_CAP_N docs per
    source, preferring the longest (n_chars DESC, doc_id tiebreak) —
    the hard ceiling against any single domain dominating the training
    mixture, complementing ``mixture_sample``'s rate-based reweighting.
    One window shuffle keyed by source."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.curation import domain_cap

    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return domain_cap(d, cap=DOMAIN_CAP_N, order_col="n_chars")


SQL_DOMAIN_CAP = f"""
SELECT doc_id, source, n_chars, domain_rank FROM (
  SELECT doc_id, source, n_chars,
         CAST(row_number() OVER (
              PARTITION BY source ORDER BY n_chars DESC, doc_id) AS INT)
           AS domain_rank
  FROM documents
) WHERE domain_rank <= {DOMAIN_CAP_N}
"""


# -- qid: order_index -------------------------------------------------

def q_order_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle-order index 0..N-1 over the corpus
    ("shuffle before training" as a reproducible column). Semantically
    ``row_number() OVER (ORDER BY md5(id), id) - 1`` — but computed as
    the two-pass distributed order index (md5-prefix bucket histogram
    → prefix-summed offsets broadcast → bucket-keyed local ranks), so
    no window ever sees more than max(|bucket|, 256) rows where the
    naive form single-partitions the corpus
    (operators/curation.global_order_index)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.curation import (
        global_order_index,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return global_order_index(d, buckets=256)


SQL_ORDER_INDEX = """
SELECT doc_id, lang, source,
       CAST(row_number() OVER (
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT)
         AS position
FROM documents
"""


# -- qid: weighted_sample ----------------------------------------------

WS_K = 64


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-proportional corpus sampling: k docs drawn WITHOUT
    replacement with inclusion probability ∝ n_chars — the standard
    "sample tokens, not documents" correction when sizing a data
    mixture (a uniform doc sample over-represents short docs). The
    Efraimidis–Spirakis exponential keys make it one global top-k
    (per-partition heaps; k rows per partition cross the wire) with
    md5-replayable draws (operators/sampling.weighted_sample_topk).
    """
    from oracle_to_oracle_data_integration_pipeline_spark.operators.sampling import (
        weighted_sample_topk,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample_topk(d, "n_chars", WS_K, id_col="doc_id")


SQL_WEIGHTED_SAMPLE = f"""
WITH k AS (
  SELECT doc_id, n_chars,
         floor(
           -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                     AS BIGINT) + 0.5) / CAST(power(16, 13) AS DOUBLE))
           / CAST(n_chars AS DOUBLE) * 1e12 + 0.5) / 1e12 AS sample_key
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
)
SELECT doc_id, n_chars, sample_key
FROM k ORDER BY sample_key, doc_id LIMIT {WS_K}
"""


# -- qid: shard_plan ---------------------------------------------------

SP_BUDGET = 16_000


def q_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-budget shard assignment in the md5-shuffled corpus order:
    each doc lands in the shard where its first byte falls, shards
    being consecutive 16 kB windows of the cumulative size.
    Semantically a global cumulative-sum window, computed as the
    two-pass bucket-histogram form (operators/curation.shard_plan) so
    no window ever sees more than max(|bucket|, 256) rows."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.curation import shard_plan

    return shard_plan(load(spark, sf_dir, "documents"), budget=SP_BUDGET, buckets=256)


SQL_SHARD_PLAN = f"""
WITH o AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS doc_bytes,
         CAST(COALESCE(SUM(CAST(n_chars AS BIGINT)) OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_before
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
)
SELECT doc_id, doc_bytes, cum_before,
       CAST(cum_before // {SP_BUDGET} AS BIGINT) AS shard,
       CAST(cum_before % {SP_BUDGET} AS BIGINT) AS offset_in_shard
FROM o
"""


# -- qid: quality_classifier (LR quality filter, 3 GD steps) ----------

_QC_POS = ["src0", "src1", "src2", "src3", "src4"]
_QC_ITERS = 3
_QC_LR = 0.1


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based quality filtering (the GPT-3/LLaMA curation
    pillar): fit a logistic-regression source classifier by 3
    distributed full-batch GD steps (operators/classifier.py — one
    combinable nano-quantized aggregation per step, weights
    driver-literalized like the k-means centroids), then report the
    fitted weights and the training cross-entropy. The DuckDB twin
    unrolls the identical 3 iterations, so the differential compare
    certifies the whole iterative fit bit-for-bit."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.classifier import (
        FEATURES,
        doc_features,
        logreg_fit,
        logreg_log_loss,
    )

    feats = doc_features(load(spark, sf_dir, "documents"), _QC_POS)
    w, _n = logreg_fit(feats, n_iter=_QC_ITERS, lr=_QC_LR)
    loss = logreg_log_loss(feats, w)
    rows = [(name, float(wj)) for name, wj in zip(FEATURES, w)]
    rows.append(("log_loss", loss))
    return local_result(spark, rows, "feature string, value double")


def _qc_oracle_sql(n_iter: int = _QC_ITERS, lr: float = _QC_LR) -> str:
    """Unrolled GD twin. Each iteration: nano-quantized gradient sums
    over the feature CTE at the PREVIOUS iteration's weights (scalar
    cross join), then the same floor-9 weight update."""
    pos = ", ".join(f"'{s}'" for s in _QC_POS)
    feats = f"""f AS (
  SELECT CASE WHEN source IN ({pos}) THEN 1.0 ELSE 0.0 END AS y,
         1.0 AS x0,
         ln(n_chars + 1) - 6.0 AS x1,
         CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS DOUBLE) / n_chars AS x2,
         CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE) / n_chars AS x3
  FROM documents WHERE text IS NOT NULL AND n_chars > 0
)"""
    ctes = [feats]
    # iteration 0 weights are literal zeros
    w_exprs = ["0.0", "0.0", "0.0", "0.0"]
    for t in range(1, n_iter + 1):
        z = " + ".join(f"({w_exprs[j]}) * x{j}" for j in range(4)) if t == 1 else \
            " + ".join(f"w.w{j} * x{j}" for j in range(4))
        src = "f" if t == 1 else f"f, w{t - 1} w"
        sums = ",\n         ".join(
            f"sum(CAST(floor((1.0/(1.0+exp(-({z}))) - y) * x{j} * 1e9 + 0.5) AS BIGINT)) AS s{j}"
            for j in range(4)
        )
        ctes.append(f"g{t} AS (\n  SELECT count(*) AS n,\n         {sums}\n  FROM {src}\n)")
        prev = ["0.0"] * 4 if t == 1 else [f"w.w{j}" for j in range(4)]
        upds = ",\n         ".join(
            f"floor(({prev[j]} - {lr!r} * (g.s{j} / 1e9) / g.n) * 1e9 + 0.5) / 1e9 AS w{j}"
            for j in range(4)
        )
        wsrc = f"g{t} g" if t == 1 else f"g{t} g, w{t - 1} w"
        ctes.append(f"w{t} AS (\n  SELECT {upds}\n  FROM {wsrc}\n)")
    zf = " + ".join(f"w.w{j} * x{j}" for j in range(4))
    ctes.append(f"""p AS (
  SELECT y, 1.0/(1.0+exp(-({zf}))) AS pr FROM f, w{n_iter} w
)""")
    ctes.append("""loss AS (
  SELECT floor(sum(CAST(floor(-(y * ln(pr) + (1.0 - y) * ln(1.0 - pr)) * 1e9 + 0.5) AS BIGINT)) / 1e9 / count(*) * 1e6 + 0.5) / 1e6 AS v
  FROM p
)""")
    names = ["bias", "log_len_c", "vowel_ratio", "space_ratio"]
    sel = "\nUNION ALL\n".join(
        f"SELECT '{names[j]}' AS feature, w{j} AS value FROM w{n_iter}"
        for j in range(4)
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n" + sel +
        "\nUNION ALL\nSELECT 'log_loss' AS feature, v AS value FROM loss"
    )


SQL_QUALITY_CLASSIFIER = _qc_oracle_sql()


# -- qid: filtered_ann ------------------------------------------------

FA_K = 5
FA_NQ = 10
FA_LABELS = (0, 2, 4, 6, 8)   # the metadata predicate (pushable IN)
FA_NPROBE = 4                 # of 8 cells
FA_RECALL_MIN = 0.5           # audit floor on MEAN recall@k over queries


def q_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED vector search — ANN under a predicate
    (label IN {FA_LABELS}), the retrieval-with-ACL/date/tenant-filter
    staple that plain cosine_topk/ivf_topk don't cover. Semantics are
    PRE-filter (the only correct choice): the predicate applies to the
    corpus BEFORE cell assignment, so IVF cells contain only eligible
    vectors and top-k is never starved (post-filtering an unfiltered
    ANN result can return <k rows and misses eligible neighbors that
    weren't in the unfiltered top-k).

    Result = the EXACT filtered top-{FA_K} per query (rounded-cosine
    ranking, id tiebreak — cosine_topk's determinism contract), plus
    the sketch-style audit flag (timeseries sketch idiom): the
    deterministic IVF path (same filtered corpus, n_cells=8,
    nprobe={FA_NPROBE}, lowest-id centroids) must reach MEAN
    recall@{FA_K} ≥ {FA_RECALL_MIN} over the query set — the standard
    ANN benchmark metric; a per-query floor would be meaningless on
    the near-random fixture vectors, where one adversarial query can
    land all its true neighbors in unprobed cells at any nprobe < C.
    Measured mean recall: 0.70/0.78/0.92 at sf0.001/0.01/0.1 — the
    floor has ≥40% margin. Computed entirely Spark-side; the oracle
    recomputes the exact rows with a literal-true flag.

    Scale shape: the IN predicate pushes into the parquet scan
    (PushedFilters — gated in tests/test_plans.py), so at 100 TB the
    filter prunes row groups before any vector math; cell assignment
    is a broadcast of 8 centroids; the probe join shuffles by cell id
    only; the recall scalar is a 1-row broadcast join (bounded control
    plane). Exact brute force rides a broadcast of the 10-query set
    (the verifier shape, same as cosine_topk — production serves the
    IVF path alone)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
    )

    e = load(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("label").isin(*FA_LABELS))
    queries = e.filter(F.col("vec_id") < FA_NQ)
    exact = cosine_topk_bruteforce(corpus, queries, k=FA_K)
    approx = ivf_topk(corpus, queries, k=FA_K, n_cells=8, nprobe=FA_NPROBE)
    # recall denominator = |exact pairs| measured from data, NOT the
    # NQ·K literal: when the FILTERED corpus holds fewer than K
    # eligible neighbors, exact legitimately returns fewer rows and
    # dividing by NQ·K understates recall (the standard recall@k
    # definition divides by the true-neighbor count; fuzz find,
    # tools/fuzz_parity.py tiny profile with a 4-vector corpus)
    matched = exact.select("query_id", "neighbor_id").join(
        approx.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    recall = (
        exact.agg(F.count(F.lit(1)).alias("_n_true"))
        .crossJoin(matched.agg(F.count(F.lit(1)).alias("_n_hit")))
        .select(
            (
                (F.col("_n_true") == 0)
                | (
                    F.col("_n_hit").cast("double")
                    / F.col("_n_true").cast("double")
                    >= FA_RECALL_MIN
                )
            )
            .cast("int")
            .alias("ivf_recall_ok")
        )
    )
    return exact.join(F.broadcast(recall)).select(
        "query_id", "neighbor_id", "cosine", "rank", "ivf_recall_ok"
    )


SQL_FILTERED_ANN = f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {FA_NQ}),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE label IN {FA_LABELS}),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
               6) AS cosine
  FROM c, q WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank,
       CAST(1 AS INT) AS ivf_recall_ok
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {FA_K}
"""


# -- qid: curation_release (dedup → gate → mixture → shard, ONE plan) --

RELEASE_GATE = 0.5       # quality_score floor, same formula as budget_select
RELEASE_BUDGET = 6000    # mixture token budget over the gated corpus
RELEASE_SHARD = 8000     # shard byte budget (fixture corpus ≈ 150 kB)


def q_curation_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The release manifest a training run actually consumes, as ONE
    Spark plan with no driver round-trips: exact dedup (lowest doc_id
    per distinct text) → quality gate (``operators/text.quality_score``
    ≥ RELEASE_GATE) → domain-mixture sampling to RELEASE_BUDGET tokens
    (``operators/curation.mixture_sample``, 3× the five upweighted
    sources, md5-ppm deterministic) → byte-budget shard assignment in
    the md5-shuffled order (``operators/curation.shard_plan``, two-pass
    bucket histogram — no global window) → per-shard release card.

    This is the composition proof for the curation operators the
    registry already verifies individually: the oracle twin is the
    composition of their existing SQL twins, so a semantic drift in any
    stage (gate formula, ppm bucket, cumulative-order tie-break) breaks
    the value hash. Scale shape: one text-keyed shuffle (dedup), two
    doc_id equi-joins (metric re-attach; co-partitioned on the unique
    id), the mixture rate table broadcast, and shard_plan's
    histogram machinery — nothing single-partitions the corpus.

    Stage persistence is load-bearing, not an optimization: each
    downstream operator references its input DataFrame 2-3× (mixture's
    rate table, shard_plan's histogram, the final re-attach), and
    Catalyst does not dedupe common subplans — the unpersisted DAG
    re-scans documents 18× and re-runs the dedup window 18×
    (measured via tools/plan_fingerprints.py). MEMORY_AND_DISK
    persists on the stage outputs (deduped / gated / kept — each ≤ the
    corpus, the latter two ≤ the release budget) make every reuse an
    InMemoryTableScan, so execution scans the corpus once — exactly
    how a production curation run materializes between stages. (The
    textual plan fingerprint still counts 18 "Scan parquet" because
    each InMemoryTableScan REPRINTS its cached child plan; the
    execution-level proof is the flat repeat timings in
    tools/repeat_stability.py and the InMemoryTableScan nodes at every
    reuse point.) The caches are LRU-evictable and release-set-sized;
    like the shared shingle cache in operators/dedup.py they are not
    explicitly unpersisted — the returned DataFrame still references
    them, and eviction degrades to recompute, not wrong answers.
    """
    from pyspark.sql import Window

    from oracle_to_oracle_data_integration_pipeline_spark.operators.cache_registry import (
        persist_tracked,
    )
    from oracle_to_oracle_data_integration_pipeline_spark.operators.curation import (
        mixture_sample,
        shard_plan,
    )
    from oracle_to_oracle_data_integration_pipeline_spark.operators.text import quality_score

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    deduped = persist_tracked(
        d.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__"),
        "curation_release",
    )
    gated = persist_tracked(
        quality_score(deduped)
        .filter(F.col("quality") >= RELEASE_GATE)
        .select("doc_id", "n_tokens")
        .join(deduped.select("doc_id", "source", "n_chars"), "doc_id"),
        "curation_release",
    )
    kept = persist_tracked(
        mixture_sample(gated, {s: 3.0 for s in _UPWEIGHTED}, RELEASE_BUDGET),
        "curation_release",
    )
    shards = shard_plan(kept, budget=RELEASE_SHARD)
    return (
        shards.join(kept.select("doc_id", "source"), "doc_id")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("doc_bytes").cast("bigint").alias("shard_bytes"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .orderBy("shard")
    )


SQL_CURATION_RELEASE = f"""
WITH deduped AS (
  SELECT doc_id, source, n_chars, text FROM (
    SELECT doc_id, source, n_chars, text,
           row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn = 1
),
toks AS (
  SELECT doc_id, source, n_chars, string_split(text, ' ') AS ts FROM deduped
),
feat AS (
  SELECT doc_id, source, n_chars,
         CAST(len(ts) AS INT) AS n_tokens,
         CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) AS diversity,
         CAST(len(list_filter(ts, t -> t IN {_STOPWORDS_SQL})) AS DOUBLE)
           / len(ts) AS sw_ratio,
         CASE WHEN len(ts) BETWEEN 20 AND 400 THEN 1.0 ELSE 0.0 END AS length_ok
  FROM toks
),
gated AS (
  SELECT doc_id, source, n_chars, n_tokens FROM (
    SELECT *, round((length_ok + diversity
                     + (1.0 - least(sw_ratio * 2, 1.0))) / 3, 6) AS quality
    FROM feat
  ) WHERE quality >= {RELEASE_GATE}
),
a AS (
  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS avail,
         CASE WHEN source IN {_UPWEIGHTED} THEN 3.0 ELSE 1.0 END AS w
  FROM gated GROUP BY source
),
r AS (
  SELECT source,
         least(CAST(1000000 AS BIGINT),
               CAST(floor((w / (SELECT sum(w) FROM a)) * {RELEASE_BUDGET}.0
                          * 1000000.0 / avail) AS BIGINT)) AS rate_ppm
  FROM a
),
kept AS (
  SELECT g.doc_id, g.source, g.n_chars
  FROM gated g JOIN r USING (source)
  WHERE CAST(('0x' || substr(md5(CAST(g.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        % 1000000 < r.rate_ppm
),
o AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS doc_bytes,
         CAST(COALESCE(SUM(CAST(n_chars AS BIGINT)) OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_before
  FROM kept WHERE n_chars IS NOT NULL AND n_chars > 0
)
SELECT CAST(cum_before // {RELEASE_SHARD} AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_bytes) AS BIGINT) AS shard_bytes,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM o GROUP BY 1
"""


QUERIES = {
    "passage_dedup": q_passage_dedup,
    "curation_release": q_curation_release,
    "quality_classifier": q_quality_classifier,
    "weighted_sample": q_weighted_sample,
    "domain_cap": q_domain_cap,
    "order_index": q_order_index,
    "shard_plan": q_shard_plan,
    "minhash_incremental": q_minhash_incremental,
    "semantic_dedup": q_semantic_dedup,
    "mixture_sample": q_mixture_sample,
    "mixture_temperature": q_mixture_temperature,
    "budget_select": q_budget_select,
    "dedup_incremental": q_dedup_incremental,
    "filtered_ann": q_filtered_ann,
}

ORACLE_SQL = {
    "quality_classifier": SQL_QUALITY_CLASSIFIER,
    "curation_release": SQL_CURATION_RELEASE,
    "passage_dedup": SQL_PASSAGE_DEDUP,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "domain_cap": SQL_DOMAIN_CAP,
    "order_index": SQL_ORDER_INDEX,
    "shard_plan": SQL_SHARD_PLAN,
    "minhash_incremental": SQL_MINHASH_INCREMENTAL,
    "semantic_dedup": SQL_SEMANTIC_DEDUP,
    "mixture_sample": SQL_MIXTURE_SAMPLE,
    "mixture_temperature": SQL_MIXTURE_TEMPERATURE,
    "budget_select": SQL_BUDGET_SELECT,
    "dedup_incremental": SQL_DEDUP_INCREMENTAL,
    "filtered_ann": SQL_FILTERED_ANN,
}
