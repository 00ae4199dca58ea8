"""Second LLM-data batch: realistic pipeline composites.

- dedup_keep_best: near-dup groups resolved by keeping the
  highest-quality member (dedup × quality scoring composite — what a
  training-data pipeline actually ships).
- ann_label_agreement: top-1 neighbor label agreement per label
  (FIXTURES.md "nearest-neighbor label-agreement checks").
- token_freq: corpus-level token frequency top-k.
- tfidf_top_term: per-doc top term by tf·(N/df) — log-free TF-IDF
  variant so the score arithmetic is engine-exact (ln is libm-
  dependent; N/df and the product are deterministic double ops).
- events_funnel: signup→purchase conversion per user cohort.
- sessionize: batch lag/gap-cumsum sessionization emitting session ids
  per event (the islands pattern; the streaming twin is
  session_window in streaming_queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.dedup import ngram_jaccard_pairs
from oracle_to_oracle_data_integration_pipeline_spark.operators.similarity import (
    cosine_topk_bruteforce,
    ivf_topk,
)
from oracle_to_oracle_data_integration_pipeline_spark.operators.text import (
    subword_count_col,
    token_count_col,
    tokens_col,
)
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import SESSION_GAP_S, epoch_seconds, load


# -- qid: dedup_keep_best ---------------------------------------------

def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected near-dup pairs → keep the longest member (tie: lowest
    doc_id), drop the rest. Union-find collapsed to one hop because the
    fixture plants pairs, not chains; output = dropped doc -> kept doc."""
    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, 0.5)
    lens = docs.select("doc_id", F.length("text").alias("len"))
    l1 = lens.select(F.col("doc_id").alias("d1"), F.col("len").alias("len1"))
    l2 = lens.select(F.col("doc_id").alias("d2"), F.col("len").alias("len2"))
    scored = pairs.join(l1, "d1").join(l2, "d2")
    keep_d1 = (F.col("len1") > F.col("len2")) | (
        (F.col("len1") == F.col("len2")) & (F.col("d1") < F.col("d2"))
    )
    return scored.select(
        F.when(keep_d1, F.col("d2")).otherwise(F.col("d1")).alias("dropped_id"),
        F.when(keep_d1, F.col("d1")).otherwise(F.col("d2")).alias("kept_id"),
    ).distinct()


SQL_DEDUP_KEEP_BEST = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             generate_series(1, greatest(len(ts) - 2, 0)),
             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS sh
  FROM toks
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2
),
pairs AS (
  SELECT d1, d2 FROM inter
  JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
  WHERE round(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 6) >= 0.5
),
lens AS (SELECT doc_id, length(text) AS len FROM documents)
SELECT DISTINCT
  CASE WHEN l1.len > l2.len OR (l1.len = l2.len AND d1 < d2) THEN d2 ELSE d1 END AS dropped_id,
  CASE WHEN l1.len > l2.len OR (l1.len = l2.len AND d1 < d2) THEN d1 ELSE d2 END AS kept_id
FROM pairs JOIN lens l1 ON l1.doc_id = d1 JOIN lens l2 ON l2.doc_id = d2
"""


# -- qid: ann_label_agreement -----------------------------------------

def q_ann_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    top1 = cosine_topk_bruteforce(e, e.filter(F.col("vec_id") < 50), k=1)
    q_lab = e.select(F.col("vec_id").alias("query_id"), F.col("label").alias("q_label"))
    n_lab = e.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label"))
    j = top1.join(q_lab, "query_id").join(n_lab, "neighbor_id")
    return j.groupBy("q_label").agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(F.when(F.col("q_label") == F.col("n_label"), 1).otherwise(0)).alias("n_agree"),
    )


SQL_ANN_LABEL_AGREEMENT = """
WITH q AS (SELECT vec_id AS query_id, label AS q_label, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 50),
c AS (SELECT vec_id AS neighbor_id, label AS n_label, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
scored AS (
  SELECT query_id, q_label, neighbor_id, n_label,
         round(list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
  FROM q, c WHERE query_id != neighbor_id
),
top1 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
    FROM scored
  ) WHERE rnk = 1
)
SELECT q_label, count(*) AS n_queries,
       CAST(sum(CASE WHEN q_label = n_label THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
FROM top1 GROUP BY q_label
"""


# -- qid: token_freq --------------------------------------------------

def q_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus tokens by frequency. The cut is
    ``orderBy().limit(20)`` → TakeOrderedAndProject (partial top-k per
    partition, k rows to the driver-side reducer) — the rank window
    then runs over only those 20 rows, never the full vocabulary (the
    bm25_topk pattern, operators/retrieval.py)."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens_col()).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.col("n").desc(), F.col("token")).limit(20)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return top.withColumn("rnk", F.row_number().over(w))


SQL_TOKEN_FREQ = """
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
counts AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
top AS (SELECT * FROM counts ORDER BY n DESC, token LIMIT 20)
SELECT token, n,
       CAST(row_number() OVER (ORDER BY n DESC, token) AS INT) AS rnk
FROM top
"""


# -- qid: tfidf_top_term ----------------------------------------------

def q_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top term by tf·(N/df). N/df is an exact double division
    of small ints, tf an int — the product is engine-deterministic
    (no logarithm). Ties: lexicographically first term."""
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    tok = docs.select("doc_id", F.explode(tokens_col()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.distinct().groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_, "token").select(
        "doc_id",
        "token",
        F.round(F.col("tf") * (F.lit(float(n_docs)) / F.col("df")), 6).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("doc_id", F.col("token").alias("top_term"), "score")
    )


SQL_TFIDF_TOP_TERM = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT token, count(*) AS df FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY token),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, token, round(tf * (n_docs / df), 6) AS score
  FROM tf JOIN df USING (token) CROSS JOIN n
)
SELECT doc_id, token AS top_term, score FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rnk FROM scored
) WHERE rnk = 1
"""


# -- qid: events_funnel -----------------------------------------------

def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion: users whose first purchase follows
    their first signup."""
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("first_signup").isNotNull(), 1).otherwise(0)).alias("n_signed_up"),
        F.sum(
            F.when(
                F.col("first_signup").isNotNull()
                & F.col("first_purchase").isNotNull()
                & (F.col("first_purchase") > F.col("first_signup")),
                1,
            ).otherwise(0)
        ).alias("n_converted"),
    )


SQL_EVENTS_FUNNEL = """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
)
SELECT count(*) AS n_users,
       CAST(sum(CASE WHEN first_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signed_up,
       CAST(sum(CASE WHEN first_signup IS NOT NULL AND first_purchase IS NOT NULL
                 AND first_purchase > first_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM firsts
"""


# -- qid: sessionize (batch islands) ----------------------------------

def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + gap>=threshold + cumulative sum → session id per event —
    the manual islands formulation (one shuffle on the key). Boundary
    NOTE: this qid deliberately starts a NEW session when the gap
    EQUALS the threshold (exclusive rule, same on both sides), which
    differs from Spark's built-in session_window (end-INCLUSIVE — see
    q_session_window_batch) exactly on exact-gap ties."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_sec = epoch_seconds(F.col("ts"))
    gap = ts_sec - F.lag(ts_sec, 1).over(w)
    new_s = F.when(gap.isNull() | (gap >= SESSION_GAP_S), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(new_s).over(run).alias("session_id"),
    )


SQL_SESSIONIZE = f"""
SELECT user_id, event_id, ts,
       CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
FROM (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) >= {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_s
  FROM events WHERE user_id < 30
)
"""


# -- qid: ivf_topk (inverted-file ANN: probe nearest cells only) ------

def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF complement to cosine_topk_lsh: cell partitioning by nearest
    centroid instead of hyperplane sign bits (operators/similarity.py
    ``ivf_topk`` docstring for the 100 TB cost shape)."""
    e = load(spark, sf_dir, "embeddings")
    return ivf_topk(e, e.filter(F.col("vec_id") < 10), k=5, n_cells=8, nprobe=2)


_COS = "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"

SQL_IVF_TOPK = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
cent AS (SELECT vec_id AS cid, ve AS cv FROM v WHERE vec_id < 8),
acell AS (
  SELECT v.vec_id, v.ve, cent.cid,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY {_COS.format(a='v.ve', b='cent.cv')} DESC, cent.cid) AS crank
  FROM v, cent
),
cells  AS (SELECT vec_id AS neighbor_id, ve AS cv2, cid FROM acell WHERE crank = 1),
probes AS (SELECT vec_id AS query_id, ve AS qv, cid FROM acell WHERE vec_id < 10 AND crank <= 2),
scored AS (
  SELECT query_id, neighbor_id, round({_COS.format(a='qv', b='cv2')}, 6) AS cosine
  FROM cells JOIN probes USING (cid)
  WHERE query_id <> neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


# -- qid: pii_scrub (redaction over synthesized PII) ------------------

def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/phone redaction. The fixture text is PII-free, so each row
    is first augmented with a deterministic synthetic email+phone built
    from doc_id (same construction in the oracle) — every row then
    exercises both patterns for real; the compare is on the full
    redacted string."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.text import (
        PII_EMAIL_PATTERN,
        redact_pii_col,
    )

    d = load(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call +1 (555) 010-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    a = d.select("doc_id", aug.alias("text"))
    return a.select(
        "doc_id",
        redact_pii_col("text").alias("redacted"),
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL_PATTERN)).alias("n_emails"),
    )


def _sql_pii_scrub() -> str:
    from oracle_to_oracle_data_integration_pipeline_spark.operators.text import (
        PII_EMAIL_PATTERN,
        PII_PHONE_PATTERN,
    )

    email = PII_EMAIL_PATTERN.replace("'", "''")
    phone = PII_PHONE_PATTERN.replace("'", "''")
    # DuckDB regexp_replace is first-match-only without the 'g' flag;
    # Spark's replaces all — 'g' restores equivalence.
    return f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or call +1 (555) 010-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(text, '{email}', '<EMAIL>', 'g'),
                      '{phone}', '<PHONE>', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '{email}')) AS INT) AS n_emails
FROM aug
"""


SQL_PII_SCRUB = _sql_pii_scrub()


# -- qid: repetition_filter (Gopher-style boilerplate detection) ------

def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-3-gram fraction per document; rows above 0.2 are
    boilerplate candidates. Fixture docs are mostly novel text, so
    every 7th doc is deterministically doubled (text || ' ' || text)
    in both engines to plant genuine repetition."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.text import (
        with_repetition_fraction,
    )

    d = load(spark, sf_dir, "documents")
    aug = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" "), F.col("text"))
    ).otherwise(F.col("text"))
    a = d.select("doc_id", aug.alias("text"))
    scored = with_repetition_fraction(a, "text", 3, out="__raw_frac")
    return (
        scored.select("doc_id", F.round(F.col("__raw_frac"), 6).alias("dup3_frac"))
        .filter(F.col("dup3_frac") > 0.2)
        .orderBy("doc_id")
    )


SQL_REPETITION_FILTER = """
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' ' || text ELSE text END AS text
  FROM documents
),
grams AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(ts) - 2),
                        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]) AS raw
  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM aug) t
  WHERE len(ts) >= 3
)
SELECT doc_id,
       round(1.0 - CAST(len(list_distinct(raw)) AS DOUBLE) / len(raw), 6) AS dup3_frac
FROM grams
WHERE 1.0 - CAST(len(list_distinct(raw)) AS DOUBLE) / len(raw) > 0.2
ORDER BY doc_id
"""


# -- qid: curation_pipeline (end-to-end corpus curation composite) ----

def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data curation chain in one plan: PII scrub →
    quality gate (length + lexical diversity) → exact dedup (keep
    lowest doc_id per distinct text) → per-language corpus summary
    with BPE token budget.

    Scale shape: scrub/gate/token-count are map-only; dedup is one
    shuffle keyed by the text hash; the summary reuses map-side
    partial aggregation. One wide stage total.
    """
    from oracle_to_oracle_data_integration_pipeline_spark.operators.text import (
        distinct_token_count_col,
        redact_pii_col,
        token_count_col,
    )

    d = load(spark, sf_dir, "documents")
    n_tok = token_count_col("text")
    diversity = distinct_token_count_col("text").cast("double") / n_tok
    gated = (
        d.select("doc_id", "lang", redact_pii_col("text").alias("text"))
        .withColumn("n_tok", n_tok)
        .filter((F.col("n_tok") >= 5) & (F.col("n_tok") <= 400) & (diversity > 0.5))
    )
    w = Window.partitionBy("text").orderBy("doc_id")
    deduped = gated.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        deduped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(subword_count_col("text").cast("long")).alias("total_bpe_tokens"),
        )
        .orderBy("lang")
    )


def _sql_curation_pipeline() -> str:
    from oracle_to_oracle_data_integration_pipeline_spark.operators.text import (
        BPE_ISH_PATTERN,
        PII_EMAIL_PATTERN,
        PII_PHONE_PATTERN,
        sql_ascii_lower,
    )

    email = PII_EMAIL_PATTERN.replace("'", "''")
    phone = PII_PHONE_PATTERN.replace("'", "''")
    bpe = BPE_ISH_PATTERN.replace("'", "''")
    return f"""
WITH scrubbed AS (
  SELECT doc_id, lang,
         regexp_replace(regexp_replace(text, '{email}', '<EMAIL>', 'g'),
                        '{phone}', '<PHONE>', 'g') AS text
  FROM documents
),
gated AS (
  SELECT doc_id, lang, text,
         len(string_split(text, ' ')) AS n_tok
  FROM scrubbed
  WHERE len(string_split(text, ' ')) BETWEEN 5 AND 400
    AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        / len(string_split(text, ' ')) > 0.5
),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM gated
  ) WHERE rn = 1
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(CAST(len(regexp_extract_all({sql_ascii_lower('text')}, '{bpe}')) AS BIGINT)) AS BIGINT) AS total_bpe_tokens
FROM deduped
GROUP BY lang
ORDER BY lang
"""


SQL_CURATION_PIPELINE = _sql_curation_pipeline()


# -- qid: token_count_bpe (whitespace vs BPE-ish budget) --------------

def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget estimation per document: whitespace tokens next to
    BPE-ish pre-tokenizer matches (operators/text.BPE_ISH_PATTERN).
    Pure JVM regex — at 100 TB this is a map-only pass, no shuffle."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_col("text").alias("n_ws_tokens"),
        subword_count_col("text").alias("n_bpe_tokens"),
    )


# The SQL twin is DERIVED from BPE_ISH_PATTERN (single quotes doubled
# for the SQL literal) so the two engines are guaranteed byte-identical
# pattern text; DuckDB default strings treat backslash literally, which
# is exactly what RE2 should see.
from oracle_to_oracle_data_integration_pipeline_spark.operators.text import BPE_ISH_PATTERN as _BPE
from oracle_to_oracle_data_integration_pipeline_spark.operators.text import sql_ascii_lower as _sal

SQL_TOKEN_COUNT_BPE = (
    "SELECT doc_id,\n"
    "       CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,\n"
    f"       CAST(len(regexp_extract_all({_sal('text')}, "
    f"'{_BPE.replace(chr(39), chr(39) * 2)}')) AS INT) AS n_bpe_tokens\n"
    "FROM documents"
)


# -- qid: split_assign (deterministic train/val/test) -----------------

def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 split by md5 hash bucket of doc_id — engine-portable and
    rerun-stable (operators/sampling.py)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.sampling import split_assign

    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return split_assign(d)


SQL_SPLIT_ASSIGN = """
SELECT doc_id, lang,
       CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
FROM (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 AS b
  FROM documents
)
"""


# -- qid: stratified_sample (exact k per stratum) ---------------------

def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 10 docs per language, chosen by stable pseudo-random
    (md5) order — balanced-corpus quota sampling."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.sampling import (
        stratified_topk,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_topk(d, "lang", k=10)


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
) WHERE rn <= 10
"""


# -- qid: decontaminate (train/eval n-gram overlap) -------------------

def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs sharing ≥5 distinct 3-grams with the src0 "eval"
    slice (the GPT-3/Pile 13-gram recipe, shrunk to the fixture's short
    texts). Eval shingle set broadcasts; the corpus is never
    shuffled."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.dedup import decontaminate

    d = load(spark, sf_dir, "documents")
    return decontaminate(
        d.filter(F.col("source") != "src0"),
        d.filter(F.col("source") == "src0"),
        n=3,
        min_overlap=5,
    )


SQL_DECONTAMINATE = """
WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents),
sh AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(
             generate_series(1, greatest(len(ts) - 2, 0)),
             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS sh
  FROM toks
),
ev AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0')
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_hit
FROM sh s JOIN ev ON s.sh = ev.sh
WHERE s.source <> 'src0'
GROUP BY s.doc_id
HAVING count(*) >= 5
"""


QUERIES = {
    "split_assign": q_split_assign,
    "stratified_sample": q_stratified_sample,
    "decontaminate": q_decontaminate,
    "dedup_keep_best": q_dedup_keep_best,
    "ann_label_agreement": q_ann_label_agreement,
    "token_freq": q_token_freq,
    "tfidf_top_term": q_tfidf_top_term,
    "events_funnel": q_events_funnel,
    "sessionize": q_sessionize,
    "ivf_topk": q_ivf_topk,
    "token_count_bpe": q_token_count_bpe,
    "pii_scrub": q_pii_scrub,
    "repetition_filter": q_repetition_filter,
    "curation_pipeline": q_curation_pipeline,
}

ORACLE_SQL = {
    "split_assign": SQL_SPLIT_ASSIGN,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "decontaminate": SQL_DECONTAMINATE,
    "dedup_keep_best": SQL_DEDUP_KEEP_BEST,
    "ann_label_agreement": SQL_ANN_LABEL_AGREEMENT,
    "token_freq": SQL_TOKEN_FREQ,
    "tfidf_top_term": SQL_TFIDF_TOP_TERM,
    "events_funnel": SQL_EVENTS_FUNNEL,
    "sessionize": SQL_SESSIONIZE,
    "ivf_topk": SQL_IVF_TOPK,
    "token_count_bpe": SQL_TOKEN_COUNT_BPE,
    "pii_scrub": SQL_PII_SCRUB,
    "repetition_filter": SQL_REPETITION_FILTER,
    "curation_pipeline": SQL_CURATION_PIPELINE,
}
