"""LLM training-data operator queries + DuckDB oracles (the north-star
extension: dedup, similarity search, text analysis, multimodal
plumbing — SURVEY.md §2.10 / build-plan M5).

Shared SQL fragments mirror the Spark operators' tokenization exactly
(split on single space, 1-indexed n-gram windows, distinct shingles),
so both engines compute over identical intermediate sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.dedup import (
    connected_components,
    exact_dedup_groups,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
)
from oracle_to_oracle_data_integration_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    extract_media_metadata,
)
from oracle_to_oracle_data_integration_pipeline_spark.operators.similarity import (
    cosine_topk_bruteforce,
    lsh_topk,
    neardup_pairs_lsh,
)
from oracle_to_oracle_data_integration_pipeline_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_score,
    text_stats,
)
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load

JACCARD_THRESHOLD = 0.5
NEARDUP_COS = 0.4

# Shared DuckDB CTEs: tokenization + distinct 3-shingles + sizes.
# SHINGLE_BASE_SQL is the single source of truth for the shingle
# scheme; consumers add their own pair-intersection CTE on top
# (within-corpus d1<d2 here; cross-side in llm_queries4's
# minhash_incremental).
SHINGLE_BASE_SQL = """
toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             generate_series(1, greatest(len(ts) - 2, 0)),
             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS sh
  FROM toks
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
"""

SHINGLE_SQL = f"""{SHINGLE_BASE_SQL.rstrip()},
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
"""

SQL_JACCARD_PAIRS = f"""
WITH {SHINGLE_SQL}
SELECT d1, d2, round(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 6) AS jaccard
FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
WHERE round(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 6) >= {JACCARD_THRESHOLD}
"""


# -- qid: dedup_exact -------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup. The fixture has no exact duplicates, so the input
    is documents ∪ (doc_id < 100 re-sampled) — the operator must find
    exactly those 100 planted copies."""
    d = load(spark, sf_dir, "documents")
    both = d.select("doc_id", "text").union(d.filter(F.col("doc_id") < 100).select("doc_id", "text"))
    return exact_dedup_groups(both)


SQL_DEDUP_EXACT = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id, text FROM documents WHERE doc_id < 100
)
SELECT min(doc_id) AS rep_id, count(*) AS n_copies
FROM all_docs GROUP BY text HAVING count(*) > 1
"""


# -- qid: ngram_jaccard (exact near-dup baseline) ---------------------

def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(load(spark, sf_dir, "documents"), JACCARD_THRESHOLD)


# -- qid: minhash_estimate_audit (sketch accuracy gate) ---------------

MINHASH_EST_BOUND = 0.3


def q_minhash_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature-level accuracy audit of the MinHash sketch: for every
    exact near-dup pair (Jaccard ≥ 0.5), the match-fraction of the two
    16-component signatures must estimate the true Jaccard within
    ±0.3 (3+ sigma for 16 permutations at these similarities, and
    deterministic on fixed data). The exact Jaccard is the
    hash-compared payload; xxhash64 signatures exist only Spark-side,
    so the flag is the sketch-verification boolean (cf. hll_distinct).
    """
    from oracle_to_oracle_data_integration_pipeline_spark.operators.dedup import (
        NUM_PERM,
        minhash_signatures,
    )

    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, JACCARD_THRESHOLD)
    sig = minhash_signatures(docs)
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    matches = sum(
        (F.col(f"sa.h{i}") == F.col(f"sb.h{i}")).cast("int") for i in range(NUM_PERM)
    )
    return (
        pairs.join(sa, pairs.d1 == F.col("sa.doc_id"))
        .join(sb, pairs.d2 == F.col("sb.doc_id"))
        .select(
            pairs.d1.alias("id_a"),
            pairs.d2.alias("id_b"),
            pairs.jaccard,
            (
                F.abs(matches / F.lit(float(NUM_PERM)) - pairs.jaccard)
                <= F.lit(MINHASH_EST_BOUND)
            )
            .cast("int")
            .alias("est_within_bound"),
        )
    )


SQL_MINHASH_ESTIMATE_AUDIT = f"""
WITH {SHINGLE_SQL}
SELECT d1 AS id_a, d2 AS id_b,
       round(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 6) AS jaccard,
       CAST(1 AS INT) AS est_within_bound
FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
WHERE round(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 6) >= {JACCARD_THRESHOLD}
"""


# -- qid: minhash_dedup (LSH scale path, exact-verified) --------------

def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates verified with exact Jaccard — same
    contract as ngram_jaccard, so it shares the oracle; any LSH recall
    loss (p ≈ 1e-6 per planted pair) would surface as a row-count
    mismatch.

    pin="driver": the fixture pair list is tiny, and driver pinning
    frees all executor state per call so bench/driver repeat
    executions stay flat (operators/dedup.py pin docstring)."""
    return minhash_dedup_pairs(load(spark, sf_dir, "documents"), JACCARD_THRESHOLD, pin="driver")


# -- qid: dedup_components (pairs -> transitive dedup groups) ---------

def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs from the MinHash scale path, closed under
    transitivity: every document labeled with the min doc_id of its
    duplicate component (singletons label themselves)."""
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(docs, JACCARD_THRESHOLD)
    # minhash pairs are one row per (d1 < d2) by construction (the
    # verification join aggregates per pair), so the symmetrized edge
    # list is duplicate-free without a distinct
    return connected_components(
        pairs, "d1", "d2", nodes=docs, id_col="doc_id", edges_unique=True,
        edges_materialized=True,  # pairs arrive eagerly checkpointed
        shortcut="auto",          # near-clique graph: plain rounds win
    )


# Shared recursive-CTE chain: shingles -> threshold pairs -> symmetric
# edges -> transitive reach -> min-label components. Single source for
# SQL_DEDUP_COMPONENTS and SQL_NEARDUP_RESOLVE so the Jaccard
# predicate / recursion can never silently diverge between them.
COMPONENTS_SQL = f"""{SHINGLE_SQL.rstrip()},
pairs AS (
  SELECT d1, d2
  FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
  WHERE round(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 6) >= {JACCARD_THRESHOLD}
),
edges AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
reach AS (
  SELECT doc_id AS id, doc_id AS comp FROM documents
  UNION
  SELECT e.b AS id, r.comp FROM reach r JOIN edges e ON e.a = r.id
),
comps AS (SELECT id AS doc_id, min(comp) AS comp FROM reach GROUP BY id)
"""

SQL_DEDUP_COMPONENTS = f"""
WITH RECURSIVE {COMPONENTS_SQL}
SELECT doc_id, comp FROM comps
"""


# -- qid: neardup_resolve (end-to-end dedup: pairs -> groups -> reps) --

def q_neardup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole near-dup pipeline as one action list: MinHash-LSH
    pairs (scale path) → transitive components → keep-best
    representative per duplicate group (longest text, doc_id
    tiebreak). Emits one row per multi-member group: the doc to keep,
    the docs-to-drop count, and the group label — exactly what a
    curation job applies as an anti-join. Everything after the LSH
    pairs runs on the (tiny) component table; the rep selection is one
    window over group members."""
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(docs, JACCARD_THRESHOLD)
    comps = connected_components(
        pairs, "d1", "d2", nodes=docs, id_col="doc_id", edges_unique=True,
        edges_materialized=True, shortcut="auto",
    )
    sized = comps.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("comp").orderBy(F.desc("n_chars"), "doc_id")
    ranked = sized.withColumn("_rn", F.row_number().over(w))
    groups = (
        ranked.groupBy("comp")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max(F.when(F.col("_rn") == 1, F.col("doc_id"))).alias("rep_doc_id"),
        )
        .where(F.col("n_members") >= 2)
        .select("comp", "rep_doc_id", (F.col("n_members") - 1).alias("n_dropped"))
    )
    return groups


SQL_NEARDUP_RESOLVE = f"""
WITH RECURSIVE {COMPONENTS_SQL},
sized AS (
  SELECT c.comp, c.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY c.comp
                            ORDER BY d.n_chars DESC, c.doc_id) AS rn
  FROM comps c JOIN documents d USING (doc_id)
)
SELECT comp, max(CASE WHEN rn = 1 THEN doc_id END) AS rep_doc_id,
       count(*) - 1 AS n_dropped
FROM sized GROUP BY comp HAVING count(*) >= 2
"""


# -- qid: simhash_neardup (portable-hash differential oracle) ---------

def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup with ``portable=True``: the token hash is the
    first 60 bits of md5, which DuckDB reproduces bit-for-bit, so the
    whole pipeline — hash → sign-sum signature → 15-bit banding →
    popcount filter — has an exact SQL twin (was rows-only under
    xxhash64 through round 2)."""
    return simhash_neardup_pairs(
        load(spark, sf_dir, "documents"), max_hamming=3, portable=True
    ).withColumn("hamming", F.col("hamming").cast("int"))


# DuckDB twin of the portable simhash pipeline. The per-token hash
# decodes md5's first 15 hex chars positionally (60 bits, fits BIGINT);
# integer shifts keep every bit exact (doubles would truncate at 2^53).
_HEX_H = (
    "CAST(list_sum(list_transform(generate_series(1, 15), "
    "i -> CAST(instr('0123456789abcdef', substring(md5(tok), i, 1)) - 1 AS BIGINT)"
    " * (CAST(1 AS BIGINT) << ((15 - i) * 4)))) AS BIGINT)"
)
_BIT_SUMS = ", ".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}" for b in range(60)
)
_SIG_PACK = " + ".join(
    f"CASE WHEN s{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE CAST(0 AS BIGINT) END"
    for b in range(60)
)

SQL_SIMHASH_NEARDUP = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
hashed AS (SELECT doc_id, {_HEX_H} AS h FROM tok),
sums AS (SELECT doc_id, {_BIT_SUMS} FROM hashed GROUP BY doc_id),
sigs AS (SELECT doc_id, CAST({_SIG_PACK} AS BIGINT) AS sig FROM sums),
bands AS (
  SELECT doc_id, sig, b AS band_id, (sig >> (b * 15)) & 32767 AS band_val
  FROM sigs, (SELECT unnest([0, 1, 2, 3]) AS b)
)
SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""


# -- qid: text_stats --------------------------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats(load(spark, sf_dir, "documents"))


_STOPWORDS_SQL = "('the','a','of','and','to','in','is','it')"

SQL_TEXT_STATS = f"""
WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents)
SELECT doc_id,
       CAST(len(ts) AS INT) AS n_tokens,
       CAST(len(list_distinct(ts)) AS INT) AS n_distinct_tokens,
       CAST(length(text) AS INT) AS n_chars_measured,
       round(CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE) / len(ts), 6) AS avg_token_len,
       round(CAST(len(list_filter(ts, t -> t IN {_STOPWORDS_SQL})) AS DOUBLE) / len(ts), 6) AS stopword_ratio,
       round(CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts), 6) AS lexical_diversity
FROM toks
"""


# -- qid: quality_score -----------------------------------------------

def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(load(spark, sf_dir, "documents"))


SQL_QUALITY = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
feat AS (
  SELECT doc_id,
         CAST(len(ts) AS INT) AS n_tokens,
         CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) AS diversity,
         CAST(len(list_filter(ts, t -> t IN {_STOPWORDS_SQL})) AS DOUBLE) / len(ts) AS sw_ratio,
         CASE WHEN len(ts) BETWEEN 20 AND 400 THEN 1.0 ELSE 0.0 END AS length_ok
  FROM toks
)
SELECT doc_id, n_tokens,
       round(diversity, 6) AS diversity,
       round(sw_ratio, 6) AS stopword_ratio,
       round((length_ok + diversity + (1.0 - least(sw_ratio * 2, 1.0))) / 3, 6) AS quality
FROM feat
"""


# -- qid: lang_id -----------------------------------------------------

def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(load(spark, sf_dir, "documents"))


SQL_LANG_ID = f"""
WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents)
SELECT doc_id, lang AS labeled_lang,
       CAST(len(list_filter(ts, t -> t IN {_STOPWORDS_SQL})) AS INT) AS en_score,
       CASE WHEN len(list_filter(ts, t -> t IN {_STOPWORDS_SQL})) >= 3 THEN 'en' ELSE 'unknown' END AS predicted_lang
FROM toks
"""


# -- qid: langid_confusion --------------------------------------------

def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-evaluation step for the language-ID heuristic: confusion
    matrix of predicted vs fixture-labeled language. One groupBy over
    the scored corpus — the eval pattern every classifier-backed
    curation filter needs before it gates data."""
    pred = lang_id(load(spark, sf_dir, "documents"))
    return pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n")
    )


SQL_LANGID_CONFUSION = f"""
WITH pred AS ({SQL_LANG_ID})
SELECT labeled_lang, predicted_lang, count(*) AS n
FROM pred GROUP BY labeled_lang, predicted_lang
"""


# -- qid: doc_fingerprint ---------------------------------------------

def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load(spark, sf_dir, "documents"))


SQL_FINGERPRINT = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
SELECT doc_id,
       -- NULL text → NULL fingerprint (Spark's aggregate() propagates
       -- NULL arrays; DuckDB's list_prepend(0, NULL) would fold to 0 —
       -- fuzz find, tools/fuzz_parity.py nulls profile)
       CASE WHEN ts IS NULL THEN NULL ELSE
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(ts, t -> CAST(length(t) * 7 + ascii(substring(t, 1, 1)) AS BIGINT))),
         (a, b) -> (a * 31 + b) % 1000000007) END AS fingerprint
FROM toks
"""


# -- qid: cosine_topk (brute-force exact ANN baseline) ----------------

def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return cosine_topk_bruteforce(e, e.filter(F.col("vec_id") < 10), k=5)


SQL_COSINE_TOPK = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
  FROM c, q WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


# -- qid: embed_neardup -----------------------------------------------

NEARDUP_BANDS = 8
NEARDUP_BAND_PLANES = 4


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH candidate pairs + exact cosine verify — the scale
    path (equi-join on (band, bucket), no CartesianProduct node; see
    operators/similarity.neardup_pairs_lsh). The O(N²) brute force
    lives on only as the recall verifier in tests/test_llm_operators."""
    return neardup_pairs_lsh(
        load(spark, sf_dir, "embeddings"),
        NEARDUP_COS,
        n_bands=NEARDUP_BANDS,
        band_planes=NEARDUP_BAND_PLANES,
    )


def _sql_embed_neardup() -> str:
    """DuckDB twin mirrors the banding: same seeded hyperplanes inlined
    as DOUBLE[] literals, same any-band candidate rule, same
    distinct-pairs → exact-verify shape — so the approximate operator
    still gets a full value-hash check."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(64, NEARDUP_BANDS * NEARDUP_BAND_PLANES)
    band_cols = []
    for b in range(NEARDUP_BANDS):
        terms = []
        for i in range(NEARDUP_BAND_PLANES):
            p = planes[b * NEARDUP_BAND_PLANES + i]
            arr = "[" + ", ".join(repr(float(x)) for x in p) + "]"
            terms.append(
                f"CASE WHEN list_dot_product(ve, {arr}) >= 0 THEN {1 << i} ELSE 0 END"
            )
        band_cols.append(" + ".join(terms) + f" AS b{b}")
    any_band = " OR ".join(f"a.b{b} = c.b{b}" for b in range(NEARDUP_BANDS))
    sig_cols = ",\n       ".join(band_cols)
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
sig AS (
  SELECT vec_id, ve, sqrt(list_dot_product(ve, ve)) AS nrm,
       {sig_cols}
  FROM v
),
cand AS (
  SELECT DISTINCT a.vec_id AS d1, c.vec_id AS d2
  FROM sig a JOIN sig c ON a.vec_id < c.vec_id AND ({any_band})
)
SELECT d1, d2,
       round(list_dot_product(s1.ve, s2.ve) / (s1.nrm * s2.nrm), 6) AS cosine
FROM cand JOIN sig s1 ON d1 = s1.vec_id JOIN sig s2 ON d2 = s2.vec_id
WHERE round(list_dot_product(s1.ve, s2.ve) / (s1.nrm * s2.nrm), 6) >= {NEARDUP_COS}
"""


SQL_EMBED_NEARDUP = _sql_embed_neardup()


# -- qid: cosine_topk_lsh ---------------------------------------------

def q_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return lsh_topk(e, e.filter(F.col("vec_id") < 10), k=5)


def _lsh_bucket_sql(dim: int = 64, n_planes: int = 4) -> str:
    """DuckDB twin of ``lsh_bucket_col``: the hyperplanes are a
    deterministic seeded LCG, so the exact same plane doubles are
    inlined as SQL array literals (repr round-trips IEEE doubles; both
    engines take the dot-product sign on DOUBLE[] arithmetic)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.similarity import _hyperplanes

    terms = []
    for i, p in enumerate(_hyperplanes(dim, n_planes)):
        arr = "[" + ", ".join(repr(float(x)) for x in p) + "]"
        terms.append(f"CASE WHEN list_dot_product(ve, {arr}) >= 0 THEN {1 << i} ELSE 0 END")
    return " + ".join(terms)


SQL_COSINE_TOPK_LSH = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
b AS (SELECT vec_id, ve, {_lsh_bucket_sql()} AS bucket FROM v),
q AS (SELECT vec_id AS query_id, ve AS qv, bucket AS qbucket FROM b WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, ve AS cv, bucket FROM b),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
  FROM c JOIN q ON bit_count(xor(bucket, qbucket)) <= 1 AND query_id <> neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


# -- qid: multimodal_meta (mapInPandas plumbing vs arithmetic oracle) -

def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return extract_media_metadata(attach_binary_payload(d), fake=True)


SQL_MULTIMODAL = """
-- NULL text → NULL payload → NULL metadata row (missing-blob
-- propagation; fuzz find, tools/fuzz_parity.py nulls profile)
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       CAST(octet_length(encode(text)) % 64 + 1 AS INT) AS width,
       CAST(octet_length(encode(text)) % 37 + 1 AS INT) AS height,
       CASE WHEN text IS NULL THEN NULL ELSE 'fake' END AS fmt
FROM documents
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "ngram_jaccard": q_ngram_jaccard,
    "minhash_estimate_audit": q_minhash_estimate_audit,
    "minhash_dedup": q_minhash_dedup,
    "dedup_components": q_dedup_components,
    "neardup_resolve": q_neardup_resolve,
    "simhash_neardup": q_simhash_neardup,
    "text_stats": q_text_stats,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "langid_confusion": q_langid_confusion,
    "doc_fingerprint": q_fingerprint,
    "cosine_topk": q_cosine_topk,
    "embed_neardup": q_embed_neardup,
    "cosine_topk_lsh": q_cosine_topk_lsh,
    "multimodal_meta": q_multimodal_meta,
}

ORACLE_SQL = {
    "dedup_exact": SQL_DEDUP_EXACT,
    "ngram_jaccard": SQL_JACCARD_PAIRS,
    "minhash_estimate_audit": SQL_MINHASH_ESTIMATE_AUDIT,
    "minhash_dedup": SQL_JACCARD_PAIRS,  # LSH must reproduce the exact pairs
    "dedup_components": SQL_DEDUP_COMPONENTS,
    "neardup_resolve": SQL_NEARDUP_RESOLVE,
    "text_stats": SQL_TEXT_STATS,
    "quality_score": SQL_QUALITY,
    "lang_id": SQL_LANG_ID,
    "langid_confusion": SQL_LANGID_CONFUSION,
    "doc_fingerprint": SQL_FINGERPRINT,
    "cosine_topk": SQL_COSINE_TOPK,
    "cosine_topk_lsh": SQL_COSINE_TOPK_LSH,
    "embed_neardup": SQL_EMBED_NEARDUP,
    "multimodal_meta": SQL_MULTIMODAL,
    "simhash_neardup": SQL_SIMHASH_NEARDUP,
}
