"""Corpus-distribution analytics qids: per-source KL divergence,
frequency-ranked vocabulary build, per-group winsorization.

These are the distribution-shift / feature-hygiene companions to the
mixture ops in operators/curation.py: `source_divergence` quantifies
how far each source's token distribution sits from the corpus (the
signal DoReMi-style reweighting consumes), `vocab_build` materializes
the token→id mapping a tokenizer training step needs, and `winsorize`
clips per-group outliers before scale-sensitive downstream stats.

Determinism: KL terms are portable-rounded to integer units of 1e-12
before the exact long sum (same rationale as operators/graph.py —
no double→decimal casts); percentiles round through `pround`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.text import tokens_col
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load, pround

# -- qid: source_divergence -------------------------------------------


def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(p_source ‖ p_corpus) over unigram distributions, one row per
    source. One (source,tok) count shuffle; the corpus marginal and
    totals re-aggregate from it (vocab-sized, broadcast back). At
    100 TB persist the (source,tok) counts once instead of letting the
    three consumers recompute the scan — the shuffle shape is
    unchanged."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens_col("text")).alias("tok"))
    st = tok.groupBy("source", "tok").agg(F.count("*").alias("c_st"))
    s_tot = st.groupBy("source").agg(F.sum("c_st").alias("t_s"))
    corpus = st.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    total = corpus.agg(F.sum("c_t").alias("t_all"))
    j = (
        st.join(s_tot, "source")
        .join(F.broadcast(corpus), "tok")
        .crossJoin(F.broadcast(total))
    )
    p = F.col("c_st") / F.col("t_s")
    q = F.col("c_t") / F.col("t_all")
    contrib = p * F.log(p / q)
    scaled = F.floor(contrib * F.lit(1e12) + F.lit(0.5))
    return (
        j.groupBy("source", "t_s")
        .agg((F.sum(scaled).cast("double") / F.lit(1e12)).alias("kl"))
        .select("source", F.col("t_s").alias("n_tokens"), "kl")
    )


SQL_SOURCE_DIVERGENCE = """
WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
st AS (SELECT source, tok, count(*) AS c_st FROM tok GROUP BY 1, 2),
s_tot AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS t_s FROM st GROUP BY 1),
corpus AS (SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
total AS (SELECT CAST(sum(c_t) AS BIGINT) AS t_all FROM corpus),
j AS (
  SELECT st.source, st.c_st, s_tot.t_s, corpus.c_t, total.t_all
  FROM st JOIN s_tot USING (source) JOIN corpus USING (tok), total
)
SELECT source, t_s AS n_tokens,
       CAST(sum(CAST(floor((c_st / t_s) * ln((c_st / t_s) / (c_t / t_all)) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS kl
FROM j GROUP BY source, t_s
"""


# -- qid: vocab_build --------------------------------------------------


VOCAB_MAX_V = 4096


def q_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked token→id vocabulary (id 0 = most frequent,
    count-desc with token tiebreak), capped at top-V — the mapping a
    tokenizer-training step consumes. The cap is
    ``orderBy().limit(V)`` → TakeOrderedAndProject (partial top-k per
    partition), so the id-minting rank window runs over at most V
    rows, never the unbounded full vocabulary — the web-scale plan the
    old docstring only promised. V=4096 exceeds every fixture's
    vocabulary, so results are identical to the uncapped form there."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens_col("text")).alias("tok"))
    counts = tok.groupBy("tok").agg(F.count("*").alias("n_occurrences"))
    top = counts.orderBy(F.col("n_occurrences").desc(), "tok").limit(VOCAB_MAX_V)
    w = Window.orderBy(F.col("n_occurrences").desc(), "tok")
    return top.select(
        F.col("tok").alias("token"),
        "n_occurrences",
        (F.row_number().over(w) - 1).alias("token_id"),
    )


SQL_VOCAB_BUILD = f"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
counts AS (SELECT tok, count(*) AS n_occurrences FROM tok GROUP BY tok),
top AS (SELECT * FROM counts ORDER BY n_occurrences DESC, tok LIMIT {VOCAB_MAX_V})
SELECT tok AS token, n_occurrences,
       CAST(row_number() OVER (ORDER BY n_occurrences DESC, tok) - 1 AS INT) AS token_id
FROM top
"""


# -- qid: winsorize ----------------------------------------------------


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source p05/p95 winsorization of document length: group
    percentiles via one small aggregate broadcast back over the table
    (map-only clip — the table never shuffles)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    stats = d.groupBy("source").agg(
        pround(F.expr("percentile(n_chars, 0.05)"), 6).alias("p05"),
        pround(F.expr("percentile(n_chars, 0.95)"), 6).alias("p95"),
    )
    j = d.join(F.broadcast(stats), "source")
    clipped = F.least(F.greatest(F.col("n_chars").cast("double"), F.col("p05")), F.col("p95"))
    was_clipped = (
        (F.col("n_chars") < F.col("p05")) | (F.col("n_chars") > F.col("p95"))
    ).cast("int")
    return j.select(
        "doc_id", "source", "n_chars",
        clipped.alias("clipped"),
        was_clipped.alias("was_clipped"),
    )


SQL_WINSORIZE = """
WITH stats AS (
  SELECT source,
         floor(quantile_cont(n_chars, 0.05) * 1000000.0 + 0.5) / 1000000.0 AS p05,
         floor(quantile_cont(n_chars, 0.95) * 1000000.0 + 0.5) / 1000000.0 AS p95
  FROM documents GROUP BY source
)
SELECT doc_id, d.source, n_chars,
       least(greatest(CAST(n_chars AS DOUBLE), p05), p95) AS clipped,
       CAST(CASE WHEN n_chars < p05 OR n_chars > p95 THEN 1 ELSE 0 END AS INT) AS was_clipped
FROM documents d JOIN stats ON d.source = stats.source
"""


# -- qid: bpe_train ----------------------------------------------------

BPE_MERGES = 5


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 5 BPE merges learned from the documents corpus — the
    tokenizer-training kernel itself (vocab-sized rounds, corpus
    touched once)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.text import bpe_train

    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load as _l

    return bpe_train(_l(spark, sf_dir, "documents"), "text", n_merges=BPE_MERGES)


def _bpe_chain(carry_word: bool) -> str:
    """The unrolled merge-learning CTE chain shared by the train and
    encode oracles: each round recomputes pair counts over the (tiny)
    vocabulary and applies the argmax merge with the same pipe-anchored
    replace. Mirrors operators/text.py::bpe_train token for token —
    same encode, same tiebreak (count desc, pair asc). ``carry_word``
    threads the source word through every v{r} so the encode oracle can
    join the fully-merged vocabulary back onto the corpus.
    """
    wcol = "w, " if carry_word else ""
    # admission runs on the RAW token (engine-portable bytes), lower()
    # only on the surviving pure-ASCII words — mirrors bpe_train's
    # filter-then-fold order (fuzz find, unicode profile: Java vs
    # utf8proc case mapping disagreed on 'İ' before the reorder)
    blocks = [f"""
WITH words AS (
  SELECT w, count(*) AS freq FROM (
    SELECT lower(w0) AS w FROM (
      SELECT unnest(string_split(text, ' ')) AS w0 FROM documents
    ) WHERE regexp_full_match(w0, '[a-zA-Z0-9]+')
  ) GROUP BY w
),
v0 AS (
  SELECT {wcol}freq,
         '|' || array_to_string(string_split(w, ''), '||') || '|' AS s
  FROM words
)"""]
    for r in range(1, BPE_MERGES + 1):
        blocks.append(f""",
p{r} AS (
  SELECT pair, sum(freq) AS cnt FROM (
    SELECT unnest(list_transform(range(1, len(t)),
                                 i -> t[i] || ' ' || t[i + 1])) AS pair,
           freq
    FROM (SELECT freq, list_filter(string_split(s, '|'), x -> x != '') AS t
          FROM v{r - 1})
    WHERE len(t) >= 2
  ) GROUP BY pair
),
b{r} AS (SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair LIMIT 1),
v{r} AS (
  SELECT {wcol}freq,
         replace(s,
                 '|' || split_part(b.pair, ' ', 1) || '||'
                     || split_part(b.pair, ' ', 2) || '|',
                 '|' || replace(b.pair, ' ', '') || '|') AS s
  FROM v{r - 1}, b{r} b
)""")
    return "".join(blocks)


def _bpe_sql() -> str:
    blocks = [_bpe_chain(carry_word=False)]
    selects = [
        f"SELECT {r} AS merge_rank, split_part(pair, ' ', 1) AS lhs, "
        f"split_part(pair, ' ', 2) AS rhs, CAST(cnt AS BIGINT) AS pair_count FROM b{r}"
        for r in range(1, BPE_MERGES + 1)
    ]
    blocks.append("\n" + "\nUNION ALL\n".join(selects))
    return "".join(blocks)


SQL_BPE_TRAIN = _bpe_sql()


# -- qid: bpe_encode ---------------------------------------------------

def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inference half of the tokenizer story: learn the 5 merges
    (control-plane, tiny), apply them to the distinct word vocabulary,
    broadcast the (word → token count) table over the corpus, and
    return per-doc word/BPE-token counts."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.text import (
        bpe_apply,
        bpe_train,
    )

    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load as _l

    docs = _l(spark, sf_dir, "documents")
    # merge application is order-sensitive: sort by the explicit rank,
    # never rely on collect() order
    merges = [
        (r["lhs"], r["rhs"])
        for r in sorted(
            bpe_train(docs, "text", n_merges=BPE_MERGES).collect(),
            key=lambda r: r["merge_rank"],
        )
    ]
    return bpe_apply(docs, merges)


def _bpe_encode_sql() -> str:
    return _bpe_chain(carry_word=True) + f""",
vt AS (
  SELECT w, len(list_filter(string_split(s, '|'), x -> x != '')) AS nt
  FROM v{BPE_MERGES}
),
ft AS (
  SELECT doc_id, lower(w0) AS w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w0 FROM documents
  ) WHERE regexp_full_match(w0, '[a-zA-Z0-9]+')
)
SELECT doc_id, count(*) AS n_words, CAST(sum(nt) AS BIGINT) AS n_bpe_tokens
FROM ft JOIN vt USING (w) GROUP BY doc_id
"""


SQL_BPE_ENCODE = _bpe_encode_sql()


QUERIES = {
    "source_divergence": q_source_divergence,
    "vocab_build": q_vocab_build,
    "winsorize": q_winsorize,
    "bpe_train": q_bpe_train,
    "bpe_encode": q_bpe_encode,
}

ORACLE_SQL = {
    "source_divergence": SQL_SOURCE_DIVERGENCE,
    "vocab_build": SQL_VOCAB_BUILD,
    "winsorize": SQL_WINSORIZE,
    "bpe_train": SQL_BPE_TRAIN,
    "bpe_encode": SQL_BPE_ENCODE,
}
