"""Second-wave retrieval operators: inverted index construction,
reciprocal-rank fusion, OOV-rate scoring, and add-α bigram language
modeling.

All pure `pyspark.sql.functions` column algebra — no Python in the hot
path. Scale shapes:

- ``inverted_index``: one (term, doc_id) combinable count shuffle, one
  term-keyed stats aggregate, and a per-term top-N postings window that
  Spark rewrites to WindowGroupLimit — each partition keeps only N rows
  per term BEFORE the shuffle, so a stopword's million-document
  postings never materializes anywhere; the collect_list that builds
  the postings string sees at most N rows per term by construction.
- ``rrf_fuse``: consumes two already-truncated top-k rankings (each a
  TakeOrderedAndProject), so the fusion join and the final re-rank
  touch ≤ 2k rows regardless of corpus size.
- ``oov_rate``: vocabulary is a top-V truncation (TakeOrderedAndProject)
  broadcast back over the exploded token stream; the corpus side
  never shuffles for the membership probe — only the per-doc
  aggregation shuffles, with map-side partial counts.
- ``bigram_nll``: the bigram stream compacts to per-(doc, type) counts
  in one combinable shuffle; c(w₁w₂)/c(w₁·) derive from that
  vocabulary²-bounded table (exchange reuse — no second corpus
  explode) and broadcast back, so scoring is map-only over the
  compacted pairs.

Determinism: every ln-derived value is quantized through the portable
``floor(x·1e12 + 0.5)`` integer path before summation (exact,
order-independent), and every emitted ratio goes through ``pround`` —
the JVM/DuckDB libm 1-ulp gap cannot flip a hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.text import tokens_col, shingles_col
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import pround


def inverted_index(
    docs: DataFrame,
    top_postings: int = 8,
    min_df: int = 2,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Search-index build step: per term, document frequency, total
    term frequency, and the head of the postings list (top
    ``top_postings`` documents by tf desc, doc_id tiebreak) as a
    comma-joined string — strings, not arrays, so downstream
    row-canonicalizers (and the driver's hash compare) stay happy.

    df/total_tf aggregate over ALL postings; only the materialized
    list head is truncated. Terms with df < ``min_df`` are dropped
    (hapax terms dominate index size but never match a query).
    """
    tf = (
        docs.select(F.col(id_col), F.explode(tokens_col(text)).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
    )
    w = Window.partitionBy("term").orderBy(F.col("tf").desc(), F.col(id_col).asc())
    head = (
        tf.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= top_postings)
    )
    postings = head.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__rn__", id_col))),
                lambda s: s[id_col].cast("string"),
            ),
            ",",
        ).alias("postings")
    )
    return (
        stats.filter(F.col("df") >= min_df)
        .join(postings, "term")
        .select("term", "df", "total_tf", "postings")
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k_out: int = 10,
    k_rrf: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.) of two truncated
    rankings, each carrying (id, rank): score = Σ_lists 1/(k_rrf +
    rank), a document absent from a list contributes 0. Inputs are
    expected pre-truncated (top-k each), so everything after the
    two ranking scans is constant-sized.

    Output: id, rank_a, rank_b (NULL when absent), rrf (6 dp), and the
    fused rank (window over the k_out post-limit rows only).
    """
    a = ranked_a.select(F.col(id_col), F.col("rank").alias("rank_a"))
    b = ranked_b.select(F.col(id_col), F.col("rank").alias("rank_b"))
    j = a.join(b, id_col, "full_outer")
    contrib_a = F.when(
        F.col("rank_a").isNotNull(), F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("rank_a"))
    ).otherwise(F.lit(0.0))
    contrib_b = F.when(
        F.col("rank_b").isNotNull(), F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("rank_b"))
    ).otherwise(F.lit(0.0))
    scored = j.select(
        id_col, "rank_a", "rank_b", pround(contrib_a + contrib_b, 6).alias("rrf")
    )
    top = scored.orderBy(F.col("rrf").desc(), F.col(id_col).asc()).limit(k_out)
    w = Window.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    return top.withColumn("fused_rank", F.row_number().over(w))


def oov_rate(
    docs: DataFrame,
    vocab_size: int = 16,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_size`` token vocabulary (count desc, token tiebreak) —
    the classic cheap filter for boilerplate/garbled text before
    tokenizer training. Two passes over the token stream: one
    combinable count shuffle to pick the vocabulary, then a broadcast
    membership probe (map-only) + per-doc aggregate.
    """
    tok = docs.select(F.col(id_col), F.explode(tokens_col(text)).alias("tok"))
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("__in_vocab__"))
    )
    j = tok.join(F.broadcast(vocab), "tok", "left")
    n_tokens = F.count(F.lit(1))
    n_oov = F.sum(F.when(F.col("__in_vocab__").isNull(), 1).otherwise(0))
    return j.groupBy(id_col).agg(
        n_tokens.alias("n_tokens"),
        n_oov.cast("long").alias("n_oov"),
        pround(n_oov.cast("double") / n_tokens, 6).alias("oov_rate"),
    )


def bigram_nll(
    docs: DataFrame,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Per-document average negative log-likelihood under the corpus's
    own add-α smoothed bigram LM: P(w₂|w₁) = (c(w₁w₂)+α) / (c(w₁·)+α·V)
    where c(w₁·) counts w₁ as a left context and V is the unigram
    vocabulary size. The bigram upgrade of ``retrieval.unigram_nll`` —
    repetitive/templated text scores near zero, token salad scores
    high.

    Documents with fewer than 2 tokens have no bigrams and are absent
    from the output (their NLL is undefined).

    Shape: the raw bigram stream compacts to per-(doc, bigram-type)
    counts in ONE map-combinable shuffle; c(w₁w₂) and c(w₁·) are then
    derived from that counts table (its exchange is reused, never a
    second corpus scan+explode), so the corpus is exploded exactly
    once for bigrams plus once for the 1-row vocabulary-size scalar.

    Join strategy at scale: c(w₁·) is VOCABULARY-sized, so it gets an
    explicit broadcast hint. c(w₁w₂) is bigram-TYPE-sized — billions
    of rows on a web corpus, NOT broadcastable — so that join is left
    unhinted: AQE broadcasts it when it measures small and falls back
    to a skew-aware shuffled join when it doesn't. Deriving c12 as a
    ``Window.partitionBy(bg)`` sum was rejected: WindowExec
    materializes each key's partition, and a stopword bigram ("of
    the") puts a corpus-fraction in one partition; the groupBy is
    map-side combinable and therefore skew-safe.

    Per-occurrence nll is quantized ``floor(x·1e12 + 0.5)`` to a
    BIGINT (so n_bg occurrences contribute exactly n_bg·q — integer
    math, order-independent across any partial-agg tree); the final
    average is pround(…, 6). SQL twin sums the identical per-occurrence
    quantity from the un-compacted stream — exact-equal by integrality.
    """
    pair = (
        docs.select(
            F.col(id_col),
            F.explode(shingles_col(text, n=2, distinct=False)).alias("bg"),
        )
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("n_bg"))
    )
    c12 = pair.groupBy("bg").agg(F.sum("n_bg").alias("c12"))
    c1 = (
        c12.select(F.substring_index("bg", " ", 1).alias("w1"), "c12")
        .groupBy("w1")
        .agg(F.sum("c12").alias("c1"))
    )
    v = docs.select(F.explode(tokens_col(text)).alias("tok")).agg(
        F.countDistinct("tok").alias("v_size")
    )
    occ = (
        pair.join(c12, "bg")
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(v))
    )
    p = (F.col("c12") + F.lit(alpha)) / (F.col("c1") + F.lit(alpha) * F.col("v_size"))
    q12 = F.floor(-F.log(p) * F.lit(1e12) + F.lit(0.5)).cast("long")
    per_doc = occ.select(F.col(id_col), F.col("n_bg"), (q12 * F.col("n_bg")).alias("qn"))
    n = F.sum("n_bg")
    return per_doc.groupBy(id_col).agg(
        n.alias("n_bigrams"),
        pround(F.sum("qn").cast("double") / F.lit(1e12) / n, 6).alias("avg_nll"),
    )
