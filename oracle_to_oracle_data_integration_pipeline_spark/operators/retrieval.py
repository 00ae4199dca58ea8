"""Retrieval / scoring operators for training-data pipelines: BM25
ranking, unigram-LM quality scoring, kNN label classification, fuzzy
entity lookup.

All pure `pyspark.sql.functions` expressions (plus one broadcast join
each) — no Python in the hot path. Scale shapes:

- ``bm25_topk``: corpus stats are a ONE-ROW aggregate broadcast back
  over the per-doc projection; the documents table is scanned twice
  (once slim for stats, once for scoring) and never shuffled by key.
  The final top-k is ``orderBy(...).limit(k)`` — Spark's
  TakeOrderedAndProject, a distributed partial top-k per partition +
  driver merge of k·partitions rows, NOT a global sort.
- ``unigram_nll``: one shuffle to build the vocabulary (map-side
  combine on the token key), vocabulary broadcast back, one shuffle by
  doc_id for the per-doc average. At web scale the vocab join falls
  back to a shuffle join automatically if the broadcast threshold is
  exceeded — the plan stays valid either way.
- ``knn_classify``: reuses the bounded-query-set brute-force top-k
  (|Q|×N×dim with the query side broadcast — the big side never
  shuffles), then a votes aggregate over |Q|·k rows.
- ``fuzzy_lookup``: the probe set broadcasts; levenshtein runs
  JVM-side over the big table map-only; per-probe argmin is a window
  over |probes|·N slim rows — partitioned by probe, never global.

Determinism/oracle notes: ln() is the only non-IEEE-exact kernel used
(1-ulp libm differences possible between JVM and DuckDB); every
ln-derived value is rounded through the portable ``pround`` /
decimal-sum path before it can touch a comparison or a hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.text import _nsize, tokens_col
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import davg, pround


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 ranking of documents for a fixed query-term set.

    score(d) = Σ_t idf_t · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf_t = ln((N − df_t + 0.5)/(df_t + 0.5) + 1), both idf and the
    final score rounded half-up to 6 dp so the JVM/DuckDB libm ln()
    1-ulp gap cannot flip a hash or a rank.

    Output: doc_id, bm25, rank (top-k, score-desc with doc_id
    tiebreak).
    """
    toks = tokens_col("text")

    # NB: the lambda must take exactly ONE parameter — F.filter treats a
    # two-parameter callable as (element, index), so a `t=t` default
    # capture would silently bind t to the array index.
    def _eq(term):
        return lambda x: x == F.lit(term)

    # _nsize: a NULL document must carry NULL dl/tf (skipped by avg and
    # the df sum) exactly like the SQL twin — bare size() would inject
    # -1 sentinels into avgdl and the scores (fuzz find, nulls profile)
    tf_cols = [
        _nsize(F.filter(toks, _eq(t))).alias(f"tf_{i}") for i, t in enumerate(terms)
    ]
    base = docs.select("doc_id", _nsize(toks).alias("dl"), *tf_cols)

    # One-row corpus statistics: N, avgdl (exact integer sum / count),
    # and per-term document frequencies — all from the same slim
    # projection, broadcast back with a 1-row cross join.
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("int")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    j = base.crossJoin(F.broadcast(stats))

    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = pround(
            F.log(
                (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5) + 1.0
            ),
            6,
        )
        # Same association order as the SQL twin: idf * (tf*(k1+1) / denom)
        contrib = idf * (
            tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
        )
        score = contrib if score is None else score + contrib

    scored = j.select("doc_id", pround(score, 6).alias("bm25"))
    # TakeOrderedAndProject (partial top-k per partition), NOT a global
    # sort; the rank window then runs over only k rows.
    top = scored.orderBy(F.col("bm25").desc(), "doc_id").limit(k)
    w = Window.orderBy(F.col("bm25").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(w))


def unigram_nll(docs: DataFrame) -> DataFrame:
    """Unigram language-model quality score: per-document average
    negative log-likelihood under the corpus's own unigram
    distribution (the cheap stand-in for a KenLM perplexity filter —
    high avg-NLL documents are vocabulary outliers).

    p(t) = c(t)/T over the corpus, nll(t) = ln T − ln c(t); per-doc
    average goes through the decimal-sum path (per-term half-up
    rounding at 6 dp, exact associative sum) so partial-aggregation
    order can never flip the value.

    Output: doc_id, n_tokens, avg_nll.
    """
    tok = docs.select("doc_id", F.explode(tokens_col("text")).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count("*").alias("c"))
    totals = vocab.agg(F.sum("c").alias("t_total"))
    # no explicit broadcast hint on vocab: under the threshold Spark
    # broadcasts it anyway (plan test pins that), and above it the
    # planner falls back to a shuffle join instead of force-shipping a
    # web-scale vocabulary (an explicit hint would override the
    # threshold and OOM)
    scored = tok.join(vocab, "tok").crossJoin(F.broadcast(totals))
    nll = F.log(F.col("t_total").cast("double")) - F.log(F.col("c").cast("double"))
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        davg(nll, 6).alias("avg_nll"),
    )


def knn_classify(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 10,
) -> DataFrame:
    """k-nearest-neighbor label classification: the first ``n_queries``
    vectors are the query set, the rest the labeled candidate pool;
    each query takes the majority label of its k cosine-nearest
    candidates (tie → smallest label).

    UNLABELED candidates are excluded from the pool entirely — an
    example without a label cannot train a classifier, and letting a
    NULL-label group vote made the prediction depend on engine NULL
    ordering (Spark's ASC NULLS FIRST elected NULL, DuckDB's NULLS
    LAST a real label — fuzz find, nulls profile at seed 2). A query's
    true_label may still be NULL; that is data, not a vote.

    Output: query_id, predicted_label, votes, true_label.
    """
    from oracle_to_oracle_data_integration_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    q = embeddings.filter(F.col("vec_id") < n_queries)
    cand = embeddings.filter(
        (F.col("vec_id") >= n_queries) & F.col("label").isNotNull()
    )
    topk = cosine_topk_bruteforce(cand, q, k=k)
    # broadcast the |Q|·k top-k result against the full label table —
    # never the candidate pool, which is the big side at scale
    labeled = cand.select(F.col("vec_id").alias("neighbor_id"), "label").join(
        F.broadcast(topk), "neighbor_id"
    )
    votes = labeled.groupBy("query_id", "label").agg(F.count("*").alias("votes"))
    w = Window.partitionBy("query_id").orderBy(F.col("votes").desc(), "label")
    pred = votes.withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1)
    truth = q.select(F.col("vec_id").alias("query_id"), F.col("label").alias("true_label"))
    return pred.join(F.broadcast(truth), "query_id").select(
        "query_id",
        F.col("label").alias("predicted_label"),
        "votes",
        "true_label",
    )


def fuzzy_lookup(
    entities: DataFrame,
    probes: DataFrame,
    entity_id: str,
    entity_name: str,
) -> DataFrame:
    """Entity resolution by edit distance: for each probe string, the
    closest catalog name by levenshtein (id tiebreak). The probe set
    broadcasts; distance runs JVM-side over the big table as a
    map-only stage; per-probe argmin is a window partitioned by probe.

    Output: probe, <entity_id>, <entity_name>, dist.
    """
    j = entities.crossJoin(F.broadcast(probes))
    scored = j.select(
        "probe",
        entity_id,
        entity_name,
        F.levenshtein(F.col("probe"), F.col(entity_name)).cast("int").alias("dist"),
    )
    w = Window.partitionBy("probe").orderBy("dist", entity_id)
    return (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .drop("r")
    )
