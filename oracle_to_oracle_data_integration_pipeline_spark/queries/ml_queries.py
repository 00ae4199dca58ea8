"""Round-5 analytics/ML wave: a trained generative classifier
(multinomial naive Bayes), offline changepoint detection (CUSUM),
market-basket association rules, a grouping-sets corpus release card,
and per-source distribution-shift (smoothed KL divergence).

These extend the engine beyond the reference's CDC data plane into
the model-adjacent operations a large-scale training-data pipeline
runs (the reference has no ML surface at all; reference parity for
the data plane lives in queries/cdc_queries.py and friends). The
discriminative counterpart (logistic regression by distributed GD)
is operators/classifier.py; naive Bayes is the generative one whose
FIT is pure aggregation — the most Spark-native classifier there is.

Determinism contract (shared with bigram_lm_score / embed_gram):
every log-probability is quantized to integer 1e-12 units
(``floor(ln(...)·1e12 + 0.5)`` as BIGINT) the moment it is computed,
all sums/argmaxes happen in exact integer arithmetic, and only the
final presentation column divides back to a rounded double. Integer
sums are associative, so any partial-agg tree — Spark's map-side
combine at 100 TB or DuckDB's single-node scan — produces identical
bits, and the winning class of an argmax can never flip on a 1-ulp
float boundary.

Scale notes:
- ``naive_bayes``: fit = two combinable aggregations over the train
  tokens (per-class-token counts, per-class totals); model size is
  O(|V|·C), joined to the test tokens on the token key — the one
  real shuffle. Class metadata (priors, unseen mass) is C rows,
  broadcast. Nothing is ever collected per row.
- ``cusum_changepoint``: all four window functions share ONE
  per-user exchange (same partition key); the scaled statistic
  n·prefix − i·total avoids division entirely, so the argmax is
  integer-exact. At 100 TB the BIGINT cent-units bound the series
  length per key (~2^63/max|v|·n rows); go DECIMAL(38) past that.
- ``assoc_rules``: baskets are built with one groupBy; the pair
  explosion is a codegen array lambda bounded by (items/basket)², a
  fixture-bounded ≤ C(25,2); item counts (≤ |brand domain| rows)
  broadcast to the rule join. No self-join of the fact table.
- ``corpus_card``: one scan, GROUPING SETS expand ×3, all aggs
  combinable (count-distinct is Spark's standard two-phase expand).
- ``kl_divergence``: the absent-token mass is closed-formed from one
  GLOBAL aggregate (Σ ln-terms over the corpus vocabulary) minus the
  per-source present-token aggregate — the naive source×|V| expansion
  never materializes, so cost is O(Σ_s |V_s|), not O(S·|V|).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.sampling import hash_bucket_col
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load, pround


def _q12(x: Column) -> Column:
    """Quantize a double log-term to exact integer 1e-12 units —
    floor(x·1e12 + 0.5) as BIGINT, the module's single rounding
    convention (SQL twin: CAST(floor(x*1e12+0.5) AS BIGINT))."""
    return F.floor(x * F.lit(1e12) + F.lit(0.5)).cast("bigint")


# -- qid: naive_bayes --------------------------------------------------

NB_TRAIN_PCT = 80  # md5 buckets < 80 train, >= 80 test (engine-stable)


def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes (add-1 smoothing) predicting ``lang``
    from document tokens, fit on a deterministic 80% md5 split and
    scored on the held-out 20%.

    Fit is nothing but groupBy aggregation — class priors from doc
    counts, token likelihoods from (class, token) counts over a
    shared vocabulary — so the "training" is exactly as distributed
    and combinable as a word count. Scoring joins the held-out
    token bag with the likelihood table on the token key and argmaxes
    the integer-quantized log-posterior per document (ties break to
    the lexicographically first class). Tokens unseen for a class
    fall back to the class's smoothed unseen mass via coalesce after
    a left join — no special-casing, no second pass."""
    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    docs = docs.withColumn("bkt", hash_bucket_col(F.col("doc_id"), 100))
    train = docs.filter(F.col("bkt") < NB_TRAIN_PCT)
    test = docs.filter(F.col("bkt") >= NB_TRAIN_PCT)

    tok_tr = (
        train.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    # every model statistic derives from ONE (class, token) counts
    # table — n_c is its per-class sum, V its distinct-token count —
    # so the corpus tokens are counted exactly once; the three
    # identical cnt_tc subtrees collapse to one via AQE stage reuse
    # (pinned on the final adaptive plan by test_plans.py)
    cnt_tc = tok_tr.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c_tc"))
    tok_per_class = cnt_tc.groupBy("lang").agg(F.sum("c_tc").alias("n_c"))
    vocab = cnt_tc.agg(F.countDistinct("tok").alias("v_size"))
    docs_per_class = train.groupBy("lang").agg(F.count(F.lit(1)).alias("d_c"))
    docs_total = docs_per_class.agg(F.sum("d_c").alias("d_tot"))

    # C rows of class metadata: log prior and the smoothed unseen mass
    classes = (
        tok_per_class.join(docs_per_class, "lang")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(docs_total))
        .select(
            F.col("lang").alias("cls"),
            _q12(
                F.log(F.col("d_c").cast("double") / F.col("d_tot").cast("double"))
            ).alias("prior_q"),
            _q12(
                F.log(F.lit(1.0) / (F.col("n_c") + F.col("v_size")).cast("double"))
            ).alias("unseen_q"),
            (F.col("n_c") + F.col("v_size")).alias("denom"),
        )
    )

    # model: (class, token) -> quantized log P(token | class)
    lik = (
        cnt_tc.join(
            F.broadcast(classes.select(F.col("cls").alias("lang"), "denom")), "lang"
        )
        .select(
            F.col("lang").alias("l_cls"),
            F.col("tok").alias("l_tok"),
            _q12(
                F.log((F.col("c_tc") + 1).cast("double") / F.col("denom").cast("double"))
            ).alias("ll_q"),
        )
    )

    # held-out token bags, pre-aggregated so the model join carries
    # one row per (doc, distinct token), not per occurrence
    tt = (
        test.select(
            "doc_id",
            F.col("lang").alias("actual"),
            F.explode(F.split("text", " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "actual", "tok")
        .agg(F.count(F.lit(1)).alias("n_dt"))
    )

    terms = (
        tt.crossJoin(F.broadcast(classes.select("cls", "prior_q", "unseen_q")))
        .join(
            lik,
            (F.col("tok") == F.col("l_tok")) & (F.col("cls") == F.col("l_cls")),
            "left",
        )
        .select(
            "doc_id",
            "actual",
            "cls",
            "prior_q",
            (F.col("n_dt") * F.coalesce(F.col("ll_q"), F.col("unseen_q"))).alias(
                "term_q"
            ),
        )
    )
    scores = (
        terms.groupBy("doc_id", "actual", "cls", "prior_q")
        .agg(F.sum("term_q").alias("s_q"))
        .select(
            "doc_id", "actual", "cls", (F.col("prior_q") + F.col("s_q")).alias("score_q")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_q").desc(), F.col("cls").asc()
    )
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "actual",
            F.col("cls").alias("predicted"),
            "score_q",
            F.when(F.col("cls") == F.col("actual"), 1).otherwise(0).alias("is_correct"),
        )
    )


SQL_NAIVE_BAYES = f"""
WITH d AS (
  SELECT doc_id, lang, text,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 AS bkt
  FROM documents WHERE text IS NOT NULL
),
tr AS (SELECT * FROM d WHERE bkt < {NB_TRAIN_PCT}),
te AS (SELECT * FROM d WHERE bkt >= {NB_TRAIN_PCT}),
tok_tr AS (
  SELECT lang, tok FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS tok FROM tr
  ) WHERE tok <> ''
),
cnt_tc AS (SELECT lang, tok, count(*) AS c_tc FROM tok_tr GROUP BY 1, 2),
n_c AS (SELECT lang, count(*) AS n_c FROM tok_tr GROUP BY 1),
v AS (SELECT count(DISTINCT tok) AS v_size FROM tok_tr),
d_c AS (SELECT lang, count(*) AS d_c FROM tr GROUP BY 1),
d_tot AS (SELECT count(*) AS d_tot FROM tr),
classes AS (
  SELECT n_c.lang AS cls,
         CAST(floor(ln(CAST(d_c AS DOUBLE) / CAST(d_tot AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) AS prior_q,
         CAST(floor(ln(1.0 / CAST(n_c + v_size AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) AS unseen_q,
         n_c + v_size AS denom
  FROM n_c JOIN d_c USING (lang), v, d_tot
),
lik AS (
  SELECT c.lang AS l_cls, c.tok AS l_tok,
         CAST(floor(ln(CAST(c_tc + 1 AS DOUBLE) / CAST(denom AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) AS ll_q
  FROM cnt_tc c JOIN classes k ON c.lang = k.cls
),
tt AS (
  SELECT doc_id, actual, tok, count(*) AS n_dt FROM (
    SELECT doc_id, lang AS actual, unnest(string_split(text, ' ')) AS tok FROM te
  ) WHERE tok <> '' GROUP BY 1, 2, 3
),
terms AS (
  SELECT tt.doc_id, tt.actual, k.cls, k.prior_q,
         tt.n_dt * coalesce(l.ll_q, k.unseen_q) AS term_q
  FROM tt CROSS JOIN classes k
  LEFT JOIN lik l ON l.l_tok = tt.tok AND l.l_cls = k.cls
),
scores AS (
  SELECT doc_id, actual, cls,
         CAST(prior_q + sum(term_q) AS BIGINT) AS score_q
  FROM terms GROUP BY doc_id, actual, cls, prior_q
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_q DESC, cls ASC) AS rn
  FROM scores
)
SELECT doc_id, actual, cls AS predicted, score_q,
       CASE WHEN cls = actual THEN 1 ELSE 0 END AS is_correct
FROM ranked WHERE rn = 1
"""


# -- qid: cusum_changepoint --------------------------------------------

def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM changepoint per user over the event series: the
    index i maximizing |n·prefix_i − i·total| — the scaled form of
    max |Σ_{j≤i}(v_j − mean)| that needs NO division, so the whole
    detection runs in exact BIGINT cent-units and the argmax can
    never flip on a float boundary (ties break to the earliest
    index). The classic mean-shift detector for sensor/metric feeds.

    All four windows (row number, prefix sum, per-key count/total)
    and the final argmax rank share the single per-user exchange —
    one shuffle end to end."""
    e = load(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("vq"),
    )
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_all = Window.partitionBy("user_id")
    cur = (
        base.withColumn("i", F.row_number().over(w_ord))
        .withColumn(
            "pfx", F.sum("vq").over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn("n_u", F.count(F.lit(1)).over(w_all))
        .withColumn("tot", F.sum("vq").over(w_all))
        .withColumn(
            "abs_t", F.abs(F.col("n_u") * F.col("pfx") - F.col("i") * F.col("tot"))
        )
    )
    w_pick = Window.partitionBy("user_id").orderBy(
        F.col("abs_t").desc(), F.col("i").asc()
    )
    peak = pround(
        F.col("abs_t").cast("double") / (F.col("n_u") * 100).cast("double")
    )
    return (
        cur.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("n_u").alias("n_events"),
            F.col("i").alias("cp_index"),
            F.col("abs_t").alias("peak_q"),
            peak.alias("peak"),
        )
    )


SQL_CUSUM_CHANGEPOINT = """
WITH b AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq
  FROM events
),
c AS (
  SELECT user_id, event_id,
         row_number() OVER w AS i,
         CAST(sum(vq) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pfx,
         count(*) OVER (PARTITION BY user_id) AS n_u,
         CAST(sum(vq) OVER (PARTITION BY user_id) AS BIGINT) AS tot
  FROM b
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
t AS (
  SELECT user_id, CAST(i AS INT) AS i, n_u,
         abs(n_u * pfx - i * tot) AS abs_t
  FROM c
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY abs_t DESC, i ASC) AS rn
  FROM t
)
SELECT user_id, CAST(n_u AS BIGINT) AS n_events, i AS cp_index,
       CAST(abs_t AS BIGINT) AS peak_q,
       floor(CAST(abs_t AS DOUBLE) / CAST(n_u * 100 AS DOUBLE) * 1e6 + 0.5) / 1e6 AS peak
FROM r WHERE rn = 1
"""


# -- qid: assoc_rules --------------------------------------------------

AR_MIN_COUNT = 5  # min co-occurrence baskets for a rule to surface


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over orders: baskets = orders,
    items = part brands on the order's lines. Emits every directed
    rule A→B with ≥ AR_MIN_COUNT supporting baskets, with
    support / confidence / lift — the co-purchase analytics layer
    over the same join the TPC-H shapes use.

    Basket building is ONE groupBy(order); the pair expansion is a
    whole-stage-codegen array lambda over the sorted per-basket item
    set (never a self-join of the fact table), bounded by the brand
    domain. Item counts broadcast to the rule join: the fixture's
    brand domain is small and bounded; for an unbounded item domain
    swap the broadcast for a shuffle join — the shape holds."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = li.join(pt, li.l_partkey == pt.p_partkey).select(
        F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand")
    )
    baskets = items.groupBy("ok").agg(
        F.sort_array(F.collect_set("brand")).alias("bs")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(bs, (x, i) -> "
                "transform(slice(bs, i + 2, size(bs)), y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    c_ab = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_both"))
    c_item = (
        baskets.select(F.explode("bs").alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("c_item"))
    )
    n_b = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    directed = c_ab.select(
        F.col("a").alias("ant"), F.col("b").alias("cons"), "c_both"
    ).unionByName(
        c_ab.select(F.col("b").alias("ant"), F.col("a").alias("cons"), "c_both")
    )
    out = (
        directed.join(
            F.broadcast(
                c_item.select(F.col("brand").alias("ant"), F.col("c_item").alias("c_ant"))
            ),
            "ant",
        )
        .join(
            F.broadcast(
                c_item.select(
                    F.col("brand").alias("cons"), F.col("c_item").alias("c_cons")
                )
            ),
            "cons",
        )
        .crossJoin(F.broadcast(n_b))
        .filter(F.col("c_both") >= AR_MIN_COUNT)
    )
    support = pround(F.col("c_both").cast("double") / F.col("n_baskets").cast("double"))
    conf = pround(F.col("c_both").cast("double") / F.col("c_ant").cast("double"))
    lift = pround(
        (F.col("c_both").cast("double") * F.col("n_baskets").cast("double"))
        / (F.col("c_ant").cast("double") * F.col("c_cons").cast("double"))
    )
    return out.select(
        "ant",
        "cons",
        "c_ant",
        "c_cons",
        "c_both",
        "n_baskets",
        support.alias("support"),
        conf.alias("confidence"),
        lift.alias("lift"),
    )


SQL_ASSOC_RULES = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
n AS (SELECT count(DISTINCT ok) AS n_baskets FROM items),
ca AS (SELECT brand, count(*) AS c_item FROM items GROUP BY 1),
cab AS (
  SELECT x.brand AS a, y.brand AS b, count(*) AS c_both
  FROM items x JOIN items y ON x.ok = y.ok AND x.brand < y.brand
  GROUP BY 1, 2
),
directed AS (
  SELECT a AS ant, b AS cons, c_both FROM cab
  UNION ALL
  SELECT b AS ant, a AS cons, c_both FROM cab
)
SELECT ant, cons, a1.c_item AS c_ant, a2.c_item AS c_cons, c_both, n_baskets,
       floor(CAST(c_both AS DOUBLE) / CAST(n_baskets AS DOUBLE) * 1e6 + 0.5) / 1e6 AS support,
       floor(CAST(c_both AS DOUBLE) / CAST(a1.c_item AS DOUBLE) * 1e6 + 0.5) / 1e6 AS confidence,
       floor(CAST(c_both AS DOUBLE) * CAST(n_baskets AS DOUBLE)
             / (CAST(a1.c_item AS DOUBLE) * CAST(a2.c_item AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS lift
FROM directed
JOIN ca a1 ON a1.brand = ant
JOIN ca a2 ON a2.brand = cons, n
WHERE c_both >= {AR_MIN_COUNT}
"""


# -- qid: corpus_card --------------------------------------------------

def q_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus release card: per-source, per-language, and overall
    doc counts, token/char volumes, exact-duplicate rate (distinct
    md5(text) vs rows), and mean tokens per doc — the summary table a
    dataset release ships next to the shards (order_index/domain_cap
    produce the shards; this is the datasheet). ONE scan, GROUPING
    SETS expand ×3, every aggregate combinable.

    nullif(size(...), -1): Spark's size(NULL) is -1, which silently
    UNDERCOUNTED token sums by 1 per NULL document where the DuckDB
    twin's len(NULL) propagates NULL and is skipped by sum() — fuzz
    find, tools/fuzz_parity.py nulls profile."""
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import tune

    tune(spark)
    load(spark, sf_dir, "documents").createOrReplaceTempView("cc_documents")
    return spark.sql(
        """
        SELECT CASE WHEN grouping(source) = 0 THEN source ELSE '(all)' END AS src,
               CASE WHEN grouping(lang) = 0 THEN lang ELSE '(all)' END AS lng,
               count(*) AS n_docs,
               CAST(sum(nullif(size(split(text, ' ')), -1)) AS BIGINT) AS n_tokens,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               count(DISTINCT md5(text)) AS n_unique_texts,
               floor((1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS dup_rate,
               floor(CAST(sum(nullif(size(split(text, ' ')), -1)) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS mean_tokens
        FROM cc_documents
        GROUP BY GROUPING SETS ((source), (lang), ())
        """
    )


SQL_CORPUS_CARD = """
SELECT CASE WHEN grouping(source) = 0 THEN source ELSE '(all)' END AS src,
       CASE WHEN grouping(lang) = 0 THEN lang ELSE '(all)' END AS lng,
       count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       count(DISTINCT md5(text)) AS n_unique_texts,
       floor((1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS dup_rate,
       floor(CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS mean_tokens
FROM documents
GROUP BY GROUPING SETS ((source), (lang), ())
"""


# -- qid: kl_divergence ------------------------------------------------

def q_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution shift per source: KL(P_source ‖ P_corpus) over
    the add-1-smoothed unigram distributions — the domain-mixture
    diagnostic that tells you which source's token distribution
    diverges from the blend (feeds mixture_sample re-weighting).

    The naive form sums over the FULL vocabulary per source. Here the
    absent-token mass is closed-formed: Σ_{t∉s} needs only
    n_absent·ln(1/D_s) and (G_all − G_s), where G_all is ONE global
    scalar (Σ over the corpus vocabulary of the quantized global
    log-term) and G_s is the per-source sum over present tokens —
    already being aggregated. Cost is O(Σ_s |V_s|) join rows instead
    of O(S·|V|). Everything sums in exact q12 BIGINT units; KL·D_s
    stays integer until the single presentation division."""
    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = (
        docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    # the corpus tokens are counted ONCE into (source, token) cells;
    # global token counts, the vocabulary size, and per-source totals
    # are all rollups of that compact table (identical c_st subtrees
    # collapse via AQE stage reuse, pinned by test_plans.py)
    c_st = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c_st"))
    c_t = c_st.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    glob = c_t.agg(
        F.count(F.lit(1)).alias("v_size"), F.sum("c_t").alias("n_tot")
    )
    gq = c_t.crossJoin(F.broadcast(glob)).select(
        "tok",
        _q12(
            F.log(
                (F.col("c_t") + 1).cast("double")
                / (F.col("n_tot") + F.col("v_size")).cast("double")
            )
        ).alias("gq"),
    )
    g_all = gq.agg(F.sum("gq").alias("g_all"))
    src = c_st.groupBy("source").agg(
        F.sum("c_st").alias("n_s"), F.count(F.lit(1)).alias("v_s")
    )
    j = (
        c_st.join(gq, "tok")
        .join(F.broadcast(src), "source")
        .crossJoin(F.broadcast(glob.select("v_size")))
    )
    d_s = (F.col("n_s") + F.col("v_size")).cast("double")
    p_q = _q12(F.log((F.col("c_st") + 1).cast("double") / d_s))
    per_src = j.groupBy("source", "n_s", "v_s", "v_size").agg(
        F.sum((F.col("c_st") + 1) * (p_q - F.col("gq"))).alias("present_q"),
        F.sum("gq").alias("g_s"),
    )
    out = per_src.crossJoin(F.broadcast(g_all))
    unseen_lq = _q12(
        F.log(F.lit(1.0) / (F.col("n_s") + F.col("v_size")).cast("double"))
    )
    total_q = (
        F.col("present_q")
        + (F.col("v_size") - F.col("v_s")) * unseen_lq
        - (F.col("g_all") - F.col("g_s"))
    )
    kl = pround(
        total_q.cast("double")
        / F.lit(1e12)
        / (F.col("n_s") + F.col("v_size")).cast("double")
    )
    return out.select(
        "source",
        F.col("n_s").alias("n_tokens"),
        F.col("v_s").alias("v_source"),
        F.col("v_size").alias("v_total"),
        total_q.alias("kl_q"),
        kl.alias("kl"),
    )


SQL_KL_DIVERGENCE = """
WITH tk AS (
  SELECT source, tok FROM (
    SELECT source, unnest(string_split(text, ' ')) AS tok
    FROM documents WHERE text IS NOT NULL
  ) WHERE tok <> ''
),
c_t AS (SELECT tok, count(*) AS c_t FROM tk GROUP BY 1),
ctot AS (SELECT count(*) AS v_size, CAST(sum(c_t) AS BIGINT) AS n_tot FROM c_t),
gq AS (
  SELECT tok,
         CAST(floor(ln(CAST(c_t + 1 AS DOUBLE) / CAST(n_tot + v_size AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) AS gq
  FROM c_t, ctot
),
g_all AS (SELECT CAST(sum(gq) AS BIGINT) AS g_all FROM gq),
c_st AS (SELECT source, tok, count(*) AS c_st FROM tk GROUP BY 1, 2),
src AS (
  SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s, count(*) AS v_s
  FROM c_st GROUP BY 1
),
per AS (
  SELECT s.source, src.n_s, src.v_s, ctot.v_size,
         CAST(sum((s.c_st + 1) *
              (CAST(floor(ln(CAST(s.c_st + 1 AS DOUBLE) / CAST(src.n_s + ctot.v_size AS DOUBLE)) * 1e12 + 0.5) AS BIGINT)
               - g.gq)) AS BIGINT) AS present_q,
         CAST(sum(g.gq) AS BIGINT) AS g_s
  FROM c_st s
  JOIN gq g USING (tok)
  JOIN src ON s.source = src.source
  CROSS JOIN ctot
  GROUP BY 1, 2, 3, 4
),
fin AS (
  SELECT source, n_s, v_s, v_size,
         CAST(present_q
              + (v_size - v_s) * CAST(floor(ln(1.0 / CAST(n_s + v_size AS DOUBLE)) * 1e12 + 0.5) AS BIGINT)
              - (g_all - g_s) AS BIGINT) AS total_q
  FROM per, g_all
)
SELECT source, n_s AS n_tokens, v_s AS v_source, v_size AS v_total,
       total_q AS kl_q,
       floor(CAST(total_q AS DOUBLE) / 1e12 / CAST(n_s + v_size AS DOUBLE) * 1e6 + 0.5) / 1e6 AS kl
FROM fin
"""


# -- qid: mann_whitney -------------------------------------------------

def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Mann-Whitney U test: does the 'click' value
    distribution differ from 'error'? The nonparametric two-sample
    test (rank-based — no normality assumption), the robust sibling
    of ab_test_lift's t-test.

    Exactness: average ranks are halves, so everything is carried at
    2× scale — 2·r̄ = 2·rank + ties − 1 is an integer, R₁ and U₁ stay
    exact BIGINTs, and the tie-correction term Σ(t³−t) falls out of a
    per-row sum of (t²−1) — no second pass over distinct values. Only
    the final z-score divides into doubles (pround).

    One exchange end to end: rank() and the tie count share the same
    (user, ORDER BY value) window sort — the tie count is the
    RANGE-frame peer count, not a second partitioning — and the final
    groupBy(user) rides the same hash partitioning.

    NULL measurements are dropped explicitly (the standard missing-
    data convention for rank tests) — an unfiltered NULL would take a
    rank at whichever end each engine's null order puts it and bias U
    (fuzz find, tools/fuzz_parity.py nulls profile)."""
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "error"))
        .filter(F.col("value").isNotNull())
        .select("user_id", "event_type", "value")
    )
    w = Window.partitionBy("user_id").orderBy("value")
    peers = Window.partitionBy("user_id").orderBy("value").rangeBetween(0, 0)
    r = (
        e.withColumn("rk", F.rank().over(w))
        .withColumn("t", F.count(F.lit(1)).over(peers))
        .withColumn("avg2", 2 * F.col("rk") + F.col("t") - 1)
    )
    agg = r.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n2"),
        F.sum(
            F.when(F.col("event_type") == "click", F.col("avg2")).otherwise(0)
        ).alias("r1_x2"),
        F.sum(F.col("t") * F.col("t") - 1).alias("tie_sum"),
    )
    n = (F.col("n1") + F.col("n2")).cast("double")
    u1_x2 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    mu_x2 = (F.col("n1") * F.col("n2")).cast("double")
    var = (
        F.col("n1").cast("double") * F.col("n2").cast("double") / F.lit(12.0)
        * ((n + 1) - F.col("tie_sum").cast("double") / (n * (n - 1)))
    )
    z = pround((u1_x2.cast("double") - mu_x2) / (F.lit(2.0) * F.sqrt(var)))
    return (
        agg.filter((F.col("n1") > 0) & (F.col("n2") > 0) & (var > 0))
        .select(
            "user_id",
            "n1",
            "n2",
            u1_x2.alias("u1_x2"),
            z.alias("z"),
            F.when(F.abs(z) > 1.96, 1).otherwise(0).alias("significant"),
        )
    )


SQL_MANN_WHITNEY = """
WITH e AS (
  SELECT user_id, event_type, value
  FROM events WHERE event_type IN ('click', 'error') AND value IS NOT NULL
),
r AS (
  SELECT user_id, event_type,
         rank() OVER (PARTITION BY user_id ORDER BY value) AS rk,
         count(*) OVER (PARTITION BY user_id ORDER BY value
                        RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS t
  FROM e
),
a AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN event_type = 'click' THEN 2 * rk + t - 1 ELSE 0 END) AS BIGINT) AS r1_x2,
         CAST(sum(t * t - 1) AS BIGINT) AS tie_sum
  FROM r GROUP BY user_id
),
s AS (
  SELECT user_id, n1, n2,
         r1_x2 - n1 * (n1 + 1) AS u1_x2,
         CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
           * ((CAST(n1 + n2 AS DOUBLE) + 1)
              - CAST(tie_sum AS DOUBLE)
                / (CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1))) AS var
  FROM a
)
SELECT user_id, n1, n2, CAST(u1_x2 AS BIGINT) AS u1_x2,
       floor((CAST(u1_x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
             / (2.0 * sqrt(var)) * 1e6 + 0.5) / 1e6 AS z,
       CASE WHEN abs(floor((CAST(u1_x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
             / (2.0 * sqrt(var)) * 1e6 + 0.5) / 1e6) > 1.96 THEN 1 ELSE 0 END AS significant
FROM s
WHERE n1 > 0 AND n2 > 0 AND var > 0
"""


QUERIES = {
    "naive_bayes": q_naive_bayes,
    "cusum_changepoint": q_cusum_changepoint,
    "assoc_rules": q_assoc_rules,
    "corpus_card": q_corpus_card,
    "kl_divergence": q_kl_divergence,
    "mann_whitney": q_mann_whitney,
}

ORACLE_SQL = {
    "naive_bayes": SQL_NAIVE_BAYES,
    "cusum_changepoint": SQL_CUSUM_CHANGEPOINT,
    "assoc_rules": SQL_ASSOC_RULES,
    "corpus_card": SQL_CORPUS_CARD,
    "kl_divergence": SQL_KL_DIVERGENCE,
    "mann_whitney": SQL_MANN_WHITNEY,
}


# -- qid: quantile_normalize -------------------------------------------

def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization: map each customer's account balance
    onto the SUPPLIER balance distribution of the same nation — the
    distribution-transfer feature prep (bioinformatics' quantile
    normalization / ML's quantile mapping) that robust_scale and
    feature_bins can't express: the TARGET distribution is another
    table's, not a parametric form.

    Exact lower-interpolation semantics, engine-portable by integer
    arithmetic end to end: both sides rank in integer cents with id
    tiebreaks, the reference index is ((rn-1)·(m-1)) div (n-1)
    (integer division — bit-equal everywhere; n=1 pins idx 0), and
    doubles appear only in the final cents/100 emission. Nations
    without suppliers drop (inner join — no reference distribution to
    map onto; documented).

    Scale: the per-nation supplier COUNT m (25 rows at any SF) is
    aggregated first and broadcast onto the customer side, so the
    target index is computed BEFORE the probe and (nation, idx) is a
    true equi-join key against (nation, ref_rn) — each customer row
    hash-matches exactly one supplier row. The naive alternative
    (join on nation alone, filter the index afterwards) evaluates
    |customers_n| × |suppliers_n| pairs per nation — quadratic in SF
    even though shuffle bytes stay linear; this shape is O(n) probe
    work on the same two nation-keyed rank shuffles
    (tests/test_plans.py pins the join keys, not just the exchange
    count)."""
    # NULL balances have no quantile: they are excluded from BOTH
    # distributions (a NULL customer balance cannot be mapped; a NULL
    # supplier balance is not part of the reference). Ranking over the
    # nullable cents column instead would make every rank after the
    # NULLs flip on the engines' opposite NULL-order defaults — caught
    # by the nulls fuzz profile only at the sf0.01 base (at sf0.001
    # most nations have m <= 1 supplier, pinning idx and hiding the
    # rank drift — a size-dependent coincidence; round 8).
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal").isNotNull()).select(
        "c_custkey",
        F.col("c_nationkey").alias("nation"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    s = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal").isNotNull()).select(
        F.col("s_nationkey").alias("nation"),
        F.col("s_suppkey"),
        F.round(F.col("s_acctbal") * 100).cast("long").alias("ref_cents"),
    )
    wc = Window.partitionBy("nation").orderBy("cents", "c_custkey")
    wn = Window.partitionBy("nation")
    ranked_c = c.select(
        "c_custkey",
        "nation",
        "cents",
        F.row_number().over(wc).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    # per-nation supplier count: 25 rows at any SF — broadcast onto
    # the customer side so the target index exists BEFORE the probe
    m_per_nation = s.groupBy("nation").agg(F.count(F.lit(1)).alias("m"))
    cidx = ranked_c.join(F.broadcast(m_per_nation), "nation").select(
        "c_custkey",
        "nation",
        "cents",
        F.when(F.col("n") == 1, F.lit(1))
        .otherwise(F.expr("((rn - 1) * (m - 1)) div (n - 1) + 1"))
        .alias("idx"),
    )
    ws = Window.partitionBy("nation").orderBy("ref_cents", "s_suppkey")
    ranked_s = s.select(
        F.col("nation").alias("s_nation"),
        "ref_cents",
        F.row_number().over(ws).alias("ref_rn"),
    )
    j = cidx.join(
        ranked_s,
        (cidx["nation"] == ranked_s["s_nation"])
        & (cidx["idx"] == ranked_s["ref_rn"]),
    )
    return j.select(
        "c_custkey",
        "nation",
        (F.col("cents") / F.lit(100.0)).alias("orig_bal"),
        (F.col("ref_cents") / F.lit(100.0)).alias("normalized_bal"),
    )


SQL_QUANTILE_NORMALIZE = """
WITH c AS (
  -- NULL balances have no quantile (engine twin filters identically)
  SELECT c_custkey, c_nationkey AS nation,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer WHERE c_acctbal IS NOT NULL
),
rc AS (
  SELECT *,
         row_number() OVER (PARTITION BY nation ORDER BY cents, c_custkey) AS rn,
         count(*) OVER (PARTITION BY nation) AS n
  FROM c
),
s AS (
  SELECT s_nationkey AS nation, s_suppkey,
         CAST(round(s_acctbal * 100) AS BIGINT) AS ref_cents
  FROM supplier WHERE s_acctbal IS NOT NULL
),
m_per_nation AS (
  SELECT nation, count(*) AS m FROM s GROUP BY nation
),
ci AS (
  SELECT rc.c_custkey, rc.nation, rc.cents,
         CASE WHEN rc.n = 1 THEN 1
              ELSE ((rc.rn - 1) * (mp.m - 1)) // (rc.n - 1) + 1 END AS idx
  FROM rc JOIN m_per_nation mp ON rc.nation = mp.nation
),
rs AS (
  SELECT nation, ref_cents,
         row_number() OVER (PARTITION BY nation ORDER BY ref_cents, s_suppkey)
           AS ref_rn
  FROM s
)
SELECT ci.c_custkey, ci.nation,
       CAST(ci.cents AS DOUBLE) / CAST(100.0 AS DOUBLE) AS orig_bal,
       CAST(rs.ref_cents AS DOUBLE) / CAST(100.0 AS DOUBLE) AS normalized_bal
FROM ci JOIN rs
  ON ci.nation = rs.nation AND ci.idx = rs.ref_rn
"""

QUERIES["quantile_normalize"] = q_quantile_normalize
ORACLE_SQL["quantile_normalize"] = SQL_QUANTILE_NORMALIZE
