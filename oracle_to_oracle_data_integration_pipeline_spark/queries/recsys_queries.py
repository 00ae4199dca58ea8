"""Round-5 graph/IR wave: synchronous label-propagation communities,
item-item co-occurrence recommendations, and positional phrase search
— three surfaces (community detection, recommenders, phrase-level IR)
none of the existing graph (components/pagerank/bfs/triangles) or
retrieval (BM25/TF-IDF/inverted index) qids cover.

Determinism contracts: LPA runs EXACTLY ``LPA_ROUNDS`` synchronous
rounds with weighted-majority + min-label tie-break (free-running LPA
can oscillate; a fixed unrolled round count with a total tie order is
reproducible and SQL-twinnable); recommendation ordering uses the
pround-quantized score (raw-double ordering could tie differently
across engines after rounding) with the item id as final tiebreak;
phrase adjacency uses RELATIVE positions (p₂ = p₁+1), so the two
engines only need identical tokenization, not identical position
bases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import (
    epoch_seconds,
    load,
    pround,
)


# -- qid: label_propagation -----------------------------------------------

LPA_ROUNDS = 3
LPA_MIN_W = 2


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized weighted co-purchase edges: parts ordered together,
    weight = number of shared orders, pruned to w ≥ {LPA_MIN_W}. The
    pair join is keyed by order and bounded by (parts per order)² —
    the assoc_rules bound, never a fact self-join on part."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("i"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("j"))
    pairs = (
        a.join(b, "o")
        .where(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= LPA_MIN_W)
    )
    return pairs.select("i", "j", "w").unionByName(
        pairs.select(F.col("j").alias("i"), F.col("i").alias("j"), "w")
    )


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous weighted label propagation
    over the co-purchase graph: every node starts as its own label;
    each round every node adopts the label with the highest total
    edge weight among its neighbors (ties → smallest label). Runs
    EXACTLY {LPA_ROUNDS} synchronous rounds — free-running LPA can
    oscillate on bipartite-ish structures, a fixed round count with a
    total tie order is deterministic, and communities in co-purchase
    graphs stabilize in 2-3 rounds.

    Distinct from dedup_components: connectivity says "reachable",
    communities say "densely tied" — a bridge edge joins components
    but not communities.

    Scale: each round is one keyed edge⋈label join + a combinable
    (node, label) weight sum + a per-node top-1 window
    (WindowGroupLimit — k=1 rows cross per partition). Unrolled
    {LPA_ROUNDS}× in one plan: no iteration state, no checkpoint, no
    driver round-trips (contrast connected_components, whose
    convergence is data-dependent and needs the probe loop).

    Output: (part node, community, community_size).
    """
    edges = _copurchase_edges(spark, sf_dir)
    labels = edges.select(F.col("i").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(LPA_ROUNDS):
        nb = edges.join(labels, edges["j"] == labels["node"]).select(
            F.col("i").alias("node"), "lbl", "w"
        )
        scores = nb.groupBy("node", "lbl").agg(F.sum("w").alias("s"))
        w1 = Window.partitionBy("node").orderBy(F.col("s").desc(), F.col("lbl").asc())
        labels = (
            scores.withColumn("__rn", F.row_number().over(w1))
            .where(F.col("__rn") == 1)
            .select("node", "lbl")
        )
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("community_size"))
    return labels.join(sizes, "lbl").select(
        "node", F.col("lbl").alias("community"), "community_size"
    )


SQL_LABEL_PROPAGATION = f"""
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
pairs AS (
  SELECT a.p AS i, b.p AS j, count(*) AS w
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= {LPA_MIN_W}
),
edges AS (
  SELECT i, j, w FROM pairs UNION ALL SELECT j, i, w FROM pairs
),
l0 AS (SELECT DISTINCT i AS node, i AS lbl FROM edges),
r1 AS (
  SELECT node, lbl FROM (
    SELECT e.i AS node, l.lbl, sum(e.w) AS s,
           row_number() OVER (PARTITION BY e.i
                              ORDER BY sum(e.w) DESC, l.lbl ASC) AS rn
    FROM edges e JOIN l0 l ON e.j = l.node GROUP BY e.i, l.lbl
  ) WHERE rn = 1
),
r2 AS (
  SELECT node, lbl FROM (
    SELECT e.i AS node, l.lbl, sum(e.w) AS s,
           row_number() OVER (PARTITION BY e.i
                              ORDER BY sum(e.w) DESC, l.lbl ASC) AS rn
    FROM edges e JOIN r1 l ON e.j = l.node GROUP BY e.i, l.lbl
  ) WHERE rn = 1
),
r3 AS (
  SELECT node, lbl FROM (
    SELECT e.i AS node, l.lbl, sum(e.w) AS s,
           row_number() OVER (PARTITION BY e.i
                              ORDER BY sum(e.w) DESC, l.lbl ASC) AS rn
    FROM edges e JOIN r2 l ON e.j = l.node GROUP BY e.i, l.lbl
  ) WHERE rn = 1
),
sizes AS (SELECT lbl, count(*) AS community_size FROM r3 GROUP BY lbl)
SELECT r3.node, r3.lbl AS community, sizes.community_size
FROM r3 JOIN sizes ON r3.lbl = sizes.lbl
"""


# -- qid: item_recs ----------------------------------------------------------

RECS_K = 3


def q_item_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering from co-purchase counts:
    sim(i,j) = c_ij / √(c_i·c_j) (cosine over binary basket vectors),
    top-{RECS_K} recommendations per item. The "customers also bought"
    recommender, computed without a user-item matrix.

    Ordering portability: candidates rank by the pround-QUANTIZED
    score (two raw doubles 1 ulp apart would rank differently across
    engines after the hash compare rounds them equal), ties by
    neighbor id — a total order, so the top-k set is unique.

    Scale: pair counts are basket-bounded (the LPA/assoc_rules bound);
    item counts broadcast back onto the pair table; the per-item top-k
    is a keyed WindowGroupLimit window. Nothing quadratic in the
    catalog.
    """
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("i"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("j"))
    pairs = (
        a.join(b, "o")
        .where(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("c_ij"))
        .where(F.col("c_ij") >= 2)
    )
    items = li.groupBy(F.col("l_partkey").alias("item")).agg(
        F.count(F.lit(1)).alias("c_i")
    )
    sym = pairs.select("i", "j", "c_ij").unionByName(
        pairs.select(F.col("j").alias("i"), F.col("i").alias("j"), "c_ij")
    )
    scored = (
        sym.join(items, sym["i"] == items["item"])
        .drop("item")
        .withColumnRenamed("c_i", "ci")
        .join(items, sym["j"] == items["item"])
        .drop("item")
        .select(
            "i",
            "j",
            pround(
                F.col("c_ij").cast("double")
                / F.sqrt(F.col("ci").cast("double") * F.col("c_i").cast("double"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("i").orderBy(F.col("score").desc(), F.col("j").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= RECS_K)
        .select(F.col("i").alias("item"), F.col("j").alias("rec_item"), "score", "rank")
    )


SQL_ITEM_RECS = f"""
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
pairs AS (
  SELECT a.p AS i, b.p AS j, count(*) AS c_ij
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= 2
),
items AS (SELECT p AS item, count(*) AS c_i FROM li GROUP BY p),
sym AS (SELECT i, j, c_ij FROM pairs UNION ALL SELECT j, i, c_ij FROM pairs),
scored AS (
  SELECT s.i, s.j,
         floor(CAST(s.c_ij AS DOUBLE)
               / sqrt(CAST(ii.c_i AS DOUBLE) * CAST(jj.c_i AS DOUBLE))
               * 1e6 + 0.5) / 1e6 AS score
  FROM sym s JOIN items ii ON s.i = ii.item JOIN items jj ON s.j = jj.item
)
SELECT i AS item, j AS rec_item, score, CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY i
                                   ORDER BY score DESC, j ASC) AS rank
      FROM scored)
WHERE rank <= {RECS_K}
"""


# -- qid: phrase_search ------------------------------------------------------

PHRASE = ("hash", "join")


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval ("hash join") by positional postings —
    the capability a doc-level inverted index cannot express (both
    words present ≠ adjacent). Tokens carry their position; the
    phrase is a self-join of the two words' postings on
    (doc, p₂ = p₁+1). RELATIVE positions make the join base-offset-
    free: the engines only need identical tokenization.

    Scale: each posting side filters to ONE term before the join
    (selective by construction — the classic term-at-a-time plan);
    the join is keyed (doc, pos), the count combinable. The explode
    is corpus-token-sized, same as every text qid here.
    """
    toks = (
        load(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            "doc_id",
            # strip non-ASCII BEFORE lower(): full-vs-simple Unicode
            # case mapping diverges between the engines (see
            # operators/text.ascii_lower_col); after the strip the
            # fold only ever sees ASCII letters
            F.posexplode(
                F.split(
                    F.trim(
                        F.lower(F.regexp_replace("text", "[^a-zA-Z ]", " "))
                    ),
                    " +",
                )
            ).alias("pos", "tok"),
        )
    )
    t1 = toks.where(F.col("tok") == PHRASE[0]).select(
        "doc_id", F.col("pos").alias("p1")
    )
    t2 = toks.where(F.col("tok") == PHRASE[1]).select(
        "doc_id", (F.col("pos") - 1).alias("p1")
    )
    return (
        t1.join(t2, ["doc_id", "p1"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


SQL_PHRASE_SEARCH = f"""
WITH toks AS (
  SELECT doc_id, t.tok, t.pos
  FROM documents,
       LATERAL (
         SELECT unnest(string_split_regex(
                  trim(lower(regexp_replace(text, '[^a-zA-Z ]', ' ', 'g'))),
                  ' +')) AS tok,
                generate_subscripts(string_split_regex(
                  trim(lower(regexp_replace(text, '[^a-zA-Z ]', ' ', 'g'))),
                  ' +'), 1) AS pos
       ) t
  WHERE text IS NOT NULL
),
t1 AS (SELECT doc_id, pos AS p1 FROM toks WHERE tok = '{PHRASE[0]}'),
t2 AS (SELECT doc_id, pos - 1 AS p1 FROM toks WHERE tok = '{PHRASE[1]}')
SELECT t1.doc_id, count(*) AS n_occurrences
FROM t1 JOIN t2 USING (doc_id, p1)
GROUP BY t1.doc_id
"""


QUERIES = {
    "label_propagation": q_label_propagation,
    "item_recs": q_item_recs,
    "phrase_search": q_phrase_search,
}

ORACLE_SQL = {
    "label_propagation": SQL_LABEL_PROPAGATION,
    "item_recs": SQL_ITEM_RECS,
    "phrase_search": SQL_PHRASE_SEARCH,
}


# -- qid: journey_paths --------------------------------------------------------

JP_LEN = 3
JP_TOP = 10


def q_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey path analysis: each user's FIRST {JP_LEN} events
    (total order: ts, then event_id) concatenate into a path string
    ('view>click>purchase'), and the top {JP_TOP} most common opening
    journeys are reported — the product-analytics view sequence
    counts (event_transitions' bigrams) cannot give: whole paths, not
    hops.

    Ordering discipline: collect_list order is shuffle-dependent, so
    the path assembles via array_sort over (rank, type) structs — the
    repo's standard ordered-aggregation idiom (listagg_order). The
    top-k is TakeOrderedAndProject (count DESC, path ASC total
    order); the per-user rank window is keyed.
    """
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= JP_LEN)
    )
    paths = (
        firsts.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(rn, event_type)))"
                ", x -> x.event_type), '>')"
            ).alias("path"),
        )
        .where(F.col("n") == JP_LEN)
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(JP_TOP)
    )


SQL_JOURNEY_PATHS = f"""
WITH firsts AS (
  SELECT user_id, event_type, rn FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events
  ) WHERE rn <= {JP_LEN}
),
paths AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path,
         count(*) AS n
  FROM firsts GROUP BY user_id
)
SELECT path, count(*) AS n_users
FROM paths WHERE n = {JP_LEN}
GROUP BY path
ORDER BY n_users DESC, path ASC
LIMIT {JP_TOP}
"""

QUERIES["journey_paths"] = q_journey_paths
ORACLE_SQL["journey_paths"] = SQL_JOURNEY_PATHS


# -- qid: pattern_match (MATCH_RECOGNIZE-lite CEP) ---------------------

PM_WINDOW_S = 3 * 86400   # each hop must land within 3 days of the next


def q_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded event-sequence detection (complex-event-processing
    / MATCH_RECOGNIZE-lite): per user, count purchases that complete a
    view → click → purchase chain where EACH hop happens within
    {PM_WINDOW_S}s of the next — the conversion-attribution pattern
    neither event_transitions (adjacent bigrams, no time bound) nor
    journey_paths (fixed opening prefix) nor events_funnel
    (first-ever-timestamps, unbounded) expresses.

    Semantics are defined on the integer-second timeline
    (unix_timestamp ≙ floor(epoch(ts)) — the engines' shared
    granularity) with STRICT precedence: a click at second s qualifies
    if a view exists in [s−W, s−1]; a purchase at second s matches if
    a qualified click exists in [s−W, s−1]. Same-second hops do NOT
    chain (peer rows sit outside the −1 frame edge on both engines),
    so the result is tie-order-independent — no tiebreak column
    needed.

    Scale shape: two stacked time-RANGE windows, both keyed by
    user_id — ONE hash shuffle total (the second window and the final
    per-user aggregate reuse the first's partitioning), each frame a
    bounded W-second slice. No self-join: the naive pattern-join
    (events ⋈ events ⋈ events on time predicates) would be a range
    join the optimizer can't hash; the window form is O(n) per user
    ordered scan — the same reformulation streaming CEP engines
    compile patterns into."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        epoch_seconds(F.col("ts")).alias("sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-PM_WINDOW_S, -1)
    )
    qclick = (
        (F.col("event_type") == "click")
        & (F.max(F.when(F.col("event_type") == "view", 1)).over(w) == 1)
    )
    s1 = e.withColumn("qclick", qclick.cast("int"))
    matched = (
        (F.col("event_type") == "purchase")
        & (F.max(F.when(F.col("qclick") == 1, 1)).over(w) == 1)
    )
    s2 = s1.withColumn("is_match", matched.cast("int"))
    return (
        s2.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purchases"),
            F.sum("is_match").alias("n_matched"),
        )
        .where(F.col("n_purchases") > 0)
    )


SQL_PATTERN_MATCH = f"""
WITH e AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
),
s1 AS (
  SELECT *,
         CASE WHEN event_type = 'click'
                   AND max(CASE WHEN event_type = 'view' THEN 1 END) OVER (
                     PARTITION BY user_id ORDER BY sec
                     RANGE BETWEEN {PM_WINDOW_S} PRECEDING AND 1 PRECEDING
                   ) = 1
              THEN 1 ELSE 0 END AS qclick
  FROM e
),
s2 AS (
  SELECT *,
         CASE WHEN event_type = 'purchase'
                   AND max(CASE WHEN qclick = 1 THEN 1 END) OVER (
                     PARTITION BY user_id ORDER BY sec
                     RANGE BETWEEN {PM_WINDOW_S} PRECEDING AND 1 PRECEDING
                   ) = 1
              THEN 1 ELSE 0 END AS is_match
  FROM s1
)
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases,
       CAST(sum(is_match) AS BIGINT) AS n_matched
FROM s2
GROUP BY user_id
HAVING sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
"""

QUERIES["pattern_match"] = q_pattern_match
ORACLE_SQL["pattern_match"] = SQL_PATTERN_MATCH
