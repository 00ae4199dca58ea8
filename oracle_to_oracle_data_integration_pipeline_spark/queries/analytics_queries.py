"""Statistical-analytics qids: rolling median, per-key OLS trend, MAD
outliers, chi-square independence, item co-occurrence, bigram
frequency, character entropy, Bloom-filtered semi-join, embedding
normalization (operators/stats.py, scale.py, similarity.py).

Determinism: every double on both sides goes through the portable
floor-round (`pround` / ``floor(x*1e6+0.5)/1e6``) and order-sensitive
sums through the exact decimal path (`dsum` /
``CAST(round(sum(CAST(x AS DECIMAL(24,6))), r) AS DOUBLE)``), so the
driver's value-hash compare is bit-stable against partial-agg order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.text import (
    ascii_lower_col,
    sql_ascii_lower,
)
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import dsum, load

# -- qid: rolling_median -----------------------------------------------

ROLL_N = 5
ROLL_USERS = 20


def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-5-event median of `value` per user — the robust
    smoother for noisy per-entity time series (one shuffle on user_id,
    O(n) state per row)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import rolling_median

    ev = load(spark, sf_dir, "events").where(F.col("user_id") < ROLL_USERS)
    return rolling_median(ev, "user_id", ["ts", "event_id"], "value", n=ROLL_N).select(
        "user_id", "event_id", "rolling_median"
    )


SQL_ROLLING_MEDIAN = f"""
WITH e AS (
  SELECT user_id, event_id, ts, CAST(value AS DOUBLE) AS v
  FROM events WHERE user_id < {ROLL_USERS}
)
SELECT user_id, event_id,
       floor(quantile_cont(v, 0.5) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN {ROLL_N - 1} PRECEDING AND CURRENT ROW
       ) * 1000000.0 + 0.5) / 1000000.0 AS rolling_median
FROM e
"""


# -- qid: regression_per_key -------------------------------------------

def q_regression_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of event value over time (day index): is this
    entity's metric drifting? Closed-form from five aggregated moments
    — one shuffle, no point collection."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import ols_per_key

    ev = load(spark, sf_dir, "events")
    x = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
    return ols_per_key(ev, "user_id", x, F.col("value"))


SQL_REGRESSION_PER_KEY = """
WITH base AS (
  SELECT user_id AS k,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         CAST(value AS DOUBLE) AS y
  FROM events
),
m AS (SELECT k, min(x) AS x0 FROM base GROUP BY k),
j AS (SELECT base.k, x - x0 AS dx, y FROM base JOIN m USING (k)),
agg AS (
  SELECT k, count(*) AS n,
         sum(dx) AS sx,
         sum(dx * dx) AS sxx,
         CAST(sum(CAST(y AS DECIMAL(24,6))) AS DOUBLE) AS sy,
         CAST(round(sum(CAST(floor(dx * y * 1000000.0 + 0.5) / 1000000.0
                             AS DECIMAL(24,6))), 6) AS DOUBLE) AS sxy
  FROM j GROUP BY k
),
fit AS (
  SELECT k, n, sx, sy,
         floor((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE)
               * 1000000.0 + 0.5) / 1000000.0 AS slope
  FROM agg WHERE n >= 2 AND n * sxx - sx * sx != 0
)
SELECT k AS user_id, n, slope,
       floor((sy - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS intercept
FROM fit
"""


# -- qid: mad_outliers -------------------------------------------------

MAD_K = 3.0


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-event-type outlier profile: median, MAD, and how many
    values sit beyond 3 MADs — the DQ screen that survives heavy
    tails where mean/stddev screens saturate."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import (
        mad_outlier_summary,
    )

    ev = load(spark, sf_dir, "events")
    return mad_outlier_summary(ev, "event_type", "value", k_mad=MAD_K)


SQL_MAD_OUTLIERS = f"""
WITH e AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events),
med AS (
  SELECT event_type,
         floor(quantile_cont(v, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS med
  FROM e GROUP BY event_type
),
dev AS (
  SELECT e.event_type, med, abs(v - med) AS dev
  FROM e JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, med,
         floor(quantile_cont(dev, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS mad
  FROM dev GROUP BY event_type, med
)
SELECT d.event_type, count(*) AS n, m.med, m.mad,
       CAST(sum(CASE WHEN d.dev > {MAD_K} * m.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type, m.med, m.mad
"""


# -- qid: chi2_independence --------------------------------------------

def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square of lang × source over the documents corpus —
    'is my language mix independent of source?' One groupBy builds the
    contingency table; the statistic runs on that tiny table."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import (
        chi2_independence,
    )

    return chi2_independence(load(spark, sf_dir, "documents"), "lang", "source")


SQL_CHI2_INDEPENDENCE = """
WITH observed AS (
  -- complete-pairs guard mirrors the operator: NULL categories are
  -- dropped before the contingency table is built
  SELECT lang, source, count(*) AS o FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL
  GROUP BY lang, source
),
cells AS (
  -- complete the cross product: unobserved cells still contribute
  -- (0 - e)^2 / e = e to the statistic
  SELECT r.lang, c.source, coalesce(o.o, 0) AS o
  FROM (SELECT DISTINCT lang FROM observed) r
  CROSS JOIN (SELECT DISTINCT source FROM observed) c
  LEFT JOIN observed o ON o.lang = r.lang AND o.source = c.source
),
tot AS (
  SELECT o,
         sum(o) OVER (PARTITION BY lang) AS r_tot,
         sum(o) OVER (PARTITION BY source) AS c_tot,
         sum(o) OVER () AS n_tot
  FROM cells
),
terms AS (
  SELECT n_tot,
         floor(power(CAST(o AS DOUBLE)
                     - CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE)
                       / CAST(n_tot AS DOUBLE), 2)
               / (CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE)
                  / CAST(n_tot AS DOUBLE))
               * 1000000.0 + 0.5) / 1000000.0 AS term
  FROM tot
)
SELECT CAST(max(n_tot) AS BIGINT) AS n,
       CAST((SELECT count(DISTINCT lang) FROM documents) - 1 AS INT)
         * CAST((SELECT count(DISTINCT source) FROM documents) - 1 AS INT) AS dof,
       CAST(round(sum(CAST(term AS DECIMAL(24,6))), 6) AS DOUBLE) AS chi2
FROM terms
"""


# -- qid: part_cooccurrence --------------------------------------------

COOC_K = 20


def q_part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pairs: parts most often appearing in the same
    order. Self-join keyed by order, cost Σ(basket²) not corpus²."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import (
        cooccurrence_pairs,
    )

    li = load(spark, sf_dir, "lineitem")
    return cooccurrence_pairs(li, "l_orderkey", "l_partkey", top_k=COOC_K)


SQL_PART_COOCCURRENCE = f"""
WITH it AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem)
SELECT a.i AS item_a, b.i AS item_b, count(*) AS n_groups
FROM it a JOIN it b ON a.g = b.g AND a.i < b.i
GROUP BY a.i, b.i
ORDER BY n_groups DESC, item_a, item_b
LIMIT {COOC_K}
"""


# -- qid: bigram_freq --------------------------------------------------

BIGRAM_K = 20


def q_bigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word bigrams over the corpus — LM-training co-location
    counts. Bigram build is a map-side HOF zip; only (bigram → count)
    shuffles."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import bigram_topk

    return bigram_topk(load(spark, sf_dir, "documents"), "text", top_k=BIGRAM_K)


SQL_BIGRAM_FREQ = f"""
WITH t AS (SELECT string_split({sql_ascii_lower('text')}, ' ') AS tk FROM documents),
b AS (
  SELECT unnest(list_transform(range(1, len(tk)),
                               i -> tk[i] || ' ' || tk[i + 1])) AS bigram
  FROM t WHERE len(tk) >= 2
)
SELECT bigram, count(*) AS n
FROM b GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT {BIGRAM_K}
"""


# -- qid: char_entropy -------------------------------------------------

def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the character distribution —
    low entropy flags boilerplate/filler, high flags noise."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import char_entropy

    out = char_entropy(load(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select("doc_id", F.col("n_chars").alias("total_chars"), "entropy")


SQL_CHAR_ENTROPY = """
WITH ch AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS total_chars,
         unnest(string_split(text, '')) AS ch
  FROM documents WHERE length(text) > 0
),
c AS (
  SELECT doc_id, total_chars, ch, count(*) AS c
  FROM ch GROUP BY doc_id, total_chars, ch
),
t AS (
  SELECT doc_id, total_chars,
         floor(-(CAST(c AS DOUBLE) / CAST(total_chars AS DOUBLE))
               * ln(CAST(c AS DOUBLE) / CAST(total_chars AS DOUBLE))
               * 1000000.0 + 0.5) / 1000000.0 AS term
  FROM c
)
SELECT doc_id, total_chars,
       CAST(round(sum(CAST(term AS DECIMAL(24,6))), 6) AS DOUBLE) AS entropy
FROM t GROUP BY doc_id, total_chars
"""


# -- qid: bloom_join ---------------------------------------------------

BLOOM_NATION = "NATION_3"


def _nation_supplier_keys(spark: SparkSession, sf_dir: str):
    """(lineitem, s_suppkey-keys-of-BLOOM_NATION) — shared by
    q_bloom_join and q_bloom_fpr_audit so the audit always measures
    exactly the key set the headline join filters on."""
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation").where(F.col("n_name") == BLOOM_NATION)
    keys = sup.join(
        F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"]
    ).select("s_suppkey")
    return li, keys


def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by return flag for one nation's suppliers, with the
    supplier set applied to lineitem as a Bloom-filter pre-filter
    before the exact semi-join — the explicit version of Spark's
    runtime row-group pruning. Bloom false positives are removed by
    the semi-join, so the answer is exact."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import (
        bloom_semi_join,
    )

    li, keys = _nation_supplier_keys(spark, sf_dir)
    filtered = bloom_semi_join(li, keys, "l_suppkey", "s_suppkey")
    return filtered.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 2).alias(
            "revenue"
        ),
    )


SQL_BLOOM_JOIN = f"""
SELECT l_returnflag, count(*) AS n_rows,
       CAST(round(sum(CAST((CASE WHEN (l_extendedprice * (1.0 - l_discount)) < 0 THEN -floor(-(l_extendedprice * (1.0 - l_discount))*1e6 + 0.5) ELSE floor((l_extendedprice * (1.0 - l_discount))*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_suppkey IN (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{BLOOM_NATION}'
)
GROUP BY l_returnflag
"""


# -- qid: embed_normalize ----------------------------------------------

def q_embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize the embedding table — the standard pre-step before
    cosine retrieval, as a zero-shuffle row-local expression. The qid
    view explodes the unit vector to (vec_id, pos, comp) scalars so the
    driver can value-hash every component (array cells aren't
    hashable in the compare harness); pipeline callers use the
    operator's array output directly."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.similarity import (
        l2_normalize,
    )

    out = l2_normalize(load(spark, sf_dir, "embeddings"), "vec_id", "embedding")
    return out.select(
        "vec_id", "norm", F.posexplode("unit_vec").alias("pos", "comp")
    )


SQL_EMBED_NORMALIZE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
u AS (
  SELECT vec_id,
         floor(nrm * 1000000.0 + 0.5) / 1000000.0 AS norm,
         CASE WHEN nrm > 0
              THEN list_transform(v, x -> floor(x / nrm * 1000000.0 + 0.5) / 1000000.0)
              ELSE v END AS uv
  FROM n
),
x AS (
  SELECT vec_id, norm,
         unnest(range(0, len(uv))) AS pos,
         unnest(uv) AS comp
  FROM u
)
SELECT vec_id, norm, CAST(pos AS INT) AS pos, comp FROM x
"""


# -- qid: robust_scale -------------------------------------------------

SCALE_USERS = 20


def q_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/IQR robust scaling of event values per event type —
    the outlier-resistant cousin of z-scoring. Group stats broadcast
    back over the fact; the scaling itself is map-only."""
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import pround

    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        pround(F.expr("percentile(CAST(value AS DOUBLE), 0.5)"), 6).alias("med"),
        pround(
            F.expr("percentile(CAST(value AS DOUBLE), 0.75)")
            - F.expr("percentile(CAST(value AS DOUBLE), 0.25)"),
            6,
        ).alias("iqr"),
    )
    return (
        ev.where(F.col("user_id") < SCALE_USERS)
        .join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            F.when(
                F.col("iqr") > 0,
                pround((F.col("value") - F.col("med")) / F.col("iqr"), 6),
            ).alias("scaled"),
        )
    )


SQL_ROBUST_SCALE = f"""
WITH stats AS (
  SELECT event_type,
         floor(quantile_cont(CAST(value AS DOUBLE), 0.5) * 1000000.0 + 0.5)
           / 1000000.0 AS med,
         floor((quantile_cont(CAST(value AS DOUBLE), 0.75)
                - quantile_cont(CAST(value AS DOUBLE), 0.25)) * 1000000.0 + 0.5)
           / 1000000.0 AS iqr
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       CASE WHEN s.iqr > 0
            THEN floor((CAST(e.value AS DOUBLE) - s.med) / s.iqr * 1000000.0 + 0.5)
                   / 1000000.0
            ELSE NULL END AS scaled
FROM events e JOIN stats s USING (event_type)
WHERE e.user_id < {SCALE_USERS}
"""


# -- qid: sql_interface ------------------------------------------------

# One ANSI string, executed verbatim by BOTH engines: spark.sql() over
# registered temp views on the Spark side, DuckDB over the fixture
# views on the oracle side. Demonstrates the engine's SQL entry point
# (SURVEY §2: spark.sql is first-class alongside the DataFrame API) —
# any dialect drift between the two engines would fail the hash gate.
ANSI_REVENUE_RANK = """
WITH rev AS (
  SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
         CAST(round(sum(CAST((CASE WHEN (l_extendedprice * (1.0 - l_discount)) < 0 THEN -floor(-(l_extendedprice * (1.0 - l_discount))*1e6 + 0.5) ELSE floor((l_extendedprice * (1.0 - l_discount))*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))), 2) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)
)
SELECT n_name, yr, revenue,
       CAST(rank() OVER (PARTITION BY yr ORDER BY revenue DESC, n_name) AS INT)
         AS rnk
FROM rev
"""


def q_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation revenue ranked within order-year, via the SQL entry point
    (spark.sql over temp views) — the identical ANSI text is the
    oracle, so the qid also pins dialect compatibility."""
    for t in ["lineitem", "orders", "customer", "nation"]:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(ANSI_REVENUE_RANK)


SQL_SQL_INTERFACE = ANSI_REVENUE_RANK


# -- qid: histogram_fixed ----------------------------------------------

HIST_LO, HIST_HI, HIST_BINS = 0.0, 500.0, 10


def q_histogram_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type — map-only bin
    algebra + one combinable groupBy, the cheapest distribution
    profile at scale (contrast feature_bins' equi-depth sort path)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import (
        histogram_fixed,
    )

    return histogram_fixed(
        load(spark, sf_dir, "events"), "event_type", "value", HIST_LO, HIST_HI, HIST_BINS
    )


SQL_HISTOGRAM_FIXED = f"""
WITH e AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
  WHERE CAST(value AS DOUBLE) >= {HIST_LO} AND CAST(value AS DOUBLE) < {HIST_HI}
),
b AS (
  SELECT event_type,
         CAST(floor((v - {HIST_LO}) / {(HIST_HI - HIST_LO) / HIST_BINS}) AS INT) AS bin
  FROM e
)
SELECT event_type, bin,
       CAST({HIST_LO} + bin * {(HIST_HI - HIST_LO) / HIST_BINS} AS DOUBLE) AS bin_lo,
       CAST({HIST_LO} + (bin + 1) * {(HIST_HI - HIST_LO) / HIST_BINS} AS DOUBLE) AS bin_hi,
       count(*) AS n
FROM b GROUP BY event_type, bin
"""


# -- qid: fuzzy_dedup --------------------------------------------------

FUZZY_MAX_DIST = 2


def q_fuzzy_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate part-name pairs: canopy blocking on the head noun
    + levenshtein verification — entity-resolution dedup over the dirty
    catalog, Σ|block|² not n²."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.dedup import (
        fuzzy_dedup_pairs,
    )

    return fuzzy_dedup_pairs(load(spark, sf_dir, "part"), "p_name", FUZZY_MAX_DIST)


SQL_FUZZY_DEDUP = f"""
WITH names AS (SELECT DISTINCT p_name AS name FROM part),
blocked AS (
  SELECT name, string_split(name, ' ')[-1] AS blk FROM names
)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS INT) AS dist
FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
"""


# -- qid: window_percentiles -------------------------------------------

WPCT_USERS = 20


def q_window_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-statistic window functions (ntile / percent_rank /
    cume_dist) over event values per (type, user) — the remaining
    ANSI window rank family in one qid (round 7: key widened from
    event_type alone — a 5-value key put 1/5 of events in each of 5
    window tasks, the low-cardinality hazard tools/window_audit.py
    matcher 3 now flags; user_id scales with SF). The oracle pins
    NULLS FIRST on the value sort key — Spark ASC defaults NULLS
    FIRST, DuckDB NULLS LAST (fuzz find, tools/fuzz_parity.py nulls
    profile)."""
    from pyspark.sql import Window

    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import pround

    ev = load(spark, sf_dir, "events").where(F.col("user_id") < WPCT_USERS)
    w = Window.partitionBy("event_type", "user_id").orderBy(
        F.col("value"), F.col("event_id")
    )
    return ev.select(
        "event_id",
        "event_type",
        "user_id",
        F.ntile(4).over(w).alias("quartile"),
        pround(F.percent_rank().over(w), 6).alias("pct_rank"),
        pround(F.cume_dist().over(w), 6).alias("cume"),
    )


SQL_WINDOW_PERCENTILES = f"""
SELECT event_id, event_type, user_id,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       floor(percent_rank() OVER w * 1000000.0 + 0.5) / 1000000.0 AS pct_rank,
       floor(cume_dist() OVER w * 1000000.0 + 0.5) / 1000000.0 AS cume
FROM events
WHERE user_id < {WPCT_USERS}
WINDOW w AS (PARTITION BY event_type, user_id ORDER BY value NULLS FIRST, event_id)
"""


# -- qid: bloom_fpr_audit ----------------------------------------------

BLOOM_FPR_BOUND = 0.001


def q_bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """False-positive-rate audit of the Bloom pre-filter: count rows
    passing the bitmap alone vs the exact semi-join, and assert the
    observed FPR stays under 0.1%. Post-fold theory (the probed bitmap
    is density-folded, operators/scale._fold_bitmap): set-bit density
    is kept below 1/32, so worst-case FPR ≤ (1/32)^k = ~3e-5 at the
    k=3 default — still 30× inside the bound. (The pre-fold 2^16-bit
    figure ~1e-9 no longer describes the probed bitmap; and a caller
    probing with k_hashes=1 would sit at ~3% — the bound here relies
    on k=3.) Exact counts are the hash-compared payload; the bitmap
    pass-count is Spark-hash-specific, so it feeds only the boolean
    (the same sketch-verification pattern as hll_distinct)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import (
        bloom_prefilter,
    )

    li, keys = _nation_supplier_keys(spark, sf_dir)
    passed = bloom_prefilter(li, keys, "l_suppkey", "s_suppkey")
    exact = li.join(
        F.broadcast(keys.withColumnRenamed("s_suppkey", "l_suppkey").distinct()),
        "l_suppkey",
        "left_semi",
    )
    counts = (
        li.agg(F.count(F.lit(1)).alias("n_total"))
        .crossJoin(passed.agg(F.count(F.lit(1)).alias("_n_pass")))
        .crossJoin(exact.agg(F.count(F.lit(1)).alias("n_match")))
    )
    fpr = (F.col("_n_pass") - F.col("n_match")).cast("double") / (
        F.col("n_total") - F.col("n_match")
    ).cast("double")
    return counts.select(
        "n_total",
        "n_match",
        (fpr <= F.lit(BLOOM_FPR_BOUND)).cast("int").alias("fpr_within_bound"),
    )


SQL_BLOOM_FPR_AUDIT = f"""
SELECT (SELECT count(*) FROM lineitem) AS n_total,
       (SELECT count(*) FROM lineitem
        WHERE l_suppkey IN (
          SELECT s_suppkey FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = '{BLOOM_NATION}'
        )) AS n_match,
       CAST(1 AS INT) AS fpr_within_bound
"""


# -- qid: join_size_estimate -------------------------------------------

JSE_BOUND = 0.25


def _parquet_num_rows(sf_dir: str, table: str, fallback=None) -> int:
    """Exact row count from the parquet footer (metadata-only — no
    data scan), the statistic a planner reads before costing. Falls
    back to a real count() only if the footer is unreadable (e.g. a
    non-file layout)."""
    import os

    try:
        import pyarrow.parquet as pq

        path = os.path.join(sf_dir, f"{table}.parquet")
        if os.path.isdir(path):
            import pyarrow.dataset as ds

            return sum(
                f.metadata.num_rows
                for f in (pq.ParquetFile(p) for p in
                          ds.dataset(path, format="parquet").files)
            )
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return fallback.count() if fallback is not None else 0


def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join cardinality WITHOUT running the join — the planner-style
    pre-flight for choosing a join strategy. Exact size via the
    key-count moment (Σ cntA·cntB, the hash-compared payload) plus a
    deterministic key-sampled estimate (independent hash gates, scaled
    back up) that must land within ±25% — the sketch-verification
    boolean, since the sampling hash is engine-specific. Subject: the
    lineitem self-join on l_partkey (the Σn² co-occurrence explosion
    this engine's dedup/co-occurrence ops must cost before running).

    The sampling rate is SIZE-ADAPTIVE, the way a planner pre-flight
    would set it from table statistics: tiny tables aren't sampled at
    all (rate 1 ⇒ the estimate IS the moment — sampling a 6k-row
    fixture buys nothing and its relative σ would rival the ±25% gate,
    measured 21% at sf0.001), mid tables sample 1/2, large 1/4+. At
    the measured error profile (4% at sf0.01 rate 2, 0.3% at sf0.1
    rate 4) the gate sits ≥5σ from the boundary, so fixture
    regeneration cannot plausibly flip it."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import (
        join_size_exact,
        join_size_sampled,
    )

    li = load(spark, sf_dir, "lineitem")
    # row count from parquet FOOTER statistics (metadata-only, like a
    # planner reading table stats) — an eager count() here would scan
    # the fact table at query-CONSTRUCTION time, charging every plan
    # inspection (dump_plans, window_audit, bench warmup) a full pass
    n_rows = _parquet_num_rows(sf_dir, "lineitem", fallback=li)
    rate_inv = 1 if n_rows < 20_000 else (2 if n_rows < 200_000 else 4)
    ex = join_size_exact(li, li, "l_partkey", "l_partkey")
    est = join_size_sampled(li, li, "l_partkey", "l_partkey", rate_inv=rate_inv)
    j = ex.crossJoin(est)
    ok = (
        F.abs(F.col("est_size") - F.col("join_size")).cast("double")
        / F.col("join_size").cast("double")
        <= F.lit(JSE_BOUND)
    )
    return j.select("join_size", ok.cast("int").alias("est_within_bound"))


SQL_JOIN_SIZE_ESTIMATE = """
WITH c AS (SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY l_partkey)
SELECT CAST(sum(n * n) AS BIGINT) AS join_size,
       CAST(1 AS INT) AS est_within_bound
FROM c
"""


# -- qid: session_window_batch -----------------------------------------

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import SESSION_GAP_S

SESSION_GAP = f"{SESSION_GAP_S} seconds"
SESSION_USERS = 30


def q_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in session_window in BATCH mode, cross-validated
    against the gap-islands formulation (qid `sessionize` implements
    the same semantics manually; the oracle here IS the islands SQL) —
    two independent session constructions must agree session for
    session. One shuffle on (user, session-window assignment).

    ts is truncated to whole seconds first: session_window splits on
    the exact microsecond gap while the oracle's date_diff('second')
    counts second boundaries; truncation makes both sides split on
    identical whole-second arithmetic (same convention as sessionize's
    epoch_seconds).

    Boundary semantics: Spark's session_window is END-INCLUSIVE — an
    event landing EXACTLY gap seconds after the previous one extends
    the session (verified empirically), so the islands oracle splits
    on gap > timeout, not >=. The manual `sessionize` qid deliberately
    keeps the exclusive (>=) rule on both its sides — the two
    conventions only diverge on exact-gap ties, which never occur in
    the microsecond fixture and constantly occur under the hour-floored
    ties fuzz profile that exposed this (tools/fuzz_parity.py)."""
    ev = load(spark, sf_dir, "events").where(F.col("user_id") < SESSION_USERS)
    ev = ev.withColumn("ts", F.date_trunc("second", F.col("ts")))
    return (
        ev.groupBy(F.session_window("ts", SESSION_GAP), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


SQL_SESSION_WINDOW_BATCH = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR date_diff('second',
                                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                                ts) > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_s,
         event_id
  FROM events WHERE user_id < {SESSION_USERS}
),
islands AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id, date_trunc('second', min(ts)) AS session_start, count(*) AS n_events
FROM islands GROUP BY user_id, sid
"""


# -- qid: pmi_bigrams --------------------------------------------------

PMI_MIN_COUNT = 3
PMI_K = 20


def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by pointwise mutual information over the
    corpus — phrase mining for tokenizer vocab seeding."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import pmi_bigrams

    return pmi_bigrams(
        load(spark, sf_dir, "documents"), "text", PMI_MIN_COUNT, PMI_K
    )


SQL_PMI_BIGRAMS = f"""
WITH t AS (SELECT string_split({sql_ascii_lower('text')}, ' ') AS tk FROM documents),
uc AS (
  SELECT tok, count(*) AS c
  FROM (SELECT unnest(tk) AS tok FROM t) GROUP BY tok
),
tt AS (SELECT CAST(sum(c) AS BIGINT) AS t_tot FROM uc),
bc AS (
  SELECT bigram, count(*) AS cb FROM (
    SELECT unnest(list_transform(range(1, len(tk)),
                                 i -> tk[i] || ' ' || tk[i + 1])) AS bigram
    FROM t WHERE len(tk) >= 2
  ) GROUP BY bigram
),
bt AS (SELECT CAST(sum(cb) AS BIGINT) AS b_tot FROM bc),
scored AS (
  SELECT bigram, cb,
         floor(ln((CAST(cb AS DOUBLE) / b_tot)
                  / ((CAST(a.c AS DOUBLE) / t_tot)
                     * (CAST(b.c AS DOUBLE) / t_tot)))
               * 1000000.0 + 0.5) / 1000000.0 AS pmi
  FROM bc
  JOIN uc a ON a.tok = split_part(bigram, ' ', 1)
  JOIN uc b ON b.tok = split_part(bigram, ' ', 2)
  CROSS JOIN tt CROSS JOIN bt
  WHERE cb >= {PMI_MIN_COUNT}
)
SELECT bigram, cb AS n, pmi FROM scored
ORDER BY pmi DESC, bigram LIMIT {PMI_K}
"""


# -- qid: ab_test_lift -------------------------------------------------

def q_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B readout over a deterministic md5 user split:
    per-arm purchase conversion, lift, pooled z — the experimentation
    primitive on the events stream."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import ab_test_lift

    return ab_test_lift(load(spark, sf_dir, "events"))


SQL_AB_TEST_LIFT = """
WITH users AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4)) AS INTEGER) % 2
           AS arm
  FROM events GROUP BY user_id
),
per AS (
  SELECT arm, count(*) AS n, CAST(sum(converted) AS BIGINT) AS conv
  FROM users GROUP BY arm
),
j AS (
  SELECT max(CASE WHEN arm = 0 THEN n END) AS n_a,
         max(CASE WHEN arm = 0 THEN conv END) AS conv_a,
         max(CASE WHEN arm = 1 THEN n END) AS n_b,
         max(CASE WHEN arm = 1 THEN conv END) AS conv_b
  FROM per
),
c AS (
  SELECT n_a, conv_a, n_b, conv_b,
         CAST(conv_a AS DOUBLE) / n_a AS pa,
         CAST(conv_b AS DOUBLE) / n_b AS pb,
         CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) AS pool
  FROM j
)
SELECT n_a, conv_a, n_b, conv_b,
       floor(pa * 1000000.0 + 0.5) / 1000000.0 AS rate_a,
       floor(pb * 1000000.0 + 0.5) / 1000000.0 AS rate_b,
       floor((pa - pb) * 1000000.0 + 0.5) / 1000000.0 AS lift,
       CASE WHEN sqrt(pool * (1.0 - pool) * (1.0 / n_a + 1.0 / n_b)) > 0
            THEN floor((pa - pb)
                       / sqrt(pool * (1.0 - pool) * (1.0 / n_a + 1.0 / n_b))
                       * 1000000.0 + 0.5) / 1000000.0
            END AS z_score
FROM c
"""


# -- qid: funnel_time_window -------------------------------------------

FUNNEL_WINDOW_H = 24


def q_funnel_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained funnel: of users whose first event of type
    'signup' exists, how many purchased within 24 hours of it? The
    unconstrained funnel (events_funnel) ignores time; this is the
    product-metric variant. Anchor timestamps are one user-keyed agg;
    the conversion probe joins purchases back on the same key."""
    ev = load(spark, sf_dir, "events")
    anchors = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    converted = (
        purchases.join(anchors, "user_id")
        .where(
            (F.col("ts") >= F.col("signup_ts"))
            & (
                F.col("ts")
                <= F.col("signup_ts") + F.expr(f"INTERVAL {FUNNEL_WINDOW_H} HOURS")
            )
        )
        .select("user_id")
        .distinct()
    )
    n_anchor = anchors.agg(F.count(F.lit(1)).alias("n_signup_users"))
    n_conv = converted.agg(F.count(F.lit(1)).cast("long").alias("n_converted"))
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import pround

    return n_anchor.crossJoin(n_conv).select(
        "n_signup_users",
        "n_converted",
        pround(
            F.col("n_converted").cast("double") / F.col("n_signup_users").cast("double"),
            6,
        ).alias("conversion_rate"),
    )


SQL_FUNNEL_TIME_WINDOW = f"""
WITH anchors AS (
  SELECT user_id, min(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
conv AS (
  SELECT DISTINCT e.user_id
  FROM events e JOIN anchors a ON e.user_id = a.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts >= a.signup_ts
    AND e.ts <= a.signup_ts + INTERVAL {FUNNEL_WINDOW_H} HOURS
)
SELECT (SELECT count(*) FROM anchors) AS n_signup_users,
       CAST((SELECT count(*) FROM conv) AS BIGINT) AS n_converted,
       floor(CAST((SELECT count(*) FROM conv) AS DOUBLE)
             / (SELECT count(*) FROM anchors) * 1000000.0 + 0.5) / 1000000.0
         AS conversion_rate
"""


# -- qid: pareto_revenue -----------------------------------------------

def q_pareto_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: customers cut into spend deciles, each
    decile's share of total revenue — the 80/20 readout — WITHOUT a
    total order. The old form ranked with a global ``ntile(10)`` over
    per-customer totals: aggregated, but |customers| is unbounded, so
    at 100 TB the whole table funnels through one window partition.
    This is the scale plan (the ``feature_bins_sketch`` pattern,
    queries/relational2.py): decile CUT POINTS from one
    ``percentile_approx`` pass (mergeable sketch, 9 doubles to the
    driver — control plane), then a MAP-ONLY bucket assignment and a
    10-group aggregate. Decile 1 = top spenders.

    Sketch cuts are engine-specific, so the oracle is accuracy-gated:
    the hash-compared payload is per-decile (decile id, exact customer
    count, exact corpus revenue total rounded) plus two flags — the
    decile's customer share lands within ±2% of the ideal tenth (rank
    error ≤ n·1e-4 at accuracy=10000, so guaranteed unless the sketch
    breaks or spend ties are massive), and per-decile AVERAGE spend is
    non-increasing in decile id (true BY CONSTRUCTION: bucket ranges
    don't overlap, so every decile-d customer outspends every
    decile-d+1 customer — a broken cut assignment flips it). All 10
    decile rows are always emitted (left join from a 1..10 spine), so
    a degenerate sketch shows up as a red flag, not a row-count
    drift."""
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import pround

    from oracle_to_oracle_data_integration_pipeline_spark.operators.cache_registry import (
        persist_tracked,
    )

    # the per-customer aggregate feeds THREE consumers (sketch pass,
    # totals branch, per-decile branch) and Catalyst does not dedupe
    # common subplans — without the stage persist the orders scan+agg
    # runs three times per execution (round 10: ~0.4s of the qid's
    # 1.4s). Tracked in the shared registry like the composition qids'
    # stage persists; it is recomputed from parquet on every run.
    per_cust = persist_tracked(
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(dsum(F.col("o_totalprice"), 2).alias("spend")),
        "pareto_revenue",
        replace=True,  # one live copy per session (ADVICE round 10)
    )
    cuts = per_cust.select(
        F.expr(
            "percentile_approx(spend, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9), 10000)"
        ).alias("c")
    ).collect()[0]["c"]
    # spend above all 9 ascending cuts → decile 1 (top spenders)
    n_above = sum(
        (F.when(F.col("spend") > F.lit(float(c)), 1).otherwise(0) for c in cuts),
        F.lit(0),
    )
    deciled = per_cust.withColumn("decile", F.lit(10) - n_above)
    totals = deciled.agg(
        F.count(F.lit(1)).alias("n_total_customers"),
        F.sum(F.col("spend").cast("decimal(24,6)")).alias("t"),
    )
    per = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("spend").cast("decimal(24,6)")).alias("_d_rev"),
    )
    # all 10 deciles always present: an empty decile (degenerate
    # sketch / massive ties) must surface as a failed flag, never as a
    # row-count drift against the oracle's generated 1..10
    spine = spark.range(1, 11).select(F.col("id").cast("int").alias("decile"))
    per = spine.join(F.broadcast(per), "decile", "left").select(
        "decile",
        F.coalesce(F.col("_n"), F.lit(0)).alias("_n"),
        (F.col("_d_rev").cast("double") / F.col("_n")).alias("_avg_spend"),
    )
    # per-decile average spend must not increase with decile id — the
    # by-construction monotonicity of non-overlapping bucket ranges
    prev = per.select(
        (F.col("decile") + 1).alias("decile"), F.col("_avg_spend").alias("_prev_avg")
    )
    per = per.join(F.broadcast(prev), "decile", "left")
    # the ±2% ideal-tenth bound needs the integer rounding slack
    # ceil(n/10)/n − 1/10 to fit inside 0.02, i.e. n ≥ ~45: below 50
    # customers the flag asserts trivially true (stated, not hidden —
    # same convention as approx_quantiles' envelope; fuzz find,
    # tools/fuzz_parity.py tiny profile with 11 customers)
    share_ok = (
        (
            F.abs(F.col("_n") - F.col("n_total_customers") / 10)
            <= F.col("n_total_customers") * 0.02
        )
        | (F.col("n_total_customers") < 50)
    ).cast("int")
    mono_ok = (
        F.col("_prev_avg").isNull()
        | F.col("_avg_spend").isNull()
        | (F.col("_avg_spend") <= F.col("_prev_avg"))
    ).cast("int")
    return (
        per.crossJoin(F.broadcast(totals))
        .select(
            "decile",
            "n_total_customers",
            pround(F.col("t").cast("double"), 2).alias("total_revenue"),
            share_ok.alias("share_within_2pct"),
            mono_ok.alias("avg_spend_monotone"),
        )
    )


SQL_PARETO_REVENUE = """
WITH per_cust AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(24,6))) AS spend
  FROM orders GROUP BY o_custkey
),
t AS (
  SELECT count(*) AS n_total_customers,
         floor(CAST(sum(spend) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS total_revenue
  FROM per_cust
)
SELECT CAST(d AS INT) AS decile, n_total_customers, total_revenue,
       CAST(1 AS INT) AS share_within_2pct,
       CAST(1 AS INT) AS avg_spend_monotone
FROM (SELECT unnest(generate_series(1, 10)) AS d), t
"""


# -- qid: spearman_corr ------------------------------------------------

def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of lineitem quantity vs discount
    (average-rank tie handling) — the monotone-association complement
    to stats_moments' Pearson."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.stats import (
        spearman_corr,
    )

    return spearman_corr(load(spark, sf_dir, "lineitem"), "l_quantity", "l_discount")


SQL_SPEARMAN_CORR = """
WITH base AS (
  SELECT l_quantity, l_discount FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
),
fx AS (SELECT l_quantity AS v, count(*) AS c FROM base GROUP BY l_quantity),
rx2 AS (
  SELECT v AS l_quantity,
         2 * coalesce(sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c + 1 AS rx2
  FROM fx
),
fy AS (SELECT l_discount AS v, count(*) AS c FROM base GROUP BY l_discount),
ry2 AS (
  SELECT v AS l_discount,
         2 * coalesce(sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c + 1 AS ry2
  FROM fy
),
j AS (
  SELECT rx2.rx2, ry2.ry2
  FROM base l JOIN rx2 USING (l_quantity) JOIN ry2 USING (l_discount)
),
a AS (
  -- exact HUGEINT sums cast to double (the BIGINT cast would error at
  -- n where sum((2r)^2) exceeds int64; Spark mirrors via DECIMAL sums)
  SELECT count(*) AS n,
         CAST(sum(rx2) AS DOUBLE) AS sx, CAST(sum(ry2) AS DOUBLE) AS sy,
         CAST(sum(rx2 * rx2) AS DOUBLE) AS sxx,
         CAST(sum(ry2 * ry2) AS DOUBLE) AS syy,
         CAST(sum(rx2 * ry2) AS DOUBLE) AS sxy
  FROM j
)
SELECT n,
       CASE WHEN sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                      * (CAST(n AS DOUBLE) * syy - sy * sy)) > 0
            THEN floor((CAST(n AS DOUBLE) * sxy - sx * sy)
                       / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                              * (CAST(n AS DOUBLE) * syy - sy * sy))
                       * 1000000.0 + 0.5) / 1000000.0
            END AS spearman
FROM a
"""


# -- qid: impute_median ------------------------------------------------

IMPUTE_USERS = 20


def q_impute_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-feature imputation: nulls (synthesized deterministically
    on event_id % 7 — the fixture has none) are filled with the
    per-event-type median of the OBSERVED values. Broadcast group
    medians + map-only fill; the imputed flag rides along so
    downstream can weight accordingly."""
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import pround

    ev = load(spark, sf_dir, "events").withColumn(
        "v",
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double")).otherwise(
            F.col("value").cast("double")
        ),
    )
    med = ev.where(F.col("v").isNotNull()).groupBy("event_type").agg(
        pround(F.expr("percentile(v, 0.5)"), 6).alias("med")
    )
    return (
        ev.where(F.col("user_id") < IMPUTE_USERS)
        .join(F.broadcast(med), "event_type")
        .select(
            "event_id",
            "event_type",
            F.coalesce(pround(F.col("v"), 6), F.col("med")).alias("value_imputed"),
            F.col("v").isNull().cast("int").alias("was_imputed"),
        )
    )


SQL_IMPUTE_MEDIAN = f"""
WITH e AS (
  SELECT event_id, event_type, user_id,
         CASE WHEN event_id % 7 = 0 THEN NULL
              ELSE CAST(value AS DOUBLE) END AS v
  FROM events
),
med AS (
  SELECT event_type,
         floor(quantile_cont(v, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS med
  FROM e WHERE v IS NOT NULL GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       coalesce(floor(e.v * 1000000.0 + 0.5) / 1000000.0, m.med) AS value_imputed,
       CAST(CASE WHEN e.v IS NULL THEN 1 ELSE 0 END AS INT) AS was_imputed
FROM e JOIN med m USING (event_type)
WHERE e.user_id < {IMPUTE_USERS}
"""


# -- qid: one_hot_encode -----------------------------------------------

OHE_USERS = 20


def q_one_hot_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical → indicator columns for the event_type feature —
    the ML-prep encode step as pure column algebra (map-only, the
    category set pinned explicitly so the schema is stable even if a
    batch lacks a category)."""
    cats = ["click", "error", "purchase", "signup", "view"]
    ev = load(spark, sf_dir, "events").where(F.col("user_id") < OHE_USERS)
    return ev.select(
        "event_id",
        *[
            (F.col("event_type") == c).cast("int").alias(f"is_{c}")
            for c in cats
        ],
    )


SQL_ONE_HOT_ENCODE = f"""
SELECT event_id,
       CAST(event_type = 'click' AS INT) AS is_click,
       CAST(event_type = 'error' AS INT) AS is_error,
       CAST(event_type = 'purchase' AS INT) AS is_purchase,
       CAST(event_type = 'signup' AS INT) AS is_signup,
       CAST(event_type = 'view' AS INT) AS is_view
FROM events WHERE user_id < {OHE_USERS}
"""


# -- qid: target_encode ------------------------------------------------

TE_SMOOTH = 20.0


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean-target encoding of the event_type categorical:
    enc(c) = (sum_c + m*global_mean) / (n_c + m) — the classic
    high-cardinality-safe encoder. Per-category sums are one
    combinable groupBy; the global mean is a broadcast scalar; all
    sums ride the exact decimal path."""
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import pround

    ev = load(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_c"),
        F.sum(F.col("value").cast("decimal(24,6)")).alias("sum_c"),
    )
    g = ev.agg(
        (
            F.sum(F.col("value").cast("decimal(24,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("gmean")
    )
    return per.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n_c",
        pround(
            (F.col("sum_c").cast("double") + F.lit(TE_SMOOTH) * F.col("gmean"))
            / (F.col("n_c") + F.lit(TE_SMOOTH)),
            6,
        ).alias("encoded"),
    )


SQL_TARGET_ENCODE = f"""
WITH per AS (
  SELECT event_type, count(*) AS n_c,
         sum(CAST(value AS DECIMAL(24,6))) AS sum_c
  FROM events GROUP BY event_type
),
g AS (
  SELECT CAST(sum(CAST(value AS DECIMAL(24,6))) AS DOUBLE) / count(*) AS gmean
  FROM events
)
SELECT event_type, n_c,
       floor((CAST(sum_c AS DOUBLE) + {TE_SMOOTH} * gmean)
             / (n_c + {TE_SMOOTH}) * 1000000.0 + 0.5) / 1000000.0 AS encoded
FROM per, g
"""


# -- qid: hashing_trick ------------------------------------------------

HASH_BUCKETS = 16
HASH_DOCS = 25


def q_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick text features: tokens bucketed by a portable md5
    hash into a fixed 16-dim count vector per document — the
    vocabulary-free featurizer for linear models. Map-side hashing,
    one (doc, bucket) combinable shuffle."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.sampling import (
        hash_bucket_col,
    )

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < HASH_DOCS)
    toks = d.select(
        # ASCII fold: token strings feed the md5 bucket hash, and Unicode
        # case mapping diverges between the engines (fuzz find, unicode
        # profile at seed 2 — final sigma / dotted-I md5 to different buckets)
        "doc_id", F.explode(F.split(ascii_lower_col(F.col("text")), " ")).alias("tok")
    )
    return (
        toks.withColumn("bucket", hash_bucket_col(F.col("tok"), HASH_BUCKETS))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_HASHING_TRICK = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({sql_ascii_lower('text')}, ' ')) AS tok
  FROM documents WHERE doc_id < {HASH_DOCS}
)
SELECT doc_id,
       CAST(CAST(('0x' || substr(md5(tok), 1, 4)) AS INTEGER) % {HASH_BUCKETS} AS INT)
         AS bucket,
       count(*) AS n
FROM toks GROUP BY doc_id, bucket
"""


# -- qid: class_weights ------------------------------------------------

def q_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights for the lang label —
    w_c = N / (K * n_c), the sklearn 'balanced' recipe: one tiny
    groupBy + scalar broadcast."""
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import pround

    d = load(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_c"))
    tot = per.agg(
        F.sum("n_c").cast("long").alias("n"), F.count(F.lit(1)).alias("k")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_c",
        pround(
            F.col("n").cast("double")
            / (F.col("k").cast("double") * F.col("n_c").cast("double")),
            6,
        ).alias("weight"),
    )


SQL_CLASS_WEIGHTS = """
WITH per AS (SELECT lang, count(*) AS n_c FROM documents GROUP BY lang),
tot AS (SELECT CAST(sum(n_c) AS BIGINT) AS n, count(*) AS k FROM per)
SELECT lang, n_c,
       floor(CAST(n AS DOUBLE) / (CAST(k AS DOUBLE) * n_c) * 1000000.0 + 0.5)
         / 1000000.0 AS weight
FROM per, tot
"""


# -- qid: group_split --------------------------------------------------

def q_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/val/test assignment: the fold comes from the
    USER's hash, so no user's events ever straddle folds (the leakage
    guard group-shuffle-split enforces). Output: per (split, user)
    event counts — any user appearing under two splits would double
    its row count against the oracle."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.sampling import (
        split_assign,
    )

    ev = load(spark, sf_dir, "events")
    return (
        split_assign(ev, id_col="user_id", train_pct=80, val_pct=10)
        .groupBy("split")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


SQL_GROUP_SPLIT = """
WITH assigned AS (
  SELECT user_id,
         CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 < 80
              THEN 'train'
              WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 < 90
              THEN 'val'
              ELSE 'test' END AS split
  FROM events
)
SELECT split, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       count(*) AS n_events
FROM assigned GROUP BY split
"""


# -- qid: kmv_distinct -------------------------------------------------

KMV_K = 64


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch per event_type — unlike HLL
    (engine-private state, flag-gated in hll_distinct), KMV over a
    PORTABLE md5 hash is bit-identical in any engine, so the ESTIMATE
    itself is hash-compared, not just bounds-checked. est = (k-1)/h(k)
    where h(k) is the k-th smallest hash mapped into (0,1); groups with
    fewer than k distinct values report their exact count. Sketch
    state is k values per group — mergeable, constant memory, the
    100 TB cardinality primitive."""
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import (
        md5_frac52,
        pround,
    )
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    h = md5_frac52(F.col("user_id"))
    # NULL keys would rank NULLS FIRST in Spark but LAST in DuckDB —
    # exclude them on both sides
    hashed = (
        ev.where(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
        .withColumn("h", h)
    )
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    kth = ranked.where(F.col("rn") <= KMV_K).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_in_sketch"),
        F.max("h").alias("hk"),
    )
    est = F.when(
        F.col("n_in_sketch") < KMV_K, F.col("n_in_sketch").cast("double")
    ).otherwise((F.lit(float(KMV_K - 1))) / F.col("hk"))
    return kth.select(
        "event_type",
        "n_in_sketch",
        pround(est, 6).alias("distinct_estimate"),
    )


SQL_KMV_DISTINCT = f"""
WITH du AS (
  SELECT DISTINCT event_type, user_id FROM events WHERE user_id IS NOT NULL
),
hashed AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT)
           / CAST(power(16, 13) AS DOUBLE) AS h
  FROM du
),
ranked AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashed
),
kth AS (
  SELECT event_type, count(*) AS n_in_sketch, max(h) AS hk
  FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type
)
SELECT event_type, n_in_sketch,
       floor(CASE WHEN n_in_sketch < {KMV_K}
                  THEN CAST(n_in_sketch AS DOUBLE)
                  ELSE {float(KMV_K - 1)} / hk END * 1000000.0 + 0.5) / 1000000.0
         AS distinct_estimate
FROM kth
"""


# -- qid: dau_wau_ratio ------------------------------------------------

def q_dau_wau_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stickiness per ISO week: average daily-active-users divided by
    weekly-active-users — two keyed distinct-count aggregations, the
    denominator broadcast back onto the 7-row-per-week numerator."""
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import pround

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id"),
        F.date_trunc("week", F.col("ts")).alias("wk"),
        F.col("ts").cast("date").alias("day"),
    )
    dau = ev.groupBy("wk", "day").agg(F.countDistinct("user_id").alias("dau"))
    # dau has one row per (wk, day) by construction: plain counts, not
    # a second distinct-aggregate pass
    avg_dau = dau.groupBy("wk").agg(
        (F.sum("dau").cast("double") / F.count(F.lit(1))).alias("avg_dau"),
        F.count(F.lit(1)).alias("n_days"),
    )
    wau = ev.groupBy("wk").agg(F.countDistinct("user_id").alias("wau"))
    return (
        avg_dau.join(wau, "wk")
        .select(
            F.col("wk").cast("date").alias("week_start"),
            "n_days",
            pround(F.col("avg_dau"), 6).alias("avg_dau"),
            "wau",
            pround(F.col("avg_dau") / F.col("wau").cast("double"), 6).alias(
                "stickiness"
            ),
        )
    )


SQL_DAU_WAU_RATIO = """
WITH e AS (
  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
         CAST(ts AS DATE) AS day
  FROM events
),
dau AS (
  SELECT wk, day, count(DISTINCT user_id) AS dau FROM e GROUP BY wk, day
),
a AS (
  SELECT wk, CAST(sum(dau) AS DOUBLE) / count(*) AS avg_dau,
         count(*) AS n_days
  FROM dau GROUP BY wk
),
w AS (SELECT wk, CAST(count(DISTINCT user_id) AS BIGINT) AS wau FROM e GROUP BY wk)
SELECT a.wk AS week_start, a.n_days,
       floor(a.avg_dau * 1000000.0 + 0.5) / 1000000.0 AS avg_dau,
       w.wau,
       floor(a.avg_dau / w.wau * 1000000.0 + 0.5) / 1000000.0 AS stickiness
FROM a JOIN w USING (wk)
"""


# -- qid: anomaly_days -------------------------------------------------

ANOM_SIGMA = 2.0


def q_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose event volume deviates more than 2 sigma from the mean
    daily volume — the volume-anomaly monitor. Daily counts are one
    shuffle; mean/std come from decimal-exact power sums over the tiny
    day table and broadcast back."""
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import pround

    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = daily.agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("mu"),
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
        F.sum("n").alias("s"),
    ).select(
        "mu",
        F.sqrt(
            (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n_days"))
            / F.col("n_days")
        ).alias("sigma"),
    )
    return (
        daily.crossJoin(F.broadcast(stats))
        .where(F.abs(F.col("n") - F.col("mu")) > F.lit(ANOM_SIGMA) * F.col("sigma"))
        .select(
            "day",
            "n",
            pround(F.col("mu"), 6).alias("mean_daily"),
            pround(F.col("sigma"), 6).alias("sigma_daily"),
        )
    )


SQL_ANOMALY_DAYS = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY CAST(ts AS DATE)
),
stats AS (
  SELECT CAST(sum(n) AS DOUBLE) / count(*) AS mu,
         sqrt((CAST(sum(n * n) AS DOUBLE)
               - CAST(sum(n) AS DOUBLE) * sum(n) / count(*)) / count(*)) AS sigma
  FROM daily
)
SELECT day, n,
       floor(mu * 1000000.0 + 0.5) / 1000000.0 AS mean_daily,
       floor(sigma * 1000000.0 + 0.5) / 1000000.0 AS sigma_daily
FROM daily, stats
WHERE abs(n - mu) > {ANOM_SIGMA} * sigma
"""


QUERIES = {
    "kmv_distinct": q_kmv_distinct,
    "dau_wau_ratio": q_dau_wau_ratio,
    "anomaly_days": q_anomaly_days,
    "target_encode": q_target_encode,
    "hashing_trick": q_hashing_trick,
    "class_weights": q_class_weights,
    "group_split": q_group_split,
    "impute_median": q_impute_median,
    "one_hot_encode": q_one_hot_encode,
    "spearman_corr": q_spearman_corr,
    "pareto_revenue": q_pareto_revenue,
    "funnel_time_window": q_funnel_time_window,
    "ab_test_lift": q_ab_test_lift,
    "pmi_bigrams": q_pmi_bigrams,
    "session_window_batch": q_session_window_batch,
    "join_size_estimate": q_join_size_estimate,
    "bloom_fpr_audit": q_bloom_fpr_audit,
    "histogram_fixed": q_histogram_fixed,
    "fuzzy_dedup": q_fuzzy_dedup,
    "window_percentiles": q_window_percentiles,
    "robust_scale": q_robust_scale,
    "sql_interface": q_sql_interface,
    "rolling_median": q_rolling_median,
    "regression_per_key": q_regression_per_key,
    "mad_outliers": q_mad_outliers,
    "chi2_independence": q_chi2_independence,
    "part_cooccurrence": q_part_cooccurrence,
    "bigram_freq": q_bigram_freq,
    "char_entropy": q_char_entropy,
    "bloom_join": q_bloom_join,
    "embed_normalize": q_embed_normalize,
}

ORACLE_SQL = {
    "kmv_distinct": SQL_KMV_DISTINCT,
    "dau_wau_ratio": SQL_DAU_WAU_RATIO,
    "anomaly_days": SQL_ANOMALY_DAYS,
    "target_encode": SQL_TARGET_ENCODE,
    "hashing_trick": SQL_HASHING_TRICK,
    "class_weights": SQL_CLASS_WEIGHTS,
    "group_split": SQL_GROUP_SPLIT,
    "impute_median": SQL_IMPUTE_MEDIAN,
    "one_hot_encode": SQL_ONE_HOT_ENCODE,
    "spearman_corr": SQL_SPEARMAN_CORR,
    "pareto_revenue": SQL_PARETO_REVENUE,
    "funnel_time_window": SQL_FUNNEL_TIME_WINDOW,
    "ab_test_lift": SQL_AB_TEST_LIFT,
    "pmi_bigrams": SQL_PMI_BIGRAMS,
    "session_window_batch": SQL_SESSION_WINDOW_BATCH,
    "join_size_estimate": SQL_JOIN_SIZE_ESTIMATE,
    "bloom_fpr_audit": SQL_BLOOM_FPR_AUDIT,
    "histogram_fixed": SQL_HISTOGRAM_FIXED,
    "fuzzy_dedup": SQL_FUZZY_DEDUP,
    "window_percentiles": SQL_WINDOW_PERCENTILES,
    "robust_scale": SQL_ROBUST_SCALE,
    "sql_interface": SQL_SQL_INTERFACE,
    "rolling_median": SQL_ROLLING_MEDIAN,
    "regression_per_key": SQL_REGRESSION_PER_KEY,
    "mad_outliers": SQL_MAD_OUTLIERS,
    "chi2_independence": SQL_CHI2_INDEPENDENCE,
    "part_cooccurrence": SQL_PART_COOCCURRENCE,
    "bigram_freq": SQL_BIGRAM_FREQ,
    "char_entropy": SQL_CHAR_ENTROPY,
    "bloom_join": SQL_BLOOM_JOIN,
    "embed_normalize": SQL_EMBED_NORMALIZE,
}
