"""Master-data-management qids — the multi-source generalization of
the reference's one-source CDC merge (`/root/reference/scripts/
03_cdc_etl.py` replicates ONE Oracle schema into ONE target):

- ``survivorship_merge`` — golden-record construction: N source
  systems disagree per column; survivorship picks each column's value
  by source priority with null fallthrough (the MDM step every
  multi-system integration needs the day a second source appears).
- ``late_dim_insert`` — late-arriving dimension handling: facts whose
  dimension key has not replicated yet get an inferred placeholder
  member instead of being dropped or failing the FK (the standard
  warehouse answer to CDC streams that deliver facts before dims).
- ``rfm_segments`` — recency/frequency/monetary scoring by exact
  distributed rank (``operators.scale.distributed_rank`` — never a
  global ORDER BY window), the classic customer-value segmentation.

Determinism: survivorship keys are unique per (entity, source), so
max_by can never tie; the RFM quantile bucket is the explicit
``floor((rank−1)·k/n)`` formula in BOTH engines (SQL NTILE distributes
remainders differently — documented, not used); money sums ride the
DECIMAL path (`_util.dsum`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import (
    distributed_rank,
    signed_log_bucket,
)
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import (
    dsum,
    load,
    pround,
)


# -- qid: survivorship_merge ------------------------------------------------

def _two_systems(c: DataFrame) -> DataFrame:
    """Deterministic two-system simulation of the customer master:
    system A (priority 2, fresher feed) is missing every third entity
    and some attributes; system B (priority 1, legacy) is complete but
    stale/holey on others. All drift is custkey-mod arithmetic so the
    oracle reproduces it exactly."""
    k = F.col("c_custkey")
    sys_a = (
        c.where(k % 3 != 0)
        .select(
            "c_custkey",
            F.lit(2).alias("priority"),
            F.col("c_name").alias("name"),
            F.when(k % 11 != 0, F.col("c_nationkey")).alias("nationkey"),
            F.when(k % 5 == 0, F.col("c_acctbal") + 10.0)
            .otherwise(F.col("c_acctbal"))
            .alias("acctbal"),
            F.when(k % 13 != 0, F.col("c_mktsegment")).alias("mktsegment"),
        )
    )
    sys_b = c.select(
        "c_custkey",
        F.lit(1).alias("priority"),
        F.when(k % 4 == 0, F.concat(F.lit("OLD_"), F.col("c_name")))
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.when(k % 7 != 0, F.col("c_acctbal")).alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    return sys_a.unionByName(sys_b)


def q_survivorship_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship over a two-system customer master:
    per entity and per column, the surviving value is the NON-NULL
    value from the highest-priority source (a null in the priority
    source falls through to the next — column-level, not row-level,
    which is what distinguishes survivorship from latest-per-key).

    Mechanics: ``max_by(col, key)`` with key = priority when the value
    is non-null, −1 when null. Keys are unique per (entity, source),
    so the argmax can never tie (Spark's max_by tie order is
    undefined; uniqueness is the determinism contract, same as
    DuckDB's arg_max). ``n_conflicts`` counts columns where the
    sources genuinely disagree (both non-null, different) — the MDM
    stewardship metric.

    Scale: ONE hash shuffle on the entity key over the unioned
    feeds; every max_by partially aggregates map-side. No window, no
    join, no collect.
    """
    both = _two_systems(load(spark, sf_dir, "customer"))

    def survive(col: str):
        key = F.when(F.col(col).isNotNull(), F.col("priority")).otherwise(
            F.lit(-1)
        )
        return F.max_by(F.col(col), key).alias(f"g_{col}")

    return both.groupBy("c_custkey").agg(
        survive("name"),
        survive("nationkey"),
        survive("acctbal"),
        survive("mktsegment"),
        F.count(F.lit(1)).alias("n_sources"),
        (
            (F.countDistinct("name") > 1).cast("int")
            + (F.countDistinct("nationkey") > 1).cast("int")
            + (F.countDistinct("acctbal") > 1).cast("int")
            + (F.countDistinct("mktsegment") > 1).cast("int")
        ).alias("n_conflicts"),
    )


SQL_SURVIVORSHIP_MERGE = """
WITH sys_a AS (
  SELECT c_custkey, 2 AS priority, c_name AS name,
         CASE WHEN c_custkey % 11 <> 0 THEN c_nationkey END AS nationkey,
         CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 10.0
              ELSE c_acctbal END AS acctbal,
         CASE WHEN c_custkey % 13 <> 0 THEN c_mktsegment END AS mktsegment
  FROM customer WHERE c_custkey % 3 <> 0
),
sys_b AS (
  SELECT c_custkey, 1 AS priority,
         CASE WHEN c_custkey % 4 = 0 THEN 'OLD_' || c_name
              ELSE c_name END AS name,
         c_nationkey AS nationkey,
         CASE WHEN c_custkey % 7 <> 0 THEN c_acctbal END AS acctbal,
         c_mktsegment AS mktsegment
  FROM customer
),
both_sys AS (SELECT * FROM sys_a UNION ALL SELECT * FROM sys_b)
SELECT c_custkey,
       arg_max(name, CASE WHEN name IS NOT NULL THEN priority ELSE -1 END)
         AS g_name,
       arg_max(nationkey,
               CASE WHEN nationkey IS NOT NULL THEN priority ELSE -1 END)
         AS g_nationkey,
       arg_max(acctbal,
               CASE WHEN acctbal IS NOT NULL THEN priority ELSE -1 END)
         AS g_acctbal,
       arg_max(mktsegment,
               CASE WHEN mktsegment IS NOT NULL THEN priority ELSE -1 END)
         AS g_mktsegment,
       count(*) AS n_sources,
       CAST(CASE WHEN count(DISTINCT name) > 1 THEN 1 ELSE 0 END
          + CASE WHEN count(DISTINCT nationkey) > 1 THEN 1 ELSE 0 END
          + CASE WHEN count(DISTINCT acctbal) > 1 THEN 1 ELSE 0 END
          + CASE WHEN count(DISTINCT mktsegment) > 1 THEN 1 ELSE 0 END
         AS INT) AS n_conflicts
FROM both_sys GROUP BY c_custkey
"""


# -- qid: late_dim_insert ------------------------------------------------

def q_late_dim_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving dimension handling: the customer dimension is
    missing every seventh key (its CDC feed lags the order feed —
    exactly what happens when the reference's per-table watermarks
    advance at different rates); the fact pipeline must neither drop
    those orders nor fail the FK. The warehouse answer: LEFT join,
    route unmatched keys to an inferred 'UNKNOWN' member, report per
    segment with the inferred population visible.

    Scale: facts pre-aggregate per custkey (combinable — the shuffle
    carries one row per customer, not per order) BEFORE touching the
    dimension; the dim join is then keyed customer-vs-customer
    (hint-free — stats broadcast it at fixture scale; at 100 TB the
    planner picks the co-partitioned shuffle join a grown dim needs),
    and the final segment rollup is a 5-row aggregate.
    """
    facts = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(24,6)")).alias("_rev"),
        )
    )
    dim = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 7 != 0)
        .select("c_custkey", "c_mktsegment")
    )
    joined = facts.join(
        dim, facts.o_custkey == dim.c_custkey, "left"
    )
    return (
        joined.select(
            F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment"),
            F.col("c_custkey").isNull().cast("int").alias("_inferred"),
            "n_orders",
            "_rev",
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("_inferred").cast("bigint").alias("n_inferred"),
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.round(F.sum("_rev"), 2).cast("double").alias("revenue"),
        )
    )


SQL_LATE_DIM_INSERT = """
WITH facts AS (
  SELECT o_custkey, count(*) AS n_orders,
         sum(CAST(o_totalprice AS DECIMAL(24,6))) AS rev
  FROM orders GROUP BY o_custkey
),
dim AS (
  SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 7 <> 0
)
SELECT coalesce(d.c_mktsegment, 'UNKNOWN') AS segment,
       count(*) AS n_customers,
       CAST(sum(CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_inferred,
       CAST(sum(f.n_orders) AS BIGINT) AS n_orders,
       CAST(round(sum(f.rev), 2) AS DOUBLE) AS revenue
FROM facts f LEFT JOIN dim d ON f.o_custkey = d.c_custkey
GROUP BY 1
"""


# -- qid: rfm_segments ------------------------------------------------------

RFM_TILES = 5


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer, recency (days since
    last order vs the corpus max date), frequency (order count) and
    monetary (exact revenue) each score 1..{RFM_TILES} by quantile
    rank, then a rule table labels the segment — the classic
    customer-value model, built scale-first.

    All three ranks come from ``operators.scale.distributed_rank``
    (monotonic-bucket two-pass exact global rank — recency and
    frequency bucket by their own bounded integer value, monetary by
    floor(log10·100)); a bare row_number() over 10⁸ customers would
    single-partition the table. The quantile bucket is the explicit
    floor((rank−1)·k/n) formula in both engines — SQL NTILE's
    remainder rule differs (n=8,k=5: NTILE gives 2,2,2,1,1; this
    gives 2,2,1,2,1), so the oracle twin uses the same formula, never
    NTILE. Recency scores INVERT (small recency = recent = 5).
    """
    o = load(spark, sf_dir, "orders")
    cutoff = o.agg(F.max("o_orderdate").alias("max_date"))
    per = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            dsum(F.col("o_totalprice")).alias("monetary"),
        )
        .crossJoin(F.broadcast(cutoff))
        .select(
            "o_custkey",
            F.datediff(F.to_date("max_date"), F.to_date("last_order")).alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
        # a customer with no dated or no priced order has no R or M to
        # rank — excluded by contract on BOTH sides (the engines would
        # otherwise also rank the NULL oppositely; DIVERGENCES.md
        # class 8, found by the sf0.1 nulls sweep). The filter must
        # run BEFORE the tile denominator count so n matches too.
        .filter(
            F.col("recency_days").isNotNull() & F.col("monetary").isNotNull()
        )
    )
    r = distributed_rank(
        per, "recency_days", "o_custkey", F.col("recency_days"), out_col="_rr"
    )
    f_ = distributed_rank(
        r, "frequency", "o_custkey", F.col("frequency"), out_col="_fr"
    )
    m = distributed_rank(
        f_,
        "monetary",
        "o_custkey",
        # total over every real: boundary fuzz zeroes prices, and
        # log10(0) is a NULL bucket = a silently dropped row
        signed_log_bucket(F.col("monetary")),
        out_col="_mr",
    )
    n = m.crossJoin(
        F.broadcast(per.agg(F.count(F.lit(1)).alias("_n")))
    )

    def tile(rank_col: str):
        return (
            F.floor(
                (F.col(rank_col) - 1).cast("double")
                * F.lit(float(RFM_TILES))
                / F.col("_n").cast("double")
            )
            + 1
        ).cast("int")

    scored = n.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        (F.lit(RFM_TILES + 1) - tile("_rr")).cast("int").alias("r_score"),
        tile("_fr").alias("f_score"),
        tile("_mr").alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4),
            "champion",
        )
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 3), "at_risk")
        .when(F.col("r_score") <= 2, "hibernating")
        .when(F.col("f_score") >= 4, "loyal")
        .when(F.col("m_score") >= 4, "big_spender")
        .otherwise("regular")
    )
    return scored.withColumn("segment", seg)


SQL_RFM_SEGMENTS = f"""
WITH cutoff AS (SELECT max(o_orderdate) AS max_date FROM orders),
per AS (
  SELECT o_custkey,
         date_diff('day', CAST(max(o_orderdate) AS DATE),
                   CAST((SELECT max_date FROM cutoff) AS DATE)) AS recency_days,
         count(*) AS frequency,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(24,6))), 2) AS DOUBLE)
           AS monetary
  FROM orders GROUP BY o_custkey
),
rk AS (
  SELECT *,
         row_number() OVER (ORDER BY recency_days, o_custkey) AS rr,
         row_number() OVER (ORDER BY frequency, o_custkey) AS fr,
         row_number() OVER (ORDER BY monetary, o_custkey) AS mr,
         count(*) OVER () AS n
  FROM per
  WHERE recency_days IS NOT NULL AND monetary IS NOT NULL
),
scored AS (
  SELECT o_custkey, recency_days, frequency, monetary,
         CAST({RFM_TILES + 1} - (floor(CAST(rr - 1 AS DOUBLE) * {RFM_TILES}.0
                                       / CAST(n AS DOUBLE)) + 1) AS INT) AS r_score,
         CAST(floor(CAST(fr - 1 AS DOUBLE) * {RFM_TILES}.0
                    / CAST(n AS DOUBLE)) + 1 AS INT) AS f_score,
         CAST(floor(CAST(mr - 1 AS DOUBLE) * {RFM_TILES}.0
                    / CAST(n AS DOUBLE)) + 1 AS INT) AS m_score
  FROM rk
)
SELECT *,
       CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
            WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
            WHEN r_score <= 2 THEN 'hibernating'
            WHEN f_score >= 4 THEN 'loyal'
            WHEN m_score >= 4 THEN 'big_spender'
            ELSE 'regular' END AS segment
FROM scored
"""


QUERIES = {
    "survivorship_merge": q_survivorship_merge,
    "late_dim_insert": q_late_dim_insert,
    "rfm_segments": q_rfm_segments,
}

ORACLE_SQL = {
    "survivorship_merge": SQL_SURVIVORSHIP_MERGE,
    "late_dim_insert": SQL_LATE_DIM_INSERT,
    "rfm_segments": SQL_RFM_SEGMENTS,
}


# -- qid: record_linkage -----------------------------------------------------

# fixed Fellegi-Sunter m/u probabilities (model metadata; production
# estimates them by EM — the SCORING algebra is what scales)
FS_PARAMS = {
    "name": (0.9, 0.001),
    "segment": (0.95, 0.2),
    "band": (0.9, 0.01),
}
FS_LINK_Q12 = 10_000_000_000_000       # >= 10 bits in q12 units
FS_NONLINK_Q12 = 0


def _fs_weights_q12() -> dict:
    """Agreement/disagreement log2(m/u) weights quantized to integer
    1e-12 units (the naive_bayes contract) — shared verbatim with the
    SQL twin, so the pair scores are exact integer sums."""
    import math

    out = {}
    for k, (m, u) in FS_PARAMS.items():
        out[k] = (
            int(math.floor(math.log2(m / u) * 1e12 + 0.5)),
            int(math.floor(math.log2((1 - m) / (1 - u)) * 1e12 + 0.5)),
        )
    return out


def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage (Fellegi-Sunter, the Splink core):
    candidate pairs from BANDED BLOCKING — (nationkey, acctbal/1000
    band) — score as the sum of per-attribute agreement weights
    log2(m/u) (disagreement: log2((1−m)/(1−u))), then classify
    link / possible / non-link by threshold. Ground truth exists by
    construction (the two simulated systems share entity keys), so the
    output doubles as the precision audit: per class, how many pairs
    are TRUE matches.

    Blocking is the scale story: the pair space is Σ|block_A|·|block_B|
    (never |A|·|B|) — the Splink discipline; a true match whose
    acctbal drifted across a band boundary is missed by this single
    pass, which production handles with a UNION of blocking passes
    (documented recall behavior, not a bug — the oracle applies the
    identical single pass). Honest scale caveat (r7
    tools/join_explosion_audit.py): (nation, band) has a CONSTANT
    block count (~275), so this demo's pair space is |A|·|B|/275 —
    quadratic with a small constant (measured 87× under 10× data).
    Production blocking rules must carry entity-scaled cardinality
    (exact name / email / phone-prefix passes, unioned), which keeps
    per-block sizes bounded as the corpus grows; the scoring and
    audit surface demonstrated here is unchanged under those rules.

    Determinism: weights are integer q12 (exact sums under any
    partial-agg tree); thresholds compare integers.
    """
    both = _two_systems(load(spark, sf_dir, "customer"))
    W = _fs_weights_q12()

    def side(prio: int, tag: str):
        return both.where(F.col("priority") == prio).select(
            F.col("c_custkey").alias(f"{tag}_key"),
            F.col("name").alias(f"{tag}_name"),
            F.col("nationkey").alias(f"{tag}_nation"),
            F.floor(F.col("acctbal") / 1000).alias(f"{tag}_band"),
            F.col("mktsegment").alias(f"{tag}_seg"),
        )

    a, b = side(2, "a"), side(1, "b")
    pairs = a.join(
        b,
        (F.col("a_nation") == F.col("b_nation"))
        & (F.col("a_band") == F.col("b_band")),
    )

    def w(agree_col, key):
        return F.when(agree_col, F.lit(W[key][0])).otherwise(F.lit(W[key][1]))

    scored = pairs.select(
        (F.col("a_key") == F.col("b_key")).cast("int").alias("is_true_match"),
        (
            w(F.col("a_name").eqNullSafe(F.col("b_name")), "name")
            + w(F.col("a_seg").eqNullSafe(F.col("b_seg")), "segment")
            + w(F.lit(True), "band")  # blocked pairs agree on band by construction
        ).alias("weight_q12"),
    )
    cls = (
        F.when(F.col("weight_q12") >= FS_LINK_Q12, "link")
        .when(F.col("weight_q12") <= FS_NONLINK_Q12, "non_link")
        .otherwise("possible")
    )
    return scored.groupBy(cls.alias("match_class")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("is_true_match").cast("bigint").alias("n_true_matches"),
        pround(
            F.sum(F.col("weight_q12").cast("decimal(38,0)")).cast("double")
            / 1e12
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_weight_bits"),
    )


def _record_linkage_sql() -> str:
    W = _fs_weights_q12()
    return f"""
WITH sys_a AS (
  SELECT c_custkey AS a_key, c_name AS a_name,
         CASE WHEN c_custkey % 11 <> 0 THEN c_nationkey END AS a_nation,
         CAST(floor(CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 10.0
                         ELSE c_acctbal END / 1000) AS BIGINT) AS a_band,
         CASE WHEN c_custkey % 13 <> 0 THEN c_mktsegment END AS a_seg
  FROM customer WHERE c_custkey % 3 <> 0
),
sys_b AS (
  SELECT c_custkey AS b_key,
         CASE WHEN c_custkey % 4 = 0 THEN 'OLD_' || c_name
              ELSE c_name END AS b_name,
         c_nationkey AS b_nation,
         CASE WHEN c_custkey % 7 <> 0
              THEN CAST(floor(c_acctbal / 1000) AS BIGINT) END AS b_band,
         c_mktsegment AS b_seg
  FROM customer
),
pairs AS (
  SELECT a_key = b_key AS is_true_match,
         (CASE WHEN a_name IS NOT DISTINCT FROM b_name
               THEN {W['name'][0]} ELSE {W['name'][1]} END
          + CASE WHEN a_seg IS NOT DISTINCT FROM b_seg
                 THEN {W['segment'][0]} ELSE {W['segment'][1]} END
          + {W['band'][0]}) AS weight_q12
  FROM sys_a JOIN sys_b
    ON a_nation = b_nation AND a_band = b_band
)
SELECT CASE WHEN weight_q12 >= {FS_LINK_Q12} THEN 'link'
            WHEN weight_q12 <= {FS_NONLINK_Q12} THEN 'non_link'
            ELSE 'possible' END AS match_class,
       count(*) AS n_pairs,
       CAST(sum(CASE WHEN is_true_match THEN 1 ELSE 0 END) AS BIGINT)
         AS n_true_matches,
       floor(CAST(sum(CAST(weight_q12 AS HUGEINT)) AS DOUBLE) / 1e12
             / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS avg_weight_bits
FROM pairs GROUP BY 1
"""


QUERIES["record_linkage"] = q_record_linkage
ORACLE_SQL["record_linkage"] = _record_linkage_sql()
