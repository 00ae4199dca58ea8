"""Round-5 analytics wave 3: Johnson-Lindenstrauss random projection
with a distance-preservation audit, Poisson-bootstrap confidence
intervals, referential-integrity audit, and multi-touch attribution.

Determinism contracts used here:
- The JL sign matrix is MODEL METADATA, not data: computed once in
  Python from md5(i:j) and embedded as the same literal in the Spark
  expression and the SQL twin (no cross-engine hashing in the hot
  path). Every cross-row/cross-term sum rides the q9 integer idiom
  (products quantized to 1e-9 units the moment they exist, integer
  sums thereafter — associative under any partial-agg tree; the
  embed_gram contract).
- Bootstrap replica weights are Poisson(1) by inverse CDF over the
  md5_frac52 uniform — the classic distributed bootstrap (per-row
  independent weights, no resampling shuffle), deterministic and
  engine-portable.
- Attribution argmin/argmax travel as ONE unique BIGINT code
  (epoch·10⁹ + event_id), so first/last touch can never tie.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import (
    dsum,
    load,
    local_result,
    md5_frac52,
    pround,
)


# -- qid: jl_projection -------------------------------------------------

JL_IN_DIM = 64
JL_OUT_DIM = 16
JL_PAIRS = 100


def _jl_signs() -> list[list[int]]:
    """The ±1 projection matrix, reproducible from md5(i:j) — model
    metadata shared verbatim by the Spark plan and the SQL twin."""
    return [
        [
            1 if int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1
            for i in range(JL_IN_DIM)
        ]
        for j in range(JL_OUT_DIM)
    ]


def q_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction 64→16 by a ±1
    (Achlioptas) projection, audited the sketch-verification way: for
    a deterministic sample of vector pairs, the qid emits the original
    and projected squared distances and their ratio — the quantity the
    JL lemma bounds. This is the standard shrink step before ANN
    indexing at 100 TB (project once, index the short vectors).

    Scale: the projection is MAP-ONLY (the matrix is a plan literal;
    one pass, no shuffle, no UDF — pure codegen transform/aggregate
    HOFs); the audit joins a bounded pair sample by key. Every sum is
    q9-quantized integers (see module docstring), so the ratio is
    bit-identical in both engines.
    """
    S = _jl_signs()
    s_lit = (
        "array("
        + ",".join(
            "array(" + ",".join(f"{x}.0D" for x in row) + ")" for row in S
        )
        + ")"
    )
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # y_q9[j] = Σ_i floor(v[i]·S[j][i]·1e9 + 0.5)  (integer, exact)
    proj = e.withColumn(
        "y_q9",
        F.expr(
            f"transform(sequence(1, {JL_OUT_DIM}), j -> "
            f"aggregate(sequence(1, {JL_IN_DIM}), 0L, (acc, i) -> "
            f"acc + CAST(floor(v[i-1] * element_at(element_at({s_lit}, j), i)"
            f" * 1e9 + 0.5) AS BIGINT)))"
        ),
    )
    a = proj.where(F.col("vec_id") < JL_PAIRS).select(
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("va"),
        F.col("y_q9").alias("ya"),
        ((F.col("vec_id") * 7 + 13) % 500).alias("b_id"),
    )
    b = proj.select(
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("vb"),
        F.col("y_q9").alias("yb"),
    )
    pairs = a.join(b, "b_id").where(F.col("a_id") != F.col("b_id"))
    d2_orig_q9 = F.expr(
        f"aggregate(sequence(1, {JL_IN_DIM}), 0L, (acc, i) -> "
        "acc + CAST(floor((va[i-1] - vb[i-1]) * (va[i-1] - vb[i-1])"
        " * 1e9 + 0.5) AS BIGINT))"
    )
    # projected distance: de-quantize each coordinate delta, square,
    # re-quantize — deltas of q9 ints are exact, the square is one
    # deterministic double op
    d2_proj_q9 = F.expr(
        f"aggregate(sequence(1, {JL_OUT_DIM}), 0L, (acc, j) -> "
        "acc + CAST(floor((CAST(ya[j-1] - yb[j-1] AS DOUBLE) / 1e9)"
        " * (CAST(ya[j-1] - yb[j-1] AS DOUBLE) / 1e9) * 1e9 + 0.5) AS BIGINT))"
    )
    out = pairs.select(
        "a_id",
        "b_id",
        (d2_orig_q9.cast("double") / F.lit(1e9)).alias("d2_orig"),
        (
            d2_proj_q9.cast("double") / F.lit(1e9) / F.lit(float(JL_OUT_DIM))
        ).alias("d2_proj"),
    )
    ratio = F.col("d2_proj") / F.col("d2_orig")
    return out.select(
        "a_id",
        "b_id",
        pround(F.col("d2_orig")).alias("d2_orig"),
        pround(F.col("d2_proj")).alias("d2_proj"),
        pround(ratio).alias("ratio"),
        (
            (ratio > 1.0 - 0.75) & (ratio < 1.0 + 0.75)
        ).cast("int").alias("within_075"),
    )


def _jl_sql() -> str:
    # the matrix rides as a 1024-row VALUES relation: a nested-list
    # literal indexed inside nested lambdas re-materializes the whole
    # 1024-element list per term in DuckDB (measured: minutes for 500
    # rows); the relational join form is instant and identical
    S = _jl_signs()
    vals = ",".join(
        f"({j + 1},{i + 1},{S[j][i]}.0)"
        for j in range(JL_OUT_DIM)
        for i in range(JL_IN_DIM)
    )
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
sgn(j, i, s) AS (VALUES {vals}),
terms AS (
  SELECT e.vec_id, sgn.j,
         CAST(floor(e.v[sgn.i] * sgn.s * 1e9 + 0.5) AS BIGINT) AS q
  FROM e CROSS JOIN sgn
),
proj0 AS (
  SELECT vec_id, j, CAST(sum(q) AS BIGINT) AS yq FROM terms GROUP BY 1, 2
),
proj AS (
  SELECT e.vec_id, e.v, p.y_q9
  FROM e JOIN (SELECT vec_id, list(yq ORDER BY j) AS y_q9
               FROM proj0 GROUP BY vec_id) p USING (vec_id)
),
a AS (
  SELECT vec_id AS a_id, v AS va, y_q9 AS ya,
         (vec_id * 7 + 13) % 500 AS b_id
  FROM proj WHERE vec_id < {JL_PAIRS}
),
b AS (SELECT vec_id AS b_id, v AS vb, y_q9 AS yb FROM proj),
pairs AS (
  SELECT * FROM a JOIN b USING (b_id) WHERE a_id <> b_id
),
d AS (
  SELECT a_id, b_id,
         CAST(list_aggregate(
           list_transform(range(1, {JL_IN_DIM + 1}, 1), i ->
             CAST(floor((va[i] - vb[i]) * (va[i] - vb[i]) * 1e9 + 0.5)
                  AS BIGINT)), 'sum') AS DOUBLE) / 1e9 AS d2_orig,
         CAST(list_aggregate(
           list_transform(range(1, {JL_OUT_DIM + 1}, 1), j ->
             CAST(floor((CAST(ya[j] - yb[j] AS DOUBLE) / 1e9)
                        * (CAST(ya[j] - yb[j] AS DOUBLE) / 1e9)
                        * 1e9 + 0.5) AS BIGINT)), 'sum') AS DOUBLE)
           / 1e9 / {JL_OUT_DIM}.0 AS d2_proj
  FROM pairs
)
SELECT a_id, b_id,
       floor(d2_orig * 1e6 + 0.5) / 1e6 AS d2_orig,
       floor(d2_proj * 1e6 + 0.5) / 1e6 AS d2_proj,
       floor(d2_proj / d2_orig * 1e6 + 0.5) / 1e6 AS ratio,
       -- coincident points (d2_orig = 0, possible under duplicated
       -- embeddings — fuzz ties profile) carry no distortion
       -- information: ratio and flag are NULL, matching Spark's
       -- 0.0/0.0 → NULL; the bare ELSE 0 misread NULL as "outside"
       CAST(CASE WHEN d2_orig = 0 THEN NULL
                 WHEN d2_proj / d2_orig > 0.25 AND d2_proj / d2_orig < 1.75
            THEN 1 ELSE 0 END AS INT) AS within_075
FROM d
"""


# -- qid: bootstrap_ci ----------------------------------------------------

BOOT_B = 40
# cumulative Poisson(1) CDF thresholds for the inverse-CDF weight
_POIS = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286059,
    0.9810118431238462,
    0.9963401531726563,
)


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the mean order value by the
    POISSON BOOTSTRAP (Chamandy et al.) — the only bootstrap that
    distributes: instead of resampling n rows with replacement (which
    needs global coordination), every row independently draws a
    Poisson(1) replica weight, here deterministically via inverse CDF
    over the md5_frac52 uniform of (orderkey, replica).

    CI is the nearest-rank (ceil(q·B)) empirical quantile of the
    {BOOT_B} replica means; the spread (bootstrap SE) folds over the
    SORTED replica array, so its summation order is fixed in both
    engines.

    Scale: the ×{BOOT_B} replica explode collapses map-side — partial
    aggregation reduces each partition to ≤{BOOT_B} groups before the
    shuffle, so the wire carries B rows per partition regardless of
    data size; the quantile step touches B rows total. One scan.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    r = o.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))))
    u = md5_frac52(F.concat_ws(":", F.col("o_orderkey"), F.col("r")))
    w = (
        F.when(u < _POIS[0], 0)
        .when(u < _POIS[1], 1)
        .when(u < _POIS[2], 2)
        .when(u < _POIS[3], 3)
        .when(u < _POIS[4], 4)
        .otherwise(5)
    )
    rep = (
        r.withColumn("w", w)
        .groupBy("r")
        .agg(
            F.sum(
                (F.col("w") * F.col("o_totalprice")).cast("decimal(24,6)")
            ).alias("_swx"),
            F.sum("w").cast("bigint").alias("_sw"),
        )
        .select(
            "r",
            pround(F.col("_swx").cast("double") / F.col("_sw").cast("double")).alias(
                "mean_r"
            ),
        )
    )
    lo_i = max(1, -(-25 * BOOT_B // 1000))          # ceil(0.025·B)
    hi_i = -(-975 * BOOT_B // 1000)                 # ceil(0.975·B)
    arr = F.array_sort(F.collect_list("mean_r"))
    point = load(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("n_rows"),
        pround(
            F.sum(F.col("o_totalprice").cast("decimal(24,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_point"),
    )
    ci = rep.agg(arr.alias("_a")).select(
        F.lit(BOOT_B).alias("n_replicas"),
        pround(F.element_at("_a", lo_i)).alias("ci_lo"),
        pround(F.element_at("_a", hi_i)).alias("ci_hi"),
        pround(
            F.sqrt(
                F.expr(
                    f"aggregate(_a, 0.0D, (acc, m) -> acc + "
                    f"(m - aggregate(_a, 0.0D, (a2, x) -> a2 + x) / {BOOT_B}.0D)"
                    f" * (m - aggregate(_a, 0.0D, (a2, x) -> a2 + x) / {BOOT_B}.0D))"
                )
                / F.lit(float(BOOT_B - 1))
            )
        ).alias("boot_se"),
    )
    return point.crossJoin(F.broadcast(ci))


def _boot_sql() -> str:
    lo_i = max(1, -(-25 * BOOT_B // 1000))
    hi_i = -(-975 * BOOT_B // 1000)
    return f"""
WITH r AS (
  SELECT o_orderkey, o_totalprice, t.r
  FROM orders, LATERAL (SELECT unnest(generate_series(0, {BOOT_B - 1})) AS r) t
),
wt AS (
  SELECT o_totalprice, r,
         CASE
           WHEN u < {_POIS[0]!r} THEN 0
           WHEN u < {_POIS[1]!r} THEN 1
           WHEN u < {_POIS[2]!r} THEN 2
           WHEN u < {_POIS[3]!r} THEN 3
           WHEN u < {_POIS[4]!r} THEN 4
           ELSE 5 END AS w
  FROM (SELECT *,
          CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':' ||
                                   CAST(r AS VARCHAR)), 1, 13)) AS BIGINT)
            / CAST(power(16, 13) AS DOUBLE) AS u
        FROM r)
),
rep AS (
  SELECT r,
         floor(CAST(sum(CAST((CASE WHEN (w * o_totalprice) < 0 THEN -floor(-(w * o_totalprice)*1e6 + 0.5) ELSE floor((w * o_totalprice)*1e6 + 0.5) END)/1e6 AS DECIMAL(24,6))) AS DOUBLE)
               / CAST(sum(w) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mean_r
  FROM wt GROUP BY r
),
sorted AS (SELECT list_sort(list(mean_r)) AS a FROM rep),
point AS (
  SELECT count(*) AS n_rows,
         floor(CAST(sum(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mean_point
  FROM orders
),
ci AS (
  SELECT {BOOT_B} AS n_replicas,
         floor(a[{lo_i}] * 1e6 + 0.5) / 1e6 AS ci_lo,
         floor(a[{hi_i}] * 1e6 + 0.5) / 1e6 AS ci_hi,
         floor(sqrt(
           list_aggregate(list_transform(a, m ->
             (m - list_aggregate(a, 'sum') / {BOOT_B}.0)
             * (m - list_aggregate(a, 'sum') / {BOOT_B}.0)), 'sum')
           / {BOOT_B - 1}.0) * 1e6 + 0.5) / 1e6 AS boot_se
  FROM sorted
)
SELECT point.*, ci.* FROM point CROSS JOIN ci
"""


# -- qid: fk_integrity -----------------------------------------------------

def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit of the replicated schema — per FK
    edge: distinct child keys, matched keys, orphan keys/rows (child
    side missing its parent) and childless parents. The completeness
    check a CDC pipeline owes its consumers when per-table watermarks
    advance independently (the reference replicates tables one at a
    time with separate watermarks — scripts/03_cdc_etl.py — so
    cross-table consistency is exactly what can drift).

    Edges audited: lineitem→orders and orders→customer (intact in the
    fixture — zero orphans IS the assertion), plus orders→customer
    against a LAGGED dimension (keys ÷7 not yet arrived) to show live
    drift numbers.

    Scale: each edge pre-aggregates the child to one row per key
    (combinable) before a keyed full-outer join against the parent
    key set; output is 3 rows. Never a row-level fact join.
    """
    def edge(child: DataFrame, ckey: str, parent: DataFrame, pkey: str, name: str):
        c = child.groupBy(F.col(ckey).alias("k")).agg(
            F.count(F.lit(1)).alias("n_rows")
        )
        p = parent.select(F.col(pkey).alias("k")).distinct().withColumn(
            "_p", F.lit(1)
        )
        j = c.join(p, "k", "full_outer")
        return j.groupBy(F.lit(name).alias("fk_edge")).agg(
            F.sum(F.when(F.col("n_rows").isNotNull(), 1)).cast("bigint").alias(
                "n_child_keys"
            ),
            F.sum(
                F.when(F.col("n_rows").isNotNull() & F.col("_p").isNotNull(), 1)
            )
            .cast("bigint")
            .alias("n_matched_keys"),
            F.sum(F.when(F.col("_p").isNull(), 1)).cast("bigint").alias(
                "n_orphan_keys"
            ),
            F.sum(F.when(F.col("_p").isNull(), F.col("n_rows"))).cast("bigint").alias(
                "n_orphan_rows"
            ),
            F.sum(F.when(F.col("n_rows").isNull(), 1)).cast("bigint").alias(
                "n_childless_parents"
            ),
        )

    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load(spark, sf_dir, "customer").select("c_custkey")
    lagged = cu.where(F.col("c_custkey") % 7 != 0)
    return (
        edge(li, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionByName(edge(o, "o_custkey", cu, "c_custkey", "orders->customer"))
        .unionByName(
            edge(o, "o_custkey", lagged, "c_custkey", "orders->customer_lagged")
        )
    )


SQL_FK_INTEGRITY = """
WITH edge1 AS (
  SELECT 'lineitem->orders' AS fk_edge, c.k, c.n_rows, p._p
  FROM (SELECT l_orderkey AS k, count(*) AS n_rows FROM lineitem GROUP BY 1) c
  FULL OUTER JOIN (SELECT DISTINCT o_orderkey AS k, 1 AS _p FROM orders) p
    USING (k)
),
edge2 AS (
  SELECT 'orders->customer', c.k, c.n_rows, p._p
  FROM (SELECT o_custkey AS k, count(*) AS n_rows FROM orders GROUP BY 1) c
  FULL OUTER JOIN (SELECT DISTINCT c_custkey AS k, 1 AS _p FROM customer) p
    USING (k)
),
edge3 AS (
  SELECT 'orders->customer_lagged', c.k, c.n_rows, p._p
  FROM (SELECT o_custkey AS k, count(*) AS n_rows FROM orders GROUP BY 1) c
  FULL OUTER JOIN (SELECT DISTINCT c_custkey AS k, 1 AS _p FROM customer
                   WHERE c_custkey % 7 <> 0) p USING (k)
),
alle AS (
  SELECT * FROM edge1 UNION ALL SELECT * FROM edge2 UNION ALL
  SELECT * FROM edge3
)
SELECT fk_edge,
       CAST(sum(CASE WHEN n_rows IS NOT NULL THEN 1 END) AS BIGINT)
         AS n_child_keys,
       CAST(sum(CASE WHEN n_rows IS NOT NULL AND _p IS NOT NULL THEN 1 END)
            AS BIGINT) AS n_matched_keys,
       CAST(sum(CASE WHEN _p IS NULL THEN 1 END) AS BIGINT) AS n_orphan_keys,
       CAST(sum(CASE WHEN _p IS NULL THEN n_rows END) AS BIGINT)
         AS n_orphan_rows,
       CAST(sum(CASE WHEN n_rows IS NULL THEN 1 END) AS BIGINT)
         AS n_childless_parents
FROM alle GROUP BY fk_edge
"""


# -- qid: attribution_touch -------------------------------------------------

ATTR_LOOKBACK_S = 3 * 86400


def q_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch revenue attribution: every purchase event credits
    its value to the FIRST and the LAST touchpoint (click/view) of the
    same user within a {ATTR_LOOKBACK_S // 86400}-day lookback — the
    two bookend models of marketing attribution, computed in one pass.

    Each touch travels as the unique BIGINT code epoch·10⁹ + event_id,
    so min/max ARE first/last with no tie ambiguity (window first/last
    over a RANGE frame can only order by one column — the composite
    code restores a total order). The touch channel rides inside a
    (code, channel) struct min/max: struct comparison is
    lexicographic, and the code prefix is unique.

    Scale: the conversions⋈touches join is keyed on user_id with a
    bounded time-range predicate — the pit_join/range_join family; at
    100 TB, bucket both sides by (user, day) exactly as range_join
    does. Per-conversion aggregation collapses pairs immediately; the
    final rollup is |channels|×2 rows.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        "value",
        (F.unix_timestamp("ts").cast("bigint") * F.lit(1_000_000_000).cast("bigint")
         + F.col("event_id")).alias("code"),
        F.unix_timestamp("ts").cast("bigint").alias("t"),
    )
    conv = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.col("value").alias("revenue"),
        F.col("t").alias("conv_t"),
    )
    touch = e.where(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.struct(F.col("code"), F.col("event_type").alias("channel")).alias(
            "tch"
        ),
        F.col("t").alias("touch_t"),
    )
    pairs = conv.join(touch, "user_id").where(
        (F.col("touch_t") < F.col("conv_t"))
        & (F.col("touch_t") >= F.col("conv_t") - F.lit(ATTR_LOOKBACK_S))
    )
    per_conv = pairs.groupBy("conv_id", "revenue").agg(
        F.min("tch").alias("first_tch"), F.max("tch").alias("last_tch")
    )
    both = per_conv.selectExpr(
        "revenue",
        "stack(2, 'first_touch', first_tch.channel, "
        "'last_touch', last_tch.channel) AS (model, channel)",
    )
    return both.groupBy("model", "channel").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        dsum(F.col("revenue")).alias("revenue"),
    )


SQL_ATTRIBUTION_TOUCH = f"""
WITH e AS (
  SELECT user_id, event_type, event_id, value,
         CAST(floor(epoch(ts)) AS BIGINT) * 1000000000 + event_id AS code,
         CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM events
),
conv AS (
  SELECT user_id, event_id AS conv_id, value AS revenue, t AS conv_t
  FROM e WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, code, event_type AS channel, t AS touch_t
  FROM e WHERE event_type IN ('click', 'view')
),
pairs AS (
  SELECT c.conv_id, c.revenue, t.code, t.channel
  FROM conv c JOIN touch t ON c.user_id = t.user_id
  WHERE t.touch_t < c.conv_t AND t.touch_t >= c.conv_t - {ATTR_LOOKBACK_S}
),
per_conv AS (
  SELECT conv_id, revenue,
         arg_min(channel, code) AS first_channel,
         arg_max(channel, code) AS last_channel
  FROM pairs GROUP BY conv_id, revenue
),
both_models AS (
  SELECT revenue, 'first_touch' AS model, first_channel AS channel
  FROM per_conv
  UNION ALL
  SELECT revenue, 'last_touch', last_channel FROM per_conv
)
SELECT model, channel, count(*) AS n_conversions,
       CAST(round(sum(CAST(revenue AS DECIMAL(24,6))), 2) AS DOUBLE)
         AS revenue
FROM both_models GROUP BY model, channel
"""


QUERIES = {
    "jl_projection": q_jl_projection,
    "bootstrap_ci": q_bootstrap_ci,
    "fk_integrity": q_fk_integrity,
    "attribution_touch": q_attribution_touch,
}

ORACLE_SQL = {
    "jl_projection": _jl_sql(),
    "bootstrap_ci": _boot_sql(),
    "fk_integrity": SQL_FK_INTEGRITY,
    "attribution_touch": SQL_ATTRIBUTION_TOUCH,
}


# -- qid: forecast_backtest --------------------------------------------------

def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast backtesting: every day with enough
    history is an evaluation point; two baseline forecasters — naive
    (yesterday's value) and seasonal-naive (same weekday last week) —
    are scored per event type with MAE and MAPE. The evaluation
    harness any real forecasting model must beat, and the capacity-
    planning sanity report ops teams actually run.

    Scale: the raw scan reduces to one row per (type, day)
    (combinable dsum); both lag forecasts share ONE keyed window sort
    per type; errors aggregate map-side. MAE/MAPE ride the decimal
    path — the per-point absolute errors quantize via pround before
    the exact decimal sum, so any partial-agg tree bit-agrees.
    """
    from pyspark.sql import Window

    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(dsum(F.col("value")).alias("y"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "y",
        F.lag("y", 1).over(w).alias("f_naive"),
        F.lag("y", 7).over(w).alias("f_snaive"),
    )
    pairs = lagged.selectExpr(
        "event_type",
        "y",
        "stack(2, 'naive', f_naive, 'seasonal_naive', f_snaive) AS (model, f)",
    ).where(F.col("f").isNotNull() & (F.col("y") != 0))
    ae = pround(F.abs(F.col("y") - F.col("f")))
    ape = pround(F.abs(F.col("y") - F.col("f")) / F.abs(F.col("y")))
    return (
        pairs.select("event_type", "model", ae.alias("ae"), ape.alias("ape"))
        .groupBy("event_type", "model")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            pround(
                F.sum(F.col("ae").cast("decimal(24,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mae"),
            pround(
                F.sum(F.col("ape").cast("decimal(24,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mape"),
        )
    )


SQL_FORECAST_BACKTEST = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(round(sum(CAST(value AS DECIMAL(24,6))), 2) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, y,
         lag(y, 1) OVER w AS f_naive,
         lag(y, 7) OVER w AS f_snaive
  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
pairs AS (
  SELECT event_type, 'naive' AS model, y, f_naive AS f FROM lagged
  UNION ALL
  SELECT event_type, 'seasonal_naive', y, f_snaive FROM lagged
),
e AS (
  SELECT event_type, model,
         floor(abs(y - f) * 1e6 + 0.5) / 1e6 AS ae,
         floor(abs(y - f) / abs(y) * 1e6 + 0.5) / 1e6 AS ape
  FROM pairs WHERE f IS NOT NULL AND y <> 0
)
SELECT event_type, model, count(*) AS n_points,
       floor(CAST(sum(CAST(ae AS DECIMAL(24,6))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mae,
       floor(CAST(sum(CAST(ape AS DECIMAL(24,6))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mape
FROM e GROUP BY event_type, model
"""


# -- qid: referential_sample ---------------------------------------------

SAMPLE_FRAC_PPM = 100_000  # 10% in md5_frac52 ppm units


def q_referential_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK-closed dev-fixture sampling: a deterministic ~10% sample of
    ORDERS (md5 uniform on the key — reproducible across runs and
    engines) expanded to its referential closure — exactly the
    lineitems of sampled orders and exactly the customers they
    reference. The everyday "give me a small but JOINABLE slice of
    prod" tool; naive per-table sampling breaks every FK.

    Scale: the sampled key set drives two semi-joins (lineitem keyed
    by order key, customer by the sampled orders' distinct custkeys —
    broadcast at dev-sample sizes by construction); the report is one
    aggregation per table. ``fk_complete`` re-checks closure on the
    SAMPLED tables themselves — the invariant, not an assumption.
    """
    frac = F.lit(SAMPLE_FRAC_PPM / 1_000_000.0)
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    cu = load(spark, sf_dir, "customer").select("c_custkey")
    so = o.where(md5_frac52(F.col("o_orderkey")) < frac)
    sli = li.join(
        F.broadcast(so.select("o_orderkey")), li["l_orderkey"] == so["o_orderkey"],
        "left_semi",
    )
    scu = cu.join(
        F.broadcast(so.select("o_custkey").distinct()),
        cu["c_custkey"] == so["o_custkey"],
        "left_semi",
    )
    # closure check: every sampled lineitem's order and every sampled
    # order's customer is present in the sample
    li_orphans = sli.join(
        F.broadcast(so.select("o_orderkey")), sli["l_orderkey"] == so["o_orderkey"],
        "left_anti",
    ).count()
    o_orphans = so.join(
        F.broadcast(scu), so["o_custkey"] == scu["c_custkey"], "left_anti"
    ).count()
    complete = int(li_orphans == 0 and o_orphans == 0)
    rows = [
        ("orders", o.count(), so.count(), complete),
        ("lineitem", li.count(), sli.count(), complete),
        ("customer", cu.count(), scu.count(), complete),
    ]
    out = local_result(
        spark, rows, "table_name string, n_total bigint, n_sampled bigint, fk_complete int"
    )
    return out.withColumn(
        "pct",
        pround(F.col("n_sampled").cast("double") / F.col("n_total").cast("double")),
    )


SQL_REFERENTIAL_SAMPLE = f"""
WITH so AS (
  SELECT o_orderkey, o_custkey FROM orders
  WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 13)) AS BIGINT)
        / CAST(power(16, 13) AS DOUBLE) < {SAMPLE_FRAC_PPM / 1_000_000.0!r}
),
r AS (
  SELECT 'orders' AS table_name,
         (SELECT count(*) FROM orders) AS n_total,
         (SELECT count(*) FROM so) AS n_sampled
  UNION ALL
  SELECT 'lineitem',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM so))
  UNION ALL
  SELECT 'customer',
         (SELECT count(*) FROM customer),
         (SELECT count(*) FROM customer
          WHERE c_custkey IN (SELECT o_custkey FROM so))
)
SELECT table_name, n_total, n_sampled, 1 AS fk_complete,
       floor(CAST(n_sampled AS DOUBLE) / CAST(n_total AS DOUBLE) * 1e6 + 0.5)
         / 1e6 AS pct
FROM r
"""


QUERIES["forecast_backtest"] = q_forecast_backtest
QUERIES["referential_sample"] = q_referential_sample
ORACLE_SQL["forecast_backtest"] = SQL_FORECAST_BACKTEST
ORACLE_SQL["referential_sample"] = SQL_REFERENTIAL_SAMPLE


# -- qid: burst_detect -------------------------------------------------------

BURST_WIN_S = 3600
BURST_THRESHOLD = 12


def q_burst_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abuse/bot screening by event-rate bursts: for every user, the
    maximum number of events inside ANY sliding {BURST_WIN_S}-second
    window (a RANGE frame over epoch seconds anchored at each event —
    the exact sliding max, not a tumbling approximation), flagged
    against a rate threshold. The first line of defense before any
    engagement metric is trusted.

    Scale: one keyed window (user, ORDER BY epoch RANGE −{BURST_WIN_S}+1s..0)
    computes the in-window count per event; the per-user max is a
    combinable aggregate riding the same user partitioning — one
    exchange end to end.
    """
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").cast("bigint").alias("t")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-(BURST_WIN_S - 1), 0)
    )
    per = (
        e.withColumn("in_win", F.count(F.lit(1)).over(w))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("in_win").cast("bigint").alias("peak_rate"),
        )
    )
    return per.select(
        "user_id",
        "n_events",
        "peak_rate",
        (F.col("peak_rate") >= BURST_THRESHOLD).cast("int").alias("is_burst"),
    )


SQL_BURST_DETECT = f"""
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events
),
win AS (
  SELECT user_id,
         count(*) OVER (PARTITION BY user_id ORDER BY t
                        RANGE BETWEEN {BURST_WIN_S - 1} PRECEDING
                                  AND CURRENT ROW) AS in_win
  FROM e
)
SELECT user_id, count(*) AS n_events,
       CAST(max(in_win) AS BIGINT) AS peak_rate,
       CAST(CASE WHEN max(in_win) >= {BURST_THRESHOLD} THEN 1 ELSE 0 END AS INT)
         AS is_burst
FROM win GROUP BY user_id
"""


# -- qid: calendar_dim --------------------------------------------------------

CAL_START = "2020-01-01"
CAL_END = "2021-12-31"


def q_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-dimension generation — the warehouse utility every star
    schema joins against: one row per calendar day with the conformed
    attributes (year/quarter/month/day, portable day-of-week,
    weekend/month-boundary flags, days-in-month). Generated from pure
    SEQUENCE algebra (no source scan at all): the qid certifies the
    engines agree on two years of calendar arithmetic including a
    leap February.

    Portability: day-of-week is epoch-day arithmetic mod 7 (Monday=0),
    never dayofweek() (Spark numbers Sunday=1, DuckDB Sunday=0).

    Scale: trivially parallel — explode of a driver-literal range; a
    production build writes it once and broadcasts forever.
    """
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(CAL_START).cast("date"),
                F.lit(CAL_END).cast("date"),
            )
        ).alias("day")
    )
    eom = F.last_day(F.col("day"))
    return days.select(
        "day",
        F.year("day").cast("int").alias("year"),
        F.quarter("day").cast("int").alias("quarter"),
        F.month("day").cast("int").alias("month"),
        F.dayofmonth("day").cast("int").alias("dom"),
        (F.datediff(F.col("day"), F.lit("1970-01-05").cast("date")) % 7)
        .cast("int")
        .alias("dow"),
        (
            (F.datediff(F.col("day"), F.lit("1970-01-05").cast("date")) % 7) >= 5
        ).cast("int").alias("is_weekend"),
        (F.dayofmonth("day") == 1).cast("int").alias("is_month_start"),
        (F.col("day") == eom).cast("int").alias("is_month_end"),
        F.dayofmonth(eom).cast("int").alias("days_in_month"),
    )


SQL_CALENDAR_DIM = f"""
WITH days AS (
  SELECT unnest(generate_series(DATE '{CAL_START}', DATE '{CAL_END}',
                                INTERVAL 1 DAY)) AS d
)
SELECT CAST(d AS DATE) AS day,
       CAST(year(d) AS INT) AS year,
       CAST(quarter(d) AS INT) AS quarter,
       CAST(month(d) AS INT) AS month,
       CAST(day(d) AS INT) AS dom,
       CAST(date_diff('day', DATE '1970-01-05', CAST(d AS DATE)) % 7 AS INT)
         AS dow,
       CAST(CASE WHEN date_diff('day', DATE '1970-01-05', CAST(d AS DATE)) % 7
                      >= 5 THEN 1 ELSE 0 END AS INT) AS is_weekend,
       CAST(CASE WHEN day(d) = 1 THEN 1 ELSE 0 END AS INT) AS is_month_start,
       CAST(CASE WHEN CAST(d AS DATE) = last_day(CAST(d AS DATE))
            THEN 1 ELSE 0 END AS INT) AS is_month_end,
       CAST(day(last_day(CAST(d AS DATE))) AS INT) AS days_in_month
FROM days
"""


QUERIES["burst_detect"] = q_burst_detect
QUERIES["calendar_dim"] = q_calendar_dim
ORACLE_SQL["burst_detect"] = SQL_BURST_DETECT
ORACLE_SQL["calendar_dim"] = SQL_CALENDAR_DIM
