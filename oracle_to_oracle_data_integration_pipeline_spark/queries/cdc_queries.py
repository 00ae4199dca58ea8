"""CDC operator queries + DuckDB oracles (SURVEY.md §2.1-§2.6 qids).

The fixtures carry no CDC columns, so each query derives a
deterministic CDC-shaped snapshot from ``orders`` in BOTH engines with
the same arithmetic (FIXTURES.md "CDC-shaped derived fixtures"):

- ``created_at``  = o_orderdate
- ``updated_at``  = o_orderdate + 30 days when o_orderkey % 5 = 0 else NULL
- ``is_deleted``  = 'Y' when o_orderkey % 17 = 0 else 'N'

Scenario cutoffs: the merge treats rows created on/before T0
(1996-01-01) as previously replicated (the target snapshot, as-inserted
state) and everything whose change time passed T0 as the delta batch —
so the batch contains inserts, updates of replicated rows, and
soft-deletes both for replicated keys (flag flips) and never-replicated
keys (dropped by the insert gate, the reference's pinned behavior at
`/root/reference/scripts/03_cdc_etl.py:152-156`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.cdc import (
    change_ts_col,
    delta_predicate,
    latest_per_key,
    merge_attribution,
    merge_soft_delete,
    with_change_ts,
)
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load

T0 = "1996-01-01 00:00:00"
WM = "1997-01-01 00:00:00"

ORDER_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]

# Shared DuckDB CTE — the SQL twin of cdc_orders() below.
CDC_SRC_SQL = """
cdc_src AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
         o_orderdate AS created_at,
         CASE WHEN o_orderkey % 5 = 0 THEN o_orderdate + INTERVAL 30 DAY END AS updated_at,
         CASE WHEN o_orderkey % 17 = 0 THEN 'Y' ELSE 'N' END AS is_deleted
  FROM orders
)
"""

TARGET_DELTA_SQL = f"""
{CDC_SRC_SQL},
target AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
         created_at, CAST(NULL AS TIMESTAMP) AS updated_at, 'N' AS is_deleted
  FROM cdc_src WHERE created_at <= TIMESTAMP '{T0}'
),
delta AS (
  SELECT * FROM cdc_src
  WHERE greatest(coalesce(updated_at, created_at), created_at) > TIMESTAMP '{T0}'
)
"""


def cdc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with deterministically derived CDC columns."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        *ORDER_COLS,
        F.col("o_orderdate").alias("created_at"),
        F.when(F.col("o_orderkey") % 5 == 0, F.expr("o_orderdate + INTERVAL '30' DAY")).alias("updated_at"),
        F.when(F.col("o_orderkey") % 17 == 0, F.lit("Y")).otherwise(F.lit("N")).alias("is_deleted"),
    )


def _target_delta(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    src = cdc_orders(spark, sf_dir)
    target = src.filter(F.col("created_at") <= F.lit(T0).cast("timestamp")).select(
        *ORDER_COLS,
        F.col("created_at"),
        F.lit(None).cast("timestamp").alias("updated_at"),
        F.lit("N").alias("is_deleted"),
    )
    delta = src.filter(change_ts_col() > F.lit(T0).cast("timestamp"))
    return target, delta


# -- qid: change_ts ---------------------------------------------------

def q_change_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdc_orders(spark, sf_dir).select(
        "o_orderkey", "created_at", "updated_at", change_ts_col().alias("change_ts")
    )


SQL_CHANGE_TS = f"""
WITH {CDC_SRC_SQL}
SELECT o_orderkey, created_at, updated_at,
       greatest(coalesce(updated_at, created_at), created_at) AS change_ts
FROM cdc_src
"""


# -- qid: delta_filter (pushdown-safe rewrite; SURVEY.md §4) ----------

def q_delta_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime

    wm = datetime.datetime.fromisoformat(WM)
    df = cdc_orders(spark, sf_dir).filter(delta_predicate(wm))
    return with_change_ts(df, "change_ts").select("o_orderkey", "change_ts", "is_deleted")


SQL_DELTA_FILTER = f"""
WITH {CDC_SRC_SQL}
SELECT o_orderkey,
       greatest(coalesce(updated_at, created_at), created_at) AS change_ts,
       is_deleted
FROM cdc_src
WHERE created_at > TIMESTAMP '{WM}' OR updated_at > TIMESTAMP '{WM}'
"""


# -- qid: watermark_max -----------------------------------------------

def q_watermark_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-watermark computation
    (`/root/reference/scripts/03_cdc_etl.py:325-329`)."""
    return cdc_orders(spark, sf_dir).agg(F.max(change_ts_col()).alias("max_ts"))


SQL_WATERMARK_MAX = f"""
WITH {CDC_SRC_SQL}
SELECT max(greatest(coalesce(updated_at, created_at), created_at)) AS max_ts FROM cdc_src
"""


# -- qid: latest_per_key (SURVEY.md §2.5) -----------------------------

def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    out = latest_per_key(
        e, ["user_id"], order_cols=[F.col("ts").desc(), F.col("event_id").desc()]
    )
    return out.select("user_id", "event_id", "ts", "event_type", "value")


SQL_LATEST_PER_KEY = """
SELECT user_id, event_id, ts, event_type, value FROM (
  SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events e
) WHERE rn = 1
"""


# -- qid: cdc_merge (the core operator, SURVEY.md §2.3 J1) ------------

def q_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    target, delta = _target_delta(spark, sf_dir)
    return merge_soft_delete(target, delta, pk=["o_orderkey"]).df


SQL_CDC_MERGE = f"""
WITH {TARGET_DELTA_SQL}
SELECT
  coalesce(d.o_orderkey, t.o_orderkey) AS o_orderkey,
  CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_custkey ELSE t.o_custkey END AS o_custkey,
  CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
  CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
  CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_orderdate ELSE t.o_orderdate END AS o_orderdate,
  CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_orderpriority ELSE t.o_orderpriority END AS o_orderpriority,
  CASE WHEN d.o_orderkey IS NOT NULL THEN d.created_at ELSE t.created_at END AS created_at,
  CASE WHEN d.o_orderkey IS NOT NULL THEN d.updated_at ELSE t.updated_at END AS updated_at,
  CASE WHEN d.o_orderkey IS NOT NULL THEN d.is_deleted ELSE t.is_deleted END AS is_deleted
FROM target t FULL OUTER JOIN delta d ON t.o_orderkey = d.o_orderkey
WHERE t.o_orderkey IS NOT NULL OR d.is_deleted = 'N'
"""


# -- qid: merge_stats (exact attribution, SURVEY.md §2.4 A3) ----------

def q_merge_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    target, delta = _target_delta(spark, sf_dir)
    return merge_attribution(target, delta, pk=["o_orderkey"])


SQL_MERGE_STATS = f"""
WITH {TARGET_DELTA_SQL}
SELECT
  CAST(sum(CASE WHEN t.o_orderkey IS NOT NULL AND d.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS updated_count,
  CAST(sum(CASE WHEN t.o_orderkey IS NULL AND d.is_deleted = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS inserted_count,
  CAST(sum(CASE WHEN t.o_orderkey IS NULL AND d.is_deleted = 'Y' THEN 1 ELSE 0 END) AS BIGINT) AS dropped_count
FROM target t FULL OUTER JOIN delta d ON t.o_orderkey = d.o_orderkey
"""


# -- qid: scd2_history ------------------------------------------------

def _orders_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared fixture history for the SCD2 qids: batch 1 = all orders
    at o_orderdate; batch 2 = every 7th order re-statused 30 days
    later, folded through scd2_from_versions (operators/scd.py)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.scd import (
        scd2_from_versions,
    )

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_orderdate")
    b1 = o.select("o_orderkey", "o_orderstatus", F.col("o_orderdate").alias("ts"))
    b2 = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        )
    )
    return scd2_from_versions(b1.unionByName(b2), ["o_orderkey"], "ts")


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 validity intervals from two simulated CDC batches;
    every version keeps [valid_from, valid_to) + is_current."""
    return _orders_scd2_history(spark, sf_dir)


SQL_SCD2_HISTORY = """
WITH v AS (
  SELECT o_orderkey, o_orderstatus, o_orderdate AS ts FROM orders
  UNION ALL
  SELECT o_orderkey, 'X', o_orderdate + INTERVAL 30 DAY FROM orders
  WHERE o_orderkey % 7 = 0
)
SELECT o_orderkey, o_orderstatus, ts AS valid_from,
       lead(ts) OVER (PARTITION BY o_orderkey ORDER BY ts) AS valid_to,
       lead(ts) OVER (PARTITION BY o_orderkey ORDER BY ts) IS NULL AS is_current
FROM v
"""


# -- qid: pit_join -----------------------------------------------------

def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: fact probes joined to the SCD2 dimension
    version valid AT the probe timestamp (the as-of-dimension lookup a
    warehouse needs for correct historical reporting). Probes land
    before (+15d) or after (+30d/+45d) the second version, exercising
    both sides.

    100 TB shape: the join is EQUI on the key — the interval predicate
    is a post-join filter, valid because SCD2 versions-per-key is a
    small constant. One key shuffle (or co-located/bucketed join),
    never an interval nested-loop over the fact table."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    hist = _orders_scd2_history(spark, sf_dir)
    probe_ts = F.when(
        F.col("o_orderkey") % 2 == 0, F.col("o_orderdate") + F.expr("INTERVAL 15 DAYS")
    ).otherwise(F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"))
    fact = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", probe_ts.alias("probe_ts")
    )
    j = fact.join(hist, "o_orderkey").filter(
        (F.col("probe_ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("probe_ts") < F.col("valid_to")))
    )
    return j.select(
        "o_orderkey",
        "probe_ts",
        F.col("o_orderstatus").alias("status_at"),
        "valid_from",
    )


SQL_PIT_JOIN = """
WITH v AS (
  SELECT o_orderkey, o_orderstatus, o_orderdate AS ts FROM orders
  UNION ALL
  SELECT o_orderkey, 'X', o_orderdate + INTERVAL 30 DAY FROM orders
  WHERE o_orderkey % 7 = 0
),
h AS (
  SELECT o_orderkey, o_orderstatus, ts AS valid_from,
         lead(ts) OVER (PARTITION BY o_orderkey ORDER BY ts) AS valid_to
  FROM v
),
f AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 2 = 0 THEN o_orderdate + INTERVAL 15 DAY
              ELSE o_orderdate + INTERVAL 45 DAY END AS probe_ts
  FROM orders WHERE o_orderkey % 3 = 0
)
SELECT f.o_orderkey, f.probe_ts, h.o_orderstatus AS status_at, h.valid_from
FROM f JOIN h ON f.o_orderkey = h.o_orderkey
WHERE f.probe_ts >= h.valid_from
  AND (h.valid_to IS NULL OR f.probe_ts < h.valid_to)
"""


# -- qid: rollup_refresh ----------------------------------------------

def q_rollup_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental continuous-aggregate refresh: build the rollup from
    events before Jan 15, merge in the rest as a delta — the oracle is
    the full rebuild, which IS the operator's correctness invariant
    (operators/rollup.py)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.rollup import (
        rollup_build,
        rollup_refresh,
    )

    ev = load(spark, sf_dir, "events").select("event_type", "ts", "value")
    cut = "2024-01-15"
    # split on one predicate and its NEGATION: `ts < cut` vs
    # `ts >= cut` would both be false for a NULL ts, silently dropping
    # the row from state AND delta while the full-rebuild oracle (no ts
    # filter) still counts it
    recent = F.col("ts") >= cut
    state = rollup_build(
        ev.filter(~F.coalesce(recent, F.lit(False))), ["event_type"], ["value"]
    )
    refreshed = rollup_refresh(state, ev.filter(recent), ["event_type"], ["value"])
    return refreshed.select(
        "event_type",
        F.round(F.col("sum_value"), 2).cast("double").alias("sum_value"),
        "n_rows",
    )


SQL_ROLLUP_REFRESH = """
SELECT event_type,
       CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_value,
       CAST(count(*) AS BIGINT) AS n_rows
FROM events GROUP BY event_type
"""


QUERIES = {
    "scd2_history": q_scd2_history,
    "pit_join": q_pit_join,
    "rollup_refresh": q_rollup_refresh,
    "change_ts": q_change_ts,
    "delta_filter": q_delta_filter,
    "watermark_max": q_watermark_max,
    "latest_per_key": q_latest_per_key,
    "cdc_merge": q_cdc_merge,
    "merge_stats": q_merge_stats,
}

ORACLE_SQL = {
    "scd2_history": SQL_SCD2_HISTORY,
    "pit_join": SQL_PIT_JOIN,
    "rollup_refresh": SQL_ROLLUP_REFRESH,
    "change_ts": SQL_CHANGE_TS,
    "delta_filter": SQL_DELTA_FILTER,
    "watermark_max": SQL_WATERMARK_MAX,
    "latest_per_key": SQL_LATEST_PER_KEY,
    "cdc_merge": SQL_CDC_MERGE,
    "merge_stats": SQL_MERGE_STATS,
}


# -- qid: scd3_dimension -----------------------------------------------

def q_scd3_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-3 dimension maintenance: a delta of changed attribute
    values folds into the dimension as (current, previous) COLUMNS —
    the third member of the slowly-changing-dimension family the
    engine now covers end-to-end (Type 1 = cdc_merge overwrite — the
    reference's only strategy, `/root/reference/scripts/03_cdc_etl.py`
    MERGE with no history retention; Type 2 = scd2_history validity
    rows; Type 3 = here: one prior value retained in-row, the shape
    reporting marts use when only "what changed since last load"
    matters and history depth 1 is the requirement).

    Delta simulation: customers with c_custkey % 7 = 0 move to a new
    market segment ('SEG-' || custkey % 3). Unchanged keys keep
    prev_segment NULL; a delta value EQUAL to the current one is NOT a
    change (no-op guard — the same rule cdc_merge's attribution
    uses). Emits (key, segment, prev_segment, is_changed).

    Scale: one equi-join of dimension to delta — delta is small by
    nature, so it broadcasts; no window, no shuffle of the dimension.
    """
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    delta = (
        c.filter(F.col("c_custkey") % 7 == 0)
        .select(
            "c_custkey",
            F.concat(F.lit("SEG-"), (F.col("c_custkey") % 3).cast("string")).alias(
                "new_segment"
            ),
        )
    )
    j = c.join(F.broadcast(delta), "c_custkey", "left")
    changed = F.col("new_segment").isNotNull() & (
        F.col("new_segment") != F.col("c_mktsegment")
    )
    return j.select(
        "c_custkey",
        F.when(changed, F.col("new_segment"))
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
        F.when(changed, F.col("c_mktsegment")).alias("prev_segment"),
        changed.cast("int").alias("is_changed"),
    )


SQL_SCD3_DIMENSION = """
WITH delta AS (
  SELECT c_custkey, 'SEG-' || (c_custkey % 3) AS new_segment
  FROM customer WHERE c_custkey % 7 = 0
)
SELECT c.c_custkey,
       CASE WHEN d.new_segment IS NOT NULL AND d.new_segment <> c.c_mktsegment
            THEN d.new_segment ELSE c.c_mktsegment END AS segment,
       CASE WHEN d.new_segment IS NOT NULL AND d.new_segment <> c.c_mktsegment
            THEN c.c_mktsegment END AS prev_segment,
       CAST(d.new_segment IS NOT NULL AND d.new_segment <> c.c_mktsegment
            AS INT) AS is_changed
FROM customer c LEFT JOIN delta d ON c.c_custkey = d.c_custkey
"""

QUERIES["scd3_dimension"] = q_scd3_dimension
ORACLE_SQL["scd3_dimension"] = SQL_SCD3_DIMENSION
