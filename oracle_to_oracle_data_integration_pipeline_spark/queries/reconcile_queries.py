"""Reconciliation qids — the validation surface of a replication
pipeline (operators/reconcile.py): anti-entropy checksum compare,
same-timestamp CDC conflict resolution, and schema diff. The reference
replicates Oracle→Oracle and trusts MERGE row counts
(`/root/reference/scripts/03_cdc_etl.py`); these prove convergence.

Cross-engine hashing notes: all digests ride md5 over canonical STRING
forms (the md5_frac52 idiom). Doubles are decimal(18,2)-cast before
stringification — Spark's Java double→string switches to scientific
notation at 1e7 where DuckDB does not, so raw double strings would
silently diverge at scale; decimal strings are format-stable in both.
Timestamps are excluded from digests for the same reason (trailing-zero
micros print differently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.reconcile import (
    resolve_op_conflicts,
    schema_diff,
    table_checksum_diff,
)
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load, local_result
from oracle_to_oracle_data_integration_pipeline_spark.queries.cdc_queries import CDC_SRC_SQL, cdc_orders


# -- qid: checksum_diff ------------------------------------------------

CKD_BUCKETS = 64
CKD_DROP_MOD = 101   # target is missing keys divisible by this
CKD_DRIFT_MOD = 97   # target drifted +1.00 on keys divisible by this


def _ckd_prep(df: DataFrame) -> DataFrame:
    return df.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price_s"),
    )


def q_checksum_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style level-1 anti-entropy audit: source = orders;
    target = orders with simulated replication drift (keys ÷101
    missing, keys ÷97 price-drifted +1.00). Each side reduces to 64
    order-independent bucket digests (map-side combinable 52-bit
    DECIMAL sums of per-row md5s) and ONLY the digests join — at
    100 TB the compare ships 64 rows per side, never data. Buckets
    containing a drifted/missing key flag digests_match=0; clean
    buckets prove bitwise convergence."""
    o = load(spark, sf_dir, "orders")
    source = _ckd_prep(o)
    target = _ckd_prep(
        o.where(F.col("o_orderkey") % CKD_DROP_MOD != 0).withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % CKD_DRIFT_MOD == 0,
                F.col("o_totalprice") + 1.0,
            ).otherwise(F.col("o_totalprice")),
        )
    )
    return table_checksum_diff(
        source,
        target,
        keys=["o_orderkey"],
        digest_cols=["o_custkey", "o_orderstatus", "price_s"],
        n_buckets=CKD_BUCKETS,
    )


# length-prefixed canonical part (the delimiter-injection guard —
# must mirror operators/reconcile._row_digest exactly)
def _lp(expr: str) -> str:
    return f"(length({expr}) || ':' || {expr})"


_CKD_KEY_LP = _lp("CAST(o_orderkey AS VARCHAR)")
_CKD_ROW_LP = ", ".join(
    _lp(e)
    for e in [
        "CAST(o_orderkey AS VARCHAR)",
        "CAST(o_custkey AS VARCHAR)",
        "o_orderstatus",
        "price_s",
    ]
)

SQL_CHECKSUM_DIFF = f"""
WITH src AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_s
  FROM orders
),
tgt AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(CAST(CASE WHEN o_orderkey % {CKD_DRIFT_MOD} = 0
                        THEN o_totalprice + 1.0 ELSE o_totalprice END
              AS DECIMAL(18,2)) AS VARCHAR) AS price_s
  FROM orders WHERE o_orderkey % {CKD_DROP_MOD} <> 0
),
sd AS (
  SELECT CAST(('0x' || substr(md5({_CKD_KEY_LP}), 1, 4)) AS BIGINT)
           % {CKD_BUCKETS} AS bucket,
         count(*) AS n_rows,
         sum(CAST(CAST(('0x' || substr(md5(concat_ws('|',
               {_CKD_ROW_LP})), 1, 13)) AS BIGINT) AS HUGEINT)) AS digest
  FROM src GROUP BY 1
),
td AS (
  SELECT CAST(('0x' || substr(md5({_CKD_KEY_LP}), 1, 4)) AS BIGINT)
           % {CKD_BUCKETS} AS bucket,
         count(*) AS n_rows,
         sum(CAST(CAST(('0x' || substr(md5(concat_ws('|',
               {_CKD_ROW_LP})), 1, 13)) AS BIGINT) AS HUGEINT)) AS digest
  FROM tgt GROUP BY 1
)
SELECT coalesce(sd.bucket, td.bucket) AS bucket,
       coalesce(sd.n_rows, 0) AS n_source,
       coalesce(td.n_rows, 0) AS n_target,
       CAST(CASE WHEN sd.digest IS NOT NULL AND td.digest IS NOT NULL
                  AND sd.digest = td.digest AND sd.n_rows = td.n_rows
            THEN 1 ELSE 0 END AS INT) AS digests_match
FROM sd FULL OUTER JOIN td ON sd.bucket = td.bucket
"""


# -- qid: checksum_drill -----------------------------------------------

def q_checksum_drill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anti-entropy drill-down pass: level-1 digests flag the
    drifted buckets (collected — ≤64 ids, control plane), then the
    row-level diff runs ONLY over those buckets' slice, emitting
    exactly the drifted keys with their drift class. At 100 TB the
    expensive keyed full-outer join touches |flagged buckets|/64 of
    each table instead of all of it — and in the common all-clean case,
    nothing at all. Composition lives in
    :func:`operators.reconcile.checksum_drill`, which caches the
    level-1 result around its single control-plane collect (or accepts
    a caller-cached one) so each side is scanned exactly once per
    level; the returned drill plan scans source+target once each,
    pinned by tests/test_plans.py::test_checksum_drill_scan_count."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.reconcile import (
        checksum_drill,
    )

    o = load(spark, sf_dir, "orders")
    source = _ckd_prep(o)
    target = _ckd_prep(
        o.where(F.col("o_orderkey") % CKD_DROP_MOD != 0).withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % CKD_DRIFT_MOD == 0,
                F.col("o_totalprice") + 1.0,
            ).otherwise(F.col("o_totalprice")),
        )
    )
    return checksum_drill(
        source, target, ["o_orderkey"],
        ["o_custkey", "o_orderstatus", "price_s"], n_buckets=CKD_BUCKETS,
    )


# a drift-mod key is 'changed' only when the +1.0 actually changes the
# digested value: NULL + 1.0 = NULL is NOT a change, and the engine's
# digest correctly stays silent on it (fuzz find, nulls profile at
# seed 3 — the same hardcoded-outcome class as snapshot_cdf)
SQL_CHECKSUM_DRILL = f"""
SELECT o_orderkey,
       CASE WHEN o_orderkey % {CKD_DROP_MOD} = 0 THEN 'source_only'
            ELSE 'changed' END AS status
FROM orders
WHERE o_orderkey % {CKD_DROP_MOD} = 0
   OR (o_orderkey % {CKD_DRIFT_MOD} = 0 AND o_totalprice IS NOT NULL)
"""


# -- qid: cdc_op_priority ----------------------------------------------

OPP_KEYS = 500


def q_cdc_op_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-timestamp CDC conflict resolution: a delta batch with ~30
    ops per key (orders folded onto {OPP_KEYS} keys, timestamps
    truncated to month so ties are guaranteed) resolved to ONE
    surviving op per key by (ts DESC, D>U>I priority, key DESC
    tiebreak). The reference's MERGE keeps max(last_updated) and
    leaves equal-timestamp order to the database; this pins it.
    Keyed window — one hash shuffle, the latest-per-key plan."""
    o = load(spark, sf_dir, "orders")
    delta = o.select(
        (F.col("o_orderkey") % OPP_KEYS).alias("merge_key"),
        F.date_trunc("month", F.col("o_orderdate")).alias("op_ts"),
        F.element_at(
            F.array(F.lit("I"), F.lit("U"), F.lit("D")),
            (F.col("o_orderkey") % 3 + 1).cast("int"),
        ).alias("op"),
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    resolved = resolve_op_conflicts(
        delta, ["merge_key"], ts_col="op_ts", op_col="op", tiebreak=["o_orderkey"]
    )
    return resolved.select(
        "merge_key", "op_ts", "op", "o_orderkey",
        F.col("price").cast("double").alias("price"),
        "n_conflicts",
    )


SQL_CDC_OP_PRIORITY = f"""
WITH delta AS (
  SELECT o_orderkey % {OPP_KEYS} AS merge_key,
         date_trunc('month', o_orderdate) AS op_ts,
         CASE o_orderkey % 3 WHEN 0 THEN 'I' WHEN 1 THEN 'U' ELSE 'D' END AS op,
         o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
ranked AS (
  SELECT *,
         -- NULLS LAST pinned explicitly (Spark's DESC default): with a
         -- NULL op_ts in play, DuckDB 1.0's parallel window sort places
         -- unpinned NULLs nondeterministically per run (measured: 45
         -- distinct result sets over 50 executions on fuzzed data —
         -- tools/fuzz_parity.py nulls profile)
         row_number() OVER (
           PARTITION BY merge_key
           ORDER BY op_ts DESC NULLS LAST,
                    CASE op WHEN 'D' THEN 3 WHEN 'U' THEN 2 ELSE 1 END DESC,
                    o_orderkey DESC
         ) AS rn,
         count(*) OVER (PARTITION BY merge_key) AS n_conflicts
  FROM delta
)
SELECT merge_key, op_ts, op, o_orderkey, CAST(price AS DOUBLE) AS price,
       n_conflicts
FROM ranked WHERE rn = 1
"""


# -- qid: schema_diff --------------------------------------------------

def q_schema_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level source/target schema diff — the decision input of
    the reference's prepare-CDC-columns step
    (scripts/01_prepare_cdc_columns:20-38: find missing audit columns,
    ALTER TABLE ADD them). Target simulates a drifted replica of
    orders: one column dropped, one added, one re-typed — so all four
    statuses (add/drop/type_change/common) appear. Driver-side
    metadata only; no data is scanned."""
    src = load(spark, sf_dir, "orders")
    tgt = (
        src.drop("o_orderpriority")
        .withColumn("o_totalprice", F.col("o_totalprice").cast("string"))
        .withColumn("load_tag", F.lit("batch1"))
    )
    return schema_diff(spark, src, tgt)


SQL_SCHEMA_DIFF = """
WITH src AS (
  SELECT column_name,
         CASE data_type
           WHEN 'INTEGER' THEN 'int'
           WHEN 'BIGINT' THEN 'bigint'
           WHEN 'VARCHAR' THEN 'string'
           WHEN 'DOUBLE' THEN 'double'
           WHEN 'TIMESTAMP' THEN 'timestamp'
           ELSE lower(data_type)
         END AS source_type
  FROM information_schema.columns WHERE table_name = 'orders'
),
tgt AS (
  SELECT column_name,
         CASE WHEN column_name = 'o_totalprice' THEN 'string'
              ELSE source_type END AS target_type
  FROM src WHERE column_name <> 'o_orderpriority'
  UNION ALL SELECT 'load_tag', 'string'
)
SELECT coalesce(s.column_name, t.column_name) AS column_name,
       s.source_type, t.target_type,
       CASE WHEN t.column_name IS NULL THEN 'add'
            WHEN s.column_name IS NULL THEN 'drop'
            WHEN s.source_type <> t.target_type THEN 'type_change'
            ELSE 'common' END AS status
FROM src s FULL OUTER JOIN tgt t ON s.column_name = t.column_name
"""


# -- qid: offset_gap_audit ---------------------------------------------

def q_offset_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-integrity audit of the events feed treated as a change
    log: event_id is the capture sequence, event_type the feed
    partition. Per partition and for the whole feed (ROLLUP row):
    duplicate count, gap count, and the is_contiguous green light for
    advancing a watermark (operators/reconcile.offset_gap_audit). Per
    partition the sequence is sparse (gaps expected, flag false); the
    rollup row over the full feed is the live contiguity check —
    either outcome is exercised."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.reconcile import offset_gap_audit

    e = load(spark, sf_dir, "events")
    return offset_gap_audit(e, seq_col="event_id", partition_col="event_type")


SQL_OFFSET_GAP_AUDIT = """
SELECT event_type AS part,
       CAST(GROUPING(event_type) AS INT) AS is_total,
       count(*) AS n_events,
       CAST(count(*) - count(event_id) AS BIGINT) AS n_null_seq,
       count(DISTINCT event_id) AS n_distinct,
       min(event_id) AS seq_min,
       max(event_id) AS seq_max,
       CAST(count(event_id) - count(DISTINCT event_id) AS BIGINT) AS n_dupes,
       CAST(max(event_id) - min(event_id) + 1 - count(DISTINCT event_id)
            AS BIGINT) AS n_gaps,
       (count(*) = count(event_id)
        AND count(*) = count(DISTINCT event_id)
        AND max(event_id) - min(event_id) + 1 = count(DISTINCT event_id))
         AS is_contiguous
FROM events
GROUP BY ROLLUP (event_type)
"""


# -- qid: ivm_join -----------------------------------------------------

def q_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view — the algebra that
    keeps a materialized orders⋈customer view current from CDC deltas
    WITHOUT re-joining the full tables:

        Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    The natural next step past the reference's single-table MERGE
    (scripts/03_cdc_etl.py replicates base tables; downstream joined
    views would be fully rebuilt) — this is the standard delta-join
    rule (Blakeley et al.) those rebuilds should become.

    Deltas are simulated deterministically (orders with
    o_orderkey % 97 = 0, customers with c_custkey % 89 = 0 arrive as
    inserts; the rest is the old state). The qid RUNS the three delta
    joins + base union and aggregates the maintained view; the DuckDB
    oracle computes the NAIVE FULL REBUILD — hash equality IS the
    proof that incremental maintenance converges to the rebuild.

    Scale shape: the delta joins touch |Δ| fact rows, not |A|. The
    dimension side is hint-free (r7 broadcast-audit find: the dim
    GROWS with SF, so pinning it to broadcast OOMs at scale) — stats
    broadcast it at fixture size, and at 100 TB the delta side is the
    small one, which AQE then broadcasts instead. In production
    V_old is the stored view (one scan), not re-derived; the harness
    re-derives it because qids are stateless. n_delta counts the rows
    that arrived through a delta path — the write amplification the
    maintenance pays."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    old_o = o.filter(F.col("o_orderkey") % 97 != 0)
    d_o = o.filter(F.col("o_orderkey") % 97 == 0)
    old_c = c.filter(F.col("c_custkey") % 89 != 0)
    d_c = c.filter(F.col("c_custkey") % 89 == 0)

    def j(lhs, rhs, tag):
        return lhs.join(rhs, lhs.o_custkey == rhs.c_custkey).select(
            "o_totalprice", "c_mktsegment", F.lit(tag).alias("is_delta")
        )

    v_new = (
        j(old_o, old_c, 0)          # V_old: the stored base view
        .unionByName(j(d_o, old_c, 1))   # ΔA ⋈ B_old
        .unionByName(j(old_o, d_c, 1))   # A_old ⋈ ΔB
        .unionByName(j(d_o, d_c, 1))     # ΔA ⋈ ΔB
    )
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import dsum

    return v_new.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("is_delta").alias("n_delta"),
        dsum(F.col("o_totalprice")).alias("total_price"),
    )


SQL_IVM_JOIN = """
SELECT c_mktsegment,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN o_orderkey % 97 = 0 OR c_custkey % 89 = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_delta,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(24,6))), 2) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


QUERIES = {
    "checksum_diff": q_checksum_diff,
    "checksum_drill": q_checksum_drill,
    "cdc_op_priority": q_cdc_op_priority,
    "schema_diff": q_schema_diff,
    "offset_gap_audit": q_offset_gap_audit,
    "ivm_join": q_ivm_join,
}

ORACLE_SQL = {
    "checksum_diff": SQL_CHECKSUM_DIFF,
    "checksum_drill": SQL_CHECKSUM_DRILL,
    "cdc_op_priority": SQL_CDC_OP_PRIORITY,
    "schema_diff": SQL_SCHEMA_DIFF,
    "offset_gap_audit": SQL_OFFSET_GAP_AUDIT,
    "ivm_join": SQL_IVM_JOIN,
}


# -- qid: backfill_plan --------------------------------------------------

BF_CHUNKS = 8


def q_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked-backfill planner: when a table has no watermark the
    reference full-loads it in ONE read (scripts/03_cdc_etl.py falls
    back to the unbounded query); at 100 TB the operational answer is
    N resumable chunks of ~equal ROW COUNT (not equal date spans —
    load is skewed), each a closed date range a retry can re-run
    idempotently. The planner: per-day counts (one combinable
    shuffle), EXCLUSIVE cumulative sum over the bounded day histogram,
    chunk id = floor(cum_before·N/total) — equi-depth by construction,
    each day wholly inside one chunk (ranges never overlap). Output
    per chunk: [from_date, to_date], days, rows.

    Scale: the only window runs over ≤|days| rows (whitelisted); the
    plan is O(days) driver-visible rows, and each chunk's WHERE range
    is partition-prunable at execution time.

    NULL-date contract (fuzz find, tools/fuzz_parity.py nulls
    profile): rows with a NULL chunking date are EXCLUDED explicitly —
    a date-range WHERE can never address them, so silently counting
    them into a chunk whose range won't re-load them would corrupt the
    backfill; they need a dedicated ``IS NULL`` pass. The explicit
    filter also pins cross-engine behavior: an unfiltered cumulative
    window would put the NULL day first in Spark (ASC NULLS FIRST) and
    last in DuckDB (NULLS LAST), shifting every chunk boundary."""
    o = load(spark, sf_dir, "orders")
    days = (
        o.filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_prev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    chunked = days.select(
        "day",
        "n",
        F.floor(
            F.coalesce(F.sum("n").over(w_prev), F.lit(0)).cast("double")
            * F.lit(float(BF_CHUNKS))
            / F.sum("n").over(w_all).cast("double")
        )
        .cast("int")
        .alias("chunk"),
    )
    return chunked.groupBy("chunk").agg(
        F.min("day").alias("from_date"),
        F.max("day").alias("to_date"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("n").cast("bigint").alias("n_rows"),
    )


SQL_BACKFILL_PLAN = f"""
WITH days AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
),
c AS (
  SELECT day, n,
         CAST(floor(CAST(coalesce(sum(n) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS DOUBLE) * {BF_CHUNKS}.0
               / CAST(sum(n) OVER () AS DOUBLE)) AS INT) AS chunk
  FROM days
)
SELECT chunk, min(day) AS from_date, max(day) AS to_date,
       CAST(count(*) AS BIGINT) AS n_days, CAST(sum(n) AS BIGINT) AS n_rows
FROM c GROUP BY chunk
"""


# -- qid: consistency_watermark -------------------------------------------

def q_consistency_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table consistency barrier: each replicated table's
    watermark advances independently (the reference keeps one row per
    table in ETL_WATERMARKS — scripts/03_cdc_etl.py:85-96), so a
    consumer joining tables sees MIXED logical times. The safe
    snapshot barrier is min(per-table high-watermark); per table the
    audit reports its frontier, its lag behind the group barrier, and
    whether it IS the straggler holding everyone back.

    Simulated frontiers: each table's max change-ts over the fixture
    (orders via the CDC columns, lineitem via shipdate, customer
    pinned one month earlier by construction so a straggler exists).

    Scale: three combinable MAX aggregations (already-aggregated
    1-row branches), a 3-row union, one broadcast of the group min.
    Nothing scales with data beyond the scans."""
    o = cdc_orders(spark, sf_dir).select(
        F.lit("orders").alias("table_name"),
        F.greatest(
            F.coalesce(F.col("updated_at"), F.col("created_at")),
            F.col("created_at"),
        ).alias("ts"),
    )
    li = load(spark, sf_dir, "lineitem").select(
        F.lit("lineitem").alias("table_name"), F.col("l_shipdate").alias("ts")
    )
    cu = cdc_orders(spark, sf_dir).select(
        F.lit("customer").alias("table_name"),
        F.expr("created_at - INTERVAL '30' DAY").alias("ts"),
    )
    frontiers = (
        o.unionByName(li).unionByName(cu)
        .groupBy("table_name")
        .agg(F.max("ts").alias("high_watermark"))
    )
    barrier = frontiers.agg(F.min("high_watermark").alias("barrier"))
    return frontiers.crossJoin(F.broadcast(barrier)).select(
        "table_name",
        "high_watermark",
        "barrier",
        F.datediff(F.to_date("high_watermark"), F.to_date("barrier"))
        .cast("int")
        .alias("lag_days"),
        (F.col("high_watermark") == F.col("barrier")).cast("int").alias(
            "is_straggler"
        ),
    )


SQL_CONSISTENCY_WATERMARK = f"""
WITH {CDC_SRC_SQL},
f AS (
  SELECT 'orders' AS table_name,
         max(greatest(coalesce(updated_at, created_at), created_at))
           AS high_watermark
  FROM cdc_src
  UNION ALL
  SELECT 'lineitem', max(l_shipdate) FROM lineitem
  UNION ALL
  SELECT 'customer', max(created_at - INTERVAL 30 DAY) FROM cdc_src
),
b AS (SELECT min(high_watermark) AS barrier FROM f)
SELECT table_name, high_watermark, barrier,
       CAST(date_diff('day', CAST(barrier AS DATE),
                      CAST(high_watermark AS DATE)) AS INT) AS lag_days,
       CAST(CASE WHEN high_watermark = barrier THEN 1 ELSE 0 END AS INT)
         AS is_straggler
FROM f CROSS JOIN b
"""


# round-5 ops additions (defined below the original registry block)
QUERIES["backfill_plan"] = q_backfill_plan
QUERIES["consistency_watermark"] = q_consistency_watermark
ORACLE_SQL["backfill_plan"] = SQL_BACKFILL_PLAN
ORACLE_SQL["consistency_watermark"] = SQL_CONSISTENCY_WATERMARK


# -- qid: erasure_sweep ----------------------------------------------------

ERASE_MOD = 101


def q_erasure_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten sweep executed through the versioned
    snapshot store: subjects (custkeys ÷{ERASE_MOD}) are HARD-DELETED
    from the customer dimension and their orders are ANONYMIZED
    (custkey nulled — financial records retained, subject unlinked),
    each table's erasure landing as ONE auditable snapshot commit (the
    erasure itself becomes provable history — who was removed, when,
    in which version — while vacuum retires the pre-erasure data after
    the legal hold). The output is the compliance report: per table,
    rows before/after, rows erased/anonymized, and the RESIDUAL
    REFERENCE COUNT on the post-erasure state — the number every
    auditor asks for, and it must be zero.

    Scale: erasure is two anti-join/projection passes (one per table)
    + the store's atomic commits; the deletion list is a broadcast
    semi/anti key set; the residual check is one aggregation over the
    post-erasure versions. Nothing driver-side beyond the ≤2-row
    report."""
    import shutil
    import tempfile as _tempfile

    from oracle_to_oracle_data_integration_pipeline_spark.sources.snapshots import (
        SnapshotStore,
    )

    cu = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    erase = F.col("c_custkey") % ERASE_MOD == 0

    root = _tempfile.mkdtemp(prefix="erasure_")
    try:
        store = SnapshotStore(spark, root)
        store.commit(cu, "customer")
        store.commit(o, "orders")
        # erasure commits (version 1 of each table)
        store.commit(store.read("customer").where(~erase), "customer",
                     operation="erasure")
        subjects = cu.where(erase).select(F.col("c_custkey").alias("k"))
        store.commit(
            store.read("orders")
            .join(F.broadcast(subjects), F.col("o_custkey") == F.col("k"), "left")
            .select(
                "o_orderkey",
                F.when(F.col("k").isNull(), F.col("o_custkey")).alias("o_custkey"),
            ),
            "orders",
            operation="erasure",
        )
        cu2, o2 = store.read("customer"), store.read("orders")
        residual = (
            o2.join(
                F.broadcast(subjects), o2["o_custkey"] == F.col("k"), "left_semi"
            ).count()
            + cu2.where(erase).count()
        )
        rows = [
            (
                "customer",
                cu.count(),
                cu.where(erase).count(),
                cu2.count(),
                int(residual == 0),
            ),
            (
                "orders",
                o.count(),
                o.join(F.broadcast(subjects), o["o_custkey"] == F.col("k"), "left_semi").count(),
                o2.count(),
                int(residual == 0),
            ),
        ]
        return local_result(
            spark,
            rows,
            "table_name string, n_before bigint, n_erased bigint, "
            "n_after bigint, clean int",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_ERASURE_SWEEP = f"""
WITH subj AS (SELECT c_custkey FROM customer WHERE c_custkey % {ERASE_MOD} = 0)
SELECT 'customer' AS table_name,
       (SELECT count(*) FROM customer) AS n_before,
       (SELECT count(*) FROM subj) AS n_erased,
       (SELECT count(*) FROM customer WHERE c_custkey % {ERASE_MOD} <> 0)
         AS n_after,
       1 AS clean
UNION ALL
SELECT 'orders',
       (SELECT count(*) FROM orders),
       (SELECT count(*) FROM orders WHERE o_custkey IN (SELECT c_custkey FROM subj)),
       (SELECT count(*) FROM orders),
       1
"""

QUERIES["erasure_sweep"] = q_erasure_sweep
ORACLE_SQL["erasure_sweep"] = SQL_ERASURE_SWEEP


# -- qid: incremental_lookback ----------------------------------------------

IL_LOOKBACK_DAYS = 30
IL_LATE_MOD = 13


def q_incremental_lookback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dbt-style INCREMENTAL MATERIALIZATION with a lookback
    window: a daily revenue rollup is kept current by recomputing only
    the trailing {IL_LOOKBACK_DAYS} days (where late-arriving updates
    can still land) and carrying everything older forward from the
    stored table — the pattern that turns a full nightly rebuild into
    a bounded incremental one. Late updates are simulated
    deterministically (orders ÷{IL_LATE_MOD} inside the lookback
    horizon gain +1.00 after the stored rollup was built).

    The Spark side RUNS the incremental algebra (stale-carry ∪
    recomputed-tail); the oracle performs the naive FULL REBUILD on
    current data — hash equality IS the proof that the lookback
    window covers the late-update horizon, the correctness condition
    of every incremental model. A too-short lookback would flip the
    hash, not pass silently.

    Scale: the recomputed tail scans only the lookback slice
    (partition-prunable date predicate); the stale carry is a scan of
    the stored AGGREGATE (days, not orders). Both aggregations are
    combinable.

    NULL-date contract (fuzz find, tools/fuzz_parity.py nulls
    profile): an undated order can be addressed by neither the carry
    (NOT in_horizon) nor the recompute window — an unfiltered NULL
    silently falls out of BOTH branches in Spark (three-valued
    where()) but lands in the oracle's CASE ELSE arm, so the
    exclusion is stated explicitly on both sides; undated rows need
    their own repair pass, like backfill_plan.
    """
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select("o_orderkey", F.to_date("o_orderdate").alias("day"), "o_totalprice")
    )
    cutoff = o.agg(F.max("day").alias("max_day"))
    ob = o.crossJoin(F.broadcast(cutoff)).withColumn(
        "in_horizon",
        F.col("day") >= F.date_sub(F.col("max_day"), IL_LOOKBACK_DAYS),
    )
    # current truth: late +1.00 updates applied inside the horizon
    current = ob.withColumn(
        "price",
        F.when(
            (F.col("o_orderkey") % IL_LATE_MOD == 0) & F.col("in_horizon"),
            F.col("o_totalprice") + 1.0,
        ).otherwise(F.col("o_totalprice")),
    )
    # stored rollup: built BEFORE the late updates arrived
    stored = (
        ob.groupBy("day", "in_horizon")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(24,6)")).alias("_rev"),
        )
    )
    carry = stored.where(~F.col("in_horizon")).select(
        "day",
        "n_orders",
        F.round("_rev", 2).cast("double").alias("revenue"),
        F.lit(0).alias("recomputed"),
    )
    tail = (
        current.where(F.col("in_horizon"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("price").cast("decimal(24,6)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .withColumn("recomputed", F.lit(1))
    )
    return carry.unionByName(tail)


SQL_INCREMENTAL_LOOKBACK = f"""
WITH c AS (SELECT max(CAST(o_orderdate AS DATE)) AS max_day FROM orders),
cur AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CASE WHEN CAST(o_orderdate AS DATE)
                   >= (SELECT max_day FROM c) - {IL_LOOKBACK_DAYS}
              THEN 1 ELSE 0 END AS in_horizon,
         CASE WHEN o_orderkey % {IL_LATE_MOD} = 0
                   AND CAST(o_orderdate AS DATE)
                       >= (SELECT max_day FROM c) - {IL_LOOKBACK_DAYS}
              THEN o_totalprice + 1.0 ELSE o_totalprice END AS price
  FROM orders WHERE o_orderdate IS NOT NULL
)
SELECT day, count(*) AS n_orders,
       CAST(round(sum(CAST(price AS DECIMAL(24,6))), 2) AS DOUBLE) AS revenue,
       CAST(max(in_horizon) AS INT) AS recomputed
FROM cur GROUP BY day
"""

QUERIES["incremental_lookback"] = q_incremental_lookback
ORACLE_SQL["incremental_lookback"] = SQL_INCREMENTAL_LOOKBACK


# -- qid: bitemporal_asof ------------------------------------------------------

BT_T_EARLY = "1997-01-01"
BT_T_LATE = "2002-01-01"


def q_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-known-at reporting: facts carry BOTH valid time
    (when the fact was true — the order date) and transaction time
    (when the system learned it — created_at, then updated_at for the
    corrections the CDC feed delivers later). A correction RESTATES
    history: the monthly revenue "as known at T" must reproduce what
    any report run at T actually showed — the auditability property
    single-temporal SCD2 (scd2_history, valid-time only) cannot give.

    Mechanics: version rows (original + correction) close their
    transaction intervals with ONE keyed lead() window (tx_to =
    next version's tx_from, open end = null); an as-of query is then a
    pure filter tx_from ≤ T < coalesce(tx_to, ∞) — no join, no
    mutation, reproducible forever. The qid answers the same monthly
    rollup at an early T (before any correction arrived) and a late T
    (all corrections visible); the early answer must equal the
    UNCORRECTED history, which is exactly what the oracle pins.

    Scale: one keyed window over ≤2 versions per key + a combinable
    monthly rollup per T; at 100 TB the tx-interval table is the
    stored format and each as-of query is a partition-prunable scan.
    """
    o = cdc_orders(spark, sf_dir).select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("valid_date"),
        "o_totalprice",
        "created_at",
        "updated_at",
    )
    v1 = o.select(
        "o_orderkey",
        "valid_date",
        F.col("o_totalprice").alias("value"),
        F.col("created_at").alias("tx_from"),
    )
    v2 = o.where(F.col("updated_at").isNotNull()).select(
        "o_orderkey",
        "valid_date",
        (F.col("o_totalprice") + 1.0).alias("value"),
        F.col("updated_at").alias("tx_from"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderkey").orderBy("tx_from")
    bt = (
        v1.unionByName(v2)
        .withColumn("tx_to", F.lead("tx_from").over(w))
    )

    def as_known_at(t: str, label: str) -> DataFrame:
        ts = F.lit(t).cast("timestamp")
        return (
            bt.where(
                (F.col("tx_from") <= ts)
                & (F.col("tx_to").isNull() | (F.col("tx_to") > ts))
            )
            .groupBy(F.date_trunc("month", "valid_date").cast("date").alias("month"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum(F.col("value").cast("decimal(24,6)")), 2)
                .cast("double")
                .alias("revenue"),
            )
            .withColumn("as_of", F.lit(label))
        )

    return as_known_at(BT_T_EARLY, "early").unionByName(
        as_known_at(BT_T_LATE, "late")
    )


SQL_BITEMPORAL_ASOF = f"""
WITH {CDC_SRC_SQL},
v AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS valid_date,
         o_totalprice AS value, created_at AS tx_from
  FROM cdc_src
  UNION ALL
  SELECT o_orderkey, CAST(o_orderdate AS DATE),
         o_totalprice + 1.0, updated_at
  FROM cdc_src WHERE updated_at IS NOT NULL
),
bt AS (
  SELECT *, lead(tx_from) OVER (PARTITION BY o_orderkey ORDER BY tx_from)
           AS tx_to
  FROM v
),
q AS (
  SELECT 'early' AS as_of, TIMESTAMP '{BT_T_EARLY}' AS t
  UNION ALL SELECT 'late', TIMESTAMP '{BT_T_LATE}'
)
SELECT CAST(date_trunc('month', valid_date) AS DATE) AS month,
       count(*) AS n_orders,
       CAST(round(sum(CAST(value AS DECIMAL(24,6))), 2) AS DOUBLE) AS revenue,
       q.as_of
FROM bt JOIN q ON bt.tx_from <= q.t AND (bt.tx_to IS NULL OR bt.tx_to > q.t)
GROUP BY 1, q.as_of
"""

QUERIES["bitemporal_asof"] = q_bitemporal_asof
ORACLE_SQL["bitemporal_asof"] = SQL_BITEMPORAL_ASOF


# -- qid: cdc_log_compaction -------------------------------------------

CLC_KEYS = 400


def q_cdc_log_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-to-checkpoint CDC log compaction: fold each key's
    full op sequence (I/U/D, ordered by a unique capture sequence)
    into its NET effect — the Kafka-compacted-topic / Debezium
    batch-fold semantics that lets a consumer apply |keys| net ops
    instead of replaying the whole log. Distinct from cdc_op_priority
    (same-timestamp conflict RESOLUTION — which single op survives a
    tie) and latest_per_key (latest ROW, no op algebra): compaction is
    defined by the FIRST×LAST op pair —

        first=I, last=D  →  'none'  (transient key: never existed at
                                     either checkpoint — emit nothing
                                     downstream)
        first=I, last≠D  →  'I'     (created in the window)
        first≠I, last=D  →  'D'     (pre-existing key deleted)
        otherwise        →  'U'     (pre-existing key survives; covers
                                     D→I re-insert, which downstream
                                     must see as an update)

    Reference tie-in: the reference applies EVERY captured delta row
    through its MERGE (`/root/reference/scripts/03_cdc_etl.py:145-161`
    — per-row work scales with log length); compaction is the standard
    pre-pass that folds the log to |keys| net ops first, so the same
    MERGE does checkpoint-equivalent work in one pass per key.

    The log is synthesized from orders like cdc_op_priority's feed
    (key = o_orderkey % {CLC_KEYS}, op = f(o_orderkey)), with
    o_orderkey itself as the unique capture sequence — min_by/max_by
    over a UNIQUE BIGINT sequence is the argmax-determinism idiom.

    NULL payloads are carried faithfully: a real CDC feed can capture
    a NULL column value in the last op, and the compacted row must
    report THAT value, which is what Spark's ``max_by(price, seq)``
    does. DuckDB's ``arg_max(price, seq)`` silently SKIPS rows whose
    value argument is NULL (fuzz find, tools/fuzz_parity.py nulls
    profile — it returned the price of an EARLIER op), so the oracle
    reads last_price by joining back on seq_hi instead.

    Scale shape: ONE combinable groupBy — min_by/max_by/count/min/max
    all partial-aggregate map-side, so at 100 TB the shuffle carries
    |keys| pre-folded rows, not the log. No window, no join: this is
    the cheapest possible plan for the semantics, which is the point —
    compaction must be cheaper than what it saves downstream."""
    o = load(spark, sf_dir, "orders")
    log = o.select(
        (F.col("o_orderkey") % CLC_KEYS).alias("merge_key"),
        F.col("o_orderkey").alias("seq"),
        F.element_at(
            F.array(F.lit("I"), F.lit("U"), F.lit("D")),
            (F.col("o_orderkey") % 3 + 1).cast("int"),
        ).alias("op"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    agg = log.groupBy("merge_key").agg(
        F.min_by("op", "seq").alias("first_op"),
        F.max_by("op", "seq").alias("last_op"),
        F.max_by("price", "seq").alias("last_price"),
        F.count(F.lit(1)).alias("n_ops_folded"),
        F.min("seq").alias("seq_lo"),
        F.max("seq").alias("seq_hi"),
    )
    net = (
        F.when(
            (F.col("first_op") == "I") & (F.col("last_op") == "D"), F.lit("none")
        )
        .when(F.col("first_op") == "I", F.lit("I"))
        .when(F.col("last_op") == "D", F.lit("D"))
        .otherwise(F.lit("U"))
    )
    return agg.select(
        "merge_key",
        "first_op",
        "last_op",
        net.alias("net_op"),
        F.col("last_price").cast("double").alias("last_price"),
        "n_ops_folded",
        "seq_lo",
        "seq_hi",
    )


SQL_CDC_LOG_COMPACTION = f"""
WITH log AS (
  SELECT o_orderkey % {CLC_KEYS} AS merge_key,
         o_orderkey AS seq,
         CASE o_orderkey % 3 WHEN 0 THEN 'I' WHEN 1 THEN 'U' ELSE 'D' END AS op,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
agg AS (
  SELECT merge_key,
         arg_min(op, seq) AS first_op,
         arg_max(op, seq) AS last_op,
         count(*) AS n_ops_folded,
         min(seq) AS seq_lo,
         max(seq) AS seq_hi
  FROM log GROUP BY 1
)
-- last_price via the seq_hi join, NOT arg_max(price, seq): DuckDB's
-- arg_max skips NULL values, but compaction must carry the payload of
-- the last op even when that payload is NULL (Spark max_by semantics)
SELECT agg.merge_key, first_op, last_op,
       CASE WHEN first_op = 'I' AND last_op = 'D' THEN 'none'
            WHEN first_op = 'I' THEN 'I'
            WHEN last_op = 'D' THEN 'D'
            ELSE 'U' END AS net_op,
       CAST(l.price AS DOUBLE) AS last_price,
       n_ops_folded, seq_lo, seq_hi
FROM agg JOIN log l ON l.merge_key = agg.merge_key AND l.seq = agg.seq_hi
"""

QUERIES["cdc_log_compaction"] = q_cdc_log_compaction
ORACLE_SQL["cdc_log_compaction"] = SQL_CDC_LOG_COMPACTION


# -- qid: replication_audit (feed → dedupe → merge → reconcile → FK, ONE plan)

RA_N_ROWS = 1000
RA_N_KEYS = 100
RA_SPLIT = "2024-01-01 00:08:20"   # feed row i carries ts 2024-01-01 + i s; i < 500 is the initial load
RA_STUCK_MOD = 13                  # delta loses keys ÷13 (a stuck capture partition)
RA_DIM_MOD = 17                    # dimension lags keys ÷17 (independent watermark)
RA_BUCKETS = 16


def q_replication_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC-side composition proof (round-9 twin of
    ``curation_release``): the reference's whole replication run —
    capture feed → per-key dedupe → soft-delete MERGE → post-merge
    verification (`/root/reference/scripts/03_cdc_etl.py:259-351`
    runs these as sequential steps with driver round-trips between
    them) — expressed as ONE Spark plan over operators the registry
    already verifies individually:

    1. **Feed**: the Python DataSource CDC feed (sources/pydatasource,
       the ``pysource_changefeed`` generator — rows are a pure md5
       function of the row index, so DuckDB regenerates the identical
       feed). The initial load is everything before {RA_SPLIT}; the
       delta batch is the rest MINUS keys ÷{RA_STUCK_MOD} — a stuck
       capture partition, the drift the audit must surface.
    2. **Dedupe**: ``operators/cdc.latest_per_key`` on each slice
       (ts is unique per key by construction — the never-null unique
       tie-break contract). The initial load drops keys whose last
       pre-split op is D (the insert gate applied at first load).
    3. **Merge**: ``operators/cdc.merge_soft_delete`` — delta wins on
       match, soft-delete flags flip, never-seen deletes drop.
    4. **Reconcile**: ``operators/reconcile.table_checksum_diff``
       between SOURCE-LIVE (latest non-D op per key over the FULL
       feed — what the source database holds now) and REPLICA-LIVE
       (merged rows with is_deleted='N'). Convergence is provable:
       every bucket untouched by the stuck keys must match, and only
       buckets holding a stuck key whose state changed post-split may
       flag — the merge algebra itself is what keeps them equal.
    5. **FK report**: the ``fk_integrity`` edge shape — replica-live
       keys against a LAGGED dimension (keys ÷{RA_DIM_MOD} absent),
       per-table watermarks advancing independently.

    Output: the audit summary in long form (section, metric, value) —
    12 rows. The oracle recomputes the ENTIRE composition in DuckDB
    from the stage twins' SQL, so a semantic drift in ANY stage (gate,
    tie-break, digest arithmetic, join flavor) flips the value hash.

    Stage persists are load-bearing (the curation_release lesson —
    Catalyst does not dedupe common subplans): feed feeds 3 stages,
    merged/replica_live are each referenced by 2-3 audit sections.
    All cached frames are ≤ |keys| rows except the 1000-row feed.

    Scale shape: every stage is keyed algebra — two row_number windows
    and the merge's full-outer join all hash-partition on the SAME key
    (exchange reuse), the checksum compare ships {RA_BUCKETS} digest
    rows per side, the FK edge pre-aggregates the child to one row per
    key. Nothing collects, nothing single-partitions.
    """
    from oracle_to_oracle_data_integration_pipeline_spark.operators.cache_registry import (
        persist_tracked,
    )
    from oracle_to_oracle_data_integration_pipeline_spark.operators.cdc import (
        latest_per_key,
        merge_soft_delete,
    )
    from oracle_to_oracle_data_integration_pipeline_spark.sources.pydatasource import (
        register,
    )

    register(spark)
    feed = persist_tracked(
        spark.read.format("cdc_feed")
        .option("n_rows", RA_N_ROWS)
        .option("n_keys", RA_N_KEYS)
        .option("n_parts", 4)
        .load(),
        "replication_audit",
    )
    split = F.lit(RA_SPLIT).cast("timestamp")
    pre = feed.filter(F.col("ts") < split)
    post = feed.filter(
        (F.col("ts") >= split) & (F.col("id") % RA_STUCK_MOD != 0)
    )
    target0 = persist_tracked(
        latest_per_key(pre, ["id"], order_cols=[F.col("ts").desc()])
        .filter(F.col("op") != "D")
        .select("id", "val", "ts", F.lit("N").alias("is_deleted")),
        "replication_audit",
    )
    delta = persist_tracked(
        latest_per_key(post, ["id"], order_cols=[F.col("ts").desc()])
        .select(
            "id",
            "val",
            "ts",
            F.when(F.col("op") == "D", F.lit("Y")).otherwise(F.lit("N")).alias(
                "is_deleted"
            ),
        ),
        "replication_audit",
    )
    merged = persist_tracked(
        merge_soft_delete(target0, delta, pk=["id"]).df, "replication_audit"
    )
    replica_live = persist_tracked(
        merged.filter(F.col("is_deleted") == "N").select("id", "val"),
        "replication_audit",
    )
    source_live = (
        latest_per_key(feed, ["id"], order_cols=[F.col("ts").desc()])
        .filter(F.col("op") != "D")
        .select("id", "val")
    )
    ck = table_checksum_diff(
        source_live, replica_live, keys=["id"], digest_cols=["val"],
        n_buckets=RA_BUCKETS,
    )

    def count_metric(section: str, metric: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("value")).select(
            F.lit(section).alias("section"), F.lit(metric).alias("metric"), "value"
        )

    ck_metrics = ck.agg(
        F.count(F.lit(1)).alias("b"),
        F.coalesce(F.sum("digests_match"), F.lit(0)).alias("m"),
        F.coalesce(F.sum("n_source"), F.lit(0)).alias("s"),
        F.coalesce(F.sum("n_target"), F.lit(0)).alias("t"),
    ).select(
        F.lit("checksum").alias("section"),
        F.expr(
            "stack(4, 'n_buckets', CAST(b AS BIGINT),"
            " 'n_buckets_match', CAST(m AS BIGINT),"
            " 'n_source_rows', CAST(s AS BIGINT),"
            " 'n_replica_rows', CAST(t AS BIGINT)) AS (metric, value)"
        ),
    )
    dim = feed.select("id").where(F.col("id") % RA_DIM_MOD != 0).distinct()
    fk_join = (
        replica_live.groupBy(F.col("id").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .join(dim.select(F.col("id").alias("k")).withColumn("_p", F.lit(1)), "k", "full_outer")
    )
    fk_metrics = fk_join.agg(
        F.coalesce(F.sum(F.when(F.col("n_rows").isNotNull(), 1)), F.lit(0)).alias("c"),
        F.coalesce(
            F.sum(F.when(F.col("n_rows").isNotNull() & F.col("_p").isNotNull(), 1)),
            F.lit(0),
        ).alias("m"),
        F.coalesce(F.sum(F.when(F.col("_p").isNull(), 1)), F.lit(0)).alias("o"),
        F.coalesce(F.sum(F.when(F.col("n_rows").isNull(), 1)), F.lit(0)).alias("p"),
    ).select(
        F.lit("fk").alias("section"),
        F.expr(
            "stack(4, 'n_child_keys', CAST(c AS BIGINT),"
            " 'n_matched_keys', CAST(m AS BIGINT),"
            " 'n_orphan_keys', CAST(o AS BIGINT),"
            " 'n_childless_parents', CAST(p AS BIGINT)) AS (metric, value)"
        ),
    )
    return (
        count_metric("merge", "n_target_rows", target0)
        .unionByName(count_metric("merge", "n_delta_keys", delta))
        .unionByName(count_metric("merge", "n_merged_rows", merged))
        .unionByName(count_metric("merge", "n_replica_live", replica_live))
        .unionByName(ck_metrics)
        .unionByName(fk_metrics)
    )


_RA_ID_LP = _lp("CAST(id AS VARCHAR)")
_RA_ROW_LP = ", ".join(_lp(e) for e in ["CAST(id AS VARCHAR)", "val"])

SQL_REPLICATION_AUDIT = f"""
WITH g AS (SELECT unnest(generate_series(0, {RA_N_ROWS - 1})) AS i),
feed AS (
  SELECT CASE WHEN instr('0123456789abcdef',
                         substring(md5(CAST(i AS VARCHAR)), 1, 1)) - 1 < 8 THEN 'I'
              WHEN instr('0123456789abcdef',
                         substring(md5(CAST(i AS VARCHAR)), 1, 1)) - 1 < 14 THEN 'U'
              ELSE 'D' END AS op,
         CAST(i % {RA_N_KEYS} AS BIGINT) AS id,
         substring(md5(CAST(i AS VARCHAR)), 1, 8) AS val,
         TIMESTAMP '2024-01-01' + i * INTERVAL 1 SECOND AS ts
  FROM g
),
pre AS (SELECT * FROM feed WHERE ts < TIMESTAMP '{RA_SPLIT}'),
post AS (SELECT * FROM feed
         WHERE ts >= TIMESTAMP '{RA_SPLIT}' AND id % {RA_STUCK_MOD} <> 0),
target0 AS (
  SELECT id, val FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY ts DESC) AS rn FROM pre
  ) WHERE rn = 1 AND op <> 'D'
),
delta AS (
  SELECT id, val, CASE WHEN op = 'D' THEN 'Y' ELSE 'N' END AS is_deleted FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY ts DESC) AS rn FROM post
  ) WHERE rn = 1
),
merged AS (
  SELECT coalesce(d.id, t.id) AS id,
         CASE WHEN d.id IS NOT NULL THEN d.val ELSE t.val END AS val,
         CASE WHEN d.id IS NOT NULL THEN d.is_deleted ELSE 'N' END AS is_deleted
  FROM target0 t FULL OUTER JOIN delta d ON t.id = d.id
  WHERE t.id IS NOT NULL OR d.is_deleted = 'N'
),
replica_live AS (SELECT id, val FROM merged WHERE is_deleted = 'N'),
source_live AS (
  SELECT id, val FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY ts DESC) AS rn FROM feed
  ) WHERE rn = 1 AND op <> 'D'
),
sd AS (
  SELECT CAST(('0x' || substr(md5({_RA_ID_LP}), 1, 4)) AS BIGINT)
           % {RA_BUCKETS} AS bucket,
         count(*) AS n_rows,
         sum(CAST(CAST(('0x' || substr(md5(concat_ws('|',
               {_RA_ROW_LP})), 1, 13)) AS BIGINT) AS HUGEINT)) AS digest
  FROM source_live GROUP BY 1
),
td AS (
  SELECT CAST(('0x' || substr(md5({_RA_ID_LP}), 1, 4)) AS BIGINT)
           % {RA_BUCKETS} AS bucket,
         count(*) AS n_rows,
         sum(CAST(CAST(('0x' || substr(md5(concat_ws('|',
               {_RA_ROW_LP})), 1, 13)) AS BIGINT) AS HUGEINT)) AS digest
  FROM replica_live GROUP BY 1
),
ck AS (
  SELECT coalesce(sd.n_rows, 0) AS n_source,
         coalesce(td.n_rows, 0) AS n_target,
         CASE WHEN sd.digest IS NOT NULL AND td.digest IS NOT NULL
                   AND sd.digest = td.digest AND sd.n_rows = td.n_rows
              THEN 1 ELSE 0 END AS digests_match
  FROM sd FULL OUTER JOIN td ON sd.bucket = td.bucket
),
dim AS (SELECT DISTINCT id FROM feed WHERE id % {RA_DIM_MOD} <> 0),
fkj AS (
  SELECT c.n_rows, p.k AS pk FROM
    (SELECT id AS k, count(*) AS n_rows FROM replica_live GROUP BY 1) c
    FULL OUTER JOIN (SELECT id AS k FROM dim) p ON c.k = p.k
)
SELECT 'merge' AS section, 'n_target_rows' AS metric,
       CAST((SELECT count(*) FROM target0) AS BIGINT) AS value
UNION ALL SELECT 'merge', 'n_delta_keys',
       CAST((SELECT count(*) FROM delta) AS BIGINT)
UNION ALL SELECT 'merge', 'n_merged_rows',
       CAST((SELECT count(*) FROM merged) AS BIGINT)
UNION ALL SELECT 'merge', 'n_replica_live',
       CAST((SELECT count(*) FROM replica_live) AS BIGINT)
UNION ALL SELECT 'checksum', 'n_buckets',
       CAST((SELECT count(*) FROM ck) AS BIGINT)
UNION ALL SELECT 'checksum', 'n_buckets_match',
       CAST((SELECT coalesce(sum(digests_match), 0) FROM ck) AS BIGINT)
UNION ALL SELECT 'checksum', 'n_source_rows',
       CAST((SELECT coalesce(sum(n_source), 0) FROM ck) AS BIGINT)
UNION ALL SELECT 'checksum', 'n_replica_rows',
       CAST((SELECT coalesce(sum(n_target), 0) FROM ck) AS BIGINT)
UNION ALL SELECT 'fk', 'n_child_keys',
       CAST((SELECT coalesce(sum(CASE WHEN n_rows IS NOT NULL THEN 1 END), 0)
             FROM fkj) AS BIGINT)
UNION ALL SELECT 'fk', 'n_matched_keys',
       CAST((SELECT coalesce(sum(CASE WHEN n_rows IS NOT NULL
                                       AND pk IS NOT NULL THEN 1 END), 0)
             FROM fkj) AS BIGINT)
UNION ALL SELECT 'fk', 'n_orphan_keys',
       CAST((SELECT coalesce(sum(CASE WHEN pk IS NULL THEN 1 END), 0)
             FROM fkj) AS BIGINT)
UNION ALL SELECT 'fk', 'n_childless_parents',
       CAST((SELECT coalesce(sum(CASE WHEN n_rows IS NULL THEN 1 END), 0)
             FROM fkj) AS BIGINT)
"""

QUERIES["replication_audit"] = q_replication_audit
ORACLE_SQL["replication_audit"] = SQL_REPLICATION_AUDIT
