"""Source/target reconciliation — the validation half of a CDC
replication pipeline. The reference replicates Oracle→Oracle and trusts
MERGE row counts (`/root/reference/scripts/03_cdc_etl.py` merge +
run-report attribution); these operators are the audit that proves the
two sides actually converged, designed for the 100 TB case where
neither table fits anywhere whole:

- :func:`table_checksum_diff` — Merkle-style level-1 anti-entropy:
  each side reduces to ``n_buckets`` order-independent bucket digests
  (map-side combinable; ONE tiny shuffle of |buckets| rows per side),
  and only the digests are joined. At 100 TB the comparison ships
  ~64 rows per side across the wire, never data.
- :func:`bucket_row_diff` — the drill-down pass: row-level diff
  restricted to the buckets the digest pass flagged, so the keyed
  full-outer join touches only the mismatched slice.
- :func:`resolve_op_conflicts` — same-timestamp conflict resolution
  inside a delta batch: one op survives per key, ordered by
  (ts DESC, op priority D>U>I, deterministic tiebreak). The reference
  keeps the latest ``last_updated`` only (scripts/03_cdc_etl.py
  MERGE); priority resolution covers the tie the reference leaves to
  Oracle's arbitrary MERGE order.
- :func:`schema_diff` — column-level diff between two DataFrames'
  schemas (driver-side metadata, no data pass): the decision input of
  the reference's CDC-column preparation step
  (`/root/reference/scripts/01_prepare_cdc_columns:20-38`, which adds
  missing audit columns) generalized to add/drop/type-change.

Everything hashes via md5 in canonical string form so digests are
engine-portable (the ``md5_frac52`` idiom, queries/_util.py) — a
DuckDB/Oracle/Spark trio computing the same bucket digest agrees bit
for bit, which is the whole point of an anti-entropy check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NULL_SENTINEL = "\x00null\x00"


def _row_digest(cols: list[str]) -> Column:
    """Portable per-row digest: md5 over '|'-joined LENGTH-PREFIXED
    canonical string forms (``len:value``). The length prefix makes
    part boundaries unambiguous — a bare '|' join would be
    delimiter-injectable: ('x|', 'y') and ('x', '|y') both concat to
    'x||y', so two genuinely different rows digest identically and
    their drift becomes invisible to the whole anti-entropy stack.
    NULLs map to an explicit sentinel (concat_ws would silently SKIP
    them, making ('a', NULL) collide with (NULL, 'a')). SQL twin per
    part: ``length(v) || ':' || v`` (char semantics in both
    engines)."""
    def canon(c: str) -> Column:
        s = F.col(c).cast("string")
        return F.coalesce(
            F.concat(F.length(s).cast("string"), F.lit(":"), s),
            F.lit(_NULL_SENTINEL),
        )

    return F.md5(F.concat_ws("|", *[canon(c) for c in cols]))


def _bucket_col(keys: list[str], n_buckets: int) -> Column:
    """Portable key→bucket map: first 4 hex chars of the key digest
    mod n_buckets (NOT Spark's hash() — the other side of the compare
    may not be Spark)."""
    key_digest = _row_digest(keys)
    return (
        F.conv(F.substring(key_digest, 1, 4), 16, 10).cast("int") % F.lit(n_buckets)
    )


def _bucket_digests(
    df: DataFrame, keys: list[str], digest_cols: list[str], n_buckets: int
) -> DataFrame:
    """One side's level-1 digest table: (bucket, n_rows, digest).
    The digest is an exact DECIMAL sum of each row digest's first 52
    bits — order-independent and associative, so partial aggregation
    (and any 100 TB combine tree) produces identical bits; 52 bits per
    row keeps a 2^63-row bucket inside DECIMAL(38,0)."""
    row52 = F.conv(F.substring(_row_digest(keys + digest_cols), 1, 13), 16, 10).cast(
        "decimal(38,0)"
    )
    return (
        df.select(
            _bucket_col(keys, n_buckets).alias("bucket"), row52.alias("_r52")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("_r52").alias("digest"),
        )
    )


def table_checksum_diff(
    source: DataFrame,
    target: DataFrame,
    keys: list[str],
    digest_cols: list[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Level-1 anti-entropy compare: per bucket, each side's row count
    and order-independent content digest, full-outer joined. Output
    (one row per bucket present on either side):
    (bucket, n_source, n_target, digests_match).

    ``digests_match = 1`` ⇒ the bucket's (key, digest_cols) multiset
    is identical on both sides up to the 52-bit digest (collision
    probability per bucket ≈ n²/2^53). Mismatched buckets feed
    :func:`bucket_row_diff` for row-level attribution.
    """
    s = _bucket_digests(source, keys, digest_cols, n_buckets)
    t = _bucket_digests(target, keys, digest_cols, n_buckets)
    j = s.alias("s").join(
        t.alias("t"), F.col("s.bucket") == F.col("t.bucket"), "full_outer"
    )
    return j.select(
        F.coalesce(F.col("s.bucket"), F.col("t.bucket")).alias("bucket"),
        F.coalesce(F.col("s.n_rows"), F.lit(0)).alias("n_source"),
        F.coalesce(F.col("t.n_rows"), F.lit(0)).alias("n_target"),
        (
            F.col("s.digest").isNotNull()
            & F.col("t.digest").isNotNull()
            & (F.col("s.digest") == F.col("t.digest"))
            & (F.col("s.n_rows") == F.col("t.n_rows"))
        )
        .cast("int")
        .alias("digests_match"),
    )


def bucket_row_diff(
    source: DataFrame,
    target: DataFrame,
    keys: list[str],
    digest_cols: list[str],
    buckets: list[int],
    n_buckets: int = 64,
) -> DataFrame:
    """Row-level drill-down over the flagged buckets only: keyed
    full-outer join of per-row digests, classifying each key as
    'source_only' | 'target_only' | 'changed' (matching rows are
    dropped — at scale the output is the drift, not the table).
    """
    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            *[F.col(k) for k in keys],
            _bucket_col(keys, n_buckets).alias("_bkt"),
            _row_digest(keys + digest_cols).alias(f"{tag}_digest"),
        ).where(F.col("_bkt").isin([int(b) for b in buckets]))

    s = side(source, "s").drop("_bkt")
    t = side(target, "t").drop("_bkt")
    j = s.join(t, keys, "full_outer")
    status = (
        F.when(F.col("t_digest").isNull(), F.lit("source_only"))
        .when(F.col("s_digest").isNull(), F.lit("target_only"))
        .when(F.col("s_digest") != F.col("t_digest"), F.lit("changed"))
    )
    return (
        j.select(*keys, status.alias("status"))
        .where(F.col("status").isNotNull())
    )


def checksum_drill(
    source: DataFrame,
    target: DataFrame,
    keys: list[str],
    digest_cols: list[str],
    n_buckets: int = 64,
    level1: DataFrame | None = None,
) -> DataFrame:
    """The composed two-level anti-entropy pass: level-1 digests flag
    drifted buckets, then :func:`bucket_row_diff` attributes rows in
    ONLY those buckets. Exactly one scan of each side per level: the
    level-1 result is consumed by exactly one action (the
    ≤ ``n_buckets``-row flagged-bucket collect) — no cache is needed
    because nothing ever evaluates it a second time. Callers that DO
    reuse a level-1 result elsewhere pass it pre-computed via
    ``level1`` and own its lifecycle (pass the SAME
    keys/digest_cols/n_buckets it was built with, the function cannot
    check).

    The ≤64-row collect is legitimate control plane: the flagged
    bucket ids become a literal IN-list predicate in the drill plan,
    which is what keeps the level-2 join restricted to the drifted
    slice (and, in the all-clean case, makes it a scan of nothing).
    """
    if level1 is None:
        level1 = table_checksum_diff(
            source, target, keys, digest_cols, n_buckets=n_buckets
        )
    flagged = [
        r["bucket"] for r in level1.where(F.col("digests_match") == 0).collect()
    ]
    return bucket_row_diff(
        source, target, keys, digest_cols, buckets=flagged, n_buckets=n_buckets
    )


def resolve_op_conflicts(
    delta: DataFrame,
    keys: list[str],
    ts_col: str = "op_ts",
    op_col: str = "op",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """One surviving operation per key from a multi-op delta batch:
    latest timestamp wins; at equal timestamps DELETE beats UPDATE
    beats INSERT (a delete racing an update at the same commit instant
    must not resurrect the row); any remaining tie falls to
    ``tiebreak`` (descending) so the winner is deterministic. Adds
    ``n_conflicts`` (total ops seen for the key). Keyed window — one
    hash shuffle on the key, the standard latest-per-key plan at any
    scale.

    Reference parity: scripts/03_cdc_etl.py's MERGE keeps only the
    max-``last_updated`` row and leaves equal-timestamp order to the
    database; this operator pins that semantics explicitly.
    """
    from pyspark.sql import Window

    pr = (
        F.when(F.col(op_col) == "D", 3)
        .when(F.col(op_col) == "U", 2)
        .otherwise(1)
    )
    order = [F.col(ts_col).desc(), pr.desc()] + [
        F.col(c).desc() for c in (tiebreak or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    wc = Window.partitionBy(*keys)
    return (
        delta.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_conflicts", F.count(F.lit(1)).over(wc))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def schema_diff(spark, source: DataFrame, target: DataFrame) -> DataFrame:
    """Column-level schema diff (driver-side metadata only — no data
    is read): for every column name on either side, its type on each
    and a status in {'add', 'drop', 'type_change', 'common'}. 'add'
    means the target lacks it (the reference's prepare-CDC-columns
    case: issue ALTER TABLE ADD), 'drop' means only the target has it.
    """
    def norm(dt: str) -> str:
        # Spark 4 reads parquet timestamps as TIMESTAMP_NTZ; the engine
        # pins UTC and treats them as instants, so the catalog surface
        # reports the logical type (same rule as catalog_columns)
        return "timestamp" if dt == "timestamp_ntz" else dt

    src = {c: norm(dt) for c, dt in source.dtypes}
    tgt = {c: norm(dt) for c, dt in target.dtypes}
    rows = []
    for c in sorted(set(src) | set(tgt)):
        s_t, t_t = src.get(c), tgt.get(c)
        status = (
            "add"
            if t_t is None
            else "drop"
            if s_t is None
            else "type_change"
            if s_t != t_t
            else "common"
        )
        rows.append((c, s_t, t_t, status))
    schema = T.StructType(
        [
            T.StructField("column_name", T.StringType()),
            T.StructField("source_type", T.StringType()),
            T.StructField("target_type", T.StringType()),
            T.StructField("status", T.StringType()),
        ]
    )
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import local_result

    return local_result(spark, rows, schema)


def offset_gap_audit(
    feed: DataFrame,
    seq_col: str,
    partition_col: str | None = None,
) -> DataFrame:
    """Change-feed sequence-integrity audit: given a feed whose rows
    carry a monotonically-assigned sequence number (Oracle SCN,
    Debezium LSN/offset, Kafka partition offset), report per partition
    — and for the feed as a whole via ROLLUP — whether the captured
    range is complete: n_events, n_null_seq (rows whose offset is
    NULL: unauditable, counted separately so they never masquerade as
    duplicates), n_distinct, seq_min, seq_max, the duplicate count
    (non-NULL events − n_distinct, replays/at-least-once redelivery)
    and the gap count (span − n_distinct, dropped or not-yet-arrived
    changes; NULL when the group has no auditable sequence at all).
    ``is_contiguous`` = no NULL offsets AND no dupes AND no gaps —
    the green light for advancing a watermark past seq_max. The
    ``is_total`` flag (GROUPING()) distinguishes the rollup total from
    a genuine NULL partition value — without it the two rows are
    indistinguishable to a consumer keying on the partition column.
    The reference trusts Oracle to hand it a complete delta
    (scripts/03_cdc_etl.py reads by last_updated > watermark); a
    log-based feed has no such guarantee, so completeness must be
    audited before the merge, not assumed.

    Scale: pure combinable aggregation — COUNT/MIN/MAX partially
    aggregate map-side and COUNT(DISTINCT seq) expands to a two-level
    exact distinct (key-grouped pre-dedup, then re-agg); no window, no
    join, nothing driver-side. The ROLLUP total row makes the audit
    one pass instead of per-partition + global twice.

    Output: part (partition value; NULL on the total row), is_total
    (1 = rollup total), n_events, n_null_seq, n_distinct, seq_min,
    seq_max, n_dupes, n_gaps, is_contiguous.
    """
    g = feed.select(
        (F.col(partition_col) if partition_col else F.lit(None)).alias("part"),
        F.col(seq_col).cast("bigint").alias("__seq__"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("__seq__").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_seq"),
        F.countDistinct("__seq__").alias("n_distinct"),
        F.min("__seq__").alias("seq_min"),
        F.max("__seq__").alias("seq_max"),
    ]
    if partition_col:
        # grouping() is only legal inside the agg list — it reads the
        # grouping-set bitmask the rollup emits per output row
        out = g.rollup("part").agg(
            F.grouping("part").cast("int").alias("is_total"), *aggs
        )
    else:
        out = (
            g.groupBy()
            .agg(*aggs)
            .select(F.lit(None).cast("string").alias("part"), "*")
            .withColumn("is_total", F.lit(1))
        )
    span = F.col("seq_max") - F.col("seq_min") + F.lit(1)
    return out.select(
        "part",
        "is_total",
        "n_events",
        "n_null_seq",
        "n_distinct",
        "seq_min",
        "seq_max",
        (F.col("n_events") - F.col("n_null_seq") - F.col("n_distinct"))
        .cast("bigint")
        .alias("n_dupes"),
        (span - F.col("n_distinct")).cast("bigint").alias("n_gaps"),
        (
            (F.col("n_null_seq") == 0)
            & (F.col("n_events") == F.col("n_distinct"))
            & (span == F.col("n_distinct"))
        ).alias("is_contiguous"),
    )
