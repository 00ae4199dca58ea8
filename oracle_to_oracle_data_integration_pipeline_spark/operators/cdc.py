"""CDC kernel: change-time derivation, delta predicates, latest-per-key
dedup, and the soft-delete upsert merge.

This re-expresses the reference pipeline's data plane as Spark algebra:

- ``change_ts_col`` — the synthetic event-time expression
  ``GREATEST(COALESCE(UPDATED_AT, CREATED_AT), CREATED_AT)``
  (`/root/reference/scripts/03_cdc_etl.py:284-289`).
- ``delta_predicate`` — the incremental filter, rewritten onto *base*
  columns so it pushes down to parquet row-group stats / JDBC
  (the reference filters on the derived column after a full read,
  `/root/reference/scripts/03_cdc_etl.py:291-294` — see SURVEY.md §4).
- ``latest_per_key`` — window dedup picking the newest version per PK.
  The reference never needs this because it processes one batch per run
  and lets Oracle MERGE see at most one row per key; a real engine must
  collapse multi-change batches first (SURVEY.md §7 risk 4).
- ``merge_soft_delete`` — the Oracle MERGE
  (`/root/reference/scripts/03_cdc_etl.py:129-172`) as a single
  full-outer join: matched rows take ALL delta non-PK columns (including
  ``IS_DELETED``); unmatched delta rows insert only when
  ``IS_DELETED='N'`` — a soft-delete for a never-replicated key is
  dropped silently, exactly as the reference's insert gate does
  (`/root/reference/scripts/03_cdc_etl.py:152-156`; pinned behavior).

Scale notes (100 TB): the merge is ONE shuffle on the PK — both sides
hash-partition on ``pk`` and AQE converts to broadcast when the delta is
small (the common CDC case) or splits skewed partitions. Attribution
counts are computed from the same joined plan rather than the
reference's before/after ``COUNT(*)`` arithmetic
(`/root/reference/scripts/03_cdc_etl.py:168-169`), which double-counts
dropped soft-deletes as updates (SURVEY.md §7 risk 2) and would cost two
extra full-table scans at scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

CREATED = "created_at"
UPDATED = "updated_at"
DELETED = "is_deleted"


def change_ts_col(created: str = CREATED, updated: str = UPDATED) -> Column:
    """``GREATEST(COALESCE(updated, created), created)`` — the
    reference's synthetic change time
    (`/root/reference/scripts/03_cdc_etl.py:284-289`)."""
    return F.greatest(F.coalesce(F.col(updated), F.col(created)), F.col(created))


def delta_predicate(last_ts, created: str = CREATED, updated: str = UPDATED,
                    inclusive: bool = False) -> Column | None:
    """Pushdown-safe incremental predicate.

    ``change_ts > last_ts`` is equivalent to
    ``created > last_ts OR updated > last_ts`` because
    ``change_ts = greatest(coalesce(u, c), c)`` equals ``c`` when ``u``
    is NULL and ``max(u, c)`` otherwise. Comparisons on base columns
    reach the parquet reader (row-group min/max pruning) and the JDBC
    pushed query, unlike the derived-column filter the reference applies
    after a full scan (`/root/reference/scripts/03_cdc_etl.py:282-294`).

    ``None`` (no watermark yet) means full load — first-run semantics
    per `/root/reference/scripts/03_cdc_etl.py:291-294`.

    Boundary semantics: the default strict ``>`` matches the reference
    exactly — which means a row that becomes VISIBLE late with
    ``change_ts`` equal to the committed watermark is never re-read
    (at-most-once at the boundary; the reference shares this hazard).
    ``inclusive=True`` uses ``>=`` so equal-timestamp late arrivals
    replay on the next run and the idempotent merge absorbs them —
    at the cost of re-reading the boundary rows every run (and the
    empty-delta short-circuit never firing while rows sit exactly at
    the watermark).
    """
    if last_ts is None:
        return None
    ts = F.lit(last_ts)
    if inclusive:
        return (F.col(created) >= ts) | (F.col(updated) >= ts)
    return (F.col(created) > ts) | (F.col(updated) > ts)


def delta_predicate_sql(last_ts, created: str = CREATED, updated: str = UPDATED) -> str | None:
    """Same predicate rendered as SQL for JDBC subquery pushdown."""
    if last_ts is None:
        return None
    lit = f"TIMESTAMP '{last_ts}'" if not str(last_ts).upper().startswith("TIMESTAMP") else str(last_ts)
    return f"({created} > {lit} OR {updated} > {lit})"


def with_change_ts(df: DataFrame, col_name: str = "__change_ts__",
                   created: str = CREATED, updated: str = UPDATED) -> DataFrame:
    return df.withColumn(col_name, change_ts_col(created, updated))


def latest_per_key(df: DataFrame, pk: list[str], order_cols: list[Column] | None = None,
                   created: str = CREATED, updated: str = UPDATED) -> DataFrame:
    """Keep only the newest version of each key.

    Default ordering: change time desc. Callers should add a
    deterministic tiebreak column when change times can collide.
    One shuffle on ``pk`` — the same partitioning the merge join needs,
    so Catalyst reuses the exchange when composed with
    ``merge_soft_delete``.
    """
    order = order_cols or [change_ts_col(created, updated).desc()]
    w = Window.partitionBy(*pk).orderBy(*order)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


@dataclass
class MergeStats:
    """Exact attribution, from the merge join itself (not table-count
    deltas — see module docstring)."""

    updated: int
    inserted: int
    dropped_deletes: int

    @property
    def staged(self) -> int:
        return self.updated + self.inserted + self.dropped_deletes


@dataclass
class MergeResult:
    df: DataFrame
    _stats_df: DataFrame  # one-row frame: u / i / x counts
    pk: list[str]
    _shared: DataFrame | None = None  # join subtree common to df and stats

    def stats(self) -> MergeStats:
        """One aggregate pass over the strategy's joined plan."""
        row = self._stats_df.collect()[0]
        return MergeStats(updated=row["u"] or 0, inserted=row["i"] or 0, dropped_deletes=row["x"] or 0)

    def persist_shared(self) -> "MergeResult":
        """Persist the join subtree that both ``df`` and ``stats()``
        consume, so running stats + writing the output executes the
        merge join ONCE instead of twice (at scale the join dominates;
        callers that need both actions should wrap them in
        persist_shared()/unpersist_shared())."""
        if self._shared is not None:
            self._shared.persist()
        return self

    def unpersist_shared(self) -> None:
        if self._shared is not None:
            self._shared.unpersist()


def _align_schemas(target: DataFrame, delta: DataFrame) -> tuple[DataFrame, DataFrame, list[str]]:
    """Schema evolution across runs (the reference handles DDL drift in
    a separate schema-sync pass; in-engine the merge absorbs it):

    - column added at the source → target gains it as NULL, existing
      rows keep NULL until a delta updates them;
    - column dropped at the source → delta gains it as NULL for schema
      alignment, but matched rows PRESERVE the target's value: the
      reference MERGE's SET list covers only staged columns
      (`/root/reference/scripts/03_cdc_etl.py:145-157`), so a column
      the delta doesn't carry is never overwritten. The merge
      strategies use the returned ``backfilled`` list to resolve those
      columns from the target side on matched rows.

    Output column order: target columns, then new delta columns in
    delta order. Returns (target, delta, backfilled-column-names).
    """
    t_cols = {c.lower(): c for c in target.columns}
    d_cols = {c.lower(): c for c in delta.columns}
    d_types = dict(zip([c.lower() for c in delta.columns], [f.dataType for f in delta.schema.fields]))
    t_types = dict(zip([c.lower() for c in target.columns], [f.dataType for f in target.schema.fields]))
    for lc, name in d_cols.items():
        if lc not in t_cols:
            target = target.withColumn(name, F.lit(None).cast(d_types[lc]))
    backfilled = []
    for lc, name in t_cols.items():
        if lc not in d_cols:
            delta = delta.withColumn(name, F.lit(None).cast(t_types[lc]))
            backfilled.append(name)
    # delta projected into the (evolved) target column order
    delta = delta.select(*target.columns)
    return target, delta, backfilled


def _merge_broadcast_delta(
    target: DataFrame, delta: DataFrame, pk: list[str], deleted_col: str,
    backfilled: list[str] | None = None,
) -> MergeResult:
    """No-target-shuffle merge: see ``merge_soft_delete`` docstring."""
    backfilled = backfilled or []
    out_cols = target.columns
    keys = delta.select(*pk)
    # target-side passes: broadcast the (small) delta keys
    untouched = target.join(F.broadcast(keys), pk, "left_anti")
    # matched keys also carry the target's values for columns the delta
    # does not stage (schema-drop case) — still ≤|delta| rows, so the
    # broadcast stays delta-sized
    matched_keys = target.join(F.broadcast(keys), pk, "left_semi").select(
        *pk, *[F.col(c).alias(f"__tb_{c}__") for c in backfilled]
    )
    # resolve delta rows against the (≤|delta|) matched-key set
    d_flagged = delta.join(
        F.broadcast(matched_keys.withColumn("__m__", F.lit(1))), pk, "left"
    )
    matched = F.col("__m__").isNotNull()
    kept = d_flagged.filter(
        matched | (F.col(deleted_col) == "N")
    ).select(
        [
            F.when(matched, F.col(f"__tb_{c}__")).otherwise(F.col(c)).alias(c)
            if c in backfilled
            else F.col(c)
            for c in out_cols
        ]
    )
    merged = untouched.select(*out_cols).unionByName(kept)
    stats_df = d_flagged.agg(
        F.sum(F.when(matched, 1).otherwise(0)).alias("u"),
        F.sum(F.when(~matched & (F.col(deleted_col) == "N"), 1).otherwise(0)).alias("i"),
        F.sum(F.when(~matched & (F.col(deleted_col) == "Y"), 1).otherwise(0)).alias("x"),
    )
    return MergeResult(df=merged, _stats_df=stats_df, pk=pk, _shared=d_flagged)


def merge_attribution(target: DataFrame, delta: DataFrame, pk: list[str],
                      deleted_col: str = DELETED) -> DataFrame:
    """One-row DataFrame of exact merge attribution counts
    (updated_count, inserted_count, dropped_count), computed from the
    merge join in a single pass — replaces the reference's before/after
    ``COUNT(*)`` arithmetic (`/root/reference/scripts/03_cdc_etl.py:122-127,168-169`)
    which costs two extra full scans and misattributes dropped
    soft-deletes as updates (SURVEY.md §7 risk 2)."""
    k = pk[0]
    t = target.select([F.col(c).alias(f"__t_{c}__") for c in target.columns])
    d = delta.select([F.col(c).alias(f"__d_{c}__") for c in delta.columns])
    cond = None
    for key in pk:
        clause = F.col(f"__t_{key}__") == F.col(f"__d_{key}__")
        cond = clause if cond is None else (cond & clause)
    joined = t.join(d, cond, "full_outer")
    t_present = F.col(f"__t_{k}__").isNotNull()
    d_present = F.col(f"__d_{k}__").isNotNull()
    return joined.agg(
        F.coalesce(F.sum(F.when(t_present & d_present, 1).otherwise(0)), F.lit(0)).alias("updated_count"),
        F.coalesce(
            F.sum(F.when(~t_present & (F.col(f"__d_{deleted_col}__") == "N"), 1).otherwise(0)), F.lit(0)
        ).alias("inserted_count"),
        F.coalesce(
            F.sum(F.when(~t_present & (F.col(f"__d_{deleted_col}__") == "Y"), 1).otherwise(0)), F.lit(0)
        ).alias("dropped_count"),
    )


def merge_soft_delete(
    target: DataFrame,
    delta: DataFrame,
    pk: list[str],
    deleted_col: str = DELETED,
    dedup_delta: bool = False,
    created: str = CREATED,
    updated: str = UPDATED,
    strategy: str = "shuffle",
) -> MergeResult:
    """Soft-delete upsert merge (reference MERGE parity).

    Semantics (pinned to `/root/reference/scripts/03_cdc_etl.py:145-157`):

    - MATCHED → row takes every delta column (SET list covers all
      non-PK columns *including* ``is_deleted``).
    - NOT MATCHED → insert only when ``delta.is_deleted = 'N'``;
      a soft-delete for a key the target never saw is dropped.
    - Target rows without a delta match pass through unchanged.

    Two physical strategies, identical results:

    - ``strategy="shuffle"`` (default): ONE full-outer join on ``pk``
      with per-column ``WHEN delta-matched THEN delta ELSE target``
      resolution, then the insert-gate filter. Both sides shuffle —
      right when target and delta are comparable sizes.
    - ``strategy="broadcast_delta"``: full-outer joins cannot
      broadcast, so the default shuffles the ENTIRE target every run —
      at 100 TB that dominates everything. When the delta is small
      (the steady-state CDC case) this strategy decomposes the merge
      into target-side anti/semi joins against the broadcast delta:
      the target is scanned but NEVER shuffled, and the surviving
      delta rows are resolved against the (tiny) matched-key set.
      Cost: ~2 target scans, 0 target shuffles vs 1 scan + 1 full
      shuffle — scans are far cheaper than a cluster-wide shuffle of
      the same bytes.

    ``dedup_delta=True`` collapses multi-change batches via
    ``latest_per_key`` first. Column order of the output = target
    column order.
    """
    if not pk:
        raise ValueError("merge requires a non-empty primary key")
    if strategy not in ("shuffle", "broadcast_delta"):
        raise ValueError(f"unknown merge strategy: {strategy}")
    if dedup_delta:
        delta = latest_per_key(delta, pk, created=created, updated=updated)
    target, delta, backfilled = _align_schemas(target, delta)
    if strategy == "broadcast_delta":
        return _merge_broadcast_delta(target, delta, pk, deleted_col, backfilled)

    out_cols = target.columns
    # Tag both sides so the joined plan keeps unambiguous references.
    t = target.select([F.col(c).alias(f"__t_{c}__") for c in target.columns])
    d = delta.select([F.col(c).alias(f"__d_{c}__") for c in delta.columns])
    cond = None
    for k in pk:
        clause = F.col(f"__t_{k}__") == F.col(f"__d_{k}__")
        cond = clause if cond is None else (cond & clause)
    joined = t.join(d, cond, "full_outer")

    d_present = F.col(f"__d_{pk[0]}__").isNotNull()
    t_present = F.col(f"__t_{pk[0]}__").isNotNull()
    resolved = joined.filter(
        t_present | (F.col(f"__d_{deleted_col}__") == "N")  # insert gate
    ).select(
        [
            # backfilled = column the delta doesn't stage: matched rows
            # keep the target value (reference MERGE SET-list scope)
            F.when(t_present, F.col(f"__t_{c}__")).otherwise(F.col(f"__d_{c}__")).alias(c)
            if c in backfilled
            else F.when(d_present, F.col(f"__d_{c}__")).otherwise(F.col(f"__t_{c}__")).alias(c)
            for c in out_cols
        ]
    )
    stats_df = joined.agg(
        F.sum(F.when(d_present & t_present, 1).otherwise(0)).alias("u"),
        F.sum(
            F.when(d_present & ~t_present & (F.col(f"__d_{deleted_col}__") == "N"), 1).otherwise(0)
        ).alias("i"),
        F.sum(
            F.when(d_present & ~t_present & (F.col(f"__d_{deleted_col}__") == "Y"), 1).otherwise(0)
        ).alias("x"),
    )
    return MergeResult(df=resolved, _stats_df=stats_df, pk=pk, _shared=joined)
