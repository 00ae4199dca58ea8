"""As-of (time-travel) join — an operator Spark lacks natively
(SURVEY.md §2.3 "absent in reference"; engine adds it per the
custom-operator policy: composition of built-in ops first).

``asof_join(left, right, on, ts)``: for each left row, the single
right row with the greatest ``right.ts <= left.ts`` within the same
``on`` key — the standard point-in-time lookup (latest price before a
trade, last purchase before a click).

Implementation: the union-tag window trick, NOT a per-group
``pd.merge_asof``: union both sides ordered by (key, ts, side-order),
then ``last(right_value, ignoreNulls)`` over an unbounded-preceding
window carries the most recent right row forward onto each left row.

Scale properties vs the alternatives:
- one shuffle on the key (window partition) — same cost class as a
  plain equi-join; no range explosion;
- no Python boundary (pure window expressions, unlike an
  ``applyInPandas`` merge_asof which pays Arrow transfer + per-group
  pandas);
- skew behaves like any window partition (salt the hot key upstream if
  a single key dominates).

Ties: a right row with ``ts`` equal to the left row's ``ts`` matches
(<=), implemented by sorting right rows before left rows at equal
timestamps — the same semantics as DuckDB/QuestDB ASOF JOIN and
``pd.merge_asof`` defaults. Exactly one right row is carried per left
row always; if MULTIPLE right rows share the same (key, ts), pass
``tie`` (a never-null right column, e.g. the event id) and the row
with the GREATEST tie value wins deterministically; without ``tie``
the winner is unspecified — pre-dedup the right side (e.g.
``latest_per_key``) when that matters.

NULL keys: SQL join equality — a NULL ``on`` key matches nothing.
(The window-partition implementation would otherwise group NULL-key
rows together and "match" them to each other, which no join does;
eventstorm fuzz find, round 8.) NULL-key left rows are dropped under
``inner=True`` and carried with NULL fills under ``inner=False``,
exactly like an equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    inner: bool = True,
    tie: str | None = None,
) -> DataFrame:
    """Join each left row to the latest right row at or before its
    timestamp, per key.

    ``right_cols``: right columns to carry (default: all except key).
    ``inner=False`` keeps left rows with no prior right row (NULLs).
    ``tie``: never-null right column breaking (key, ts) ties — the
    greatest value wins (see module docstring).
    """
    right_cols = right_cols or [c for c in right.columns if c != on]
    carried = [c for c in right_cols if c != ts]
    reserved = {"__side__", "__r__", "__tie__"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"asof_join reserves column names {sorted(reserved)}; "
            f"rename {sorted(clash)} in the input frames"
        )
    lhs = left.withColumn("__side__", F.lit(1))
    # Pack the WHOLE right row into one struct and carry that: filling
    # each column independently would tear rows apart when a carried
    # column is NULL (last(ignorenulls) per column can mix values from
    # different right rows — e.g. the newest row's ts with an older
    # row's value). A NULL field inside a non-NULL struct is preserved.
    # NULL keys match nothing (join equality): filtered from the right
    # side here; NULL-key left rows land in the NULL window partition
    # alone, get no fill, and behave like unmatched join rows.
    # NULL-ts right rows likewise match nothing: "right.ts <= left.ts"
    # is unknowable, and a NULL ts sorts NULLS FIRST in the window, so
    # without the filter its payload would be carried onto left rows
    # that precede any real right row under inner=False (ADVICE r8).
    rhs = right.filter(F.col(on).isNotNull() & F.col(ts).isNotNull()).select(
        on,
        F.col(ts).alias(ts),
        F.struct(F.col(ts).alias(ts), *[F.col(c) for c in carried]).alias("__r__"),
        *( [F.col(tie).alias("__tie__")] if tie else [] ),
    ).withColumn("__side__", F.lit(0))

    unioned = lhs.unionByName(
        rhs.select(on, ts, "__side__", "__r__", *(["__tie__"] if tie else [])),
        allowMissingColumns=True,
    )

    # right rows sort before left rows at equal ts → <= match semantics;
    # among right rows tied on (key, ts) the greatest __tie__ sorts
    # last, so last() picks it (left rows' NULL __tie__ is irrelevant:
    # __side__ already orders them after every right row at that ts)
    order = [F.col(ts), F.col("__side__")] + (
        [F.col("__tie__").asc_nulls_first()] if tie else []
    )
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn("__r__", F.last(F.col("__r__"), ignorenulls=True).over(w))

    out = filled.filter(F.col("__side__") == 1).drop("__side__", "__tie__")
    out = out.withColumn(f"{ts}{suffix}", F.col(f"__r__.{ts}"))
    for c in carried:
        out = out.withColumn(f"{c}{suffix}", F.col(f"__r__.{c}"))
    out = out.drop("__r__")
    if inner:
        out = out.filter(F.col(f"{ts}{suffix}").isNotNull())
    return out
