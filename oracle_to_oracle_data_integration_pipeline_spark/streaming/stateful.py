"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9/§2.10: arbitrary state beyond built-in windows).

``running_totals``: per-key cumulative count/sum maintained across
micro-batches — the minimal "custom accumulator" shape (the same
skeleton carries per-user ML feature state, rate limiting, CDC
conflict counters...). Output one row per key per batch with the
running values.

Scale notes: state lives in the state store keyed by the group —
bounded by key cardinality, not stream length. The pandas function
receives Arrow batches per key; the timeout conf (unused here) is how
production jobs expire idle keys to bound the store.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update(key, pdfs: Iterator, state: GroupState):
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def running_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame (user_id, ts, value, ...) → per-key running
    totals, one output row per key per micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- decimal-exact variant (cross-engine checkable) -------------------

EXACT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("micros", T.LongType()),
    ]
)


def _micros_of(values) -> int:
    """Sum a pandas value column as integer micro-units via decimal
    HALF_UP quantization — the same rounding Spark/DuckDB apply when
    casting a double to DECIMAL(24,6), so the accumulated state is
    exact and ORDER-INDEPENDENT. NULL measurements are skipped (SQL
    sum semantics) — a NaN reaching Decimal() crashed the executor
    before (fuzz find, tools/fuzz_parity.py nulls profile)."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal("0.000001")
    return sum(
        int(Decimal(float(v)).quantize(q, rounding=ROUND_HALF_UP) * 1_000_000)
        for v in values.dropna()
    )


def _total_of(micros: int) -> float:
    """Final rounding in the decimal domain too: python round() is
    half-even, the engines' decimal round is HALF_UP — micros ending
    in exactly 5000 would diverge."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        (Decimal(micros) / 1_000_000).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    )


def _update_exact(key, pdfs: Iterator, state: GroupState):
    """Accumulates via the shared decimal-exact fold (_micros_of), so
    any micro-batch split of the stream yields bit-identical totals
    (the property the stream_stateful qid's differential oracle
    checks). NULLs count in n_events (count(*) semantics) but not the
    sum."""
    import pandas as pd

    n, micros = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        micros += _micros_of(pdf["value"])
    state.update((n, micros))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [_total_of(micros)]}
    )


def running_totals_exact(events: DataFrame) -> DataFrame:
    """``running_totals`` with the decimal-exact accumulator — emits
    (user_id, n_events, total_value rounded to 2) per key per batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_exact,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=EXACT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_exact_batch(events: DataFrame) -> DataFrame:
    """BATCH TWIN of :func:`running_totals_exact` — the identical
    decimal-exact fold (_micros_of / _total_of) applied to each user's
    complete history in one grouped-map ``applyInPandas`` pass. The
    accumulator is order-independent, so this equals the streamed
    final state under ANY micro-batch split (fidelity pinned by
    tests/test_stream_batch_twins.py). It exists so the scale audits
    can probe a batch plan with the SAME grouped-python shape and the
    SAME state key (user_id) as the unprobeable executed micro-batch
    plan."""

    def _fold(pdf):
        import pandas as pd

        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "total_value": [_total_of(_micros_of(pdf["value"]))],
            }
        )

    return events.groupBy("user_id").applyInPandas(
        _fold, OUTPUT_SCHEMA
    )


# -- order-sensitive recursive state: streaming EWMA ------------------

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_points", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("s", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def _ewma_fold_batch(chunks, s, n, a):
    """Fold one micro-batch's rows for one key into EWMA state
    (s, n): concatenate ALL Arrow chunks, sort by (ts, event_id)
    across the whole batch slice, then run the pandas ewm(adjust=
    False) recursion — the prior state rides as a prepended seed row,
    which continues s' = a·x + (1−a)·s exactly (same IEEE op sequence
    as operators/timeseries.ewma; divisor (1−a)+a == 1.0). Split out
    of the applyInPandasWithState closure so chunk-order behavior is
    unit-testable driver-side."""
    import pandas as pd

    if not chunks:
        return s, n
    pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
    vals = pdf["value"].dropna().astype("float64")
    if vals.empty:
        return s, n
    if n:
        series = pd.concat([pd.Series([s]), vals], ignore_index=True)
    else:
        series = vals.reset_index(drop=True)
    out = float(series.ewm(alpha=a, adjust=False).mean().iloc[-1])
    return out, n + int(len(vals))


def ewma_state(events: DataFrame, alpha: float = 0.2) -> DataFrame:
    """Streaming per-key EWMA — the ORDER-SENSITIVE recursion
    (s₀ = x₀; sₜ = α·xₜ + (1−α)·sₜ₋₁) carried across micro-batches in
    the state store: one double + one long per key, bounded by key
    cardinality regardless of stream length. This is the case
    ``applyInPandasWithState`` exists for — the batch twin
    (operators/timeseries.ewma) must re-read a key's whole history,
    the streaming form folds each new batch into O(1) state.

    Contract: micro-batches must arrive in event-time order per key
    (the qid harness splits the fixture into ts-range files consumed
    oldest-first); rows WITHIN a batch are concatenated across every
    Arrow chunk and sorted by (ts, event_id) ONCE before folding — a
    key whose batch slice spans multiple Arrow chunks (>
    arrow.maxRecordsPerBatch rows) arrives as several frames in
    shuffle order, so a per-chunk sort would fold across chunks out
    of order and silently corrupt the recursion. Late data that
    violates the cross-BATCH contract still corrupts it — reorder
    upstream (watermark + sort in foreachBatch) or fall back to the
    batch operator. The fold is the same fixed IEEE double op
    sequence as the batch kernel, so a correctly-ordered stream
    reproduces the batch EWMA bit-for-bit (the stream_ewma qid's
    oracle is the batch list_reduce SQL, exact-hash-compared).
    """
    a = float(alpha)

    def update(key, pdfs: Iterator, state: GroupState):
        import pandas as pd

        s, n = state.get if state.exists else (None, 0)
        s, n = _ewma_fold_batch(list(pdfs), s, n, a)
        if n:
            state.update((s, n))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_points": [n], "ewma": [s]}
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_batch_twin(events: DataFrame, alpha: float = 0.2) -> DataFrame:
    """BATCH TWIN of :func:`ewma_state` — the identical fold
    (_ewma_fold_batch, seedless) applied to each user's complete
    history in one grouped-map ``applyInPandas`` pass. The stream
    continues the recursion across event-time-ordered micro-batches by
    seeding each fold with the prior state; folding the whole ordered
    history once runs the same IEEE op sequence, so the results are
    bit-identical (fidelity pinned by tests/test_stream_batch_twins.py).
    Same grouped-python shape and state key (user_id) as the executed
    micro-batch plan, so the scale audits can probe this plan as its
    stand-in. A user whose every measurement is NULL emits nothing on
    both sides."""
    a = float(alpha)

    def _fold(pdf):
        import pandas as pd

        s, n = _ewma_fold_batch([pdf], None, 0, a)
        if not n:
            return pd.DataFrame({"user_id": [], "n_points": [], "ewma": []})
        return pd.DataFrame(
            {"user_id": [pdf["user_id"].iloc[0]], "n_points": [n], "ewma": [s]}
        )

    return events.groupBy("user_id").applyInPandas(_fold, EWMA_OUTPUT_SCHEMA)
