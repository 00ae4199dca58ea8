"""Property test: operators/asof.asof_join equals a pure-Python
reference on random frames that include the full hostile shape space —
NULL keys, duplicate (key, ts) ties on both sides, no-prior rows —
so the round-8 semantics (NULL keys never match, greatest tie wins)
are pinned by construction, not just by the hand cases in
tests/test_asof.py and the eventstorm fuzz profile.

The reference is deliberately naive O(L×R): for each left row, the
eligible right rows share a NON-NULL key and have ts <= left.ts; the
match is the max ts, ties resolved by the greatest tie column.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracle_to_oracle_data_integration_pipeline_spark.operators.asof import asof_join


def _ts(sec: int | None) -> dt.datetime | None:
    if sec is None:
        return None
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


# keys drawn from a tiny pool (forces collisions and NULLs), ts from a
# tiny grid (forces <=-boundary hits and exact ties) plus NULL: a NULL
# ts on either side is an unknowable <= comparison and matches nothing
# (round-9 hardening — ADVICE r8 asof NULL-ts carry)
_key = st.one_of(st.none(), st.integers(min_value=0, max_value=2))
_sec = st.one_of(st.none(), st.integers(min_value=0, max_value=5))
_val = st.one_of(st.none(), st.integers(min_value=0, max_value=9).map(float))

left_st = st.lists(st.tuples(_key, _sec), min_size=1, max_size=12)
right_st = st.lists(st.tuples(_key, _sec, _val), min_size=0, max_size=12)


def _reference(left, right, inner):
    out = {}
    for lid, (lk, lsec) in enumerate(left):
        best = None  # (ts, tie, value)
        if lk is not None and lsec is not None:
            for rid, (rk, rsec, rv) in enumerate(right):
                if rk == lk and rsec is not None and rsec <= lsec:
                    cand = (rsec, rid, rv)
                    if best is None or cand[:2] > best[:2]:
                        best = cand
        if best is not None:
            out[lid] = (_ts(best[0]), best[2])
        elif not inner:
            out[lid] = (None, None)
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=left_st, right=right_st, inner=st.booleans())
def test_asof_join_equals_naive_reference(spark, left, right, inner):
    ldf = spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s) in enumerate(left)],
        "event_id long, user_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(i, k, _ts(s), v) for i, (k, s, v) in enumerate(right)],
        "rid long, user_id long, ts timestamp, value double",
    )
    got = {
        r["event_id"]: (r["ts_asof"], r["value_asof"])
        for r in asof_join(
            ldf, rdf, on="user_id", ts="ts",
            right_cols=["ts", "value"], tie="rid", inner=inner,
        ).collect()
    }
    assert got == _reference(left, right, inner)
