"""Property tests for the round-7 plan rewrites: each rewrite claims
result-equality with the shape it replaced, argued in a docstring —
these tests make the argument executable on arbitrary inputs, with
small value domains chosen to force the risky cases (heavy ties,
single-row groups, nations missing from one side).

1. weighted_median: the (flag, cents) HISTOGRAM cumulative form must
   equal the row-level cumulative form for any weights/prices. The
   docstring's argument: histogram cum at a cents value == row cum at
   that group's LAST row, and min(cents) over qualifying rows only
   ever selects group boundaries. Both forms run on the REAL engine
   (windows, ties, frame semantics included), not a model.

2. quantile_normalize: the (nation, idx) equi-join probe must select
   exactly the pairs the original join-then-filter form selected —
   the index formula is injective per customer, so precomputing it
   cannot change the match set. Pure arithmetic, modeled directly.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

rows_st = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),          # flag: 3 values
        st.integers(min_value=0, max_value=12),     # cents: tiny → ties
        st.integers(min_value=1, max_value=5),      # weight
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_st)
def test_weighted_median_histogram_equals_row_form(spark, rows):
    df = spark.createDataFrame(
        [(f, c, w, i) for i, (f, c, w) in enumerate(rows)],
        "flag string, cents long, w long, rid long",
    )

    def lower_weighted_median(cum):
        qual = cum.filter(F.lit(2) * F.col("cum_w") >= F.col("tot_w"))
        return {
            r["flag"]: (r["m"], r["t"])
            for r in qual.groupBy("flag")
            .agg(F.min("cents").alias("m"), F.max("tot_w").alias("t"))
            .collect()
        }

    # row-level form (what round 6 shipped): cum over the row total order
    wrow = (
        Window.partitionBy("flag")
        .orderBy("cents", "rid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("flag")
    row_form = lower_weighted_median(
        df.select(
            "flag",
            "cents",
            F.sum("w").over(wrow).alias("cum_w"),
            F.sum("w").over(wtot).alias("tot_w"),
        )
    )

    # histogram form (round 7): fold weight per (flag, cents) first
    hist = df.groupBy("flag", "cents").agg(F.sum("w").alias("hw"))
    whist = (
        Window.partitionBy("flag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hist_form = lower_weighted_median(
        hist.select(
            "flag",
            "cents",
            F.sum("hw").over(whist).alias("cum_w"),
            F.sum("hw").over(Window.partitionBy("flag")).alias("tot_w"),
        )
    )

    assert row_form == hist_form, (rows, row_form, hist_form)


def _target_idx(rn, n, m):
    """The qid's exact lower-interpolation index (1-based)."""
    return 1 if n == 1 else ((rn - 1) * (m - 1)) // (n - 1) + 1


side_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # nation: 4 values
        st.integers(min_value=-5, max_value=5),     # cents (ties likely)
    ),
    min_size=0,
    max_size=25,
)


@settings(max_examples=200, deadline=None)
@given(customers=side_st, suppliers=side_st)
def test_quantile_index_join_equals_pair_filter_form(customers, suppliers):
    # rank both sides exactly as the qid does: (cents, unique id)
    def ranked(side):
        out = {}
        for nation in {n for n, _ in side}:
            vals = sorted(
                (c, i) for i, (n, c) in enumerate(side) if n == nation
            )
            out[nation] = [(rn + 1, c, i) for rn, (c, i) in enumerate(vals)]
        return out

    rc, rs = ranked(customers), ranked(suppliers)

    # original form: nation join, then filter ref_rn == idx over ALL pairs
    naive = set()
    for nation in set(rc) & set(rs):
        n, m = len(rc[nation]), len(rs[nation])
        for rn, c_cents, cid in rc[nation]:
            for ref_rn, s_cents, sid in rs[nation]:
                if ref_rn == _target_idx(rn, n, m):
                    naive.add((cid, nation, c_cents, s_cents))

    # round-7 form: idx computed per customer, then keyed lookup
    indexed = set()
    for nation in set(rc) & set(rs):
        n, m = len(rc[nation]), len(rs[nation])
        by_rn = {rn: cents for rn, cents, _ in rs[nation]}
        for rn, c_cents, cid in rc[nation]:
            idx = _target_idx(rn, n, m)
            if idx in by_rn:
                indexed.add((cid, nation, c_cents, by_rn[idx]))

    assert naive == indexed
    # every customer in a supplier-bearing nation maps to exactly one row
    expected = sum(len(rc[nt]) for nt in set(rc) & set(rs))
    assert len(indexed) == expected
