"""Unit tests for tools/window_audit.py's plan matchers — the
tripwire's own logic needs pinning: a matcher regression would turn
the whole 290-qid sweep vacuous without any test noticing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.window_audit import (
    _spec_is_unpartitioned,
    unpartitioned_window_specs,
    unpartitioned_windows,
)

KEYED_LINE = (
    "Window [sum(x#1L) windowspecdefinition(user_id#2L, ts#3L ASC NULLS FIRST, "
    "specifiedwindowframe(RangeFrame, -86400, -1)) AS s#4L], [user_id#2L], [ts#3L ASC NULLS FIRST]"
)
GLOBAL_ORDERED_LINE = (
    "Window [ntile(8) windowspecdefinition(ts#3L ASC NULLS FIRST, "
    "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS b#5], "
    "[ts#3L ASC NULLS FIRST]"
)
GLOBAL_FRAME_LINE = (
    "Window [sum(x#1L) windowspecdefinition(specifiedwindowframe(RowFrame, "
    "unboundedpreceding$(), currentrow$())) AS s#4L]"
)


def test_spec_first_arg_classification():
    assert not _spec_is_unpartitioned("user_id#2L")
    assert _spec_is_unpartitioned("ts#3L ASC NULLS FIRST")
    assert _spec_is_unpartitioned("specifiedwindowframe(RowFrame")


def test_line_matcher_on_explain_format():
    plan = "\n".join(["+- " + KEYED_LINE, "   +- " + GLOBAL_ORDERED_LINE])
    hits = unpartitioned_windows(plan)
    assert len(hits) == 1 and "ntile" in hits[0]
    assert unpartitioned_windows("+- " + GLOBAL_FRAME_LINE)


def test_low_card_lint_flags_tiny_key_and_passes_scaling_key(spark):
    """Matcher 3 end-to-end on live DataFrames: a keyed window whose
    key measures under the threshold is flagged with its measured
    cardinality; a >=threshold key is not; a GLOBAL window is matcher
    1's job and must be skipped (not crash, not flag)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from tools.window_audit import low_card_window_keys

    df = spark.range(1000).select(
        (F.col("id") % 3).alias("tiny"),
        (F.col("id") % 500).alias("wide"),
        F.col("id").alias("v"),
    )
    flagged = df.select(
        F.sum("v").over(Window.partitionBy("tiny").orderBy("v")).alias("s")
    )
    hits, errors = low_card_window_keys(spark, flagged, threshold=32)
    assert errors == []
    assert len(hits) == 1 and hits[0][1] == 3, hits

    ok = df.select(
        F.sum("v").over(Window.partitionBy("wide").orderBy("v")).alias("s")
    )
    hits, errors = low_card_window_keys(spark, ok, threshold=32)
    assert hits == [] and errors == []

    global_w = df.select(
        F.sum("v").over(Window.orderBy("v")).alias("s")
    )
    hits, errors = low_card_window_keys(spark, global_w, threshold=32)
    assert hits == [] and errors == []


def test_low_card_lint_dedupes_repeated_keys(spark):
    """Two windows over the same key must probe once (one hit, not
    two) — the sweep's cost model depends on it."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from tools.window_audit import low_card_window_keys

    df = spark.range(100).select((F.col("id") % 2).alias("k"), F.col("id").alias("v"))
    w = Window.partitionBy("k").orderBy("v")
    two = df.select(
        F.sum("v").over(w).alias("a"),
        F.row_number().over(w).alias("b"),
        F.max("v").over(Window.partitionBy("k")).alias("c"),
    )
    hits, errors = low_card_window_keys(spark, two, threshold=32)
    assert errors == []
    assert len(hits) == 1 and hits[0][1] == 2, hits


def test_batch_eval_python_flagged_in_live_plan(spark):
    """Matcher 4: a row-at-a-time Python UDF plans as BatchEvalPython
    and must be detectable in the executed-plan text; the Arrow path
    (pandas_udf) must not trip it."""
    import pandas as pd
    import pyspark.sql.functions as F
    from pyspark.sql.functions import pandas_udf, udf

    df = spark.range(10)
    slow = df.select(udf(lambda x: x + 1, "long")(F.col("id")).alias("y"))
    p = slow._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" in p

    def _inc(s):
        return s + 1

    _inc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    fast = df.select(pandas_udf(_inc, "long")(F.col("id")).alias("y"))
    p = fast._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" in p


def test_format_agnostic_matcher_on_executed_descriptions():
    # status-store descriptions render the node differently (Arguments:
    # lines, numbered nodes) — the format-agnostic scanner must still
    # classify each windowspecdefinition occurrence
    desc = (
        "(12) Window\nArguments: [" + KEYED_LINE + "]\n"
        "(13) Window\nArguments: [" + GLOBAL_ORDERED_LINE + "]\n"
    )
    hits = unpartitioned_window_specs(desc)
    assert len(hits) == 1
    assert "ts#3L ASC" in hits[0]
    # a fully keyed description yields nothing
    assert unpartitioned_window_specs("Arguments: [" + KEYED_LINE + "]") == []
