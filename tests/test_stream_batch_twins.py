"""Fidelity of the streaming qids' BATCH TWINS: the same builder
applied to a batch events read must produce exactly the rows the real
streaming drain produces — this is what licenses the scale audits
(window-key cardinality, hot keys, join growth) to probe the twin's
logical plan as a stand-in for the unprobeable executed micro-batch
plans. Watermarks are no-ops on bounded batch input and availableNow
drains everything, so the results coincide by construction; this test
pins that the builders actually stay shared (a qid quietly inlining a
different transformation would silently decouple the audit from the
stream).
"""

from __future__ import annotations

import pytest

from oracle_to_oracle_data_integration_pipeline_spark.queries import all_queries
from oracle_to_oracle_data_integration_pipeline_spark.queries.streaming_queries import (
    BATCH_TWIN_BUILDERS,
    batch_twin,
)

SF = "/root/testdata/sf0.001"


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect())


@pytest.mark.parametrize("qid", sorted(BATCH_TWIN_BUILDERS))
def test_batch_twin_matches_streamed_result(spark, qid):
    streamed = all_queries()[qid](spark, SF)
    twin = batch_twin(spark, SF, qid)
    assert sorted(twin.columns) == sorted(streamed.columns)
    assert _canon(twin) == _canon(streamed), qid


def test_twin_plans_are_probeable(spark):
    """The audits need executable logical subtrees: the twin must be a
    plain batch plan (not streaming), and its count must run."""
    for qid in BATCH_TWIN_BUILDERS:
        df = batch_twin(spark, SF, qid)
        assert not df.isStreaming
        assert df.count() >= 0
