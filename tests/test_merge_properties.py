"""Property-based differential test: ``merge_soft_delete`` vs a pure
Python model of the reference MERGE semantics
(`/root/reference/scripts/03_cdc_etl.py:145-157`), over random batch
sequences (SURVEY.md §5 item 3 / §7 risk 5).

Model per batch row (after latest-per-key collapse):
- key in target  → replace all non-PK columns (including is_deleted)
- key not in target & is_deleted == 'N' → insert
- key not in target & is_deleted == 'Y' → drop silently
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from oracle_to_oracle_data_integration_pipeline_spark.operators.cdc import merge_soft_delete

BASE = datetime.datetime(2024, 1, 1)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("val", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("is_deleted", T.StringType(), False),
    ]
)

row_st = st.tuples(
    st.integers(min_value=1, max_value=8),                      # id (small → collisions)
    st.text(alphabet="abcxyz", min_size=1, max_size=4),         # val
    st.integers(min_value=0, max_value=5),                      # created offset days
    st.one_of(st.none(), st.integers(min_value=6, max_value=12)),  # updated offset
    st.sampled_from(["N", "N", "N", "Y"]),                      # deleted (25%)
)

batch_st = st.lists(row_st, min_size=0, max_size=6)


def to_rows(batch):
    # one row per id (the operator contract after latest_per_key) —
    # keep the LAST occurrence, deterministic for the model
    dedup = {}
    for rid, val, c, u, d in batch:
        dedup[rid] = (
            rid,
            val,
            BASE + datetime.timedelta(days=c),
            None if u is None else BASE + datetime.timedelta(days=u),
            d,
        )
    return list(dedup.values())


def model_merge(target: dict, rows) -> dict:
    out = dict(target)
    for rid, val, c, u, d in rows:
        if rid in out or d == "N":
            out[rid] = (val, d)
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(batches=st.lists(batch_st, min_size=1, max_size=3))
def test_merge_matches_model_over_sequences(spark, batches):
    target_df = spark.createDataFrame([], SCHEMA)
    model: dict = {}
    for batch in batches:
        rows = to_rows(batch)
        delta_df = spark.createDataFrame(rows, SCHEMA)
        target_df = merge_soft_delete(target_df, delta_df, ["id"]).df.localCheckpoint()
        model = model_merge(model, rows)
        got = {r["id"]: (r["val"], r["is_deleted"]) for r in target_df.collect()}
        assert got == model
