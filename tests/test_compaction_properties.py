"""Property-based test of the cdc_log_compaction net-op algebra: the
first×last shortcut the operator aggregates distributively must equal
a full sequential REPLAY of the log against a per-key state machine —
for arbitrary op sequences, not just the fixture's synthetic feed.

Replay model (the executable spec):
- first op I  → the key did not exist at the previous checkpoint;
  any other first op → it did.
- presence after the log = f(last op): D → absent, I/U → present.
- net = (existed_before, exists_after):
  (False, False) → 'none', (False, True) → 'I',
  (True, False) → 'D', (True, True) → 'U'  (covers D→I re-insert).
- surviving payload = the LAST op's payload, even for 'D' (tombstone
  carries the final attributes for audit).

The Spark side runs the REAL aggregation (min_by/max_by over a unique
seq) on the generated log; the model replays op-by-op. Divergence on
any sequence means the shortcut is not a valid fold of the replay
semantics.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("merge_key", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("price", T.LongType(), False),
    ]
)

op_st = st.tuples(
    st.integers(min_value=0, max_value=4),        # merge_key (small → long per-key chains)
    st.sampled_from(["I", "U", "D"]),             # op
    st.integers(min_value=0, max_value=999),      # payload
)
log_st = st.lists(op_st, min_size=1, max_size=24)


def replay(rows):
    """Sequential per-key state machine over (key, seq-ordered ops)."""
    by_key: dict = {}
    for key, seq, op, price in rows:
        by_key.setdefault(key, []).append((seq, op, price))
    out = {}
    for key, ops in by_key.items():
        ops.sort()
        first_op = ops[0][1]
        last_op = ops[-1][1]
        existed_before = first_op != "I"
        exists_after = last_op != "D"
        if not existed_before and not exists_after:
            net = "none"
        elif not existed_before:
            net = "I"
        elif not exists_after:
            net = "D"
        else:
            net = "U"
        out[key] = (net, ops[-1][2], len(ops))
    return out


def spark_compact(spark, rows):
    """The REAL distributive aggregation from q_cdc_log_compaction
    (same expressions; parameterized log instead of the fixture)."""
    log = spark.createDataFrame(rows, SCHEMA)
    agg = log.groupBy("merge_key").agg(
        F.min_by("op", "seq").alias("first_op"),
        F.max_by("op", "seq").alias("last_op"),
        F.max_by("price", "seq").alias("last_price"),
        F.count(F.lit(1)).alias("n_ops"),
    )
    net = (
        F.when((F.col("first_op") == "I") & (F.col("last_op") == "D"), F.lit("none"))
        .when(F.col("first_op") == "I", F.lit("I"))
        .when(F.col("last_op") == "D", F.lit("D"))
        .otherwise(F.lit("U"))
    )
    return {
        r["merge_key"]: (r["net_op"], r["last_price"], r["n_ops"])
        for r in agg.select(
            "merge_key", net.alias("net_op"), "last_price", "n_ops"
        ).collect()
    }


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(log=log_st)
def test_fold_equals_replay(spark, log):
    # unique seq per row (the operator's argmax-determinism contract)
    rows = [(key, i, op, price) for i, (key, op, price) in enumerate(log)]
    assert spark_compact(spark, rows) == replay(rows)
