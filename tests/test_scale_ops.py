"""Scale-technique operators: salted join equivalence + skew spread,
bucketed join exchange elimination (operators/scale.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import (
    salted_join,
    write_bucketed,
)


def test_salted_join_equals_plain_join(spark):
    # heavily skewed left: 90% of rows share key 1
    left = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame([(1, "hot"), (10, "a"), (20, "b")], "k long, name string")
    plain = {(r["k"], r["payload"], r["name"]) for r in left.join(right, "k").collect()}
    salted = {(r["k"], r["payload"], r["name"]) for r in salted_join(left, right, "k").collect()}
    assert salted == plain and len(plain) > 1000


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "x"), (99, "y")], "k long, payload string")
    right = spark.createDataFrame([(1, "hot")], "k long, name string")
    rows = {r["k"]: r["name"] for r in salted_join(left, right, "k", how="left").collect()}
    assert rows == {1: "hot", 99: None}


def test_salt_spreads_hot_key(spark):
    left = spark.range(0, 1000).select(F.lit(1).alias("k"), F.col("id").alias("p"))
    salt = F.pmod(F.xxhash64(F.col("k"), F.col("p")), F.lit(8)).cast("int")
    n_salts = left.select(salt.alias("s")).distinct().count()
    assert n_salts == 8  # the hot key fans out across all salt buckets


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    # warehouse dir is a static conf, set at session build (conftest)
    a = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "bk_a", ["k"], num_buckets=4, sort_by=["k"])
    write_bucketed(b, "bk_b", ["k"], num_buckets=4, sort_by=["k"])
    yield spark.table("bk_a"), spark.table("bk_b")
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    a, b = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        joined = a.join(b, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, "bucketed join must not shuffle"
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_cluster_by_range_prunable_footers(spark, tmp_path):
    """Range clustering must produce parquet files whose footer min/max
    ranges are narrow and mostly disjoint — the property row-group
    skipping prunes on. An unclustered (hash-shuffled) layout makes
    every file overlap every filter; the clustered one overlaps few."""
    import pyarrow.parquet as pq

    from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import (
        cluster_by_range,
    )

    df = spark.range(0, 100_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("payload")
    )

    clustered = str(tmp_path / "clustered")
    baseline = str(tmp_path / "baseline")
    cluster_by_range(df, ["k"], num_files=8).write.parquet(clustered)
    df.repartition(8).write.parquet(baseline)  # round-robin: every file spans ~full range

    def overlaps(path, lo, hi):
        import os
        n = 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(0).statistics
                if st.min <= hi and st.max >= lo:
                    n += 1
        return n

    # a 5%-selectivity range: clustered layout -> at most 2 of 8 files
    # overlap; round-robin layout -> every file overlaps
    assert overlaps(clustered, 10_000, 15_000) <= 2
    assert overlaps(baseline, 10_000, 15_000) == 8

    # results identical regardless of layout
    a = spark.read.parquet(clustered).filter("k between 10000 and 15000").count()
    b = spark.read.parquet(baseline).filter("k between 10000 and 15000").count()
    assert a == b == 5001


def test_bloom_prefilter_string_keys_actually_filter(spark):
    """Keys are hashed in canonical STRING form: a long-cast of a
    non-numeric string key would be NULL, collapsing every hash
    position to a seed constant so ALL probe rows pass (the filter
    silently becomes a no-op). With string hashing, non-member string
    keys are (near-certainly, fpr ~1e-9 at this density) rejected."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import (
        bloom_prefilter,
        bloom_semi_join,
    )

    big = spark.createDataFrame(
        [(f"key_{i}",) for i in range(2000)], "k string"
    )
    keys = spark.createDataFrame([(f"key_{i}",) for i in range(10)], "k string")
    passed = bloom_prefilter(big, keys, "k", "k").count()
    # all 10 members pass; the 1990 non-members must be (almost) all
    # rejected — the broken long-cast form passed all 2000
    assert passed < 50
    exact = {r["k"] for r in bloom_semi_join(big, keys, "k", "k").collect()}
    assert exact == {f"key_{i}" for i in range(10)}


def test_bloom_prefilter_numeric_keys_unchanged(spark):
    """Numeric keys keep working through the same canonical string
    form (int vs long widths canonicalize identically)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import (
        bloom_prefilter,
    )

    big = spark.range(0, 2000).select(F.col("id").alias("k"))
    keys = spark.createDataFrame([(i,) for i in range(10)], "k int")
    rows = {r["k"] for r in bloom_prefilter(big, keys, "k", "k").collect()}
    assert set(range(10)) <= rows and len(rows) < 50


def test_bloom_prefilter_rejects_mismatched_key_types(spark):
    """bigint-vs-double keys stringify differently ('5' vs '5.0'), so
    every true match would fail the bitmap — the operator must fail
    fast instead of silently filtering everything out."""
    import pytest as _pytest

    from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import bloom_prefilter

    big = spark.createDataFrame([(5,), (6,)], "k long")
    keys = spark.createDataFrame([(5.0,)], "k double")
    with _pytest.raises(ValueError, match="canonical string"):
        bloom_prefilter(big, keys, "k", "k")


def test_bloom_prefilter_integral_width_mismatch_is_fine(spark):
    """int and bigint share one canonical string form — a width
    difference alone must not be rejected, and matches must pass."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import bloom_prefilter

    big = spark.createDataFrame([(5,), (1000,)], "k long")
    keys = spark.createDataFrame([(5,)], "k int")
    passed = {r["k"] for r in bloom_prefilter(big, keys, "k", "k").collect()}
    assert 5 in passed


def test_distributed_rank_equals_global_row_number(spark):
    """The two-pass rank must equal row_number() OVER (ORDER BY v, id)
    exactly, for EVERY monotonic bucket function — the identity bucket,
    a coarse value bucket, a log bucket, and the degenerate single
    bucket (which collapses to the naive global window)."""
    from pyspark.sql import functions as F

    from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import (
        distributed_rank,
    )

    rows = [(i, float(((i * 37) % 101) + 1)) for i in range(500)]
    # duplicate values across different ids exercise the tiebreak
    rows += [(1000 + i, rows[i][1]) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, v double").repartition(7)

    from pyspark.sql import Window

    truth = {
        (r["id"]): r["rk"]
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    buckets = {
        "identity": F.col("v").cast("bigint"),
        "coarse": F.floor(F.col("v") / 10),
        "log": F.floor(F.log10(F.col("v")) * 100),
        "single": F.lit(0),
    }
    for name, b in buckets.items():
        got = {
            r["id"]: r["value_rank"]
            for r in distributed_rank(df, "v", "id", b).collect()
        }
        assert got == truth, f"bucket={name}"


def test_distributed_rank_window_is_bucket_keyed(spark):
    """The corpus-side window must be keyed by __bucket__ — the only
    unpartitioned window is the histogram prefix-sum."""
    import re as _re

    from pyspark.sql import functions as F

    from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import (
        distributed_rank,
    )

    df = spark.createDataFrame([(i, float(i % 37)) for i in range(200)], "id long, v double")
    out = distributed_rank(df, "v", "id", F.floor(F.col("v")))
    p = out._jdf.queryExecution().executedPlan().toString()
    keyed = _re.findall(r"windowspecdefinition\(__bucket__#\d+L?,", p)
    assert len(keyed) == 1, p[:2000]
    assert "BroadcastHashJoin" in p  # offsets join back broadcast
