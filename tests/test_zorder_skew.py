"""Unit tests for the z-order clustering and skew-profile operators
(tiny hand-checkable inputs + a locality property at sf0.001)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import (
    skew_profile,
    zorder_key,
)
from oracle_to_oracle_data_integration_pipeline_spark.queries.partition_queries import (
    q_zorder_cluster,
)


def test_zorder_key_interleave(spark):
    # x=0b11, y=0b01 -> bits: x0->1, y0->2, x1->4, y1->0  => z=7
    # x=0b10, y=0b11 -> x0(0), y0->2, x1->4, y1->8        => z=14
    df = spark.createDataFrame([(3, 1), (2, 3)], "x long, y long")
    out = df.select(zorder_key(F.col("x"), F.col("y"), bits=2).alias("z")).collect()
    assert sorted(r.z for r in out) == [7, 14]


def test_zorder_buckets_localize_both_dims(spark, sf_dir):
    """Every top-4-z-bit bucket fixes the top 2 quantized bits of BOTH
    columns, so each bucket's raw min/max envelope must span well under
    half the global range in each dimension — the property that makes
    two-column predicates skip files."""
    rows = q_zorder_cluster(spark, sf_dir).collect()
    assert rows
    gx = (min(r.x_min for r in rows), max(r.x_max for r in rows))
    gy = (min(r.y_min for r in rows), max(r.y_max for r in rows))
    for r in rows:
        assert (r.x_max - r.x_min) <= 0.3 * (gx[1] - gx[0]), r
        assert (r.y_max - r.y_min) <= 0.3 * (gy[1] - gy[0]), r


def test_cluster_by_zorder_partitions_are_z_ranges(spark, sf_dir):
    """The write-path layout operator: partitions must hold disjoint,
    internally-sorted Morton-key ranges (that is what gives each output
    file its narrow two-column footer envelope)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.scale import (
        cluster_by_zorder,
        with_zorder_key,
    )
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    clustered = cluster_by_zorder(li, ["l_orderkey", "l_partkey"], num_files=4)
    # recompute the z key on the clustered output and check per-partition ranges
    keyed = with_zorder_key(clustered, ["l_orderkey", "l_partkey"])
    parts = (
        keyed.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("__z").alias("lo"), F.max("__z").alias("hi"), F.count("*").alias("n"))
        .collect()
    )
    assert sum(p.n for p in parts) == li.count()
    spans = sorted((p.lo, p.hi) for p in parts)
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "partition z-ranges must be disjoint"


def test_skew_profile_scalars(spark):
    df = spark.createDataFrame([("a",), ("a",), ("a",), ("b",)], "k string")
    r = skew_profile(df, "k").collect()[0]
    assert (r.n_keys, r.n_rows, r.max_per_key) == (2, 4, 3)
    assert r.avg_per_key == 2.0
    assert r.skew_ratio == 1.5
    assert r.p50_per_key == 2.0
