#!/usr/bin/env python
"""Idle-box A/B for VERDICT r10 item 2: pareto_revenue WITH the stage
persist (current code) vs WITHOUT (subplan recomputed per consumer).
Interleaved same-session runs, noop-forced, bench methodology."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.queries import analytics_queries as aq
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import dsum, load
from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df):
    df.write.mode("overwrite").format("noop").save()


def no_persist_variant(spark, sf_dir):
    """q_pareto_revenue with persist_tracked stripped (monkeypatch)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators import cache_registry

    orig = cache_registry.persist_tracked
    cache_registry.persist_tracked = lambda df, group, level=None, replace=False: df
    try:
        return aq.q_pareto_revenue(spark, sf_dir)
    finally:
        cache_registry.persist_tracked = orig


def main():
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    force(aq.q_pareto_revenue(spark, "/root/testdata/sf0.001"))
    force(no_persist_variant(spark, "/root/testdata/sf0.001"))
    res = {"persist": [], "no_persist": []}
    for _ in range(4):
        for tag, fn in (("persist", aq.q_pareto_revenue), ("no_persist", no_persist_variant)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(fn(spark, SF))
            res[tag].append(round(time.perf_counter() - t0, 3))
    for tag, xs in res.items():
        print(tag, xs, "min", min(xs), "median", sorted(xs)[len(xs) // 2])


if __name__ == "__main__":
    main()
