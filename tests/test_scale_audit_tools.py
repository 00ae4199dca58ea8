"""Unit tests for the round-7 scale-audit tools — tools/collect_audit.py
(driver-collect growth) and tools/skew_audit.py (hot partition keys).
Like tests/test_window_audit_matchers.py: the tripwires' own logic gets
pinned, because a silent matcher regression turns a full-registry sweep
vacuous without any test noticing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def test_collect_tally_counts_all_entry_points(spark):
    """The patch must intercept the CONCRETE DataFrame class (Spark 4's
    pyspark.sql.DataFrame is abstract — patching it counts nothing,
    the bug the first sweep shipped with) and tally collect, toPandas
    and toLocalIterator rows; restore must put the originals back."""
    from tools.collect_audit import _concrete_dataframe_cls, _patched, _restore, _Tally

    df = spark.range(7)
    tally = _Tally()
    orig = _patched(tally)
    try:
        assert len(df.collect()) == 7
        assert len(df.toPandas()) == 7
        assert len(list(df.toLocalIterator())) == 7
    finally:
        _restore(orig)
    assert tally.rows == 21 and tally.calls == 3
    # restored: further collects do not tally
    df.collect()
    assert tally.rows == 21
    cls = _concrete_dataframe_cls()
    assert cls.collect is orig["df_collect"]


def test_collect_measure_counts_operator_collects_only(spark):
    """measure() tallies what the callable collects while building —
    a lazy no-collect build must report zero."""
    from tools.collect_audit import measure

    def lazy_qid(s, sf_dir):
        return s.range(100).groupBy((F.col("id") % 3).alias("k")).count()

    def collecting_qid(s, sf_dir):
        rows = s.range(50).collect()
        return s.createDataFrame(rows, "id long")

    assert measure(spark, lazy_qid, "unused").rows == 0
    t = measure(spark, collecting_qid, "unused")
    assert t.rows == 50 and t.calls == 1


def test_skew_flags_hot_join_key_and_exempts_reducing_agg(spark):
    """A join key where one value holds half the rows must flag; a
    map-side-combinable aggregate over the same skew must NOT (partials
    absorb hot keys); a collect_list aggregate over it must."""
    from tools.skew_audit import hot_keys

    # 50% of rows share key 0; the rest are unique
    skewed = spark.range(10_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(100).select(F.col("id").alias("k"), F.lit("x").alias("name"))

    joined = skewed.join(dim, "k")
    hits, errors = hot_keys(spark, joined, share_limit=0.25, min_rows=5000)
    assert errors == []
    assert any(kind == "Join" for kind, *_ in hits), hits

    reducing = skewed.groupBy("k").agg(F.sum("v").alias("s"))
    hits, errors = hot_keys(spark, reducing, share_limit=0.25, min_rows=5000)
    assert hits == [] and errors == []

    whole_group = skewed.groupBy("k").agg(F.collect_list("v").alias("vs"))
    hits, errors = hot_keys(spark, whole_group, share_limit=0.25, min_rows=5000)
    assert any(kind == "Aggregate" for kind, *_ in hits), hits


def test_broadcast_audit_sees_hinted_sides_only(spark):
    """hinted_broadcast_sides must return exactly the join sides pinned
    by an explicit broadcast() hint — not stats-based auto-broadcasts
    (those re-decide at real scale and are not the hazard) — and the
    returned subtree must count the hinted side's rows."""
    from tools.broadcast_audit import _count, hinted_broadcast_sides

    fact = spark.range(1000).select(F.col("id").alias("k"), F.col("id").alias("v"))
    dim = spark.range(77).select(F.col("id").alias("k"), F.lit("d").alias("name"))

    hinted = fact.join(F.broadcast(dim), "k")
    sides = hinted_broadcast_sides(hinted)
    assert len(sides) == 1
    assert _count(spark, sides[0]) == 77

    # the same join WITHOUT a hint may still plan as a broadcast join
    # (stats), but must report zero HINTED sides
    unhinted = fact.join(dim, "k")
    assert hinted_broadcast_sides(unhinted) == []


def test_join_explosion_flags_quadratic_and_passes_linear(spark, monkeypatch):
    """join_growth must flag a join whose output is quadratic in SF
    (constant-cardinality key over two growing sides — the r6
    quantile_normalize class) and pass a proper key equi-join whose
    output is linear."""
    import tools.join_explosion_audit as jx
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load

    monkeypatch.setattr(jx, "SF_SMALL", "/root/testdata/sf0.001")
    monkeypatch.setattr(jx, "SF_BIG", "/root/testdata/sf0.01")

    def quadratic(s, sf_dir):
        c = load(s, sf_dir, "customer").select(
            (F.col("c_custkey") % 2).alias("k"), "c_acctbal"
        )
        c2 = load(s, sf_dir, "customer").select(
            (F.col("c_custkey") % 2).alias("k"), F.col("c_acctbal").alias("b2")
        )
        return c.join(c2, "k")

    hits, errors = jx.join_growth(spark, quadratic, ratio_limit=30, min_rows=5000)
    assert errors == []
    assert len(hits) == 1, hits
    _, small, big = hits[0]
    assert big >= 30 * small

    def linear(s, sf_dir):
        c = load(s, sf_dir, "customer").select("c_custkey", "c_acctbal")
        o = load(s, sf_dir, "orders").select("o_custkey", "o_totalprice")
        return o.join(c, o.o_custkey == c.c_custkey)

    hits, errors = jx.join_growth(spark, linear, ratio_limit=30, min_rows=5000)
    assert hits == [] and errors == []


def test_skew_measures_window_partition_keys(spark):
    """A keyed window over a hot key must flag; a global window is
    window_audit matcher 1's job and must be skipped."""
    from pyspark.sql import Window

    from tools.skew_audit import hot_keys

    skewed = spark.range(10_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    win = skewed.select(
        F.row_number().over(Window.partitionBy("k").orderBy("v")).alias("rn")
    )
    hits, errors = hot_keys(spark, win, share_limit=0.25, min_rows=5000)
    assert errors == []
    assert any(kind == "Window" for kind, *_ in hits), hits

    global_win = skewed.select(
        F.sum("v").over(Window.orderBy("v")).alias("s")
    )
    hits, errors = hot_keys(spark, global_win, share_limit=0.25, min_rows=5000)
    assert hits == [] and errors == []
