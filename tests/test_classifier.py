"""Distributed logistic-regression quality classifier
(operators/classifier.py): bit-determinism under repartitioning (the
exact-integer-sum contract), loss actually decreasing under GD, and
the gradient job staying one combinable JVM-side aggregation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.classifier import (
    FEATURES,
    doc_features,
    logreg_fit,
    logreg_log_loss,
)
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load

POS = ["src0", "src1", "src2", "src3", "src4"]


def test_fit_is_partitioning_invariant(spark, sf_dir):
    """Nano-quantized integer gradient sums make the fitted weights
    identical under ANY partitioning — the property that lets the
    unrolled DuckDB oracle compare bit-for-bit."""
    f = doc_features(load(spark, sf_dir, "documents"), POS)
    w1, n1 = logreg_fit(f, n_iter=3)
    w13, n13 = logreg_fit(f.repartition(13), n_iter=3)
    w1p, _ = logreg_fit(f.coalesce(1), n_iter=3)
    assert n1 == n13 and w1 == w13 == w1p


def test_loss_decreases_toward_prior(spark, sf_dir):
    """GD must improve on the w=0 loss (ln 2) and keep improving with
    more steps; with signal-free synthetic features the floor is the
    prior's entropy, which the bias alone approaches."""
    f = doc_features(load(spark, sf_dir, "documents"), POS)
    base = logreg_log_loss(f, [0.0] * len(FEATURES))
    w3, _ = logreg_fit(f, n_iter=3)
    w6, _ = logreg_fit(f, n_iter=6)
    l3, l6 = logreg_log_loss(f, w3), logreg_log_loss(f, w6)
    assert base > l3 > l6
    # prior entropy bound for this fixture's positive rate
    pos_rate = (
        f.agg(F.avg("y")).collect()[0][0]
    )
    import math

    floor_ = -(pos_rate * math.log(pos_rate) + (1 - pos_rate) * math.log(1 - pos_rate))
    assert l6 > floor_ - 1e-6


def test_gradient_job_is_single_jvm_aggregation(spark, sf_dir):
    """One GD step = partial+final HashAggregate over the feature
    projection; no Python eval node, no window, no join — the shape
    that collapses 100 TB to P×(d+1) longs map-side."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.classifier import (
        _nanos,
        _sigmoid,
    )

    f = doc_features(load(spark, sf_dir, "documents"), POS)
    z = F.lit(0.0) * F.col("x0")
    agg = f.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(_nanos((_sigmoid(z) - F.col("y")) * F.col(f"x{j}"))).alias(f"s{j}")
            for j in range(4)
        ],
    )
    p = agg._jdf.queryExecution().executedPlan().toString()
    assert p.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Window" not in p and "Join" not in p
