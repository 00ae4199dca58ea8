"""Classifier-based quality filtering — the LR quality classifier of
the GPT-3/LLaMA curation recipes (train a linear model to tell
"reference quality" sources from the crawl, then score every
document). The reference pipeline has no ML surface at all; this is
the engine-native version of the standard curation pillar alongside
dedup (operators/dedup.py) and heuristic quality (operators/text.py).

Distributed logistic regression by full-batch gradient descent:

- **Per-iteration cost = ONE combinable aggregation.** Each row's
  gradient contribution ``(sigmoid(w.x) - y) * x_j`` is quantized to
  integer nanos (floor(g*1e9+0.5)) and summed — map-side partial
  aggregation collapses 100 TB to P partial rows of d+1 longs before
  a tiny shuffle; integer sums are exact and order-independent, so
  the fitted weights are bit-deterministic under any partitioning.
- **Weights are control-plane.** d+1 doubles round-trip through the
  driver each iteration and re-enter the plan as literals — the same
  legitimate driver loop as the k-means centroid state
  (operators/clustering.py) or the CDC watermark read; plans stay
  O(1) per iteration with no lineage growth.
- **No UDF anywhere**: features, sigmoid, and gradient are built-in
  column expressions inside whole-stage codegen.

Determinism contract (what the unrolled DuckDB differential oracle
checks): init w=0 (so iteration 1's sigmoid is exactly 0.5 in every
engine), left-to-right dot product, nano-quantized gradient/loss
sums, weights re-rounded to 9 decimals after every step. At 100 TB
you would persist the feature projection once instead of re-deriving
it per iteration (3 extra narrow scans here; noted, not needed at
fixture scale).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# feature names, in weight order
FEATURES = ("bias", "log_len_c", "vowel_ratio", "space_ratio")

# centering constant for log-length (ln of a ~400-char doc) — keeps
# the feature near zero so GD steps don't overshoot without needing a
# corpus-statistics standardization pass
LOG_LEN_CENTER = 6.0


def doc_features(docs: DataFrame, positive_sources: list[str]) -> DataFrame:
    """Project documents to (y, x0..x3) doubles: label = doc comes
    from a curated source; features = cheap text-shape signals
    (centered log length, vowel ratio, whitespace ratio). On the
    synthetic fixture these carry ~no class signal (the generator is
    uniform across sources), so the fit's measurable behavior is the
    bias converging toward the prior's log-odds — the differential
    oracle certifies the distributed GD machinery bit-for-bit, same
    spirit as kmeans_assign on synthetic vectors."""
    n = F.col("n_chars").cast("double")
    vowel = F.length(F.regexp_replace(F.col("text"), r"[^aeiou]", "")).cast("double")
    space = F.length(F.regexp_replace(F.col("text"), r"[^ ]", "")).cast("double")
    return docs.filter(F.col("text").isNotNull() & (F.col("n_chars") > 0)).select(
        F.when(F.col("source").isin(positive_sources), F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
        F.lit(1.0).alias("x0"),
        (F.log(F.col("n_chars") + 1) - F.lit(LOG_LEN_CENTER)).alias("x1"),
        (vowel / n).alias("x2"),
        (space / n).alias("x3"),
    )


def _sigmoid(z):
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _nanos(expr):
    """floor(x*1e9 + 0.5) as BIGINT — the exact, order-independent
    accumulator unit (same convention as operators/embeddings'
    int64-quantized Gram partials)."""
    return F.floor(expr * F.lit(1e9) + F.lit(0.5)).cast("bigint")


def _round9(x: float) -> float:
    return math.floor(x * 1e9 + 0.5) / 1e9


def logreg_fit(
    feats: DataFrame, n_features: int = 4, n_iter: int = 3, lr: float = 0.1
) -> tuple[list[float], int]:
    """Fit by ``n_iter`` full-batch GD steps; returns (weights, n).
    One aggregation job per step; weights re-rounded to 9 decimals so
    the literalized state is the same double in every engine."""
    w = [0.0] * n_features
    n_rows = 0
    for _ in range(n_iter):
        z = F.lit(w[0]) * F.col("x0")
        for j in range(1, n_features):
            z = z + F.lit(w[j]) * F.col(f"x{j}")
        resid = _sigmoid(z) - F.col("y")
        row = feats.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(_nanos(resid * F.col(f"x{j}"))).alias(f"s{j}")
                for j in range(n_features)
            ],
        ).collect()[0]
        n_rows = row["n"]
        w = [
            _round9(w[j] - lr * (row[f"s{j}"] / 1e9) / n_rows)
            for j in range(n_features)
        ]
    return w, n_rows


def logreg_log_loss(feats: DataFrame, w: list[float]) -> float:
    """Mean cross-entropy at ``w``, nano-quantized per row then
    exactly summed (order-independent), rounded to 6."""
    z = F.lit(w[0]) * F.col("x0")
    for j in range(1, len(w)):
        z = z + F.lit(w[j]) * F.col(f"x{j}")
    p = _sigmoid(z)
    li = -(F.col("y") * F.log(p) + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p))
    row = feats.agg(
        F.sum(_nanos(li)).alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    return math.floor((row["s"] / 1e9) / row["n"] * 1e6 + 0.5) / 1e6
