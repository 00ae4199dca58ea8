"""Distributed k-means (Lloyd's algorithm) over embedding columns —
the iterative-fit companion to the fixed-centroid IVF index in
operators/similarity.py (`ivf_topk` docstring): IVF's cell quality at
100 TB depends on centroids actually fitted to the corpus, and SemDeDup
(operators/curation.py) assumes the same fitted cells.

100 TB design:
- **Assignment is map-only.** Centroids (k·dim doubles — kilobytes)
  are collected to the driver once per iteration and re-enter the plan
  as literal arrays, so the big side never shuffles for assignment.
  This is the one legitimate driver round-trip in Lloyd's: centroid
  state is control-plane, like IVF's centroid broadcast or the CDC
  watermark read.
- **Update is one shuffle of k·dim·P partial sums.** posexplode to
  (cluster, dim_pos, value) with map-side partial aggregation: the
  shuffle carries k·dim rows per partition, independent of corpus
  size.
- **Plans stay O(1) per iteration** — re-literalizing centroids cuts
  lineage, so no localCheckpoint is needed (the classic iterative-
  DataFrame plan explosion cannot occur).

Determinism (the property the DuckDB differential oracle checks):
- init = the k lowest-id vectors (no RNG);
- per-dimension means use the decimal-sum path (order-independent
  bits, `queries/_util.dsum` rationale);
- argmin ties break on the lower cluster id via lexicographic
  min(struct(dist, cid));
- distances are left-to-right float-sequential in both engines
  (zip_with/aggregate ≙ list_transform/list_sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sqdist_sql(cv: list[float]) -> str:
    """Squared L2 distance of ``__v`` against a literal centroid,
    summed left-to-right (bit-matches DuckDB list_sum of
    list_transform). Emitted as SQL text: ``repr(float)`` round-trips
    the exact double and the whole centroid array parses as ONE
    Catalyst call instead of dim py4j ``F.lit`` round-trips (round 10:
    building the 8×64-literal argmin via Column operators cost ~0.55 s
    of py4j per _assign call — over 1 s per fit — before any job ran).
    """
    arr = ", ".join(_dlit(x) for x in cv)
    return (
        f"aggregate(zip_with(__v, array({arr}), (x, y) -> (x - y) * (x - y)), "
        f"0.0D, (acc, x) -> acc + x)"
    )


def _dlit(x: float) -> str:
    """SQL double literal. ``repr(float)`` round-trips every FINITE
    double exactly; NaN/±inf (a centroid averaged from NaN vectors)
    would render as ``nanD``/``infD`` and fail to PARSE — map them to
    the explicit double casts so the expression keeps the same
    well-defined NaN arithmetic as the old ``F.lit`` path (ADVICE
    round 10)."""
    import math

    x = float(x)
    if math.isnan(x):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(x):
        return f"CAST('{'-' if x < 0 else ''}Infinity' AS DOUBLE)"
    return f"{x!r}D"


def _assign(vecs: DataFrame, centroids: list[tuple[int, list[float]]], id_col: str) -> DataFrame:
    """Map-only argmin assignment against literal centroids.
    Output: id, cluster_id, dist, __v (the double vector, carried for
    the update step)."""
    terms = ", ".join(
        f"named_struct('dist', {_sqdist_sql(cv)}, 'cid', {int(cid)})"
        for cid, cv in centroids
    )
    best = F.expr(f"array_min(array({terms}))")
    return vecs.select(
        id_col,
        "__v",
        best["cid"].alias("cluster_id"),
        best["dist"].alias("dist"),
    )


def kmeans_fit_assign(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``n_iter`` Lloyd iterations from the deterministic init
    (vectors of the k lowest ids) and return the final assignment:
    id, cluster_id, dist (squared L2, rounded 6).

    Empty cells are dropped from the next round's centroid set (both
    engines agree — no re-seeding heuristic, which would need RNG).
    """
    spark = embeddings.sparkSession
    # NO input rebalance, deliberately (round 11 re-examined and kept
    # the round-10 rejection): assignment is map-only and the update
    # aggregates map-side into k·dim partial sums, so ANY repartition
    # here ships the full vector payload through a shuffle that
    # nothing downstream is keyed by — scale-negative. The fixture's
    # single-task assignment passes (~0.3 s each) are a
    # single-row-group-file artifact; a real corpus scan arrives
    # already split.
    vecs = embeddings.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    seed = (
        vecs.orderBy(id_col).limit(k).select(F.col(id_col).alias("cid"), "__v").collect()
    )
    centroids = [(r["cid"], list(r["__v"])) for r in seed]
    # remap seed ids to dense 0..k-1 cluster ids so the contract does
    # not leak fixture ids
    centroids = [(i, cv) for i, (_, cv) in enumerate(centroids)]

    assigned = _assign(vecs, centroids, id_col)
    for _ in range(n_iter - 1):
        # update: (cluster, pos) partial sums — k·dim rows after
        # map-side combine, then rebuild arrays ordered by pos
        sums = (
            assigned.select("cluster_id", F.posexplode("__v").alias("pos", "x"))
            .groupBy("cluster_id", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(38,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
        )
        new_rows = (
            sums.groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("cv")
            )
            .collect()
        )
        centroids = sorted((r["cluster_id"], list(r["cv"])) for r in new_rows)
        assigned = _assign(vecs, centroids, id_col)

    # portable floor rounding, not engine round(): dist is an arbitrary
    # accumulated double and SQL round() diverges between engines within
    # 1 ulp of a .5 boundary (queries/_util.pround rationale)
    dist6 = F.floor(F.col("dist") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return assigned.select(id_col, "cluster_id", dist6.alias("dist"))
