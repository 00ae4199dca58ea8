"""Iterative graph analytics: PageRank over an edge DataFrame.

Companion to `operators/dedup.connected_components` (the other
iterative graph op): where components label groups, PageRank scores
node importance — e.g. ranking suppliers/customers in the trade graph,
or hub documents in a near-dup/link graph before choosing canonical
representatives.

100 TB design (same contract as connected_components):
- Each iteration is ONE shuffle join (ranks keyed by node id against
  the out-degree-annotated edge list) + a map-side-combined aggregate
  keyed by destination. Edge and degree tables are computed once and
  `localCheckpoint`ed; rank lineage is truncated every round so plans
  stay O(1) per iteration.
- No driver round-trip per iteration (ranks never collect); the only
  driver-side state is the loop counter.
- Skewed in-degree (celebrity nodes) lands on the dst-keyed aggregate,
  which partial-aggregates map-side — the classic PageRank hot spot is
  already combined before the shuffle.

Determinism (what the unrolled DuckDB oracle checks): per-destination
inflow sums are computed over portable-rounded INTEGER contributions —
floor(rank/deg·1e15 + 0.5) as a long — so the sum is exact and
associative with no double→decimal cast anywhere (a raw double cast to
DECIMAL can land on a .5 quantization boundary and round differently
per engine; the floor form is engine-identical, same rationale as
`queries/_util.pround`). The scaled sum stays < 2^53, so the final
double division is exact. Teleport/damping arithmetic is written as
the same double-literal expression in both engines (the oracle uses
e-notation literals — DuckDB parses bare `0.85` as DECIMAL and would
fold `1.0 - 0.85` exactly where doubles do not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 5,
) -> DataFrame:
    """Fixed-iteration PageRank. ``edges`` is a directed edge list
    (deduplicated); dangling nodes keep only teleport mass (the
    redistribute-dangling-mass refinement is omitted and mirrored
    as-omitted in the oracle).

    Output: one row per node — (node, rank) after ``iters`` rounds.
    """
    e = edges.select(F.col(src).alias("esrc"), F.col(dst).alias("edst")).distinct()
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("esrc").alias("node"))
        .union(e.select(F.col("edst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("esrc").agg(F.count("*").alias("deg"))
    # degree rides the edge list ONCE — one materialized (src, dst, deg)
    # table instead of an extra e⋈deg join inside every iteration
    ewd = e.join(deg, "esrc").localCheckpoint(eager=True)
    n_row = nodes.agg(F.count("*").alias("n_nodes"))
    base = nodes.crossJoin(F.broadcast(n_row))

    # init: uniform 1/n, built as an expression so both engines compute
    # the identical double (n is data-dependent, never a Python literal)
    r = base.select("node", "n_nodes", (F.lit(1.0) / F.col("n_nodes")).alias("rank"))
    teleport = (F.lit(1.0) - F.lit(damping)) / F.col("n_nodes")
    for _ in range(iters):
        contrib = (
            ewd.join(r.select(F.col("node").alias("esrc"), "rank"), "esrc")
            .groupBy("edst")
            .agg(
                (
                    F.sum(F.floor(F.col("rank") / F.col("deg") * F.lit(1e15) + F.lit(0.5)))
                    .cast("double")
                    / F.lit(1e15)
                ).alias("m")
            )
        )
        r = (
            base.join(contrib, base.node == contrib.edst, "left")
            .select(
                "node",
                "n_nodes",
                (teleport + F.lit(damping) * F.coalesce(F.col("m"), F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return r.select("node", "rank")


def triangle_count(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Global triangle census of an undirected graph: one row with
    (n_nodes, n_edges, n_wedges, n_triangles, clustering coefficient).

    ``edges`` must hold each undirected edge once in canonical
    orientation (a < b, no self-loops, deduped). The classic two-join
    shape: wedges = edges ⋈ edges on the shared lower endpoint
    (b < c keeps each wedge once), triangles = wedges ⋈ edges on the
    closing pair. Both joins are keyed shuffles; cost is Σdeg² (wedge
    generation), the standard bound — at 100 TB you first degree-cap
    or degree-order the edge list (highest-degree vertex last) to tame
    Σdeg², which this operator leaves to the caller's edge builder.
    Global clustering coefficient = 3·triangles / wedges.
    """
    e = edges.select(F.col(a).alias("a"), F.col(b).alias("b"))
    x = e.alias("x")
    y = e.alias("y")
    # canonical wedges (both legs share their LOWER endpoint) find every
    # triangle a<b<c exactly once via legs (a,b),(a,c) + closer (b,c)...
    cwedges = x.join(
        y,
        (F.col("x.a") == F.col("y.a")) & (F.col("x.b") < F.col("y.b")),
    ).select(F.col("x.b").alias("wa"), F.col("y.b").alias("wb"))
    z = e.alias("z")
    tri = cwedges.join(
        z, (F.col("wa") == F.col("z.a")) & (F.col("wb") == F.col("z.b"))
    )
    # ...but the clustering denominator needs ALL wedges, centered
    # anywhere: sum C(deg(v), 2) over the symmetrized degree table
    nodes = e.select(F.col("a").alias("node")).union(e.select(F.col("b").alias("node")))
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    counts = (
        e.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(deg.agg(F.count(F.lit(1)).alias("n_nodes")))
        .crossJoin(
            deg.agg(
                F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges")
            )
        )
        .crossJoin(tri.agg(F.count(F.lit(1)).alias("n_triangles")))
    )
    from oracle_to_oracle_data_integration_pipeline_spark.queries._util import pround

    return counts.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            pround(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges").cast("double"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def bfs_levels(
    edges: DataFrame,
    source: str,
    max_iters: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Single-source BFS over a directed edge list (pass a symmetrized
    list for undirected semantics): per-hop-count node totals
    (dist, n_nodes) for dist ≤ ``max_iters``; unreached nodes are
    absent.

    One shuffle join + one min-aggregate per round, lineage truncated
    with ``localCheckpoint`` — the same bounded-iteration shape as
    :func:`pagerank`. The frontier table carries (node, dist) only, so
    each round's exchange is O(|reached|) longs regardless of edge
    count; at 100 TB the edges side stays partitioned by ``src`` and
    every round reuses that partitioning.
    """
    spark = edges.sparkSession
    # project to collision-proof internal names up front: a caller's
    # extra columns (e.g. a weight named 'dist' or 'node') must not
    # collide with the frontier table's
    e = edges.select(F.col(src).alias("_bfs_src"), F.col(dst).alias("_bfs_dst"))
    # 1 slice, not defaultParallelism: the seed is one row, and every
    # round joins against it — 32 near-empty partitions add 32 task
    # launches per round for nothing
    dist = spark.createDataFrame(
        spark.sparkContext.parallelize([(source, 0)], 1), "node string, dist int"
    )
    for _ in range(max_iters):
        expanded = (
            e.join(dist, e["_bfs_src"] == dist["node"])
            .select(F.col("_bfs_dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            .unionByName(dist)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        dist.unpersist(blocking=True)
        dist = expanded
    out = dist.groupBy("dist").agg(F.count(F.lit(1)).alias("n_nodes"))
    return out
