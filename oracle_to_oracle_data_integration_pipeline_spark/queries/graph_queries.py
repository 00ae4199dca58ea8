"""Graph qid: PageRank over the customer↔supplier trade graph
(operators/graph.py). The DuckDB twin unrolls the same 5 iterations as
chained CTEs — same decimal-exact inflow sums, same expression-form
teleport/damping arithmetic — so the differential compare is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load

PR_ITERS = 5
PR_DAMPING = 0.85


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node importance in the trade network: symmetric edges between
    customers and the suppliers whose parts they bought (distinct
    (custkey, suppkey) pairs via lineitem⋈orders), 5 PageRank rounds."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.graph import pagerank

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    sym = pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return pagerank(sym, damping=PR_DAMPING, iters=PR_ITERS)


def _pagerank_sql() -> str:
    blocks = ["""
WITH e0 AS (
  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT count(*) AS n_nodes FROM nodes),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
b AS (SELECT node, n_nodes FROM nodes, nn),
r0 AS (SELECT node, n_nodes, 1e0 / n_nodes AS rank FROM b)"""]
    for i in range(1, PR_ITERS + 1):
        blocks.append(f""",
m{i} AS (
  SELECT e.dst,
         CAST(sum(CAST(floor(r.rank / deg.deg * 1e15 + 0.5) AS BIGINT)) AS DOUBLE) / 1e15 AS m
  FROM e JOIN deg ON deg.src = e.src JOIN r{i-1} r ON r.node = e.src
  GROUP BY e.dst
),
r{i} AS (
  SELECT b.node, b.n_nodes,
         (1e0 - {PR_DAMPING}e0) / b.n_nodes + {PR_DAMPING}e0 * COALESCE(m{i}.m, 0e0) AS rank
  FROM b LEFT JOIN m{i} ON m{i}.dst = b.node
)""")
    blocks.append(f"\nSELECT node, rank FROM r{PR_ITERS}")
    return "".join(blocks)


SQL_PAGERANK = _pagerank_sql()


# -- qid: triangle_count -----------------------------------------------

TRI_USERS = 100


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the user co-activity graph: an edge links two
    users active in the same (event_type, hour) bucket. The node set is
    capped (user_id < 100) so the graph — and therefore the Σdeg²
    wedge cost — stays bounded while larger SFs only densify edges up
    to the C(100,2) cap; the edge build itself is a per-bucket
    self-join bounded by bucket occupancy, not corpus size."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.graph import (
        triangle_count,
    )

    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id") < TRI_USERS)
        .select(
            "user_id",
            F.col("event_type").alias("et"),
            F.date_trunc("hour", F.col("ts")).alias("hr"),
        )
        .distinct()
    )
    u = ev.alias("u")
    v = ev.alias("v")
    edges = (
        u.join(
            v,
            (F.col("u.et") == F.col("v.et"))
            & (F.col("u.hr") == F.col("v.hr"))
            & (F.col("u.user_id") < F.col("v.user_id")),
        )
        .select(F.col("u.user_id").alias("a"), F.col("v.user_id").alias("b"))
        .distinct()
    )
    # the operator references its edge input SIX times (two wedge
    # legs, the closing join, both degree-table branches, the edge
    # count) and Catalyst does not dedupe common subplans — uncached,
    # the whole per-bucket self-join + distinct re-ran per consumer
    # (round 11: plan had 22 exchanges). The edge list is bounded here
    # (≤ C(TRI_USERS, 2) rows by the node cap), so one eager local
    # checkpoint is driver-scale and cuts the rebuild to one pass.
    edges = edges.localCheckpoint(eager=True)
    return triangle_count(edges)


SQL_TRIANGLE_COUNT = f"""
WITH act AS (
  SELECT DISTINCT user_id, event_type AS et, date_trunc('hour', ts) AS hr
  FROM events WHERE user_id < {TRI_USERS}
),
e AS (
  SELECT DISTINCT u.user_id AS a, v.user_id AS b
  FROM act u JOIN act v
    ON u.et = v.et AND u.hr = v.hr AND u.user_id < v.user_id
),
w AS (
  SELECT x.b AS wa, y.b AS wb
  FROM e x JOIN e y ON x.a = y.a AND x.b < y.b
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM w JOIN e z ON w.wa = z.a AND w.wb = z.b
),
deg AS (
  SELECT node, count(*) AS d
  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
  GROUP BY node
),
wn AS (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges FROM deg)
SELECT (SELECT count(*) FROM deg) AS n_nodes,
       (SELECT count(*) FROM e) AS n_edges,
       (SELECT n_wedges FROM wn) AS n_wedges,
       (SELECT n_triangles FROM tri) AS n_triangles,
       CASE WHEN (SELECT n_wedges FROM wn) > 0
            THEN floor(3.0 * (SELECT n_triangles FROM tri)
                       / CAST((SELECT n_wedges FROM wn) AS DOUBLE)
                       * 1000000.0 + 0.5) / 1000000.0
            ELSE 0.0 END AS clustering
"""


# -- qid: bfs_levels ---------------------------------------------------

BFS_SOURCE = "c1"
BFS_ITERS = 4


def q_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How far does influence travel in the trade network? Node counts
    per BFS hop from customer 1 over the same symmetric
    customer↔supplier graph PageRank scores (dist ≤ 4)."""
    from oracle_to_oracle_data_integration_pipeline_spark.operators.graph import bfs_levels

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    sym = pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return bfs_levels(sym, BFS_SOURCE, max_iters=BFS_ITERS)


def _bfs_sql() -> str:
    blocks = [f"""
WITH e0 AS (
  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
d0(node, dist) AS (SELECT '{BFS_SOURCE}', 0)"""]
    for i in range(1, BFS_ITERS + 1):
        blocks.append(f""",
d{i} AS (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d{i - 1}
    UNION ALL
    SELECT e.dst AS node, d.dist + 1 AS dist
    FROM e JOIN d{i - 1} d ON e.src = d.node
  ) GROUP BY node
)""")
    blocks.append(f"""
SELECT CAST(dist AS INT) AS dist, count(*) AS n_nodes
FROM d{BFS_ITERS} GROUP BY dist""")
    return "".join(blocks)


SQL_BFS_LEVELS = _bfs_sql()


QUERIES = {
    "pagerank": q_pagerank,
    "triangle_count": q_triangle_count,
    "bfs_levels": q_bfs_levels,
}

ORACLE_SQL = {
    "pagerank": SQL_PAGERANK,
    "triangle_count": SQL_TRIANGLE_COUNT,
    "bfs_levels": SQL_BFS_LEVELS,
}
