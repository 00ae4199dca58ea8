"""Clustering qids: distributed k-means fit+assign over the embeddings
table (operators/clustering.py). The DuckDB twin unrolls the same two
Lloyd iterations — deterministic init (k lowest ids), decimal-exact
centroid means, lexicographic (dist, cid) argmin — so the differential
compare checks the full iterative computation, not just one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from oracle_to_oracle_data_integration_pipeline_spark.operators.clustering import (
    kmeans_fit_assign,
)
from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load

K = 8


# -- qid: kmeans_assign (2 Lloyd iterations, fitted cells) ------------

def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans_fit_assign(load(spark, sf_dir, "embeddings"), k=K, n_iter=2)


_D = "list_sum(list_transform(generate_series(1, len(ve)), i -> (ve[i] - cv[i]) * (ve[i] - cv[i])))"

SQL_KMEANS_ASSIGN = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
cents0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, ve AS cv
  FROM (SELECT vec_id, ve FROM v ORDER BY vec_id LIMIT {K})
),
a1 AS (
  SELECT vec_id, ve, cid, dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM (SELECT v.vec_id, v.ve, c.cid, {_D} AS dist FROM v, cents0 c)
),
asg1 AS (SELECT vec_id, ve, cid FROM a1 WHERE rn = 1),
sums1 AS (
  SELECT cid, pos,
         CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS m
  FROM (
    SELECT cid, unnest(generate_series(1, len(ve))) AS pos, unnest(ve) AS x
    FROM asg1
  )
  GROUP BY cid, pos
),
cents1 AS (SELECT cid, list(m ORDER BY pos) AS cv FROM sums1 GROUP BY cid),
a2 AS (
  SELECT vec_id, cid, dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM (SELECT v.vec_id, c.cid, {_D} AS dist FROM v, cents1 c)
)
SELECT vec_id, CAST(cid AS INT) AS cluster_id,
       floor(dist * 1e6 + 0.5) / 1e6 AS dist
FROM a2 WHERE rn = 1
"""


QUERIES = {"kmeans_assign": q_kmeans_assign}
ORACLE_SQL = {"kmeans_assign": SQL_KMEANS_ASSIGN}
