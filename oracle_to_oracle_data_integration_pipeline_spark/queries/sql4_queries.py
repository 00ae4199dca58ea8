"""Modern SQL surface (Spark 4.x additions): recursive CTEs, the
VARIANT semi-structured type, the native XML source, and ordered
LISTAGG. These complete the engine's SQL-standard coverage beyond the
reference's Oracle dialect (the reference leans on Oracle features —
CONNECT BY hierarchies, JSON_TABLE shredding, XMLTYPE staging tables,
LISTAGG reports — that scripts/*.py would reach through raw SQL;
here each is the portable ANSI/Spark-native equivalent).

Scale notes:
- ``recursive_cte`` executes as an iterative ``UnionLoop``: one
  distributed join per recursion level (O(depth) jobs, NOT O(rows)),
  with the frontier shrinking each step. Hierarchy depth for n keys
  is ~log2(n), so even a billion-row dimension is ~30 iterations.
- ``variant_shred`` stays entirely JVM-side: ``parse_json`` produces
  the binary VARIANT encoding once per row and ``variant_get`` reads
  the typed path without re-parsing text per access — the shredding
  never leaves whole-stage codegen, no Python UDF.
- ``xml_roundtrip`` reads back through the built-in distributed XML
  source (one task per file split), schema supplied explicitly —
  never inferSchema (a full extra pass).
- ``listagg_order`` is a sort-based aggregation whose per-group
  payload is the concatenated string: bounded here by suppliers per
  nation; at 100 TB you cap or bucket the group (see grouped_topk)
  before LISTAGG, never concatenate an unbounded group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load, pround, tune

from oracle_to_oracle_data_integration_pipeline_spark.queries.format_queries import _rt_dir


# -- qid: recursive_cte -----------------------------------------------

def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE over an implicit supplier hierarchy (binary
    tree: parent(k) = (k-1) DIV 2, root = key 0) — the portable form
    of Oracle CONNECT BY (the reference's FK-dependency ordering,
    scripts/02_clone_schema_structure.py topological walk, is the
    same transitive-closure shape; see plans/topo.py for the
    driver-side variant over catalog edges).

    Computes per supplier its depth and the root-to-node running
    account-balance total. The recursion is the standard iterative
    semantics both engines share: anchor ∪ step applied to the
    previous frontier until empty — here ~log2(n) iterations, each a
    frontier⋈dimension join Spark distributes (and can broadcast,
    since a frontier level of a b-ary tree is at most (b-1)/b of the
    remaining keys)."""
    tune(spark)
    load(spark, sf_dir, "supplier").createOrReplaceTempView("rc_supplier")
    return spark.sql(
        """
        WITH RECURSIVE tree(s_suppkey, depth, path_bal) AS (
            SELECT s_suppkey, 0, CAST(s_acctbal AS DECIMAL(24,6))
            FROM rc_supplier WHERE s_suppkey = 0
            UNION ALL
            SELECT c.s_suppkey, p.depth + 1,
                   CAST(p.path_bal + CAST(c.s_acctbal AS DECIMAL(24,6))
                        AS DECIMAL(24,6))
            FROM tree p
            JOIN rc_supplier c
              ON (c.s_suppkey - 1) DIV 2 = p.s_suppkey
            WHERE c.s_suppkey > 0
        )
        SELECT s_suppkey, depth,
               CAST(round(path_bal, 2) AS DOUBLE) AS path_bal
        FROM tree
        ORDER BY s_suppkey
        """
    )


SQL_RECURSIVE_CTE = """
WITH RECURSIVE tree(s_suppkey, depth, path_bal) AS (
    SELECT s_suppkey, 0, CAST(s_acctbal AS DECIMAL(24,6))
    FROM supplier WHERE s_suppkey = 0
    UNION ALL
    SELECT c.s_suppkey, p.depth + 1,
           CAST(p.path_bal + CAST(c.s_acctbal AS DECIMAL(24,6))
                AS DECIMAL(24,6))
    FROM tree p
    JOIN supplier c
      ON CAST(floor((c.s_suppkey - 1) / 2) AS BIGINT) = p.s_suppkey
    WHERE c.s_suppkey > 0
)
SELECT s_suppkey, CAST(depth AS INT) AS depth,
       CAST(round(path_bal, 2) AS DOUBLE) AS path_bal
FROM tree
ORDER BY s_suppkey
"""


# -- qid: variant_shred -----------------------------------------------

def q_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured shredding through the Spark 4 VARIANT type:
    ``parse_json`` encodes events.props once into the binary VARIANT
    form, ``variant_get`` extracts the typed path ('$.k' as int)
    without any per-access text re-parse — the open-format analog of
    Oracle JSON_TABLE the reference would use for payload columns.

    Aggregates per event_type over the extracted field. Whole plan is
    codegen'd JVM columnar; the VARIANT never round-trips through
    Python. try_parse_json / try_variant_get, not the throwing forms:
    one malformed payload row must shred to NULL, not kill a 100 TB
    job (fuzz find, unicode profile — parse_json FAILFAST crashed on
    a truncated JSON document; the oracle mirrors with a json_valid
    guard, and the string-number coercion '{"k": "12"}' -> 12 was
    verified identical on both engines)."""
    tune(spark)
    e = load(spark, sf_dir, "events").select(
        "event_type", F.try_parse_json(F.col("props")).alias("v")
    )
    shredded = e.select(
        "event_type", F.expr("try_variant_get(v, '$.k', 'int')").alias("k")
    )
    return (
        shredded.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


SQL_VARIANT_SHRED = """
SELECT event_type,
       count(*) AS n_events,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       max(k) AS max_k
FROM (SELECT event_type,
             CAST(CASE WHEN json_valid(props) THEN props->>'$.k' END AS INTEGER) AS k
      FROM events) t
GROUP BY event_type
ORDER BY event_type
"""


# -- qid: xml_roundtrip ------------------------------------------------

def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML source/sink round-trip (Spark 4 built-in ``xml``
    format — the open analog of the reference staging through Oracle
    XMLTYPE): write an orders subset as <order> row elements, read it
    back with the explicit schema. The read is a distributed text
    scan split per file; no driver-side parsing."""
    tune(spark)
    out = _rt_dir("xml_rt_")
    df = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 101 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    (
        df.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "orders")
        .option("rowTag", "order")
        .save(out)
    )
    return (
        spark.read.format("xml")
        .schema(df.schema)
        .option("rowTag", "order")
        .load(out)
    )


SQL_XML_ROUNDTRIP = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders WHERE o_orderkey % 101 = 0
"""


# -- qid: listagg_order ------------------------------------------------

def q_listagg_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — SQL:2023 LISTAGG ... WITHIN GROUP,
    the exact construct the reference's Oracle reports use (Oracle
    LISTAGG) for per-group name rosters. Per nation: the
    alphabetical supplier roster and its size.

    The WITHIN GROUP ordering makes the concatenation deterministic
    under any shuffle/merge order — the property the differential
    hash needs and production re-runs want."""
    tune(spark)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nkey"), "n_name"
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == F.col("nkey"))
        .groupBy("n_name")
        .agg(
            F.expr(
                "listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name)"
            ).alias("supplier_csv"),
            F.count("*").alias("n_sup"),
        )
        .orderBy("n_name")
    )


SQL_LISTAGG_ORDER = """
SELECT n_name,
       string_agg(s_name, ',' ORDER BY s_name) AS supplier_csv,
       count(*) AS n_sup
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


QUERIES = {
    "recursive_cte": q_recursive_cte,
    "variant_shred": q_variant_shred,
    "xml_roundtrip": q_xml_roundtrip,
    "listagg_order": q_listagg_order,
}

ORACLE_SQL = {
    "recursive_cte": SQL_RECURSIVE_CTE,
    "variant_shred": SQL_VARIANT_SHRED,
    "xml_roundtrip": SQL_XML_ROUNDTRIP,
    "listagg_order": SQL_LISTAGG_ORDER,
}


# -- qid: json_schema_infer ---------------------------------------------

def q_json_schema_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed-schema inference over a semi-structured JSON column —
    the schema-on-read governance profile (key → value type →
    occurrence share) a pipeline needs BEFORE it can shred a feed
    with drifting producers: which keys exist, how often, and whether
    any key carries mixed types (the silent poison for a static
    ``from_json`` schema). The fixture's own props column is
    schema-stable, so the harness synthesizes the drift every real
    JSON feed accumulates: an always-present number id, a
    sometimes-present string status, a price that flips between
    number and STRING-wrapped number (the classic producer
    regression), and an occasional array.

    Spark shape: keys explode via ``json_object_keys`` and each
    value's type comes from ``schema_of_variant(variant_get(
    parse_json(j), '$.'||key))`` — the binary VARIANT is built once
    per row and every per-key probe reads it without re-parsing text;
    engine-specific type names collapse to a canonical
    {number,string,array,object,boolean,null} set on BOTH engines so
    the differential compares semantics, not spellings.

    Scale: one scan, one generate (rows × keys-per-row), one
    combinable (key, type) aggregate, and a 1-row total broadcast for
    the share — no window, nothing driver-side."""
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    price = F.col("o_totalprice").cast("decimal(18,2)").cast("string")
    j = F.concat(
        F.lit('{"id": '), k.cast("string"),
        F.when(k % 3 == 0,
               F.concat(F.lit(', "status": "'), F.col("o_orderstatus"), F.lit('"'))
               ).otherwise(F.lit("")),
        F.when(k % 5 == 0, F.concat(F.lit(', "price": "'), price, F.lit('"'))
               ).otherwise(F.concat(F.lit(', "price": '), price)),
        F.when(k % 7 == 0,
               F.concat(F.lit(', "tags": ['), (k % 10).cast("string"),
                        F.lit(", "), ((k + 1) % 10).cast("string"), F.lit("]"))
               ).otherwise(F.lit("")),
        F.lit("}"),
    )
    docs = o.select(j.alias("j"))
    typed = docs.select(
        F.explode(F.json_object_keys("j")).alias("json_key"), "j"
    ).withColumn(
        "raw_type",
        F.expr(
            "schema_of_variant(variant_get(parse_json(j), concat('$.', json_key)))"
        ),
    )
    vtype = (
        F.when(F.col("raw_type").startswith("ARRAY"), "array")
        .when(F.col("raw_type") == "STRING", "string")
        .when(F.col("raw_type") == "BOOLEAN", "boolean")
        .when(
            F.col("raw_type").startswith("STRUCT")
            | F.col("raw_type").startswith("OBJECT")
            | F.col("raw_type").startswith("MAP"),
            "object",
        )
        .when(F.col("raw_type").isin("VOID", "NULL"), "null")
        .otherwise("number")
    )
    counts = typed.groupBy("json_key", vtype.alias("vtype")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = docs.agg(F.count(F.lit(1)).alias("_total"))
    return counts.join(F.broadcast(total)).select(
        "json_key",
        "vtype",
        "n",
        pround(F.col("n") / F.col("_total")).alias("share"),
    )


SQL_JSON_SCHEMA_INFER = """
WITH docs AS (
  SELECT '{"id": ' || o_orderkey
         || CASE WHEN o_orderkey % 3 = 0
                 THEN ', "status": "' || o_orderstatus || '"' ELSE '' END
         || CASE WHEN o_orderkey % 5 = 0
                 THEN ', "price": "' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || '"'
                 ELSE ', "price": ' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) END
         || CASE WHEN o_orderkey % 7 = 0
                 THEN ', "tags": [' || o_orderkey % 10 || ', ' || (o_orderkey + 1) % 10 || ']'
                 ELSE '' END
         || '}' AS j
  FROM orders
),
typed AS (
  SELECT k.json_key,
         CASE json_type(j::JSON, '$.' || k.json_key)
           WHEN 'VARCHAR' THEN 'string'
           WHEN 'ARRAY' THEN 'array'
           WHEN 'BOOLEAN' THEN 'boolean'
           WHEN 'OBJECT' THEN 'object'
           WHEN 'NULL' THEN 'null'
           ELSE 'number'
         END AS vtype
  FROM docs, unnest(json_keys(j::JSON)) AS k(json_key)
),
total AS (SELECT count(*) AS t FROM docs)
SELECT json_key, vtype, count(*) AS n,
       floor((CAST(count(*) AS DOUBLE) / (SELECT t FROM total)) * 1e6 + 0.5)
         / 1e6 AS share
FROM typed
GROUP BY 1, 2
"""

QUERIES["json_schema_infer"] = q_json_schema_infer
ORACLE_SQL["json_schema_infer"] = SQL_JSON_SCHEMA_INFER
