"""Multi-format source/sink round-trips (SURVEY.md §2.1 source
breadth): JSON and CSV with explicit schemas (never inferSchema in a
pipeline — inference is a full extra pass and nondeterministic under
schema drift).

Timestamps are ISO-formatted on write and parsed back with an explicit
format so both engines agree on the wire representation.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.queries._util import load, local_result, scratch_dir, tune


def _rt_dir(prefix: str) -> str:
    """Round-trip scratch dir. The returned DataFrame stays LAZY over
    these files (that is the point — the driver/bench evaluate the
    real read plan), so the dir cannot be removed in a ``finally``;
    register it for process-exit cleanup instead so repeated runs
    don't accrete /tmp dirs (the sql_ddl_roundtrip leak class)."""
    d = scratch_dir(prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 101 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    )


SQL_ROUNDTRIP = """
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
FROM orders WHERE o_orderkey % 101 = 0
"""


# -- qid: json_roundtrip ----------------------------------------------

def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    out = _rt_dir("json_rt_")
    df = _subset(spark, sf_dir)
    df.write.mode("overwrite").json(out)
    back = spark.read.schema(df.schema).json(out)
    return back


# -- qid: csv_roundtrip -----------------------------------------------

def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    out = _rt_dir("csv_rt_")
    df = _subset(spark, sf_dir)
    df.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(df.schema).option("header", True).csv(out)
    return back


# -- qid: orc_roundtrip -----------------------------------------------

def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC columnar round-trip. Unlike the text formats, ORC carries
    its own typed schema and min/max stripe statistics, so the read
    back gets predicate pushdown and column pruning like parquet."""
    tune(spark)
    out = _rt_dir("orc_rt_")
    df = _subset(spark, sf_dir)
    df.write.mode("overwrite").orc(out)
    return spark.read.orc(out)


# -- qid: sql_ddl_roundtrip -------------------------------------------

def q_sql_ddl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL DDL surface end-to-end — the reference's DDL
    extract/replay pattern (scripts/02_clone_schema_structure.py)
    driven entirely through spark.sql: CREATE TABLE (parquet-backed
    table at an explicit fresh LOCATION — a default-location managed
    table would land in $PWD/spark-warehouse and accrete rows across
    executions), ALTER TABLE ADD COLUMNS (the CDC-column evolution
    step, scripts/01_prepare_cdc_columns:20-38), INSERT INTO ... SELECT
    from a registered view, then read back through the catalog.

    The readback is materialized EAGERLY (nation is 25 rows — catalog
    metadata scale) so the table can be dropped and its location
    removed in the ``finally`` before returning: no tempdir survives
    the call, no table stays registered, no module-global state — the
    qid is hermetic under repetition and concurrent sessions. The
    distributed-write plan under test (CTAS + INSERT INTO) is
    unaffected; only the 25-row verification readback is local."""
    tune(spark)
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_src")
    spark.sql("DROP TABLE IF EXISTS ddl_rt_nation")
    loc = scratch_dir("ddl_rt_")
    try:
        spark.sql(
            f"""CREATE TABLE ddl_rt_nation (
                   n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT
               ) USING parquet LOCATION '{loc}'"""
        )
        spark.sql("ALTER TABLE ddl_rt_nation ADD COLUMNS (load_tag STRING)")
        spark.sql(
            """INSERT INTO ddl_rt_nation
               SELECT n_nationkey, n_name, n_regionkey, 'batch1' AS load_tag
               FROM nation_src"""
        )
        readback = spark.sql(
            "SELECT n_nationkey, n_name, n_regionkey, load_tag FROM ddl_rt_nation"
        )
        rows = readback.collect()
        return local_result(spark, rows, readback.schema)
    finally:
        spark.sql("DROP TABLE IF EXISTS ddl_rt_nation")
        shutil.rmtree(loc, ignore_errors=True)


SQL_SQL_DDL_ROUNDTRIP = """
SELECT n_nationkey, n_name, n_regionkey, 'batch1' AS load_tag FROM nation
"""


# -- qid: binary_ingest ------------------------------------------------

BIN_INGEST_MAX_ID = 100  # fixture prep writes at most this many files


def q_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-file multimodal ingest through Spark's built-in
    ``binaryFile`` source — the missing first step of a media
    pipeline: a DIRECTORY OF OPAQUE FILES (not a parquet column)
    becomes (path, length, content) rows, ids are parsed from
    filenames, and the stdlib BMP decoder runs distributed over the
    contents (same ``decode_media`` dispatch as the media_* qids).
    The ``length_matches`` flag cross-checks the source's file-length
    metadata against the size the PARSED HEADER implies
    (54-byte header + 4-byte-aligned rows × height) — a truncated or
    padded file flips the flag even though ``len(payload)`` would
    trivially equal the file length.

    Harness prep (bounded control plane): at most BIN_INGEST_MAX_ID
    documents are rendered to one .bmp file each, driver-side — at
    100 TB the files already exist on object storage and ONLY the
    binaryFile read + mapInPandas decode below runs, both fully
    distributed. The result is materialized eagerly (≤100 rows) so
    the scratch dir can be removed in the ``finally``."""
    import pandas as pd

    from oracle_to_oracle_data_integration_pipeline_spark.operators.media_codecs import (
        encode_bmp,
    )

    tune(spark)
    docs = (
        load(spark, sf_dir, "documents")
        # NULL text can't render to a file — excluded explicitly on
        # BOTH sides (the oracle carries the same predicate) instead
        # of crashing the prep loop on .encode
        .where((F.col("doc_id") < BIN_INGEST_MAX_ID) & F.col("text").isNotNull())
        .select("doc_id", "text")
        .collect()
    )
    media_dir = scratch_dir("bin_ingest_")
    try:
        for r in docs:
            b = r["text"].encode("utf-8")
            w, h = len(b) % 31 + 1, len(b) % 17 + 1
            with open(os.path.join(media_dir, f"{r['doc_id']:08d}.bmp"), "wb") as f:
                f.write(encode_bmp(w, h, b))

        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.bmp")
            .load(media_dir)
            .select(
                F.regexp_extract(F.col("path"), r"(\d+)\.bmp$", 1)
                .cast("long")
                .alias("doc_id"),
                F.col("length").cast("int").alias("length"),
                "content",
            )
        )

        def decode(it):
            from oracle_to_oracle_data_integration_pipeline_spark.operators.multimodal import (
                decode_media,
            )

            for pdf in it:
                rows = []
                for doc_id, length, content in zip(
                    pdf["doc_id"], pdf["length"], pdf["content"]
                ):
                    m = decode_media(bytes(content))
                    # Header-derived expected size, NOT len(payload):
                    # BMP rows are padded to 4 bytes, so expected =
                    # 54 + row_size * height from the parsed dims. A
                    # file truncated or padded after the header fails
                    # this check; comparing against len(payload) could
                    # not (binaryFile's length IS len(payload)).
                    row_size = (m["width"] * 3 + 3) // 4 * 4
                    expected = 54 + row_size * m["height"]
                    rows.append(
                        (doc_id, m["fmt"], m["width"], m["height"],
                         m["n_bytes"], int(length == expected))
                    )
                yield pd.DataFrame(
                    rows,
                    columns=["doc_id", "fmt", "width", "height",
                             "n_bytes", "length_matches"],
                )

        out = files.mapInPandas(
            decode,
            "doc_id long, fmt string, width int, height int, "
            "n_bytes int, length_matches int",
        )
        rows = out.collect()
        return local_result(spark, rows, out.schema)
    finally:
        shutil.rmtree(media_dir, ignore_errors=True)


SQL_BINARY_INGEST = f"""
WITH p AS (
  SELECT doc_id, octet_length(encode(text)) AS n FROM documents
  WHERE doc_id < {BIN_INGEST_MAX_ID} AND text IS NOT NULL
),
d AS (SELECT doc_id, n % 31 + 1 AS w, n % 17 + 1 AS h FROM p)
SELECT doc_id, 'bmp' AS fmt, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(54 + ((w * 3 + 3) // 4) * 4 * h AS INT) AS n_bytes,
       CAST(1 AS INT) AS length_matches
FROM d
"""


# -- qid: schema_union (snapshot union under schema evolution) --------

def q_schema_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union two corpus snapshots whose schemas have drifted — the
    data-plane dual of the reference's control-plane ALTER TABLE ADD
    (`scripts/01_prepare_cdc_columns:20-38`): instead of mutating the
    old table, ``unionByName(allowMissingColumns=True)`` aligns by
    NAME (positional UNION would silently mis-bind drifted columns)
    and NULL-fills what a snapshot predates.

    v1 (docs with doc_id%3==0) lacks ``source``/``n_chars`` (pre-drift
    schema); v2 carries them plus a derived ``quality_tier`` that v1
    predates. The per-(snapshot, lang) rollup then counts NULL-filled
    cells — exactly the audit a crawl-merge job runs before training
    on a mixed-vintage corpus.

    Scale: the union is NARROW (no shuffle — each snapshot's files map
    straight through); the only exchange is the final combinable
    aggregation. Both branches keep their own pushed filters and
    pruned read schemas (v1 never reads source/n_chars).
    """
    d = load(spark, sf_dir, "documents")
    v1 = (
        d.filter(F.col("doc_id") % 3 == 0)
        .select("doc_id", "text", "lang")
        .withColumn("snapshot", F.lit("v1"))
    )
    v2 = (
        d.filter(F.col("doc_id") % 3 != 0)
        .select(
            "doc_id",
            "text",
            "lang",
            "source",
            "n_chars",
            F.when(F.col("n_chars") >= 500, F.lit("long"))
            .otherwise(F.lit("short"))
            .alias("quality_tier"),
        )
        .withColumn("snapshot", F.lit("v2"))
    )
    merged = v1.unionByName(v2, allowMissingColumns=True)
    return (
        merged.groupBy("snapshot", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("source").isNull().cast("bigint")).alias("null_source"),
            F.sum(F.col("quality_tier").isNull().cast("bigint")).alias("null_tier"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).alias("sum_chars"),
        )
        .orderBy("snapshot", "lang")
    )


SQL_SCHEMA_UNION = """
WITH v1 AS (
  SELECT doc_id, text, lang,
         CAST(NULL AS VARCHAR) AS source, CAST(NULL AS BIGINT) AS n_chars,
         CAST(NULL AS VARCHAR) AS quality_tier, 'v1' AS snapshot
  FROM documents WHERE doc_id % 3 = 0
), v2 AS (
  SELECT doc_id, text, lang, source, n_chars,
         CASE WHEN n_chars >= 500 THEN 'long' ELSE 'short' END AS quality_tier,
         'v2' AS snapshot
  FROM documents WHERE doc_id % 3 <> 0
), merged AS (
  SELECT * FROM v1 UNION ALL SELECT * FROM v2
)
SELECT snapshot, lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_source,
       CAST(sum(CASE WHEN quality_tier IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_tier,
       CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS sum_chars
FROM merged
GROUP BY snapshot, lang
ORDER BY snapshot, lang
"""


QUERIES = {
    "sql_ddl_roundtrip": q_sql_ddl_roundtrip,
    "json_roundtrip": q_json_roundtrip,
    "csv_roundtrip": q_csv_roundtrip,
    "orc_roundtrip": q_orc_roundtrip,
    "binary_ingest": q_binary_ingest,
    "schema_union": q_schema_union,
}

ORACLE_SQL = {
    "sql_ddl_roundtrip": SQL_SQL_DDL_ROUNDTRIP,
    "json_roundtrip": SQL_ROUNDTRIP,
    "csv_roundtrip": SQL_ROUNDTRIP,
    "orc_roundtrip": SQL_ROUNDTRIP,
    "binary_ingest": SQL_BINARY_INGEST,
    "schema_union": SQL_SCHEMA_UNION,
}


# -- qid: csv_quarantine -----------------------------------------------------

CSVQ_ROWS = 40
CSVQ_BAD_MOD = 7  # lines with i % 7 == 3 are malformed


def q_csv_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read ingestion with a QUARANTINE lane: a CSV feed
    containing malformed lines is read in PERMISSIVE mode with a
    corrupt-record column — clean rows parse to the declared types,
    malformed lines survive VERBATIM in the quarantine column instead
    of killing the job (FAILFAST) or silently vanishing (DROPMALFORMED).
    The pattern every file-drop ingestion needs: load what parses,
    keep evidence of what didn't.

    Harness prep: the file is generated deterministically (line i is
    malformed iff i % {CSVQ_BAD_MOD} == 3), so the DuckDB oracle
    regenerates the expected outcome from the same rule. Spark quirk
    handled: a query may not reference ONLY the corrupt-record column
    of a CSV relation — the read is cached/materialized first (the
    documented workaround), bounded here by the fixture size.

    Scale: PERMISSIVE parsing is per-task streaming — the quarantine
    column adds no shuffle; production routes `_corrupt IS NOT NULL`
    to a dead-letter sink with the same one-pass plan."""
    import shutil

    from pyspark.sql import types as T

    tune(spark)
    d = scratch_dir("csvq_")
    try:
        lines = ["id,qty,price"]
        for i in range(CSVQ_ROWS):
            if i % CSVQ_BAD_MOD == 3:
                lines.append(f"bad-{i},oops")
            else:
                lines.append(f"{i},{i * 2},{i}.5")
        with open(os.path.join(d, "feed.csv"), "w") as f:
            f.write("\n".join(lines) + "\n")
        schema = T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField("qty", T.IntegerType()),
                T.StructField("price", T.DoubleType()),
                T.StructField("_corrupt", T.StringType()),
            ]
        )
        df = (
            spark.read.schema(schema)
            .option("header", "true")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .csv(d)
        )
        rows = df.collect()  # materialize: corrupt-col-only refs are illegal on raw CSV relations
        out = local_result(spark, rows, schema).select(
            F.when(F.col("_corrupt").isNull(), F.lit("clean"))
            .otherwise(F.lit("quarantined"))
            .alias("lane"),
            "id",
            "qty",
            "price",
            F.col("_corrupt").alias("raw"),
        )
        return out
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_CSV_QUARANTINE = f"""
WITH g AS (SELECT unnest(generate_series(0, {CSVQ_ROWS - 1})) AS i)
SELECT CASE WHEN i % {CSVQ_BAD_MOD} = 3 THEN 'quarantined' ELSE 'clean' END
         AS lane,
       CASE WHEN i % {CSVQ_BAD_MOD} = 3 THEN NULL ELSE CAST(i AS INT) END AS id,
       CASE WHEN i % {CSVQ_BAD_MOD} = 3 THEN NULL ELSE CAST(i * 2 AS INT) END
         AS qty,
       CASE WHEN i % {CSVQ_BAD_MOD} = 3 THEN NULL
            ELSE CAST(i AS DOUBLE) + 0.5 END AS price,
       CASE WHEN i % {CSVQ_BAD_MOD} = 3
            THEN 'bad-' || CAST(i AS VARCHAR) || ',oops' END AS raw
FROM g
"""

QUERIES["csv_quarantine"] = q_csv_quarantine
ORACLE_SQL["csv_quarantine"] = SQL_CSV_QUARANTINE
