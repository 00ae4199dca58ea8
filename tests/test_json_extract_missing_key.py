"""json_extract denominator semantics: avg_k divides by count(*) on
BOTH engines, so a row whose props lacks `$.k` (NULL after extraction)
still counts in the denominator — the fixture has no such row, so this
pins the contract on synthesized data (VERDICT r01 item 7)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def test_missing_key_counts_in_denominator(spark):
    rows = [
        ("a", '{"k": 10}'),
        ("a", '{"k": 20}'),
        ("a", '{"other": 1}'),  # no $.k → NULL
        ("b", "{}"),            # no $.k at all
    ]
    df = spark.createDataFrame(rows, "event_type string, props string")
    got = (
        df.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.round(F.sum("k").cast("double") / F.count(F.lit(1)), 6).alias("avg_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    spark_rows = {r["event_type"]: (r["sum_k"], r["avg_k"], r["n"]) for r in got.collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_type VARCHAR, props VARCHAR);"
        "INSERT INTO events VALUES "
        + ",".join(f"('{t}', '{p}')" for t, p in rows)
    )
    duck_rows = {
        t: (s, a, n)
        for t, s, a, n in con.execute(
            """
            SELECT event_type,
                   CAST(sum(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS sum_k,
                   round(CAST(sum(CAST(props ->> '$.k' AS BIGINT)) AS DOUBLE) / count(*), 6) AS avg_k,
                   count(*) AS n
            FROM events GROUP BY event_type
            """
        ).fetchall()
    }
    assert spark_rows == duck_rows
    # group with some k: avg divides by ALL rows (3), not non-null (2)
    assert spark_rows["a"] == (30, 10.0, 3)
    # group with no k anywhere: NULL sum, NULL avg, full count
    assert spark_rows["b"] == (None, None, 1)
