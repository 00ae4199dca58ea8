"""Pin the ASCII-only case fold (operators/text.ascii_lower_col /
ascii_upper_col and their SQL twins): the repo-wide rule that every
cross-engine case-insensitive surface folds ASCII and passes non-ASCII
through untouched.

Why the rule exists (fuzz find, unicode profile): Java — Spark's
string engine — applies FULL Unicode case mapping ('İ' lowers to 'i'
+ combining dot, 'ß' uppers to 'SS', final sigma is context-
sensitive), while DuckDB's utf8proc applies SIMPLE per-codepoint
mapping ('İ' → 'i', 'ß' → 'ß', 'Σ' → 'σ' everywhere). lower()/upper()
therefore silently produce DIFFERENT strings on the two engines, and
anything downstream of them — word filters, group keys, md5 hash
buckets, regex token counts — diverges. The divergence-reproducer
test below pins the underlying engine behavior so an engine upgrade
that changes it is caught loudly (then the fold policy can be
revisited instead of silently rotting).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.operators.text import (
    ascii_lower_col,
    ascii_upper_col,
    sql_ascii_lower,
    sql_ascii_upper,
)

HOSTILE = [
    "İstanbul ıssız I i",          # dotted/dotless I
    "straße GROSS ß",              # sharp s
    "ΣΊΣΥΦΟΣ σίσυφος ς",           # final sigma casing
    "naïve CAFÉ – Résumé",         # latin-1 accents
    "東京 データ 🚀",               # CJK + astral emoji
    "a B c　D",      # exotic whitespace
    "Plain ASCII text 0123 XYZ",
    "",
]


def _duck(sql_expr: str, s: str) -> str:
    con = duckdb.connect()
    try:
        return con.execute(f"SELECT {sql_expr}", [s]).fetchone()[0]
    finally:
        con.close()


@pytest.mark.parametrize("s", HOSTILE)
def test_ascii_fold_is_engine_identical(spark, s):
    df = spark.createDataFrame([(s,)], "x string")
    row = df.select(
        ascii_lower_col(F.col("x")).alias("lo"),
        ascii_upper_col(F.col("x")).alias("up"),
    ).first()
    assert row["lo"] == _duck(sql_ascii_lower("?"), s)
    assert row["up"] == _duck(sql_ascii_upper("?"), s)
    # the fold touches ONLY ASCII letters: everything else byte-equal
    assert [c for c in row["lo"] if not c.isascii()] == [
        c for c in s if not c.isascii()
    ]


def test_ascii_fold_equals_lower_on_ascii(spark):
    s = "Plain ASCII Text 0123 XYZ .,;|"
    df = spark.createDataFrame([(s,)], "x string")
    row = df.select(
        ascii_lower_col(F.col("x")).alias("a"), F.lower(F.col("x")).alias("l")
    ).first()
    assert row["a"] == row["l"] == s.lower()


def test_engines_full_vs_simple_case_mapping_still_diverge(spark):
    """The divergence-reproducer: if this starts failing, the pinned
    engine versions changed their case-mapping behavior and the
    ASCII-fold policy can be reconsidered."""
    java_lower = spark.createDataFrame([("İ",)], "x string").select(
        F.lower(F.col("x"))
    ).first()[0]
    duck_lower = _duck("lower(?)", "İ")
    assert java_lower == "i̇"  # full mapping: i + combining dot above
    assert duck_lower == "i"        # simple mapping: bare i
    assert java_lower != duck_lower
