"""Differential compare: Spark DataFrame vs DuckDB oracle SQL.

Mirrors the driver's check (row count + column names + order-insensitive
value compare) so regressions surface locally before a round ends.
Values are normalized (timestamps → ISO strings, floats → repr of the
already-query-rounded double, None → sentinel) and compared as sorted
row tuples over name-sorted columns.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # duckdb 1.0.0's statistics_propagation optimizer mishandles NULL
    # ordering through a partitioned window sort: with a NULL sort key
    # in the data, `row_number() OVER (... ORDER BY ts DESC NULLS
    # LAST)` + `WHERE rn = 1` returns NULL-key winners (and under
    # multiple threads the winner even flaps run to run — measured 45
    # distinct result sets over 50 executions of cdc_op_priority's
    # oracle on null-fuzzed data; a related symptom folds
    # `rn = 1 AND ts IS NULL` probes to EMPTY_RESULT). Disabling the
    # rule restores correct, run-stable results at ANY thread count;
    # threads=1 is kept as defense in depth. Clean-fixture sort keys
    # carry no NULLs, which is why every pre-fuzz sweep was stable.
    # The oracle is a correctness gate at tiny scale — determinism
    # matters, milliseconds don't.
    con.execute("SET threads=1")
    con.execute("SET disabled_optimizers='statistics_propagation'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return f"f:{v!r}"
    if isinstance(v, datetime.datetime):
        return "t:" + v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return "t:" + datetime.datetime(v.year, v.month, v.day).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, (int,)):
        return f"i:{v}"
    return f"s:{v}"


def _rowset(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def _pandas_gate(spark_df, rel) -> tuple[bool, str]:
    """Driver-faithful check: the driver compares toPandas() frames
    (name-sorted columns, sort_values row canonicalization, value
    hash). Two failure modes the tuple-level compare above cannot see:

    - dtype-kind drift — DuckDB un-cast integer ``sum()`` returns
      HUGEINT → pandas object dtype, vs Spark int64; values identical,
      hash differs (CORRECTNESS_r01 ``q12_priority_class``).
    - unhashable cells — raw array columns make the driver's
      ``sort_values`` raise ``TypeError: unhashable type: 'list'``
      (CORRECTNESS_r01 ``array_agg``).
    """
    s_pdf = spark_df.toPandas()
    d_pdf = rel.df()
    s_pdf.columns = [c.lower() for c in s_pdf.columns]
    d_pdf.columns = [c.lower() for c in d_pdf.columns]
    s_pdf = s_pdf[sorted(s_pdf.columns)]
    d_pdf = d_pdf[sorted(d_pdf.columns)]
    def kind(series):
        k = series.dtype.kind
        if k == "O":
            vals = series.dropna()
            # Spark DATE columns arrive as object-of-datetime.date;
            # DuckDB gives datetime64 — the driver hashes these equal
            # (date_parts was green in r01), so normalize to 'M'
            if len(vals) and isinstance(vals.iloc[0], (datetime.date, datetime.datetime)):
                return "M"
        return k

    for c in s_pdf.columns:
        sk, dk = kind(s_pdf[c]), kind(d_pdf[c])
        # empty object columns and all-NULL columns degrade arbitrarily;
        # only flag kind drift when both sides actually carry values
        if sk != dk and len(s_pdf) and s_pdf[c].notna().any() and d_pdf[c].notna().any():
            return False, (
                f"dtype-kind mismatch on '{c}': spark={s_pdf[c].dtype} "
                f"duck={d_pdf[c].dtype} (driver hash would differ)"
            )
    for side, pdf in (("spark", s_pdf), ("duck", d_pdf)):
        try:
            pdf.sort_values(list(pdf.columns))
        except TypeError as e:
            return False, f"driver canonicalizer would fail on {side} result: {e}"
    return True, "ok"


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    # persist: collect() (tuple compare) and toPandas() (driver-faithful
    # dtype gate) must see the SAME single execution — without it every
    # compare runs the full Spark query twice
    spark_df = spark_df.persist()
    try:
        s_cols = [c.lower() for c in spark_df.columns]
        s_rows = [tuple(r) for r in spark_df.collect()]
        rel = con.sql(sql)
        d_cols = [c.lower() for c in rel.columns]
        d_rows = rel.fetchall()

        if sorted(s_cols) != sorted(d_cols):
            return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
        if len(s_rows) != len(d_rows):
            return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
        a, b = _rowset(s_cols, s_rows), _rowset(d_cols, d_rows)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
            return False, f"value mismatch; first diffs: {diffs}"
        ok, msg = _pandas_gate(spark_df, rel)
        if not ok:
            return False, msg
        return True, f"ok ({len(s_rows)} rows)"
    finally:
        spark_df.unpersist()
