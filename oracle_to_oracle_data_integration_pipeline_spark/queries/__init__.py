"""Query registry — every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable with (where SQL-expressible) a
DuckDB oracle twin. This is the engine's correctness surface
(SURVEY.md §5): the driver hash-compares each pair at sf0.01.
"""

from __future__ import annotations

from oracle_to_oracle_data_integration_pipeline_spark.queries import (
    catalog_queries,
    format_queries,
    cdc_queries,
    io_queries,
    llm_queries,
    llm_queries2,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    partition_queries,
    streaming_queries,
)

_MODULES = [
    cdc_queries,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    partition_queries,
    catalog_queries,
    io_queries,
    format_queries,
    llm_queries,
    llm_queries2,
    streaming_queries,
]


def all_queries():
    out = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate qids: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracle_sql():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLE_SQL)
    return out
