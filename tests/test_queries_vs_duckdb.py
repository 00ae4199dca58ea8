"""Differential tests: every registered query vs its DuckDB oracle at
sf0.01 — the same check the driver runs (SURVEY.md §5 item 1)."""

from __future__ import annotations

import pytest

from oracle_to_oracle_data_integration_pipeline_spark import queries as q
from tests.duck_compare import compare, duck_connection

QUERIES = q.all_queries()
ORACLES = q.all_oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("qid", sorted(ORACLES.keys()))
def test_query_matches_oracle(qid, spark, sf_dir, duck):
    df = QUERIES[qid](spark, sf_dir)
    ok, msg = compare(df, duck, ORACLES[qid])
    assert ok, f"{qid}: {msg}"


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle_sql without queries(): {missing}"


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle still must execute and be
    deterministic: two independent plan executions must agree row for
    row (sorted collect compare — the closest local analog of the
    driver's value hash)."""
    for qid in sorted(set(QUERIES) - set(ORACLES)):
        a = sorted(map(tuple, QUERIES[qid](spark, sf_dir).collect()))
        b = sorted(map(tuple, QUERIES[qid](spark, sf_dir).collect()))
        assert a == b, f"{qid}: nondeterministic result"
        assert len(a) >= 0, qid
