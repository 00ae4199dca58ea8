"""Vacuous-oracle tripwire: a qid whose oracle returns 0 rows passes
the differential compare trivially (0 == 0 rows, empty hash == empty
hash) while verifying nothing. Every registered oracle must therefore
produce rows at sf0.01 — except the documented allowlist, where empty
IS the semantics under test.

DuckDB-only (no Spark session), so the whole registry sweeps in
seconds; if the Spark side returned rows while the oracle didn't, the
row-count compare would already fail — the blind spot is exactly
both-sides-empty, which this closes.
"""

from __future__ import annotations

import pytest

from oracle_to_oracle_data_integration_pipeline_spark import queries as q
from tests.duck_compare import duck_connection

# empty BY DESIGN, with the reason stated
ALLOWED_EMPTY = {
    "empty_clone": "clones an EMPTY staging table — the contract is "
    "schema fidelity at 0 rows",
}


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_connection(sf_dir)


def test_every_oracle_returns_rows(con):
    empty = []
    for qid, sql in q.all_oracle_sql().items():
        if len(con.sql(sql).fetchall()) == 0 and qid not in ALLOWED_EMPTY:
            empty.append(qid)
    assert empty == [], f"vacuous oracles (0 rows at sf0.01): {empty}"


def test_allowlist_is_tight(con):
    """The allowlist must stay exact: if an allowed-empty oracle starts
    returning rows, the entry is stale — remove it so the tripwire
    re-arms for that qid."""
    osql = q.all_oracle_sql()
    for qid in ALLOWED_EMPTY:
        assert qid in osql, f"allowlisted qid {qid!r} no longer registered"
        assert len(con.sql(osql[qid]).fetchall()) == 0, (
            f"{qid!r} now returns rows — drop it from ALLOWED_EMPTY"
        )
