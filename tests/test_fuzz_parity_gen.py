"""Pin the adversarial-fixture generator (tools/fuzz_parity.py): every
profile must preserve the schema CONTRACT the queries assume — arrow
types bit-equal to the base fixture, unique primary keys, valid
foreign keys, the documented non-null columns — while actually
producing its hazard (ties / nulls / a hot key / near-empty groups).
JVM-free: pure pyarrow + duckdb.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import duckdb
import pyarrow.parquet as pq
import pytest

from tools.fuzz_parity import PROFILES, TABLES, build_fuzzed_dir

BASE = "/root/testdata/sf0.001"

PKS = [
    ("region", "r_regionkey"), ("nation", "n_nationkey"),
    ("customer", "c_custkey"), ("supplier", "s_suppkey"),
    ("part", "p_partkey"), ("orders", "o_orderkey"),
    ("events", "event_id"), ("documents", "doc_id"),
    ("embeddings", "vec_id"),
]

FKS = [
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]

NON_NULL = [("events", "ts"), ("embeddings", "embedding"),
            ("documents", "n_chars")]


@pytest.fixture(scope="module", params=sorted(PROFILES))
def fuzzed(request):
    tmp = tempfile.mkdtemp(prefix=f"fuzzgen_{request.param}_")
    build_fuzzed_dir(request.param, BASE, tmp, seed=1)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp}/{t}.parquet')")
    yield request.param, tmp, con
    con.close()
    shutil.rmtree(tmp, ignore_errors=True)


def test_schema_bit_equal(fuzzed):
    profile, tmp, _ = fuzzed
    for t in TABLES:
        base = pq.read_schema(os.path.join(BASE, f"{t}.parquet"))
        fz = pq.read_schema(os.path.join(tmp, f"{t}.parquet"))
        assert fz.equals(base), f"{profile}/{t}: {fz} != {base}"


def test_primary_keys_unique(fuzzed):
    profile, _, con = fuzzed
    for t, pk in PKS:
        n, d = con.execute(f"SELECT count(*), count(DISTINCT {pk}) FROM {t}").fetchone()
        assert n == d, f"{profile}/{t}.{pk}: {n} rows, {d} distinct"
        assert n > 0, f"{profile}/{t}: profile emptied a table"


def test_foreign_keys_valid(fuzzed):
    profile, _, con = fuzzed
    for child, fk, parent, pk in FKS:
        bad = con.execute(
            f"SELECT count(*) FROM {child} "
            f"WHERE {fk} IS NOT NULL AND {fk} NOT IN (SELECT {pk} FROM {parent})"
        ).fetchone()[0]
        assert bad == 0, f"{profile}/{child}.{fk}: {bad} dangling"


def test_non_null_contracts(fuzzed):
    profile, _, con = fuzzed
    for t, c in NON_NULL:
        n = con.execute(f"SELECT count(*) FROM {t} WHERE {c} IS NULL").fetchone()[0]
        assert n == 0, f"{profile}/{t}.{c}: {n} NULLs violate the stated contract"


def test_deterministic(fuzzed):
    """Same (profile, seed) must regenerate byte-identical content —
    the sweep's failures have to be reproducible."""
    profile, tmp, _ = fuzzed
    tmp2 = tempfile.mkdtemp(prefix="fuzzgen_re_")
    try:
        build_fuzzed_dir(profile, BASE, tmp2, seed=1)
        for t in TABLES:
            a = pq.read_table(os.path.join(tmp, f"{t}.parquet"))
            b = pq.read_table(os.path.join(tmp2, f"{t}.parquet"))
            assert a.equals(b), f"{profile}/{t}: nondeterministic generation"
    finally:
        shutil.rmtree(tmp2, ignore_errors=True)


def test_oracle_connection_pins_determinism_settings():
    """duckdb 1.0.0's statistics_propagation optimizer mishandles NULL
    ordering through partitioned window sorts (NULL-key rows win a
    `ORDER BY ts DESC NULLS LAST` + `WHERE rn = 1` latest-per-key, and
    flap run to run under parallelism) — the oracle connection must
    disable that rule and stay single-threaded, or null-fuzzed
    compares are wrong and unstable."""
    from tests.duck_compare import duck_connection

    con = duck_connection(BASE)
    assert con.execute("SELECT current_setting('threads')").fetchone()[0] == 1
    assert (
        "statistics_propagation"
        in con.execute("SELECT current_setting('disabled_optimizers')").fetchone()[0]
    )
    con.close()


def test_each_profile_produces_its_hazard():
    probes = {
        "ties": ("SELECT count(*) - count(DISTINCT l_extendedprice) FROM li",
                 lambda v: v > 1000),
        "nulls": ("SELECT count(*) FILTER (l_returnflag IS NULL) FROM li",
                  lambda v: v > 50),
        "skew": ("SELECT max(c) FROM (SELECT count(*) AS c FROM li GROUP BY l_suppkey)",
                 lambda v: v > 2000),
        "tiny": ("SELECT count(*) FROM li", lambda v: 0 < v < 1000),
    }
    for profile, (sql, check) in probes.items():
        tmp = tempfile.mkdtemp(prefix="fuzzhaz_")
        try:
            build_fuzzed_dir(profile, BASE, tmp, seed=1)
            con = duckdb.connect()
            con.execute(
                f"CREATE VIEW li AS SELECT * FROM read_parquet('{tmp}/lineitem.parquet')")
            v = con.execute(sql).fetchone()[0]
            assert check(v), f"{profile}: hazard probe value {v}"
            con.close()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


def test_unicode_profile_hazards():
    tmp = tempfile.mkdtemp(prefix="fuzzhaz_uni_")
    try:
        build_fuzzed_dir("unicode", BASE, tmp, seed=1)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW doc AS SELECT * FROM read_parquet('{tmp}/documents.parquet')")
        con.execute(
            f"CREATE VIEW ev AS SELECT * FROM read_parquet('{tmp}/events.parquet')")
        # non-ASCII text actually landed
        non_ascii = con.execute(
            "SELECT count(*) FROM doc "
            "WHERE octet_length(encode(text)) != length(text)").fetchone()[0]
        assert non_ascii > 50, f"only {non_ascii} non-ASCII texts"
        # derived-column contract survives the rewrite (code-point length)
        bad_nchars = con.execute(
            "SELECT count(*) FROM doc WHERE n_chars != length(text)").fetchone()[0]
        assert bad_nchars == 0
        # collation-hostile group keys present
        assert con.execute(
            "SELECT count(DISTINCT source) FROM doc "
            "WHERE source IN ('SRC0', 'srcß', 'src x', 'src,|;')"
        ).fetchone()[0] == 4
        # malformed AND nested JSON both present
        bad_json = con.execute(
            "SELECT count(*) FROM ev WHERE NOT json_valid(props)").fetchone()[0]
        nested = con.execute(
            "SELECT count(*) FROM ev WHERE json_valid(props) "
            "AND json_extract(props, '$.nested') IS NOT NULL").fetchone()[0]
        assert bad_json > 20, f"only {bad_json} malformed props"
        assert nested > 50, f"only {nested} nested props"
        con.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_boundary_profile_hazards():
    tmp = tempfile.mkdtemp(prefix="fuzzhaz_bnd_")
    try:
        build_fuzzed_dir("boundary", BASE, tmp, seed=1)
        con = duckdb.connect()
        for t in ("lineitem", "customer", "events"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp}/{t}.parquet')")
        # exact 2-dp rounding half-boundaries exist (x.125 / x.375 / ...)
        halves = con.execute(
            "SELECT count(*) FROM lineitem "
            "WHERE (l_extendedprice * 1000) % 10 = 5").fetchone()[0]
        assert halves > 1000, f"only {halves} half-boundary prices"
        # degenerate multipliers and weights
        assert con.execute(
            "SELECT count(*) FROM lineitem WHERE l_discount = 1.0").fetchone()[0] > 50
        assert con.execute(
            "SELECT count(*) FROM lineitem WHERE l_quantity = 0.0").fetchone()[0] > 50
        # negative-heavy balances
        neg, total = con.execute(
            "SELECT count(*) FILTER (c_acctbal < 0), count(*) FROM customer"
        ).fetchone()
        assert neg > 0.25 * total
        # duplicate (user_id, ts) ordering ties exist
        dup = con.execute(
            "SELECT count(*) - count(DISTINCT (user_id, ts)) FROM events"
        ).fetchone()[0]
        assert dup > 50, f"only {dup} duplicate (user_id, ts) pairs"
        con.execute(
            f"CREATE VIEW emb AS SELECT * FROM read_parquet('{tmp}/embeddings.parquet')")
        # zero-norm vectors exist (0/0 cosine denominators), most are not
        nz, n = con.execute(
            "SELECT count(*) FILTER (list_sum(list_transform(embedding,"
            " x -> abs(x))) = 0), count(*) FROM emb").fetchone()
        assert 0 < nz < n // 2, f"{nz}/{n} zero-norm vectors"
        con.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_eventstorm_profile_hazards():
    tmp = tempfile.mkdtemp(prefix="fuzzhaz_es_")
    try:
        build_fuzzed_dir("eventstorm", BASE, tmp, seed=1)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp}/events.parquet')")
        n = con.execute("SELECT count(*) FROM events").fetchone()[0]
        # exact hour-boundary stamps (window-assignment edges)
        on_hour = con.execute(
            "SELECT count(*) FROM events WHERE date_trunc('hour', ts) = ts"
        ).fetchone()[0]
        assert on_hour > 0.15 * n, f"only {on_hour}/{n} on-boundary stamps"
        # +-1us epsilons around hour boundaries
        eps = con.execute(
            "SELECT count(*) FROM events WHERE ts - date_trunc('hour', ts)"
            " = INTERVAL 1 MICROSECOND OR date_trunc('hour',"
            " ts + INTERVAL 1 MICROSECOND) = ts + INTERVAL 1 MICROSECOND"
            " AND ts != date_trunc('hour', ts)").fetchone()[0]
        assert eps > 0.05 * n, f"only {eps}/{n} boundary epsilons"
        # the late-echo storm: the stream_watermark_late predicate's
        # population must be a flood, not a trickle
        late = con.execute(
            "SELECT count(*) FROM events "
            "WHERE ts < TIMESTAMP '2024-01-08' AND event_id % 7 = 0"
        ).fetchone()[0]
        assert late > 0.02 * n, f"late-echo set only {late}/{n}"
        # duplicate (user_id, ts) collision clusters (order-tie stress)
        dup = con.execute(
            "SELECT count(*) - count(DISTINCT (user_id, ts)) FROM events"
            " WHERE user_id IS NOT NULL").fetchone()[0]
        assert dup > 50, f"only {dup} duplicate (user_id, ts) pairs"
        # global max(ts) pinned to an exact hour (seal-equality case)
        mx_on_hour = con.execute(
            "SELECT date_trunc('hour', max(ts)) = max(ts) FROM events"
        ).fetchone()[0]
        assert mx_on_hour, "max(ts) not on an exact hour boundary"
        # null group keys present; event_id (tie-break) stays non-null
        nulls = con.execute(
            "SELECT count(*) FILTER (user_id IS NULL),"
            " count(*) FILTER (event_type IS NULL),"
            " count(*) FILTER (event_id IS NULL) FROM events").fetchone()
        assert nulls[0] > 0.02 * n and nulls[1] > 0.02 * n, nulls
        assert nulls[2] == 0, "event_id must stay non-null"
        con.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
