#!/usr/bin/env python
"""Adversarial-fixture parity fuzz: regenerate the TPC-H-ish fixture
under hostile data distributions and re-run EVERY oracle compare.

Why this exists: every other correctness gate (driver window, sf0.01
differential, sf0.1 parity sweep) runs on the SAME deterministic
fixture, so a Spark query and its DuckDB oracle can agree for
fixture-specific reasons — no ties in an ORDER BY column, no NULLs in
an aggregate input, no hot key, no near-empty group — and silently
disagree on real data. Each fuzz profile breaks exactly one such
assumption while preserving the schema CONTRACT (arrow types bit-equal
to the fixture, primary keys unique, foreign keys valid, event-time
non-null):

  ties   every continuous column quantized onto a coarse grid (massive
         order-by ties), duplicate document texts and embedding
         vectors (dedup/ANN tie probing)
  nulls  NULLs injected into nullable measure/attribute columns,
         including group keys (l_returnflag) and join-adjacent
         attributes — probes null-group and null-propagation parity
  skew   one hot key absorbs half of lineitem/orders/events FKs and
         70% of customers/suppliers move to one nation — a result
         must never depend on the key distribution
  tiny   aggressive FK-cascaded downsample (3 nations, 4 suppliers,
         near-empty groups everywhere) — probes empty-group /
         single-row-frame edges
  unicode hostile text and JSON: CJK / emoji / combining marks /
         exotic whitespace / regex metacharacters / markup specials /
         separator characters injected into documents.text (n_chars
         recomputed to keep the derived-column contract), mixed-case
         and non-ASCII group keys in documents.source, and
         events.props rewritten to nested / unicode-escaped /
         type-shifted / MALFORMED JSON — probes Java-regex-vs-RE2,
         case mapping, code-point-length, JSON-parse and collation
         parity
  boundary rounding half-boundaries and sign/time edges: prices on an
         exact 1/8 grid (x.125 is a representable round-to-2dp half —
         HALF_UP engines agree, banker's-rounding pandas arms do
         not), discount/tax exactly 0 and 1, zero quantities, 40%
         negative and 5% exactly-zero account balances, month-end
         order dates, first-of-month ship dates (inclusive/exclusive
         range edges), duplicate (user_id, ts) event pairs (ordering
         tie-breaks), and events.ts on exact 5-minute window
         boundaries

Parity is the invariant under EVERY profile: both engines read the
same fuzzed parquet, so any hash divergence is a real engine-semantics
or oracle bug, never "the data changed". A qid whose result becomes
0 rows under a profile passes vacuously and is reported so the profile
can be tuned (SUSPECT_VACUOUS).

Findings that are data-CONTRACT violations rather than bugs (a qid
that documents "embedding NOT NULL" crashing under a null embedding)
are whitelisted here with the stated contract, mirroring the window /
skew / collect audit discipline.

    python tools/fuzz_parity.py                  # all profiles, all qids
    python tools/fuzz_parity.py --profile ties
    python tools/fuzz_parity.py --qids weighted_median,listagg_order
    python tools/fuzz_parity.py --seed 7         # different draw

Exit code: number of (profile, qid) FAILs after whitelisting.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# (profile, qid) -> stated data contract that makes the divergence /
# crash expected. Keep each entry a real sentence naming the contract.
WHITELIST: dict[tuple[str, str], str] = {
    # qids whose ORACLE legitimately returns 0 rows on ANY input —
    # "vacuous" is their contract, not a profile-tuning gap
    ("__intended_empty__", "empty_clone"): (
        "an empty staging clone IS the result: the qid verifies schema "
        "replication with zero rows by definition"
    ),
    ("*", "lm_perplexity"): (
        "class 15 (any fuzz profile): JVM-vs-libm ln() differs by 1 "
        "ulp, so a vocab entry whose nll lands EXACTLY on the 6-dp "
        "half-boundary rounds oppositely and every occurrence flips "
        "together — the signature is always rows/schema exact with a "
        "few docs' avg_nll off by exactly 1e-6. Observed draws: nulls "
        "at sf0.001 (r7), unicode and ties seed 2 at sf0.1 (r10) — "
        "per-profile entries were whack-a-mole because the sf0.1 "
        "corpus has 100x the vocab tie mass. No quantization closes a "
        "class where the INPUT doubles differ (contrast class 16, "
        "which is fixable because both engines see identical doubles); "
        "the boundary-free clean fixture at all three SFs is the gate."
    ),
}


# --- schema-preserving IO ----------------------------------------------

def load_base(base_dir: str) -> tuple[dict[str, pd.DataFrame], dict[str, pa.Schema]]:
    dfs, schemas = {}, {}
    for t in TABLES:
        tab = pq.read_table(os.path.join(base_dir, f"{t}.parquet"))
        schemas[t] = tab.schema
        dfs[t] = tab.to_pandas()
    return dfs, schemas


def write_fuzzed(dfs: dict[str, pd.DataFrame], schemas: dict[str, pa.Schema],
                 out_dir: str) -> None:
    for t, df in dfs.items():
        # route through object dtype so injected Nones become arrow
        # NULLs (a NaN written through a float64 pandas column would
        # stay a NaN value, not a NULL), then cast back to the base
        # fixture's exact schema so every type is bit-identical
        tab = pa.Table.from_pandas(
            df.astype(object).where(pd.notna(df), None),
            schema=schemas[t], preserve_index=False,
        )
        pq.write_table(tab, os.path.join(out_dir, f"{t}.parquet"))


# --- per-profile transforms ---------------------------------------------

def _quantize(s: pd.Series, step: float) -> pd.Series:
    return (np.round(s.astype(float) / step) * step).astype(s.dtype)


def _null_mask(rng: np.random.RandomState, n: int, rate: float) -> np.ndarray:
    return rng.random_sample(n) < rate


def _inject_nulls(df: pd.DataFrame, col: str, rng: np.random.RandomState,
                  rate: float) -> None:
    m = _null_mask(rng, len(df), rate)
    vals = df[col].astype(object)
    vals[m] = None
    df[col] = vals


def profile_ties(dfs: dict[str, pd.DataFrame], rng: np.random.RandomState) -> None:
    dfs["customer"]["c_acctbal"] = _quantize(dfs["customer"]["c_acctbal"], 100)
    dfs["supplier"]["s_acctbal"] = _quantize(dfs["supplier"]["s_acctbal"], 100)
    dfs["part"]["p_retailprice"] = _quantize(dfs["part"]["p_retailprice"], 100)
    dfs["part"]["p_size"] = (dfs["part"]["p_size"] % 3 + 1) * 5
    o = dfs["orders"]
    o["o_totalprice"] = _quantize(o["o_totalprice"], 1000)
    o["o_orderdate"] = pd.to_datetime(o["o_orderdate"]).dt.floor("7D")
    li = dfs["lineitem"]
    li["l_extendedprice"] = _quantize(li["l_extendedprice"], 500)
    # keep the original 1..50 magnitude (sum-threshold filters like
    # q18's HAVING > 150 must stay satisfiable) while collapsing onto
    # 5 tie values
    li["l_quantity"] = np.maximum(_quantize(li["l_quantity"], 10), 10)
    li["l_discount"] = _quantize(li["l_discount"], 0.05)
    li["l_tax"] = _quantize(li["l_tax"], 0.04)
    li["l_shipdate"] = pd.to_datetime(li["l_shipdate"]).dt.floor("7D")
    ev = dfs["events"]
    ev["value"] = _quantize(ev["value"], 10)
    ev["ts"] = pd.to_datetime(ev["ts"]).dt.floor("h")
    ev["props"] = np.where(rng.random_sample(len(ev)) < 0.5,
                           '{"k": 1}', '{"k": 2}')
    # duplicate texts / vectors: copy the full derived row (text, lang,
    # source, n_chars stay mutually consistent), keep the PK
    doc = dfs["documents"]
    donors = rng.randint(0, len(doc), size=len(doc))
    dup = rng.random_sample(len(doc)) < 0.4
    for c in ("text", "lang", "source", "n_chars"):
        doc.loc[dup, c] = doc[c].to_numpy()[donors[dup]]
    emb = dfs["embeddings"]
    donors_e = rng.randint(0, len(emb), size=len(emb))
    dup_e = rng.random_sample(len(emb)) < 0.4
    for c in ("embedding", "label"):
        emb.loc[dup_e, c] = pd.Series(
            emb[c].to_numpy()[donors_e[dup_e]], index=emb.index[dup_e])


def profile_nulls(dfs: dict[str, pd.DataFrame], rng: np.random.RandomState) -> None:
    plan = {
        "customer": [("c_acctbal", 0.05), ("c_mktsegment", 0.05)],
        "supplier": [("s_acctbal", 0.05)],
        "part": [("p_retailprice", 0.05), ("p_size", 0.05), ("p_brand", 0.05)],
        "orders": [("o_totalprice", 0.05), ("o_orderpriority", 0.05),
                   ("o_orderdate", 0.02)],
        "lineitem": [("l_quantity", 0.05), ("l_extendedprice", 0.05),
                     ("l_discount", 0.05), ("l_tax", 0.05),
                     ("l_shipdate", 0.02), ("l_returnflag", 0.03),
                     ("l_linestatus", 0.03)],
        "events": [("value", 0.05), ("props", 0.05), ("event_type", 0.03)],
        "documents": [("text", 0.02), ("lang", 0.05), ("source", 0.05)],
        "embeddings": [("label", 0.05)],
        # contracts kept non-null: every PK/FK, events.ts (event time),
        # embeddings.embedding (vector NOT NULL), documents.n_chars
    }
    for t, cols in plan.items():
        for col, rate in cols:
            _inject_nulls(dfs[t], col, rng, rate)


def profile_skew(dfs: dict[str, pd.DataFrame], rng: np.random.RandomState) -> None:
    def hot(df, col, donor_col_df, donor_col, frac):
        hot_key = donor_col_df[donor_col].min()
        m = rng.random_sample(len(df)) < frac
        df.loc[m, col] = hot_key

    hot(dfs["lineitem"], "l_suppkey", dfs["supplier"], "s_suppkey", 0.5)
    hot(dfs["lineitem"], "l_partkey", dfs["part"], "p_partkey", 0.5)
    hot(dfs["orders"], "o_custkey", dfs["customer"], "c_custkey", 0.5)
    hot(dfs["events"], "user_id", dfs["events"], "user_id", 0.6)
    hot(dfs["customer"], "c_nationkey", dfs["nation"], "n_nationkey", 0.7)
    hot(dfs["supplier"], "s_nationkey", dfs["nation"], "n_nationkey", 0.7)
    hot(dfs["documents"], "source", dfs["documents"], "source", 0.7)


def profile_tiny(dfs: dict[str, pd.DataFrame], rng: np.random.RandomState) -> None:
    keep_nations = dfs["nation"]["n_nationkey"] < 3
    dfs["nation"] = dfs["nation"][keep_nations].reset_index(drop=True)
    nat = set(dfs["nation"]["n_nationkey"])
    cust = dfs["customer"]
    cust = cust[cust["c_nationkey"].isin(nat)].head(25).reset_index(drop=True)
    dfs["customer"] = cust
    sup = dfs["supplier"]
    sup = sup[sup["s_nationkey"].isin(nat)].head(4).reset_index(drop=True)
    if len(sup) == 0:  # guarantee at least one supplier in a kept nation
        sup = dfs["supplier"].head(1).copy().reset_index(drop=True)
        sup["s_nationkey"] = min(nat)
    dfs["supplier"] = sup
    dfs["part"] = dfs["part"].head(15).reset_index(drop=True)
    orders = dfs["orders"]
    orders = orders[orders["o_custkey"].isin(set(cust["c_custkey"]))]
    orders = orders.head(150).reset_index(drop=True)
    dfs["orders"] = orders
    li = dfs["lineitem"]
    li = li[li["l_orderkey"].isin(set(orders["o_orderkey"]))].reset_index(drop=True)
    # remap (not filter) the part/supplier FKs into the kept key sets so
    # FK validity survives the downsample without emptying the table
    pk = dfs["part"]["p_partkey"].to_numpy()
    sk = dfs["supplier"]["s_suppkey"].to_numpy()
    li["l_partkey"] = pk[li["l_partkey"].to_numpy() % len(pk)]
    li["l_suppkey"] = sk[li["l_suppkey"].to_numpy() % len(sk)]
    dfs["lineitem"] = li
    ev = dfs["events"]
    ev = ev[(ev["user_id"] < 6) & (ev["event_type"] != "click")]
    dfs["events"] = ev.head(150).reset_index(drop=True)
    dfs["documents"] = dfs["documents"].head(30).reset_index(drop=True)
    dfs["embeddings"] = dfs["embeddings"].head(40).reset_index(drop=True)


# Hostile text snippets: each targets a cross-engine semantics class
# (Java regex vs RE2, simple-vs-full case mapping, code-point length,
# exotic whitespace tokenization, markup/separator escaping).
_UNI_SNIPPETS = [
    "naïve café – résumé",                        # latin-1 accents
    "ΣΊΣΥΦΟΣ σίσυφος ς",                          # greek final sigma casing
    "İstanbul ıssız I i",                          # turkish dotted/dotless i
    "straße GROSS ß",                              # sharp-s upper-casing
    "東京 データ 処理中",                           # CJK
    "🚀🔥 emoji… 👩‍👩‍👧‍👧 zwj",   # astral emoji + ZWJ family
    "a b c　d",                      # NBSP, em-space, ideographic space
    "line1\nline2\ttab\r\ncrlf",                   # control whitespace
    "regex .*+?()[]{}|\\^$ meta",                  # regex metacharacters
    "quotes \"double\" 'single' `back`",           # quote soup
    "xml & < > &amp; <tag attr=\"v\"/>",           # markup specials
    "comma, semi; pipe| sep",                      # listagg separator candidates
    "é combining vs é precomposed",     # NFD vs NFC
]

_HOSTILE_SOURCES = ["SRC0", "srcß", "src x", "src,|;"]


def _hostile_props(r: float, k: int) -> str | None:
    """Deterministic hostile-JSON rewrite for events.props (r in [0,1)).
    Returns None to keep the original flat {"k": int}."""
    if r < 0.20:   # nested object/array with separator+quote payload
        return ('{"k": %d, "nested": {"a": [1, 2, {"b": "x,y"}], "n": null},'
                ' "s": "va\\"l|ue"}' % k)
    if r < 0.28:   # unicode escapes AND literal unicode values
        return '{"k": %d, "u": "\\u00e9\\u6771", "t": "東🚀 ß"}' % k
    if r < 0.33:   # number-as-string (extraction/cast parity)
        return '{"k": "%d"}' % k
    if r < 0.38:   # explicit JSON null
        return '{"k": null}'
    if r < 0.43:   # key missing entirely
        return '{"x": 1}'
    if r < 0.47:   # truncated / malformed
        return '{"k": %d' % k
    if r < 0.49:
        return "not json at all"
    if r < 0.51:   # array root
        return "[1, 2, 3]"
    if r < 0.54:   # int64-magnitude neighbor key (precision parity)
        return '{"k": %d, "big": 1234567890123456789}' % k
    return None


def profile_unicode(dfs: dict[str, pd.DataFrame], rng: np.random.RandomState) -> None:
    doc = dfs["documents"]
    # The snippet-concat branches and the n_chars recompute below assume
    # non-null text — true of the base fixture, asserted so a future
    # nullable-text fixture fails loudly instead of with a pandas
    # traceback deep in .str.len().astype("int64").
    assert doc["text"].notna().all(), (
        "profile_unicode assumes documents.text is non-null in the base "
        "fixture; got nulls — extend the profile to preserve them"
    )
    n = len(doc)
    pick = rng.randint(0, len(_UNI_SNIPPETS), size=n)
    mode = rng.random_sample(n)
    text = doc["text"].astype(object).to_numpy()
    for i in range(n):
        snip = _UNI_SNIPPETS[pick[i]]
        if mode[i] < 0.10:
            text[i] = snip                      # hostile-only short doc
        elif mode[i] < 0.25:
            text[i] = snip + " " + text[i]
        elif mode[i] < 0.40:
            text[i] = text[i] + " " + snip
    doc["text"] = text
    # preserve the derived-column contract the base fixture carries
    # (n_chars == code-point length; Python len, Spark length() and
    # DuckDB length() all count code points)
    doc["n_chars"] = doc["text"].str.len().astype("int64")
    src = doc["source"].astype(object).to_numpy()
    srcm = rng.random_sample(n)
    for i in range(n):
        if srcm[i] < 0.15:   # collation-hostile group keys
            src[i] = _HOSTILE_SOURCES[pick[i] % len(_HOSTILE_SOURCES)]
    doc["source"] = src
    ev = dfs["events"]
    pr = rng.random_sample(len(ev))
    kdraw = rng.randint(0, 100, size=len(ev))
    props = ev["props"].astype(object).to_numpy()
    for i in range(len(ev)):
        h = _hostile_props(pr[i], int(kdraw[i]))
        if h is not None:
            props[i] = h
    ev["props"] = props


def profile_boundary(dfs: dict[str, pd.DataFrame], rng: np.random.RandomState) -> None:
    li = dfs["lineitem"]
    # exact 1/8 grid: x.125 values are representable doubles whose
    # 2-dp rounding is a true half-boundary — HALF_UP (Spark round,
    # DuckDB round) agree at 0.13; banker's (numpy/pandas .round)
    # yields 0.12, so any pandas-UDF arm that rounds diverges here
    li["l_extendedprice"] = np.round(li["l_extendedprice"].astype(float) * 8) / 8
    qmask = rng.random_sample(len(li))
    q = li["l_quantity"].astype(float).to_numpy()
    q[qmask < 0.05] = 0.0                       # zero quantity / weight
    li["l_quantity"] = q
    d = (np.round(li["l_discount"].astype(float) / 0.05) * 0.05).to_numpy()
    dmask = rng.random_sample(len(li))
    d[dmask < 0.05] = 1.0                       # (1 - d) == 0 revenue
    d[(dmask >= 0.05) & (dmask < 0.15)] = 0.0
    li["l_discount"] = d
    t = li["l_tax"].astype(float).to_numpy()
    t[rng.random_sample(len(li)) < 0.10] = 0.0
    li["l_tax"] = t
    sd = pd.to_datetime(li["l_shipdate"])
    sdm = rng.random_sample(len(li))
    # exact first-of-month midnights: >= vs > range-edge probes
    sd[sdm < 0.10] = sd[sdm < 0.10].dt.to_period("M").dt.to_timestamp()
    li["l_shipdate"] = sd
    for tname, col in (("customer", "c_acctbal"), ("supplier", "s_acctbal")):
        tb = dfs[tname]
        bal = tb[col].astype(float).to_numpy()
        bm = rng.random_sample(len(tb))
        neg = bm < 0.40
        bal[neg] = -np.abs(bal[neg])
        bal[(bm >= 0.40) & (bm < 0.45)] = 0.0
        tb[col] = bal
    o = dfs["orders"]
    od = pd.to_datetime(o["o_orderdate"])
    om = rng.random_sample(len(o))
    od[om < 0.15] = od[om < 0.15] + pd.offsets.MonthEnd(0)   # month-end clamp edges
    o["o_orderdate"] = od
    tp = o["o_totalprice"].astype(float).to_numpy()
    tp[rng.random_sample(len(o)) < 0.05] = 0.0
    o["o_totalprice"] = tp
    ev = dfs["events"]
    v = ev["value"].astype(float).to_numpy()
    vm = rng.random_sample(len(ev))
    v[vm < 0.30] = np.round(v[vm < 0.30])       # exact-integer doubles
    v[(vm >= 0.30) & (vm < 0.40)] = -np.abs(v[(vm >= 0.30) & (vm < 0.40)])
    v[(vm >= 0.40) & (vm < 0.45)] = 0.0
    ev["value"] = v
    ts = pd.to_datetime(ev["ts"]).copy()
    tm = rng.random_sample(len(ev))
    # duplicate (user_id, ts) pairs: every masked row collapses onto
    # its user's minimum timestamp — many-way ordering ties
    user_min = ts.groupby(ev["user_id"]).transform("min")
    dup = tm < 0.20
    ts[dup] = user_min[dup]
    onb = (tm >= 0.20) & (tm < 0.35)
    ts[onb] = ts[onb].dt.floor("5min")          # exact window-boundary stamps
    ev["ts"] = ts
    # zero-norm embedding vectors: cosine's 0/0 and quantization's
    # max|x| = 0 denominators — representable real data (a failed
    # encoder emits zeros), NOT a contract violation like NULL
    emb = dfs["embeddings"]
    em = rng.random_sample(len(emb))
    zvec = emb["embedding"].iloc[0]
    zero = [0.0] * len(zvec)
    col = emb["embedding"].astype(object)
    col[em < 0.03] = pd.Series([zero] * int((em < 0.03).sum()),
                               index=emb.index[em < 0.03])
    emb["embedding"] = col


def profile_eventstorm(dfs: dict[str, pd.DataFrame], rng: np.random.RandomState) -> None:
    """Hostile EVENT-TIME shapes, aimed at the streaming family's
    semantics (VERDICT r7 ask #4) but swept over every oracle qid that
    touches events: exact hour-boundary stamps (window-assignment
    edges), ±1µs epsilons around boundaries (seal comparisons at the
    micros resolution watermarks track), a LATE-ECHO STORM (the
    stream_watermark_late predicate's population — ts < Jan 8 with
    event_id % 7 == 0 — grows by every storm row, so batch 3 of that
    harness becomes a flood instead of a trickle), midnight collision
    clusters (many-way order ties stressing the (ts, event_id) sort
    contract in the EWMA kernel and every event-time window), the
    global max(ts) pinned to an exact hour (the watermark-seal
    ``window_end <= max(ts) - 1h`` EQUALITY case), and null group keys
    (user_id / event_type — keyed streaming state with a null key).
    events-only by design: the other tables' hostile shapes are owned
    by the other profiles, and event_id (the ewma tie-break and the
    late-set selector) stays unique and non-null."""
    ev = dfs["events"]
    n = len(ev)
    ts = pd.to_datetime(ev["ts"]).copy()
    r = rng.random_sample(n)
    hour = ts.dt.floor("h")
    ts[r < 0.20] = hour[r < 0.20]                        # exact hour boundary
    m = (r >= 0.20) & (r < 0.25)
    ts[m] = hour[m] + pd.Timedelta(microseconds=1)       # first tick inside
    m = (r >= 0.25) & (r < 0.30)
    ts[m] = hour[m] - pd.Timedelta(microseconds=1)       # last tick of previous
    # late-echo storm: only rows ALREADY in the %7 selector move early,
    # so the late set explodes without touching event_id uniqueness
    eid = ev["event_id"].to_numpy()
    storm = (eid % 7 == 0) & (r >= 0.30) & (r < 0.55)
    offs = pd.to_timedelta(eid % (5 * 86400), unit="s")  # Jan 2 .. Jan 7
    ts[storm] = (pd.Timestamp("2024-01-02") + offs)[storm]
    # midnight collision clusters: every band row collapses onto its
    # user's min-ts DAY at 00:00 — same-user band rows collide EXACTLY
    # (a plain per-row day-floor only collides same-user-same-day rows:
    # ~38 pairs at sf0.001, too thin to stress the tie-break contract)
    m = (r >= 0.55) & (r < 0.70)
    user_day = ts.groupby(ev["user_id"]).transform("min").dt.floor("D")
    ts[m] = user_day[m]
    # pin the global max to an exact hour: watermark = max(ts) - delay
    # lands exactly ON a window boundary, probing the <= vs < seal edge
    imax = ts.idxmax()
    ts.loc[imax] = ts.loc[imax].ceil("h")
    ev["ts"] = ts.astype("datetime64[us]")
    _inject_nulls(ev, "user_id", rng, 0.05)
    _inject_nulls(ev, "event_type", rng, 0.05)
    _inject_nulls(ev, "value", rng, 0.04)


PROFILES = {
    "ties": profile_ties,
    "nulls": profile_nulls,
    "skew": profile_skew,
    "tiny": profile_tiny,
    "unicode": profile_unicode,
    "boundary": profile_boundary,
    "eventstorm": profile_eventstorm,
}

# Pinned per-profile rng salts. The first four values are the sorted
# indices the recorded FUZZ.json sweeps were generated with — adding a
# profile must NOT silently re-draw the historical profiles, so salts
# are frozen here instead of derived from sort order.
PROFILE_SALT = {
    "nulls": 0, "skew": 1, "ties": 2, "tiny": 3,
    "unicode": 4, "boundary": 5, "eventstorm": 6,
}


def build_fuzzed_dir(profile: str, base_dir: str, out_dir: str, seed: int) -> None:
    """Deterministic for (profile, base_dir, seed); schema bit-equal."""
    dfs, schemas = load_base(base_dir)
    rng = np.random.RandomState(seed * 1009 + PROFILE_SALT[profile])
    PROFILES[profile](dfs, rng)
    write_fuzzed(dfs, schemas, out_dir)


# --- sweep ----------------------------------------------------------------

def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", choices=sorted(PROFILES) + ["all"], default="all")
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    ap.add_argument("--qids", default="",
                    help="comma-separated subset (default: every oracle qid)")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--out", default="docs/FUZZ.json")
    args = ap.parse_args()

    from oracle_to_oracle_data_integration_pipeline_spark import queries as q
    from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark
    from tests.duck_compare import compare, duck_connection

    spark = get_spark(app_name="o2o_fuzz_parity", cpus=16,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs, osql = q.all_queries(), q.all_oracle_sql()
    subset = [s for s in args.qids.split(",") if s] or sorted(osql)
    profiles = sorted(PROFILES) if args.profile == "all" else [args.profile]

    results, fails, vacuous = [], [], []
    for profile in profiles:
        tmp = tempfile.mkdtemp(prefix=f"o2o_fuzz_{profile}_")
        try:
            build_fuzzed_dir(profile, args.base, tmp, args.seed)
            con = duck_connection(tmp)
            for qid in subset:
                if qid not in osql:
                    continue
                t0 = time.time()
                try:
                    df = qs[qid](spark, tmp)
                    ok, msg = compare(df, con, osql[qid])
                    nrows = None
                    if ok:
                        nrows = con.sql(
                            f"SELECT count(*) FROM ({osql[qid]})").fetchone()[0]
                except Exception as e:
                    ok, msg, nrows = False, (
                        f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"), None
                wl = WHITELIST.get((profile, qid)) or WHITELIST.get(("*", qid))
                status = ("ok" if ok else
                          ("whitelisted" if wl else "FAIL"))
                if ok and nrows == 0:
                    if ("__intended_empty__", qid) in WHITELIST:
                        status = "ok"  # empty IS the qid's contract
                    else:
                        status, msg = "VACUOUS", "oracle returned 0 rows under fuzz"
                        vacuous.append((profile, qid))
                results.append({"profile": profile, "qid": qid,
                                "status": status, "rows": nrows,
                                "msg": None if ok else msg,
                                "contract": wl, "sec": round(time.time() - t0, 2)})
                if status == "FAIL":
                    fails.append((profile, qid))
                print(f"{profile}/{qid} {status} {time.time() - t0:.1f}s"
                      + ("" if ok else f"  {msg[:140]}"), flush=True)
            con.close()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    summary = {
        "profiles": profiles, "seed": args.seed, "base": args.base,
        "checked": len(results), "fails": [f"{p}/{k}" for p, k in fails],
        "vacuous": [f"{p}/{k}" for p, k in vacuous],
        "whitelisted": sorted(f"{p}/{k}" for (p, k) in WHITELIST
                              if any(r["profile"] == p and r["qid"] == k
                                     for r in results)),
        "results": results,
    }
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    print(f"fuzz parity: {len(results)} compares over {profiles}; "
          f"{len(fails)} FAIL {fails[:20]}; {len(vacuous)} vacuous")
    return len(fails)


if __name__ == "__main__":
    sys.exit(main())
